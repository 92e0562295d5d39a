"""mini-jq engine: the full-program gojq tier.

The reference compiles arbitrary gojq per mapping entry
(/root/reference/internal/json-anonymizer/json-anonymizer.go:215-236);
`jq_mini` is this engine's equivalent surface — reduce/foreach,
variables, def, if/try, path assignment, and the builtin library.
Expectations below mirror the public jq manual / jq 1.7 behavior."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from neosync_spark.functions import jq_mini
from neosync_spark.functions.jq_mini import JqError, first_or, run
from neosync_spark.functions.json_anonymizer import anonymize_json_udf

CASES = [
    # paths / streams
    (".", {"a": 1}, [{"a": 1}]),
    (".a.b", {"a": {"b": 2}}, [2]),
    (".a[1]", {"a": [1, 2, 3]}, [2]),
    (".a[]", {"a": [1, 2]}, [1, 2]),
    (".a, .b", {"a": 1, "b": 2}, [1, 2]),
    (".a | .b", {"a": {"b": 5}}, [5]),
    (".[2:4]", [0, 1, 2, 3, 4], [[2, 3]]),
    (".[:2]", "hello", ["he"]),
    (".[-2:]", [1, 2, 3], [[2, 3]]),
    (".a?", 5, []),
    # arithmetic / operators
    ("1 + 2 * 3", None, [7]),
    ('"x" * 3', None, ["xxx"]),
    ('"a,b,c" / ","', None, [["a", "b", "c"]]),
    ("[.[] | . + 1]", [1, 2], [[2, 3]]),
    (".a // \"d\"", {}, ["d"]),
    (".a // \"d\"", {"a": False}, ["d"]),
    (".a // \"d\"", {"a": 0}, [0]),
    # reduce / foreach / variables / def
    ("reduce .[] as $x (0; . + $x)", [1, 2, 3, 4], [10]),
    ("foreach .[] as $x (0; . + $x)", [1, 2, 3], [1, 3, 6]),
    ("foreach .[] as $x (0; . + $x; [$x, .])", [1, 2], [[1, 1], [2, 3]]),
    (
        ".items[] as $x | $x.price",
        {"items": [{"price": 3}, {"price": 4}]},
        [3, 4],
    ),
    (".x as $v | .y + $v", {"x": 1, "y": 2}, [3]),
    (
        "reduce .items[] as $i ({}; .[$i.k] = $i.v)",
        {"items": [{"k": "a", "v": 1}, {"k": "b", "v": 2}]},
        [{"a": 1, "b": 2}],
    ),
    ("def f: . + 1; f | f", 1, [3]),
    ("def add2(a; b): a + b; add2(.x; .y)", {"x": 1, "y": 2}, [3]),
    ("def f($n): . + $n; f(10)", 5, [15]),
    # control flow
    ('if .a > 1 then "big" else "small" end', {"a": 5}, ["big"]),
    (
        'if .a > 1 then "big" elif .a == 1 then "one" else "small" end',
        {"a": 1},
        ["one"],
    ),
    ('try error("boom") catch .', None, ["boom"]),
    ("[.[] | select(. > 2)]", [1, 2, 3, 4], [[3, 4]]),
    # construction / interpolation
    ('"\\(.a + 1) items"', {"a": 2}, ["3 items"]),
    ("{a: .x, b: 1}", {"x": 9}, [{"a": 9, "b": 1}]),
    ("{(.k): .v}", {"k": "key", "v": 7}, [{"key": 7}]),
    ("{a}", {"a": 3, "b": 9}, [{"a": 3}]),
    # assignment through computed paths
    (".x = 5", {}, [{"x": 5}]),
    (".a.b = 1", {}, [{"a": {"b": 1}}]),
    (".x |= . + 1", {"x": 1}, [{"x": 2}]),
    (".x += 2", {"x": 1}, [{"x": 3}]),
    (".a[].n = 0", {"a": [{"n": 1}, {"n": 2}]}, [{"a": [{"n": 0}, {"n": 0}]}]),
    (
        "(.a[] | select(.k == 1) | .v) = 9",
        {"a": [{"k": 1, "v": 0}, {"k": 2, "v": 0}]},
        [{"a": [{"k": 1, "v": 9}, {"k": 2, "v": 0}]}],
    ),
    ("del(.a)", {"a": 1, "b": 2}, [{"b": 2}]),
    ("del(.a[0])", {"a": [1, 2, 3]}, [{"a": [2, 3]}]),
    ("del(.a[] | select(. > 1))", {"a": [1, 2, 3]}, [{"a": [1]}]),
    ("paths", {"a": {"b": 1}}, [["a"], ["a", "b"]]),
    ('[paths(type == "number")]', {"a": {"b": 1}}, [[["a", "b"]]]),
    ('getpath(["a", "b"])', {"a": {"b": 4}}, [4]),
    ('setpath(["a"]; 9)', {}, [{"a": 9}]),
    # builtins
    ("to_entries", {"a": 1}, [[{"key": "a", "value": 1}]]),
    ("from_entries", [{"key": "a", "value": 1}], [{"a": 1}]),
    ("with_entries(.value += 1)", {"a": 1, "b": 2}, [{"a": 2, "b": 3}]),
    ("keys", {"b": 1, "a": 2}, [["a", "b"]]),
    ("length", "hello", [5]),
    ("length", None, [0]),
    ("add", [1, 2, 3], [6]),
    ("sort", [3, 1, 2], [[1, 2, 3]]),
    ("sort_by(.x)", [{"x": 2}, {"x": 1}], [[{"x": 1}, {"x": 2}]]),
    (
        "group_by(.x) | map(length)",
        [{"x": 1}, {"x": 1}, {"x": 2}],
        [[2, 1]],
    ),
    ("unique", [3, 1, 3, 2], [[1, 2, 3]]),
    ("min, max", [3, 1, 2], [1, 3]),
    ("range(3)", None, [0, 1, 2]),
    ("range(1; 7; 2)", None, [1, 3, 5]),
    ("[limit(2; .[])]", [1, 2, 3, 4], [[1, 2]]),
    ("first(.[])", [7, 8], [7]),
    ("last(.[])", [7, 8], [8]),
    ("until(. >= 10; . * 2)", 1, [16]),
    ("[while(. < 10; . * 2)]", 1, [[1, 2, 4, 8]]),
    ('split(",")', "a,b", [["a", "b"]]),
    ('join("-")', ["a", "b"], ["a-b"]),
    ('test("ab+")', "abbb", [True]),
    ('sub("a"; "X")', "banana", ["bXnana"]),
    ('gsub("a"; "X")', "banana", ["bXnXnX"]),
    ('gsub("(?<c>[aeiou])"; "<\\(.c)>")', "hi", ["h<i>"]),
    ("tojson", {"a": 1}, ['{"a":1}']),
    ("fromjson", '{"a":1}', [{"a": 1}]),
    ("[.. | numbers]", {"a": [1, {"b": 2}]}, [[1, 2]]),
    ("flatten", [[1, [2]], 3], [[1, 2, 3]]),
    ("reverse", [1, 2], [[2, 1]]),
    ('has("a")', {"a": 1}, [True]),
    ('contains("ell")', "hello", [True]),
    ("inside([1, 2, 3])", [1, 3], [True]),
    ("ascii_downcase", "AbC", ["abc"]),
    ('ltrimstr("ab")', "abcd", ["cd"]),
    ("tostring", 42, ["42"]),
    ("tonumber", "42", [42]),
    ("type", [], ["array"]),
    ("not", False, [True]),
    ("explode | implode", "hi", ["hi"]),
    (
        "[recurse(.next; . != null) | .v]",
        {"v": 1, "next": {"v": 2, "next": None}},
        [[1, 2]],
    ),
    (
        'capture("(?<u>[a-z]+)@(?<d>[a-z]+)")',
        "me@ex",
        [{"u": "me", "d": "ex"}],
    ),
    ('[splits(", *")]', "a, b,c", [["a", "b", "c"]]),
    ("min_by(.x).x", [{"x": 3}, {"x": 1}], [1]),
    ('indices("a")', "banana", [[1, 3, 5]]),
    ("trim", "  hi  ", ["hi"]),
    ("map_values(. + 1)", {"a": 1}, [{"a": 2}]),
    ("pick(.a.b)", {"a": {"b": 1, "c": 2}, "d": 3}, [{"a": {"b": 1}}]),
    ("any(. > 2)", [1, 3], [True]),
    ("all(. > 0)", [1, 3], [True]),
]


@pytest.mark.parametrize("prog,inp,want", CASES, ids=[c[0] for c in CASES])
def test_run(prog, inp, want):
    assert run(prog, inp) == want


REJECTED = ["env", "now", "input", "$__loc__", 'label $out | 1',
            "import \"m\" as m; .", ". as [$a] | $a", "@nosuchformat"]

FORMAT_CASES = [
    ('@base64 "x\\(.a)"', {"a": 5}, ["xNQ=="]),
    ("[1,2] | @csv", None, ["1,2"]),
    ('["a\\"b"] | @csv', None, ['"a""b"']),
    ('[1,"a b"] | @tsv', None, ["1\ta b"]),
    ('"a&b" | @html', None, ["a&amp;b"]),
    ('"\u00e9" | @uri', None, ["%C3%A9"]),
    ('"eA==" | @base64d', None, ["x"]),
    ('{"a": 1} | @json', None, ['{"a":1}']),
    ("5 | @base64", None, ["NQ=="]),
    ('@text "v=\\(.a)"', {"a": 5}, ["v=5"]),
    ("[null, true] | @csv", None, [",true"]),
    ('["a", "b c"] | @sh', None, ["'a' 'b c'"]),
    # gojq/jq-1.7 divergence from jq 1.6: @tsv ESCAPES control chars
    # instead of erroring
    ('["a\tb"] | @tsv', None, ["a\\tb"]),
]


@pytest.mark.parametrize(
    "prog,inp,want", FORMAT_CASES, ids=[c[0] for c in FORMAT_CASES]
)
def test_format_strings(prog, inp, want):
    assert run(prog, inp) == want


@pytest.mark.parametrize("prog", REJECTED)
def test_rejected_constructs(prog):
    with pytest.raises(JqError):
        run(prog, None)


def test_first_or_contract():
    assert first_or("empty", 1, "d") == "d"
    assert first_or('error("x")', 1, "d") == "d"
    assert first_or(". + 1", 1, "d") == 2
    assert first_or("bad ][ syntax", 1, "d") == "d"


def test_variables_prebound():
    assert run(".price * $rate", {"price": 10}, {"rate": 3}) == [30]


def test_errors_are_jq_errors():
    for prog in ['{"a":1} | .a.b.c | .[0]', "1 + {}", "[1] | .[] | keys"]:
        with pytest.raises(JqError):
            run(prog, None)


def test_precedence_pipe_comma_alt():
    # ',' binds looser than '//' (jq.y ladder)
    assert run(".a // 1, .b // 2", {}) == [1, 2]
    # '|' binds looser than ','
    assert run(".[] | . + 1, . + 10", [5]) == [6, 15]


def test_reduce_empty_update_contributes_nothing():
    assert run("reduce .[] as $x (0; empty)", [1]) == []


def test_update_assign_empty_deletes():
    assert run(".a |= empty", {"a": 1, "b": 2}) == [{"b": 2}]


def test_anonymize_udf_full_program_tier():
    fn = anonymize_json_udf(
        {
            'def mask: if type == "string" then "***" else . end; '
            ".users[].email |= mask": None,
            ".total = (reduce .items[] as $x (0; . + $x.price))": None,
            '.summary = "\\(.items | length) items"': None,
        }
    )
    doc = {
        "users": [{"email": "al@x.com"}],
        "items": [{"price": 3}, {"price": 4.5}],
    }
    out = json.loads(
        fn(pd.Series([json.dumps(doc)]), pd.Series(["k"])).iloc[0]
    )
    assert out["users"][0]["email"] == "***"
    assert out["total"] == 7.5
    assert out["summary"] == "2 items"


def test_anonymize_udf_program_error_leaves_doc():
    fn = anonymize_json_udf({".a = (1 / 0)": None})
    out = json.loads(
        fn(pd.Series([json.dumps({"a": 5})]), pd.Series(["k"])).iloc[0]
    )
    assert out == {"a": 5}


def test_anonymize_udf_program_with_transformer_rejects():
    with pytest.raises(ValueError, match="defines its own output"):
        anonymize_json_udf(
            {"reduce .[] as $x (0; .)": lambda v, k: v}
        )


def test_prelude_is_real_jq():
    # the derived builtins are themselves jq programs through def/closures
    assert run("map(select(. > 1))", [1, 2, 3]) == [[2, 3]]
    assert run("[.[] | objects]", [{"a": 1}, 2, "x"]) == [[{"a": 1}]]


def test_deterministic_only():
    for prog in ("now", "env", "input"):
        with pytest.raises(JqError, match="deterministic|not supported"):
            run(prog, None)


def test_jq_total_order_arrays_objects():
    assert run("sort", [[2], [1, 5], [1]], None) == [[[1], [1, 5], [2]]]
    assert run('[{"b":1}, {"a":9}] | sort | .[0]', None) == [{"a": 9}]


def test_object_stream_keys_cartesian():
    assert run("{(.ks[]): 1}", {"ks": ["a", "b"]}) == [{"a": 1}, {"b": 1}]
