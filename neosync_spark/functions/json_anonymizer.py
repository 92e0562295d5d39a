"""Free-form JSON anonymization — the AnonymizeSingle/Many analog.

The reference compiles a gojq program embedding transformer functions
and runs it per document (/root/reference/internal/json-anonymizer/
json-anonymizer.go:215-236 buildJqQuery, :336-383 AnonymizeJSONObjects),
with type-based default transformers + skip paths (:238-298).

Two Spark-first paths:

* ``anonymize_json_field`` — schema-known: from_json → transform struct
  fields with JVM masking expressions → to_json. Zero Python; use when
  the JSON shape is declared (e.g. the transcript `tool` column).
* ``anonymize_json_udf`` — schemaless: a vectorized pandas UDF walking
  each document, applying a {dot.path: TransformFn} mapping plus
  optional type-based defaults with skip-paths — jq paths become dot
  paths. The per-row Python is confined to one Arrow batch pass.
"""

from __future__ import annotations

import json
import math
import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import jq_mini
from .transformers import TransformFn


def anonymize_json_field(
    col: Column | str,
    schema: T.StructType,
    field_exprs: dict[str, Column | Callable[[Column], Column]],
) -> Column:
    """Schema-known JSON anonymization, all JVM-side.

    ``field_exprs`` maps top-level field names to replacements: either a
    ready Column expression, or a callable that receives the parsed
    field Column (``lambda f: F.sha2(f, 256)``) — use the callable form
    to transform the field's own value.

    Conditional array selectors — the jq ``.arr[] | select(.f=="v") |
    .target`` analog the reference compiles via gojq
    (json-anonymizer.go:215-236) — are supported as keys of the form
    ``"arr[?field==value].target"``: compiled to a JVM
    ``transform(arr, x -> when(x.field == value, <replace target>, x))``
    over a typed array<struct> field. Zero Python, codegen-friendly.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, schema)
    plain: dict[str, object] = {}
    dels: set[str] = set()
    conds: dict[str, list[tuple[str, str, str, object]]] = {}
    for key, e in field_exprs.items():
        if _looks_like_jq(key):
            # a comma stream (`.a, .b` / `del(.a, .b)`) expands to one
            # entry per target on the same JVM surface
            for toks in parse_jq_multi(key):
                if (
                    len(toks) == 2
                    and toks[0] == ("del",)
                    and isinstance(toks[1], str)
                ):
                    # top-level del(.field): drop from the rebuilt struct
                    dels.add(toks[1])
                    continue
                if (
                    len(toks) == 1
                    and isinstance(toks[0], str)
                    and toks[0] != "[]"
                ):
                    plain[toks[0]] = e
                    continue
                if (
                    len(toks) == 4
                    and isinstance(toks[0], str)
                    and toks[1] == "[]"
                    and isinstance(toks[2], tuple)
                    and toks[2][0] == "sel"
                    and len(toks[2]) == 4
                    and toks[2][2] == "=="
                    and "." not in toks[2][1]
                    and isinstance(toks[3], str)
                ):
                    conds.setdefault(toks[0], []).append(
                        (toks[2][1], toks[2][3], toks[3], e)
                    )
                    continue
                raise ValueError(
                    f"jq program {key!r} exceeds the schema-known JVM "
                    "surface (a top-level field or "
                    '`.arr[] | select(.f=="v") | .target`);'
                    " use anonymize_json_udf for the full walker"
                )
            continue
        m = _COND_KEY_RE.match(key)
        if m:
            arr_f, cond_f, cond_v, target_f = m.groups()
            conds.setdefault(arr_f, []).append((cond_f, cond_v, target_f, e))
        else:
            plain[key] = e
    rebuilt = []
    for f_ in schema.fields:
        if f_.name in dels:
            continue
        if f_.name in plain:
            e = plain[f_.name]
            if callable(e) and not isinstance(e, Column):
                e = e(parsed.getField(f_.name))
            rebuilt.append(e.alias(f_.name))
        elif f_.name in conds:
            if not (
                isinstance(f_.dataType, T.ArrayType)
                and isinstance(f_.dataType.elementType, T.StructType)
            ):
                raise ValueError(
                    f"conditional selector on {f_.name!r} requires an "
                    "array<struct> field"
                )
            elem_fields = [ef.name for ef in f_.dataType.elementType.fields]
            arr = parsed.getField(f_.name)
            for cond_f, cond_v, target_f, e in conds[f_.name]:
                if cond_f not in elem_fields or target_f not in elem_fields:
                    raise ValueError(
                        f"unknown element field in selector "
                        f"{f_.name}[?{cond_f}=={cond_v}].{target_f}"
                    )

                def _mk(_cf, _cv, _tf, _e):
                    def _elem(x):
                        def fld(name):
                            if name != _tf:
                                return x.getField(name).alias(name)
                            v = _e
                            if callable(v) and not isinstance(v, Column):
                                v = v(x.getField(name))
                            return v.alias(name)

                        replaced = F.struct(*[fld(n) for n in elem_fields])
                        return F.when(
                            x.getField(_cf) == F.lit(_cv), replaced
                        ).otherwise(x)

                    return _elem

                arr = F.transform(arr, _mk(cond_f, cond_v, target_f, e))
            rebuilt.append(arr.alias(f_.name))
        else:
            rebuilt.append(parsed.getField(f_.name).alias(f_.name))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.to_json(F.struct(*rebuilt))
    )


# 'arr[?field==value].target' — conditional selector key
_COND_KEY_RE = re.compile(r"^(\w+)\[\?(\w+)==([^\]]*)\]\.(\w+)$")


# ---------------------------------------------------------------------------
# jq-syntax front-end
# ---------------------------------------------------------------------------
# The reference's mapping keys are gojq programs
# (json-anonymizer.go:215-236 buildJqQuery). The subset a user actually
# writes in anonymization configs — dot paths, `[]` iteration, numeric
# indices, `select(.f == <literal>)` with == / !=, and pipes — compiles
# here onto the SAME walker tokens the bracket syntax uses, so
# `.messages[] | select(.role=="user") | .text` and
# `$.messages[?role==user].text` are one code path.

_JQ_SELECT_RE = re.compile(r"^select\((.*)\)$", re.DOTALL)
# a trailing '?' (gojq optional access: `.a?`, `.a[]?`) is parsed and
# dropped — the walker is already total over missing/mistyped nodes,
# which IS `?` semantics
_JQ_SEG_RE = re.compile(r"\.([A-Za-z_]\w*)\??|\[(-?\d+)\]\??|(\[\])\??")


def _split_pipes(s: str) -> list[str]:
    """Split on top-level '|' (not inside quotes or parens)."""
    parts, buf, depth, q = [], [], 0, None
    for ch in s:
        if q is not None:
            buf.append(ch)
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "|" and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf).strip())
    return parts


def _parse_jq_literal(lit: str):
    try:
        return json.loads(lit)
    except json.JSONDecodeError:
        if len(lit) >= 2 and lit[0] == lit[-1] == "'":
            return lit[1:-1]
        raise ValueError(f"unsupported jq literal {lit!r}") from None


# --------------------------------------------------- select() predicates
# gojq select bodies beyond `.f == lit` (json-anonymizer.go compiles the
# full language; the forms below are what anonymization configs use):
# relational < <= > >=, `and` / `or` (jq precedence: and binds tighter),
# regex `.f | test("re"[; "flags"])`, parentheses, bare-path truth, and
# arithmetic operands (`.a + .b > 10`, `.n % 2 == 0`) with jq's
# number/string/array `+` semantics. One documented deviation: where jq
# ERRORS on a type-mismatched arithmetic (null + 1), the predicate is
# False — an anonymization gate must never abort the batch on one
# malformed document.

_TEST_RE = re.compile(
    r"^\.([A-Za-z_][\w.]*)\s*\|\s*test\(\s*(\"(?:[^\"\\]|\\.)*\")"
    r"(?:\s*;\s*\"([a-zA-Z]*)\")?\s*\)$",
    re.DOTALL,
)
_BARE_PATH_RE = re.compile(r"^\.([A-Za-z_][\w.]*)$")
_HAS_RE = re.compile(r"^has\(\s*(\"(?:[^\"\\]|\\.)*\")\s*\)$")
_LEN_RE = re.compile(r"^(?:\.([A-Za-z_][\w.]*)\s*\|\s*)?length$")
# `.f | contains("s")` / startswith / endswith — gojq string predicates
# (string-only here; gojq's array/object containment is out of surface)
_STRFN_RE = re.compile(
    r"^\.([A-Za-z_][\w.]*)\s*\|\s*(contains|startswith|endswith)"
    r"\(\s*(\"(?:[^\"\\]|\\.)*\")\s*\)$",
    re.DOTALL,
)


def _split_word(s: str, word: str) -> list[str]:
    """Split on a top-level bare keyword (not inside quotes/parens)."""
    parts, buf, depth, q, i = [], [], 0, None, 0
    n, wl = len(s), len(word)
    while i < n:
        ch = s[i]
        if q is not None:
            buf.append(ch)
            if ch == "\\" and i + 1 < n:
                buf.append(s[i + 1])
                i += 2
                continue
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif (
            depth == 0
            and s.startswith(word, i)
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + wl >= n
                or not (s[i + wl].isalnum() or s[i + wl] == "_")
            )
        ):
            parts.append("".join(buf))
            buf = []
            i += wl
            continue
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts]


_CMP_OPS = ("==", "!=", "<=", ">=", "<", ">")


def _split_cmp(s: str) -> tuple[str, str, str] | None:
    """Split on the single top-level comparison operator (outside
    quotes/parens). None if there isn't exactly one."""
    found = None
    depth, q, i, n = 0, None, 0, len(s)
    while i < n:
        ch = s[i]
        if q is not None:
            if ch == "\\":
                i += 2
                continue
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            for op in _CMP_OPS:
                if s.startswith(op, i):
                    if found is not None:
                        return None  # two comparisons: not a leaf
                    found = (s[:i], op, s[i + len(op):])
                    i += len(op)
                    break
            else:
                i += 1
            continue
        i += 1
    return found


def _parse_arith(s: str):
    """Parse an arithmetic operand to
    ('path', dotted) | ('lit', v) | ('bin', op, l, r)
    with standard precedence (* / % over + -) and parentheses."""
    s = s.strip()
    for ops in ("+-", "*/%"):
        parts = _split_arith_ops(s, ops)
        if len(parts) > 1:
            node = _parse_arith(parts[0][1])
            for op, part in parts[1:]:
                node = ("bin", op, node, _parse_arith(part))
            return node
    if s.startswith("(") and s.endswith(")"):
        depth = 0
        for j, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and j < len(s) - 1:
                    break
        else:
            return _parse_arith(s[1:-1])
    if s == ".":
        return ("path", "")  # identity: the current item
    m = _LEN_RE.match(s)
    if m:
        return ("len", m.group(1))  # None = length of the current item
    m = _BARE_PATH_RE.match(s)
    if m:
        return ("path", m.group(1))
    if _is_interp_str(s):
        return _parse_interp(s)  # "\(.x)" as a comparison operand
    return ("lit", _parse_jq_literal(s))  # number/string/bool/null


def _split_arith_ops(s: str, ops: str) -> list:
    """Split on top-level single-char operators from ``ops``; returns
    [(None, first), (op, part), ...]. A '-' at the start or right
    after another operator is a sign, not a split point; '//' (the jq
    alternative operator) is never an arithmetic '/'."""
    segs: list = []
    cur_op = None
    buf: list = []
    depth, q, i, n = 0, None, 0, len(s)
    prev_operand = False  # a completed operand precedes position i
    while i < n:
        ch = s[i]
        if q is not None:
            buf.append(ch)
            if ch == "\\" and i + 1 < n:
                buf.append(s[i + 1])
                i += 2
                continue
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
            buf.append(ch)
            prev_operand = True
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
            prev_operand = True
        elif (
            depth == 0
            and ch in ops
            and (ch != "-" or prev_operand)
            and (ch != "/" or not s.startswith("//", i))
        ):
            segs.append((cur_op, "".join(buf).strip()))
            cur_op, buf, prev_operand = ch, [], False
            i += 1
            continue
        else:
            buf.append(ch)
            if not ch.isspace():
                prev_operand = True
        i += 1
    segs.append((cur_op, "".join(buf).strip()))
    return segs


def _parse_select_pred(body: str) -> tuple:
    """Parse a select() body to a predicate AST:
    ('cmp', path, op, lit) | ('acmp', op, lexpr, rexpr) |
    ('test', path, pattern, flags) |
    ('truthy', path) | ('and', l, r) | ('or', l, r)."""
    body = body.strip()
    ors = _split_word(body, "or")
    if len(ors) > 1:
        node = _parse_select_pred(ors[0])
        for part in ors[1:]:
            node = ("or", node, _parse_select_pred(part))
        return node
    ands = _split_word(body, "and")
    if len(ands) > 1:
        node = _parse_select_pred(ands[0])
        for part in ands[1:]:
            node = ("and", node, _parse_select_pred(part))
        return node
    if body.startswith("(") and body.endswith(")"):
        # strip only if the parens actually match each other
        depth = 0
        for j, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and j < len(body) - 1:
                    break
        else:
            return _parse_select_pred(body[1:-1])
    m = _TEST_RE.match(body)
    if m:
        path, pat, flags = m.groups()
        return ("test", path, json.loads(pat), flags or "")
    m = _STRFN_RE.match(body)
    if m:
        path, fname, needle = m.groups()
        return ("strfn", fname, path, json.loads(needle))
    m = _HAS_RE.match(body)
    if m:
        return ("has", json.loads(m.group(1)))
    cmp_split = _split_cmp(body)
    if cmp_split:
        left, op, right = (x.strip() for x in cmp_split)
        l_ast, r_ast = _parse_arith(left), _parse_arith(right)
        if l_ast[0] == "path" and r_ast[0] == "lit":
            # plain `.f op literal` keeps the legacy node (JVM
            # schema-known fast path for == / !=)
            return ("cmp", l_ast[1], op, r_ast[1])
        return ("acmp", op, l_ast, r_ast)
    m = _BARE_PATH_RE.match(body)
    if m:
        return ("truthy", m.group(1))
    raise ValueError(f"unsupported select() predicate {body!r}")


def _jq_rank(v) -> int:
    """jq's total order: null < false < true < numbers < strings < …"""
    if v is None:
        return 0
    if isinstance(v, bool):
        return 1 if v is False else 2
    if isinstance(v, (int, float)):
        return 3
    if isinstance(v, str):
        return 4
    if isinstance(v, list):
        return 5
    if isinstance(v, dict):
        return 6
    return 7


def _jq_lt(a, b) -> bool:
    ra, rb = _jq_rank(a), _jq_rank(b)
    if ra != rb:
        return ra < rb
    if isinstance(a, (int, float)) and not isinstance(a, bool):
        return a < b
    if isinstance(a, str):
        return a < b
    return False  # same-rank null/bool/array/object: no strict order here


_ARITH_ERR = object()  # jq would error; we make the predicate False


def _eval_arith(item, node):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind in ("interp", "obj", "arr", "mini"):
        return _eval_value(item, node)
    if kind == "path":
        if node[1] == "":
            return item  # identity '.'
        return _cond_resolve(item, node[1])
    if kind == "len":
        v = item if node[1] is None else _cond_resolve(item, node[1])
        if v is None:
            return 0  # jq: null | length == 0
        if isinstance(v, bool):
            return _ARITH_ERR  # jq errors on booleans
        if isinstance(v, (int, float)):
            return abs(v)  # jq: length of a number is its magnitude
        return len(v)  # str / array / object
    _, op, ln, rn = node
    a, b = _eval_arith(item, ln), _eval_arith(item, rn)
    if a is _ARITH_ERR or b is _ARITH_ERR:
        return _ARITH_ERR
    num_a = isinstance(a, (int, float)) and not isinstance(a, bool)
    num_b = isinstance(b, (int, float)) and not isinstance(b, bool)
    if op == "+":
        # jq: numbers add, strings/arrays concat, null + x == x
        if num_a and num_b:
            return a + b
        if isinstance(a, str) and isinstance(b, str):
            return a + b
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        if a is None:
            return b
        if b is None:
            return a
        return _ARITH_ERR
    if not (num_a and num_b):
        return _ARITH_ERR
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b if b != 0 else _ARITH_ERR
    if int(b) == 0:
        return _ARITH_ERR
    # jq '%' truncates operands to int; result keeps the dividend's
    # sign (C semantics) — Python's % floors, fmod truncates
    return int(math.fmod(int(a), int(b)))


def _eval_pred(item, p: tuple) -> bool:
    kind = p[0]
    if kind == "and":
        return _eval_pred(item, p[1]) and _eval_pred(item, p[2])
    if kind == "or":
        return _eval_pred(item, p[1]) or _eval_pred(item, p[2])
    if kind == "acmp":
        _, op, ln, rn = p
        a, b = _eval_arith(item, ln), _eval_arith(item, rn)
        if a is _ARITH_ERR or b is _ARITH_ERR:
            return False
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op == "<":
            return _jq_lt(a, b)
        if op == ">":
            return _jq_lt(b, a)
        if op == "<=":
            return not _jq_lt(b, a)
        return not _jq_lt(a, b)  # >=
    if kind == "truthy":
        v = _cond_resolve(item, p[1])
        return v is not None and v is not False
    if kind == "has":
        # jq has() over objects (array-index form not supported)
        return isinstance(item, dict) and p[1] in item
    if kind == "test":
        _, path, pat, flags = p
        v = _cond_resolve(item, path)
        fl = re.IGNORECASE if "i" in flags else 0
        fl |= re.VERBOSE if "x" in flags else 0
        return isinstance(v, str) and re.search(pat, v, fl) is not None
    if kind == "strfn":
        # string-only (jq errors on non-strings; a gate must not abort)
        _, fname, path, needle = p
        v = _cond_resolve(item, path)
        if not isinstance(v, str):
            return False
        if fname == "contains":
            return needle in v
        if fname == "startswith":
            return v.startswith(needle)
        return v.endswith(needle)  # endswith
    _, path, op, lit = p
    v = _cond_resolve(item, path)
    if op == "==":
        return v == lit
    if op == "!=":
        return v != lit
    if op == "<":
        return _jq_lt(v, lit)
    if op == ">":
        return _jq_lt(lit, v)
    if op == "<=":
        return not _jq_lt(lit, v)
    return not _jq_lt(v, lit)  # >=


def _parse_path_stage(stage: str) -> list:
    if stage == ".":
        return []
    s = stage[1:] if stage.startswith(".[") else stage
    toks, pos = [], 0
    for m in _JQ_SEG_RE.finditer(s):
        if m.start() != pos:
            break
        pos = m.end()
        if m.group(1):
            toks.append(m.group(1))
        elif m.group(2) is not None:
            toks.append(("idx", int(m.group(2))))
        else:
            toks.append("[]")
    if pos != len(s) or not toks:
        raise ValueError(f"unsupported jq path segment {stage!r}")
    return toks


_JQ_DEL_RE = re.compile(r"^del\(\s*(.+?)\s*\)$")


def _split_alt(s: str) -> tuple[str, str | None]:
    """Split on a top-level '//' (not inside quotes or parens).
    jq's `|` binds looser than `//`, so splitting the whole program
    matches jq's parse for the config-shaped uses (`.a.b // "x"`)."""
    depth, q, i = 0, None, 0
    while i < len(s) - 1:
        ch = s[i]
        if q is not None:
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "/" and s[i + 1] == "/" and depth == 0:
            return s[:i].strip(), s[i + 2 :].strip()
        i += 1
    return s, None


def _split_commas(s: str) -> list[str]:
    """Split on top-level ',' (not inside quotes, parens or brackets).
    jq's ',' binds looser than '|' and '//', so a top-level split
    matches jq's parse for the config shapes (`.a, .b.c`)."""
    parts, buf, depth, q = [], [], 0, None
    for ch in s:
        if q is not None:
            buf.append(ch)
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf).strip())
    return parts


# ------------------------------------------------- value expressions
# gojq value-producing constructs (the tier a nontrivial reference
# TransformerMapping hits after del()/`//`): string interpolation
# `"\(.x)"`, object construction `{a: .b}`, array construction
# `[.a, 1]`, plus the arithmetic/path/literal leaves the predicate
# engine already evaluates. Used as assignment right-hand sides
# (`.a = <expr>`, `.a |= <expr>`), `//` alternatives, and select()
# comparison operands. reduce/foreach/variables/def stay rejected
# with explicit errors (see parse_jq).


def _parse_interp(s: str) -> tuple:
    """Parse a double-quoted string containing `\\(expr)` splices to
    ('interp', (part, ...)) where parts are plain strings or value
    ASTs."""
    body = s[1:-1]
    parts: list = []
    buf: list[str] = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch == "\\" and i + 1 < n and body[i + 1] == "(":
            if buf:
                parts.append("".join(buf))
                buf = []
            depth, j = 1, i + 2
            while j < n and depth:
                if body[j] == "(":
                    depth += 1
                elif body[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError(f"unterminated interpolation in {s!r}")
            parts.append(_parse_value_expr(body[i + 2 : j - 1]))
            i = j
            continue
        if ch == "\\" and i + 1 < n:
            buf.append(json.loads(f'"{body[i:i + 2]}"'))
            i += 2
            continue
        buf.append(ch)
        i += 1
    if buf:
        parts.append("".join(buf))
    return ("interp", tuple(parts))


def _is_interp_str(s: str) -> bool:
    return (
        len(s) >= 2
        and s[0] == s[-1] == '"'
        and "\\(" in s
    )


def _split_colon(s: str) -> tuple[str, str] | None:
    """Split on the first top-level ':' (outside quotes/parens/
    brackets/braces)."""
    depth, q, i = 0, None, 0
    while i < len(s):
        ch = s[i]
        if q is not None:
            if ch == "\\":
                i += 2
                continue
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == ":" and depth == 0:
            return s[:i].strip(), s[i + 1 :].strip()
        i += 1
    return None


_OBJ_KEY_RE = re.compile(r"^[A-Za-z_]\w*$")


def _parse_value_expr(s: str) -> tuple:
    """Parse a gojq value expression to an AST `_eval_value` runs:
    literals, dotted paths (``.`` = the current item), arithmetic,
    `length`, interpolation strings, object construction `{a: .b,
    "k": 1, shorthand}`, array construction `[.a, 1]`."""
    s = s.strip()
    if not s:
        raise ValueError("empty jq value expression")
    if s == ".":
        return ("path", "")
    if s.startswith("{") and s.endswith("}"):
        entries = []
        inner = s[1:-1].strip()
        for part in _split_commas(inner) if inner else []:
            kv = _split_colon(part)
            if kv is None:
                # gojq shorthand {a} == {a: .a}
                if not _OBJ_KEY_RE.match(part):
                    raise ValueError(
                        f"unsupported object-construction key {part!r}"
                    )
                entries.append((part, ("path", part)))
                continue
            k, v = kv
            if k.startswith('"') and k.endswith('"'):
                k = json.loads(k)
            elif not _OBJ_KEY_RE.match(k):
                raise ValueError(
                    f"unsupported object-construction key {k!r}"
                )
            entries.append((k, _parse_value_expr(v)))
        return ("obj", tuple(entries))
    if s.startswith("[") and s.endswith("]"):
        try:  # a plain JSON array literal stays a literal
            return ("lit", json.loads(s))
        except json.JSONDecodeError:
            inner = s[1:-1].strip()
            return (
                "arr",
                tuple(
                    _parse_value_expr(p)
                    for p in (_split_commas(inner) if inner else [])
                ),
            )
    if _is_interp_str(s):
        return _parse_interp(s)
    if _needs_mini(s):
        # reduce/foreach/if/try/$var/def value expressions compile on
        # the full mini-jq engine (its parse errors are already clear)
        return ("mini", jq_mini.compile_program(s))
    try:
        return _parse_arith(s)
    except ValueError:
        # anything past the arithmetic tier (function calls like
        # `.xs | join(",")`, pipes in expressions) → full engine
        return ("mini", jq_mini.compile_program(s))


def _jq_tostr(v) -> str:
    """jq interpolation stringification: strings splice as-is, every
    other value as its JSON encoding."""
    if isinstance(v, str):
        return v
    return json.dumps(v, separators=(",", ":"))


def _eval_value(item, node):
    """Evaluate a value AST against ``item`` (the jq ``.``). Returns
    ``_ARITH_ERR`` where jq would error — callers leave the target
    unchanged rather than aborting the batch."""
    kind = node[0]
    if kind == "mini":
        # full-engine expression: first output; empty stream or a jq
        # error leaves the target unchanged (the gate never aborts)
        try:
            outs = jq_mini.run(node[1], item)
        except jq_mini.JqError:
            return _ARITH_ERR
        return outs[0] if outs else _ARITH_ERR
    if kind == "obj":
        out = {}
        for k, vast in node[1]:
            v = _eval_value(item, vast)
            if v is _ARITH_ERR:
                return _ARITH_ERR
            out[k] = v
        return out
    if kind == "arr":
        vals = []
        for vast in node[1]:
            v = _eval_value(item, vast)
            if v is _ARITH_ERR:
                return _ARITH_ERR
            vals.append(v)
        return vals
    if kind == "interp":
        parts = []
        for p in node[1]:
            if isinstance(p, str):
                parts.append(p)
                continue
            v = _eval_value(item, p)
            if v is _ARITH_ERR:
                return _ARITH_ERR
            parts.append(_jq_tostr(v))
        return "".join(parts)
    if kind == "path" and node[1] == "":
        return item  # identity '.'
    return _eval_arith(item, node)


class _JqAssign:
    """A compiled jq assignment: ``<target> = <expr>`` / ``|= <expr>``.

    gojq semantics: ``|=``'s RHS sees the target's OLD value; ``=``'s
    RHS sees the value flowing INTO the assignment — the document root
    for a bare path (``.a.b = expr``), but the piped element for
    ``.users[] | select(…) | .name = expr`` (``|`` binds looser than
    ``=``). We honor that by splitting the target at its LAST
    top-level pipe: ``ctx_toks`` navigate to each context node,
    ``path_toks`` are the final-stage path assigned beneath it."""

    __slots__ = ("op", "ast", "ctx_toks", "path_toks")

    def __init__(self, op: str, ast: tuple, ctx_toks: tuple,
                 path_toks: tuple):
        self.op = op  # 'set' | 'update'
        self.ast = ast
        self.ctx_toks = ctx_toks
        self.path_toks = path_toks


def _iter_ctx_nodes(node, toks: tuple, i: int):
    """Yield every node the context tokens select (the assignment's
    input stream). Mirrors _transform_path's navigation, but yields
    nodes instead of transforming leaves."""
    if i >= len(toks):
        yield node
        return
    t = toks[i]
    if isinstance(t, tuple) and t[0] == "rdesc":
        yield from _iter_ctx_nodes(node, toks, i + 1)
        kids = (
            node.values() if isinstance(node, dict)
            else node if isinstance(node, list) else ()
        )
        for v in list(kids):
            if isinstance(v, (dict, list)):
                yield from _iter_ctx_nodes(v, toks, i)
        return
    if isinstance(t, tuple) and t[0] == "sel":
        if isinstance(node, dict) and _sel_ok(node, t):
            yield from _iter_ctx_nodes(node, toks, i + 1)
        return
    if isinstance(t, tuple) and t[0] == "idx":
        j = t[1]
        if isinstance(node, list) and -len(node) <= j < len(node):
            yield from _iter_ctx_nodes(node[j], toks, i + 1)
        return
    if _is_wild(t):
        if isinstance(node, list):
            for item in node:
                yield from _iter_ctx_nodes(item, toks, i + 1)
        return
    if isinstance(node, dict) and t in node:
        yield from _iter_ctx_nodes(node[t], toks, i + 1)


def _split_assign(s: str) -> tuple[str, str, str] | None:
    """Split a program on a top-level ``=`` / ``|=`` (outside quotes
    and parens; never part of == != <= >=). Returns
    (target, 'set'|'update', rhs) or None."""
    depth, q, i, n = 0, None, 0, len(s)
    while i < n:
        ch = s[i]
        if q is not None:
            if ch == "\\":
                i += 2
                continue
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch == "=":
            nxt = s[i + 1] if i + 1 < n else ""
            prev = s[i - 1] if i else ""
            if nxt == "=" or prev in "=!<>":
                i += 2 if nxt == "=" else 1
                continue
            if prev == "|":
                return s[: i - 1].strip(), "update", s[i + 1 :].strip()
            return s[:i].strip(), "set", s[i + 1 :].strip()
        i += 1
    return None


_JQ_REJECT_RE = re.compile(
    r"(?:^|[\s|(])(reduce|foreach|def|if|try)\s|\$[A-Za-z_]|\bas\s+\$"
)


def _needs_mini(program: str) -> bool:
    """True when the program uses constructs past the walker tier
    (reduce/foreach/if/try, variables, def) — compiled by the full
    mini-jq engine (jq_mini) instead of the walker."""
    return _JQ_REJECT_RE.search(_blank_strings(program)) is not None


def _blank_strings(s: str) -> str:
    """Replace quoted string literals with spaces (length-preserving)
    so keyword/variable scans don't fire on literal content like
    ``select(.t == "def x")`` or ``"$price"``."""
    out, q, i, n = list(s), None, 0, len(s)
    while i < n:
        ch = s[i]
        if q is not None:
            if ch == "\\" and i + 1 < n:
                out[i] = out[i + 1] = " "
                i += 2
                continue
            if ch == q:
                q = None
            else:
                out[i] = " "
        elif ch in "\"'":
            q = ch
        i += 1
    return "".join(out)


def _reject_unsupported(program: str) -> None:
    m = _JQ_REJECT_RE.search(_blank_strings(program))
    if m:
        raise ValueError(
            f"jq construct {m.group(0).strip()!r} in {program!r} exceeds "
            "the walker tier (paths, select(), del(), '//', assignment "
            "'='/'|=', interpolation, object/array construction). "
            "reduce/foreach/if/try/variables/def run on the full-program "
            "tier: pass the program as an anonymize_json_udf mapping key "
            "mapped to None."
        )


def parse_jq_multi(program: str) -> tuple[tuple, ...]:
    """Compile a jq program that may be a top-level comma stream of
    paths (`.a, .b.c` — transform every listed target) or a del() with
    multiple targets (`del(.a, .b)` — gojq's multi-path delete,
    json-anonymizer.go:215-236). Returns one walker-token tuple per
    target; a comma-free program compiles to a 1-tuple of parse_jq's
    result."""
    prog = program.strip()
    dm = _JQ_DEL_RE.match(prog)
    if dm:
        bodies = _split_commas(dm.group(1))
        if len(bodies) > 1:
            return tuple(parse_jq(f"del({b})") for b in bodies if b)
        return (parse_jq(prog),)
    parts = [p for p in _split_commas(prog) if p]
    if not parts:
        raise ValueError(f"empty jq program {program!r}")
    return tuple(parse_jq(p) for p in parts)


def parse_jq(program: str) -> tuple:
    """Compile a restricted jq program to walker tokens.

    Supported: `.a.b`, `.a[]`, `.[]`, `.a[3]`, pipes,
    `select(<pred>)` where <pred> is comparisons `== != < <= > >=`
    whose operands are JSON literals, dotted paths, or arithmetic over
    them (`.a + .b > 10`, `.n % 2 == 0`; jq `+` semantics: numbers
    add, strings/arrays concat, null is identity; a type-mismatched
    arithmetic makes the predicate False where jq would error),
    string predicates `.f | contains("s")` / `startswith` / `endswith`
    (string-only; non-string targets are False where jq errors),
    optional access `.a?` / `.a[]?` (parsed and dropped — the walker
    is already total over missing/mistyped nodes), with
    a missing field comparing as null under jq's cross-type total
    order null < false < true < numbers < strings; regex
    `.f | test("re"[; "i"])`, `has("key")` (objects), `[.f |] length`
    as a comparison operand (jq semantics: null→0, number→magnitude,
    str/array/object→size), bare `.f` truthiness, and `and` / `or`
    with parentheses (jq precedence: `and` binds tighter),
    `del(.path)` (drop the key —
    tokens get a ``('del',)`` head), recursive descent `.. | .field`
    (apply the remainder at every depth — tokens get a ``('rdesc',)``
    stage; not valid inside del()), and a trailing alternative
    `.path // <json literal>` (a missing/null target is materialized
    from the literal before transforming — tokens get an
    ``('alt', literal)`` tail). The program must end in a field path
    (anonymization targets a value, not a filtered stream).
    """
    _reject_unsupported(program)
    dm = _JQ_DEL_RE.match(program.strip())
    if dm:
        if "//" in dm.group(1):
            raise ValueError(f"del() target cannot carry '//': {program!r}")
        # a del target MAY end in a filter: `del(.xs[] | select(...))`
        # deletes the selected elements themselves
        body_toks = _parse_jq_body(dm.group(1), allow_filter_end=True)
        if any(isinstance(t, tuple) and t[0] == "rdesc" for t in body_toks):
            raise ValueError(
                f"del() does not support recursive descent: {program!r}"
            )
        return (("del",),) + body_toks
    body, alt_lit = _split_alt(program)
    toks = _parse_jq_body(body, allow_filter_end=False)
    if alt_lit is not None:
        try:
            toks = toks + (("alt", _parse_jq_literal(alt_lit)),)
        except ValueError:
            # `.a // <expr>`: the alternative may be any value
            # expression, evaluated per document against the root
            toks = toks + (("alt_expr", _parse_value_expr(alt_lit)),)
    return toks


def _parse_jq_body(program: str, allow_filter_end: bool) -> tuple:
    toks: list = []
    for stage in _split_pipes(program):
        if stage == "..":
            # gojq recursive descent: apply the REST of the program at
            # this node and at every descendant container — the
            # "anonymize every `email` anywhere" config shape
            toks.append(("rdesc",))
            continue
        m = _JQ_SELECT_RE.match(stage)
        if m:
            if not toks:
                raise ValueError(
                    f"jq program {program!r} cannot start with select()"
                )
            pred = _parse_select_pred(m.group(1))
            if pred[0] == "cmp" and pred[2] in ("==", "!="):
                # legacy 4-tuple keeps the JVM schema-known fast path
                toks.append(("sel", pred[1], pred[2], pred[3]))
            else:
                toks.append(("sel", pred))
        else:
            toks.extend(_parse_path_stage(stage))
    ends_in_filter = not toks or (
        isinstance(toks[-1], tuple) and toks[-1][0] in ("sel", "rdesc")
    )
    if ends_in_filter and not (allow_filter_end and toks):
        raise ValueError(
            f"jq program {program!r} must end in a value path "
            "(the anonymization target), not a select() filter"
        )
    return tuple(toks)


def _looks_like_jq(key: str) -> bool:
    return key.startswith(".") or "|" in key or key.startswith("del(")


def _cond_resolve(item, dotted: str):
    cur = item
    for part in dotted.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
    return cur


def _sel_ok(item, t: tuple) -> bool:
    if len(t) == 2:  # ('sel', <predicate AST>)
        return _eval_pred(item, t[1])
    _, cf, op, val = t
    eq = _cond_resolve(item, cf) == val
    return eq if op == "==" else not eq


_COND_SEG_RE = re.compile(r"^(\w*)\[\?(\w+)==([^\]]*)\]$")


def _path_tokens(p: str) -> tuple:
    """'$.users[].contact.email' → ('users', '[]', 'contact', 'email').
    A trailing '[]' on a segment is the gojq array-wildcard analog;
    'users[?role==admin]' emits a conditional wildcard token
    ('[?]', 'role', 'admin') — the ``.users[] | select(.role=="admin")``
    analog (reference compiles full jq programs incl. selects/pipes,
    json-anonymizer.go:215-236; dot paths + wildcards + selects cover
    the documented mapping surface)."""
    toks: list = []
    for seg in p.lstrip("$.").split("."):
        m = _COND_SEG_RE.match(seg)
        if m:
            name, cond_f, cond_v = m.groups()
            if name:
                toks.append(name)
            toks.append(("[?]", cond_f, cond_v))
        elif seg.endswith("[]"):
            if seg[:-2]:
                toks.append(seg[:-2])
            toks.append("[]")
        elif seg:
            toks.append(seg)
    return tuple(toks)


def _is_wild(t) -> bool:
    return t == "[]" or isinstance(t, tuple)


_NO_ALT = object()


def _trailing_sels(toks: tuple, i: int) -> tuple | None:
    """The sel tokens from position i to the end, or None if anything
    else follows — `del(.xs[] | select(...))` deletes the SELECTED
    elements, so a trailing-select suffix flips the walker from
    'descend' to 'remove here if matched'."""
    rest = toks[i:]
    if rest and all(isinstance(x, tuple) and x[0] == "sel" for x in rest):
        return rest
    return None


def _delete_path(node, toks: tuple, i: int) -> None:
    """del(.path): remove every location matching the token path
    (wildcards fan out; `del(.arr[])` empties the list, and a trailing
    select() deletes the selected elements, matching jq)."""
    if i >= len(toks):
        return
    t = toks[i]
    last = i == len(toks) - 1
    if isinstance(t, tuple) and t[0] == "sel":
        if isinstance(node, dict) and _sel_ok(node, t):
            _delete_path(node, toks, i + 1)
        return
    if isinstance(t, tuple) and t[0] == "idx":
        j = t[1]
        if isinstance(node, list) and -len(node) <= j < len(node):
            sels = None if last else _trailing_sels(toks, i + 1)
            if last:
                del node[j]
            elif sels is not None:
                if isinstance(node[j], dict) and all(
                    _sel_ok(node[j], s) for s in sels
                ):
                    del node[j]
            else:
                _delete_path(node[j], toks, i + 1)
        return
    if _is_wild(t):
        cond = t if isinstance(t, tuple) else None
        if isinstance(node, list):
            sels = None if last else _trailing_sels(toks, i + 1)

            def _cond_hit(x) -> bool:
                if cond is None:
                    return True
                _, cf, cv = cond
                return isinstance(x, dict) and str(x.get(cf)) == cv

            if last:
                node[:] = [x for x in node if not _cond_hit(x)]
            elif sels is not None:
                node[:] = [
                    x
                    for x in node
                    if not (
                        _cond_hit(x)
                        and isinstance(x, dict)
                        and all(_sel_ok(x, s) for s in sels)
                    )
                ]
            else:
                for item in node:
                    if _cond_hit(item):
                        _delete_path(item, toks, i + 1)
        return
    if isinstance(node, dict) and t in node:
        sels = None if last else _trailing_sels(toks, i + 1)
        if last:
            node.pop(t, None)
        elif sels is not None:
            if isinstance(node[t], dict) and all(
                _sel_ok(node[t], s) for s in sels
            ):
                node.pop(t, None)
        else:
            _delete_path(node[t], toks, i + 1)


def _transform_path(
    node, toks: tuple[str, ...], i: int, apply_one, key: str, alt=_NO_ALT
) -> None:
    """Apply ``apply_one(old_value, key)`` at every location matching
    the token path (wildcards fan out over list elements). With ``alt``
    (the jq `// literal` tail), a missing or null FINAL dict field is
    materialized from the literal before transforming."""
    if i >= len(toks):
        return
    t = toks[i]
    last = i == len(toks) - 1
    if isinstance(t, tuple) and t[0] == "rdesc":
        # gojq `..`: the remainder applies at THIS node and at every
        # descendant container. Each location is a distinct node, so a
        # value transforms at most once (parse_jq guarantees 'rdesc' is
        # never last, so `last` is unreachable here).
        _transform_path(node, toks, i + 1, apply_one, key, alt)
        if isinstance(node, dict):
            for k, v in list(node.items()):
                if isinstance(v, (dict, list)):
                    _transform_path(v, toks, i, apply_one, f"{key}.{k}", alt)
        elif isinstance(node, list):
            for j, item in enumerate(node):
                if isinstance(item, (dict, list)):
                    _transform_path(
                        item, toks, i, apply_one, f"{key}[{j}]", alt
                    )
        return
    if isinstance(t, tuple) and t[0] == "sel":
        # object-level select(): gate on the CURRENT node (parse_jq
        # guarantees 'sel' is never last). On a list, jq streams `[]`
        # first; a select directly on a list node matches nothing.
        if isinstance(node, dict) and _sel_ok(node, t):
            _transform_path(node, toks, i + 1, apply_one, key, alt)
        return
    if isinstance(t, tuple) and t[0] == "idx":
        j = t[1]
        if isinstance(node, list) and -len(node) <= j < len(node):
            if last:
                if node[j] is not None:
                    node[j] = apply_one(node[j], f"{key}[{j}]")
                elif alt is not _NO_ALT:
                    node[j] = apply_one(alt, f"{key}[{j}]")
            else:
                _transform_path(
                    node[j], toks, i + 1, apply_one, f"{key}[{j}]", alt
                )
        return
    if _is_wild(t):
        cond = t if isinstance(t, tuple) else None
        if isinstance(node, list):
            for j, item in enumerate(node):
                if cond is not None:
                    _, cf, cv = cond
                    if not (isinstance(item, dict) and str(item.get(cf)) == cv):
                        continue
                if last:
                    if item is not None:
                        node[j] = apply_one(item, f"{key}[{j}]")
                    elif alt is not _NO_ALT:
                        node[j] = apply_one(alt, f"{key}[{j}]")
                else:
                    _transform_path(
                        item, toks, i + 1, apply_one, f"{key}[{j}]", alt
                    )
        return
    if isinstance(node, dict):
        if last:
            if node.get(t) is not None:
                node[t] = apply_one(node[t], key)
            elif alt is not _NO_ALT:
                # jq `.path // literal`: absent/null target materializes
                # from the literal, then transforms
                node[t] = apply_one(alt, key)
        elif t in node:
            _transform_path(node[t], toks, i + 1, apply_one, key, alt)


def anonymize_json_udf(
    mapping: dict[str, TransformFn],
    default_string: TransformFn | None = None,
    skip_paths: tuple[str, ...] = (),
) -> Callable[[pd.Series, pd.Series], pd.Series]:
    """Schemaless JSON anonymizer as a (values, keys) pandas function.

    ``mapping``: dot-path → transformer (applied where the path exists;
    ``[]`` segments fan out over arrays, e.g. ``$.users[].email``);
    ``default_string``: optional type-based default applied to every
    other string leaf (reference applyDefaultTransformers), except
    ``skip_paths``.
    """
    def _compile_key(p: str) -> tuple[tuple, ...]:
        # a jq key may be a top-level comma stream (`.a, .b`) — one
        # transformer over several targets
        if _looks_like_jq(p):
            return parse_jq_multi(p)
        return (_path_tokens(p),)

    compiled: list[tuple[tuple, TransformFn]] = []
    for p, fn in mapping.items():
        if _needs_mini(p):
            # full-program tier (reduce/foreach/if/try/$var/def — the
            # arbitrary-gojq surface of json-anonymizer.go:215-236):
            # the program rewrites the WHOLE document (assignments,
            # del(), construction… are part of the language), so it
            # carries its own value — map it to None
            if fn is not None:
                raise ValueError(
                    f"full jq program {p!r} defines its own output; "
                    "map it to None, not a transformer"
                )
            compiled.append(((("prog", jq_mini.compile_program(p)),), None))
            continue
        asg = _split_assign(p) if _looks_like_jq(p) else None
        if asg is not None:
            # `.path = <expr>` / `.path |= <expr>`: the program itself
            # defines the transform (the exact shape the reference's
            # buildJqQuery emits — json-anonymizer.go:225-231)
            target, op, rhs = asg
            if fn is not None:
                raise ValueError(
                    f"assignment program {p!r} defines its own value; "
                    "map it to None, not a transformer"
                )
            if len(_split_commas(target)) > 1:
                raise ValueError(
                    f"comma stream as assignment target: {p!r} (jq "
                    "parses `.a, .b = x` as `.a, (.b = x)` — write "
                    "one assignment per mapping entry)"
                )
            stages = _split_pipes(target)
            ctx_toks = (
                _parse_jq_body(" | ".join(stages[:-1]), allow_filter_end=True)
                if len(stages) > 1
                else ()
            )
            path_toks = tuple(_parse_path_stage(stages[-1]))
            jq_fn = _JqAssign(op, _parse_value_expr(rhs), ctx_toks, path_toks)
            compiled.append((ctx_toks + path_toks, jq_fn))
            continue
        for path in _compile_key(p):
            compiled.append((path, fn))
    skips = {path for p in skip_paths for path in _compile_key(p)}
    # walk_defaults builds list-free paths (list hops keep the prefix),
    # so exclusion matching compares with wildcard tokens dropped
    _mapped_flat = {
        tuple(t for t in p if not _is_wild(t)) for p, _ in compiled
    }
    _skip_flat = {tuple(t for t in p if not _is_wild(t)) for p in skips}

    def walk_defaults(doc, fn_apply, prefix=()):
        if isinstance(doc, dict):
            for k, v in doc.items():
                path = prefix + (k,)
                if path in _skip_flat or path in _mapped_flat:
                    continue
                if isinstance(v, str):
                    doc[k] = fn_apply(v, ".".join(path))
                else:
                    walk_defaults(v, fn_apply, path)
        elif isinstance(doc, list):
            for i, v in enumerate(doc):
                if isinstance(v, str):
                    doc[i] = fn_apply(v, ".".join(prefix) + f"[{i}]")
                else:
                    walk_defaults(v, fn_apply, prefix)

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        out = []
        for v, k in zip(values, keys):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                out.append(None)
                continue
            try:
                doc = json.loads(v)
            except (json.JSONDecodeError, TypeError):
                out.append(v)  # not JSON: passthrough
                continue
            for path, tfn in compiled:
                if (
                    path
                    and isinstance(path[0], tuple)
                    and path[0][0] == "prog"
                ):
                    # whole-document program: the first output replaces
                    # the document (AnonymizeSingle semantics); an
                    # empty stream / jq error leaves it unchanged
                    try:
                        outs = jq_mini.run(path[0][1], doc)
                    except jq_mini.JqError:
                        outs = []
                    if outs:
                        doc = outs[0]
                    continue
                if path and path[0] == ("del",):
                    _delete_path(doc, path[1:], 0)
                    continue
                alt = _NO_ALT
                if path and isinstance(path[-1], tuple) and path[-1][0] == "alt":
                    alt = path[-1][1]
                    path = path[:-1]
                elif (
                    path
                    and isinstance(path[-1], tuple)
                    and path[-1][0] == "alt_expr"
                ):
                    # expression alternative: evaluated per document
                    # against the root (gojq `.a // expr` semantics)
                    v = _eval_value(doc, path[-1][1])
                    alt = _NO_ALT if v is _ARITH_ERR else v
                    path = path[:-1]
                base_key = f"{k}|{'.'.join(t for t in path if not _is_wild(t))}"
                if isinstance(tfn, _JqAssign):
                    # the assignment's input stream: each node the
                    # context tokens select (document root when the
                    # target has no pipes)
                    for ctx in _iter_ctx_nodes(doc, tfn.ctx_toks, 0):
                        def _apply(old, kk, _a=tfn, _ctx=ctx):
                            v = _eval_value(
                                _ctx if _a.op == "set" else old, _a.ast
                            )
                            return old if v is _ARITH_ERR else v

                        # gojq `=` creates a missing final field; the
                        # walker materializes alt then applies (the
                        # assign ignores the placeholder old value)
                        a2 = None if tfn.op == "set" else _NO_ALT
                        _transform_path(
                            ctx, tfn.path_toks, 0, _apply, base_key, a2
                        )
                    continue
                _transform_path(
                    doc,
                    path,
                    0,
                    lambda old, kk, _t=tfn: _t(
                        pd.Series([old]), pd.Series([kk])
                    ).iloc[0],
                    base_key,
                    alt,
                )
            if default_string is not None and isinstance(doc, dict):
                walk_defaults(
                    doc,
                    lambda s, p: default_string(
                        pd.Series([s]), pd.Series([f"{k}|{p}"])
                    ).iloc[0],
                )
            out.append(json.dumps(doc, separators=(",", ":")))
        return pd.Series(out, index=values.index, dtype=object)

    return fn
