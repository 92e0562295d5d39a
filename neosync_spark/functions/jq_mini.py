"""A self-contained mini-jq: tokenizer, parser, stream evaluator.

The reference embeds gojq and compiles *arbitrary* user programs per
mapping entry (/root/reference/internal/json-anonymizer/
json-anonymizer.go:215-236 buildJqQuery, :336-383 AnonymizeJSONObjects).
`json_anonymizer.parse_jq` covers the anonymization-config tier on a
walker that the JVM fast path shares; THIS module is the escape hatch
for the rest of the language: ``reduce`` / ``foreach``, variable
bindings (``as $x``), user-defined functions (``def f: …;``),
``if/then/elif/else/end``, ``try/catch``, path-based assignment over
computed paths, and a substantial builtin library — implemented from
the public jq manual + jq.y grammar (precedence ladder: ``|`` < ``,``
< ``//`` < assignments < ``or`` < ``and`` < comparisons < ``+ -`` <
``* / %``), NOT a gojq port (the reference is Go; this is a
hand-written Python evaluator over generator streams).

Semantics notes (documented deviations are deliberate and small):

* every expression evaluates to a *stream* (Python generator) — the
  faithful jq model; ``empty`` is the empty stream.
* errors raise :class:`JqError`; ``try``/``catch`` and the ``?``
  postfix convert them to empty streams, exactly like jq.
* ``reduce f as $x (init; update)``: if ``update`` yields multiple
  values the last wins; if it yields none the reduce contributes
  nothing (jq 1.6 behavior).
* ``.a |= empty`` deletes the path (gojq behavior).
* no ``label``/``break``, no destructuring patterns, no ``@format``
  strings, no ``import``/``include``, no ``input``/``inputs``, and no
  ``now``/``env`` (the engine requires deterministic programs). These
  raise a clear parse/eval error naming the construct.
"""

from __future__ import annotations

import json
import math
import re
from itertools import islice

__all__ = ["JqError", "compile_program", "run", "first_or"]


class JqError(Exception):
    """A jq runtime or parse error (jq's `error` / type errors)."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_KEYWORDS = {
    "def", "as", "reduce", "foreach", "if", "then", "elif", "else",
    "end", "and", "or", "try", "catch", "import", "include", "label",
    "__loc__",
}

_NUM_RE = re.compile(r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# multi-char operators, longest first
_OPS = (
    "?//", "//=", "|=", "+=", "-=", "*=", "/=", "%=", "==", "!=",
    "<=", ">=", "//", "..", "|", ",", "(", ")", "[", "]", "{", "}",
    ":", ";", "=", "<", ">", "+", "-", "*", "/", "%", "?", ".", "$",
    "@",
)


def _tokenize(src: str) -> list[tuple]:
    """Tokens: ('num', v) ('str', parts) ('ident', s) ('kw', s)
    ('var', s) ('field', s) ('format', s) ('op', s)."""
    toks: list[tuple] = []
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "#":  # comment to end of line
            while i < n and src[i] != "\n":
                i += 1
            continue
        if ch == '"':
            parts, i = _lex_string(src, i)
            toks.append(("str", parts))
            continue
        if ch == "." and i + 1 < n and (src[i + 1].isalpha() or src[i + 1] == "_"):
            m = _IDENT_RE.match(src, i + 1)
            toks.append(("field", m.group(0)))
            i = m.end()
            continue
        if ch == "." and i + 1 < n and src[i + 1] == '"':
            parts, j = _lex_string(src, i + 1)
            if len(parts) != 1 or not isinstance(parts[0], str):
                raise JqError("interpolation not allowed in .\"field\"")
            toks.append(("field", parts[0]))
            i = j
            continue
        if ch == "$":
            m = _IDENT_RE.match(src, i + 1)
            if not m:
                raise JqError(f"bad variable at {src[i:i + 10]!r}")
            toks.append(("var", m.group(0)))
            i = m.end()
            continue
        if ch == "@":
            m = _IDENT_RE.match(src, i + 1)
            if not m:
                raise JqError("bad @format")
            toks.append(("format", m.group(0)))
            i = m.end()
            continue
        if ch.isdigit():
            m = _NUM_RE.match(src, i)
            txt = m.group(0)
            v = float(txt) if any(c in txt for c in ".eE") else int(txt)
            toks.append(("num", v))
            i = m.end()
            continue
        if ch.isalpha() or ch == "_":
            m = _IDENT_RE.match(src, i)
            w = m.group(0)
            toks.append(("kw", w) if w in _KEYWORDS else ("ident", w))
            i = m.end()
            continue
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(("op", op))
                i += len(op)
                break
        else:
            raise JqError(f"unexpected character {ch!r} in jq program")
    toks.append(("eof", ""))
    return toks


def _lex_string(src: str, i: int) -> tuple[list, int]:
    """Lex a double-quoted string starting at src[i]=='"'. Returns
    (parts, end): parts mix plain strings and ('interp', raw-substr)
    entries for ``\\(...)`` splices."""
    assert src[i] == '"'
    parts: list = []
    buf: list[str] = []
    i += 1
    n = len(src)
    while i < n:
        ch = src[i]
        if ch == '"':
            if buf:
                parts.append("".join(buf))
            return parts, i + 1
        if ch == "\\":
            if i + 1 >= n:
                break
            nxt = src[i + 1]
            if nxt == "(":
                if buf:
                    parts.append("".join(buf))
                    buf = []
                depth, j, q = 1, i + 2, None
                while j < n and depth:
                    c = src[j]
                    if q is not None:
                        if c == "\\":
                            j += 2
                            continue
                        if c == q:
                            q = None
                    elif c == '"':
                        q = c
                    elif c == "(":
                        depth += 1
                    elif c == ")":
                        depth -= 1
                    j += 1
                if depth:
                    raise JqError("unterminated \\( interpolation")
                parts.append(("interp", src[i + 2 : j - 1]))
                i = j
                continue
            if nxt in '"\\/':
                buf.append(nxt)
            elif nxt == "n":
                buf.append("\n")
            elif nxt == "t":
                buf.append("\t")
            elif nxt == "r":
                buf.append("\r")
            elif nxt == "b":
                buf.append("\b")
            elif nxt == "f":
                buf.append("\f")
            elif nxt == "u":
                buf.append(json.loads(f'"{src[i:i + 6]}"'))
                i += 6
                continue
            else:
                raise JqError(f"bad escape \\{nxt}")
            i += 2
            continue
        buf.append(ch)
        i += 1
    raise JqError("unterminated string literal")


# ---------------------------------------------------------------------------
# parser — AST nodes are plain tuples headed by a kind string
# ---------------------------------------------------------------------------

_UNSUPPORTED_KW = {
    "import": "import/include", "include": "import/include",
    "label": "label/break", "__loc__": "__loc__",
}


class _Parser:
    def __init__(self, toks: list[tuple]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple:
        return self.toks[self.i]

    def next(self) -> tuple:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind: str, val: str | None = None) -> bool:
        k, v = self.toks[self.i]
        return k == kind and (val is None or v == val)

    def expect(self, kind: str, val: str | None = None) -> tuple:
        if not self.at(kind, val):
            k, v = self.peek()
            raise JqError(
                f"jq parse error: expected {val or kind!r}, got {v!r}"
            )
        return self.next()

    # --- precedence ladder (jq.y order) ---

    def parse_pipe(self):
        if self.at("kw", "def"):
            return self.parse_def()
        if self.at("kw") and self.peek()[1] in _UNSUPPORTED_KW:
            raise JqError(
                f"jq construct {_UNSUPPORTED_KW[self.peek()[1]]!r} is not "
                "supported by this engine"
            )
        lhs = self.parse_comma()
        if self.at("kw", "as"):
            self.next()
            if not self.at("var"):
                raise JqError(
                    "destructuring patterns in `as` are not supported — "
                    "bind a plain $variable"
                )
            var = self.next()[1]
            self.expect("op", "|")
            body = self.parse_pipe()
            return ("as", lhs, var, body)
        if self.at("op", "|"):
            self.next()
            return ("pipe", lhs, self.parse_pipe())
        return lhs

    def parse_def(self):
        self.expect("kw", "def")
        name = self.expect("ident")[1]
        params: list[str] = []
        if self.at("op", "("):
            self.next()
            while True:
                if self.at("var"):
                    params.append("$" + self.next()[1])
                else:
                    params.append(self.expect("ident")[1])
                if self.at("op", ";"):
                    self.next()
                    continue
                break
            self.expect("op", ")")
        self.expect("op", ":")
        body = self.parse_pipe()
        self.expect("op", ";")
        rest = self.parse_pipe()
        return ("def", name, tuple(params), body, rest)

    def parse_comma(self):
        node = self.parse_alt()
        while self.at("op", ","):
            self.next()
            node = ("comma", node, self.parse_alt())
        return node

    def parse_alt(self):
        lhs = self.parse_assign()
        if self.at("op", "//"):
            self.next()
            return ("alt", lhs, self.parse_alt())  # right-assoc
        return lhs

    _ASSIGN_OPS = {"=", "|=", "+=", "-=", "*=", "/=", "%=", "//="}

    def parse_assign(self):
        lhs = self.parse_or()
        if self.at("op") and self.peek()[1] in self._ASSIGN_OPS:
            op = self.next()[1]
            rhs = self.parse_or()  # nonassoc
            return ("assign", op, lhs, rhs)
        return lhs

    def parse_or(self):
        node = self.parse_and()
        while self.at("kw", "or"):
            self.next()
            node = ("or", node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_cmp()
        while self.at("kw", "and"):
            self.next()
            node = ("and", node, self.parse_cmp())
        return node

    _CMP_OPS = {"==", "!=", "<", "<=", ">", ">="}

    def parse_cmp(self):
        lhs = self.parse_add()
        if self.at("op") and self.peek()[1] in self._CMP_OPS:
            op = self.next()[1]
            return ("cmp", op, lhs, self.parse_add())  # nonassoc
        return lhs

    def parse_add(self):
        node = self.parse_mul()
        while self.at("op") and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("binop", op, node, self.parse_mul())
        return node

    def parse_mul(self):
        node = self.parse_unary()
        while self.at("op") and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = ("binop", op, node, self.parse_unary())
        return node

    def parse_unary(self):
        if self.at("op", "-"):
            self.next()
            return ("neg", self.parse_postfix())
        return self.parse_postfix()

    def parse_postfix(self):
        node = self.parse_primary()
        while True:
            if self.at("field"):
                node = ("index", node, ("lit", self.next()[1]))
            elif self.at("op", "["):
                self.next()
                if self.at("op", "]"):
                    self.next()
                    node = ("iterate", node)
                elif self.at("op", ":"):
                    self.next()
                    hi = self.parse_pipe()
                    self.expect("op", "]")
                    node = ("slice", node, None, hi)
                else:
                    idx = self.parse_pipe()
                    if self.at("op", ":"):
                        self.next()
                        if self.at("op", "]"):
                            self.next()
                            node = ("slice", node, idx, None)
                        else:
                            hi = self.parse_pipe()
                            self.expect("op", "]")
                            node = ("slice", node, idx, hi)
                    else:
                        self.expect("op", "]")
                        node = ("index", node, idx)
            elif self.at("op", "?"):
                self.next()
                node = ("try", node, None)
            elif self.at("op", ".") and self.toks[self.i + 1][0] in (
                "field",
            ):
                # `.a .b` (rare whitespace form) — treat as chained index
                self.next()
            else:
                return node

    def parse_primary(self):
        k, v = self.peek()
        if k == "num":
            self.next()
            return ("lit", v)
        if k == "str":
            self.next()
            return self._string_node(v)
        if k == "format":
            self.next()
            if v not in _FORMATS:
                raise JqError(f"@{v} is not a known format")
            if self.at("str"):
                parts = self.next()[1]
                return ("interp_fmt", v, self._string_node(parts))
            return ("format", v)
        if k == "var":
            self.next()
            return ("var", v)
        if k == "field":
            self.next()
            node: tuple = ("index", ("identity",), ("lit", v))
            return node
        if k == "op" and v == ".":
            self.next()
            if self.at("op", "["):
                return ("identity",)  # postfix loop consumes the bracket
            return ("identity",)
        if k == "op" and v == "..":
            self.next()
            return ("recurse0",)
        if k == "op" and v == "(":
            self.next()
            node = self.parse_pipe()
            self.expect("op", ")")
            return node
        if k == "op" and v == "[":
            self.next()
            if self.at("op", "]"):
                self.next()
                return ("collect", None)
            inner = self.parse_pipe()
            self.expect("op", "]")
            return ("collect", inner)
        if k == "op" and v == "{":
            return self.parse_object()
        if k == "kw" and v == "if":
            return self.parse_if()
        if k == "kw" and v == "reduce":
            self.next()
            src = self.parse_postfix()
            self.expect("kw", "as")
            var = self.expect("var")[1]
            self.expect("op", "(")
            init = self.parse_pipe()
            self.expect("op", ";")
            upd = self.parse_pipe()
            self.expect("op", ")")
            return ("reduce", src, var, init, upd)
        if k == "kw" and v == "foreach":
            self.next()
            src = self.parse_postfix()
            self.expect("kw", "as")
            var = self.expect("var")[1]
            self.expect("op", "(")
            init = self.parse_pipe()
            self.expect("op", ";")
            upd = self.parse_pipe()
            ext = None
            if self.at("op", ";"):
                self.next()
                ext = self.parse_pipe()
            self.expect("op", ")")
            return ("foreach", src, var, init, upd, ext)
        if k == "kw" and v == "try":
            self.next()
            body = self.parse_postfix()
            handler = None
            if self.at("kw", "catch"):
                self.next()
                handler = self.parse_postfix()
            return ("try", body, handler)
        if k == "kw" and v in _UNSUPPORTED_KW:
            raise JqError(
                f"jq construct {_UNSUPPORTED_KW[v]!r} is not supported by "
                "this engine"
            )
        if k == "ident":
            self.next()
            if v in ("true", "false", "null"):
                return ("lit", {"true": True, "false": False, "null": None}[v])
            args: list = []
            if self.at("op", "("):
                self.next()
                while True:
                    args.append(self.parse_pipe())
                    if self.at("op", ";"):
                        self.next()
                        continue
                    break
                self.expect("op", ")")
            return ("call", v, tuple(args))
        raise JqError(f"jq parse error: unexpected token {v!r}")

    def parse_if(self):
        self.expect("kw", "if")
        cond = self.parse_pipe()
        self.expect("kw", "then")
        then = self.parse_pipe()
        elifs = []
        while self.at("kw", "elif"):
            self.next()
            c2 = self.parse_pipe()
            self.expect("kw", "then")
            t2 = self.parse_pipe()
            elifs.append((c2, t2))
        els = None
        if self.at("kw", "else"):
            self.next()
            els = self.parse_pipe()
        self.expect("kw", "end")
        node = els if els is not None else ("identity",)
        for c2, t2 in reversed(elifs):
            node = ("if", c2, t2, node)
        return ("if", cond, then, node)

    def parse_object(self):
        self.expect("op", "{")
        entries: list = []
        if self.at("op", "}"):
            self.next()
            return ("object", tuple(entries))
        while True:
            k, v = self.peek()
            if k == "var":
                self.next()
                entries.append((("lit", v), ("var", v)))
            elif k in ("ident", "kw"):
                self.next()
                if self.at("op", ":"):
                    self.next()
                    entries.append((("lit", v), self.parse_objval()))
                else:
                    entries.append(
                        (("lit", v), ("index", ("identity",), ("lit", v)))
                    )
            elif k == "str":
                self.next()
                key_node = self._string_node(v)
                if self.at("op", ":"):
                    self.next()
                    entries.append((key_node, self.parse_objval()))
                else:
                    if key_node[0] != "lit":
                        raise JqError("interpolated key needs a value")
                    entries.append(
                        (
                            key_node,
                            ("index", ("identity",), key_node),
                        )
                    )
            elif k == "op" and v == "(":
                self.next()
                key_node = self.parse_pipe()
                self.expect("op", ")")
                self.expect("op", ":")
                entries.append((key_node, self.parse_objval()))
            else:
                raise JqError(f"bad object key token {v!r}")
            if self.at("op", ","):
                self.next()
                continue
            break
        self.expect("op", "}")
        return ("object", tuple(entries))

    def parse_objval(self):
        # jq object values are pipe-less unless parenthesized
        return self.parse_alt()

    def _string_node(self, parts: list):
        if not parts:
            return ("lit", "")
        if len(parts) == 1 and isinstance(parts[0], str):
            return ("lit", parts[0])
        out = []
        for p in parts:
            if isinstance(p, str):
                out.append(p)
            else:
                out.append(compile_program(p[1]))
        return ("interp", tuple(out))


def compile_program(src: str) -> tuple:
    """Parse a jq program to an AST tuple. Raises JqError on syntax the
    engine does not accept."""
    p = _Parser(_tokenize(src))
    node = p.parse_pipe()
    p.expect("eof")
    return node


# ---------------------------------------------------------------------------
# ordering / arithmetic helpers (jq's total order + operator semantics)
# ---------------------------------------------------------------------------


def _rank(v) -> int:
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
    return 6  # dict


def _cmp(a, b) -> int:
    ra, rb = _rank(a), _rank(b)
    if ra != rb:
        return -1 if ra < rb else 1
    if ra in (0, 1, 2):
        return 0
    if ra == 3:
        return -1 if a < b else (1 if a > b else 0)
    if ra == 4:
        return -1 if a < b else (1 if a > b else 0)
    if ra == 5:
        for x, y in zip(a, b):
            c = _cmp(x, y)
            if c:
                return c
        return _cmp(len(a), len(b))
    ka, kb = sorted(a.keys()), sorted(b.keys())
    c = _cmp(ka, kb)
    if c:
        return c
    for k in ka:
        c = _cmp(a[k], b[k])
        if c:
            return c
    return 0


class _Key:
    """Sort key wrapping jq's total order."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return _cmp(self.v, other.v) < 0

    def __eq__(self, other):
        return _cmp(self.v, other.v) == 0


def _type(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _is_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _binop(op: str, a, b):
    if op == "+":
        if a is None:
            return b
        if b is None:
            return a
        if _is_num(a) and _is_num(b):
            return a + b
        if isinstance(a, str) and isinstance(b, str):
            return a + b
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        if isinstance(a, dict) and isinstance(b, dict):
            return {**a, **b}
        raise JqError(f"{_type(a)} and {_type(b)} cannot be added")
    if op == "-":
        if _is_num(a) and _is_num(b):
            return a - b
        if isinstance(a, list) and isinstance(b, list):
            return [x for x in a if not any(_cmp(x, y) == 0 for y in b)]
        raise JqError(f"{_type(a)} and {_type(b)} cannot be subtracted")
    if op == "*":
        if _is_num(a) and _is_num(b):
            return a * b
        if isinstance(a, dict) and isinstance(b, dict):
            return _deep_merge(a, b)
        # string * number repeats (null when n <= 0) — jq manual
        if isinstance(a, str) and _is_num(b):
            return a * int(b) if b > 0 else None
        if isinstance(b, str) and _is_num(a):
            return b * int(a) if a > 0 else None
        raise JqError(f"{_type(a)} and {_type(b)} cannot be multiplied")
    if op == "/":
        if _is_num(a) and _is_num(b):
            if b == 0:
                raise JqError(f"{a} and {b} cannot be divided")
            return a / b
        if isinstance(a, str) and isinstance(b, str):
            return a.split(b) if b else list(a)
        raise JqError(f"{_type(a)} and {_type(b)} cannot be divided")
    # '%': jq truncates to int; result keeps the dividend's sign (C)
    if _is_num(a) and _is_num(b):
        if int(b) == 0:
            raise JqError(f"{a} and {b} cannot be divided")
        return int(math.fmod(int(a), int(b)))
    raise JqError(f"{_type(a)} and {_type(b)} cannot be divided (mod)")


def _deep_merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _truthy(v) -> bool:
    return v is not None and v is not False


def _tostr(v) -> str:
    if isinstance(v, str):
        return v
    return json.dumps(v, separators=(",", ":"), sort_keys=False)


# ---------------------------------------------------------------------------
# paths (assignment machinery): getpath / setpath / delpaths
# ---------------------------------------------------------------------------


def _getpath(v, path: list):
    for p in path:
        if v is None:
            return None
        if isinstance(p, str):
            if not isinstance(v, dict):
                raise JqError(
                    f'cannot index {_type(v)} with "{p}"'
                )
            v = v.get(p)
        elif isinstance(p, int):
            if not isinstance(v, list):
                raise JqError(f"cannot index {_type(v)} with number")
            v = v[p] if -len(v) <= p < len(v) else None
        else:
            raise JqError(f"invalid path component {p!r}")
    return v


def _setpath(v, path: list, newval):
    if not path:
        return newval
    p = path[0]
    if isinstance(p, str):
        if v is None:
            v = {}
        if not isinstance(v, dict):
            raise JqError(f'cannot index {_type(v)} with "{p}"')
        out = dict(v)
        out[p] = _setpath(v.get(p), path[1:], newval)
        return out
    if isinstance(p, int):
        if v is None:
            v = []
        if not isinstance(v, list):
            raise JqError(f"cannot index {_type(v)} with number")
        out = list(v)
        if p < 0:
            if -p > len(out):
                raise JqError("out of bounds negative array index")
            p = len(out) + p
        while len(out) <= p:
            out.append(None)
        out[p] = _setpath(out[p], path[1:], newval)
        return out
    raise JqError(f"invalid path component {p!r}")


def _delpath(v, path: list):
    if not path:
        return None
    p = path[0]
    if len(path) == 1:
        if isinstance(p, str):
            if v is None:
                return None
            if not isinstance(v, dict):
                raise JqError(f'cannot delete field of {_type(v)}')
            out = dict(v)
            out.pop(p, None)
            return out
        if isinstance(p, int):
            if v is None:
                return None
            if not isinstance(v, list):
                raise JqError("cannot delete element of " + _type(v))
            out = list(v)
            if -len(out) <= p < len(out):
                del out[p]
            return out
        raise JqError(f"invalid path component {p!r}")
    if v is None:
        return None  # jq: deleting under a missing path is a no-op
    child = _getpath(v, [p])
    if child is None:
        present = (
            isinstance(v, dict) and p in v
        ) or (
            isinstance(v, list)
            and isinstance(p, int)
            and -len(v) <= p < len(v)
        )
        if not present:
            return v
    newchild = _delpath(child, path[1:])
    return _setpath(v, [p], newchild)


def _delpaths(v, paths: list[list]):
    # deepest/rightmost first so earlier deletions don't shift later ones
    for p in sorted(paths, key=_Key, reverse=True):
        v = _delpath(v, list(p))
    return v


# ---------------------------------------------------------------------------
# environment
# ---------------------------------------------------------------------------


class _Env:
    __slots__ = ("vars", "funcs")

    def __init__(self, vars_: dict, funcs: dict):
        self.vars = vars_
        self.funcs = funcs

    def bind_var(self, name: str, value) -> "_Env":
        nv = dict(self.vars)
        nv[name] = value
        return _Env(nv, self.funcs)

    def bind_funcs(self, items: dict) -> "_Env":
        nf = dict(self.funcs)
        nf.update(items)
        return _Env(self.vars, nf)


class _Closure:
    __slots__ = ("params", "body", "env")

    def __init__(self, params, body, env):
        self.params = params
        self.body = body
        self.env = env


# ---------------------------------------------------------------------------
# evaluator — value streams
# ---------------------------------------------------------------------------


def _eval(node: tuple, v, env: _Env):
    kind = node[0]
    if kind == "lit":
        yield node[1]
    elif kind == "identity":
        yield v
    elif kind == "recurse0":
        yield from _recurse_all(v)
    elif kind == "var":
        name = node[1]
        if name not in env.vars:
            raise JqError(f"${name} is not defined")
        yield env.vars[name]
    elif kind == "pipe":
        for a in _eval(node[1], v, env):
            yield from _eval(node[2], a, env)
    elif kind == "comma":
        yield from _eval(node[1], v, env)
        yield from _eval(node[2], v, env)
    elif kind == "as":
        _, src, var, body = node
        for a in _eval(src, v, env):
            yield from _eval(body, v, env.bind_var(var, a))
    elif kind == "def":
        _, name, params, body, rest = node
        nf = dict(env.funcs)
        newenv = _Env(env.vars, nf)
        nf[(name, len(params))] = _Closure(params, body, newenv)
        yield from _eval(rest, v, newenv)
    elif kind == "index":
        _, base, idx = node
        for b in _eval(base, v, env):
            for i in _eval(idx, v, env):
                yield _index(b, i)
    elif kind == "slice":
        _, base, lo, hi = node
        for b in _eval(base, v, env):
            los = _eval(lo, v, env) if lo is not None else [None]
            for lv in los:
                his = _eval(hi, v, env) if hi is not None else [None]
                for hv in his:
                    yield _do_slice(b, lv, hv)
    elif kind == "iterate":
        for b in _eval(node[1], v, env):
            if isinstance(b, list):
                yield from b
            elif isinstance(b, dict):
                yield from b.values()
            else:
                raise JqError(f"cannot iterate over {_type(b)}")
    elif kind == "collect":
        if node[1] is None:
            yield []
        else:
            yield list(_eval(node[1], v, env))
    elif kind == "object":
        yield from _eval_object(node[1], 0, {}, v, env)
    elif kind == "interp":
        yield from _eval_interp(node[1], 0, "", v, env, None)
    elif kind == "format":
        yield _apply_format(node[1], v)
    elif kind == "interp_fmt":
        sub = node[2]
        if sub[0] == "lit":
            yield sub[1]  # no splices -> nothing to format
        else:
            yield from _eval_interp(sub[1], 0, "", v, env, node[1])
    elif kind == "if":
        _, cond, then, els = node
        for c in _eval(cond, v, env):
            yield from _eval(then if _truthy(c) else els, v, env)
    elif kind == "and":
        for a in _eval(node[1], v, env):
            if not _truthy(a):
                yield False
            else:
                for b in _eval(node[2], v, env):
                    yield _truthy(b)
    elif kind == "or":
        for a in _eval(node[1], v, env):
            if _truthy(a):
                yield True
            else:
                for b in _eval(node[2], v, env):
                    yield _truthy(b)
    elif kind == "alt":
        got = False
        for a in _eval(node[1], v, env):
            if _truthy(a):
                got = True
                yield a
        if not got:
            yield from _eval(node[2], v, env)
    elif kind == "cmp":
        _, op, ln, rn = node
        for a in _eval(ln, v, env):
            for b in _eval(rn, v, env):
                c = _cmp(a, b)
                yield {
                    "==": c == 0, "!=": c != 0, "<": c < 0,
                    "<=": c <= 0, ">": c > 0, ">=": c >= 0,
                }[op]
    elif kind == "binop":
        _, op, ln, rn = node
        for b in _eval(rn, v, env):
            for a in _eval(ln, v, env):
                yield _binop(op, a, b)
    elif kind == "neg":
        for a in _eval(node[1], v, env):
            if not _is_num(a):
                raise JqError(f"{_type(a)} cannot be negated")
            yield -a
    elif kind == "try":
        _, body, handler = node
        try:
            yield from _eval(body, v, env)
        except JqError as e:
            if handler is not None:
                yield from _eval(handler, str(e), env)
    elif kind == "reduce":
        _, src, var, init, upd = node
        for acc0 in _eval(init, v, env):
            acc = acc0
            dead = False
            for x in _eval(src, v, env):
                e2 = env.bind_var(var, x)
                outs = list(_eval(upd, acc, e2))
                if not outs:
                    dead = True
                    break
                acc = outs[-1]
            if not dead:
                yield acc
    elif kind == "foreach":
        _, src, var, init, upd, ext = node
        for acc0 in _eval(init, v, env):
            acc = acc0
            for x in _eval(src, v, env):
                e2 = env.bind_var(var, x)
                outs = list(_eval(upd, acc, e2))
                if not outs:
                    continue
                acc = outs[-1]
                if ext is None:
                    yield acc
                else:
                    yield from _eval(ext, acc, e2)
    elif kind == "assign":
        yield from _eval_assign(node, v, env)
    elif kind == "call":
        yield from _call(node[1], node[2], v, env)
    else:  # pragma: no cover
        raise JqError(f"unhandled AST node {kind!r}")


def _eval_object(entries, i, acc, v, env):
    if i == len(entries):
        yield dict(acc)
        return
    knode, vnode = entries[i]
    for k in _eval(knode, v, env):
        if not isinstance(k, str):
            raise JqError(f"object key must be a string, got {_type(k)}")
        for val in _eval(vnode, v, env):
            acc2 = dict(acc)
            acc2[k] = val
            yield from _eval_object(entries, i + 1, acc2, v, env)


def _eval_interp(parts, i, acc, v, env, fmt):
    if i == len(parts):
        yield acc
        return
    p = parts[i]
    if isinstance(p, str):
        yield from _eval_interp(parts, i + 1, acc + p, v, env, fmt)
    else:
        for x in _eval(p, v, env):
            s = _apply_format(fmt, x) if fmt else _tostr(x)
            yield from _eval_interp(parts, i + 1, acc + s, v, env, fmt)


def _index(b, i):
    if i is None:
        raise JqError(f"cannot index {_type(b)} with null")
    if isinstance(i, str):
        if b is None:
            return None
        if not isinstance(b, dict):
            raise JqError(f'cannot index {_type(b)} with "{i}"')
        return b.get(i)
    if _is_num(i):
        if b is None:
            return None
        if not isinstance(b, list):
            raise JqError(f"cannot index {_type(b)} with number")
        j = int(i)
        return b[j] if -len(b) <= j < len(b) else None
    raise JqError(f"cannot index {_type(b)} with {_type(i)}")


def _do_slice(b, lo, hi):
    if b is None:
        return None
    if not isinstance(b, (list, str)):
        raise JqError(f"cannot slice {_type(b)}")
    n = len(b)
    lo = 0 if lo is None else int(lo)
    hi = n if hi is None else int(hi)
    if lo < 0:
        lo = max(0, n + lo)
    if hi < 0:
        hi = max(0, n + hi)
    return b[lo:hi]


def _recurse_all(v):
    yield v
    if isinstance(v, dict):
        for x in v.values():
            yield from _recurse_all(x)
    elif isinstance(v, list):
        for x in v:
            yield from _recurse_all(x)


# ----- path evaluation (LHS of assignments, del(), paths()) -----


def _eval_paths(node: tuple, v, env: _Env):
    """Yield jq paths (lists of str/int) selected by a path expression."""
    kind = node[0]
    if kind == "identity":
        yield []
    elif kind == "recurse0":
        yield from _recurse_paths(v, [])
    elif kind == "index":
        _, base, idx = node
        for p in _eval_paths(base, v, env):
            sub = _getpath(v, p)
            for i in _eval(idx, v, env):
                if isinstance(i, str):
                    if sub is not None and not isinstance(sub, dict):
                        raise JqError(f'cannot index {_type(sub)} with "{i}"')
                elif _is_num(i):
                    i = int(i)
                    if sub is not None and not isinstance(sub, list):
                        raise JqError(
                            f"cannot index {_type(sub)} with number"
                        )
                else:
                    raise JqError(f"invalid path index {_type(i)}")
                yield p + [i]
    elif kind == "iterate":
        for p in _eval_paths(node[1], v, env):
            sub = _getpath(v, p)
            if isinstance(sub, list):
                for j in range(len(sub)):
                    yield p + [j]
            elif isinstance(sub, dict):
                for k in sub.keys():
                    yield p + [k]
            else:
                raise JqError(f"cannot iterate over {_type(sub)}")
    elif kind == "pipe":
        for p1 in _eval_paths(node[1], v, env):
            sub = _getpath(v, p1)
            for p2 in _eval_paths(node[2], sub, env):
                yield p1 + p2
    elif kind == "comma":
        yield from _eval_paths(node[1], v, env)
        yield from _eval_paths(node[2], v, env)
    elif kind == "call" and node[1] == "select":
        for c in _eval(node[2][0], v, env):
            if _truthy(c):
                yield []
    elif kind == "call" and node[1] in ("recurse",) and not node[2]:
        yield from _recurse_paths(v, [])
    elif kind == "call" and node[1] == "getpath" and len(node[2]) == 1:
        for p in _eval(node[2][0], v, env):
            if not isinstance(p, list):
                raise JqError("getpath path must be an array")
            yield list(p)
    elif kind == "if":
        _, cond, then, els = node
        for c in _eval(cond, v, env):
            yield from _eval_paths(then if _truthy(c) else els, v, env)
    elif kind == "try":
        try:
            yield from _eval_paths(node[1], v, env)
        except JqError:
            pass
    elif kind == "as":
        _, src, var, body = node
        for a in _eval(src, v, env):
            yield from _eval_paths(body, v, env.bind_var(var, a))
    elif kind == "def":
        _, name, params, body, rest = node
        nf = dict(env.funcs)
        newenv = _Env(env.vars, nf)
        nf[(name, len(params))] = _Closure(params, body, newenv)
        yield from _eval_paths(rest, v, newenv)
    elif kind == "call":
        key = (node[1], len(node[2]))
        clo = env.funcs.get(key)
        if clo is None:
            raise JqError(
                f"{node[1]}/{len(node[2])} is not a valid path expression"
            )
        env2 = _bind_call(clo, node[2], v, env)
        for e3, _v3 in env2:
            yield from _eval_paths(clo.body, v, e3)
    else:
        raise JqError(
            f"jq expression of kind {kind!r} is not a valid path "
            "(assignment left-hand sides must select positions)"
        )


def _recurse_paths(v, prefix):
    yield list(prefix)
    if isinstance(v, dict):
        for k, x in v.items():
            yield from _recurse_paths(x, prefix + [k])
    elif isinstance(v, list):
        for j, x in enumerate(v):
            yield from _recurse_paths(x, prefix + [j])


def _eval_assign(node, v, env):
    _, op, lhs, rhs = node
    if op == "=":
        for r in _eval(rhs, v, env):
            out = v
            for p in _eval_paths(lhs, out, env):
                out = _setpath(out, p, r)
            yield out
        return
    if op == "|=":
        out = v
        dels = []
        for p in _eval_paths(lhs, out, env):
            old = _getpath(out, p)
            news = list(_eval(rhs, old, env))
            if news:
                out = _setpath(out, p, news[0])
            else:
                dels.append(p)  # gojq: `|= empty` deletes the path
        if dels:
            out = _delpaths(out, dels)
        yield out
        return
    if op == "//=":
        for r in _eval(rhs, v, env):
            out = v
            for p in _eval_paths(lhs, out, env):
                if not _truthy(_getpath(out, p)):
                    out = _setpath(out, p, r)
            yield out
        return
    # arithmetic update-assign: `a op= b` == `a |= . op $b`,
    # $b evaluated against the ORIGINAL input
    bop = op[0]
    for r in _eval(rhs, v, env):
        out = v
        for p in _eval_paths(lhs, out, env):
            old = _getpath(out, p)
            out = _setpath(out, p, _binop(bop, old, r))
        yield out


# ---------------------------------------------------------------------------
# builtins
# ---------------------------------------------------------------------------


def _bind_call(clo: _Closure, args: tuple, v, caller_env: _Env):
    """Yield (env, None) pairs for each combination of $-param values;
    filter params bind as closures over the caller env."""
    fenv = clo.env
    # filter params first (no iteration)
    pend: list[tuple[str, tuple]] = []
    for p, a in zip(clo.params, args):
        if p.startswith("$"):
            pend.append((p, a))
        else:
            fenv = fenv.bind_funcs({(p, 0): _Closure((), a, caller_env)})

    def rec(i, e):
        if i == len(pend):
            yield e, None
            return
        name, a = pend[i]
        for val in _eval(a, v, caller_env):
            yield from rec(i + 1, e.bind_var(name[1:], val))

    yield from rec(0, fenv)


# @format library (jq manual; gojq semantics where jq 1.6 differs —
# @tsv ESCAPES \t/\n/\r/\\ like gojq/jq 1.7 instead of erroring)
_FORMATS = ("text", "json", "csv", "tsv", "html", "uri", "sh",
            "base64", "base64d")

_URI_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_.~"
)


def _fmt_scalar_csv(x):
    if x is None:
        return ""
    if isinstance(x, bool):
        return "true" if x else "false"
    if _is_num(x):
        return _tostr(x)
    if isinstance(x, str):
        return '"' + x.replace('"', '""') + '"'
    raise JqError(f"{_type(x)} is not valid in a csv row")


def _fmt_scalar_tsv(x):
    if x is None:
        return ""
    if isinstance(x, bool):
        return "true" if x else "false"
    if _is_num(x):
        return _tostr(x)
    if isinstance(x, str):
        return (
            x.replace("\\", "\\\\")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )
    raise JqError(f"{_type(x)} is not valid in a tsv row")


def _fmt_sh_one(x):
    if x is None or isinstance(x, bool) or _is_num(x):
        return _tostr(x)
    if isinstance(x, str):
        return "'" + x.replace("'", "'\\''") + "'"
    raise JqError(f"{_type(x)} can not be escaped for shell")


def _apply_format(fmt: str, v):
    import base64 as _b64

    if fmt == "text":
        return _tostr(v)
    if fmt == "json":
        return json.dumps(v, separators=(",", ":"))
    if fmt == "csv":
        if not isinstance(v, list):
            raise JqError(f"{_type(v)} cannot be csv-formatted")
        return ",".join(_fmt_scalar_csv(x) for x in v)
    if fmt == "tsv":
        if not isinstance(v, list):
            raise JqError(f"{_type(v)} cannot be tsv-formatted")
        return "\t".join(_fmt_scalar_tsv(x) for x in v)
    if fmt == "html":
        s = _tostr(v)
        return (
            s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace("'", "&#39;")
            .replace('"', "&quot;")
        )
    if fmt == "uri":
        return "".join(
            ch
            if ch in _URI_SAFE
            else "".join(f"%{b:02X}" for b in ch.encode("utf-8"))
            for ch in _tostr(v)
        )
    if fmt == "sh":
        if isinstance(v, list):
            return " ".join(_fmt_sh_one(x) for x in v)
        return _fmt_sh_one(v)
    if fmt == "base64":
        return _b64.b64encode(_tostr(v).encode("utf-8")).decode("ascii")
    # base64d
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be base64-decoded")
    try:
        return _b64.b64decode(v + "=" * (-len(v) % 4)).decode(
            "utf-8", "replace"
        )
    except Exception:
        raise JqError("invalid base64 input") from None


_RE_FLAGS = {"i": re.IGNORECASE, "x": re.VERBOSE, "s": re.DOTALL,
             "m": re.MULTILINE}

# jq/Oniguruma named groups are `(?<name>…)`; Python wants `(?P<name>…)`
_NAMED_GROUP_RE = re.compile(r"\(\?<(?![=!])")


def _pyre(pat: str) -> str:
    if not isinstance(pat, str):
        raise JqError("regex pattern must be a string")
    return _NAMED_GROUP_RE.sub("(?P<", pat)


def _re_flags(flags) -> int:
    fl = 0
    for ch in flags or "":
        if ch == "g":
            continue
        f = _RE_FLAGS.get(ch)
        if f is None:
            raise JqError(f"unsupported regex flag {ch!r}")
        fl |= f
    return fl


def _jq_sub(v, pat, repl_node, flags, env, global_):
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be matched")
    fl = _re_flags(flags)
    count = 0 if (global_ or "g" in (flags or "")) else 1
    out = []
    pos = 0
    done = 0
    for m in re.finditer(_pyre(pat), v, fl):
        if count and done >= count:
            break
        out.append(v[pos:m.start()])
        capt = {"0": m.group(0)}
        capt.update(
            {k: g for k, g in (m.groupdict() or {}).items()}
        )
        reps = list(_eval(repl_node, capt, env))
        if not reps:
            raise JqError("sub replacement produced no output")
        if not isinstance(reps[0], str):
            raise JqError("sub replacement must be a string")
        out.append(reps[0])
        pos = m.end()
        done += 1
        if m.start() == m.end():  # zero-width: avoid infinite loop
            if pos < len(v):
                out.append(v[pos])
                pos += 1
            else:
                break
    out.append(v[pos:])
    return "".join(out)


def _call(name: str, args: tuple, v, env: _Env):
    key = (name, len(args))
    clo = env.funcs.get(key)
    if clo is not None:
        for e2, _ in _bind_call(clo, args, v, env):
            yield from _eval(clo.body, v, e2)
        return
    fn = _BUILTINS.get(key)
    if fn is None:
        arities = [a for (n2, a) in list(env.funcs) + list(_BUILTINS)
                   if n2 == name]
        if arities:
            raise JqError(
                f"{name}/{len(args)} is not defined "
                f"(defined arities: {sorted(set(arities))})"
            )
        raise JqError(f"jq function {name!r} is not defined")
    yield from fn(args, v, env)


def _b(fn):
    """Wrap a plain value→value builtin as a stream builtin."""

    def g(args, v, env):
        yield fn(v)

    return g


def _length(v):
    if v is None:
        return 0
    if isinstance(v, bool):
        raise JqError("boolean has no length")
    if _is_num(v):
        return abs(v)
    return len(v)


def _keys(v):
    if isinstance(v, dict):
        return sorted(v.keys())
    if isinstance(v, list):
        return list(range(len(v)))
    raise JqError(f"{_type(v)} has no keys")


def _contains(a, b, top: bool = True) -> bool:
    """jq containment: strict type-matching at the TOP level (mismatch
    errors), lenient inside container recursion (mismatch is False) —
    the jq 1.6 binary contract, pinned by the differential suite."""
    if isinstance(a, str) and isinstance(b, str):
        return b in a
    if isinstance(a, list) and isinstance(b, list):
        return all(
            any(_contains(x, y, top=False) for x in a) for y in b
        )
    if isinstance(a, dict) and isinstance(b, dict):
        return all(
            k in a and _contains(a[k], bv, top=False)
            for k, bv in b.items()
        )
    if _rank(a) != _rank(b) or isinstance(a, (list, dict)):
        if top:
            raise JqError(
                f"{_type(a)} and {_type(b)} cannot have their "
                "containment checked"
            )
        return False
    return _cmp(a, b) == 0


def _tonumber(v):
    if _is_num(v):
        return v
    if isinstance(v, str):
        try:
            f = float(v)
        except ValueError:
            raise JqError(f"cannot parse {v!r} as number") from None
        return int(f) if f.is_integer() and "." not in v and "e" not in v.lower() else f
    raise JqError(f"{_type(v)} cannot be parsed as a number")


def _builtin_error(args, v, env):
    if not args:
        raise JqError(v if isinstance(v, str) else _tostr(v))
    for m in _eval(args[0], v, env):
        raise JqError(m if isinstance(m, str) else _tostr(m))
    return
    yield  # pragma: no cover


def _builtin_range(args, v, env):
    if len(args) == 1:
        for hi in _eval(args[0], v, env):
            x = 0
            while x < hi:
                yield x
                x += 1
        return
    step_node = args[2] if len(args) == 3 else None
    for lo in _eval(args[0], v, env):
        for hi in _eval(args[1], v, env):
            steps = _eval(step_node, v, env) if step_node else [1]
            for st in steps:
                if st == 0:
                    return
                x = lo
                while (x < hi) if st > 0 else (x > hi):
                    yield x
                    x += st


def _builtin_limit(args, v, env):
    for n in _eval(args[0], v, env):
        yield from islice(_eval(args[1], v, env), max(0, int(n)))


def _builtin_until(args, v, env):
    cond, upd = args
    cur = v
    while True:
        cs = list(_eval(cond, cur, env))
        if cs and _truthy(cs[0]):
            yield cur
            return
        outs = list(_eval(upd, cur, env))
        if not outs:
            return
        cur = outs[-1]


def _builtin_while(args, v, env):
    cond, upd = args
    cur = v
    while True:
        cs = list(_eval(cond, cur, env))
        if not (cs and _truthy(cs[0])):
            return
        yield cur
        outs = list(_eval(upd, cur, env))
        if not outs:
            return
        cur = outs[-1]


def _builtin_splits(args, v, env):
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be split")
    for pat in _eval(args[0], v, env):
        flags = [None]
        if len(args) == 2:
            flags = list(_eval(args[1], v, env))
        for fl in flags:
            yield from re.split(_pyre(pat), v, flags=_re_flags(fl))


def _re_arg(pat):
    """jq regex argument: a string, or [re, flags]."""
    if isinstance(pat, list):
        if not (1 <= len(pat) <= 2) or not all(
            isinstance(x, str) for x in pat
        ):
            raise JqError("regex array form must be [re] or [re, flags]")
        return pat[0], (pat[1] if len(pat) == 2 else None)
    if not isinstance(pat, str):
        raise JqError(f"{_type(pat)} is not a regex")
    return pat, None


def _match_objects(v, pat, flags):
    """jq match objects for pat over v (codepoint offsets; named and
    positional captures, unmatched groups offset -1)."""
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be matched")
    global_ = "g" in (flags or "")
    rx = re.compile(_pyre(pat), _re_flags(flags))
    names = {i: n for n, i in rx.groupindex.items()}
    # Oniguruma global-match loop: a position AT the end of a
    # non-empty string never yields another (zero-width) match —
    # pinned against the jq binary ("ab" gives a@0 then ""@1, never
    # ""@2; "" gives exactly ""@0)
    pos = 0
    while pos < len(v) or (pos == 0 and not v):
        m = rx.search(v, pos)
        if not m:
            return
        caps = []
        for gi in range(1, rx.groups + 1):
            s = m.group(gi)
            if s is None:
                # jq emits unmatched captures with this exact key
                # order (offset, string, length, name) — cosmetic, but
                # the differential comparator is strict
                caps.append({
                    "offset": -1, "string": None, "length": 0,
                    "name": names.get(gi),
                })
            else:
                caps.append({
                    "offset": m.start(gi), "length": len(s),
                    "string": s, "name": names.get(gi),
                })
        yield {
            "offset": m.start(),
            "length": len(m.group(0)),
            "string": m.group(0),
            "captures": caps,
        }
        if not global_:
            return
        pos = m.end() if m.end() > m.start() else m.end() + 1


def _builtin_match(args, v, env):
    for pat in _eval(args[0], v, env):
        p2, fl0 = _re_arg(pat)
        flags = [fl0]
        if len(args) == 2:
            flags = list(_eval(args[1], v, env))
        for fl in flags:
            yield from _match_objects(v, p2, fl)


def _builtin_scan(args, v, env):
    for pat in _eval(args[0], v, env):
        p2, fl0 = _re_arg(pat)
        flags = [fl0]
        if len(args) == 2:
            flags = list(_eval(args[1], v, env))
        for fl in flags:
            for m in _match_objects(v, p2, (fl or "") + "g"):
                if m["captures"]:
                    yield [c["string"] for c in m["captures"]]
                else:
                    yield m["string"]


def _builtin_test(args, v, env):
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be matched")
    for pat in _eval(args[0], v, env):
        p2, fl0 = _re_arg(pat)
        flags = [fl0]
        if len(args) == 2:
            flags = list(_eval(args[1], v, env))
        for fl in flags:
            yield re.search(_pyre(p2), v, _re_flags(fl)) is not None


def _builtin_sub(global_):
    def g(args, v, env):
        for pat in _eval(args[0], v, env):
            flags = [None]
            if len(args) == 3:
                flags = list(_eval(args[2], v, env))
            for fl in flags:
                yield _jq_sub(v, pat, args[1], fl, env, global_)

    return g


def _builtin_getpath(args, v, env):
    for p in _eval(args[0], v, env):
        if not isinstance(p, list):
            raise JqError("getpath path must be an array")
        yield _getpath(v, p)


def _builtin_setpath(args, v, env):
    for p in _eval(args[0], v, env):
        if not isinstance(p, list):
            raise JqError("setpath path must be an array")
        for nv in _eval(args[1], v, env):
            yield _setpath(v, p, nv)


def _builtin_delpaths(args, v, env):
    for ps in _eval(args[0], v, env):
        if not isinstance(ps, list):
            raise JqError("delpaths needs an array of paths")
        yield _delpaths(v, ps)


def _builtin_paths(args, v, env):
    it = _recurse_paths(v, [])
    next(it)  # jq paths excludes the root []
    if not args:
        yield from it
        return
    for p in it:
        sub = _getpath(v, p)
        for c in _eval(args[0], sub, env):
            if _truthy(c):
                yield p
            break


def _builtin_del(args, v, env):
    yield _delpaths(v, list(_eval_paths(args[0], v, env)))


def _builtin_path(args, v, env):
    yield from _eval_paths(args[0], v, env)


def _builtin_has(args, v, env):
    for k in _eval(args[0], v, env):
        yield _has(v, k)


def _has(v, k) -> bool:
    if v is None:
        return False  # jq: null | has(k) == false
    if isinstance(v, dict):
        if not isinstance(k, str):
            raise JqError(
                f"cannot check whether object has a {_type(k)} key"
            )
        return k in v
    if isinstance(v, list):
        if not _is_num(k):
            raise JqError(
                f"cannot check whether array has a {_type(k)} key"
            )
        return 0 <= int(k) < len(v)
    raise JqError(f"cannot check whether {_type(v)} has a key")


def _builtin_in(args, v, env):
    for container in _eval(args[0], v, env):
        yield _has(container, v)


def _builtin_sort_by(args, v, env):
    if not isinstance(v, list):
        raise JqError(f"{_type(v)} cannot be sorted")
    yield sorted(
        v, key=lambda x: _Key(list(_eval(args[0], x, env)))
    )


def _builtin_group_by(args, v, env):
    if not isinstance(v, list):
        raise JqError(f"{_type(v)} cannot be grouped")
    keyed = sorted(
        ((list(_eval(args[0], x, env)), x) for x in v),
        key=lambda kv: _Key(kv[0]),
    )
    out: list[list] = []
    prev = None
    for k, x in keyed:
        if out and _cmp(prev, k) == 0:
            out[-1].append(x)
        else:
            out.append([x])
            prev = k
    yield out


def _builtin_unique_by(args, v, env):
    if not isinstance(v, list):
        raise JqError(f"{_type(v)} cannot be uniqued")
    keyed = sorted(
        ((list(_eval(args[0], x, env)), x) for x in v),
        key=lambda kv: _Key(kv[0]),
    )
    out = []
    prev = None
    for k, x in keyed:
        if not out or _cmp(prev, k) != 0:
            out.append(x)
            prev = k
    yield out


def _minmax_by(pick_max):
    def g(args, v, env):
        if not isinstance(v, list):
            raise JqError(f"{_type(v)} has no min/max")
        if not v:
            yield None
            return
        keyed = [(list(_eval(args[0], x, env)), x) for x in v]
        best = keyed[0]
        for k, x in keyed[1:]:
            c = _cmp(k, best[0])
            if (c >= 0) if pick_max else (c < 0):
                best = (k, x)
        yield best[1]

    return g


def _builtin_tostring(args, v, env):
    yield _tostr(v)


def _builtin_ascii(fn):
    def g(args, v, env):
        if not isinstance(v, str):
            raise JqError(f"{_type(v)} cannot be case-mapped")
        yield fn(v)

    return g


def _strpred(checker):
    def g(args, v, env):
        for needle in _eval(args[0], v, env):
            if not isinstance(v, str) or not isinstance(needle, str):
                raise JqError("string predicate needs strings")
            yield checker(v, needle)

    return g


def _trimmer(fn):
    def g(args, v, env):
        for s in _eval(args[0], v, env):
            if isinstance(v, str) and isinstance(s, str):
                yield fn(v, s)
            else:
                yield v  # jq: non-strings pass through ltrimstr

    return g


def _builtin_split(args, v, env):
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be split")
    for s in _eval(args[0], v, env):
        if len(args) == 2:
            for fl in _eval(args[1], v, env):
                yield re.split(_pyre(s), v, flags=_re_flags(fl))
        else:
            if not isinstance(s, str):
                raise JqError("split separator must be a string")
            yield v.split(s) if s else list(v)


def _builtin_join(args, v, env):
    if isinstance(v, dict):
        v = list(v.values())
    if not isinstance(v, list):
        raise JqError(f"{_type(v)} cannot be joined")
    for s in _eval(args[0], v, env):
        parts = []
        for x in v:
            if x is None:
                parts.append("")
            elif isinstance(x, str):
                parts.append(x)
            elif isinstance(x, (list, dict)):
                raise JqError(
                    f"string and {_type(x)} cannot be added (join)"
                )
            else:
                parts.append(_tostr(x))
        yield s.join(parts)


def _builtin_tojson(args, v, env):
    yield json.dumps(v, separators=(",", ":"))


def _builtin_fromjson(args, v, env):
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be parsed as JSON")
    try:
        yield json.loads(v)
    except json.JSONDecodeError as e:
        raise JqError(f"invalid JSON text: {e}") from None


def _builtin_add(args, v, env):
    if not isinstance(v, (list, dict)):
        raise JqError(f"cannot add over {_type(v)}")
    items = v if isinstance(v, list) else list(v.values())
    if not items:
        yield None
        return
    acc = items[0]
    for x in items[1:]:
        acc = _binop("+", acc, x)
    yield acc


def _iterable_values(v) -> list:
    if isinstance(v, list):
        return v
    if isinstance(v, dict):
        return list(v.values())
    raise JqError(f"cannot iterate over {_type(v)}")


def _builtin_any0(args, v, env):
    yield any(_truthy(x) for x in _iterable_values(v))


def _builtin_all0(args, v, env):
    yield all(_truthy(x) for x in _iterable_values(v))


def _builtin_any1(args, v, env):
    yield any(
        any(_truthy(o) for o in _eval(args[0], x, env))
        for x in _iterable_values(v)
    )


def _builtin_all1(args, v, env):
    yield all(
        all(_truthy(o) for o in _eval(args[0], x, env))
        for x in _iterable_values(v)
    )


def _builtin_first1(args, v, env):
    yield from islice(_eval(args[0], v, env), 1)


def _builtin_last1(args, v, env):
    # jq: def last(f): reduce f as $x (null; $x); -> null on empty
    last = None
    for x in _eval(args[0], v, env):
        last = x
    yield last


def _builtin_recurse(args, v, env):
    if not args:
        yield from _recurse_all(v)
        return
    cond = args[1] if len(args) == 2 else None

    def rec(x):
        if cond is not None:
            ok = next(iter(_eval(cond, x, env)), False)
            if not _truthy(ok):
                return
        yield x
        try:
            for nxt in _eval(args[0], x, env):
                yield from rec(nxt)
        except JqError:
            return

    yield from rec(v)


def _builtin_env_rejected(name):
    def g(args, v, env):
        raise JqError(
            f"jq builtin {name!r} is not available (the engine requires "
            "deterministic programs)"
        )
        yield  # pragma: no cover

    return g


def _math1(fn, check=True):
    def g(args, v, env):
        if not _is_num(v):
            raise JqError(f"{_type(v)} is not a number")
        yield fn(v)

    return g


def _builtin_explode(args, v, env):
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be exploded")
    yield [ord(c) for c in v]


def _builtin_implode(args, v, env):
    if not isinstance(v, list) or not all(_is_num(c) for c in v):
        raise JqError(f"{_type(v)} cannot be imploded")
    try:
        yield "".join(chr(int(c)) for c in v)
    except (ValueError, OverflowError):
        raise JqError("implode: invalid character code") from None


def _builtin_todate(args, v, env):
    # deterministic pure conversion (epoch seconds → ISO8601 UTC)
    import datetime as _dt

    if not _is_num(v):
        raise JqError("todate input must be a number")
    yield _dt.datetime.fromtimestamp(
        v, tz=_dt.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")


def _builtin_fromdate(args, v, env):
    import datetime as _dt

    if not isinstance(v, str):
        raise JqError("fromdate input must be a string")
    try:
        dt = _dt.datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError as e:
        raise JqError(f"fromdate: {e}") from None
    yield int(dt.replace(tzinfo=_dt.timezone.utc).timestamp())


def _builtin_tostream_rejected(args, v, env):
    raise JqError("tostream/fromstream are not supported by this engine")
    yield  # pragma: no cover


_BUILTINS: dict[tuple[str, int], object] = {
    ("empty", 0): lambda a, v, e: iter(()),
    ("error", 0): _builtin_error,
    ("error", 1): _builtin_error,
    ("not", 0): _b(lambda v: not _truthy(v)),
    ("length", 0): _b(_length),
    ("utf8bytelength", 0): _b(
        lambda v: len(v.encode("utf-8"))
        if isinstance(v, str)
        else (_ for _ in ()).throw(JqError("utf8bytelength needs a string"))
    ),
    ("keys", 0): _b(_keys),
    ("keys_unsorted", 0): _b(
        lambda v: list(v.keys())
        if isinstance(v, dict)
        else _keys(v)
    ),
    ("values", 0): lambda a, v, e: iter(
        [v] if v is not None else []
    ),
    ("type", 0): _b(_type),
    ("tostring", 0): _builtin_tostring,
    ("tonumber", 0): _b(_tonumber),
    ("ascii_downcase", 0): _builtin_ascii(str.lower),
    ("ascii_upcase", 0): _builtin_ascii(str.upper),
    ("startswith", 1): _strpred(str.startswith),
    ("endswith", 1): _strpred(str.endswith),
    ("ltrimstr", 1): _trimmer(
        lambda v, s: v[len(s):] if v.startswith(s) else v
    ),
    ("rtrimstr", 1): _trimmer(
        lambda v, s: v[: -len(s)] if s and v.endswith(s) else v
    ),
    ("contains", 1): lambda a, v, e: (
        _contains(v, b) for b in _eval(a[0], v, e)
    ),
    ("inside", 1): lambda a, v, e: (
        _contains(b, v) for b in _eval(a[0], v, e)
    ),
    ("split", 1): _builtin_split,
    ("split", 2): _builtin_split,
    ("splits", 1): _builtin_splits,
    ("splits", 2): _builtin_splits,
    ("join", 1): _builtin_join,
    ("test", 1): _builtin_test,
    ("match", 1): _builtin_match,
    ("match", 2): _builtin_match,
    ("scan", 1): _builtin_scan,
    ("scan", 2): _builtin_scan,
    ("test", 2): _builtin_test,
    ("sub", 2): _builtin_sub(False),
    ("sub", 3): _builtin_sub(False),
    ("gsub", 2): _builtin_sub(True),
    ("gsub", 3): _builtin_sub(True),
    ("tojson", 0): _builtin_tojson,
    ("fromjson", 0): _builtin_fromjson,
    ("explode", 0): _builtin_explode,
    ("implode", 0): _builtin_implode,
    ("add", 0): _builtin_add,
    ("any", 0): _builtin_any0,
    ("all", 0): _builtin_all0,
    ("any", 1): _builtin_any1,
    ("all", 1): _builtin_all1,
    ("range", 1): _builtin_range,
    ("range", 2): _builtin_range,
    ("range", 3): _builtin_range,
    ("floor", 0): _math1(math.floor),
    ("ceil", 0): _math1(math.ceil),
    ("round", 0): _math1(lambda v: math.floor(v + 0.5)),
    ("fabs", 0): _math1(abs),
    ("abs", 0): _math1(abs),
    ("sqrt", 0): _math1(math.sqrt),
    ("pow", 2): lambda a, v, e: (
        x ** y
        for x in _eval(a[0], v, e)
        for y in _eval(a[1], v, e)
    ),
    ("log", 0): _math1(math.log),
    ("exp", 0): _math1(math.exp),
    ("isnan", 0): _b(lambda v: _is_num(v) and math.isnan(v)),
    ("isinfinite", 0): _b(lambda v: _is_num(v) and math.isinf(v)),
    ("infinite", 0): lambda a, v, e: iter([math.inf]),
    ("nan", 0): lambda a, v, e: iter([math.nan]),
    ("sort", 0): _b(
        lambda v: sorted(v, key=_Key)
        if isinstance(v, list)
        else (_ for _ in ()).throw(JqError(f"{_type(v)} cannot be sorted"))
    ),
    ("sort_by", 1): _builtin_sort_by,
    ("group_by", 1): _builtin_group_by,
    ("unique", 0): _b(lambda v: _unique(v)),
    ("unique_by", 1): _builtin_unique_by,
    ("reverse", 0): _b(
        lambda v: []
        if v is None
        else (
            v[::-1]
            if isinstance(v, (list, str))
            else (_ for _ in ()).throw(
                JqError(f"{_type(v)} cannot be reversed")
            )
        )
    ),
    ("min", 0): _b(
        lambda v: min(v, key=_Key, default=None)
        if isinstance(v, list)
        else (_ for _ in ()).throw(JqError("min input must be an array"))
    ),
    ("max", 0): _b(
        lambda v: max(v, key=_Key, default=None)
        if isinstance(v, list)
        else (_ for _ in ()).throw(JqError("max input must be an array"))
    ),
    ("min_by", 1): _minmax_by(False),
    ("max_by", 1): _minmax_by(True),
    ("flatten", 0): _b(lambda v: _flatten(v, 1 << 31)),
    ("flatten", 1): lambda a, v, e: (
        _flatten(v, int(d)) for d in _eval(a[0], v, e)
    ),
    ("has", 1): _builtin_has,
    ("in", 1): _builtin_in,
    ("first", 1): _builtin_first1,
    ("last", 1): _builtin_last1,
    ("limit", 2): _builtin_limit,
    ("until", 2): _builtin_until,
    ("while", 2): _builtin_while,
    ("recurse", 0): _builtin_recurse,
    ("recurse", 1): _builtin_recurse,
    ("recurse", 2): _builtin_recurse,
    ("getpath", 1): _builtin_getpath,
    ("setpath", 2): _builtin_setpath,
    ("delpaths", 1): _builtin_delpaths,
    ("paths", 0): _builtin_paths,
    ("paths", 1): _builtin_paths,
    ("del", 1): _builtin_del,
    ("path", 1): _builtin_path,
    ("todate", 0): _builtin_todate,
    ("fromdate", 0): _builtin_fromdate,
    ("now", 0): _builtin_env_rejected("now"),
    ("env", 0): _builtin_env_rejected("env"),
    ("input", 0): _builtin_env_rejected("input"),
    ("inputs", 0): _builtin_env_rejected("inputs"),
    ("tostream", 0): _builtin_tostream_rejected,
    ("fromstream", 1): _builtin_tostream_rejected,
}


def _unique(v):
    if not isinstance(v, list):
        raise JqError(f"{_type(v)} cannot be uniqued")
    s = sorted(v, key=_Key)
    return [x for i, x in enumerate(s) if i == 0 or _cmp(s[i - 1], x) != 0]


def _flatten(v, depth: int):
    if isinstance(v, dict):
        v = list(v.values())  # jq's flatten reduces over .[]
    if not isinstance(v, list):
        raise JqError(f"{_type(v)} cannot be flattened")
    out = []
    for x in v:
        if isinstance(x, list) and depth > 0:
            out.extend(_flatten(x, depth - 1))
        else:
            out.append(x)
    return out


# jq-defined derived builtins — parsed once at import; exercising the
# def/closure machinery is deliberate (they ARE jq programs).
_PRELUDE = """
def map(f): [.[] | f];
def map_values(f): .[] |= f;
def select(f): if f then . else empty end;
def to_entries: [keys_unsorted[] as $k | {key: $k, value: .[$k]}];
def with_entries(f): to_entries | map(f) | from_entries;
def first: .[0];
def last: .[-1];
def nth($n): .[$n];
def nth($n; f): last(limit($n + 1; f));
def indices($x):
  if ($x | type) == "string" and type == "string" then
    [range(length) as $i | select(.[$i:$i + ($x | length)] == $x) | $i]
  elif ($x | type) == "array" then
    [range(length) as $i
     | select(.[$i:$i + ($x | length)] == $x) | $i]
  else [range(length) as $i | select(.[$i] == $x) | $i]
  end;
def index($x): indices($x) | .[0];
def rindex($x): indices($x) | .[-1];
def ascii: [.] | implode;
def isempty(f): [limit(1; f)] | length == 0;
def repeat(f): def _r: f, _r; _r;
def leaf_paths: paths(type != "array" and type != "object");
def objects: select(type == "object");
def arrays: select(type == "array");
def booleans: select(type == "boolean");
def numbers: select(type == "number");
def strings: select(type == "string");
def nulls: select(type == "null");
def iterables: select(type == "array" or type == "object");
def scalars: select(type != "array" and type != "object");
def capture($re): capture($re; null);
def tostream_unsupported: error("tostream is not supported");
def halt_error: error;
def getpath_or_null($p): try getpath($p) catch null;
def pick(pathexps):
  . as $top
  | reduce path(pathexps) as $p (null; setpath($p; $top | getpath($p)));
def splits_on($s): split($s)[];
def trim: sub("^\\\\s+"; "") | sub("\\\\s+$"; "");
def ltrim: sub("^\\\\s+"; "");
def rtrim: sub("\\\\s+$"; "");
"""


def _capture_impl(args, v, env):
    if not isinstance(v, str):
        raise JqError(f"{_type(v)} cannot be matched")
    for pat in _eval(args[0], v, env):
        flags = [None]
        if len(args) == 2:
            flags = list(_eval(args[1], v, env))
        for fl in flags:
            m = re.search(_pyre(pat), v, _re_flags(fl if isinstance(fl, str) else None))
            if m:
                yield {k: g for k, g in m.groupdict().items()}


def _builtin_from_entries(args, v, env):
    if isinstance(v, dict):
        v = list(v.values())
    if not isinstance(v, list):
        raise JqError(f"{_type(v)} cannot be from_entries'd")
    out = {}
    _MISS = object()
    for e in v:
        if not isinstance(e, dict):
            raise JqError(f"from_entries entry is {_type(e)}, not object")
        k = None
        for kk in ("key", "k", "name", "Name"):
            if kk in e:
                k = e[kk]
                break
        if not isinstance(k, str):
            raise JqError(
                f"cannot use {_type(k)} as object key in from_entries"
            )
        val = None
        for vk in ("value", "v"):
            if vk in e:
                val = e[vk]
                break
        out[k] = val
    yield out


_BUILTINS[("from_entries", 0)] = _builtin_from_entries
_BUILTINS[("capture", 1)] = _capture_impl
_BUILTINS[("capture", 2)] = _capture_impl


def _load_prelude() -> dict:
    funcs: dict = {}
    env = _Env({}, funcs)
    src = _PRELUDE
    # parse as a chain of defs ending at `.`; extract each def into the
    # shared function table so later defs see earlier ones
    node = compile_program(src + "\n.")
    while node[0] == "def":
        _, name, params, body, rest = node
        funcs[(name, len(params))] = _Closure(params, body, env)
        node = rest
    return funcs


_PRELUDE_FUNCS = _load_prelude()


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def run(prog: tuple | str, value, variables: dict | None = None) -> list:
    """Run a compiled (or source) program against ``value``; returns
    the list of outputs. ``variables`` pre-binds ``$name`` → value."""
    if isinstance(prog, str):
        prog = compile_program(prog)
    env = _Env(dict(variables or {}), _PRELUDE_FUNCS)
    return list(_eval(prog, value, env))


def first_or(prog: tuple | str, value, default, variables: dict | None = None):
    """First output of the program, or ``default`` when the stream is
    empty or errors — the anonymization-gate contract (a malformed
    document must never abort the batch)."""
    try:
        outs = run(prog, value, variables)
    except JqError:
        return default
    return outs[0] if outs else default
