"""The anonymization transformer library — seeded, vectorized, pure.

Re-implements the semantics of the reference's bloblang transformer
plugins (registry /root/reference/worker/pkg/benthos/transformers/
gen_neosync_transformers.go:6-54) as pandas-batch functions suitable for
Arrow-vectorized ``pandas_udf`` execution. NOT a port: the reference is
message-at-a-time Go with a mutex-guarded PCG rng
(/root/reference/worker/pkg/rng/rng.go:24-31); here every output is a
pure function of ``(global_seed, row_key, value)`` via splitmix64-style
hashing, so the same row transforms identically under any partitioning,
task retry, or speculative re-execution — and the test oracle can call
the very same functions.

Each transformer is exposed two ways:

* ``fn(values: pd.Series, keys: pd.Series) -> pd.Series`` — direct
  pandas call (oracle path / unit tests);
* ``as_udf(fn)`` — wraps it into a ``pandas_udf(StringType())`` for the
  DataFrame pipeline: ``df.withColumn("text", udf("text", key_col))``.

Length clamping mirrors the reference's maxLength handling
(/root/reference/internal/benthos/benthos-builder/builders/processors.go:533-536).
"""

from __future__ import annotations

import json
import re
import string
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import hash_series, mix64, str_seed, u01
from . import datasets as D

TransformFn = Callable[[pd.Series, pd.Series], pd.Series]

_LOWER = np.frombuffer(string.ascii_lowercase.encode(), dtype=np.uint8)
_UPPER = np.frombuffer(string.ascii_uppercase.encode(), dtype=np.uint8)
_DIGIT = np.frombuffer(string.digits.encode(), dtype=np.uint8)
_SPECIALS = "!@#$%^&*()_+-=[]{};:,./<>?"


def _row_hashes(seed: int, name: str, keys: pd.Series, values: pd.Series) -> np.ndarray:
    """One uint64 per row: f(global seed, transformer name, key, value)."""
    return mix64(seed, str_seed(name), hash_series(keys), hash_series(values))


def _stream(h: np.ndarray | int, j: int) -> np.ndarray:
    """j-th derived hash from a base row hash."""
    return mix64(h, j + 1)


def _pick(arr: list[str], h: np.ndarray) -> np.ndarray:
    return np.asarray(arr, dtype=object)[(h % np.uint64(len(arr))).astype(np.int64)]


def _pick1(arr: list[str], h) -> str:
    return arr[int(np.uint64(h) % np.uint64(len(arr)))]


def _rand_chars(h: int, length: int, alphabet: str) -> str:
    """Deterministic random string of `length` from a scalar hash."""
    if length <= 0:
        return ""
    idx = mix64(int(h), np.arange(length, dtype=np.uint64)) % np.uint64(len(alphabet))
    a = np.frombuffer(alphabet.encode(), dtype=np.uint8)
    return a[idx.astype(np.int64)].tobytes().decode()


def _rand_chars_batch(hs: np.ndarray, lengths, alphabet: str) -> list[str]:
    """Whole-batch _rand_chars over one flat buffer — bit-identical to
    the scalar version per row (same mix64(h, position) stream)."""
    lens = np.asarray(lengths, dtype=np.int64).clip(min=0)
    n = len(lens)
    total = int(lens.sum())
    if total == 0:
        return [""] * n
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    row = np.repeat(np.arange(n), lens)
    pos = np.arange(total, dtype=np.uint64) - starts.astype(np.uint64)[row]
    r = mix64(np.asarray(hs, dtype=np.uint64)[row], pos)
    a = np.frombuffer(alphabet.encode(), dtype=np.uint8)
    buf = a[(r % np.uint64(len(a))).astype(np.int64)].tobytes()
    ends = starts + lens
    return [buf[s:e].decode() for s, e in zip(starts, ends)]


def _clamp(s: str, max_length: int | None) -> str:
    if max_length is not None and len(s) > max_length:
        return s[:max_length]
    return s


def as_udf(fn: TransformFn, return_type: T.DataType | None = None):
    """Wrap a (values, keys) pandas function as an Arrow pandas_udf."""
    rt = return_type or T.StringType()

    @F.pandas_udf(rt)
    def _udf(values: pd.Series, keys: pd.Series) -> pd.Series:
        return fn(values, keys)

    return _udf


def key_col(*cols: str):
    """Canonical row-key column for seeding: 'conv-x|3'."""
    return F.concat_ws("|", *[F.col(c).cast("string") for c in cols])


# --------------------------------------------------------------------------
# transform_* (value-preserving anonymizers)
# --------------------------------------------------------------------------

_EMAIL_RE = re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$")


def transform_email(
    seed: int = 42,
    preserve_length: bool = False,
    preserve_domain: bool = False,
    excluded_domains: tuple[str, ...] = (),
    invalid_email_action: str = "generate",
    max_length: int | None = None,
) -> TransformFn:
    """Anonymize an email address.

    Semantics follow /root/reference/worker/pkg/benthos/transformers/
    transform_email.go:248-355: empty → null; domain exclusion FLIPS the
    preserve_domain decision (:294-302); the name part becomes a
    generated name/hex string (same length when preserve_length);
    invalid emails handled per action ∈ {reject, passthrough, null,
    generate}.
    """
    excluded = {d.lower() for d in excluded_domains}
    _first_lower = [n.lower() for n in D.FIRST_NAMES]

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_email", keys, values)
        n = len(values)
        out = np.full(n, None, dtype=object)
        present = values.notna().to_numpy()
        if not present.any():
            return pd.Series(out, index=values.index, dtype=object)
        strs = values[present].astype(str)
        nonempty = (strs != "").to_numpy()
        valid = strs.str.match(_EMAIL_RE.pattern).to_numpy() & nonempty
        idx = np.flatnonzero(present)
        hsv = np.asarray(hs)[idx]

        # invalid, non-empty rows per action
        inv = nonempty & ~valid
        if inv.any():
            if invalid_email_action == "reject":
                bad = strs[inv].iloc[0]
                raise ValueError(f"invalid email: {bad!r}")
            if invalid_email_action == "passthrough":
                out[idx[inv]] = [_clamp(s, max_length) for s in strs[inv]]
            elif invalid_email_action == "null":
                pass  # stays None
            else:  # generate
                h_inv = hsv[inv]
                locals_ = _rand_chars_batch(
                    _stream(h_inv, 0), np.full(inv.sum(), 8), string.ascii_lowercase
                )
                doms = _pick(D.EMAIL_DOMAINS, _stream(h_inv, 1))
                out[idx[inv]] = [
                    _clamp(f"{l_}@{d}", max_length) for l_, d in zip(locals_, doms)
                ]

        if valid.any():
            h_ok = hsv[valid]
            sv = strs[valid]
            parts = sv.str.rpartition("@")
            local = parts[0]
            domain = parts[2]
            keep = np.full(valid.sum(), preserve_domain)
            if excluded:
                keep ^= domain.str.lower().isin(excluded).to_numpy()  # flip
            new_domain = np.where(
                keep, domain.to_numpy(dtype=object), _pick(D.EMAIL_DOMAINS, _stream(h_ok, 1))
            )
            if preserve_length:
                new_local = _rand_chars_batch(
                    _stream(h_ok, 0),
                    local.str.len().to_numpy(),
                    string.ascii_lowercase + string.digits,
                )
            else:
                firsts = _pick(_first_lower, _stream(h_ok, 2))
                sfx = _rand_chars_batch(
                    _stream(h_ok, 3), np.full(valid.sum(), 4), string.digits
                )
                new_local = [f"{a}{b}" for a, b in zip(firsts, sfx)]
            out[idx[valid]] = [
                _clamp(f"{l_}@{d}", max_length) for l_, d in zip(new_local, new_domain)
            ]
        return pd.Series(out, index=values.index, dtype=object)

    return fn


def _name_transform(
    name: str, names: list[str], by_len: dict[int, list[str]]
) -> Callable[..., TransformFn]:
    def make(
        seed: int = 42, preserve_length: bool = False, max_length: int | None = None
    ) -> TransformFn:
        def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
            hs = _row_hashes(seed, name, keys, values)
            n = len(values)
            out = np.full(n, None, dtype=object)
            present = values.notna().to_numpy()
            if not present.any():
                return pd.Series(out, index=values.index, dtype=object)
            idx = np.flatnonzero(present)
            h0 = _stream(np.asarray(hs)[idx], 0)
            strs = values[present].astype(str)
            if not preserve_length:
                out[idx] = _pick(names, h0)
            else:
                lens = strs.str.len().to_numpy()
                # vectorize per distinct length (few of them per batch)
                for L in np.unique(lens):
                    sub = lens == L
                    pool = by_len.get(int(L))
                    if pool:
                        out[idx[sub]] = _pick(pool, h0[sub])
                    else:
                        # no same-length name: random padded (reference
                        # pads with generateRandomCharacterString on miss)
                        out[idx[sub]] = [
                            s.capitalize()
                            for s in _rand_chars_batch(
                                h0[sub], np.full(int(sub.sum()), int(L)),
                                string.ascii_lowercase,
                            )
                        ]
            if max_length is not None:
                out[idx] = [_clamp(s, max_length) for s in out[idx]]
            return pd.Series(out, index=values.index, dtype=object)

        return fn

    return make


transform_first_name = _name_transform(
    "transform_first_name", D.FIRST_NAMES, D.FIRST_BY_LEN
)
transform_last_name = _name_transform(
    "transform_last_name", D.LAST_NAMES, D.LAST_BY_LEN
)


def transform_full_name(
    seed: int = 42, preserve_length: bool = False, max_length: int | None = None
) -> TransformFn:
    first = transform_first_name(seed, False, None)
    last = transform_last_name(seed, False, None)

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        f = first(values, keys)
        l_ = last(values, keys)
        n = len(values)
        out = np.full(n, None, dtype=object)
        present = values.notna().to_numpy()
        idx = np.flatnonzero(present)
        joined = (f[present].astype(str) + " " + l_[present].astype(str)).to_numpy(
            dtype=object
        )
        if preserve_length:
            targets = values[present].astype(str).str.len().to_numpy()
            joined = np.asarray(
                [
                    nv if len(nv) == t else ((nv + "x" * t)[:t] if t > 0 else "")
                    for nv, t in zip(joined, targets)
                ],
                dtype=object,
            )
        if max_length is not None:
            joined = np.asarray([_clamp(s, max_length) for s in joined], dtype=object)
        out[idx] = joined
        return pd.Series(out, index=values.index, dtype=object)

    return fn


def transform_string(
    seed: int = 42,
    preserve_length: bool = True,
    min_length: int = 1,
    max_length: int | None = 20,
) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_string", keys, values)
        n = len(values)
        out = np.full(n, None, dtype=object)
        present = values.notna().to_numpy()
        if not present.any():
            return pd.Series(out, index=values.index, dtype=object)
        idx = np.flatnonzero(present)
        hsv = np.asarray(hs)[idx]
        if preserve_length:
            lens = values[present].astype(str).str.len().to_numpy()
        else:
            hi = max_length or 20
            span = np.uint64(max(1, hi - min_length + 1))
            lens = (_stream(hsv, 1) % span).astype(np.int64) + min_length
        out[idx] = _rand_chars_batch(
            _stream(hsv, 0), lens, string.ascii_lowercase + string.digits
        )
        return pd.Series(out, index=values.index, dtype=object)

    return fn


def transform_character_scramble(
    seed: int = 42, user_provided_regex: str | None = None
) -> TransformFn:
    """Per-character class-preserving substitution: letters→letters
    (case kept), digits→digits, whitespace and other characters kept
    (/root/reference/worker/pkg/benthos/transformers/
    transform_character_scramble.go:121-196). With a regex, only matched
    regions are scrambled (:126-154)."""
    pattern = re.compile(user_provided_regex) if user_provided_regex else None

    def scramble_str(v: str, h: np.uint64) -> str:
        b = np.frombuffer(v.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        # random stream per char position
        r = mix64(int(h), np.arange(len(b), dtype=np.uint64))
        lower = (b >= 97) & (b <= 122)
        upper = (b >= 65) & (b <= 90)
        digit = (b >= 48) & (b <= 57)
        out = b.copy()
        out[lower] = _LOWER[(r[lower] % np.uint64(26)).astype(np.int64)]
        out[upper] = _UPPER[(r[upper] % np.uint64(26)).astype(np.int64)]
        out[digit] = _DIGIT[(r[digit] % np.uint64(10)).astype(np.int64)]
        return out.tobytes().decode("utf-8", "surrogatepass")

    def scramble_batch(strs: list[str], hs: np.ndarray) -> list[str]:
        """Whole-batch scramble over one concatenated UTF-8 buffer —
        bit-identical to scramble_str per row (class bytes are all
        ASCII; multi-byte UTF-8 units are >= 0x80 and pass through)."""
        enc = [s.encode("utf-8", "surrogatepass") for s in strs]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        total = int(lens.sum())
        if total == 0:
            return list(strs)
        flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        row_idx = np.repeat(np.arange(len(enc)), lens)
        pos = np.arange(total, dtype=np.uint64) - starts.astype(np.uint64)[row_idx]
        r = mix64(hs.astype(np.uint64)[row_idx], pos)
        lower = (flat >= 97) & (flat <= 122)
        upper = (flat >= 65) & (flat <= 90)
        digit = (flat >= 48) & (flat <= 57)
        out_b = flat.copy()
        out_b[lower] = _LOWER[(r[lower] % np.uint64(26)).astype(np.int64)]
        out_b[upper] = _UPPER[(r[upper] % np.uint64(26)).astype(np.int64)]
        out_b[digit] = _DIGIT[(r[digit] % np.uint64(10)).astype(np.int64)]
        buf = out_b.tobytes()
        ends = starts + lens
        return [
            buf[s:e].decode("utf-8", "surrogatepass")
            for s, e in zip(starts, ends)
        ]

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_character_scramble", keys, values)
        if pattern is None:
            mask = values.notna().to_numpy()
            strs = [str(v) for v, m in zip(values, mask) if m]
            scrambled = scramble_batch(strs, np.asarray(hs)[mask])
            out_arr = np.full(len(values), None, dtype=object)
            out_arr[mask] = scrambled
            return pd.Series(out_arr, index=values.index, dtype=object)
        # regex path, batch-vectorized: the regex scan stays per row
        # (C-speed re engine) but every matched region scrambles in ONE
        # scramble_batch call over the whole Arrow batch — bit-identical
        # to the per-match scramble_str (scramble_batch's contract),
        # ~5x cheaper than per-match numpy array setup on short matches
        rows: list[str | None] = []
        metas: list[tuple[int, int, int]] = []  # (row, start, end)
        match_strs: list[str] = []
        match_h_base: list[int] = []
        match_j: list[int] = []
        for i, (v, h) in enumerate(zip(values, hs)):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                rows.append(None)
                continue
            v = str(v)
            rows.append(v)
            for j, m in enumerate(pattern.finditer(v)):
                metas.append((i, m.start(), m.end()))
                match_strs.append(m.group(0))
                match_h_base.append(int(h))
                match_j.append(j)
        out_rows = rows
        if match_strs:
            # one vectorized _stream over every match (the scalar call
            # pays numpy errstate setup per invocation)
            scrambled = scramble_batch(
                match_strs,
                _stream(
                    np.asarray(match_h_base, dtype=np.uint64),
                    np.asarray(match_j, dtype=np.uint64),
                ),
            )
            by_row: dict[int, list[tuple[int, int, str]]] = {}
            for (i, s, e), repl in zip(metas, scrambled):
                by_row.setdefault(i, []).append((s, e, repl))
            for i, parts in by_row.items():
                v = rows[i]
                pieces, last = [], 0
                for s, e, repl in parts:  # finditer order: ascending
                    pieces.append(v[last:s])
                    pieces.append(repl)
                    last = e
                pieces.append(v[last:])
                out_rows[i] = "".join(pieces)
        return pd.Series(out_rows, index=values.index, dtype=object)

    return fn


def transform_int64(
    seed: int = 42, randomization_range_min: int = 10, randomization_range_max: int = 100
) -> TransformFn:
    """value ± bounds (reference transform_int64.go:97-120:
    minRange = v - rMin, maxRange = v + rMax). Fully vectorized."""

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_int64", keys, values.astype("string"))
        # compute only the small delta in float; add it to the original
        # values kept as Int64 — a float64 round-trip of the value itself
        # would corrupt int64 above 2^53
        na = pd.isna(values).to_numpy()
        span = float(randomization_range_min + randomization_range_max)
        delta = (
            np.floor(u01(hs) * (span + 1.0)).astype(np.int64)
            - int(randomization_range_min)
        )
        base = pd.array(values, dtype="Int64")
        res = base + pd.array(delta, dtype="Int64")
        res[na] = pd.NA
        return pd.Series(res, index=values.index)

    return fn


def transform_float64(
    seed: int = 42,
    randomization_range_min: float = 10.0,
    randomization_range_max: float = 100.0,
    precision: int | None = None,
    scale: int | None = None,
) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_float64", keys, values.astype("string"))
        v = values.to_numpy(dtype="float64", na_value=np.nan)
        span = randomization_range_min + randomization_range_max
        out = v + (u01(hs) * span - randomization_range_min)
        if scale is not None:
            out = np.round(out, scale)
        return pd.Series(out, index=values.index)

    return fn


def transform_string_phone_number(
    seed: int = 42, preserve_length: bool = True, max_length: int | None = None
) -> TransformFn:
    """Digits replaced by random digits, formatting kept when
    preserve_length, else a fresh 10-digit number."""

    def scramble_digits_batch(strs: list[str], hs: np.ndarray) -> list[str]:
        """Whole-batch digit replacement over one flat buffer — identical
        per-row to mix64(h, char_position) % 10. ASCII-only batch (phone
        strings); callers route non-ASCII rows to the scalar path."""
        enc = [s.encode() for s in strs]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        total = int(lens.sum())
        if total == 0:
            return list(strs)
        flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        row = np.repeat(np.arange(len(enc)), lens)
        pos = np.arange(total, dtype=np.uint64) - starts.astype(np.uint64)[row]
        r = mix64(np.asarray(hs, dtype=np.uint64)[row], pos)
        digit = (flat >= 48) & (flat <= 57)
        out_b = flat.copy()
        out_b[digit] = _DIGIT[(r[digit] % np.uint64(10)).astype(np.int64)]
        buf = out_b.tobytes()
        ends = starts + lens
        return [buf[s:e].decode() for s, e in zip(starts, ends)]

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_string_phone_number", keys, values)
        n = len(values)
        out = np.full(n, None, dtype=object)
        present = values.notna().to_numpy()
        if not present.any():
            return pd.Series(out, index=values.index, dtype=object)
        idx = np.flatnonzero(present)
        hsv = np.asarray(hs)[idx]
        strs = values[present].astype(str)
        if preserve_length:
            ascii_ok = np.asarray(
                [s.isascii() for s in strs], dtype=bool
            )
            if ascii_ok.all():
                res = scramble_digits_batch(list(strs), hsv)
            else:
                # rare unicode rows: scalar char-position path (the batch
                # path indexes byte positions, which diverge on multibyte)
                res = []
                for s, h in zip(strs, hsv):
                    b = list(s)
                    r = mix64(int(h), np.arange(len(b), dtype=np.uint64))
                    for i2, ch in enumerate(b):
                        if ch.isdigit():
                            b[i2] = str(int(r[i2] % np.uint64(10)))
                    res.append("".join(b))
        else:
            res = _rand_chars_batch(
                _stream(hsv, 0), np.full(len(idx), 10), string.digits
            )
        out[idx] = [_clamp(s, max_length) for s in res]
        return pd.Series(out, index=values.index, dtype=object)

    return fn


def transform_e164_phone_number(
    seed: int = 42, preserve_length: bool = True, max_length: int | None = None
) -> TransformFn:
    inner = transform_string_phone_number(seed, preserve_length, max_length)

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        res = inner(values, keys)
        # keep leading '+' and country code digit count; inner already
        # preserves formatting positions
        return res

    return fn


def transform_int64_phone_number(seed: int = 42) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_int64_phone_number", keys, values.astype("string"))
        num = (hs % np.uint64(9_000_000_000)) + np.uint64(1_000_000_000)
        res = pd.array(num.astype(np.int64), dtype="Int64")
        res[pd.isna(values).to_numpy()] = pd.NA
        return pd.Series(res, index=values.index)

    return fn


def transform_sha256_pseudonym(
    seed: int = 42, salt: str = "ns", length: int = 12
) -> TransformFn:
    """Deterministic hash pseudonym: hex prefix of sha256(salt||value).
    The stateless form of the reference's cross-table key-consistency
    cache (redis output_hash.go stores old→new per key; a pure function
    needs no store — same value in ANY table ⇒ same pseudonym), usable
    as a key transformer in multi-table jobs so FK rewrites stay
    referentially intact AND value-oracle-able (DuckDB sha256 replays
    it). ``seed`` is accepted for registry uniformity but unused — the
    whole point is determinism across jobs."""
    import hashlib

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        def h(v):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return None
            return hashlib.sha256((salt + str(v)).encode()).hexdigest()[:length]

        return values.map(h)

    fn.column_expr = lambda c: F.substring(
        F.sha2(
            F.concat(
                F.lit(salt),
                (F.col(c) if isinstance(c, str) else c).cast("string"),
            ),
            256,
        ),
        1,
        length,
    )
    return fn


def transform_uuid(seed: int = 42) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_uuid", keys, values)
        h2 = _stream(hs, 0)
        out = []
        for a, b, v in zip(hs, h2, values):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                out.append(None)
                continue
            raw = int(a).to_bytes(8, "big") + int(b).to_bytes(8, "big")
            x = bytearray(raw)
            x[6] = (x[6] & 0x0F) | 0x40  # version 4
            x[8] = (x[8] & 0x3F) | 0x80  # variant
            hx = x.hex()
            out.append(f"{hx[:8]}-{hx[8:12]}-{hx[12:16]}-{hx[16:20]}-{hx[20:]}")
        return pd.Series(out, index=values.index, dtype=object)

    return fn


# --------------------------------------------------------------------------
# transform_pii_text — regex/deny-list PII redaction over free text
# --------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?\d[\d\-\.\s\(\)]{6,}\d"
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
# Extended entities (reference: Presidio builtin recognizers routed via
# transform_pii_text.go:92-129). Patterns are engine-portable: Python re,
# Java regex (Spark regexp_replace) and DuckDB RE2 all read them alike.
# Presidio-like grouped shape: 3-5 groups of 3-6 digits with optional
# single separators; total 13-19 digits + Luhn enforced by the
# validator. Grouping (not a bare digit-run window) keeps spaced phone
# numbers like '+44 20 7946 0958' (2-digit groups) out of the card path
# even when their digits happen to pass Luhn.
PII_CREDIT_CARD_RE = r"\b\d{3,6}(?:[ -]?\d{3,6}){2,4}\b"
PII_IP_RE = (
    r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b"
)
PII_DATE_RE = r"\b\d{4}-\d{2}-\d{2}\b|\b\d{1,2}/\d{1,2}/\d{4}\b"


def _luhn_valid(text: str) -> bool:
    """True iff the digits of ``text`` pass the Luhn checksum (13-19
    digits) — the validation step of Presidio's CreditCardRecognizer."""
    digits = re.sub(r"\D", "", text)
    if not 13 <= len(digits) <= 19:
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        n = int(d)
        if i % 2 == 1:
            n *= 2
            if n > 9:
                n -= 9
        total += n
    return total % 10 == 0


class PiiAnonymizer:
    """Per-entity anonymizer — the four Presidio-backed kinds the
    reference maps in toPresidioAnonymizerConfig
    (/root/reference/internal/ee/transformers/functions/functions.go:371-419):
    replace (fixed value), redact (remove), hash (md5/sha256/sha512 of
    the matched text), mask (n chars from start/end)."""

    __slots__ = ("kind", "value", "algo", "chars_to_mask", "from_end", "masking_char")

    def __init__(
        self,
        kind: str = "replace",
        value: str | None = None,
        algo: str = "md5",
        chars_to_mask: int = 0,
        from_end: bool = False,
        masking_char: str = "*",
    ):
        if kind not in ("replace", "redact", "hash", "mask"):
            raise ValueError(f"unknown anonymizer kind {kind!r}")
        if kind == "hash" and algo not in ("md5", "sha256", "sha512"):
            raise ValueError(f"unknown hash algo {algo!r}")
        self.kind = kind
        self.value = value
        self.algo = algo
        self.chars_to_mask = chars_to_mask
        self.from_end = from_end
        self.masking_char = masking_char

    def render(self, entity: str, matched: str) -> str:
        if self.kind == "redact":
            return ""
        if self.kind == "replace":
            return self.value if self.value is not None else f"<{entity}>"
        if self.kind == "hash":
            import hashlib

            return getattr(hashlib, self.algo)(matched.encode()).hexdigest()
        n = min(self.chars_to_mask, len(matched))
        if n <= 0:
            return matched
        if self.from_end:
            return matched[:-n] + self.masking_char * n
        return self.masking_char * n + matched[n:]


# frozen titlecase-word stoplist for the heuristic PERSON tier: common
# sentence starters / salutations / calendar words / proper-phrase
# prefixes that capitalize without naming a person
_TITLE_STOPWORDS = frozenset(
    w.lower()
    for w in (
        "The A An And Or But Not If Then When While For With About "
        "Contact Call Email Phone Please Dear Hi Hello Hey Regards "
        "Meet Visit Join See Ask Tell Ping Message Invite Welcome "
        "Thanks Thank Best Sincerely From To Subject Meeting Note "
        "Update Reminder Report Project Team New Old North South East "
        "West United Republic University Institute Company Inc Corp "
        "Ltd Monday Tuesday Wednesday Thursday Friday Saturday Sunday "
        "January February March April May June July August September "
        "October November December Today Tomorrow Yesterday I We You "
        "They He She It This That These Those Our Your Their My"
    ).split()
)

# honorifics are context EVIDENCE, not name parts to trim: after one,
# even a single surname qualifies ("Dr Tanaka")
_HONORIFICS = frozenset(
    w.lower() for w in ("Mr", "Mrs", "Ms", "Mx", "Dr", "Prof", "Sir", "Madam")
)

_TITLE_TOKEN_RE = re.compile(r"[^\W\d_][\w'’\-]*")


def heuristic_person_scorer(score: float = 0.85):
    """Model-free PERSON candidate scorer: runs of adjacent titlecase
    tokens, edge-trimmed against the frozen stoplist; >= 2 tokens
    qualify, or >= 1 after an honorific (the capitalization-pattern +
    context-word tier Presidio layers under its NER model — public
    PatternRecognizer/context-enhancer design). Unicode-aware, so it
    recalls names outside the shipped vocabulary (non-Western
    spellings the dataset regex provably misses). Precision honestly
    degrades on capitalized non-name phrases — hence opt-in
    (``person_heuristic=True``) and scored ``0.85`` (< 1.0), so a
    ``score_threshold`` above it disables exactly this tier. Shaped as
    a ``custom_recognizers`` batch scorer; spans route through the
    same anonymizers/filters as every recognizer."""

    def _is_title(tok: str) -> bool:
        return (
            len(tok) >= 2
            and tok[0].isupper()
            and not tok[1:].isupper()  # drops acronyms (USA, NASA)
        )

    def scorer(texts):
        out = []
        for t in texts:
            spans = []
            if isinstance(t, str):
                toks = [
                    (m.start(), m.end(), m.group(0))
                    for m in _TITLE_TOKEN_RE.finditer(t)
                ]
                run: list = []
                for tk in toks:
                    if _is_title(tk[2]) and (
                        not run or t[run[-1][1] : tk[0]] == " "
                    ):
                        run.append(tk)
                        continue
                    spans.extend(_emit_person_run(run, score))
                    run = [tk] if _is_title(tk[2]) else []
                spans.extend(_emit_person_run(run, score))
            out.append(spans)
        return out

    return scorer


def _emit_person_run(run: list, score: float) -> list:
    """Trim stopword edges; honorific prefix lowers the 2-token bar."""
    if not run:
        return []
    honorific = False
    while run and run[0][2].lower() in _TITLE_STOPWORDS:
        run = run[1:]
    if run and run[0][2].lower() in _HONORIFICS:
        honorific = True
        run = run[1:]
    while run and (
        run[-1][2].lower() in _TITLE_STOPWORDS
        or run[-1][2].lower() in _HONORIFICS
    ):
        run = run[:-1]
    if not run or (len(run) < 2 and not honorific):
        return []
    return [(run[0][0], run[-1][1], score)]


def person_name_regex() -> str:
    """Word-boundary alternation over the shipped first+last name
    datasets — dataset-backed PERSON recognition (the reference routes
    this entity to Presidio NER; the name lists make it expressible as
    a plain regex that Spark, Python and DuckDB evaluate identically)."""
    firsts = "|".join(re.escape(n) for n in D.FIRST_NAMES)
    lasts = "|".join(re.escape(n) for n in D.LAST_NAMES)
    return rf"\b(?:{firsts})\s+(?:{lasts})\b"


def transform_pii_text(
    seed: int = 42,
    allowed_phrases: tuple[str, ...] = (),
    allowed_entities: tuple[str, ...] | None = None,
    deny_words: tuple[str, ...] = (),
    entity_replacements: dict[str, str] | None = None,
    recognize_person_names: bool = False,
    person_heuristic: bool = False,
    entity_anonymizers: dict[str, "PiiAnonymizer"] | None = None,
    deny_recognizers: dict[str, tuple[str, ...]] | None = None,
    score_threshold: float = 0.5,
    language: str = "en",
    custom_recognizers: "dict[str, Callable[[pd.Series], list]] | None" = None,
) -> TransformFn:
    """Free-text PII redaction via regex recognizers + deny-word lists —
    the OSS-scope variant of the reference's transform_pii_text
    (/root/reference/worker/pkg/benthos/transformers/
    transform_pii_text.go:18-135; param semantics :92-129). The
    reference delegates NER to a per-value Presidio RPC; here the
    recognizers run in-executor, vectorized per Arrow batch.

    Default entities: PERSON (opt-in dataset-backed recognizer —
    word-boundary first+last-name pairs from the shipped name datasets,
    the in-process stand-in for Presidio's PERSON NER), EMAIL_ADDRESS,
    PHONE_NUMBER, US_SSN, DENY_WORD. Extended entities — CREDIT_CARD
    (Luhn-validated, Presidio CreditCardRecognizer semantics),
    IP_ADDRESS, DATE_TIME — activate when named in ``allowed_entities``
    or configured in ``entity_anonymizers`` (the reference likewise
    unions configured-entity keys into the active set,
    functions.go:268-275).

    ``allowed_phrases`` are never redacted; ``allowed_entities`` (when
    set) limits which recognizers run; ``entity_anonymizers`` maps
    entity → :class:`PiiAnonymizer` (replace / redact / hash / mask);
    ``entity_replacements`` is sugar for replace-anonymizers; the
    default anonymizer is replace with ``<ENTITY_TYPE>``.

    ``deny_recognizers`` maps a recognizer NAME to its deny-word list —
    each entry becomes its own entity (matching, anonymizer routing and
    ``allowed_entities`` filtering all by that name), the ad-hoc
    PatternRecognizer analog (functions.go buildAdhocRecognizers:
    SupportedEntity = the recognizer's name); ``deny_words`` remains the
    single-entity DENY_WORD shorthand. ``score_threshold`` and
    ``language`` mirror the reference config surface; the regex
    recognizers here are binary matchers scored 1.0 for en-like text,
    so a threshold in (0, 1] keeps them all active and values > 1
    disable recognition (documented divergence from Presidio's
    per-model confidence scores).

    ``custom_recognizers`` is the pluggable NER extension point (the
    reference's EE path delegates PERSON/NER to a Presidio service,
    internal/ee/presidio/, transform_pii_text.go:18-135; a model can't
    ship in this repo, but a model-equipped cluster plugs one in here
    without forking): entity name -> batch scorer called once per Arrow
    batch with a ``pd.Series`` of texts, returning one span list per
    text — spans are ``(start, end)`` or ``(start, end, score)``
    (scores below ``score_threshold`` are dropped). Matched spans route
    through the same per-entity anonymizers and ``allowed_entities`` /
    ``allowed_phrases`` filtering as the built-in recognizers, and run
    BEFORE them (offsets refer to the original text). Wrap a
    transformers/spaCy pipeline in the scorer to upgrade PERSON recall;
    the built-in regex/dataset recognizers stay as written.
    """
    _ = language  # recognizers are language-agnostic regexes (en-tuned)
    anons: dict[str, PiiAnonymizer] = {}
    for e, tok in (entity_replacements or {}).items():
        anons[e] = PiiAnonymizer("replace", value=tok)
    for e, a in (entity_anonymizers or {}).items():
        anons[e] = a
    # (ent, pattern, validator-or-None)
    recognizers: list[tuple[str, re.Pattern, Callable[[str], bool] | None]] = []
    ents = allowed_entities
    configured = set(anons)

    def want(e: str, default: bool = True) -> bool:
        if ents is not None:
            return e in ents or e in configured
        return default or e in configured

    if recognize_person_names and want("PERSON"):
        recognizers.append(("PERSON", re.compile(person_name_regex()), None))
    if want("CREDIT_CARD", default=False):
        recognizers.append(
            ("CREDIT_CARD", re.compile(PII_CREDIT_CARD_RE), _luhn_valid)
        )
    if want("EMAIL_ADDRESS"):
        recognizers.append(("EMAIL_ADDRESS", re.compile(PII_EMAIL_RE), None))
    if want("US_SSN"):
        recognizers.append(("US_SSN", re.compile(PII_SSN_RE), None))
    if want("IP_ADDRESS", default=False):
        recognizers.append(("IP_ADDRESS", re.compile(PII_IP_RE), None))
    if want("DATE_TIME", default=False):
        recognizers.append(("DATE_TIME", re.compile(PII_DATE_RE), None))
    if want("PHONE_NUMBER"):
        recognizers.append(("PHONE_NUMBER", re.compile(PII_PHONE_RE), None))
    if deny_words and want("DENY_WORD"):
        dw = sorted(deny_words, key=len, reverse=True)
        recognizers.append(
            ("DENY_WORD",
             re.compile(r"(?i)\b(?:" + "|".join(map(re.escape, dw)) + r")\b"),
             None)
        )
    for rec_name, words in (deny_recognizers or {}).items():
        if words and want(rec_name):
            dw = sorted(words, key=len, reverse=True)
            recognizers.append(
                (rec_name,
                 re.compile(
                     r"(?i)\b(?:" + "|".join(map(re.escape, dw)) + r")\b"
                 ),
                 None)
            )
    custom = [
        (e, s) for e, s in (custom_recognizers or {}).items() if want(e)
    ]
    if person_heuristic and want("PERSON"):
        # runs after user scorers (a real model's spans win the text
        # first), before the regex recognizers like every custom tier
        custom.append(("PERSON", heuristic_person_scorer()))
    if score_threshold > 1.0:
        # nothing can reach an impossible confidence bar
        recognizers = []
        custom = []

    def _render(ent: str, matched: str) -> str:
        a = anons.get(ent)
        if a is None:
            return f"<{ent}>"
        return a.render(ent, matched)

    def _plain_token(ent: str) -> str | None:
        """The fixed replacement string, when the anonymizer is a plain
        replace (match-independent) — enables the vectorized path."""
        a = anons.get(ent)
        if a is None:
            return f"<{ent}>"
        if a.kind == "replace":
            return a.value if a.value is not None else f"<{ent}>"
        if a.kind == "redact":
            return ""
        return None  # hash/mask depend on the matched text

    def _apply_custom(values: pd.Series) -> pd.Series:
        """Run the pluggable batch scorers; replace spans right-to-left
        so earlier offsets stay valid."""
        notna = values.notna()
        if not notna.any():
            return values
        texts = values[notna].astype(str)
        for ent, scorer in custom:
            spans_per_text = scorer(texts)
            new_vals = []
            for s, spans in zip(texts, spans_per_text):
                hits = []
                for sp in spans or ():
                    st, en = int(sp[0]), int(sp[1])
                    score = float(sp[2]) if len(sp) > 2 else 1.0
                    if score < score_threshold or not (0 <= st < en <= len(s)):
                        continue
                    m = s[st:en]
                    if allowed_phrases and any(
                        p in m for p in allowed_phrases
                    ):
                        continue
                    hits.append((st, en, m))
                for st, en, m in sorted(hits, reverse=True):
                    s = s[:st] + _render(ent, m) + s[en:]
                new_vals.append(s)
            texts = pd.Series(new_vals, index=texts.index, dtype=object)
        out = values.astype(object).copy()
        out[notna] = texts
        return out

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        if custom:
            values = _apply_custom(values)
        if not allowed_phrases:
            # fast path: vectorized substitution; match-dependent
            # anonymizers (hash/mask) and validators (Luhn) use a
            # per-match callback, still C-loop driven by re.sub
            present = values.notna()
            s = values.where(present).astype("string")
            for ent, pat, validate in recognizers:
                token = _plain_token(ent)
                if validate is None and token is not None:
                    # re.sub replacement templates expand \g<..>/\1
                    # refs; escape backslashes so custom tokens insert
                    # literally (matching the callback paths).
                    s = s.str.replace(
                        pat, token.replace("\\", "\\\\"), regex=True
                    )
                else:
                    def sub(m: re.Match, _e=ent, _v=validate) -> str:
                        if _v is not None and not _v(m.group(0)):
                            return m.group(0)
                        return _render(_e, m.group(0))

                    s = s.str.replace(pat, sub, regex=True)
            out_arr = np.full(len(values), None, dtype=object)
            out_arr[present.to_numpy()] = s[present].to_numpy(dtype=object)
            return pd.Series(out_arr, index=values.index, dtype=object)
        return _slow(values)

    def _slow(values: pd.Series) -> pd.Series:
        out = []
        for v in values:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                out.append(None)
                continue
            s = str(v)
            for ent, pat, validate in recognizers:
                def sub(m: re.Match, _e=ent, _v=validate) -> str:
                    if any(p in m.group(0) for p in allowed_phrases):
                        return m.group(0)
                    if _v is not None and not _v(m.group(0)):
                        return m.group(0)
                    return _render(_e, m.group(0))

                s = pat.sub(sub, s)
            out.append(s)
        return pd.Series(out, index=values.index, dtype=object)

    # JVM column-expression form: the regex redaction is deterministic
    # and expressible as a regexp_replace chain, so pipelines can keep
    # it inside whole-stage codegen (UDFs are the slow path). Attached
    # only when semantics translate exactly: no allowed_phrases
    # (callback logic), no validators (Luhn), every anonymizer a fixed
    # string, and no Java-special chars in replacements.
    plain = {e: _plain_token(e) for e, _, _ in recognizers}
    tokens_safe = all(
        v is not None and "$" not in v and "\\" not in v
        for v in plain.values()
    )
    no_validators = all(val is None for _, _, val in recognizers)
    if not allowed_phrases and tokens_safe and no_validators and not custom:
        def column_expr(c):
            out_c = F.col(c) if isinstance(c, str) else c
            for ent, pat, _ in recognizers:
                out_c = F.regexp_replace(out_c, pat.pattern, plain[ent])
            return out_c

        fn.column_expr = column_expr
    return fn


# --------------------------------------------------------------------------
# generate_* (synthesize-from-nothing; keyed by row key for determinism)
# --------------------------------------------------------------------------


def _generator(
    name: str,
    make_one: Callable[[np.uint64], object],
    make_batch: Callable[..., list] | None = None,
):
    """``make_one`` is the scalar spec; ``make_batch`` (optional) is a
    vectorized implementation over the whole hash array that must
    produce identical values."""

    def make(seed: int = 42, **kw) -> TransformFn:
        def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
            hs = mix64(seed, str_seed(name), hash_series(keys))
            if make_batch is not None:
                out = make_batch(hs, **kw)
            else:
                out = [make_one(h, **kw) for h in hs]
            return pd.Series(out, index=keys.index, dtype=object)

        return fn

    return make


def _gen_first(h, **kw):
    return str(_pick(D.FIRST_NAMES, _stream(h, 0)))


def _gen_last(h, **kw):
    return str(_pick(D.LAST_NAMES, _stream(h, 0)))


_FIRST_LOWER = [n.lower() for n in D.FIRST_NAMES]
_LAST_LOWER = [n.lower() for n in D.LAST_NAMES]


def _gen_full_name_batch(hs: np.ndarray, **kw) -> list[str]:
    f = _pick(D.FIRST_NAMES, _stream(hs, 0))
    l_ = _pick(D.LAST_NAMES, _stream(_stream(hs, 9), 0))
    return [f"{a} {b}" for a, b in zip(f, l_)]


def _gen_email_batch(hs: np.ndarray, **kw) -> list[str]:
    f = _pick(_FIRST_LOWER, _stream(hs, 0))
    l_ = _pick(_LAST_LOWER, _stream(_stream(hs, 9), 0))
    num = (_stream(hs, 1) % np.uint64(100)).astype(np.int64)
    dom = _pick(D.EMAIL_DOMAINS, _stream(hs, 2))
    return [f"{a}.{b}{c}@{d}" for a, b, c, d in zip(f, l_, num, dom)]


def _gen_ssn_batch(hs: np.ndarray, **kw) -> list[str]:
    a = (hs % np.uint64(900)).astype(np.int64) + 100
    b = (_stream(hs, 1) % np.uint64(99)).astype(np.int64) + 1
    c = (_stream(hs, 2) % np.uint64(10000)).astype(np.int64)
    return [f"{x:03d}-{y:02d}-{z:04d}" for x, y, z in zip(a, b, c)]


generate_first_name = _generator("generate_first_name", _gen_first)
generate_last_name = _generator("generate_last_name", _gen_last)
generate_full_name = _generator(
    "generate_full_name",
    lambda h, **kw: f"{_gen_first(h)} {_gen_last(_stream(h, 9))}",
    make_batch=_gen_full_name_batch,
)
generate_email = _generator(
    "generate_email",
    lambda h, **kw: (
        f"{_gen_first(h).lower()}.{_gen_last(_stream(h, 9)).lower()}"
        f"{int(_stream(h, 1) % np.uint64(100))}@{_pick(D.EMAIL_DOMAINS, _stream(h, 2))}"
    ),
    make_batch=_gen_email_batch,
)
generate_bool = _generator("generate_bool", lambda h, **kw: bool(h % np.uint64(2)))
generate_uuid = _generator(
    "generate_uuid",
    lambda h, **kw: (
        lambda hx: f"{hx[:8]}-{hx[8:12]}-4{hx[13:16]}-8{hx[17:20]}-{hx[20:32]}"
    )((int(h).to_bytes(8, "big") + int(_stream(h, 0)).to_bytes(8, "big")).hex()),
)
generate_city = _generator("generate_city", lambda h, **kw: _pick1(D.CITIES, h))
generate_state = _generator(
    "generate_state",
    lambda h, full_name=False, **kw: str(
        _pick1(D.STATE_NAMES if full_name else D.STATES, h)
    ),
)
generate_zipcode = _generator(
    "generate_zipcode", lambda h, **kw: str(int(h % np.uint64(90000)) + 10000)
)
generate_country = _generator(
    "generate_country",
    lambda h, full_name=False, **kw: D.COUNTRIES[int(h % np.uint64(len(D.COUNTRIES)))][
        1 if full_name else 0
    ],
)
generate_gender = _generator(
    "generate_gender", lambda h, abbreviate=False, **kw: (
        _pick1(D.GENDERS, h)[:1] if abbreviate else _pick1(D.GENDERS, h)
    )
)
generate_street_address = _generator(
    "generate_street_address",
    lambda h, **kw: f"{int(h % np.uint64(9900)) + 100} {_pick(D.STREETS, _stream(h, 1))}",
)
generate_full_address = _generator(
    "generate_full_address",
    lambda h, **kw: (
        f"{int(h % np.uint64(9900)) + 100} {_pick(D.STREETS, _stream(h, 1))}, "
        f"{_pick(D.CITIES, _stream(h, 2))}, {_pick(D.STATES, _stream(h, 3))} "
        f"{int(_stream(h, 4) % np.uint64(90000)) + 10000}"
    ),
)
generate_business_name = _generator(
    "generate_business_name",
    lambda h, **kw: f"{_pick1(D.BUSINESS_WORDS, h)} {_pick(D.BUSINESS_SUFFIXES, _stream(h, 1))}",
)
generate_username = _generator(
    "generate_username",
    lambda h, **kw: f"{_gen_first(h).lower()}{int(_stream(h, 1) % np.uint64(1000))}",
)
generate_sha256hash = _generator(
    "generate_sha256hash",
    lambda h, **kw: __import__("hashlib").sha256(int(h).to_bytes(8, "big")).hexdigest(),
)
generate_string_phone_number = _generator(
    "generate_string_phone_number",
    lambda h, **kw: "+1"
    + str(int(h % np.uint64(9_000_000_000)) + 1_000_000_000),
)
generate_int64_phone_number = _generator(
    "generate_int64_phone_number",
    lambda h, **kw: int(h % np.uint64(9_000_000_000)) + 1_000_000_000,
)
generate_international_phone_number = _generator(
    "generate_international_phone_number",
    lambda h, **kw: (
        f"+{int(_stream(h, 1) % np.uint64(98)) + 1}"
        f"{int(h % np.uint64(9_000_000_000)) + 1_000_000_000}"
    ),
)
generate_ssn = _generator(
    "generate_ssn",
    lambda h, **kw: (
        f"{int(h % np.uint64(900)) + 100:03d}-"
        f"{int(_stream(h, 1) % np.uint64(99)) + 1:02d}-"
        f"{int(_stream(h, 2) % np.uint64(10000)):04d}"
    ),
    make_batch=_gen_ssn_batch,
)
generate_ip_address = _generator(
    "generate_ip_address",
    lambda h, **kw: ".".join(
        str(int(_stream(h, j) % np.uint64(256))) for j in range(4)
    ),
)
generate_unixtimestamp = _generator(
    "generate_unixtimestamp", lambda h, **kw: int(h % np.uint64(1_700_000_000))
)
generate_utctimestamp = _generator(
    "generate_utctimestamp",
    lambda h, **kw: pd.Timestamp(int(h % np.uint64(1_700_000_000)), unit="s", tz="UTC")
    .tz_localize(None)
    .isoformat(),
)
generate_random_string = _generator(
    "generate_random_string",
    lambda h, min_length=6, max_length=12, **kw: _rand_chars(
        int(_stream(h, 0)),
        min_length + int(h % np.uint64(max(1, max_length - min_length + 1))),
        string.ascii_lowercase + string.digits,
    ),
)


def generate_int64(seed: int = 42, min: int = 0, max: int = 1_000_000) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = mix64(seed, str_seed("generate_int64"), hash_series(keys))
        span = np.uint64(max - min + 1)
        return pd.Series((hs % span).astype(np.int64) + min, index=keys.index)

    return fn


def generate_float64(
    seed: int = 42, min: float = 0.0, max: float = 1.0, scale: int | None = None
) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = mix64(seed, str_seed("generate_float64"), hash_series(keys))
        v = min + u01(hs) * (max - min)
        if scale is not None:
            v = np.round(v, scale)
        return pd.Series(v, index=keys.index)

    return fn


def generate_categorical(
    seed: int = 42, categories: tuple[str, ...] = ("a", "b", "c"), weights: tuple[float, ...] | None = None
) -> TransformFn:
    """Weighted pick (reference generate_categorical.go semantics)."""
    cats = list(categories)
    if weights is None:
        cum = np.arange(1, len(cats) + 1) / len(cats)
    else:
        w = np.asarray(weights, dtype=np.float64)
        cum = np.cumsum(w / w.sum())

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = mix64(seed, str_seed("generate_categorical"), hash_series(keys))
        u = u01(hs)
        idx = np.searchsorted(cum, u, side="right").clip(0, len(cats) - 1)
        return pd.Series(np.asarray(cats, dtype=object)[idx], index=keys.index)

    return fn


def _luhn_checksum(digits: str) -> int:
    total = 0
    for i, d in enumerate(reversed(digits)):
        n = int(d)
        if i % 2 == 0:
            n *= 2
            if n > 9:
                n -= 9
        total += n
    return (10 - total % 10) % 10


def generate_card_number(seed: int = 42, valid_luhn: bool = True) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = mix64(seed, str_seed("generate_card_number"), hash_series(keys))
        out = []
        for h in hs:
            body = "4" + _rand_chars(int(h), 14, string.digits)
            if valid_luhn:
                out.append(int(body + str(_luhn_checksum(body))))
            else:
                out.append(int(body + str(int(_stream(h, 1) % np.uint64(10)))))
        return pd.Series(out, index=keys.index, dtype="int64")

    return fn


_USER_CODE_ALLOWED_NODES = (
    "Expression", "BoolOp", "BinOp", "UnaryOp", "IfExp", "Compare", "Call",
    "Constant", "Name", "Load", "Attribute", "Subscript", "Slice", "Tuple",
    "List", "Dict", "Set", "JoinedStr", "FormattedValue",
    # operator nodes
    "And", "Or", "Not", "Add", "Sub", "Mult", "Div", "FloorDiv", "Mod",
    "Pow", "USub", "UAdd", "Eq", "NotEq", "Lt", "LtE", "Gt", "GtE", "In",
    "NotIn", "Is", "IsNot",
)

_USER_CODE_FUNCS = {
    "len": len, "str": str, "int": int, "float": float, "abs": abs,
    "min": min, "max": max, "round": round, "bool": bool,
}


def _validate_user_code(tree) -> None:
    """AST whitelist for user expressions: expression-only nodes, no
    dunder attribute access (blocks ``().__class__`` escape chains), no
    names outside value/key/the function whitelist. This is a *guard*,
    not a full sandbox — job specs are still driver-authored config,
    like the reference's user JS (processor.go runs arbitrary goja)."""
    import ast

    for node in ast.walk(tree):
        kind = type(node).__name__
        if kind not in _USER_CODE_ALLOWED_NODES:
            raise ValueError(f"transform_user_code: disallowed syntax {kind!r}")
        if isinstance(node, ast.Attribute) and node.attr.startswith("_"):
            raise ValueError(
                f"transform_user_code: underscore attribute {node.attr!r} not allowed"
            )
        if isinstance(node, ast.Name) and node.id not in (
            "value", "key", *_USER_CODE_FUNCS
        ):
            raise ValueError(f"transform_user_code: unknown name {node.id!r}")


def transform_user_code(code: str = "value", **_: object) -> TransformFn:
    """User-defined per-value transform — the analog of the reference's
    goja-executed user JS transformers (transform_javascript /
    generate_javascript, /root/reference/worker/pkg/benthos/javascript/
    processor.go; codegen builders/processors.go:482-502). ``code`` is a
    Python expression over ``value`` and ``key`` evaluated per row
    inside the Arrow batch. The expression is AST-whitelisted (see
    _validate_user_code); ``code`` still comes from the job author and
    is treated as driver-trusted configuration."""
    import ast

    tree = ast.parse(code, "<transform_user_code>", mode="eval")
    _validate_user_code(tree)
    compiled = compile(tree, "<transform_user_code>", "eval")

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        out = []
        for v, k in zip(values, keys):
            out.append(
                eval(compiled, {"__builtins__": {}}, {**_USER_CODE_FUNCS, "value": v, "key": k})
            )
        return pd.Series(out, index=values.index, dtype=object)

    return fn


def transform_binary(seed: int = 42, preserve_length: bool = True) -> TransformFn:
    """Length-preserving anonymization of opaque binary values (the
    bytea round-trip surface of the reference's record mappers,
    internal/database-record-mapper/postgres/mapper.go:33-91): output
    bytes are a pure function of (seed, key, value)."""

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_binary", keys, values.astype("string"))
        out = []
        for v, h in zip(values, hs):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                out.append(None)
                continue
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            n = len(b) if preserve_length else 16
            r = mix64(int(h), np.arange(n, dtype=np.uint64))
            out.append((r % np.uint64(256)).astype(np.uint8).tobytes())
        return pd.Series(out, index=values.index, dtype=object)

    return fn


def transform_date(
    seed: int = 42, randomization_range_min: int = 30, randomization_range_max: int = 30
) -> TransformFn:
    """Date jitter: value ± bounded days (transform_int64 semantics on
    the day number — keeps order-of-magnitude recency, breaks exact
    dates)."""

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        hs = _row_hashes(seed, "transform_date", keys, values.astype("string"))
        span = float(randomization_range_min + randomization_range_max)
        delta = (
            np.floor(u01(hs) * (span + 1.0)).astype(np.int64)
            - int(randomization_range_min)
        )
        dt = pd.to_datetime(values, errors="coerce")
        out = dt + pd.to_timedelta(delta, unit="D")
        res = pd.Series(out.dt.date, index=values.index, dtype=object)
        res[pd.isna(dt)] = None
        return res

    return fn


def transform_array(inner: TransformFn) -> TransformFn:
    """Elementwise anonymization of array values with per-element keys
    (key[i]); composes recursively for N-dimensional arrays — the
    N-dim-array surface of the reference's record mappers
    (postgres/mapper.go:434+)."""

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        out = []
        for v, k in zip(values, keys):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                out.append(None)
                continue
            arr = list(v)
            res = inner(
                pd.Series(arr, dtype=object),
                pd.Series([f"{k}[{i}]" for i in range(len(arr))]),
            )
            out.append(list(res))
        return pd.Series(out, index=values.index, dtype=object)

    return fn


def transform_javascript(
    code: str = "return value;",
    timeout: float = 120.0,
    skip_nulls: bool = True,
    **_: object,
) -> TransformFn:
    """REAL user-JavaScript transformer — the analog of the reference's
    goja-executed transform_javascript
    (/root/reference/worker/pkg/benthos/javascript/processor.go;
    codegen builders/processors.go:482-502). ``code`` is the body of
    ``function(value, key)``; it runs in a PERSISTENT Node worker (one
    long-lived child per executor process, line-delimited JSON over
    stdin/stdout — see js_worker.py), one round-trip per Arrow batch
    with the compiled function cached worker-side: the
    pool-of-reused-goja-VMs analog, and the fix for the round-2
    process-per-batch spawn overhead. Like the reference's goja, the JS
    is driver-authored job configuration, not untrusted input."""
    from .js_worker import NodeWorker

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        rows = [
            [None if (v is None or (isinstance(v, float) and pd.isna(v))) else v, k]
            for v, k in zip(values, keys)
        ]
        out = NodeWorker.get().eval(code, rows, skip_nulls, timeout)
        return pd.Series(out, index=values.index, dtype=object)

    return fn


def generate_javascript(code: str = "return key;", timeout: float = 120.0, **_: object) -> TransformFn:
    """generate_javascript analog: same Node-backed execution, invoked
    with value=null (synthesize from the row key alone)."""
    return transform_javascript(code, timeout, skip_nulls=False)


# meta-transformers (reference builders/processors.go:784-854)
def transform_null(**_: object) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        return pd.Series([None] * len(values), index=values.index, dtype=object)

    fn.column_expr = lambda c: F.lit(None).cast("string")
    return fn


def transform_passthrough(**_: object) -> TransformFn:
    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        return values

    fn.column_expr = lambda c: (F.col(c) if isinstance(c, str) else c)
    return fn


def transform_jq(
    program: str = ".", raw: bool = False, **_: object
) -> TransformFn:
    """Run an arbitrary jq program over a JSON string column — the
    reference's TransformerMapping contract, where every mapping value
    IS a gojq program (/root/reference/internal/json-anonymizer/
    json-anonymizer.go:215-236). Compiled once per executor on the
    full-program engine (functions/jq_mini: reduce/foreach, variables,
    def, if/try, path assignment, builtins); per row the first output
    replaces the document. A non-JSON cell, an empty stream or a jq
    runtime error leaves the cell unchanged (sync jobs must never
    abort on one malformed document). With ``raw=True`` the cell is
    passed to the program as a plain string instead of being JSON
    parsed (for jq over non-JSON text columns), and a string output is
    written back unquoted."""
    from . import jq_mini

    ast = jq_mini.compile_program(program)  # parse errors fail fast

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        out = []
        for v in values:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                out.append(None)
                continue
            if raw:
                doc = v
            else:
                try:
                    doc = json.loads(v)
                except (json.JSONDecodeError, TypeError):
                    out.append(v)
                    continue
            try:
                outs = jq_mini.run(ast, doc)
            except jq_mini.JqError:
                outs = []
            if not outs:
                out.append(v)
            elif raw and isinstance(outs[0], str):
                out.append(outs[0])
            else:
                out.append(json.dumps(outs[0], separators=(",", ":")))
        return pd.Series(out, index=values.index, dtype=object)

    return fn


# registry: name → factory (the analog of gen_neosync_transformers.go)

def transform_generalize_number(
    seed: int = 42, width: int = 10, fmt: str = "range"
) -> TransformFn:
    """Generalize a numeric value into its band — the canonical
    k-anonymity remediation for numeric quasi-identifiers (Sweeney
    2002: coarsen until equivalence classes merge). ``width`` is the
    band size; ``fmt="range"`` renders "40-49", ``fmt="floor"`` the
    band's lower bound ("40"). Deterministic, JVM column_expr attached
    (whole-stage codegen; the DuckDB oracle replays the arithmetic).
    ``seed`` accepted for registry uniformity, unused."""
    if width <= 0:
        raise ValueError("width must be positive")

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        def g(v):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return None
            try:
                x = float(v)
            except (TypeError, ValueError):
                # non-numeric input suppresses to NULL — matches the
                # JVM cast("double") null semantics and is the
                # privacy-safe direction for a generalizer
                return None
            lo = int(np.floor(x / width)) * width
            if fmt == "floor":
                return str(lo)
            return f"{lo}-{lo + width - 1}"

        return values.map(g)

    def column_expr(c):
        col = (F.col(c) if isinstance(c, str) else c).cast("double")
        lo = (F.floor(col / F.lit(float(width))) * width).cast("long")
        if fmt == "floor":
            return lo.cast("string")
        return F.concat(
            lo.cast("string"), F.lit("-"), (lo + width - 1).cast("string")
        )

    fn.column_expr = column_expr
    return fn


def transform_generalize_date(
    seed: int = 42, granularity: str = "month"
) -> TransformFn:
    """Generalize a date/timestamp string to year / month / week —
    date-of-birth is the classic re-identifying quasi-identifier
    (Sweeney: DOB+zip+sex re-identifies most of the US population);
    truncation is its standard generalization. Accepts ISO-ish strings
    or date/timestamp values; emits "2026", "2026-03" or the ISO week
    "2026-W10". JVM column_expr attached. ``seed`` unused."""
    if granularity not in ("year", "month", "week"):
        raise ValueError("granularity must be year|month|week")

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        s = pd.to_datetime(values, errors="coerce")

        def g(d):
            if pd.isna(d):
                return None
            if granularity == "year":
                return f"{d.year:04d}"
            if granularity == "month":
                return f"{d.year:04d}-{d.month:02d}"
            iso = d.isocalendar()
            return f"{iso[0]:04d}-W{iso[1]:02d}"

        return pd.Series([g(d) for d in s], index=values.index, dtype=object)

    def column_expr(c):
        col = (F.col(c) if isinstance(c, str) else c).cast("timestamp")
        if granularity == "year":
            return F.date_format(col, "yyyy")
        if granularity == "month":
            return F.date_format(col, "yyyy-MM")
        return F.concat(
            F.date_format(col, "YYYY"), F.lit("-W"),
            F.lpad(F.weekofyear(col).cast("string"), 2, "0"),
        )

    fn.column_expr = column_expr
    return fn


def transform_generalize_prefix(
    seed: int = 42, length: int = 3, pad: str = "*"
) -> TransformFn:
    """Keep the first ``length`` characters, pad the rest — the zip3
    generalization (HIPAA Safe Harbor publishes zip3 for populations
    over 20k). ``pad=""`` truncates instead of masking. JVM
    column_expr attached. ``seed`` unused."""

    def fn(values: pd.Series, keys: pd.Series) -> pd.Series:
        def g(v):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return None
            s = str(v)
            return s[:length] + pad * max(0, len(s) - length)

        return values.map(g)

    def column_expr(c):
        col = (F.col(c) if isinstance(c, str) else c).cast("string")
        kept = F.substring(col, 1, length)
        if pad == "":
            return kept
        return F.concat(
            kept,
            F.repeat(
                F.lit(pad), F.greatest(F.length(col) - length, F.lit(0))
            ),
        )

    fn.column_expr = column_expr
    return fn


REGISTRY: dict[str, Callable[..., TransformFn]] = {
    "transform_email": transform_email,
    "transform_first_name": transform_first_name,
    "transform_last_name": transform_last_name,
    "transform_full_name": transform_full_name,
    "transform_string": transform_string,
    "transform_character_scramble": transform_character_scramble,
    "transform_int64": transform_int64,
    "transform_float64": transform_float64,
    "transform_string_phone_number": transform_string_phone_number,
    "transform_e164_phone_number": transform_e164_phone_number,
    "transform_int64_phone_number": transform_int64_phone_number,
    "transform_uuid": transform_uuid,
    "transform_pii_text": transform_pii_text,
    "transform_binary": transform_binary,
    "transform_date": transform_date,
    "null": transform_null,
    "passthrough": transform_passthrough,
    "transform_jq": transform_jq,
    "transform_user_code": transform_user_code,
    "transform_javascript": transform_javascript,
    "generate_javascript": generate_javascript,
    "generate_first_name": generate_first_name,
    "generate_last_name": generate_last_name,
    "generate_full_name": generate_full_name,
    "generate_email": generate_email,
    "generate_bool": generate_bool,
    "generate_uuid": generate_uuid,
    "generate_city": generate_city,
    "generate_state": generate_state,
    "generate_zipcode": generate_zipcode,
    "generate_country": generate_country,
    "generate_gender": generate_gender,
    "generate_street_address": generate_street_address,
    "generate_full_address": generate_full_address,
    "generate_business_name": generate_business_name,
    "generate_username": generate_username,
    "generate_sha256hash": generate_sha256hash,
    "transform_sha256_pseudonym": transform_sha256_pseudonym,
    "generate_string_phone_number": generate_string_phone_number,
    "generate_int64_phone_number": generate_int64_phone_number,
    "generate_international_phone_number": generate_international_phone_number,
    "generate_ssn": generate_ssn,
    "generate_ip_address": generate_ip_address,
    "generate_unixtimestamp": generate_unixtimestamp,
    "generate_utctimestamp": generate_utctimestamp,
    "generate_random_string": generate_random_string,
    "generate_int64": generate_int64,
    "generate_float64": generate_float64,
    "generate_categorical": generate_categorical,
    "generate_card_number": generate_card_number,
    "transform_generalize_number": transform_generalize_number,
    "transform_generalize_date": transform_generalize_date,
    "transform_generalize_prefix": transform_generalize_prefix,
}
