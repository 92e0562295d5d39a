"""JVM-side deterministic masking — the 100 TB hot path.

These are the anonymization ops we can express entirely in built-in
``pyspark.sql.functions`` (whole-stage-codegen'd, no Python in the hot
path). They cover the deterministic subset of the transformer library's
semantics (hash-pseudonymize, shape-preserving mask, regex PII
redaction) and are what the engine reaches for first at scale; the
pandas-UDF library (functions/transformers.py) covers the seeded-random
behaviors the reference offers.

Every function here has an ANSI-SQL equivalent runnable in DuckDB —
used by the correctness harness for value-level verification.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# must match transformers.PII_* — kept RE2/Java-compatible so Spark and
# DuckDB agree byte-for-byte
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9().\\- ]{6,}[0-9]"
SSN_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

_SRC_ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
_DST_ALPHA = "nopqrstuvwxyzabcdefghijklmNOPQRSTUVWXYZABCDEFGHIJKLM5678901234"


def hash_pseudonym(col: Column | str, salt: str = "ns", length: int = 12) -> Column:
    """Deterministic pseudonym: hex prefix of sha256(salt || value).
    Same value ⇒ same pseudonym (the consistency property the reference
    gets from its Redis old→new cache, builders/sql.go:511-539 — here
    it's free because the mapping is a pure function)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.sha2(F.concat(F.lit(salt), c), 256), 1, length)


def mask_email(col: Column | str, salt: str = "ns") -> Column:
    """Pseudonymize the local part, keep the domain:
    ``sha256(salt||local)[:12] || '@' || domain``."""
    c = F.col(col) if isinstance(col, str) else col
    local = F.regexp_extract(c, "^([^@]*)@.*$", 1)
    domain = F.regexp_extract(c, "^[^@]*@(.*)$", 1)
    return F.when(
        c.rlike("^[^@]+@[^@]+$"),
        F.concat(hash_pseudonym(local, salt), F.lit("@"), domain),
    ).otherwise(c)


def mask_phone_keep_last4(col: Column | str) -> Column:
    """Replace all digits except the last 4 with '*' (format kept)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    head = F.substring(c, F.lit(1), n - F.lit(4))
    tail = F.substring(c, n - F.lit(3), F.lit(4))
    return F.when(n > 4, F.concat(F.regexp_replace(head, "[0-9]", "*"), tail)).otherwise(c)


def redact_pii(col: Column | str) -> Column:
    """Regex redaction of emails, SSNs, then phones in free text —
    the JVM-side equivalent of transform_pii_text's recognizers."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, SSN_RE, "<SSN>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def shape_mask(col: Column | str) -> Column:
    """Deterministic shape-preserving substitution via a fixed
    translate alphabet (rot13 letters / rot5 digits): case, length,
    punctuation and whitespace preserved."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _SRC_ALPHA, _DST_ALPHA)


def pseudonymize_aes(col: Column | str, key: str) -> Column:
    """Reversible deterministic pseudonymization: AES-ECB over the
    UTF-8 value, hex-encoded — the key-holder can re-identify with
    ``depseudonymize_aes``, unlike ``hash_pseudonym``. Deterministic by
    construction (no IV), so equal values map to equal tokens and joins
    on the pseudonym still work across tables and runs — the tokenizing
    compliance pattern (reversible pseudonymization, GDPR art. 4(5))
    the reference approximates with its key-consistency redis cache
    (worker/pkg/benthos/redis: transformed-value mapping) but cannot
    invert. ECB's equal-block leakage is exactly the determinism being
    bought; use hash_pseudonym when linkability without reversal is
    enough. Entirely JVM-side (whole-stage codegen), no Python.

    ``key`` must be 16/24/32 bytes (AES-128/192/256).
    """
    c = F.col(col) if isinstance(col, str) else col
    if len(key.encode()) not in (16, 24, 32):
        raise ValueError("AES key must be 16, 24 or 32 bytes")
    # hex, not base64: Spark's base64() chunks long output with
    # newlines (RFC 2045), which breaks token handling downstream
    return F.hex(F.aes_encrypt(c, F.lit(key), F.lit("ECB")))


def depseudonymize_aes(col: Column | str, key: str) -> Column:
    """Inverse of ``pseudonymize_aes`` (key-holder re-identification)."""
    c = F.col(col) if isinstance(col, str) else col
    if len(key.encode()) not in (16, 24, 32):
        raise ValueError("AES key must be 16, 24 or 32 bytes")
    return F.aes_decrypt(F.unhex(c), F.lit(key), F.lit("ECB")).cast(
        "string"
    )
