"""Crypto-shredding — GDPR erasure as key destruction, not data rewrite.

The engine already supports physical purge (``SnapshotTable.
purge_subject`` rewrites every file holding the subject's rows). At
100 TB that rewrite is the cost ceiling of every erasure request. The
standard lakehouse alternative (public practice: Delta/Iceberg GDPR
guides, Google's "crypto-shredding" pattern) inverts it:

- every PII column is encrypted AT WRITE with a per-subject key;
- the key table (one tiny row per subject) is the only place the key
  exists;
- erasure = DELETE the subject's key row. The 100 TB of ciphertext
  becomes permanently unreadable without being touched — O(1) metadata
  instead of O(table) rewrite. Reads join the key table and decrypt;
  a missing key decrypts to NULL.

Implementation is all JVM built-ins: ``aes_encrypt``/``aes_decrypt``
(AES-256-GCM, random IV per value) inside whole-stage codegen, one
key-partitioned join against the key table on the subject column (the
key table is ~1 row per conversation — broadcastable at test scale,
hash-join co-partitioned at 10^10; Spark's AQE picks per stats).

Key derivation note: ``derive_key_table`` derives keys as
sha2(subject || secret) so tests are deterministic. That is REAL
shredding only if ``secret`` itself is destroyed with the table or the
caller supplies genuinely random keys (``keys`` accepts any
(subject, key) table) — a derivable key can be re-derived by anyone
holding the secret. Production: random keys from a KMS, this module
only consumes them.

No reference counterpart file (the reference redacts/masks values; it
has no encrypted-at-rest column path). Public pattern literature only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MODE = "GCM"  # random 12-byte IV per value, AEAD authenticated


def derive_key_table(
    df: DataFrame, subject_col: str, secret: str
) -> DataFrame:
    """(subject, key) — one AES-256 key per distinct subject.

    Deterministic derivation (see module note): the 32-byte key is the
    first 32 hex chars of sha2-256(subject || secret), used as UTF-8
    bytes. Pass your own random key table instead for true shredding.
    """
    return (
        df.select(F.col(subject_col).alias("subject"))
        .distinct()
        .select(
            "subject",
            F.substring(
                F.sha2(F.concat(F.col("subject"), F.lit(secret)), 256), 1, 32
            ).alias("key"),
        )
    )


def encrypt_columns(
    df: DataFrame,
    keys: DataFrame,
    subject_col: str,
    cols: Sequence[str],
) -> DataFrame:
    """Replace each of ``cols`` with base64(AES-256-GCM ciphertext).

    NULL plaintext stays NULL (no ciphertext leaks presence). Output
    schema keeps the column names (string, base64) so the encrypted
    table round-trips through parquet/CDC unchanged.
    """
    joined = df.join(
        keys.withColumnRenamed("subject", subject_col), subject_col, "left"
    )
    out = joined
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull() & F.col("key").isNotNull(),
                F.base64(
                    F.aes_encrypt(
                        F.col(c), F.col("key").cast("binary"), F.lit(_MODE)
                    )
                ),
            ),
        )
    return out.drop("key")


def shred_subjects(
    keys: DataFrame, subjects: DataFrame, subject_col: str = "subject"
) -> DataFrame:
    """The key table after erasure: drop every key whose subject is in
    ``subjects`` (anti join). The shredded subjects' ciphertext —
    wherever it lives, however many copies — is now unreadable."""
    s = subjects.select(F.col(subject_col).alias("subject")).distinct()
    return keys.join(s, "subject", "left_anti")


def decrypt_read(
    df: DataFrame,
    keys: DataFrame,
    subject_col: str,
    cols: Sequence[str],
    flag_col: str | None = "shredded",
) -> DataFrame:
    """Plaintext view: decrypt each of ``cols`` with the subject's key;
    a subject with no surviving key reads NULL (``try_aes_decrypt`` —
    never an executor-killing exception on tampered bytes either).
    ``flag_col`` (optional) marks rows whose key is gone."""
    joined = df.join(
        keys.withColumnRenamed("subject", subject_col), subject_col, "left"
    )
    out = joined
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull() & F.col("key").isNotNull(),
                F.try_aes_decrypt(
                    F.unbase64(F.col(c)),
                    F.col("key").cast("binary"),
                    F.lit(_MODE),
                ).cast("string"),
            ),
        )
    if flag_col:
        out = out.withColumn(flag_col, F.col("key").isNull())
    return out.drop("key")
