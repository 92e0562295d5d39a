from __future__ import annotations

from pyspark.sql import functions as F

from neosync_spark.operators.crypto_shred import (
    decrypt_read,
    derive_key_table,
    encrypt_columns,
    shred_subjects,
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "hello pii", '{"name":"t"}'),
            ("c1", 1, "more pii", None),
            ("c2", 0, "other subject", '{"name":"u"}'),
            ("c3", 0, None, None),  # NULL plaintext stays NULL
        ],
        "conv_id string, turn_idx int, text string, tool string",
    )


def test_roundtrip_without_shred(spark):
    df = _df(spark)
    keys = derive_key_table(df, "conv_id", secret="s3cr3t")
    enc = encrypt_columns(df, keys, "conv_id", ["text", "tool"])
    # ciphertext is not the plaintext and is per-value distinct (GCM IV)
    row = enc.filter("conv_id='c1' and turn_idx=0").collect()[0]
    assert row["text"] != "hello pii" and row["text"] is not None
    dec = decrypt_read(enc, keys, "conv_id", ["text", "tool"])
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["tool"], r["shredded"])
        for r in dec.collect()
    }
    assert got[("c1", 0)] == ("hello pii", '{"name":"t"}', False)
    assert got[("c1", 1)] == ("more pii", None, False)
    assert got[("c3", 0)] == (None, None, False)


def test_shred_makes_subject_unreadable(spark):
    df = _df(spark)
    keys = derive_key_table(df, "conv_id", secret="s3cr3t")
    enc = encrypt_columns(df, keys, "conv_id", ["text", "tool"])
    survivors = shred_subjects(
        keys, spark.createDataFrame([("c1",)], "subject string")
    )
    assert survivors.count() == 2
    dec = decrypt_read(enc, survivors, "conv_id", ["text", "tool"])
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["shredded"])
        for r in dec.collect()
    }
    # the ciphertext rows still exist; they just decrypt to nothing
    assert got[("c1", 0)] == (None, True)
    assert got[("c1", 1)] == (None, True)
    assert got[("c2", 0)] == ("other subject", False)


def test_wrong_key_reads_null_not_crash(spark):
    df = _df(spark)
    keys = derive_key_table(df, "conv_id", secret="s3cr3t")
    enc = encrypt_columns(df, keys, "conv_id", ["text"])
    wrong = derive_key_table(df, "conv_id", secret="different")
    dec = decrypt_read(enc, wrong, "conv_id", ["text"])
    assert all(r["text"] is None for r in dec.collect())
    assert all(not r["shredded"] for r in dec.collect())


def test_keys_are_per_subject(spark):
    keys = derive_key_table(_df(spark), "conv_id", secret="s")
    rows = keys.collect()
    assert len(rows) == 3
    assert len({r["key"] for r in rows}) == 3
    assert all(len(r["key"]) == 32 for r in rows)


def test_encrypt_missing_key_fails_closed(spark):
    df = _df(spark)
    keys = derive_key_table(
        df.filter("conv_id <> 'c2'"), "conv_id", secret="s"
    )
    enc = encrypt_columns(df, keys, "conv_id", ["text"])
    # a subject with no key never leaks plaintext into the output
    assert (
        enc.filter("conv_id='c2'").collect()[0]["text"] is None
    )
