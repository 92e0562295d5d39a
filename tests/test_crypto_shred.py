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


def test_keystore_mint_once_shred_forever(spark, tmp_path):
    from neosync_spark.operators.crypto_shred import KeyStore

    store = KeyStore(spark, str(tmp_path / "ks"))
    df = _df(spark)
    k1 = {r["subject"]: r["key"] for r in store.ensure(df, "conv_id").collect()}
    assert set(k1) == {"c1", "c2", "c3"}
    # second ensure mints nothing new: identical keys (first mint wins)
    k2 = {r["subject"]: r["key"] for r in store.ensure(df, "conv_id").collect()}
    assert k1 == k2
    assert store.shred(["c2", "ghost"]) == 1
    k3 = {r["subject"] for r in store.load().collect()}
    assert k3 == {"c1", "c3"}
    # a shredded subject is never re-minted — erased stays erased
    k4 = {r["subject"] for r in store.ensure(df, "conv_id").collect()}
    assert k4 == {"c1", "c3"}


def _lww_text(spark, log_dir):
    from pyspark.sql import functions as F

    from neosync_spark.operators.dedup import lww_dedup

    log = spark.read.parquet(log_dir)
    alive = lww_dedup(log, ["conv_id", "turn_idx"], ["ts", "lsn"]).filter(
        F.col("op") != "delete"
    )
    return {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in alive.collect()
    }


def test_cli_encrypt_at_write_shred_and_decrypt_read(spark, tmp_path, capsys):
    import json

    from neosync_spark.cli import main
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.operators.crypto_shred import KeyStore, decrypt_read

    log_dir = str(tmp_path / "log")
    table = str(tmp_path / "t")
    ks = str(tmp_path / "ks")
    assert main(["synth", "--out", log_dir, "--events", "1500"]) == 0
    assert main([
        "replay", "--log", log_dir, "--table", table,
        "--batch-size", "800",
        "--encrypt-cols", "text", "--keystore", ks,
    ]) == 0
    capsys.readouterr()
    expected = _lww_text(spark, log_dir)
    t = SnapshotTable.load(spark, table)
    stored = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()
    }
    assert set(stored) == set(expected)
    # at rest: every non-NULL text is ciphertext, not the plaintext
    assert all(
        v != expected[k] for k, v in stored.items() if expected[k] is not None
    )
    # decrypted read equals the plaintext LWW oracle
    dec = decrypt_read(
        t.read(), KeyStore(spark, ks).load(), "conv_id", ["text"]
    )
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in dec.collect()}
    assert got == expected
    # shred one conversation; its rows now read NULL, others unchanged
    victim = next(iter(expected))[0]
    assert main(["shred", "--keystore", ks, "--subjects", victim]) == 0
    assert json.loads(capsys.readouterr().out)["keys_destroyed"] == 1
    dec2 = decrypt_read(
        t.read(), KeyStore(spark, ks).load(), "conv_id", ["text"]
    )
    got2 = {(r["conv_id"], r["turn_idx"]): r["text"] for r in dec2.collect()}
    assert all(v is None for k, v in got2.items() if k[0] == victim)
    assert all(
        v == expected[k] for k, v in got2.items() if k[0] != victim
    )
    # CLI read path: get --decrypt-cols on a surviving conversation
    keep = next(k for k in expected if k[0] != victim)[0]
    assert main([
        "get", "--table", table, "--key", keep,
        "--keystore", ks, "--decrypt-cols", "text",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)["rows"]
    assert rows and all(
        r["text"] == expected[(keep, r["turn_idx"])] for r in rows
    )


def test_cli_encrypt_rollout_existing_table(spark, tmp_path, capsys):
    import json

    from neosync_spark.cli import main
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.operators.crypto_shred import KeyStore, decrypt_read

    log_dir = str(tmp_path / "log")
    table = str(tmp_path / "t")
    ks = str(tmp_path / "ks")
    assert main(["synth", "--out", log_dir, "--events", "1200"]) == 0
    assert main(["replay", "--log", log_dir, "--table", table]) == 0
    capsys.readouterr()
    expected = _lww_text(spark, log_dir)
    assert main([
        "encrypt", "--table", table, "--keystore", ks, "--cols", "text",
    ]) == 0
    capsys.readouterr()
    t = SnapshotTable.load(spark, table)
    stored = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()
    }
    assert all(
        v != expected[k] for k, v in stored.items() if expected[k] is not None
    )
    dec = decrypt_read(
        t.read(), KeyStore(spark, ks).load(), "conv_id", ["text"]
    )
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in dec.collect()}
    assert got == expected
    # idempotent: a second rollout is a guarded no-op, never a
    # double-encryption
    assert main([
        "encrypt", "--table", table, "--keystore", ks, "--cols", "text",
    ]) == 0
    assert "already_encrypted" in capsys.readouterr().out


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
