"""Incremental SCD2 dimension maintenance (operators/scd.scd2_sync):
epoch-stitched versions must equal the one-shot scd2_history over the
full log (lsn order), exactly-once under replay, with version_seq
continuity across deletes."""
from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.operators.scd import (
    scd2_dim_schema,
    scd2_history,
    scd2_state,
    scd2_sync,
)

EVT = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts double, lsn long, op string"
)
KEYS = ["conv_id", "turn_idx"]
ATTRS = ["role", "text", "tool"]


def _ev(spark, rows):
    return spark.createDataFrame(rows, EVT).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _mk_dim(spark, sample):
    return SnapshotTable.create(
        spark,
        tempfile.mkdtemp(prefix="ns_scd2_dim_"),
        scd2_dim_schema(sample.schema, KEYS, ATTRS),
        key_cols=[*KEYS, "version_seq"],
        n_buckets=4,
    )


def _log(spark):
    rows = []
    lsn = 0
    for i in range(9):
        conv, turn = f"c{i % 3}", i % 2
        rows.append((conv, turn, "user", f"v{lsn}", None, 1.0 + i, lsn, "insert"))
        lsn += 1
        if i % 3 == 1:
            rows.append((conv, turn, "user", f"v{lsn}", None, 2.0 + i, lsn, "update"))
            lsn += 1
        if i % 4 == 2:
            rows.append((conv, turn, None, None, None, 3.0 + i, lsn, "delete"))
            lsn += 1
    # re-insert after a delete: version_seq must continue, not restart
    rows.append(("c2", 0, "assistant", "reborn", None, 50.0, lsn, "insert"))
    return _ev(spark, rows), lsn + 1


def _cols(df):
    return df.select(
        *KEYS, "version_seq", *ATTRS,
        "valid_from_lsn", "valid_to_lsn", "is_current",
    )


def _sorted_rows(df):
    return sorted(
        tuple(r) for r in _cols(df).collect()
    )


def test_incremental_equals_one_shot(spark):
    log, hi = _log(spark)
    dim = _mk_dim(spark, log)
    for lo, up in [(0, hi // 3), (hi // 3, 2 * hi // 3), (2 * hi // 3, hi)]:
        scd2_sync(
            dim,
            log.filter((F.col("lsn") >= lo) & (F.col("lsn") < up)),
            applied_range=(lo, up),
            key_cols=KEYS,
            attr_cols=ATTRS,
        )
    oneshot = scd2_history(
        log.drop("ts"), KEYS, order_cols=("lsn",), attr_cols=ATTRS
    )
    assert _sorted_rows(scd2_state(dim)) == _sorted_rows(oneshot)


def test_replayed_epoch_is_noop(spark):
    log, hi = _log(spark)
    dim = _mk_dim(spark, log)
    mid = hi // 2
    first = log.filter(F.col("lsn") < mid)
    scd2_sync(dim, first, (0, mid), KEYS, ATTRS)
    sid = dim.manifest(refresh=True)["snapshot_id"]
    info = scd2_sync(dim, first, (0, mid), KEYS, ATTRS)
    assert info.rows_written == 0
    assert dim.manifest(refresh=True)["snapshot_id"] == sid
    scd2_sync(dim, log.filter(F.col("lsn") >= mid), (mid, hi), KEYS, ATTRS)
    oneshot = scd2_history(
        log.drop("ts"), KEYS, order_cols=("lsn",), attr_cols=ATTRS
    )
    assert _sorted_rows(scd2_state(dim)) == _sorted_rows(oneshot)


def test_seq_continues_across_delete(spark):
    log, hi = _log(spark)
    dim = _mk_dim(spark, log)
    scd2_sync(dim, log, (0, hi), KEYS, ATTRS)
    reborn = (
        scd2_state(dim)
        .filter((F.col("conv_id") == "c2") & (F.col("turn_idx") == 0)
                & (F.col("text") == "reborn"))
        .collect()
    )
    assert len(reborn) == 1
    # its seq counts every prior event for the key, deletes included
    prior = log.filter(
        (F.col("conv_id") == "c2") & (F.col("turn_idx") == 0)
    ).count()
    assert reborn[0]["version_seq"] == prior
    assert reborn[0]["is_current"] == 1


def test_duplicate_deliveries_collapse(spark):
    log, hi = _log(spark)
    dup = log.unionByName(log.filter(F.col("lsn") % 2 == 0))
    dim = _mk_dim(spark, log)
    mid = hi // 2
    scd2_sync(dim, dup.filter(F.col("lsn") < mid), (0, mid), KEYS, ATTRS)
    scd2_sync(dim, dup.filter(F.col("lsn") >= mid), (mid, hi), KEYS, ATTRS)
    oneshot = scd2_history(
        log.drop("ts"), KEYS, order_cols=("lsn",), attr_cols=ATTRS
    )
    assert _sorted_rows(scd2_state(dim)) == _sorted_rows(oneshot)


def test_dim_schema_evolves_with_new_attr(spark):
    # source adds 'tool' mid-stream: the dimension evolves BEFORE the
    # epoch applies (engine SchemaInit ordering); earlier versions
    # read NULL for the new column
    log, hi = _log(spark)
    mid = hi // 2
    dim = SnapshotTable.create(
        spark,
        tempfile.mkdtemp(prefix="ns_scd2_evo_"),
        scd2_dim_schema(log.schema, KEYS, ["role", "text"]),
        key_cols=[*KEYS, "version_seq"],
        n_buckets=4,
    )
    scd2_sync(dim, log.filter(F.col("lsn") < mid), (0, mid),
              KEYS, ["role", "text"])
    assert "tool" not in dim.read().columns
    scd2_sync(dim, log.filter(F.col("lsn") >= mid), (mid, hi),
              KEYS, ["role", "text", "tool"])
    out = scd2_state(dim)
    assert "tool" in out.columns
    # pre-evolution versions carry NULL tool; the full history matches
    # one-shot on the always-present attrs
    oneshot = scd2_history(
        log.drop("ts"), KEYS, order_cols=("lsn",),
        attr_cols=["role", "text"],
    )
    common = [*KEYS, "version_seq", "role", "text",
              "valid_from_lsn", "valid_to_lsn", "is_current"]
    assert sorted(tuple(r) for r in out.select(*common).collect()) == \
           sorted(tuple(r) for r in oneshot.select(*common).collect())
    assert out.filter(
        (F.col("valid_from_lsn") < mid) & F.col("tool").isNotNull()
    ).count() == 0
