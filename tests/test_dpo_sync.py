"""Incremental DPO preference mining (operators/dpo_sync.py): the
log's losing versions harvested epoch-by-epoch; state folds in WAL
(lsn) order and serves pairs without rereading the log."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neosync_spark.operators.conversations import preference_pairs
from neosync_spark.operators.dpo_sync import (
    create_dpo_state,
    dpo_pairs,
    dpo_sync,
)

_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
    ]
)


def _log(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (op, c, t, r, x, None, base + dt.timedelta(seconds=lsn), lsn)
            for (op, c, t, r, x, lsn) in rows
        ],
        _SCHEMA,
    )


ROWS = [
    # plain rewrite: chosen=B, rejected=A
    ("insert", "c1", 0, "assistant", "A", 1),
    ("update", "c1", 0, "assistant", "B", 2),
    # flip-flop A->B->A: chosen=A, rejected=B (not a self-pair)
    ("insert", "c2", 0, "assistant", "A", 3),
    ("update", "c2", 0, "assistant", "B", 4),
    ("update", "c2", 0, "assistant", "A", 5),
    # delete -> revive with the ORIGINAL text: rejected = the
    # intermediate version (state must not lose it across the delete)
    ("insert", "c3", 0, "assistant", "A", 6),
    ("update", "c3", 0, "assistant", "B", 7),
    ("delete", "c3", 0, None, None, 8),
    ("insert", "c3", 0, "assistant", "A", 9),
    # deleted key: never served
    ("insert", "c4", 0, "assistant", "A", 10),
    ("update", "c4", 0, "assistant", "B", 11),
    ("delete", "c4", 0, None, None, 12),
    # single version: no pair
    ("insert", "c5", 0, "assistant", "only", 13),
    # non-assistant rewrites: never served
    ("insert", "c6", 0, "user", "A", 14),
    ("update", "c6", 0, "user", "B", 15),
]


@pytest.mark.parametrize("epochs", [1, 3, 5])
def test_epoched_fold_equals_one_shot(spark, tmp_path, epochs):
    log = _log(spark, ROWS)
    hi = 16
    state = create_dpo_state(
        spark, str(tmp_path / f"st{epochs}"), n_buckets=4
    )
    w = hi // epochs + 1
    for k in range(epochs):
        lo, h = k * w, min((k + 1) * w, hi)
        dpo_sync(
            state,
            log.filter((F.col("lsn") >= lo) & (F.col("lsn") < h)),
            (lo, h),
        )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["chosen"], r["rejected"], r["n_versions"]
        )
        for r in dpo_pairs(state).collect()
    }
    assert got == {
        ("c1", 0): ("B", "A", 2),
        ("c2", 0): ("A", "B", 2),
        ("c3", 0): ("A", "B", 2),
    }
    one = preference_pairs(log, order_cols=("lsn",))
    inc = dpo_pairs(state)
    assert one.exceptAll(inc).count() == 0
    assert inc.exceptAll(one).count() == 0


def test_exactly_once_and_order_guard(spark, tmp_path):
    log = _log(spark, ROWS)
    state = create_dpo_state(spark, str(tmp_path / "st"), n_buckets=4)
    info1 = dpo_sync(state, log.filter(F.col("lsn") < 8), (0, 8))
    # replaying the same span is a no-op
    again = dpo_sync(state, log.filter(F.col("lsn") < 8), (0, 8))
    assert again.snapshot_id == info1.snapshot_id
    # an out-of-order (overlapping, non-replay) epoch is rejected: a
    # fold cannot commute
    with pytest.raises(ValueError, match="in-order"):
        dpo_sync(state, log.filter(F.col("lsn") < 5), (0, 5))
    dpo_sync(state, log.filter(F.col("lsn") >= 8), (8, 16))
    one = preference_pairs(log, order_cols=("lsn",))
    assert one.exceptAll(dpo_pairs(state)).count() == 0


def test_disordered_payload_ts_does_not_corrupt_the_fold(spark, tmp_path):
    # payload ts runs BACKWARD across epochs; WAL-order folding must
    # still match the lsn-ordered one-shot miner
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("insert", "c1", 0, "assistant", "A", None, base + dt.timedelta(9), 1),
        ("update", "c1", 0, "assistant", "B", None, base + dt.timedelta(1), 2),
        ("update", "c1", 0, "assistant", "C", None, base + dt.timedelta(5), 3),
    ]
    log = spark.createDataFrame(rows, _SCHEMA)
    state = create_dpo_state(spark, str(tmp_path / "st"), n_buckets=4)
    dpo_sync(state, log.filter(F.col("lsn") <= 2), (0, 3))
    dpo_sync(state, log.filter(F.col("lsn") == 3), (3, 4))
    got = dpo_pairs(state).collect()
    assert len(got) == 1
    assert (got[0]["chosen"], got[0]["rejected"]) == ("C", "B")
