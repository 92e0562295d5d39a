"""SCD type-2 history (operators/scd.py) and overlapping text chunking
(operators/text.chunk_text_overlap).

Reference parity: the reference materializes only CURRENT state via
`ON CONFLICT DO UPDATE` (worker/pkg/benthos/sql/output_sql_insert.go:
187-191); the type-2 shape is the standard warehouse consumption of
the same change feed (Kimball), so correctness here is defined against
a sequential interpreter of the log, not against the reference.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from neosync_spark.operators.dedup import lww_dedup
from neosync_spark.operators.scd import scd2_current, scd2_history
from neosync_spark.operators.text import chunk_text_overlap

_T0 = dt.datetime(2024, 1, 1)


def _ev(lsn, op, k, txt, ts_off):
    return (lsn, op, "c", k, txt, _T0 + dt.timedelta(seconds=ts_off))


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, op string, conv_id string, turn_idx int, text string, ts timestamp"
    )


def test_scd2_ranges_and_current(spark):
    rows = [
        _ev(1, "insert", 0, "a0", 0),
        _ev(2, "update", 0, "a1", 10),
        _ev(5, "update", 0, "a2", 20),
        _ev(3, "insert", 1, "b0", 5),
        _ev(4, "delete", 1, None, 15),   # closes b0, emits no row
        _ev(6, "insert", 2, "c0", 30),
        _ev(6, "insert", 2, "c0", 30),   # duplicate delivery: same lsn
    ]
    h = scd2_history(
        _log(spark, rows), ["conv_id", "turn_idx"], ["ts", "lsn"], ["text"]
    )
    got = {
        (r.turn_idx, r.version_seq): (
            r.text, r.valid_from_lsn, r.valid_to_lsn, r.is_current
        )
        for r in h.collect()
    }
    assert got == {
        (0, 1): ("a0", 1, 2, 0),
        (0, 2): ("a1", 2, 5, 0),
        (0, 3): ("a2", 5, None, 1),
        (1, 1): ("b0", 3, 4, 0),  # closed by the delete, NOT current
        (2, 1): ("c0", 6, None, 1),  # duplicate collapsed: one version
    }
    cur = {r.turn_idx: r.text for r in scd2_current(h).collect()}
    assert cur == {0: "a2", 2: "c0"}


def test_scd2_out_of_order_arrival_matches_ts_order(spark):
    # events arrive lsn-shuffled; ranges follow (ts, lsn), not arrival
    rows = [
        _ev(9, "update", 0, "late", 50),
        _ev(1, "insert", 0, "first", 0),
        _ev(5, "update", 0, "mid", 25),
    ]
    h = scd2_history(
        _log(spark, rows), ["conv_id", "turn_idx"], ["ts", "lsn"], ["text"]
    )
    seqs = {r.version_seq: (r.text, r.is_current) for r in h.collect()}
    assert seqs == {1: ("first", 0), 2: ("mid", 0), 3: ("late", 1)}


def test_scd2_current_equals_lww_minus_deletes(spark):
    # property: is_current projection == lww_dedup with deleted keys dropped
    import random

    rng = random.Random(7)
    rows = []
    for lsn in range(1, 400):
        k = rng.randrange(12)
        op = rng.choice(["insert", "update", "update", "delete"])
        rows.append(_ev(lsn, op, k, f"t{lsn}" if op != "delete" else None,
                        rng.randrange(1000)))
    log = _log(spark, rows)
    h = scd2_history(log, ["conv_id", "turn_idx"], ["ts", "lsn"], ["text"])
    cur = {
        (r.conv_id, r.turn_idx): r.text for r in scd2_current(h).collect()
    }
    lww = {
        (r.conv_id, r.turn_idx): r.text
        for r in lww_dedup(log, ["conv_id", "turn_idx"], ["ts", "lsn"])
        .filter(F.col("op") != "delete")
        .collect()
    }
    assert cur == lww


def test_scd2_single_window_pass(spark):
    rows = [_ev(1, "insert", 0, "a", 0), _ev(2, "update", 0, "b", 1)]
    h = scd2_history(
        _log(spark, rows), ["conv_id", "turn_idx"], ["ts", "lsn"], ["text"]
    )
    plan = h._jdf.queryExecution().executedPlan().toString()
    # dedupe-lag + (row_number, leads) share one window SPEC -> at most
    # two Window ops over ONE key-hash exchange and ONE sort
    assert plan.count("Window") <= 2, plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") == 1, plan


# ------------------------------------------------------- chunking


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_overlap_reconstructs_document(spark):
    import random
    import string

    rng = random.Random(3)
    texts = [
        "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))
        for n in (0, 1, 99, 100, 101, 150, 349, 350, 351, 997)
    ]
    size, overlap, stride = 100, 30, 70
    out = chunk_text_overlap(_docs(spark, texts), "text", "doc_id", size, overlap)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        chunks = by_doc[i]
        # contiguous idx from 0; stride spacing; every doc chunked
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert all(c.chunk_start == c.chunk_idx * stride for c in chunks)
        # dropping each chunk's leading overlap (except the first)
        # reconstructs the document exactly
        rebuilt = chunks[0].chunk_text + "".join(
            c.chunk_text[overlap:] for c in chunks[1:]
        )
        assert rebuilt == t, f"doc {i} len {len(t)}"
        # every chunk except the last is full-size
        assert all(len(c.chunk_text) == size for c in chunks[:-1])


def test_chunk_overlap_zero_shuffle_plan(spark):
    out = chunk_text_overlap(_docs(spark, ["x" * 500]), "text", "doc_id", 128, 16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_chunk_overlap_null_and_validation(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, None), (1, "ab")], "doc_id long, text string"
    )
    got = chunk_text_overlap(df, "text", "doc_id", 10, 2).collect()
    assert [(r.doc_id, r.chunk_text) for r in got] == [(1, "ab")]
    with pytest.raises(ValueError):
        chunk_text_overlap(df, "text", "doc_id", 10, 10)
