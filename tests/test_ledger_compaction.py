"""Exactly-once ledger compaction (SnapshotTable.compact_ledger) —
the metadata piece that otherwise grows per COMMIT (one row per
micro-batch) at 10^10-event cadence. is_applied stays EXACT over live
rows; containment applies only to compacted spans of dense histories,
and compaction refuses overlapping interleaved-summary rows."""
from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from neosync_spark.lakehouse import SnapshotTable, _coalesce_spans
from neosync_spark.schema import KEY_COLS, transcript_schema


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mk(spark):
    return SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="ns_lc_"), transcript_schema(),
        key_cols=KEY_COLS, n_buckets=2,
    )


def _batch(spark, i):
    return _ev(spark, [(f"c{i}", 0, "user", f"t{i}", None, 1.0 + i, i, "insert")])


def test_coalesce_spans_preserves_union():
    assert _coalesce_spans([(0, 5), (5, 10)]) == [(0, 10)]
    assert _coalesce_spans([(5, 10), (0, 5)]) == [(0, 10)]
    # gaps stay gaps (a held txn tail must not be claimed applied)
    assert _coalesce_spans([(0, 5), (7, 9)]) == [(0, 5), (7, 9)]
    assert _coalesce_spans([(0, 8), (2, 4)]) == [(0, 8)]
    assert _coalesce_spans([]) == []


def test_compaction_keeps_exactly_once(spark):
    t = _mk(spark)
    for i in range(8):
        t.merge_cdc(_batch(spark, i), applied_range=(i, i + 1))
    assert len(t.applied_ranges()) == 8
    out = t.compact_ledger(keep_last=2)
    assert out["rows_after"] == 3  # [0,6) span + 2 exact recent rows
    # every historical batch still answers applied (containment)
    for i in range(8):
        assert t.is_applied(i, i + 1)
    assert t.is_applied(0, 6) and t.is_applied(2, 5)
    assert not t.is_applied(7, 9) and not t.is_applied(8, 9)
    assert t.last_applied_lsn() == 8
    # a replayed old batch is still a NO-OP through merge_cdc
    before = t.manifest(refresh=True)["snapshot_id"]
    info = t.merge_cdc(_batch(spark, 3), applied_range=(3, 4))
    assert info.rows_written == 0
    assert t.manifest(refresh=True)["snapshot_id"] == before
    # and new work proceeds
    t.merge_cdc(_batch(spark, 8), applied_range=(8, 9))
    assert t.read().count() == 9


def test_compaction_preserves_gaps(spark):
    t = _mk(spark)
    t.merge_cdc(_batch(spark, 0), applied_range=(0, 3))
    t.merge_cdc(_batch(spark, 1), applied_range=(5, 7))  # gap [3,5)
    t.merge_cdc(_batch(spark, 2), applied_range=(7, 8))
    t.merge_cdc(_batch(spark, 3), applied_range=(8, 9))
    t.compact_ledger(keep_last=1)
    assert t.is_applied(0, 3) and t.is_applied(5, 8)
    assert not t.is_applied(3, 5)  # the gap was never applied
    assert not t.is_applied(0, 7)  # spans the gap


def test_noop_below_threshold(spark):
    t = _mk(spark)
    t.merge_cdc(_batch(spark, 0), applied_range=(0, 1))
    sid = t.manifest(refresh=True)["snapshot_id"]
    out = t.compact_ledger(keep_last=512)
    assert out["rows_before"] == out["rows_after"] == 1
    assert t.manifest(refresh=True)["snapshot_id"] == sid  # no commit


def test_sync_ordinal_monotone_across_compaction(spark):
    # a derived-table consumer's LWW ordinal must keep increasing even
    # after its ledger compacts (a ledger-row COUNT would regress)
    t = _mk(spark)
    seen = []
    for i in range(6):
        seen.append(t.sync_ordinal())
        t.merge_cdc(_batch(spark, i), applied_range=(i, i + 1))
    t.compact_ledger(keep_last=1)
    after = t.sync_ordinal()
    assert after > max(seen)
    t.merge_cdc(_batch(spark, 99), applied_range=(99, 100))
    assert t.sync_ordinal() > after


def test_never_applied_subrange_is_not_skipped(spark):
    # REGRESSION (streaming tail): epoch ranges can be min/max
    # summaries of lsn-interleaved batches — a later small range
    # inside an earlier summary's bounds was NEVER applied and must
    # not probe as applied (containment is reserved for compacted
    # spans of dense histories)
    t = _mk(spark)
    t.merge_cdc(_batch(spark, 0), applied_range=(5, 3900))
    assert not t.is_applied(100, 201)
    info = t.merge_cdc(_batch(spark, 1), applied_range=(100, 201))
    assert info.rows_written == 1  # applied, not skipped


def test_compaction_refuses_overlapping_summaries(spark):
    # interleaved-summary rows must stay exact forever: compacting
    # them into a span would make the subrange above falsely applied
    t = _mk(spark)
    t.merge_cdc(_batch(spark, 0), applied_range=(5, 3900))
    t.merge_cdc(_batch(spark, 1), applied_range=(100, 201))
    t.merge_cdc(_batch(spark, 2), applied_range=(3900, 4000))
    t.merge_cdc(_batch(spark, 3), applied_range=(4000, 4100))
    out = t.compact_ledger(keep_last=1)
    assert "skipped" in out
    assert out["rows_before"] == out["rows_after"] == 4
    assert not t.is_applied(300, 400)  # still exact semantics


def test_engine_auto_compacts_ledger(spark):
    # EngineConfig.ledger_keep bounds the ledger automatically: many
    # tiny batches, ledger must never exceed ~2x the keep window, and
    # replay/resume semantics survive (idempotent re-replay, correct
    # final state)
    from neosync_spark.engine import EngineConfig, ReplayEngine

    t = _mk(spark)
    log = _ev(spark, [
        (f"c{i % 7}", i % 3, "user", f"t{i}", None, 1.0 + i, i, "insert")
        for i in range(24)
    ])

    def slicer(lo, hi):
        return log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))

    cfg = EngineConfig(batch_lsn_size=1, ledger_keep=3,
                       lineage=False, prune_buckets=False)
    ReplayEngine(spark, t, config=cfg).replay(slicer, lsn_lo=0, lsn_hi=23)
    # 24 single-event batches; with keep=3 the ledger compacts whenever
    # it crosses 6 rows, so it never exceeds 2*keep + 1
    assert len(t.applied_ranges()) <= 7
    st = ReplayEngine(spark, t, config=cfg).replay(slicer, lsn_lo=0, lsn_hi=23)
    assert st.batches_applied == 0 and st.batches_skipped == 24
    assert t.read().count() == 21  # 7 convs x 3 turn_idx
    assert t.last_applied_lsn() == 24


def test_resume_after_compaction(spark):
    # engine-style resume: last_applied_lsn drives the next slice even
    # when every individual range has been squashed
    t = _mk(spark)
    for i in range(5):
        t.merge_cdc(_batch(spark, i), applied_range=(i * 10, i * 10 + 10))
    t.compact_ledger(keep_last=1)
    assert t.last_applied_lsn() == 50
    assert t.is_applied(0, 40)  # the squashed span
    assert t.is_applied(40, 50)  # the exact recent row

def test_property_random_ranges_probe_stable_under_compaction(spark):
    """Randomized: non-overlapping ranges with gaps, compactions
    interleaved — every exactly-applied range keeps answering True,
    every never-applied probe (gap subranges, straddles, fresh ranges)
    keeps answering False, and last_applied_lsn never moves."""
    import random

    rng = random.Random(1234)
    t = _mk(spark)
    applied: list[tuple[int, int]] = []
    cursor = 0
    for i in range(14):
        cursor += rng.randint(0, 5)          # maybe leave a gap
        width = rng.randint(1, 6)
        r = (cursor, cursor + width)
        cursor += width
        t.merge_cdc(_batch(spark, i), applied_range=r)
        applied.append(r)
        if i in (4, 9):
            t.compact_ledger(keep_last=rng.randint(1, 3))

    t.compact_ledger(keep_last=2)
    covered = _coalesce_spans(applied)

    def covered_by_applied(lo, hi):
        return any(s <= lo and hi <= e for s, e in covered)

    for r in applied:
        assert t.is_applied(*r), r
    # probes: subranges of gaps, straddles, and the open tail
    for lo in range(0, cursor + 3):
        for width in (1, 2, 5):
            hi = lo + width
            got = t.is_applied(lo, hi)
            if got:
                # True is only ever answered for covered lsn space —
                # never for a range touching a gap or the unapplied tail
                assert covered_by_applied(lo, hi), (lo, hi)
    assert t.last_applied_lsn() == max(e for _s, e in covered)
