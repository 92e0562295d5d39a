"""Multi-table sync-and-anonymize over the TPC-H-ish tables: consistent
subsetting, DAG-ordered execution, transformed keys propagated through
FK rewrites (referential integrity preserved)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neosync_spark.operators.subset import FkEdge
from neosync_spark.plans.job import ColumnMapping
from neosync_spark.plans.multi import MultiTableJob, TableSpec, run_multi_table_sync

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sources(spark):
    return {
        t: spark.read.parquet(f"{SF}/{t}.parquet")
        for t in ["customer", "orders", "lineitem"]
    }


def _job():
    return MultiTableJob(
        tables={
            "customer": TableSpec(
                "customer",
                key_cols=["c_custkey"],
                mappings=[
                    ColumnMapping("c_custkey", "transform_string",
                                  {"preserve_length": False, "min_length": 12, "max_length": 12}),
                    ColumnMapping("c_name", "transform_full_name"),
                ],
            ),
            "orders": TableSpec(
                "orders",
                key_cols=["o_orderkey"],
                fk_rewrites={"o_custkey": ("customer", "c_custkey")},
            ),
            "lineitem": TableSpec("lineitem", key_cols=["l_orderkey", "l_linenumber"]),
        },
        edges=[
            FkEdge("orders", "o_custkey", "customer", "c_custkey"),
            FkEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
        subset_root="customer",
        subset_where="c_mktsegment = 'BUILDING'",
        seed=11,
    )


def test_multi_table_sync(spark, sources):
    out = run_multi_table_sync(spark, _job(), sources)

    cust = out["customer"].toPandas()
    ords = out["orders"].toPandas()
    items = out["lineitem"].toPandas()

    # subsetting: only BUILDING customers and their orders/items survive
    src_cust = sources["customer"].filter("c_mktsegment = 'BUILDING'").toPandas()
    assert len(cust) == len(src_cust)
    src_ord = (
        sources["orders"]
        .join(
            sources["customer"].filter("c_mktsegment = 'BUILDING'").select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .count()
    )
    assert len(ords) == src_ord
    assert len(items) > 0

    # anonymization happened
    assert not set(cust["c_name"]) & set(src_cust["c_name"])
    assert cust["c_custkey"].map(lambda s: isinstance(s, str) and len(s) == 12).all()

    # referential integrity through the key mapping: every order's
    # rewritten custkey exists among the transformed customer keys,
    # and cardinality per customer is preserved
    assert set(ords["o_custkey"]) <= set(cust["c_custkey"])
    src_counts = (
        sources["orders"]
        .groupBy("o_custkey").count().toPandas().set_index("o_custkey")["count"]
    )
    got_counts = ords.groupby("o_custkey").size()
    assert sorted(got_counts[got_counts.index.isin(set(ords["o_custkey"]))].tolist()) == sorted(
        src_counts[src_counts.index.isin(set(src_cust["c_custkey"]))].tolist()
    )


def test_deterministic_across_runs(spark, sources):
    a = run_multi_table_sync(spark, _job(), sources)["customer"].toPandas()
    b = run_multi_table_sync(spark, _job(), sources)["customer"].toPandas()
    a = a.sort_values("c_custkey").reset_index(drop=True)
    b = b.sort_values("c_custkey").reset_index(drop=True)
    assert a.equals(b)


def test_fk_violation_split_null_match_simple(spark):
    """SQL MATCH SIMPLE: a NULL FK component can't violate — lands in
    applied; non-null misses are skipped."""
    from neosync_spark.operators.subset import fk_violation_split

    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 20)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    applied, skipped = fk_violation_split(child, parent, "fk", "pk")
    assert sorted(r["id"] for r in applied.collect()) == [1, 3, 4]
    assert [r["id"] for r in skipped.collect()] == [2]


def test_engine_fk_check_quarantines_and_counts(spark, tmp_path):
    """Engine-level skip_foreign_key_violations: violators land in
    metadata/quarantine_fk, the rest apply, stats count both."""
    import pandas as pd
    from pyspark.sql import functions as F

    from neosync_spark.engine import EngineConfig, FkCheck, ReplayEngine
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.schema import KEY_COLS, transcript_schema
    from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

    log = generate_pandas(SynthConfig(n_events=2000, n_convs=100))
    sdf = spark.createDataFrame(log)
    # parent "conversations registry" missing some conv_ids
    convs = sorted(log["conv_id"].unique())
    allowed = convs[: len(convs) - 10]
    parent = spark.createDataFrame([(c,) for c in allowed], "conv_id string")

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=4
    )
    eng = ReplayEngine(
        spark, t,
        config=EngineConfig(
            batch_lsn_size=1000,
            fk_check=FkCheck(parent, "conv_id", "conv_id"),
        ),
    )
    stats = eng.replay(
        lambda lo, hi: sdf.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
        lsn_lo=0, lsn_hi=1999,
    )
    n_viol = int((~log["conv_id"].isin(allowed)).sum())
    assert stats.rows_skipped_fk == n_viol > 0
    q = spark.read.parquet(
        str(tmp_path / "t" / "metadata" / "quarantine_fk")
    ).toPandas()
    assert len(q) == n_viol
    assert not set(q["conv_id"]) & set(allowed)
    # final state == oracle over only the allowed conversations
    got = t.read().toPandas()
    exp = expected_final_state(log[log["conv_id"].isin(allowed)])
    from .conftest import assert_pdf_equal

    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])


def test_requeue_fk_quarantine_heals(spark, tmp_path):
    """After the parent catches up, requeue applies the quarantined
    rows through the normal transform+LWW path and the table converges
    to the no-violation final state; a second requeue is a no-op."""
    from pyspark.sql import functions as F

    from neosync_spark.engine import EngineConfig, FkCheck, ReplayEngine
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.schema import KEY_COLS, transcript_schema
    from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

    log = generate_pandas(SynthConfig(n_events=2000, n_convs=100))
    sdf = spark.createDataFrame(log)
    convs = sorted(log["conv_id"].unique())
    narrowed = spark.createDataFrame(
        [(c,) for c in convs[: len(convs) - 10]], "conv_id string"
    )
    full = spark.createDataFrame([(c,) for c in convs], "conv_id string")

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=4
    )
    eng = ReplayEngine(
        spark, t,
        config=EngineConfig(
            batch_lsn_size=1000, fk_check=FkCheck(narrowed, "conv_id", "conv_id")
        ),
    )
    stats = eng.replay(
        lambda lo, hi: sdf.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
        lsn_lo=0, lsn_hi=1999,
    )
    assert stats.rows_skipped_fk > 0

    # the parent catches up: requeue against the full key set
    heal = ReplayEngine(
        spark, t,
        config=EngineConfig(fk_check=FkCheck(full, "conv_id", "conv_id")),
    )
    res = heal.requeue_fk_quarantine()
    assert res["requeued"] > 0 and res["still_skipped"] == 0

    from .conftest import assert_pdf_equal

    assert_pdf_equal(
        t.read().toPandas(), expected_final_state(log), ["conv_id", "turn_idx"]
    )
    # quarantine drained; second requeue is a no-op
    assert heal.requeue_fk_quarantine() == {"requeued": 0, "still_skipped": 0}


def test_requeue_partial_parent_keeps_backlog(spark, tmp_path):
    """A requeue against a still-incomplete parent applies only the
    now-valid rows and keeps the rest as backlog for the next requeue."""
    from pyspark.sql import functions as F

    from neosync_spark.engine import EngineConfig, FkCheck, ReplayEngine
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.schema import KEY_COLS, transcript_schema
    from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

    log = generate_pandas(SynthConfig(n_events=2000, n_convs=100))
    sdf = spark.createDataFrame(log)
    convs = sorted(log["conv_id"].unique())
    p1 = spark.createDataFrame([(c,) for c in convs[:-10]], "conv_id string")
    p2 = spark.createDataFrame([(c,) for c in convs[:-5]], "conv_id string")
    full = spark.createDataFrame([(c,) for c in convs], "conv_id string")

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=4
    )
    ReplayEngine(
        spark, t,
        config=EngineConfig(batch_lsn_size=1000, fk_check=FkCheck(p1, "conv_id", "conv_id")),
    ).replay(
        lambda lo, hi: sdf.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
        lsn_lo=0, lsn_hi=1999,
    )

    mid = ReplayEngine(
        spark, t, config=EngineConfig(fk_check=FkCheck(p2, "conv_id", "conv_id"))
    ).requeue_fk_quarantine()
    assert mid["requeued"] > 0 and mid["still_skipped"] > 0

    fin = ReplayEngine(
        spark, t, config=EngineConfig(fk_check=FkCheck(full, "conv_id", "conv_id"))
    ).requeue_fk_quarantine()
    assert fin["requeued"] > 0 and fin["still_skipped"] == 0

    from .conftest import assert_pdf_equal

    assert_pdf_equal(
        t.read().toPandas(), expected_final_state(log), ["conv_id", "turn_idx"]
    )


def test_requeue_zero_heal_no_commit(spark, tmp_path):
    """A requeue where nothing heals must not commit a snapshot (no
    retention erosion from failed attempts) and must keep the backlog."""
    from pyspark.sql import functions as F

    from neosync_spark.engine import EngineConfig, FkCheck, ReplayEngine
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.schema import KEY_COLS, transcript_schema
    from neosync_spark.synth import SynthConfig, generate_pandas

    log = generate_pandas(SynthConfig(n_events=1000, n_convs=50))
    sdf = spark.createDataFrame(log)
    convs = sorted(log["conv_id"].unique())
    narrowed = spark.createDataFrame(
        [(c,) for c in convs[:-10]], "conv_id string"
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=4
    )
    eng = ReplayEngine(
        spark, t,
        config=EngineConfig(
            batch_lsn_size=1000, fk_check=FkCheck(narrowed, "conv_id", "conv_id")
        ),
    )
    eng.replay(
        lambda lo, hi: sdf.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
        lsn_lo=0, lsn_hi=999,
    )
    sid_before = t.manifest(refresh=True)["snapshot_id"]

    # same (still-narrowed) parent: nothing heals
    res = eng.requeue_fk_quarantine()
    assert res["requeued"] == 0 and res["still_skipped"] > 0
    assert t.manifest(refresh=True)["snapshot_id"] == sid_before

    # backlog survives for a later requeue that CAN heal
    full = spark.createDataFrame([(c,) for c in convs], "conv_id string")
    res2 = ReplayEngine(
        spark, t, config=EngineConfig(fk_check=FkCheck(full, "conv_id", "conv_id"))
    ).requeue_fk_quarantine()
    assert res2["requeued"] == res["still_skipped"]
    assert res2["still_skipped"] == 0


def test_schema_init_before_sync_converges(spark, sources, tmp_path):
    """SchemaInit-before-sync (VERDICT r3 #6): a destination starting
    with drifted schema (missing + extra column) and stale constraints
    converges — reconcile plan in reference DDL order (drop constraints
    -> column ops -> add constraints), second init is a no-op, synced
    rows LWW over pre-existing destination rows."""
    from pyspark.sql import types as T

    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.plans.multi import schema_init
    from neosync_spark.schema_constraints import Constraint, ConstraintSet

    dest_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.StringType()),
            T.StructField("legacy_note", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    dest = SnapshotTable.create(
        spark, str(tmp_path / "orders_dst"), dest_schema,
        key_cols=["o_orderkey"], order_cols=["ts"], n_buckets=4,
    )
    seed_rows = sources["orders"].filter(F.col("o_orderkey") % 19 == 0).select(
        F.col("o_orderkey").cast("long"),
        F.col("o_custkey").cast("string"),
        F.lit("legacy").alias("legacy_note"),
        F.lit("insert").alias("op"),
        F.col("o_orderkey").cast("long").alias("lsn"),
        F.timestamp_seconds(F.lit(1)).alias("ts"),
    )
    dest.merge_cdc(seed_rows, applied_range=(0, 1), source_is_raw=False,
                   lineage=False)
    n_seed = dest.read().count()
    assert n_seed > 0

    job = _job()
    job.constraints = ConstraintSet().add(
        Constraint("orders_pk", "orders", "primary_key", ("o_orderkey",))
    )
    dest_cons = ConstraintSet().add(
        Constraint("orders_legacy_ck", "orders", "check",
                   expr="legacy_note IS NOT NULL")
    )

    report = schema_init(
        spark, job, sources, {"orders": dest}, dest_constraints=dest_cons
    )
    plan_ops = [p["op"] for p in report["reconcile_plan"]]
    # reference DDL order: drops first, column ops, adds last
    assert plan_ops.index("drop_constraint") < plan_ops.index("drop_column")
    assert plan_ops.index("add_column") < plan_ops.index("add_constraint")
    col_ops = {o["op"] for o in report["column_ops"]["orders"]}
    assert "add_column" in col_ops and "drop_column" in col_ops
    # physical schema converged: evolved column present, legacy dropped
    names = [f.name for f in dest.current_schema().fields]
    assert "o_orderstatus" in names and "legacy_note" not in names
    # second init: no drift left
    again = schema_init(spark, job, sources, {"orders": dest},
                        dest_constraints=job.constraints)
    assert again["column_ops"]["orders"] == []

    out = run_multi_table_sync(
        spark, job, sources, destinations={"orders": dest},
        dest_constraints=dest_cons,
    )
    final = dest.read()
    synced_keys = {r[0] for r in out["orders"].select("o_orderkey").collect()}
    rows = {r["o_orderkey"]: r for r in final.collect()}
    # synced rows won (pseudonymized FK); untouched seeds survive with
    # NULL in the evolved column
    for k, r in rows.items():
        if k in synced_keys:
            assert r["o_orderstatus"] is not None
        else:
            assert r["o_orderstatus"] is None
    assert len(rows) == len(synced_keys | {r[0] for r in seed_rows.select("o_orderkey").collect()})
    # replayed sync is a ledger no-op
    run_multi_table_sync(spark, job, sources, destinations={"orders": dest},
                         dest_constraints=dest_cons)
    # a second run advances the epoch (new applied_range) but must not
    # change the final state (same keys, same values by LWW re-upsert)
    assert dest.read().count() == len(rows)


def test_catalog_publish_after_sync_is_atomic(spark, sources, tmp_path):
    """run_multi_table_sync(catalog=...): after every wave loads, ALL
    destination pins move in one catalog version step — catalog readers
    flip from the pre-sync view to the post-sync one atomically."""
    from pyspark.sql import types as T

    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.plans.catalog import Catalog

    job = _job()
    dest_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.StringType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    dest = SnapshotTable.create(
        spark, str(tmp_path / "orders_cat"), dest_schema,
        key_cols=["o_orderkey"], order_cols=["ts"], n_buckets=4,
    )
    cat = Catalog.create(str(tmp_path / "cat"))
    cat.publish({"orders": dest})  # pre-sync pin (empty table)
    v0 = cat.version()
    pre_n = cat.read(spark, "orders").count()
    assert pre_n == 0

    run_multi_table_sync(
        spark, job, sources, destinations={"orders": dest}, catalog=cat,
    )
    assert cat.version() == v0 + 1  # ONE atomic step for the whole sync
    assert cat.read(spark, "orders").count() == dest.read().count() > 0
