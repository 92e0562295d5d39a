"""Edge combinations: tombstone expiry during compaction, and MoR
deltas written across a schema-evolution boundary."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.schema_registry import SchemaRegistry, SchemaVersion
from neosync_spark.sources.changelog import ChangeLogSource
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal


def _batch(spark, rows):
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf)


def test_compaction_expires_old_tombstones(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=4
    )
    t.merge_cdc(_batch(spark, [
        (1, "insert", "c1", 0, "user", "a", None, "2024-01-01 00:00:01"),
        (2, "delete", "c2", 0, None, None, None, "2024-01-01 00:00:02"),
        (3, "delete", "c3", 0, None, None, None, "2024-06-01 00:00:00"),
    ]), applied_range=(0, 10), mode="mor")
    # tombstones present internally
    internal = t.read(internal=True).toPandas()
    assert internal["_deleted"].sum() == 2
    # expire tombstones older than the late-arrival watermark
    t.compact(expire_tombstones_before=pd.Timestamp("2024-02-01"))
    internal2 = t.read(internal=True).toPandas()
    assert internal2["_deleted"].sum() == 1  # only the June tombstone kept
    assert t.read().count() == 1  # user-facing state unchanged


def test_mor_across_schema_evolution(spark, tmp_path):
    L0 = 4_000
    cfg = SynthConfig(n_events=8_000, n_convs=300, evolution_lsn=L0)
    log = generate_pandas(cfg)
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(log).write.parquet(log_dir)

    V1 = transcript_schema(with_tool=False)
    V2 = transcript_schema(with_tool=True, wide_turn_idx=True)
    t = SnapshotTable.create(spark, str(tmp_path / "t"), V1, key_cols=KEY_COLS, n_buckets=4)
    reg = SchemaRegistry(versions=[SchemaVersion(1, V1, 0), SchemaVersion(2, V2, L0)])
    eng = ReplayEngine(
        spark, t, registry=reg,
        config=EngineConfig(batch_lsn_size=2_000, merge_mode="mor", compact_deltas_over=None),
    )
    eng.replay(ChangeLogSource(spark, log_dir))

    exp = expected_final_state(log)
    assert_pdf_equal(t.read().toPandas(), exp, ["conv_id", "turn_idx"])

    # compaction folds mixed-schema deltas and preserves the state
    t.compact()
    assert t.delta_file_counts() == {}
    assert_pdf_equal(t.read().toPandas(), exp, ["conv_id", "turn_idx"])
