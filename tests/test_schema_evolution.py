"""Schema-evolution fixture (FIXTURES.md §4): the change log starts
without `tool` (v1) and adds it (plus an int→long widening of turn_idx)
at lsn L0; the engine must ALTER the table before applying the first
post-L0 batch, and reads must align old files to the new schema.

Reference analog: schema diff → ordered DDL before sync
(/root/reference/internal/schema-manager/mysql/mysql.go:220-351) with
halt/passthrough/automap policies
(/root/reference/internal/benthos/benthos-builder/builders/sql.go:93-152).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.schema_registry import (
    POLICY_HALT,
    SchemaRegistry,
    SchemaVersion,
    diff_schemas,
    ensure_table_schema,
)
from neosync_spark.sources.changelog import ChangeLogSource
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal

L0 = 4_000
CFG = SynthConfig(n_events=8_000, n_convs=300, evolution_lsn=L0)
BATCH = 2_000

V1 = transcript_schema(with_tool=False, wide_turn_idx=False)
V2 = transcript_schema(with_tool=True, wide_turn_idx=True)


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("log") / "changelog")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(p)
    return p


def test_diff_ordering():
    ops = diff_schemas(V1, V2)
    assert [o["op"] for o in ops] == ["alter_column_type", "add_column"]
    assert ops[0]["name"] == "turn_idx" and ops[0]["to"] == "bigint"
    assert ops[1]["name"] == "tool"


def test_engine_alters_mid_log(spark, tmp_path, log_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), V1, key_cols=KEY_COLS, n_buckets=8)
    reg = SchemaRegistry(
        versions=[SchemaVersion(1, V1, 0), SchemaVersion(2, V2, L0)]
    )
    eng = ReplayEngine(
        spark, t, registry=reg, config=EngineConfig(batch_lsn_size=BATCH)
    )
    stats = eng.replay(ChangeLogSource(spark, log_path))
    assert {(o["op"], o["name"]) for o in stats.schema_ops} == {
        ("alter_column_type", "turn_idx"),
        ("add_column", "tool"),
    }

    got = t.read().toPandas()
    schema = {f.name: f.dataType for f in t.read().schema.fields}
    assert isinstance(schema["turn_idx"], T.LongType)
    assert "tool" in got.columns

    exp = expected_final_state(generate_pandas(CFG))
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])
    # pre-L0 rows (written under v1) must read back with null tool
    # UNLESS a post-L0 event updated them — spot check alignment worked:
    assert got["tool"].notna().sum() > 0


def test_halt_policy_raises(spark, tmp_path, log_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), V1, key_cols=KEY_COLS, n_buckets=8)
    reg = SchemaRegistry(
        versions=[SchemaVersion(1, V1, 0), SchemaVersion(2, V2, L0)],
        policy=POLICY_HALT,
    )
    eng = ReplayEngine(spark, t, registry=reg, config=EngineConfig(batch_lsn_size=BATCH))
    with pytest.raises(RuntimeError, match="schema drift"):
        eng.replay(ChangeLogSource(spark, log_path))


def test_ensure_noop_when_in_sync(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), V2, key_cols=KEY_COLS, n_buckets=4)
    assert ensure_table_schema(t, V2) == []
