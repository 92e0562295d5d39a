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
from datetime import datetime
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


class TestDropsRenamesPolicies:
    """Round-2 DDL breadth: drops, renames, and the reference's drift
    policies (builders/sql.go:93-152 halt-on-new-column /
    halt-on-column-removal)."""

    def _mk(self, spark, tmp_path, name="t"):
        from neosync_spark.lakehouse import SnapshotTable
        from neosync_spark.schema import KEY_COLS, transcript_schema

        t = SnapshotTable.create(
            spark, str(tmp_path / name), transcript_schema(),
            key_cols=KEY_COLS, n_buckets=4,
        )
        batch = spark.createDataFrame(
            [("c1", 0, "user", "hello", None, datetime(2025, 1, 1), 1, "insert")],
            "conv_id string, turn_idx int, role string, text string, tool string,"
            " ts timestamp, lsn long, op string",
        )
        t.merge_cdc(batch, applied_range=(0, 2))
        return t

    def test_drop_column_metadata_only(self, spark, tmp_path):
        from pyspark.sql import types as T

        t = self._mk(spark, tmp_path)
        cur = t.current_schema()
        new = T.StructType([f for f in cur.fields if f.name != "tool"])
        t.alter_schema(new)
        assert "tool" not in t.read().columns
        assert t.read().count() == 1  # old files still readable
        # re-adding a retired name is refused (no field-ids)
        with pytest.raises(ValueError, match="retired"):
            t.alter_schema(cur)

    def test_rename_onto_retired_name_rejected(self, spark, tmp_path):
        # drop x, then rename y -> x: the rename target reuses a retired
        # physical name and would resurrect pre-drop file data
        from pyspark.sql import types as T

        t = self._mk(spark, tmp_path)
        cur = t.current_schema()
        dropped = T.StructType([f for f in cur.fields if f.name != "tool"])
        t.alter_schema(dropped)
        renamed = T.StructType(
            [
                f if f.name != "text" else T.StructField("tool", f.dataType, True)
                for f in dropped.fields
            ]
        )
        with pytest.raises(ValueError, match="retired"):
            t.alter_schema(renamed, renames={"tool": "text"})

    def test_drop_key_column_rejected(self, spark, tmp_path):
        from pyspark.sql import types as T

        t = self._mk(spark, tmp_path)
        cur = t.current_schema()
        new = T.StructType([f for f in cur.fields if f.name != "conv_id"])
        with pytest.raises(ValueError, match="key/order"):
            t.alter_schema(new)

    def test_rename_column_reads_old_files(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        t = self._mk(spark, tmp_path)
        cur = t.current_schema()
        new = T.StructType(
            [
                f if f.name != "text" else T.StructField("content", f.dataType, True)
                for f in cur.fields
            ]
        )
        t.alter_schema(new, renames={"content": "text"})
        out = t.read()
        assert "content" in out.columns and "text" not in out.columns
        assert out.select("content").collect()[0][0] == "hello"
        # data written AFTER the rename also reads back
        batch2 = spark.createDataFrame(
            [("c2", 0, "user", "bye", None, datetime(2025, 1, 2), 3, "insert")],
            "conv_id string, turn_idx int, role string, content string,"
            " tool string, ts timestamp, lsn long, op string",
        )
        t.merge_cdc(batch2, applied_range=(2, 4))
        vals = {r["conv_id"]: r["content"] for r in t.read().collect()}
        assert vals == {"c1": "hello", "c2": "bye"}

    def test_drift_policies(self, spark, tmp_path):
        from pyspark.sql import types as T

        from neosync_spark.schema_registry import (
            POLICY_HALT_NEW,
            POLICY_HALT_REMOVAL,
            ensure_table_schema,
        )

        t = self._mk(spark, tmp_path)
        cur = t.current_schema()
        with_add = T.StructType(
            list(cur.fields) + [T.StructField("extra", T.StringType(), True)]
        )
        with pytest.raises(RuntimeError, match="new columns"):
            ensure_table_schema(t, with_add, POLICY_HALT_NEW)
        without_tool = T.StructType([f for f in cur.fields if f.name != "tool"])
        with pytest.raises(RuntimeError, match="column removal"):
            ensure_table_schema(t, without_tool, POLICY_HALT_REMOVAL)
        # halt-on-removal still applies adds
        ops = ensure_table_schema(t, with_add, POLICY_HALT_REMOVAL)
        assert [o["op"] for o in ops] == ["add_column"]
        # halt-on-new-column still applies drops
        cur2 = t.current_schema()
        no_extra_no_tool = T.StructType(
            [f for f in cur2.fields if f.name not in ("extra", "tool")]
        )
        ops2 = ensure_table_schema(t, no_extra_no_tool, POLICY_HALT_NEW)
        assert sorted(o["op"] for o in ops2) == ["drop_column", "drop_column"]

    def test_diff_emits_rename_first(self):
        from pyspark.sql import types as T

        from neosync_spark.schema_registry import diff_schemas

        cur = T.StructType(
            [T.StructField("a", T.StringType()), T.StructField("b", T.IntegerType())]
        )
        new = T.StructType(
            [T.StructField("a2", T.StringType()), T.StructField("b", T.LongType()),
             T.StructField("c", T.StringType(), True)]
        )
        ops = diff_schemas(cur, new, renames={"a2": "a"})
        assert [o["op"] for o in ops] == [
            "rename_column", "alter_column_type", "add_column",
        ]
