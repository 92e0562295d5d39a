"""Structured Streaming front-end: the stream tail must reach the same
final state as the batch replay (same merge path via foreachBatch)."""

from __future__ import annotations

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.streaming.stream import StreamingReplay
from neosync_spark.synth import SynthConfig, expected_final_state, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=4_000, n_convs=200)


def test_streaming_matches_oracle(spark, tmp_path):
    # write the log as several files => several micro-batches
    log = generate_pandas(CFG)
    sdf = spark.createDataFrame(log).repartition(6)
    log_dir = str(tmp_path / "log")
    sdf.write.parquet(log_dir)

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    eng = ReplayEngine(spark, table, config=EngineConfig())
    q = StreamingReplay(eng).start(
        log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(120)

    got = table.read().toPandas()
    exp = expected_final_state(log)
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])
    # multiple micro-batch commits happened
    assert len(table.applied_ranges()) >= 1
