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


def test_streaming_sessionize(spark, tmp_path):
    """Watermarked session_window aggregation over a parquet stream."""
    import pandas as pd
    from pyspark.sql import functions as F

    from neosync_spark.operators.sessions import sessionize_stream

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00",
                 "2024-01-01 02:00:00", "2024-01-01 00:05:00"]
            ),
        }
    )
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    agg = sessionize_stream(stream, "user_id", "ts", gap="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions").toPandas()
    # append mode emits only watermark-closed sessions: user 1's merged
    # 00:00-00:10 session and user 2's — the 02:00 event's session stays
    # open in the state store awaiting the watermark (correct streaming
    # semantics for late-data handling)
    assert len(got) == 2
    assert got[got.user_id == 1]["n_events"].tolist() == [2]
    assert got[got.user_id == 2]["n_events"].tolist() == [1]
