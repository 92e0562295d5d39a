"""Property-based correctness: random adversarial change logs (ts
ties, deletes of nonexistent keys, updates before inserts, duplicate
delivery, single-key floods) must always replay to the pandas oracle's
final state."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.synth import expected_final_state

from .conftest import assert_pdf_equal

_event = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(0, 3),  # conv
    st.integers(0, 2),  # turn
    st.integers(0, 5),  # ts second (small domain → many ties)
    st.text(alphabet="abcXYZ @.-123", min_size=0, max_size=12),
)


def _mk_log(events) -> pd.DataFrame:
    rows = []
    for lsn, (op, conv, turn, ts_s, txt) in enumerate(events):
        is_del = op == "delete"
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": f"conv-{conv}",
                "turn_idx": turn,
                "role": None if is_del else "user",
                "text": None if is_del else txt,
                "tool": None,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=ts_s),
            }
        )
    # duplicate delivery: re-emit the first few events verbatim
    rows += rows[: max(1, len(rows) // 5)]
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


@pytest.fixture(scope="module")
def table_root(tmp_path_factory):
    return tmp_path_factory.mktemp("prop")


counter = {"i": 0}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=st.lists(_event, min_size=1, max_size=40))
def test_replay_always_matches_oracle(spark, table_root, events):
    log = _mk_log(events)
    counter["i"] += 1
    for mode in ("cow", "mor"):
        t = SnapshotTable.create(
            spark,
            str(table_root / f"t{counter['i']}_{mode}"),
            transcript_schema(),
            key_cols=KEY_COLS,
            n_buckets=2,
        )
        eng = ReplayEngine(
            spark, t, config=EngineConfig(batch_lsn_size=7, merge_mode=mode, lineage=False)
        )
        sdf = spark.createDataFrame(log)
        from pyspark.sql import functions as F

        eng.replay(
            lambda lo, hi: sdf.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
            lsn_lo=0,
            lsn_hi=int(log["lsn"].max()),
        )
        got = t.read().toPandas()
        exp = expected_final_state(log)
        assert_pdf_equal(got, exp, ["conv_id", "turn_idx"], msg=f"mode={mode}")
