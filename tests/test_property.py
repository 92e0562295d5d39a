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


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(alphabet="ab cd\n.!", min_size=0, max_size=60),
        min_size=1,
        max_size=25,
    ),
    budget=st.integers(2, 16),
)
def test_pack_chunks_partition_property(spark, docs, budget):
    """Random corpora: chunk slices partition each doc's tokens, chunk
    totals equal the budget except the tail, output is independent of
    the shard count."""
    from pyspark.sql import functions as F

    from neosync_spark.operators.text import pack_token_chunks, token_count

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    ntok = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", token_count("text").alias("n")).collect()
    }
    out = pack_token_chunks(df, "text", "doc_id", budget=budget).toPandas()
    assert set(out["doc_id"]) == {i for i, n in ntok.items() if n > 0}
    for i, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        assert grp["doc_tok_start"].iloc[0] == 0
        assert grp["doc_tok_end"].iloc[-1] == ntok[i]
        assert (grp["doc_tok_start"].iloc[1:].to_numpy()
                == grp["doc_tok_end"].iloc[:-1].to_numpy()).all()
    if len(out):
        per_chunk = (
            out.assign(n=out["doc_tok_end"] - out["doc_tok_start"])
            .groupby("chunk_id")["n"].sum().sort_index()
        )
        assert (per_chunk.iloc[:-1] == budget).all()
        assert per_chunk.sum() == sum(ntok.values())
    out2 = pack_token_chunks(
        df, "text", "doc_id", budget=budget, partitions=2
    ).toPandas()
    a = out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert a.equals(b)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    months=st.integers(-10_000, 10_000),
    days=st.integers(-100_000, 100_000),
    micros=st.integers(-(2**63), 2**63 - 1),
)
def test_interval_round_trip_property(spark, months, days, micros):
    """Any (months, days, micros) triple survives render -> parse."""
    from neosync_spark.functions.intervals import (
        interval_struct,
        interval_to_text,
        parse_pg_interval,
    )

    df = spark.createDataFrame([(months, days, micros)], "m int, d int, u long")
    got = (
        df.select(interval_struct("m", "d", "u").alias("iv"))
        .select("iv", parse_pg_interval(interval_to_text("iv")).alias("iv2"))
        .collect()[0]
    )
    assert got["iv"] == got["iv2"], (months, days, micros, got)
