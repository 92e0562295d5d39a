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


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    events=st.lists(_event, min_size=2, max_size=40),
    split_frac=st.floats(0.1, 0.9),
)
def test_snapshot_diff_chain_property(spark, table_root, events, split_frac):
    """Random logs, random split: state(s1) + diff(s1,s2) applied as a
    change feed reproduces state(s2), and the incremental rollup equals
    a full recompute — the two derived-data invariants, adversarially."""
    from pyspark.sql import functions as F

    from neosync_spark.operators.rollup import (
        ROLLUP_SCHEMA,
        conversation_rollup,
        incremental_rollup_sync,
    )

    log = _mk_log(events)
    hi = int(log["lsn"].max())
    mid = max(1, int(hi * split_frac))
    counter["i"] += 1
    t = SnapshotTable.create(
        spark,
        str(table_root / f"d{counter['i']}"),
        transcript_schema(),
        key_cols=KEY_COLS,
        n_buckets=2,
    )
    dst = SnapshotTable.create(
        spark,
        str(table_root / f"r{counter['i']}"),
        ROLLUP_SCHEMA,
        key_cols=["conv_id"],
        order_cols=["ts"],
        n_buckets=2,
    )
    sdf = spark.createDataFrame(log)

    def slicer(lo, hi_):
        return sdf.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi_))

    eng = ReplayEngine(
        spark, t, config=EngineConfig(batch_lsn_size=max(1, mid), lineage=False)
    )
    eng.replay(slicer, lsn_lo=0, lsn_hi=mid - 1)
    s1 = t.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(t, dst, None, s1)
    eng.replay(slicer, lsn_lo=mid, lsn_hi=hi)
    s2 = t.manifest(refresh=True)["snapshot_id"]
    incremental_rollup_sync(t, dst, s1, s2)

    # diff-as-change-feed invariant
    seed = t.read(snapshot_id=s1).withColumns(
        {"op": F.lit("insert"), "lsn": F.lit(0).cast("long")}
    )
    replay_t = SnapshotTable.create(
        spark,
        str(table_root / f"c{counter['i']}"),
        transcript_schema(),
        key_cols=KEY_COLS,
        n_buckets=2,
    )
    replay_t.merge_cdc(seed, applied_range=(0, 1))
    feed = t.snapshot_diff(s1, s2).withColumns(
        {
            "op": F.when(
                F.col("change_type") == "delete", F.lit("delete")
            ).otherwise(F.lit("update")),
            "lsn": F.lit(1).cast("long"),
        }
    ).drop("change_type")
    replay_t.merge_cdc(feed, applied_range=(1, 2))
    assert_pdf_equal(
        replay_t.read().toPandas(),
        t.read(snapshot_id=s2).toPandas(),
        ["conv_id", "turn_idx"],
        msg="diff-as-change-feed",
    )

    # incremental rollup == full recompute
    got = {
        r["conv_id"]: (r["n_turns"], r["total_chars"])
        for r in dst.read().collect()
    }
    exp = {
        r["conv_id"]: (r["n_turns"], r["total_chars"])
        for r in conversation_rollup(t.read()).collect()
    }
    assert got == exp, "incremental rollup diverged from full recompute"


_event2 = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(0, 5),
    st.integers(0, 3),
    st.integers(0, 3600),
    st.text("ab", min_size=0, max_size=4),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    events=st.lists(_event2, min_size=1, max_size=30),
    lo_s=st.integers(0, 3600),
    width=st.integers(0, 1800),
    lsn_lo=st.integers(0, 40),
)
def test_stats_pruned_read_always_equals_filtered_read(
    spark, table_root, events, lo_s, width, lsn_lo
):
    """Zone-map soundness as a property: for ANY mix of COW/MoR commits
    and ANY (ts range, lsn lower bound) filter, the pruned read equals
    the unpruned read + row predicate — files may be skipped, rows
    never."""
    from pyspark.sql import functions as F

    log = _mk_log(events)
    counter["i"] += 1
    t = SnapshotTable.create(
        spark,
        str(table_root / f"z{counter['i']}"),
        transcript_schema(),
        key_cols=KEY_COLS,
        n_buckets=2,
    )
    sdf = spark.createDataFrame(log)
    hi = int(log["lsn"].max())
    # alternate commit modes so the table holds base AND delta files
    for i, lo in enumerate(range(0, hi + 1, 7)):
        t.merge_cdc(
            sdf.filter((F.col("lsn") >= lo) & (F.col("lsn") < lo + 7)),
            applied_range=(lo, lo + 7),
            mode="mor" if i % 2 else "cow",
            lineage=False,
        )
    ts_lo = pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=lo_s)
    ts_hi = ts_lo + pd.Timedelta(seconds=width)
    flt = {"ts": (ts_lo.to_pydatetime(), ts_hi.to_pydatetime()),
           "_lsn": (lsn_lo, None)}
    got = t.read(stats_filter=flt, internal=True).toPandas()
    want = (
        t.read(internal=True)
        .filter((F.col("ts") >= F.lit(ts_lo)) & (F.col("ts") <= F.lit(ts_hi)))
        .filter(F.col("_lsn") >= lsn_lo)
        .toPandas()
    )
    assert len(got) == len(want)
    if len(got):
        assert_pdf_equal(
            got, want, ["conv_id", "turn_idx"], msg="pruned != filtered"
        )


# ---------- patch fold vs a sequential interpreter ----------

_patch_event = st.tuples(
    st.sampled_from(["insert", "update", "delete", "patch", "patch"]),
    st.integers(0, 2),  # conv
    st.integers(0, 1),  # turn
    st.integers(0, 4),  # ts second (ties likely)
    st.sampled_from([None, "", "aa", "Zb1", "x y"]),  # text
    st.sampled_from([None, "t1", "t2"]),  # tool
)


def _interpret_patch(rows):
    """Sequential oracle over (ts, lsn)-ordered events — the full-replay
    definition patch_fold implements."""
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["_del"]:
            state[k] = None
        elif r["_patch"]:
            cur = state.get(k)
            if cur is not None:
                state[k] = tuple(
                    n if n is not None else c
                    for n, c in zip((r["role"], r["text"], r["tool"]), cur)
                )
        else:
            state[k] = (r["role"], r["text"], r["tool"])
    return {k: v for k, v in state.items() if v is not None}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=st.lists(_patch_event, min_size=1, max_size=30))
def test_patch_fold_matches_interpreter(spark, events):
    from neosync_spark.operators.dedup import patch_fold

    rows = []
    for lsn, (op, conv, turn, ts_s, txt, tool) in enumerate(events):
        full = op in ("insert", "update")
        rows.append(
            {
                "conv_id": f"c{conv}",
                "turn_idx": turn,
                "lsn": lsn,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=ts_s),
                "role": "user" if full else None,
                "text": txt if (full or op == "patch") else None,
                "tool": tool if (full or op == "patch") else None,
                "_patch": op == "patch",
                "_del": op == "delete",
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    df = spark.createDataFrame(pdf)
    out = patch_fold(
        df, ["conv_id", "turn_idx"], ["ts", "lsn"], ["role", "text", "tool"]
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in out.collect()
        if not r["_del"]
    }
    assert got == _interpret_patch(rows)


# adversarial strings: quotes, backslashes, newlines, unicode, JSON-ish
_WIRE_TEXT = st.text(
    alphabet='ab"\\\n\t{}[]:,é中\U0001f600 ',
    min_size=0, max_size=20,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), _WIRE_TEXT, st.one_of(st.none(), _WIRE_TEXT)),
        min_size=1, max_size=12, unique_by=lambda r: r[0],
    )
)
def test_debezium_wire_roundtrip_property(spark, table_root, rows):
    """encode → JSON text → decode is lossless for arbitrary payload
    strings (quotes, backslashes, newlines, unicode) — the consumer's
    decoded state equals the producer state byte-for-byte."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.plans.replicate import replica_schema
    from neosync_spark.schema import KEY_COLS, transcript_schema
    from neosync_spark.sources.debezium import (
        decode_debezium,
        snapshot_export_debezium,
    )

    counter["i"] += 1
    root = str(table_root / f"dbzp{counter['i']}")
    t = SnapshotTable.create(
        spark, root + "/t", transcript_schema(), key_cols=KEY_COLS,
        n_buckets=2,
    )
    ev = spark.createDataFrame(
        [
            (f"c{conv}", 0, "user", txt, tool, 1.0, i, "insert")
            for i, (conv, txt, tool) in enumerate(rows)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts double, lsn long, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.merge_cdc(ev, applied_range=(0, len(rows)))
    sid = t.manifest(refresh=True)["snapshot_id"]
    # envelopes survive a real text-file roundtrip (newlines must have
    # been escaped by to_json or lines would split)
    feed = root + "/feed"
    snapshot_export_debezium(t, sid).select("value").write.mode(
        "overwrite"
    ).text(feed)
    payload = T.StructType(
        [f for f in replica_schema(transcript_schema()).fields
         if f.name != "ts"]
    )
    events, rescue = decode_debezium(spark.read.text(feed), payload)
    assert rescue.count() == 0
    rep = SnapshotTable.create(
        spark, root + "/rep", replica_schema(transcript_schema()),
        key_cols=KEY_COLS, n_buckets=2,
    )
    rep.merge_cdc(events, applied_range=(0, sid), source_is_raw=True)
    got = sorted(
        tuple(r) for r in rep.read()
        .select("conv_id", "text", "tool").collect()
    )
    want = sorted(
        tuple(r) for r in t.read()
        .select("conv_id", "text", "tool").collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# active-active multimaster merge == a sequential per-key interpreter
# ---------------------------------------------------------------------------

_mm_event = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(0, 2),  # conv
    st.integers(0, 1),  # turn
    st.integers(0, 2),  # ts second (tiny domain -> constant ts ties)
    st.sampled_from(["us", "eu", "ap"]),
    st.text(alphabet="abXY", min_size=0, max_size=4),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    events=st.lists(_mm_event, min_size=1, max_size=30),
    delete_wins=st.booleans(),
)
def test_multimaster_merge_matches_interpreter(spark, events, delete_wins):
    from neosync_spark.operators.multimaster import multimaster_merge

    pri = {"us": 2, "eu": 1, "ap": 0}
    rows = []
    per_site: dict[str, int] = {}
    for op, conv, turn, ts_s, site, txt in events:
        lsn = per_site.get(site, 0)
        per_site[site] = lsn + 1  # per-site monotone, NOT global
        rows.append(
            {
                "conv_id": f"c{conv}",
                "turn_idx": turn,
                "op": op,
                "text": None if op == "delete" else txt,
                "ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(seconds=ts_s),
                "lsn": lsn,
                "site": site,
            }
        )
    # sequential interpreter: max over the explicit total order
    best: dict[tuple, tuple] = {}
    for r in rows:
        rank = (
            r["ts"],
            (1 if r["op"] == "delete" else 0) if delete_wins else 0,
            pri[r["site"]],
            r["lsn"],
        )
        k = (r["conv_id"], r["turn_idx"])
        if k not in best or rank > best[k][0]:
            best[k] = (rank, r)
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    log = spark.createDataFrame(pdf)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["op"], r["text"], r["site"])
        for r in multimaster_merge(
            log,
            ["conv_id", "turn_idx"],
            ["us", "eu", "ap"],
            delete_wins=delete_wins,
        ).collect()
    }
    want = {
        k: (r["op"], r["text"], r["site"]) for k, (rank, r) in best.items()
    }
    assert got == want
