"""Debezium envelope decoder — the public binlog/WAL wire format.

The reference tails databases through per-dialect SQL cursor reads
(worker/pkg/benthos/sql/input_sql_raw.go); the ecosystem-standard way
to tail a binlog at scale is Debezium-over-Kafka, whose change events
arrive as a JSON envelope::

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "op": "c"|"u"|"d"|"r",
                 "ts_ms": 1700000000000,
                 "source": {"lsn": 123, "ts_ms": ...}}}

(or the same object WITHOUT the "payload" wrapper when
``value.converter.schemas.enable=false`` — both shapes are accepted).

``decode_debezium`` turns a DataFrame of envelope strings into the
engine's raw CDC batch (op / payload columns / ts / lsn) entirely with
JVM expressions — one ``from_json`` against a typed schema, zero
Python — so the decode rides inside whole-stage codegen and the scan
stays columnar. Mapping:

- op: c (create) and r (snapshot read) → insert, u → update,
  d → delete;
- payload: ``after`` for c/u/r, ``before`` for d (Debezium deletes
  carry the row image in ``before``; ``after`` is null);
- lsn: ``source.lsn`` when present, else ``ts_ms`` (a monotone
  fallback for connectors without LSNs — document per connector);
- ts: ``ts_ms`` (epoch millis → timestamp).

Rows whose envelope fails to parse, or parse but carry an unknown op
or a null payload image, are split into a RESCUE DataFrame carrying the
raw string + a reason (the ``_rescued_data`` pattern): feed it to the
engine's quarantine sink instead of crashing a 10^10-event tail on one
malformed message.

No reference counterpart file (the reference has no Debezium input);
envelope semantics follow the public Debezium documentation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OPS = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


def debezium_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The typed envelope for ``from_json``: before/after as the user's
    row schema, op/ts_ms/source metadata."""
    inner = T.StructType(
        [
            T.StructField("before", payload_schema, True),
            T.StructField("after", payload_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    return T.StructType(
        [T.StructField("payload", inner, True)] + list(inner.fields)
    )


#: the literal Debezium writes for a column it could not read from the
#: WAL — Postgres TOASTed text/bytea in an UPDATE when the table's
#: REPLICA IDENTITY is not FULL (unchanged-toast-value placeholder).
TOAST_PLACEHOLDER = "__debezium_unavailable_value"


def decode_debezium(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
    materialize: bool = True,
    strict_types: bool = False,
    toast_placeholder: str | None = None,
    kafka_tombstones: str = "rescue",
) -> tuple[DataFrame, DataFrame]:
    """Decode envelope strings in ``df[value_col]`` → (events, rescue).

    ``kafka_tombstones`` governs messages whose VALUE is wholly NULL —
    the Kafka log-compaction tombstone Debezium emits after every
    delete envelope (``tombstones.on.delete=true``, the default): it
    exists for the broker's compactor, carries no image, and every
    downstream consumer is expected to skip it. ``'rescue'`` (default)
    routes them to the rescue frame under the precise reason
    ``kafka_tombstone`` — observable, and distinguishable from genuine
    garbage (which stays ``unparseable_envelope``); ``'drop'`` removes
    them silently (standard consumer hygiene for high-churn topics
    where counting them is pure noise).

    ``events`` has the engine's raw batch shape: the payload columns,
    plus op / ts / lsn — feed it straight to ``merge_cdc(...,
    source_is_raw=True)`` or the replay engine. ``rescue`` carries
    (raw value, reason) for quarantine.

    ``materialize=True`` (default) evaluates the JSON parse ONCE per
    row by local-checkpointing the parsed batch. Without a physical
    boundary, Catalyst's project-collapse inlines ``from_json`` into
    every downstream field reference, and because those references sit
    inside conditional branches (the shape coalesces / op CASE),
    codegen's subexpression elimination cannot hoist them — measured
    ~12 parses per row, a >10x decode slowdown. The checkpoint stores
    the parsed batch on executors (the same cost class as the engine's
    batch persists) and truncates lineage; pass ``materialize=False``
    for strict lineage-replay fault tolerance at re-parse cost.

    ``strict_types=True`` catches WIRE TYPE DRIFT: PERMISSIVE
    ``from_json`` nulls any field whose JSON token doesn't fit the
    declared type (a producer switching ``id`` from number to string,
    or an int column to float), so the row would merge with a silently
    corrupted NULL. The guard re-reads the image through an ALL-STRING
    payload schema (from_json captures any present token losslessly
    into a declared string — one extra parse per row, only in this
    mode) and rescues rows where a field is present-on-the-wire but
    typed-decode-null, with reason ``type_conflict:<fields>``. String
    fields can't conflict (every token captures); a JSON null or a
    missing key is not a conflict.

    ``toast_placeholder`` (pass ``TOAST_PLACEHOLDER`` for the standard
    literal) handles Postgres UNCHANGED-TOAST values: when a TOASTed
    column didn't change, the WAL doesn't carry it, and Debezium emits
    the placeholder string instead of the real value in the update's
    ``after`` image. Writing the sentinel through would corrupt the
    table, and nulling it would erase real data. Per string column of
    an update:

    - placeholder in ``after`` but ``before`` carries a real value
      (REPLICA IDENTITY FULL on the non-toasted side) → substitute the
      ``before`` value; the event stays a full ``update``;
    - placeholder with no usable ``before`` → the column is UNKNOWN at
      decode time: the event demotes to ``op='patch'`` with that
      column NULL (patch semantics: NULL = keep previous value), and
      the merge folds it against table state — apply with
      ``merge_cdc(..., patch_ops=True)`` / ``EngineConfig(
      patch_ops=True)``.

    Inherent wire limit (a property of the partial-image format, not
    this decoder): in an update DEMOTED to a patch, a genuinely-NULL
    sibling column folds as "keep previous", not "set NULL" — the same
    ambiguity every Debezium consumer has when replica identity isn't
    FULL. Updates with no placeholder are unaffected. An INSERT /
    snapshot-read image carrying the placeholder is malformed (a fresh
    row's columns are all in the WAL) and is rescued with reason
    ``toast_placeholder_in_insert`` rather than written as the literal
    sentinel; a DELETE's ``before`` image may carry placeholders
    harmlessly (only its key matters — payload is tombstoned).

    Everything is one JVM conditional projection per column — no extra
    parse, no Python, no second pass over the batch.
    """
    env = debezium_envelope_schema(payload_schema)
    parsed = df.withColumn("_dbz", F.from_json(F.col(value_col), env))
    checked = [
        f for f in payload_schema.fields
        if not isinstance(f.dataType, T.StringType)
    ]
    if strict_types and checked:
        str_payload = T.StructType(
            [T.StructField(f.name, T.StringType(), True) for f in checked]
        )
        parsed = parsed.withColumn(
            "_dbzs",
            F.from_json(
                F.col(value_col), debezium_envelope_schema(str_payload)
            ),
        )
    if materialize:
        parsed = parsed.localCheckpoint(eager=False)
    # schemas.enable=true wraps in "payload"; unwrapped envelopes put
    # op at the top level — coalesce the two shapes field-wise
    p = F.col("_dbz.payload")
    op_raw = F.coalesce(p.getField("op"), F.col("_dbz.op"))
    before = F.coalesce(p.getField("before"), F.col("_dbz.before"))
    after = F.coalesce(p.getField("after"), F.col("_dbz.after"))
    ts_ms = F.coalesce(p.getField("ts_ms"), F.col("_dbz.ts_ms"))
    src_lsn = F.coalesce(
        p.getField("source").getField("lsn"),
        F.col("_dbz.source").getField("lsn"),
    )
    str_fields = [
        f for f in payload_schema.fields
        if isinstance(f.dataType, T.StringType)
    ]
    toast_insert = None
    if toast_placeholder is not None and str_fields:
        ph = F.lit(toast_placeholder)

        def _unresolved(name: str):
            # placeholder on the wire and no usable pre-image value
            a, b = after.getField(name), before.getField(name)
            return (a == ph) & ~(b.isNotNull() & (b != ph))

        # rebuild the update image: resolvable placeholders take the
        # pre-image value, unresolved ones go NULL (patch = keep)
        resolved = F.struct(
            *[
                (
                    F.when(
                        after.getField(f.name) == ph,
                        F.when(~_unresolved(f.name), before.getField(f.name)),
                    )
                    .otherwise(after.getField(f.name))
                    .alias(f.name)
                    if isinstance(f.dataType, T.StringType)
                    else after.getField(f.name).alias(f.name)
                )
                for f in payload_schema.fields
            ]
        )
        any_unresolved = reduce(
            lambda x, y: x | y,
            [
                F.coalesce(_unresolved(f.name), F.lit(False))
                for f in str_fields
            ],
        )
        toast_insert = reduce(
            lambda x, y: x | y,
            [
                F.coalesce(after.getField(f.name) == ph, F.lit(False))
                for f in str_fields
            ],
        )
        op = (
            F.when(op_raw.isin("c", "r"), F.lit("insert"))
            .when((op_raw == "u") & any_unresolved, F.lit("patch"))
            .when(op_raw == "u", F.lit("update"))
            .when(op_raw == "d", F.lit("delete"))
        )
        image = (
            F.when(op_raw == "d", before)
            # guard on after.isNotNull(): F.struct(...) is never NULL,
            # so an image-less update must stay NULL → null_row_image
            .when(op_raw == "u", F.when(after.isNotNull(), resolved))
            .otherwise(after)
        )
    else:
        op = F.when(op_raw.isin("c", "r"), F.lit("insert")).when(
            op_raw == "u", F.lit("update")
        ).when(op_raw == "d", F.lit("delete"))
        image = F.when(op_raw == "d", before).otherwise(after)

    # PERMISSIVE from_json yields an all-null struct (not NULL) for
    # malformed input — treat "nothing decoded" as unparseable
    all_null = (
        op_raw.isNull() & ts_ms.isNull() & before.isNull() & after.isNull()
    )
    conflict_names = None
    if strict_types and checked:
        ps = F.col("_dbzs.payload")
        image_s = F.when(
            op_raw == "d",
            F.coalesce(ps.getField("before"), F.col("_dbzs.before")),
        ).otherwise(
            F.coalesce(ps.getField("after"), F.col("_dbzs.after"))
        )
        # present on the wire (all-string capture non-null) but nulled
        # by the typed decode ⇒ the token didn't fit the declared type
        conflict_names = F.array_compact(
            F.array(
                *[
                    F.when(
                        image_s.getField(f.name).isNotNull()
                        & image.getField(f.name).isNull(),
                        F.lit(f.name),
                    )
                    for f in checked
                ]
            )
        )
    if kafka_tombstones not in ("rescue", "drop"):
        raise ValueError(
            f"kafka_tombstones must be 'rescue' or 'drop', "
            f"got {kafka_tombstones!r}"
        )
    reason = (
        F.when(F.col(value_col).isNull(), F.lit("kafka_tombstone"))
        .when(F.col("_dbz").isNull() | all_null, F.lit("unparseable_envelope"))
        .when(op.isNull(), F.lit("unknown_op"))
        .when(image.isNull(), F.lit("null_row_image"))
        .when(ts_ms.isNull(), F.lit("missing_ts_ms"))
    )
    if toast_insert is not None:
        reason = reason.when(
            (op == "insert") & toast_insert,
            F.lit("toast_placeholder_in_insert"),
        )
    if conflict_names is not None:
        reason = reason.when(
            F.size(conflict_names) > 0,
            F.concat(
                F.lit("type_conflict:"),
                F.concat_ws(",", conflict_names),
            ),
        )
    tagged = parsed.select(
        F.col(value_col).alias("_raw"),
        reason.alias("_reason"),
        op.alias("op"),
        image.alias("_img"),
        ts_ms.alias("_ts_ms"),
        src_lsn.alias("_lsn"),
    )
    events = tagged.filter(F.col("_reason").isNull()).select(
        *[
            F.col("_img").getField(f.name).alias(f.name)
            for f in payload_schema.fields
        ],
        F.col("op"),
        F.timestamp_millis(F.col("_ts_ms")).alias("ts"),
        F.coalesce(F.col("_lsn"), F.col("_ts_ms")).alias("lsn"),
    )
    rescue = tagged.filter(F.col("_reason").isNotNull()).select(
        F.col("_raw").alias("value"), F.col("_reason").alias("reason")
    )
    if kafka_tombstones == "drop":
        rescue = rescue.filter(F.col("reason") != "kafka_tombstone")
    return events, rescue


def _json_type_to_spark(v) -> T.DataType:
    """Map a sampled JSON value to the Spark type a wire-evolved column
    gets. bool before int (bool is an int subclass in Python); objects
    and arrays stay RAW JSON STRINGS (the engine's opaque-payload
    convention — ``from_json`` re-serializes a nested token into a
    declared StringType field, so nothing is lost and a later consumer
    re-extracts with get_json_object); an all-null field defaults to
    string."""
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    return T.StringType()


def infer_payload_evolution(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
) -> tuple[T.StructType | None, list[T.StructField]]:
    """Detect payload fields present ON THE WIRE but absent from
    ``payload_schema`` — the schema-drift case ``from_json`` hides: a
    producer that adds a column mid-feed keeps parsing cleanly while
    the new column is silently dropped. Returns
    ``(widened_schema, new_fields)`` with the new fields APPENDED
    (nullable), or ``(None, [])`` when the wire carries nothing new.

    Scale shape: ONE narrow aggregation job over the batch —
    ``json_object_keys`` over the before/after images of both envelope
    shapes, exploded and hash-aggregated (map-side combine collapses
    each partition to <= payload-width keys, so the exchange moves a
    handful of strings no matter the epoch size), then at most ONE
    sampled image string per new key reaches the driver to type it
    (json.loads on a single row — bounded by the image size, not the
    data). Malformed envelopes contribute nothing (get_json_object /
    json_object_keys return null) and stay a decode-time quarantine
    concern.

    Typing: the sampled JSON value maps long/double/boolean/string;
    nested objects/arrays become raw-JSON string columns; a key whose
    sampled values are all JSON null types as string. A quoted "42"
    stays a string (the sample is parsed as JSON, not regexed). Keys
    that aren't identifier-like ([A-Za-z_][A-Za-z0-9_]*) are still
    added but default to string (get_json_object path sampling is
    skipped for them).
    """
    import json as _json
    import re as _re

    known = {f.name for f in payload_schema.fields}
    val = F.col(value_col)
    imgs = [
        F.get_json_object(val, p)
        for p in (
            "$.payload.after",
            "$.after",
            "$.payload.before",
            "$.before",
        )
    ]
    keys_arr = F.concat(
        *[F.coalesce(F.json_object_keys(i), F.array()) for i in imgs]
    )
    wire_keys = [
        r[0]
        for r in df.select(F.explode(keys_arr).alias("k"))
        .groupBy("k")
        .count()
        .select("k")
        .collect()
    ]
    new_keys = sorted(k for k in set(wire_keys) if k not in known)
    if not new_keys:
        return None, []
    ident = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    img = F.coalesce(*imgs)
    sampled = [k for k in new_keys if ident.match(k)]
    samples: dict[str, str | None] = {}
    if sampled:
        row = df.agg(
            *[
                F.first(
                    F.when(
                        F.get_json_object(img, f"$.{k}").isNotNull(), img
                    ),
                    ignorenulls=True,
                ).alias(f"_s{i}")
                for i, k in enumerate(sampled)
            ]
        ).collect()[0]
        samples = {k: row[f"_s{i}"] for i, k in enumerate(sampled)}
    new_fields = []
    for k in new_keys:
        s = samples.get(k)
        v = _json.loads(s).get(k) if s is not None else None
        new_fields.append(T.StructField(k, _json_type_to_spark(v), True))
    widened = T.StructType(list(payload_schema.fields) + new_fields)
    return widened, new_fields


class DebeziumLogSource:
    """``ChangeLogSource`` duck-type over a directory of Debezium
    envelope files — text/JSONL (one envelope per line) or parquet with
    a string ``value`` column. Decoded ONCE (the parse is pinned by
    ``decode_debezium``'s checkpoint) and served to the engine as the
    standard raw batch shape; ``rescue`` holds the malformed messages
    for the caller's quarantine sink. lsn-range slicing happens on the
    DECODED frame, so resume/exactly-once semantics are identical to
    the parquet log path."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        payload_schema: T.StructType,
        fmt: str = "text",
        value_col: str = "value",
        evolve_payload: bool = False,
        strict_types: bool = False,
        toast_placeholder: str | None = None,
        kafka_tombstones: str = "rescue",
    ):
        """``evolve_payload=True`` widens ``payload_schema`` with any
        fields the wire carries that the schema lacks (see
        ``infer_payload_evolution`` — one narrow key aggregation over
        the feed) BEFORE decoding, so a mid-feed producer column isn't
        silently dropped. The caller is responsible for evolving the
        destination table (``new_fields`` lists what was added;
        ``plans/job.compile_job`` does this for the CLI)."""
        self.spark = spark
        self.path = path
        if fmt == "text":
            df = spark.read.text(path)
            if value_col != "value":
                df = df.withColumnRenamed("value", value_col)
            # a JSONL dump of a Kafka topic records the log-compaction
            # tombstone after a delete as an empty line (or a literal
            # `null`) — spark.read.text never yields NULL, so normalize
            # those to NULL for the decoder's tombstone classification
            df = df.withColumn(
                value_col,
                F.when(
                    F.trim(F.col(value_col)).isin("", "null"), F.lit(None)
                ).otherwise(F.col(value_col)),
            )
        elif fmt == "parquet":
            df = spark.read.parquet(path)
        else:
            raise ValueError(f"unknown debezium log format {fmt!r}")
        self.new_fields: list[T.StructField] = []
        if evolve_payload:
            widened, new = infer_payload_evolution(
                df, payload_schema, value_col
            )
            if widened is not None:
                payload_schema, self.new_fields = widened, new
        self.payload_schema = payload_schema
        self.events, self.rescue = decode_debezium(
            df,
            payload_schema,
            value_col,
            strict_types=strict_types,
            toast_placeholder=toast_placeholder,
            kafka_tombstones=kafka_tombstones,
        )

    def full(self) -> DataFrame:
        return self.events

    def slice(self, lsn_lo: int, lsn_hi: int) -> DataFrame:
        return self.events.filter(
            (F.col("lsn") >= F.lit(lsn_lo)) & (F.col("lsn") < F.lit(lsn_hi))
        )

    def lsn_bounds(self) -> tuple[int, int] | None:
        row = self.events.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            return None
        return int(row["lo"]), int(row["hi"])


# --------------------------------------------------------------------------
# Encoder — the table as a Debezium PRODUCER (CDC out, wire-format)
# --------------------------------------------------------------------------


def encode_debezium(
    diff: DataFrame,
    key_cols: list[str],
    to_snapshot: int,
    ts_col: str = "ts",
    ts_alias: str = "src_ts",
) -> DataFrame:
    """``snapshot_diff(..., include_preimages=True)`` rows → Debezium
    envelope strings (the unwrapped ``schemas.enable=false`` shape the
    decoder accepts): ``(key, value)`` — key = JSON of the key columns
    (the Kafka partition key, so one row's events stay ordered on one
    partition), value = the envelope.

    Mapping (inverse of ``decode_debezium``): insert → op 'c' with
    ``after``; the update pre/post image PAIR pivots into ONE op 'u'
    envelope carrying both ``before`` and ``after`` (one key shuffle);
    delete → op 'd' with ``before``. The row's own event time is
    renamed ``ts_alias`` INSIDE the image (the replicate convention:
    a delete's pre-image ts can move backward and must not order the
    consumer), while the envelope's ``ts_ms``/``source.lsn`` carry the
    HOP ordinal ``to_snapshot`` — monotone across hops by construction,
    so a consumer replaying hops through ``decode_debezium`` +
    ``merge_cdc`` converges to the producer's state and a replayed hop
    is exactly-once through its ledger.

    Scale shape: the pivot groups only the UPDATE rows by key (map-side
    combined, one shuffle of the diff — never the table); insert and
    delete rows never shuffle. Everything is JVM ``to_json``.
    """
    data_cols = [c for c in diff.columns if c != "change_type"]
    img_cols = [
        F.col(c).alias(ts_alias) if c == ts_col else F.col(c)
        for c in data_cols
    ]
    row = F.struct(*img_cols)
    key_json = F.to_json(F.struct(*[F.col(k) for k in key_cols]))
    ts_ms = F.lit(int(to_snapshot) * 1000).cast("long")
    src = F.struct(
        F.lit(int(to_snapshot)).cast("long").alias("lsn"),
        ts_ms.alias("ts_ms"),
    )

    def _env(op: str, before, after) -> list:
        return [
            key_json.alias("key"),
            F.to_json(
                F.struct(
                    before.alias("before"),
                    after.alias("after"),
                    F.lit(op).alias("op"),
                    ts_ms.alias("ts_ms"),
                    src.alias("source"),
                )
            ).alias("value"),
        ]

    ins = diff.filter(F.col("change_type") == "insert").select(
        *_env("c", F.lit(None), row)
    )
    dels = diff.filter(F.col("change_type") == "delete").select(
        *_env("d", row, F.lit(None))
    )
    upd = diff.filter(
        F.col("change_type").isin("update_preimage", "update_postimage")
    )
    pairs = upd.groupBy(*key_cols).agg(
        F.first(
            F.when(F.col("change_type") == "update_preimage", row),
            ignorenulls=True,
        ).alias("_before"),
        F.first(
            F.when(F.col("change_type") == "update_postimage", row),
            ignorenulls=True,
        ).alias("_after"),
    )
    ups = pairs.select(*_env("u", F.col("_before"), F.col("_after")))
    return ins.unionByName(ups).unionByName(dels)


def snapshot_export_debezium(
    table,
    snapshot_id: int | None = None,
    ts_col: str = "ts",
    ts_alias: str = "src_ts",
) -> DataFrame:
    """Full state at a snapshot as op 'r' (snapshot read) envelopes —
    the bootstrap hop a new consumer starts from before tailing
    ``encode_debezium`` hops. Same key/value shape; ts_ms/source.lsn
    carry the snapshot id."""
    m = table.manifest(snapshot_id, refresh=snapshot_id is None)
    sid = m["snapshot_id"]
    state = table.read(snapshot_id=sid)
    img_cols = [
        F.col(c).alias(ts_alias) if c == ts_col else F.col(c)
        for c in state.columns
    ]
    row = F.struct(*img_cols)
    key_json = F.to_json(F.struct(*[F.col(k) for k in m["key_cols"]]))
    ts_ms = F.lit(int(sid) * 1000).cast("long")
    src = F.struct(
        F.lit(int(sid)).cast("long").alias("lsn"), ts_ms.alias("ts_ms")
    )
    return state.select(
        key_json.alias("key"),
        F.to_json(
            F.struct(
                F.lit(None).alias("before"),
                row.alias("after"),
                F.lit("r").alias("op"),
                ts_ms.alias("ts_ms"),
                src.alias("source"),
            )
        ).alias("value"),
    )
