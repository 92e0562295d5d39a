"""Transactional-outbox routing — one outbox CDC feed, many typed
destination tables.

The outbox pattern (Debezium's "outbox event router"): a service
writes domain events into ONE `outbox` table inside its business
transaction; CDC tails that single table and ROUTES each event to a
per-aggregate destination, so consumers get reliably-ordered,
exactly-once domain events without dual writes. The wire row shape is
the public Debezium SMT contract::

    (id, aggregate_type, aggregate_id, type, payload, ts, lsn)

- ``aggregate_type`` picks the destination (one route per type);
- ``aggregate_id`` is the partition/ordering key;
- ``payload`` is a JSON document, typed per destination;
- ``type`` is the domain event name — a route maps it to the CDC op
  (default: everything upserts; names ending ``.deleted`` delete).

The reference has no outbox input (its closest analog is the
fan-out of one source to many destinations in sync configs); the
routing semantics follow the public Debezium outbox-event-router docs.

Scale shape: the outbox batch is persisted ONCE and each route reads
only its type's slice (a filter over the cached batch — no per-route
rescan of the feed, no shuffle until each destination's own merge,
which is the same single key-shuffle every merge costs). Payload
decoding is one JVM ``from_json`` per route over its slice. A type
with no declared route lands in a rescue frame instead of being
silently dropped (the outbox is an at-least-once contract — an
unroutable event is an operator error to surface, not noise).

Exactly-once: every destination table keeps its OWN ledger; the same
``applied_range`` (the outbox feed's lsn window) is recorded per
destination, so a replayed window no-ops per table independently —
a crash between two routes' merges heals on retry (the completed
route skips, the missing one applies).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import SnapshotTable

#: outbox wire columns (the Debezium outbox SMT contract)
OUTBOX_COLS = ("id", "aggregate_type", "aggregate_id", "type",
               "payload", "ts", "lsn")


def outbox_schema() -> T.StructType:
    return T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("aggregate_type", T.StringType()),
        T.StructField("aggregate_id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
    ])


@dataclass
class OutboxRoute:
    """One aggregate type's destination contract."""

    payload_schema: T.StructType
    key_cols: list[str]
    # domain event names (the outbox `type` column) that mean DELETE;
    # everything else upserts. A delete's payload needs only the keys.
    delete_types: tuple[str, ...] = ()
    # override: event name -> op ('insert'|'update'|'delete')
    op_map: dict[str, str] = field(default_factory=dict)

    def op_expr(self):
        op = None
        for name, o in self.op_map.items():
            cond = F.col("type") == name
            op = (F.when(cond, F.lit(o)) if op is None
                  else op.when(cond, F.lit(o)))
        del_cond = (
            F.col("type").isin(*self.delete_types)
            if self.delete_types
            else F.col("type").endswith(".deleted")
        )
        tail = F.when(del_cond, F.lit("delete")).otherwise(F.lit("insert"))
        return op.otherwise(tail) if op is not None else tail


def route_outbox(
    batch: DataFrame, routes: dict[str, OutboxRoute]
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Split one outbox batch into per-route CDC event frames.

    Returns ``(events_by_type, unrouted)``: each events frame has the
    route's payload columns + op/ts/lsn (the engine's raw batch
    shape, ready for ``merge_cdc(source_is_raw=True)``); ``unrouted``
    carries rows whose aggregate_type has no declared route.

    The caller should persist ``batch`` when applying several routes —
    each route is one filter + one ``from_json`` over its slice.
    """
    out: dict[str, DataFrame] = {}
    for atype, route in routes.items():
        sliced = batch.filter(F.col("aggregate_type") == atype)
        img = F.from_json(F.col("payload"), route.payload_schema)
        out[atype] = sliced.select(
            *[img.getField(f.name).alias(f.name)
              for f in route.payload_schema.fields],
            route.op_expr().alias("op"),
            F.col("ts"),
            F.col("lsn"),
        )
    unrouted = batch.filter(
        ~F.col("aggregate_type").isin(*routes.keys())
        if routes else F.lit(True)
    )
    return out, unrouted


def outbox_sync(
    spark: SparkSession,
    batch: DataFrame,
    tables: dict[str, SnapshotTable],
    routes: dict[str, OutboxRoute],
    applied_range: tuple[int, int] | None = None,
    strict: bool = True,
    **merge_kwargs,
) -> dict:
    """Apply one outbox window to every routed destination,
    exactly-once per table.

    ``applied_range`` defaults to the batch's (min lsn, max lsn + 1).
    Each destination's merge records that range in ITS ledger —
    re-running the window no-ops per table independently, healing a
    crash that landed between two routes' merges. ``strict=True``
    raises on unrouted aggregate types (set False to count + skip).

    Returns per-type rows applied + the unrouted count.
    """
    if set(tables) != set(routes):
        raise ValueError(
            f"tables/routes keys differ: {sorted(tables)} vs {sorted(routes)}"
        )
    batch = batch.persist()
    try:
        if applied_range is None:
            row = batch.agg(
                F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
            ).collect()[0]
            if row["lo"] is None:
                return {"applied": {}, "unrouted": 0}
            applied_range = (int(row["lo"]), int(row["hi"]) + 1)
        events, unrouted = route_outbox(batch, routes)
        n_unrouted = unrouted.count()
        if n_unrouted and strict:
            sample = [
                r["aggregate_type"]
                for r in unrouted.select("aggregate_type")
                .distinct().limit(5).collect()
            ]
            raise ValueError(
                f"{n_unrouted} outbox rows with unrouted aggregate_type "
                f"(e.g. {sample}); declare routes or pass strict=False"
            )
        applied: dict[str, int] = {}
        for atype, ev in events.items():
            info = tables[atype].merge_cdc(
                ev,
                applied_range=applied_range,
                source_is_raw=True,
                **merge_kwargs,
            )
            applied[atype] = int(info.rows_written or 0)
        return {"applied": applied, "unrouted": int(n_unrouted)}
    finally:
        batch.unpersist()
