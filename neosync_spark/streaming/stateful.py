"""Custom stateful streaming operator: incremental LWW upsert stream.

``streaming_lww_updates`` turns the raw change-event stream into an
UPSERT stream — one row per (conv_id, turn_idx) per micro-batch, and
only when that key's last-writer-wins winner actually changed. The
per-key winner (max (ts, lsn), tombstone for deletes) lives in Spark's
managed state store (``applyInPandasWithState``), so late or duplicate
events are absorbed exactly like the batch engine's cross-batch LWW
(lakehouse merge semantics), but continuously.

This is the streaming analog of the reference's batch-with-resume loop
(SURVEY.md §2.11) re-expressed on Structured Streaming's stateful API —
the downstream consumer (a foreachBatch MERGE, a Kafka topic, a CDC
relay) sees a minimal, key-unique changefeed instead of the raw log.

State/emit timestamps travel as epoch microseconds (long): the state
store round-trips fixed-width types losslessly and the comparison
(ts, lsn) stays total and engine-portable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

UPDATES_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts_us long, lsn long, deleted boolean"
)
_STATE_SCHEMA = (
    "ts_us long, lsn long, role string, text string, tool string, "
    "deleted boolean"
)


def _winner_of_batch(pdfs: Iterator[pd.DataFrame]) -> dict[str, Any] | None:
    best: dict[str, Any] | None = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
        idx = (
            pd.DataFrame({"ts": ts_us, "lsn": pdf["lsn"]})
            .sort_values(["ts", "lsn"], kind="mergesort")
            .index[-1]
        )
        row = pdf.loc[idx]
        cand = {
            "ts_us": int(ts_us.loc[idx]),
            "lsn": int(row["lsn"]),
            "role": row.get("role"),
            "text": row.get("text"),
            "tool": row.get("tool") if "tool" in pdf.columns else None,
            "deleted": row["op"] == "delete",
        }
        if best is None or (cand["ts_us"], cand["lsn"]) > (best["ts_us"], best["lsn"]):
            best = cand
    return best


def streaming_lww_updates(events: DataFrame) -> DataFrame:
    """Group the change stream by key and emit only winner changes.

    ``events`` must carry conv_id, turn_idx, op, role, text, [tool],
    ts, lsn (the change-event envelope). Returns a stream with schema
    ``UPDATES_SCHEMA``; rows with ``deleted=true`` are tombstone
    notifications.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cand = _winner_of_batch(pdfs)
        if cand is None:
            return
        if state.exists:
            ts_us, lsn = state.get[0], state.get[1]
            if (cand["ts_us"], cand["lsn"]) <= (ts_us, lsn):
                return  # stale/duplicate delivery: winner unchanged
        state.update(
            (
                cand["ts_us"], cand["lsn"], cand["role"], cand["text"],
                cand["tool"], cand["deleted"],
            )
        )
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "turn_idx": key[1],
                    "role": cand["role"],
                    "text": cand["text"],
                    "tool": cand["tool"],
                    "ts_us": cand["ts_us"],
                    "lsn": cand["lsn"],
                    "deleted": cand["deleted"],
                }
            ]
        )

    return (
        events.groupBy("conv_id", "turn_idx")
        .applyInPandasWithState(
            fn,
            outputStructType=UPDATES_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _fold_patch_events(
    pdfs: Iterator[pd.DataFrame], state_row: "tuple | None"
) -> "tuple | None":
    """Sequentially fold a micro-batch's events for ONE key over the
    prior state, in (ts, lsn) order. State tuple matches
    ``_PATCH_STATE_SCHEMA``. Returns the new state (None = unchanged).

    Same contract as the batch COW patch fold (merge_cdc patch_ops):
    full images reset every column, patches set only their non-NULL
    columns, deletes tombstone, patches never resurrect and orphan
    patches (no full image yet) do not create state. Events at or
    below the state's (ts, lsn) are late/duplicate deliveries and are
    ignored — per-key in-order delivery is what a binlog LSN gives."""
    cur = state_row
    changed = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        ts_us_all = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
        order = (
            pd.DataFrame({"ts": ts_us_all, "lsn": pdf["lsn"]})
            .sort_values(["ts", "lsn"], kind="mergesort")
            .index
        )
        for idx in order:
            row = pdf.loc[idx]
            ts_us, lsn = int(ts_us_all.loc[idx]), int(row["lsn"])
            if cur is not None and (ts_us, lsn) <= (cur[0], cur[1]):
                continue
            op = row["op"]
            tool = row.get("tool") if "tool" in pdf.columns else None
            if op == "delete":
                # a delete for an unseen key still records a tombstone
                # (same as the batch merge): a late-arriving older
                # insert must not resurrect it
                cur = (ts_us, lsn, None, None, None, True)
            elif op == "patch":
                if cur is None or cur[5]:
                    continue  # orphan or post-delete patch
                cur = (
                    ts_us,
                    lsn,
                    row.get("role") if pd.notna(row.get("role")) else cur[2],
                    row.get("text") if pd.notna(row.get("text")) else cur[3],
                    tool if tool is not None and pd.notna(tool) else cur[4],
                    False,
                )
            else:  # full image
                cur = (
                    ts_us, lsn,
                    row.get("role"), row.get("text"), tool, False,
                )
            changed = True
    return cur if changed else None


def streaming_patch_updates(events: DataFrame) -> DataFrame:
    """Patch-aware upsert stream: like ``streaming_lww_updates`` but
    the change stream may carry PARTIAL row images (op='patch' — NULL
    payload column = unchanged). The managed state holds each key's
    folded full row, so downstream consumers always see complete
    post-images even though the wire carries minimal ones — the
    streaming twin of merge_cdc(patch_ops=True)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prior = tuple(state.get) if state.exists else None
        new = _fold_patch_events(pdfs, prior)
        if new is None or new == prior:
            return
        state.update(new)
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "turn_idx": key[1],
                    "role": new[2],
                    "text": new[3],
                    "tool": new[4],
                    "ts_us": new[0],
                    "lsn": new[1],
                    "deleted": new[5],
                }
            ]
        )

    return (
        events.groupBy("conv_id", "turn_idx")
        .applyInPandasWithState(
            fn,
            outputStructType=UPDATES_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
