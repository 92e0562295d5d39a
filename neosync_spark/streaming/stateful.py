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
