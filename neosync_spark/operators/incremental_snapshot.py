"""Watermark-based incremental snapshot — re-snapshot a live table in
key-range chunks WITHOUT pausing the change stream.

The problem (the reference solves it by NOT streaming: each sync run
re-reads whole tables through paged cursors,
/root/reference/worker/pkg/benthos/sql/input_sql_raw.go): a NEW
destination attached to an already-streaming source needs the full
current state PLUS the ongoing changes. Pausing a 100 TB source for a
monolithic snapshot takes days; the ecosystem answer is the DBLog
algorithm (Andreakis & Papapanagiotou, "DBLog: A Watermark Based
Change-Data-Capture Framework", arXiv:2010.12597), productized as
Debezium's *incremental snapshots*: read the table in primary-key-range
CHUNKS, interleaved with the live stream, and let watermarks arbitrate
rows that both paths deliver.

This engine's LWW merge makes the watermark arbitration *declarative*.
Each chunk row is emitted as an upsert stamped with the chunk's LOW
watermark — the source WAL position ``lw`` the read is known to
reflect — and its own last-modified event time:

* an event already REFLECTED in the chunk row has ``lsn <= lw`` and
  ``ts <= row.ts``, so if the stream (re)delivers it, the chunk row
  wins the ``(ts, lsn)`` LWW fold: state stays at the value that
  already includes the event;
* an event NOT yet reflected has ``lsn > lw`` and (per-key in-order
  delivery, the same WAL guarantee the engine's patch fold documents)
  ``ts >= row.ts``, so the stream event wins whether it lands before
  or after the chunk.

Hence chunks and stream slices may interleave in ANY order, every
chunk is idempotent (re-apply after a crash is a no-op or an
equal-value overwrite), and completion needs no stop-the-world phase.
Deletes need no tombstone plumbing: a key deleted before its chunk's
read is simply absent from the chunk, and any later delete arrives via
the stream and out-ranks the chunk row.

Scale shape (10^11 rows): chunk boundaries come from a ONE-PASS key
sample (the RangePartitioner technique — the driver holds O(#chunks)
boundary tuples, never the key set); each chunk read is a
key-range-pruned scan (lexicographic bounds plus a redundant
first-column conjunct so parquet row-group min/max pruning always
engages); each chunk apply is the engine's ordinary single-shuffle
merge touching only the buckets the chunk's keys hash to. Progress is
a tiny JSON state file plus a synthetic high-bit ledger range per
chunk (the streaming tail's file-set-identity pattern), so a retried
chunk no-ops at the TABLE even if the state write was lost.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..lakehouse import SnapshotTable


@dataclass
class ChunkPlan:
    """Key-space partition: ``boundaries`` are n_chunks-1 ascending
    key tuples; chunk i covers [boundaries[i-1], boundaries[i]) with
    open ends for the first/last chunk — every key falls in exactly
    one chunk, including keys inserted after planning."""

    key_cols: list[str]
    boundaries: list[list]

    @property
    def n_chunks(self) -> int:
        return len(self.boundaries) + 1


def plan_chunks(
    source: DataFrame,
    key_cols: Sequence[str],
    chunk_rows: int = 1 << 20,
    oversample: int = 32,
    seed: int = 7,
) -> ChunkPlan:
    """Pick chunk boundaries from a one-pass key sample.

    Exact chunk sizes don't matter for correctness (any partition of
    the key space works), so boundaries are sampled, not sorted
    globally: draw ~``oversample`` keys per target chunk, sort the
    sample on the driver, and take evenly spaced quantiles — the same
    technique Spark's RangePartitioner uses. Driver memory is
    O(n_chunks * oversample) key tuples. Key columns must be non-NULL
    (the engine's key contract).
    """
    key_cols = list(key_cols)
    n = source.count()
    n_chunks = max(1, math.ceil(n / max(1, chunk_rows)))
    if n_chunks == 1:
        return ChunkPlan(key_cols, [])
    frac = min(1.0, (n_chunks * oversample) / max(1, n))
    sample = [
        tuple(r[c] for c in key_cols)
        for r in source.select(*key_cols).sample(False, frac, seed).collect()
    ]
    sample.sort()
    if not sample:
        return ChunkPlan(key_cols, [])
    bounds: list[list] = []
    for i in range(1, n_chunks):
        b = list(sample[min(len(sample) - 1, (i * len(sample)) // n_chunks)])
        # duplicate quantiles (skewed sample) would make empty chunks —
        # collapse them; the plan just gets fewer, larger chunks
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return ChunkPlan(key_cols, bounds)


def _lex_lt(key_cols: Sequence[str], bound: Sequence) -> Column:
    """key tuple < bound tuple, lexicographic (composite-PK order)."""
    pred = None
    for i, c in enumerate(key_cols):
        clause = F.col(c) < F.lit(bound[i])
        for j in range(i):
            clause = (F.col(key_cols[j]) == F.lit(bound[j])) & clause
        pred = clause if pred is None else (pred | clause)
    return pred


def chunk_predicate(plan: ChunkPlan, idx: int) -> Column:
    """Filter for chunk ``idx``: lo <= key < hi, with a redundant
    first-column range conjunct so parquet min/max row-group pruning
    fires even when the data source won't push the lexicographic OR
    tree."""
    if not 0 <= idx < plan.n_chunks:
        raise IndexError(f"chunk {idx} out of range 0..{plan.n_chunks - 1}")
    k = plan.key_cols
    pred = F.lit(True)
    if idx > 0:
        lo = plan.boundaries[idx - 1]
        pred = pred & ~_lex_lt(k, lo) & (F.col(k[0]) >= F.lit(lo[0]))
    if idx < len(plan.boundaries):
        hi = plan.boundaries[idx]
        pred = pred & _lex_lt(k, hi) & (F.col(k[0]) <= F.lit(hi[0]))
    return pred


def snapshot_events(
    chunk: DataFrame, lw: int, order_col: str = "ts"
) -> DataFrame:
    """Turn chunk rows into CDC upserts carrying the low watermark.

    The row keeps its OWN ``order_col`` (its last-modified event time —
    what makes it out-rank late redeliveries of events it already
    reflects) and takes ``lsn = lw`` (what makes it LOSE to any change
    the read could not have seen)."""
    if order_col not in chunk.columns:
        raise ValueError(
            f"source rows must carry the LWW order column {order_col!r}"
        )
    clash = {"op", "lsn"} & set(chunk.columns)
    if clash:
        raise ValueError(
            f"source state rows must not carry CDC columns {sorted(clash)}"
        )
    return chunk.select(
        F.lit("insert").alias("op"), "*", F.lit(int(lw)).alias("lsn")
    )


def _chunk_ledger_range(run_id: str, idx: int, lw: int) -> tuple[int, int]:
    """Synthetic 1-wide ledger identity for a chunk apply — high bit set
    keeps it out of real WAL lsn space (same scheme as the streaming
    tail's file-set epochs), and ``lw`` is part of the identity so a
    DELIBERATE re-read of the chunk at a later watermark applies rather
    than no-ops."""
    from ..lakehouse import SYNTHETIC_LSN_BASE

    digest = hashlib.sha256(f"{run_id}:{idx}:{lw}".encode()).digest()
    h = int.from_bytes(digest[:8], "big") & (SYNTHETIC_LSN_BASE - 1)
    lo = SYNTHETIC_LSN_BASE | h
    return (lo, lo + 1)


class IncrementalSnapshot:
    """Resumable chunked snapshot into a :class:`SnapshotTable`.

    Drive it with :meth:`step` (one chunk per call — interleave stream
    drains between calls however you like) or :meth:`run`. Progress
    lives in ``state_dir/state.json`` (boundaries + next chunk), so a
    new process resumes where the last one stopped; chunk applies are
    additionally exactly-once at the table via synthetic ledger ranges,
    so a crash BETWEEN the merge and the state write costs one cheap
    no-op, never a double apply.
    """

    def __init__(
        self,
        table: SnapshotTable,
        source: DataFrame,
        state_dir: str,
        chunk_rows: int = 1 << 20,
        key_cols: Sequence[str] | None = None,
        run_id: str = "incsnap",
    ):
        self.table = table
        self.source = source
        self.state_dir = state_dir
        self._state_path = os.path.join(state_dir, "state.json")
        os.makedirs(state_dir, exist_ok=True)
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                self.state = json.load(f)
        else:
            keys = list(key_cols or table.manifest()["key_cols"])
            plan = plan_chunks(source, keys, chunk_rows)
            self.state = {
                "run_id": run_id,
                "key_cols": plan.key_cols,
                "boundaries": plan.boundaries,
                "next_chunk": 0,
            }
            self._save()

    # -- state ----------------------------------------------------------
    def _save(self) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, self._state_path)

    @property
    def plan(self) -> ChunkPlan:
        return ChunkPlan(self.state["key_cols"], self.state["boundaries"])

    @property
    def done(self) -> bool:
        return self.state["next_chunk"] >= self.plan.n_chunks

    # -- execution ------------------------------------------------------
    def step(
        self,
        lw: int,
        source: DataFrame | None = None,
        **merge_kwargs,
    ) -> dict:
        """Read + apply the next chunk at low watermark ``lw``.

        ``lw`` MUST be a WAL position the source read provably
        reflects (on a live source: capture the WAL head *before*
        issuing the chunk SELECT — DBLog's low watermark). ``source``
        may be a refreshed view of the live table; defaults to the one
        given at construction (correct for a frozen source/archive).
        """
        if self.done:
            return {"done": True, "chunks": self.plan.n_chunks}
        idx = self.state["next_chunk"]
        src = source if source is not None else self.source
        chunk = src.filter(chunk_predicate(self.plan, idx))
        batch = snapshot_events(chunk, lw, self.table.manifest()["order_cols"][0])
        info = self.table.merge_cdc(
            batch,
            applied_range=_chunk_ledger_range(self.state["run_id"], idx, lw),
            source_is_raw=True,
            **merge_kwargs,
        )
        self.state["next_chunk"] = idx + 1
        self._save()
        return {
            "done": self.done,
            "chunk": idx,
            "chunks": self.plan.n_chunks,
            "lw": int(lw),
            "rows_applied": int(info.rows_written or 0),
        }

    def run(
        self,
        lw: int | Callable[[], int],
        between: Callable[[], None] | None = None,
        max_chunks: int | None = None,
        **merge_kwargs,
    ) -> dict:
        """Apply up to ``max_chunks`` remaining chunks (all by default).
        ``lw`` may be a callable re-sampled before every chunk (live
        WAL head); ``between`` runs after each chunk — the hook where a
        caller drains the stream so snapshot and tail share the window.
        """
        applied = 0
        rows = 0
        while not self.done and (max_chunks is None or applied < max_chunks):
            cur = lw() if callable(lw) else lw
            out = self.step(cur, **merge_kwargs)
            applied += 1
            rows += out["rows_applied"]
            if between is not None and not self.done:
                between()
        return {
            "done": self.done,
            "chunks_applied": applied,
            "rows_applied": rows,
            "next_chunk": self.state["next_chunk"],
            "chunks": self.plan.n_chunks,
        }
