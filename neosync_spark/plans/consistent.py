"""Cross-table consistent reads at a common LSN watermark.

A CDC fan-out feeds several destination tables from one source log
(the reference syncs many destinations per job —
/root/reference/worker/pkg/workflows/datasync/workflow/workflow.go:82 —
and Benthos fan-out in worker/pkg/benthos), but each SnapshotTable
commits independently: there is no multi-table atomic commit in the
lakehouse model (same as Iceberg/Delta today). A reader joining two
such tables at their *current* snapshots can observe torn states — one
table reflecting source position 3M, the other 2M.

The honest, metadata-only fix is watermark alignment: every commit's
ledger records the exactly-once applied lsn range ``[lo, hi)``, so each
snapshot corresponds to a precise source position (its high-water). A
cross-table read is consistent iff all tables are read *as of the same
source lsn W*, and such a W exists exactly when W is a checkpoint
boundary of every table. ``consistent_watermark`` picks the newest
common boundary; ``read_consistent`` time-travels every table to its
snapshot covering that boundary (SnapshotTable.snapshot_at_lsn — walks
the parent chain, metadata-only, no data I/O until the read executes).

At 100 TB this is the difference between "rerun the join and hope" and
a zero-copy consistent view: alignment costs one manifest read per
table, and reads go through the ordinary pruned paths at the chosen
snapshots. Consistency reaches only as far back as snapshot retention —
``snapshot_at_lsn`` raises if GC expired the covering snapshot.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import DataFrame

from ..lakehouse import SnapshotTable


def consistent_watermark(tables: Iterable[SnapshotTable]) -> int:
    """Newest source lsn W that is a checkpoint boundary of EVERY
    table — the latest position at which a consistent cross-table view
    exists. Metadata-only (one manifest read per table).

    Raises if the tables share no boundary: feeds whose commit grids
    never coincide (e.g. batch sizes 1000 and 777 with no common
    multiple applied yet) cannot be aligned exactly, and pretending
    otherwise would fake consistency — align commit cadences on a
    common multiple, as checkpoint schedulers do in practice.
    """
    ts = list(tables)
    if not ts:
        raise ValueError("consistent_watermark needs at least one table")
    common: set[int] | None = None
    for t in ts:
        bs = set(t.checkpoint_boundaries())
        common = bs if common is None else (common & bs)
    if not common:
        raise ValueError(
            "tables share no checkpoint boundary — their commit grids "
            "never coincided; commit on a common lsn multiple to make "
            "consistent reads possible"
        )
    return max(common)


def read_consistent(
    tables: Mapping[str, SnapshotTable],
    lsn: int | None = None,
) -> dict[str, DataFrame]:
    """Read every table as of the SAME source position.

    With ``lsn=None`` aligns at :func:`consistent_watermark` (the
    newest common boundary); an explicit ``lsn`` must be a checkpoint
    boundary of every table (enforced per-table by
    ``snapshot_at_lsn(strict=True)``). Returns name → DataFrame, each
    pinned to the snapshot whose ledger high-water equals the chosen
    watermark, so joins across the returned frames observe one
    transactionally consistent source position.
    """
    w = consistent_watermark(tables.values()) if lsn is None else int(lsn)
    return {
        name: t.read(snapshot_id=t.snapshot_at_lsn(w))
        for name, t in tables.items()
    }
