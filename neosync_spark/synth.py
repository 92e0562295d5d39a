"""Deterministic synthetic change-log generator + independent oracle.

Analog of the reference's `generate` input + fixture corpora
(/root/reference/worker/pkg/benthos/config.go:125-129 synth input;
/root/reference/internal/testutil/testdata/ fixture tables verified by
verify.go:107-132). Generation is a pure function of (seed, index) via a
vectorized splitmix64 mix, so the small-scale pandas path and the
distributed mapInPandas path produce bit-identical events — and the
oracle can be computed independently of the engine.

Event mix per FIXTURES.md §2: 70% insert / 25% update / 5% delete,
hot-key skew (top 1% convs get ~30% of update/delete traffic),
~2% duplicated events (at-least-once delivery), out-of-order timestamps
with (ts) ties broken by lsn.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .util import mix64 as _mix64
from .util import u01 as _u01

_PII_NAMES = np.array(
    ["john.doe", "jane.roe", "alice.smith", "bob.jones", "carol.wu", "dave.kim"]
)
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore".split()
)
_TOOLS = np.array(["search", "calculator", "browser", "code_exec"])


@dataclass(frozen=True)
class SynthConfig:
    n_events: int = 10_000
    n_convs: int = 500
    seed: int = 42
    dup_frac: float = 0.02
    hot_frac: float = 0.01  # top 1% of convs are "hot"
    hot_update_share: float = 0.30  # get ~30% of update/delete traffic
    mean_turns: int = 8
    max_turns: int = 64
    base_ts: str = "2024-01-01T00:00:00"
    # events with lsn < evolution_lsn carry no `tool` payload (v1 schema);
    # <0 disables the schema-evolution split (tool present throughout).
    evolution_lsn: int = -1

    @property
    def total_rows(self) -> int:
        return self.n_events + int(self.n_events * self.dup_frac)


def _turns_per_conv(cfg: SynthConfig, conv: np.ndarray) -> np.ndarray:
    """Geometric-ish turns per conversation: mean ~cfg.mean_turns, capped."""
    u = _u01(_mix64(cfg.seed, conv, 0xC0FFEE))
    p = 1.0 / cfg.mean_turns
    k = np.floor(np.log(np.clip(u, 1e-12, 1.0)) / np.log(1.0 - p)).astype(np.int64)
    return 1 + np.minimum(k, cfg.max_turns - 1)


def events_for_indices(idx: np.ndarray, cfg: SynthConfig) -> pd.DataFrame:
    """Pure function: log row index → change event (vectorized).

    Indices >= cfg.n_events are duplicate re-emissions of an earlier
    event (identical lsn/ts/payload), modeling at-least-once delivery.
    """
    idx = np.asarray(idx, dtype=np.int64)
    is_dup = idx >= cfg.n_events
    src = idx.copy()
    if is_dup.any():
        # duplicate re-emits an earlier original event
        dup_of = (_mix64(cfg.seed, idx[is_dup], 7) % np.uint64(cfg.n_events)).astype(
            np.int64
        )
        src[is_dup] = dup_of
    i = src.astype(np.uint64)

    lsn = src  # strictly increasing over originals; dup shares source lsn

    r_op = (_mix64(cfg.seed, i, 1) % np.uint64(100)).astype(np.int64)
    op = np.where(r_op < 70, "insert", np.where(r_op < 95, "update", "delete"))

    n_hot = max(1, int(cfg.n_convs * cfg.hot_frac))
    r_hot = _u01(_mix64(cfg.seed, i, 2))
    conv_u = (_mix64(cfg.seed, i, 3) % np.uint64(cfg.n_convs)).astype(np.int64)
    conv_h = (_mix64(cfg.seed, i, 4) % np.uint64(n_hot)).astype(np.int64)
    is_mut = r_op >= 70
    conv = np.where(is_mut & (r_hot < cfg.hot_update_share), conv_h, conv_u)

    t_c = _turns_per_conv(cfg, conv)
    turn = (_mix64(cfg.seed, i, 5) % t_c.astype(np.uint64)).astype(np.int64)

    # timestamps: ~1 event/sec, 10% delivered late (ts shifted back), and
    # second-resolution so hot keys naturally produce (ts) ties → lsn tiebreak
    late = _u01(_mix64(cfg.seed, i, 6)) < 0.10
    shift = (_mix64(cfg.seed, i, 8) % np.uint64(120)).astype(np.int64)
    ts_s = src - np.where(late, shift, 0)
    ts = pd.Timestamp(cfg.base_ts).to_datetime64() + ts_s * np.timedelta64(1, "s")

    is_del = op == "delete"
    role = np.where(
        (_mix64(cfg.seed, i, 9) % np.uint64(20)) == 0,
        "system",
        np.where(turn % 2 == 0, "user", "assistant"),
    )

    w1 = _WORDS[(_mix64(cfg.seed, i, 10) % np.uint64(len(_WORDS))).astype(np.int64)]
    w2 = _WORDS[(_mix64(cfg.seed, i, 11) % np.uint64(len(_WORDS))).astype(np.int64)]
    pii_kind = (_mix64(cfg.seed, i, 12) % np.uint64(5)).astype(np.int64)
    name = _PII_NAMES[(_mix64(cfg.seed, i, 13) % np.uint64(len(_PII_NAMES))).astype(np.int64)]
    phone_sfx = (_mix64(cfg.seed, i, 14) % np.uint64(10000)).astype(np.int64)

    base_txt = (
        pd.Series(w1).str.cat(pd.Series(w2), sep=" ")
        + " turn "
        + pd.Series(turn).astype(str)
        + " of conv "
        + pd.Series(conv).astype(str)
    )
    email_bit = " contact " + pd.Series(name) + "@example.com"
    phone_bit = " call +1-555-" + pd.Series(phone_sfx).astype(str).str.zfill(4)
    name_bit = " ask for " + pd.Series(name).str.replace(".", " ", regex=False).str.title()
    text = base_txt.copy()
    text = text.where(pii_kind != 0, base_txt + email_bit)
    text = text.where(pii_kind != 1, base_txt + phone_bit)
    text = text.where(pii_kind != 2, base_txt + name_bit)
    text = text.where(~is_del, None)

    has_tool = (role == "assistant") & ((_mix64(cfg.seed, i, 15) % np.uint64(4)) == 0)
    tool_name = _TOOLS[(_mix64(cfg.seed, i, 16) % np.uint64(len(_TOOLS))).astype(np.int64)]
    tool_json = (
        '{"name":"' + pd.Series(tool_name) + '","args":{"q":"' + pd.Series(w1) + '"}}'
    )
    tool = tool_json.astype(object).where(pd.Series(has_tool & ~is_del), None)
    if cfg.evolution_lsn >= 0:
        tool = tool.where(pd.Series(lsn) >= cfg.evolution_lsn, None)

    role_s = pd.Series(np.where(is_del, None, role), dtype=object)

    return pd.DataFrame(
        {
            "lsn": pd.Series(lsn, dtype="int64"),
            "op": pd.Series(op, dtype=object),
            "conv_id": "conv-" + pd.Series(conv).astype(str).str.zfill(6),
            "turn_idx": pd.Series(turn, dtype="int32"),
            "role": role_s,
            "text": text.astype(object),
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def generate_pandas(cfg: SynthConfig) -> pd.DataFrame:
    """Full change log in pandas (small scale / oracle path)."""
    return events_for_indices(np.arange(cfg.total_rows, dtype=np.int64), cfg)


def generate_spark(spark, cfg: SynthConfig, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas over the same
    pure per-index function. Identical output to generate_pandas."""
    from .schema import change_event_schema

    n = cfg.total_rows
    parts = partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n, 1, parts)

    def gen(batches):
        for pdf in batches:
            yield events_for_indices(pdf["id"].to_numpy(), cfg)

    return rng.mapInPandas(gen, schema=change_event_schema(with_tool=True))


def expected_final_state(
    log: pd.DataFrame, transform=None, drop_tool: bool = False
) -> pd.DataFrame:
    """Independent oracle: LWW winner per (conv_id, turn_idx) by
    (ts, lsn); winner==delete ⇒ row absent. Optionally applies the same
    transformer callable(text_series, conv_series, turn_series) used by
    the engine (transformers are pure functions of (seed, key, value)).

    Mirrors the reference's source↔target row-equality verification
    (/root/reference/internal/testutil/testdata/verify.go:107-132).
    """
    df = log.sort_values(["ts", "lsn"], kind="mergesort")
    last = df.groupby(["conv_id", "turn_idx"], as_index=False).tail(1)
    alive = last[last["op"] != "delete"].copy()
    out = alive[["conv_id", "turn_idx", "role", "text", "tool", "ts"]].reset_index(
        drop=True
    )
    if transform is not None:
        out = transform(out)
    if drop_tool:
        out = out.drop(columns=["tool"])
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
