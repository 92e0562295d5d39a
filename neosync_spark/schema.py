"""Canonical schemas for the transcript CDC engine.

The target table shape is fixed by the engine spec (BASELINE.json
``input_hint``): multi-turn conversation/agent transcripts keyed by
``(conv_id, turn_idx)``. The change-event envelope mirrors the
reference's keyset-ordered source read plus op semantics
(/root/reference/worker/pkg/benthos/sql/input_sql_raw.go:18-25 — ordered
paged scan; /root/reference/internal/runconfigs/runconfigs.go:13-18 —
insert/update run types; deletes added per the north rule).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Logical key of the target table (reference analog: primary-key columns
# selected for ordering, /root/reference/internal/runconfigs/builder.go:470-486).
KEY_COLS = ["conv_id", "turn_idx"]

# LWW ordering of change events: change timestamp, tie-broken by log
# sequence number (reference analog: last write wins via ON CONFLICT DO
# UPDATE in source order, output_sql_insert.go:187-191 — made explicit here).
ORDER_COLS = ["ts", "lsn"]

# Payload columns of the v1 transcript schema (pre schema-evolution).
PAYLOAD_COLS_V1 = ["role", "text"]
# v2 adds `tool` (the schema-evolution fixture adds it mid-log).
PAYLOAD_COLS_V2 = ["role", "text", "tool"]

OPS = ("insert", "update", "delete")


def transcript_schema(with_tool: bool = True, wide_turn_idx: bool = False) -> T.StructType:
    """Target table schema per input_hint:
    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)."""
    turn_t = T.LongType() if wide_turn_idx else T.IntegerType()
    fields = [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", turn_t, False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
    if with_tool:
        fields.append(T.StructField("tool", T.StringType(), True))
    fields.append(T.StructField("ts", T.TimestampType(), True))
    return T.StructType(fields)


def change_event_schema(with_tool: bool = True, wide_turn_idx: bool = False) -> T.StructType:
    """CDC envelope over the transcript payload (FIXTURES.md §2)."""
    turn_t = T.LongType() if wide_turn_idx else T.IntegerType()
    fields = [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", turn_t, False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
    if with_tool:
        fields.append(T.StructField("tool", T.StringType(), True))
    fields.append(T.StructField("ts", T.TimestampType(), True))
    return T.StructType(fields)


TRANSCRIPT_SCHEMA = transcript_schema()
CHANGE_EVENT_SCHEMA = change_event_schema()
