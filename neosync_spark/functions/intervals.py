"""SQL INTERVAL ingest — the parquet-representable encode of the
reference's Neosync interval type.

The reference round-trips Postgres ``interval`` through a
(microseconds int64, days int32, months int32) triple
(/root/reference/internal/neosync-types/interval.go:13-15; scanned via
pgtype.Interval in internal/database-record-mapper/postgres/
mapper.go:33-91). Spark/parquet has no year-month+day-time interval
column type usable in a plain parquet table, so this module encodes the
SAME triple as a ``struct<months int, days int, micros long>`` column:

* :func:`parse_pg_interval` — Postgres text output format
  (``[N year[s]] [N mon[s]] [N day[s]] [-]HH:MM:SS[.ffffff]``) → struct,
  all JVM regexp/arithmetic (no UDF).
* :func:`interval_to_text` — struct → the same text format (round-trip).
* :func:`interval_struct` — assemble from already-split columns.

Components keep independent signs, exactly like pgtype.Interval —
``-1 mons 10 days`` stays (months=-1, days=10, micros=0); no lossy
days-per-month flattening.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

INTERVAL_STRUCT = T.StructType(
    [
        T.StructField("months", T.IntegerType(), True),
        T.StructField("days", T.IntegerType(), True),
        T.StructField("micros", T.LongType(), True),
    ]
)

_TIME_RE = r"(-?)(\d+):(\d{2}):(\d{2})(?:\.(\d{1,6}))?"


def _num(c: Column, pat: str) -> Column:
    ext = F.regexp_extract(c, pat, 1)
    return F.coalesce(
        F.when(ext != "", ext).cast("long"), F.lit(0).cast("long")
    )


def parse_pg_interval(col: Column | str) -> Column:
    """Parse Postgres interval text into struct<months, days, micros>.

    Accepts the Postgres default output format: optional signed
    ``N year(s)``, ``N mon(s)``, ``N day(s)`` components and an
    optional ``[-]HH:MM:SS[.ffffff]`` time part, in any combination.
    NULL and empty input → NULL struct.
    """
    c = F.col(col) if isinstance(col, str) else col
    years = _num(c, r"(-?\d+)\s+years?")
    mons = _num(c, r"(-?\d+)\s+mons?")
    days = _num(c, r"(-?\d+)\s+days?")
    neg_t = F.regexp_extract(c, _TIME_RE, 1) == "-"
    hh = _num(c, r"-?(\d+):\d{2}:\d{2}")
    mm = F.coalesce(
        F.when(F.regexp_extract(c, _TIME_RE, 3) != "",
               F.regexp_extract(c, _TIME_RE, 3)).cast("long"),
        F.lit(0).cast("long"),
    )
    ss = F.coalesce(
        F.when(F.regexp_extract(c, _TIME_RE, 4) != "",
               F.regexp_extract(c, _TIME_RE, 4)).cast("long"),
        F.lit(0).cast("long"),
    )
    frac = F.regexp_extract(c, _TIME_RE, 5)
    frac_us = F.coalesce(
        F.when(frac != "", F.rpad(frac, 6, "0")).cast("long"),
        F.lit(0).cast("long"),
    )
    # decimal domain: |int64 min| = 2^63 is unrepresentable in long —
    # the positive magnitude would overflow under ANSI before negation
    abs_dec = (
        (hh.cast("decimal(38,0)") * 3600 + mm * 60 + ss) * F.lit(1_000_000)
        + frac_us
    )
    micros = F.when(neg_t, -abs_dec).otherwise(abs_dec).cast("long")
    return F.when(
        c.isNull() | (F.trim(c) == ""), F.lit(None).cast(INTERVAL_STRUCT)
    ).otherwise(
        F.struct(
            (years * 12 + mons).cast("int").alias("months"),
            days.cast("int").alias("days"),
            micros.alias("micros"),
        )
    )


def interval_struct(
    months: Column | str, days: Column | str, micros: Column | str
) -> Column:
    """Assemble the interval struct from already-split columns (the
    (months, days, micros) wire triple of the reference type)."""
    m = F.col(months) if isinstance(months, str) else months
    d = F.col(days) if isinstance(days, str) else days
    u = F.col(micros) if isinstance(micros, str) else micros
    return F.struct(
        m.cast("int").alias("months"),
        d.cast("int").alias("days"),
        u.cast("long").alias("micros"),
    )


def interval_to_text(col: Column | str) -> Column:
    """Render struct<months, days, micros> in the Postgres output
    format (years/mons/days emitted when nonzero; time always)."""
    c = F.col(col) if isinstance(col, str) else col
    months, days, micros = c.getField("months"), c.getField("days"), c.getField("micros")
    yy = (months / 12).cast("int")
    mm_ = months - yy * 12

    def _idiv(a, b: int):
        # exact integer division for the full int64 domain: long `/`
        # (and even decimal(38) `/`) round for |a| >= 2^53, so hh near
        # int64-max micros came out one second high. (a - a%b) is an
        # exact multiple of b: its double quotient is within q·2^-52
        # (< 1e-6 here) of the true integer, which round() recovers.
        return F.round((a - a % F.lit(b)) / F.lit(b)).cast("long")

    # abs in decimal: F.abs(int64 min) overflows under ANSI mode —
    # 2^63 needs the wider domain (later mods shrink it back to long)
    abs_us = F.abs(micros.cast("decimal(38,0)"))
    hh = _idiv(abs_us, 3_600_000_000)
    mi = _idiv(abs_us % 3_600_000_000, 60_000_000)
    ss = _idiv(abs_us % 60_000_000, 1_000_000)
    us = (abs_us % 1_000_000).cast("long")
    frac = F.when(
        us > 0,
        F.regexp_replace(
            F.concat(F.lit("."), F.lpad(us.cast("string"), 6, "0")),
            r"0+$",
            "",
        ),
    ).otherwise(F.lit(""))
    time_part = F.concat(
        F.when(micros < 0, F.lit("-")).otherwise(F.lit("")),
        # NOT lpad: Spark's lpad TRUNCATES strings longer than the pad
        # width ("1999999999" hours -> "19"); %02d only ever widens
        F.format_string("%02d", hh), F.lit(":"),
        F.format_string("%02d", mi), F.lit(":"),
        F.format_string("%02d", ss),
        frac,
    )
    parts = F.concat_ws(
        " ",
        F.when(yy != 0, F.concat(yy.cast("string"), F.lit(" years"))),
        F.when(mm_ != 0, F.concat(mm_.cast("string"), F.lit(" mons"))),
        F.when(days != 0, F.concat(days.cast("string"), F.lit(" days"))),
        time_part,
    )
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(parts)
