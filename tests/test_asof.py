"""As-of (point-in-time) join: union-merge window implementation vs
hand-computed expectations and a brute-force reference."""

from __future__ import annotations

from neosync_spark.operators.asof import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:05", 1),
            ("a", "2024-01-01 00:00:10", 2),
            ("a", "2024-01-01 00:00:20", 3),
            ("b", "2024-01-01 00:00:10", 4),  # no right rows for b
        ],
        "k string, ts string, ev int",
    )
    right = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:04", "r1"),
            ("a", "2024-01-01 00:00:10", "r2"),
            ("a", "2024-01-01 00:00:15", "r3"),
        ],
        "k string, ts string, state string",
    )
    return left, right


def test_asof_basic_backward(spark):
    left, right = _sides(spark)
    out = {r["ev"]: r for r in asof_join(left, right, "k").collect()}
    assert len(out) == 4
    assert out[1]["asof_state"] == "r1"          # 05 -> r1@04
    assert out[2]["asof_state"] == "r2"          # exact match 10 -> r2
    assert out[2]["asof_ts"] == "2024-01-01 00:00:10"
    assert out[3]["asof_state"] == "r3"          # 20 -> r3@15
    assert out[4]["asof_state"] is None          # key b unmatched
    assert out[4]["asof_ts"] is None


def test_asof_exclude_exact_matches(spark):
    left, right = _sides(spark)
    out = {
        r["ev"]: r
        for r in asof_join(
            left, right, "k", allow_exact_matches=False
        ).collect()
    }
    assert out[2]["asof_state"] == "r1"          # 10 -> strictly before -> r1


def test_asof_tolerance(spark):
    left, right = _sides(spark)
    out = {
        r["ev"]: r
        for r in asof_join(
            left, right, "k", tolerance_us=2_000_000
        ).collect()
    }
    assert out[1]["asof_state"] == "r1"          # 1s stale: kept
    assert out[3]["asof_state"] is None          # 5s stale: dropped
    assert out[3]["asof_ts"] is None


def test_asof_collision_guard(spark):
    import pytest

    left, right = _sides(spark)
    with pytest.raises(ValueError, match="collision"):
        asof_join(
            left.withColumn("asof_state", left.ev), right, "k"
        )


def test_asof_matches_bruteforce(spark):
    """Random-ish dense case vs an O(n·m) reference computed in
    Python."""
    lrows = [
        (f"k{i % 5}", f"2024-01-01 00:00:{(i * 7) % 60:02d}", i)
        for i in range(60)
    ]
    rrows = [
        (f"k{j % 4}", f"2024-01-01 00:00:{(j * 11) % 60:02d}", f"s{j}")
        for j in range(40)
    ]
    # de-dup right (key, ts) keeping the max j — the documented contract
    best = {}
    for k, ts, s in rrows:
        best[(k, ts)] = s
    rrows = [(k, ts, s) for (k, ts), s in best.items()]

    left = spark.createDataFrame(lrows, "k string, ts string, ev int")
    right = spark.createDataFrame(rrows, "k string, ts string, state string")
    got = {
        r["ev"]: (r["asof_state"], r["asof_ts"])
        for r in asof_join(left, right, "k").collect()
    }
    for k, ts, i in lrows:
        cand = [(rts, s) for (rk, rts, s) in rrows if rk == k and rts <= ts]
        want = max(cand) if cand else (None, None)
        assert got[i] == (want[1], want[0]), (k, ts, i)
