from __future__ import annotations

import datetime as dt

import pytest

from neosync_spark.operators.policy_mask import apply_policies


def _df(spark):
    return spark.createDataFrame(
        [
            ("c1", 3, "alice@corp.example called 555-123-4567", "admin",
             dt.datetime(2024, 1, 2, 3, 4, 5)),
            ("c2", 9, "no pii here", "analyst",
             dt.datetime(2024, 2, 2, 3, 4, 5)),
        ],
        "conv_id string, turn_idx int, text string, role string, ts timestamp",
    )


_POLICIES = [
    {"col": "conv_id", "audience": "analyst", "rule": "hash", "arg": "8"},
    {"col": "text", "audience": "analyst", "rule": "redact_pii"},
    {"col": "text", "audience": "export", "rule": "null"},
    {"col": "turn_idx", "audience": "*", "rule": "band", "arg": "4"},
    {"col": "ts", "audience": "analyst", "rule": "date_trunc", "arg": "day"},
]


def test_audience_view(spark):
    out = apply_policies(_df(spark), _POLICIES, "analyst")
    assert out.columns == ["conv_id", "turn_idx", "text", "role", "ts"]
    rows = {r["role"]: r for r in out.collect()}
    r = rows["admin"]
    assert len(r["conv_id"]) == 8 and r["conv_id"] != "c1"
    assert "<EMAIL>" in r["text"] and "<PHONE>" in r["text"]
    assert r["turn_idx"] == 0 and rows["analyst"]["turn_idx"] == 8
    assert r["ts"] == dt.datetime(2024, 1, 2)
    # role had no policy -> default keep
    assert r["role"] == "admin"


def test_star_fallback_and_specific_beats_star(spark):
    pol = _POLICIES + [{"col": "text", "audience": "*", "rule": "shape"}]
    analyst = apply_policies(_df(spark), pol, "analyst")
    assert "<EMAIL>" in analyst.collect()[0]["text"]  # specific wins
    other = apply_policies(_df(spark), pol, "ml-train")
    assert "<EMAIL>" not in other.collect()[0]["text"]  # star shape-masks


def test_export_fail_closed_default(spark):
    out = apply_policies(
        _df(spark), _POLICIES, "export", default_rule="null"
    )
    r = out.collect()[0]
    assert r["text"] is None and r["role"] is None and r["ts"] is None
    assert r["turn_idx"] in (0, 8)  # '*' band still applies
    # schema survives nulling (types intact for the sink)
    assert dict(out.dtypes)["ts"] == "timestamp"


def test_row_filter_sees_masked_values(spark):
    pol = _POLICIES + [
        {"col": "*", "audience": "analyst", "rule": "filter",
         "arg": "turn_idx >= 8"},
    ]
    out = apply_policies(_df(spark), pol, "analyst")
    assert [r["role"] for r in out.collect()] == ["analyst"]


def test_policies_as_dataframe(spark):
    pdf = spark.createDataFrame(
        [("conv_id", "analyst", "hash", "8")],
        "col string, audience string, rule string, arg string",
    )
    out = apply_policies(_df(spark), pdf, "analyst")
    assert len(out.collect()[0]["conv_id"]) == 8


def test_unknown_rule_and_conflict_raise(spark):
    with pytest.raises(ValueError, match="unknown masking rule"):
        apply_policies(
            _df(spark),
            [{"col": "text", "audience": "*", "rule": "rot26"}],
            "analyst",
        )
    with pytest.raises(ValueError, match="conflicting"):
        apply_policies(
            _df(spark),
            [
                {"col": "text", "audience": "analyst", "rule": "null"},
                {"col": "text", "audience": "analyst", "rule": "keep"},
            ],
            "analyst",
        )


def test_masking_stays_in_codegen(spark):
    out = apply_policies(_df(spark), _POLICIES, "analyst")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_cli_catalog_read_with_policies(spark, tmp_path, capsys):
    """`catalog read --policies --audience` serves the masked view."""
    import json

    from neosync_spark.cli import main

    log_dir = str(tmp_path / "log")
    table = str(tmp_path / "t")
    root = str(tmp_path / "cat")
    assert main(["synth", "--out", log_dir, "--events", "500"]) == 0
    assert main(["replay", "--log", log_dir, "--table", table]) == 0
    assert main(["catalog", "--root", root, "init"]) == 0
    assert main([
        "catalog", "--root", root, "publish", "--pin", f"conv={table}",
    ]) == 0
    capsys.readouterr()

    pol = tmp_path / "pol.json"
    pol.write_text(json.dumps([
        {"col": "conv_id", "audience": "analyst", "rule": "hash", "arg": "8"},
        {"col": "text", "audience": "analyst", "rule": "constant", "arg": "X"},
    ]))

    # audience without --policies fails closed on arg validation
    assert main([
        "catalog", "--root", root, "read", "--name", "conv",
        "--policies", str(pol), "--limit", "5",
    ]) == 2
    capsys.readouterr()

    assert main([
        "catalog", "--root", root, "read", "--name", "conv",
        "--policies", str(pol), "--audience", "analyst", "--limit", "5",
    ]) == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")]
    assert rows and all(len(r["conv_id"]) == 8 for r in rows)
    assert all(r["text"] == "X" for r in rows)

    # same read without policies serves the raw column
    assert main([
        "catalog", "--root", root, "read", "--name", "conv", "--limit", "5",
    ]) == 0
    raw = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    assert any(len(r["conv_id"]) != 8 for r in raw) or raw[0]["text"] != "X"
