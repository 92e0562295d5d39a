"""Quantified recall of the PII recognizers (VERDICT r4 task #6).

The claim under test: the builtin regex/dataset tier misses names
outside its vocabulary (non-Western spellings), and the
``custom_recognizers`` hook — fed a dictionary-boosted fake model —
closes exactly that gap without touching emails/phones. The report
runs the real ``transform_pii_text`` Arrow path end-to-end.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from neosync_spark.functions import transformers as X
from neosync_spark.operators.pii_eval import (
    NON_WESTERN_NAMES,
    dictionary_ner_scorer,
    labeled_pii_fixture,
    pii_recall_report,
)


def _report(spark, n=64):
    fixture = labeled_pii_fixture(
        spark.range(n).withColumnRenamed("id", "doc_id")
    )
    tiers = {
        "builtin": X.transform_pii_text(recognize_person_names=True),
        "hooked": X.transform_pii_text(
            recognize_person_names=True,
            custom_recognizers={"PERSON": dictionary_ner_scorer()},
        ),
    }
    rep = pii_recall_report(fixture, tiers)
    return {
        (r["tier"], r["entity"]): r for r in rep.collect()
    }


def test_builtin_misses_exactly_the_unknown_names(spark):
    got = _report(spark)
    bp = got[("builtin", "PERSON")]
    assert bp["n_gold"] == 64
    assert bp["n_detected"] == 32  # the dataset-name half
    assert abs(bp["recall"] - 0.5) < 1e-9
    assert bp["precision"] == 1.0


def test_hook_closes_the_person_gap(spark):
    got = _report(spark)
    hp = got[("hooked", "PERSON")]
    assert hp["n_detected"] == hp["n_gold"] == 64
    assert hp["recall"] == 1.0 and hp["precision"] == 1.0


def test_structured_entities_unaffected_by_tier(spark):
    got = _report(spark)
    for tier in ("builtin", "hooked"):
        for ent in ("EMAIL_ADDRESS", "PHONE_NUMBER"):
            r = got[(tier, ent)]
            assert r["recall"] == 1.0 and r["precision"] == 1.0, (tier, ent, r)


def test_fixture_is_deterministic_and_labeled(spark):
    f1 = labeled_pii_fixture(
        spark.range(16).withColumnRenamed("id", "doc_id")
    ).collect()
    f2 = labeled_pii_fixture(
        spark.range(16).withColumnRenamed("id", "doc_id")
    ).collect()
    assert f1 == f2
    for r in f1:
        assert r["gold_person"] in r["text"]
        assert r["gold_email"] in r["text"]
        assert r["gold_phone"] in r["text"]
        if not r["is_dataset_name"]:
            assert r["gold_person"] in NON_WESTERN_NAMES


def test_scorer_finds_every_occurrence(spark):
    import pandas as pd

    scorer = dictionary_ner_scorer(("Zhang Wei",))
    spans = scorer(pd.Series(["Zhang Wei met Zhang Wei", None, "nobody"]))
    assert spans[0] == [(0, 9, 1.0), (14, 23, 1.0)]
    assert spans[1] == [] and spans[2] == []
