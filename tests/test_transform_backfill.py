"""Transform-version backfill: upgrading the anonymization policy
re-transforms ONLY the files written under older policies — in place,
resumable from the manifest, with the version floor propagated through
every rewrite path so maintenance can never silently mark
un-transformed rows as done.

Reference analog: re-running a Neosync job after editing its mappings
(worker/pkg/workflows/datasync) re-anonymizes the destination; here the
lakehouse does it incrementally instead of re-syncing the world.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neosync_spark.engine import EngineConfig, ReplayEngine
from neosync_spark.lakehouse import SnapshotTable
from neosync_spark.schema import KEY_COLS, transcript_schema
from neosync_spark.sources.changelog import ChangeLogSource
from neosync_spark.synth import SynthConfig, generate_pandas

from .conftest import assert_pdf_equal

CFG = SynthConfig(n_events=6_000, n_convs=200)


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("log") / "changelog")
    spark.createDataFrame(generate_pandas(CFG)).write.parquet(p)
    return p


def _build(spark, path, log_path, mode="mor"):
    t = SnapshotTable.create(
        spark, str(path), transcript_schema(), key_cols=KEY_COLS, n_buckets=8
    )
    eng = ReplayEngine(
        spark, t, config=EngineConfig(batch_lsn_size=2_000, merge_mode=mode)
    )
    eng.replay(ChangeLogSource(spark, log_path))
    return t


def _v2(df):
    # the upgraded policy: also redact digits inside transcript text
    return df.withColumn("text", F.regexp_replace("text", "[0-9]+", "#"))


def _entry_tvs(t):
    m = t.manifest(refresh=True)
    return {
        b: sorted(int(e.get("tv", 0)) for e in ents)
        for b, ents in m["files"].items()
    }


def test_backfill_upgrades_in_place_and_is_resumable(spark, tmp_path, log_path):
    t = _build(spark, tmp_path / "t", log_path, mode="mor")
    expected = _v2(t.read()).toPandas()

    assert t.pending_transform_buckets() == []  # no policy declared yet
    t.set_transform_version(2)
    pending = t.pending_transform_buckets()
    assert pending == sorted(int(b) for b in t.manifest()["files"])

    # crash simulation: upgrade a prefix of the work list by hand
    # (exactly what a killed backfill leaves behind), then resume
    t.compact(buckets=pending[:3], transform=_v2, tag_transform_version=2)
    remaining = t.pending_transform_buckets()
    assert remaining == pending[3:]  # finished groups never re-read

    rep = t.transform_backfill(_v2, group_size=2)
    assert rep["version"] == 2 and rep["buckets"] == len(remaining)
    assert rep["commits"] == len(rep["snapshot_ids"]) > 1
    assert t.pending_transform_buckets() == []
    assert all(tvs == [2] * len(tvs) for tvs in _entry_tvs(t).values())

    assert_pdf_equal(
        t.read().toPandas(), expected, ["conv_id", "turn_idx"],
        msg="backfilled state == policy applied to the final state",
    )

    # idempotent: nothing pending, nothing rewritten
    rep2 = t.transform_backfill(_v2)
    assert rep2["buckets"] == 0 and rep2["commits"] == 0


def test_new_merges_after_bump_are_stamped(spark, tmp_path, log_path):
    t = _build(spark, tmp_path / "t", log_path, mode="mor")
    t.set_transform_version(3)
    src = ChangeLogSource(spark, log_path)
    hi = src.lsn_bounds()[1]
    more = (
        src.slice(0, hi + 1)
        .limit(500)
        .withColumn("lsn", F.col("lsn") + F.lit(hi + 1))
    )
    t.merge_cdc(
        more, applied_range=(hi + 1, 2 * hi + 2), mode="mor",
        source_is_raw=True,
    )
    m = t.manifest(refresh=True)
    fresh = [
        int(e.get("tv", 0))
        for ents in m["files"].values()
        for e in ents
        if e.get("kind") == "delta"
        and int(e.get("tv", 0)) == 3
    ]
    assert fresh, "post-bump merge wrote no tv=3 delta entries"
    # old files still pending; the stamped deltas are not the work list
    assert t.pending_transform_buckets() != []


def test_plain_compact_propagates_the_floor(spark, tmp_path, log_path):
    t = _build(spark, tmp_path / "t", log_path, mode="mor")
    t.set_transform_version(2)
    buckets = t.pending_transform_buckets()
    t.compact(buckets=buckets[:2], transform=_v2, tag_transform_version=2)

    # a plain compaction of an upgraded bucket KEEPS tv=2 ...
    t.compact(buckets=buckets[:1], sort_by_key=True)
    tvs = _entry_tvs(t)
    assert tvs[str(buckets[0])] and all(v == 2 for v in tvs[str(buckets[0])])

    # ... and of a never-upgraded bucket stays at the 0 floor: still
    # pending, so a crashed backfill can't be masked by maintenance
    t.compact(buckets=buckets[-1:], sort_by_key=True)
    assert buckets[-1] in t.pending_transform_buckets()
    assert buckets[0] not in t.pending_transform_buckets()


def test_guards(spark, tmp_path, log_path):
    t = _build(spark, tmp_path / "t", log_path, mode="cow")
    t.set_transform_version(5)
    with pytest.raises(ValueError, match="monotonic"):
        t.set_transform_version(4)
    with pytest.raises(ValueError, match="column set"):
        t.compact(
            buckets=t.pending_transform_buckets()[:1],
            transform=lambda df: df.drop("tool"),
            tag_transform_version=5,
        )
    t2 = _build(spark, tmp_path / "t2", log_path, mode="cow")
    with pytest.raises(ValueError, match="positive target version"):
        t2.transform_backfill(_v2)
