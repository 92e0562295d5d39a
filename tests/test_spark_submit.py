"""The north-rule launch contract, end-to-end for real: package the
engine as a zip, run the CLI through ``spark-submit --py-files`` in a
subprocess (fresh JVM, no repo on sys.path), and verify the replayed
table against the LWW oracle via the CLI's own verify subcommand."""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_replay_verify(tmp_path):
    pkg_zip = str(tmp_path / "neosync_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        pkg_root = os.path.join(REPO, "neosync_spark")
        for root, _dirs, files in os.walk(pkg_root):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    log = str(tmp_path / "log")
    table = str(tmp_path / "t")

    # copy the entry script OUT of the repo: Python puts the script's
    # own directory at sys.path[0], so submitting repo/run_cdc.py would
    # silently import the package from the checkout instead of the zip
    entry = str(tmp_path / "run_cdc.py")
    shutil.copyfile(os.path.join(REPO, "run_cdc.py"), entry)

    def submit(*args: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", pkg_zip,
                entry,
                *args,
            ],
            env=env,
            cwd=str(tmp_path),  # NOT the repo — import must come from the zip
            capture_output=True,
            text=True,
            timeout=420,
        )

    r = submit("synth", "--out", log, "--events", "20000")
    assert r.returncode == 0, r.stderr[-2000:]
    r = submit(
        "replay", "--log", log, "--table", table,
        "--batch-size", "10000", "--buckets", "8",
        "--mapping", "text=transform_pii_text",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"batches_skipped": 0' in r.stdout and '"batches_applied"' in r.stdout
    assert '"rows_applied": 0' not in r.stdout
    r = submit("verify", "--log", log, "--table", table)
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"match": true' in r.stdout
