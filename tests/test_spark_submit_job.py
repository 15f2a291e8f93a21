"""North-rule packaging gate: the crawl job must run under the real
`spark-submit --py-files go_htmldate_spark.zip` entrypoint — the exact
deployment shape for a multi-executor cluster (the zip is what ships;
workers import the package, and the C accelerator compiles on demand
from the shipped source inside each worker)."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_crawl_job(tmp_path_factory):
    base = tmp_path_factory.mktemp("submit")
    zip_path = base / "go_htmldate_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in (REPO / "go_htmldate_spark").rglob("*"):
            if p.is_file() and "_build" not in p.parts and "__pycache__" not in p.parts:
                z.write(p, p.relative_to(REPO))

    # run the job file from OUTSIDE the repo: its sys.path fallback then
    # points at the tmp dir, so go_htmldate_spark can only resolve from
    # the --py-files zip — the genuine cluster deployment shape
    job_copy = base / "jobs" / "crawl_job.py"
    job_copy.parent.mkdir()
    job_copy.write_bytes((REPO / "jobs" / "crawl_job.py").read_bytes())

    state = base / "state"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            str(job_copy),
            "--synth", "2000",
            "--state", str(state),
            "--rounds", "2",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(base),  # not the repo: the zip must provide the package
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    manifests = [
        json.loads(l) for l in proc.stdout.splitlines()
        if l.startswith("{") and "n_scheduled" in l
    ]
    assert len(manifests) == 2
    assert all(m["n_scheduled"] > 0 for m in manifests)
    # snapshot state landed on disk and is resumable input
    rounds = sorted(p.name for p in state.iterdir())
    assert rounds, "no snapshot state written"
