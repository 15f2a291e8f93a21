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


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_curate_job(tmp_path_factory):
    """The WARC→curation pipeline under the same deployment shape:
    WARC shards in, curated parquet out, package resolved only from the
    --py-files zip."""
    base = tmp_path_factory.mktemp("submit_curate")
    zip_path = base / "go_htmldate_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in (REPO / "go_htmldate_spark").rglob("*"):
            if p.is_file() and "_build" not in p.parts and "__pycache__" not in p.parts:
                z.write(p, p.relative_to(REPO))
    job_copy = base / "jobs" / "curate_job.py"
    job_copy.parent.mkdir()
    job_copy.write_bytes((REPO / "jobs" / "curate_job.py").read_bytes())

    # WARC input: a few hand-written shards with real html pages
    import io
    import sys
    sys.path.insert(0, str(REPO))
    from go_htmldate_spark.sources.warc import (
        http_response_payload, write_warc_record,
    )
    warc_dir = base / "warc"
    warc_dir.mkdir()
    out = io.BytesIO()
    for i in range(40):
        body = (
            f'<html><head><meta property="article:published_time" '
            f'content="2021-06-{1 + i % 28:02d}"></head><body>'
            f'<p>the quick brown fox number {i} jumps over the lazy dog '
            f'and the weather is nice today in the small town.</p>\n'
            f"<p>subscribe to our newsletter for daily updates now.</p>"
            f"</body></html>"
        ).encode()
        write_warc_record(out, "response", http_response_payload(body),
                          url=f"https://curate.example/post/{i}",
                          warc_date=f"2024-01-01T00:00:{i % 60:02d}Z",
                          record_id=f"urn:uuid:{i}", gzip_member=True)
    (warc_dir / "shard-0.warc.gz").write_bytes(out.getvalue())

    out_dir = base / "clean"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            str(job_copy),
            "--warc", str(warc_dir / "*.warc.gz"),
            "--output", str(out_dir),
            "--sample", "en=1.0,*=0.5",
            "--line-dedup", "2",
            "--exact-substr", "8",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(base),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{") and "curated_docs" in l]
    assert len(stats) == 1 and stats[0]["curated_docs"] > 0
    assert stats[0]["curated_tokens"] > 0
    assert (out_dir / "_SUCCESS").exists()

    # the planted cross-document boilerplate line must be gone from
    # every curated body (line_dedup ran inside the submitted job),
    # while the unique prose line survived
    import duckdb
    texts = duckdb.sql(
        f"SELECT text FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchall()
    assert texts
    assert all("subscribe to our newsletter" not in t[0] for t in texts)
    assert all("quick brown fox" in t[0] for t in texts)
    # ExactSubstr stage: the post-number sentence tail is an identical
    # >= 8-token span across all 40 docs, so --exact-substr 8 cuts it;
    # the head stays because every 8-gram through it crosses the
    # unique per-doc number
    assert all("lazy dog" not in t[0] for t in texts)
