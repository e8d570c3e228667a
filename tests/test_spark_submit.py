"""Packaging smoke: the job really runs via ``spark-submit --py-files``.

North-rule requirement (BASELINE.json north_star): the pipeline must be
"packaged for `spark-submit --py-files` on multi-executor clusters". This
test builds dist/pipeline.zip, launches jobs/extract.py through the real
spark-submit binary with ONLY the zip on the python path (cwd is a temp dir,
so the repo package is not importable implicitly), and checks the job's
stats line plus the byte-identity of extracted markdown vs goldens.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from .conftest import GOLDENS_SMOKE, PAGES_SMOKE, REPO_ROOT

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_spark_submit_py_files(tmp_path):
    sys.path.insert(0, REPO_ROOT)
    from tools.make_dist import build

    zip_path = build(str(tmp_path / "pipeline.zip"))
    out_root = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO_ROOT, "jobs", "extract.py"),
         "--input", PAGES_SMOKE, "--output", out_root,
         "--partitions", "8", "--partitions-per-commit", "4",
         "--max-bytes", str(256 * 1024)],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env, check=False)
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats_line = [ln for ln in proc.stdout.splitlines()
                  if ln.startswith("{")][-1]
    stats = json.loads(stats_line)
    assert stats["processed_partitions"] == 8
    assert stats["docs"] > 0

    # byte-identity of the submitted job's output vs committed goldens
    import duckdb
    con = duckdb.connect()
    n_bad = con.execute(
        f"""
        SELECT count(*) FROM
          (SELECT url, markdown FROM parquet_scan('{out_root}/results/data/*/*.parquet')
           WHERE error IS NULL) r
        JOIN (SELECT url, markdown AS golden_md
              FROM parquet_scan('{GOLDENS_SMOKE}')) g USING (url)
        WHERE r.markdown IS DISTINCT FROM g.golden_md
        """).fetchone()[0]
    assert n_bad == 0


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_spark_submit_cdx_job(tmp_path):
    """The CDX index job runs via spark-submit --py-files with ONLY the
    zip on the python path, and its cluster.idx counts add up."""
    sys.path.insert(0, REPO_ROOT)
    from tools.make_dist import build

    zip_path = build(str(tmp_path / "pipeline.zip"))
    out_root = str(tmp_path / "cdx")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO_ROOT, "jobs", "cdxindex.py"),
         "--input", PAGES_SMOKE, "--output", out_root, "--shards", "3"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env, check=False)
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads([ln for ln in proc.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["index_records"] == stats["input_pages"] > 0
    with open(os.path.join(out_root, "cluster.idx")) as f:
        n_from_idx = sum(int(line.split("\t")[2]) for line in f)
    assert n_from_idx == stats["index_records"]
