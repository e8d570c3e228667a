"""ManifestTable semantics: append/replace commits, S7 retention delete
(snapshot rewrite), atomic manifest state.

S7 maps the reference's temp-file retention sweep
(/root/reference/app/main.py:301-343) onto a DELETE-WHERE snapshot rewrite
over the Iceberg-style manifest table (SURVEY.md §2.1 S7).
"""

from __future__ import annotations

import os

from pyspark.sql import Row

from document_converter_api_spark.sources.tableio import ManifestTable


def _mk_table(spark, root: str) -> ManifestTable:
    t = ManifestTable(root)
    t.replace_group(spark.createDataFrame(
        [Row(url=f"u{i}", age_hours=i) for i in range(10)]), "g0")
    t.replace_group(spark.createDataFrame(
        [Row(url=f"v{i}", age_hours=20 + i) for i in range(10)]), "g1")
    return t


def test_delete_where_rewrites_matching_commits_only(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "tbl"))
    before = {k: v for k, v in t.commits().items()}
    snap_before = t._load()["snapshot_id"]

    deleted = t.delete_where(spark, "age_hours >= 24")

    assert deleted == 6  # v4..v9 have age 24..29
    rows = {r["url"]: r["age_hours"] for r in t.read(spark).collect()}
    assert len(rows) == 14
    assert all(age < 24 for age in rows.values())
    after = t.commits()
    assert after["g0"] == before["g0"], "untouched commit must not rewrite"
    assert after["g1"] != before["g1"], "matching commit must be rewritten"
    assert t._load()["snapshot_id"] == snap_before + 1


def test_delete_where_no_match_is_noop_commitwise(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "tbl2"))
    before = dict(t.commits())
    assert t.delete_where(spark, "age_hours > 999") == 0
    assert t.commits() == before
    assert t.read(spark).count() == 20


def test_replace_group_is_idempotent(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl3"))
    df = spark.createDataFrame([Row(url="a", n=1), Row(url="b", n=2)])
    t.replace_group(df, "g0")
    t.replace_group(df, "g0")  # rerun of the same commit group (resume path)
    assert t.read(spark).count() == 2
