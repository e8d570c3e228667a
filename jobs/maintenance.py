"""Retention maintenance job: the reference's cleanup sweep as a standalone
CLI (S7, SURVEY.md §2.1).

The reference deletes temp output files older than
``TEMP_FILES_RETENTION_HOURS`` and counts deletions
(``cleanup_old_temp_files``, /root/reference/app/main.py:301-343; window at
:213,312) — and runs that sweep inline on the convert path (:491), which
SURVEY.md §4.1 rejects: maintenance must never ride the extraction hot path.
This job is the separated equivalent over the table store:

1. expired granules = lineage rows ``completed`` before the cutoff
   (partition ``completed_at`` is the table analog of file mtime);
2. ``DELETE WHERE partition_id IN (expired)`` on results AND rejects
   (snapshot rewrite in the sandbox shim; ``DELETE FROM ... WHERE`` /
   ``MERGE`` on real Iceberg);
3. lineage rows for expired granules removed (S10 delete per granule);
4. ``expire_snapshots``: physically drop data directories no longer
   referenced by any published manifest commit (rewrites leave them
   behind; Iceberg's expire_snapshots is the cluster equivalent).

Usage::

    python -m jobs.maintenance --output /path/to/job_output \
        [--retention-hours 24] [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession

from document_converter_api_spark.sources.tableio import (
    LineageStore, ManifestTable,
)

DEFAULT_RETENTION_HOURS = 24.0  # reference default, app/main.py:213


def retention_sweep(spark: SparkSession, output_root: str,
                    retention_hours: float = DEFAULT_RETENTION_HOURS,
                    now: float | None = None,
                    dry_run: bool = False) -> dict:
    """Run the sweep; returns the reference-shaped counters (deleted /
    failed, plus expired granule ids and snapshot dirs reclaimed)."""
    lineage = LineageStore(os.path.join(output_root, "_lineage",
                                        "lineage.json"))
    cutoff = (now if now is not None else time.time()) \
        - retention_hours * 3600.0
    expired = sorted(
        pid for pid, row in lineage.load().items()
        if row.get("status") == "completed"
        and row.get("completed_at") is not None
        and row["completed_at"] < cutoff)

    stats = {"expired_partitions": expired, "deleted_rows": 0,
             "deleted_reject_rows": 0, "lineage_deleted": 0,
             "snapshot_dirs_removed": 0, "dry_run": dry_run}
    if dry_run or not expired:
        return stats

    id_list = ", ".join(str(p) for p in expired)
    predicate = f"partition_id IN ({id_list})"
    for name, field in (("results", "deleted_rows"),
                        ("rejects", "deleted_reject_rows")):
        table = ManifestTable(os.path.join(output_root, name))
        if not table.is_empty():
            stats[field] = table.delete_where(spark, predicate)
        stats["snapshot_dirs_removed"] += table.expire_snapshots()
    for pid in expired:
        if lineage.delete(pid):
            stats["lineage_deleted"] += 1
    return stats


def main() -> None:  # pragma: no cover - CLI
    ap = argparse.ArgumentParser(description="retention maintenance sweep")
    ap.add_argument("--output", required=True,
                    help="extraction job output root")
    ap.add_argument("--retention-hours", type=float,
                    default=DEFAULT_RETENTION_HOURS)
    ap.add_argument("--dry-run", action="store_true",
                    help="report expired granules without deleting")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    args = ap.parse_args()
    spark = (SparkSession.builder.master(f"local[{args.cores}]")
             .appName("webtext-maintenance")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    stats = retention_sweep(spark, args.output,
                            retention_hours=args.retention_hours,
                            dry_run=args.dry_run)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
