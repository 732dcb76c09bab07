"""Small-file compaction for parquet table directories — the maintenance
job that keeps 100 TB scans healthy. Incremental pipelines (per-batch
appends, streaming sinks, per-stage checkpoints) accrete files far smaller
than a scan-efficient split: every file costs a task, a footer read, and an
open/close round trip, so a table with 10^6 x 1 MB files scans an order of
magnitude slower than the same bytes in 10^4 x 100 MB files. This is the
OPTIMIZE/rewrite-data-files loop of an Iceberg/Delta deployment expressed
on plain parquet directories.

Design:
- target file count = ceil(total_bytes / target_bytes), derived from the
  directory's ACTUAL byte size (never row counts — row width varies);
- coalesce(), not repartition(): compaction must not pay a shuffle; it only
  concatenates existing partitions into fewer write tasks. The trade-off is
  documented: coalesce cannot SPLIT oversized files — growing a too-few-file
  table needs the shuffle, so `allow_shuffle=True` opts into repartition();
- write-then-swap: the rewrite lands in `<dir>.__compact__`, and only after
  the new _SUCCESS exists does it replace the original (os.replace of a
  sibling rename — a crashed compaction leaves the original intact, the
  resume-safety property the checkpoint manifest relies on);
- row-count validated before the swap: a compaction that changes the row
  count is aborted, original untouched.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _dir_parquet_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def parquet_file_count(path: str) -> int:
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    allow_shuffle: bool = False,
) -> dict:
    """Rewrite `path` (a parquet directory) into ceil(bytes/target) files.
    Returns {files_before, files_after, bytes, rows} metrics. No-op (and no
    rewrite) when the directory already has <= target file count."""
    files_before = parquet_file_count(path)
    total = _dir_parquet_bytes(path)
    want = max(1, math.ceil(total / target_bytes))
    if files_before <= want:
        df = spark.read.parquet(path)
        return {
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total,
            "rows": df.count(),
            "rewritten": False,
        }
    df = spark.read.parquet(path)
    rows_before = df.count()
    sized = df.repartition(want) if allow_shuffle else df.coalesce(want)
    tmp = path.rstrip("/") + ".__compact__"
    shutil.rmtree(tmp, ignore_errors=True)
    sized.write.mode("overwrite").parquet(tmp)
    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows_before or not os.path.exists(
        os.path.join(tmp, "_SUCCESS")
    ):
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction aborted: rows {rows_before} -> {rows_after}; "
            f"original left untouched at {path}"
        )
    old = path.rstrip("/") + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": files_before,
        "files_after": parquet_file_count(path),
        "bytes": total,
        "rows": rows_after,
        "rewritten": True,
    }
