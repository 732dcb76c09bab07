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
  the new _SUCCESS exists does it replace the original via two sibling
  renames. A crash anywhere up to the first rename leaves the original
  untouched; a crash in the narrow window between the two renames strands
  the original at `<dir>.__old__`, which the next invocation detects and
  restores before doing anything else — so the table is never lost, at
  worst one rename behind;
- row-count validated before the swap: a compaction that changes the row
  count is aborted, original untouched.
"""

from __future__ import annotations

import math
import os
import shutil

import pyarrow.parquet as pq
from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _parquet_files(path: str) -> list[str]:
    """Top-level data files; a Hive-partitioned layout (parquet under
    key=*/ subdirs) is rejected explicitly — compacting it correctly means
    per-partition rewrites, which this flat-directory tool does not do."""
    files, nested = [], []
    for f in os.listdir(path):
        full = os.path.join(path, f)
        if f.endswith(".parquet") and os.path.isfile(full):
            files.append(full)
        elif os.path.isdir(full) and not f.startswith((".", "_")):
            nested.append(f)
    if nested:
        # raised for ANY nested data dirs, even alongside top-level files
        # (a mixed layout): byte/row accounting below covers only top-level
        # files, so letting a mixed layout through would surface as a
        # confusing row-count-mismatch abort instead of this clear boundary
        raise NotImplementedError(
            f"{path} looks Hive-partitioned ({nested[:3]}...); compact each "
            "partition directory individually"
        )
    return files


def _dir_parquet_bytes(path: str) -> int:
    return sum(os.path.getsize(f) for f in _parquet_files(path))


def _footer_rows(path: str) -> int:
    """Row count from parquet footers only — the no-op branch must not pay
    a data scan on every maintenance cycle."""
    return sum(pq.ParquetFile(f).metadata.num_rows for f in _parquet_files(path))


def parquet_file_count(path: str) -> int:
    return len(_parquet_files(path))


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    allow_shuffle: bool = False,
) -> dict:
    """Rewrite `path` (a parquet directory) into ceil(bytes/target) files.
    Returns {files_before, files_after, bytes, rows} metrics. No-op (and no
    rewrite) when the file count already matches the target: exactly-at for
    the shuffle path, at-or-below for the default shrink-only path
    (coalesce cannot split oversized files; allow_shuffle=True opts into
    repartition(), which rewrites in BOTH directions). A previous crash
    between the two swap renames is recovered on entry from the
    `<path>.__old__` sibling."""
    old = path.rstrip("/") + ".__old__"
    if not os.path.exists(path) and os.path.exists(old):
        os.replace(old, path)  # recover the pre-crash original
    elif os.path.exists(old):
        # path exists AND .__old__ exists: a previous run crashed in the
        # post-swap window (after the new table landed, before the old copy
        # was removed). The live table is the newer one; reap the stale
        # duplicate so it cannot leak disk forever — without this, only the
        # rewrite path (line below the no-op return) ever cleaned it up.
        shutil.rmtree(old, ignore_errors=True)
    files_before = parquet_file_count(path)
    total = _dir_parquet_bytes(path)
    want = max(1, math.ceil(total / target_bytes))
    needs = files_before > want or (allow_shuffle and files_before != want)
    if not needs:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total,
            "rows": _footer_rows(path),
            "rewritten": False,
        }
    df = spark.read.parquet(path)
    rows_before = _footer_rows(path)
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
