"""Per-stage checkpointing with a JSON manifest: stage outputs are parquet
snapshots; the manifest records row counts, per-file (per-partition) lineage
counters, and wall time. A re-run skips every stage whose snapshot is
complete — mid-pipeline resume for free (the reference has no resume at all;
its staging DB is deleted at exit, src/input.rs temp-db lifecycle)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.manifest_path = os.path.join(workdir, "manifest.json")
        self.manifest: dict = {"stages": {}}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path, encoding="utf-8") as f:
                self.manifest = json.load(f)

    def _save(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self.manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def _stage_path(self, name: str) -> str:
        return os.path.join(self.workdir, f"stage_{name}.parquet")

    def is_complete(self, name: str) -> bool:
        path = self._stage_path(name)
        return (
            name in self.manifest["stages"]
            and os.path.exists(os.path.join(path, "_SUCCESS"))
        )

    def run_stage(self, name: str, build: "callable") -> DataFrame:
        """Run `build()` -> DataFrame, snapshot it, record lineage; or load
        the existing snapshot if this stage already completed."""
        path = self._stage_path(name)
        if self.is_complete(name):
            return self.spark.read.parquet(path)

        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # Per-partition lineage counters from the parquet FOOTERS of the files
        # just written — metadata-only driver-side reads (KBs per file), not a
        # second full scan of the snapshot (the old shape re-read the whole
        # stage output to groupBy input_file_name, doubling stage read I/O).
        lineage = self._footer_counts(path)
        self.manifest["stages"][name] = {
            "path": path,
            "rows": int(sum(lineage.values())),
            "n_partitions": len(lineage),
            "partition_rows": lineage,
            "wall_sec": round(time.time() - t0, 3),
            "resumed": False,
        }
        self._save()
        return out

    @staticmethod
    def _footer_counts(path: str) -> dict[str, int]:
        import pyarrow.parquet as pq

        counts: dict[str, int] = {}
        for fn in sorted(os.listdir(path)):
            if fn.startswith(("_", ".")) or not fn.endswith(".parquet"):
                continue
            counts[fn] = pq.read_metadata(os.path.join(path, fn)).num_rows
        return counts

    def stage_metrics(self) -> dict:
        return self.manifest["stages"]
