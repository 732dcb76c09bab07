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
from pyspark.sql import functions as F


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
        # per-partition lineage counters from the files actually written
        per_file = (
            out.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        lineage = {os.path.basename(r["file"]): r["count"] for r in per_file}
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

    def stage_metrics(self) -> dict:
        return self.manifest["stages"]
