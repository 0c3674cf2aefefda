"""Stage checkpointing: each pipeline stage can persist its output as
Parquet and later runs resume by reading the materialized stage instead of
recomputing (north_rule: checkpoint-resumable at stage boundaries).  This
replaces the reference's Redis memo caches (reference
claimskg/util/sparql/sparql_offset_fetcher.py:55-74) with idempotent,
cluster-wide stage artifacts.
"""

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: Optional[str]):
        self.spark = spark
        self.base_dir = base_dir
        self.events = []  # (stage, action, wall_s, path)

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def materialize(self, name: str, df: DataFrame) -> DataFrame:
        """Write-once stage boundary: skip the write when a complete
        checkpoint already exists (resume), else write and re-read so
        downstream stages scan Parquet instead of recomputing lineage."""
        if not self.base_dir:
            return df
        path = self._path(name)
        t0 = time.time()
        if self._done(name):
            self.events.append((name, "resume", 0.0, path))
            return self.spark.read.parquet(path)
        df.write.mode("overwrite").parquet(path)
        self.events.append((name, "write", time.time() - t0, path))
        return self.spark.read.parquet(path)

    def write_manifest(self) -> None:
        if not self.base_dir:
            return
        manifest = [
            {"stage": s, "action": a, "wall_s": round(w, 3), "path": p}
            for s, a, w, p in self.events
        ]
        os.makedirs(self.base_dir, exist_ok=True)
        with open(os.path.join(self.base_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
