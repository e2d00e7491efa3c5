"""TableIO — snapshot reads + checkpointed results writes.

Iceberg semantics behind a thin seam (SURVEY §7.0): this sandbox has no
Iceberg runtime jar, so the default backend is partitioned Parquet plus a
JSON manifest providing the three Iceberg behaviors the engine relies on:

  * snapshot read        -> read a parquet dir (immutable by convention)
  * MERGE results        -> append parquet + manifest keyed by
                            (run_id, partition_id, check_id); readers
                            dedupe on the newest write
  * resume from checkpoint -> completed (run_id, partition_id) keys listed
                            in the manifest; the suite anti-joins them out

Swap `IcebergTableIO` in (same API) when a catalog is available; the plan
shape does not change.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetTableIO:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self.manifest_path = os.path.join(base_dir, "manifest.json")

    # -- snapshots ----------------------------------------------------------
    def read_snapshot(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    # -- manifest -----------------------------------------------------------
    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"writes": []}

    def _save_manifest(self, m: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)

    # -- results ------------------------------------------------------------
    def completed_partitions(self, run_id: str) -> set[int]:
        m = self._load_manifest()
        return {
            w["partition_id"]
            for w in m["writes"]
            if w["run_id"] == run_id and w.get("complete", False)
        }

    def write_results(
        self,
        run_id: str,
        verdicts: DataFrame,
        violations: DataFrame | None,
        partition_ids: list[int] | None = None,
    ) -> None:
        """MERGE-equivalent: append a new parquet fileset, then commit the
        manifest entry (write-then-commit gives crash atomicity: an append
        without a manifest entry is invisible to readers)."""
        batch = uuid.uuid4().hex[:12]
        vdir = os.path.join(self.base_dir, "verdicts", f"run={run_id}", f"batch={batch}")
        verdicts.withColumn("run_id", F.lit(run_id)).withColumn(
            "written_at", F.current_timestamp()
        ).write.mode("overwrite").parquet(vdir)
        if violations is not None:
            xdir = os.path.join(self.base_dir, "violations", f"run={run_id}", f"batch={batch}")
            violations.withColumn("run_id", F.lit(run_id)).withColumn(
                "written_at", F.current_timestamp()
            ).write.mode("overwrite").parquet(xdir)
        m = self._load_manifest()
        pids = partition_ids if partition_ids is not None else []
        for pid in pids:
            m["writes"].append(
                {
                    "run_id": run_id,
                    "partition_id": int(pid),
                    "batch": batch,
                    "ts": time.time(),
                    "complete": True,
                }
            )
        if not pids:
            m["writes"].append(
                {"run_id": run_id, "partition_id": -1, "batch": batch, "ts": time.time(), "complete": True}
            )
        self._save_manifest(m)

    def read_verdicts(self, spark: SparkSession, run_id: str) -> DataFrame:
        path = os.path.join(self.base_dir, "verdicts", f"run={run_id}")
        df = spark.read.parquet(path)
        # MERGE semantics on read: newest write per (partition_id, check_id)
        from pyspark.sql.window import Window

        w = Window.partitionBy("partition_id", "check_id").orderBy(F.col("written_at").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )

    def read_violations(self, spark: SparkSession, run_id: str) -> DataFrame:
        path = os.path.join(self.base_dir, "violations", f"run={run_id}")
        return spark.read.parquet(path)
