"""TableIO — snapshot reads + checkpointed results writes.

Iceberg semantics behind a thin seam (SURVEY §7.0): this sandbox has no
Iceberg runtime jar, so the default backend is partitioned Parquet plus a
tiny JSON manifest providing the three Iceberg behaviors the engine
relies on:

  * snapshot read        -> read a parquet dir (immutable by convention)
  * MERGE results        -> append parquet per commit batch; the manifest
                            entry is ONLY a commit marker (an append
                            without a marker is invisible to readers —
                            write-then-commit crash atomicity, like an
                            Iceberg snapshot commit)
  * resume from checkpoint -> completed partitions are derived from the
                            COMMITTED VERDICTS TABLE ITSELF (distinct
                            partition_id scan + anti-join in the suite).
                            Nothing driver-side is O(partitions): the
                            manifest holds one entry per commit batch, not
                            per partition, so a 10^6-partition run still
                            carries a ~KB manifest.

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

    # -- manifest (batch-level commit markers only) --------------------------
    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"commits": []}

    def _save_manifest(self, m: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)

    def committed_batches(self, run_id: str, as_of: str | None = None) -> list[str]:
        """Commit markers for a run, in commit order. `as_of` pins the view
        to the table state as of that batch id (Iceberg snapshot-id/time
        travel: a snapshot = the prefix of the commit log up to a marker)."""
        m = self._load_manifest()
        batches = [c["batch"] for c in m.get("commits", []) if c["run_id"] == run_id]
        if as_of is not None:
            if as_of not in batches:
                raise KeyError(f"unknown snapshot {as_of!r} for run {run_id!r}")
            batches = batches[: batches.index(as_of) + 1]
        return batches

    # -- results ------------------------------------------------------------
    def completed_partitions(self, spark: SparkSession, run_id: str) -> DataFrame | None:
        """Distinct partition ids already verdicted for this run, as a
        DataFrame (the suite anti-joins it against the inputs — no
        driver-side partition list, per the 10^12-row design point).
        Derived from the committed verdicts table, not from any manifest
        bookkeeping. None if nothing is committed yet."""
        batches = self.committed_batches(run_id)
        if not batches:
            return None
        v = self._read_batches(spark, "verdicts", run_id, batches)
        return v.filter(F.col("partition_id") >= 0).select("partition_id").distinct()

    def completed_partition_set(self, spark: SparkSession, run_id: str) -> set[int]:
        """Test/driver convenience (collects — never call in an engine path)."""
        df = self.completed_partitions(spark, run_id)
        if df is None:
            return set()
        return {r.partition_id for r in df.collect()}

    def write_results(
        self,
        run_id: str,
        verdicts: DataFrame,
        violations: DataFrame | None,
    ) -> str:
        """MERGE-equivalent: append a new parquet fileset, then commit ONE
        manifest marker for the batch (write-then-commit gives crash
        atomicity: an append without a marker is invisible to readers)."""
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
        m.setdefault("commits", []).append(
            {"run_id": run_id, "batch": batch, "ts": time.time()}
        )
        self._save_manifest(m)
        return batch

    def _read_batches(
        self, spark: SparkSession, kind: str, run_id: str, batches: list[str]
    ) -> DataFrame:
        paths = [
            os.path.join(self.base_dir, kind, f"run={run_id}", f"batch={b}")
            for b in batches
        ]
        paths = [p for p in paths if os.path.exists(p)]
        return spark.read.parquet(*paths)

    def read_verdicts(
        self, spark: SparkSession, run_id: str, as_of: str | None = None
    ) -> DataFrame:
        """Committed batches only (uncommitted appends are invisible);
        MERGE semantics on read: newest write per (partition_id, check_id).
        `as_of` pins to a past snapshot (batch id) — time travel."""
        df = self._read_batches(
            spark, "verdicts", run_id, self.committed_batches(run_id, as_of)
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("partition_id", "check_id").orderBy(F.col("written_at").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )

    def read_violations(
        self, spark: SparkSession, run_id: str, as_of: str | None = None
    ) -> DataFrame:
        return self._read_batches(
            spark, "violations", run_id, self.committed_batches(run_id, as_of)
        )
