"""Checkpoint/resume: interrupted runs skip completed partitions and the
final results table is identical (SURVEY §5.2 item 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssimulacra2_spark.plans.suite import ValidationSuite
from ssimulacra2_spark.sources.tableio import ParquetTableIO


def test_resume_skips_completed(spark, synth_tables, tmp_path):
    t = synth_tables
    ref = t["ref"].drop("partition_id")
    cand = t["cand"].drop("partition_id")
    suite = ValidationSuite(t["cfg"])

    io = ParquetTableIO(str(tmp_path / "results"))
    suite.run(spark, ref, cand, io=io, run_id="full")
    full = {
        (r.partition_id, r.check_id): (r.passed, r.n_violations)
        for r in io.read_verdicts(spark, "full").collect()
    }
    all_pids = sorted(io.completed_partitions("full"))
    assert len(all_pids) == t["cfg"].n_buckets

    # simulate an interrupted run: only half the partitions committed
    io2 = ParquetTableIO(str(tmp_path / "results2"))
    k = len(all_pids) // 2
    suite2 = ValidationSuite(t["cfg"])
    done_subset = all_pids[:k]
    keep = F.col("partition_id").isin([int(p) for p in done_subset])
    from ssimulacra2_spark.operators.checks import with_partition_id

    ref_done = with_partition_id(ref, t["cfg"]).filter(keep).drop("partition_id")
    cand_done = with_partition_id(cand, t["cfg"]).filter(keep).drop("partition_id")
    suite2.run(spark, ref_done, cand_done, io=io2, run_id="r")
    assert set(io2.completed_partitions("r")) == set(done_subset)

    # resume with the full inputs: only the remaining partitions compute
    verdicts2, _ = suite2.run(spark, ref, cand, io=io2, run_id="r")
    new_pids = {
        r.partition_id for r in verdicts2.filter(F.col("partition_id") >= 0).select("partition_id").distinct().collect()
    }
    assert new_pids == set(all_pids[k:])

    # merged results equal the uninterrupted run (per-partition checks)
    merged = {
        (r.partition_id, r.check_id): (r.passed, r.n_violations)
        for r in io2.read_verdicts(spark, "r").collect()
        if r.partition_id >= 0
    }
    full_pp = {k2: v for k2, v in full.items() if k2[0] >= 0}
    assert merged == full_pp
