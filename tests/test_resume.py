"""Checkpoint/resume: interrupted runs skip committed partitions and the
final results table is identical (SURVEY §5.2 item 5).

Completion is derived from the committed verdicts table itself (distinct
partition_id anti-join) — the manifest is only a batch commit marker."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from ssimulacra2_spark.plans.suite import ValidationSuite
from ssimulacra2_spark.sources.tableio import ParquetTableIO


def test_resume_skips_completed(spark, synth_tables, tmp_path):
    t = synth_tables
    ref = t["ref"].drop("partition_id")
    cand = t["cand"].drop("partition_id")
    cfg = replace(t["cfg"], commit_batches=1)
    suite = ValidationSuite(cfg)

    io = ParquetTableIO(str(tmp_path / "results"))
    suite.run(spark, ref, cand, io=io, run_id="full")
    full = {
        (r.partition_id, r.check_id): (r.passed, r.n_violations)
        for r in io.read_verdicts(spark, "full").collect()
    }
    all_pids = sorted(io.completed_partition_set(spark, "full"))
    assert len(all_pids) == cfg.n_buckets

    # simulate an interrupted run: only half the partitions committed
    io2 = ParquetTableIO(str(tmp_path / "results2"))
    k = len(all_pids) // 2
    suite2 = ValidationSuite(cfg)
    done_subset = all_pids[:k]
    keep = F.col("partition_id").isin([int(p) for p in done_subset])
    from ssimulacra2_spark.operators.checks import with_partition_id

    ref_done = with_partition_id(ref, cfg).filter(keep).drop("partition_id")
    cand_done = with_partition_id(cand, cfg).filter(keep).drop("partition_id")
    suite2.run(spark, ref_done, cand_done, io=io2, run_id="r")
    assert io2.completed_partition_set(spark, "r") == set(done_subset)

    # resume with the full inputs: only the remaining partitions compute
    verdicts2, _ = suite2.run(spark, ref, cand, io=io2, run_id="r")
    new_pids = {
        r.partition_id
        for r in verdicts2.filter(F.col("partition_id") >= 0)
        .select("partition_id")
        .distinct()
        .collect()
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


def test_batched_commits_preserve_completed_slices(spark, synth_tables, tmp_path, monkeypatch):
    """With commit_batches > 1, a crash mid-run preserves the batches
    already committed; resume computes only the missing partitions and the
    merged table equals a clean run."""
    t = synth_tables
    ref = t["ref"].drop("partition_id")
    cand = t["cand"].drop("partition_id")
    cfg = replace(t["cfg"], commit_batches=4)

    # clean single run for the expected result
    io_full = ParquetTableIO(str(tmp_path / "full"))
    ValidationSuite(cfg).run(spark, ref, cand, io=io_full, run_id="full")
    expected = {
        (r.partition_id, r.check_id): (r.passed, r.n_violations)
        for r in io_full.read_verdicts(spark, "full").collect()
    }
    assert len(io_full.committed_batches("full")) == 4

    # crash after 2 of 4 commits
    io = ParquetTableIO(str(tmp_path / "crashy"))
    orig = ParquetTableIO.write_results
    calls = {"n": 0}

    def crashing(self, run_id, verdicts, violations):
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return orig(self, run_id, verdicts, violations)

    monkeypatch.setattr(ParquetTableIO, "write_results", crashing)
    try:
        ValidationSuite(cfg).run(spark, ref, cand, io=io, run_id="r")
    except RuntimeError:
        pass
    monkeypatch.setattr(ParquetTableIO, "write_results", orig)
    committed_mid = io.completed_partition_set(spark, "r")
    assert 0 < len(committed_mid) < cfg.n_buckets

    # resume: remaining slices compute; committed partitions are skipped
    verdicts2, _ = ValidationSuite(cfg).run(spark, ref, cand, io=io, run_id="r")
    recomputed = {
        r.partition_id
        for r in verdicts2.filter(F.col("partition_id") >= 0)
        .select("partition_id")
        .distinct()
        .collect()
    }
    assert recomputed.isdisjoint(committed_mid)

    merged = {
        (r.partition_id, r.check_id): (r.passed, r.n_violations)
        for r in io.read_verdicts(spark, "r").collect()
        if r.partition_id >= 0
    }
    assert merged == {k: v for k, v in expected.items() if k[0] >= 0}


def test_compaction_bounds_read_filesets(spark, tmp_path):
    """MERGE-on-read cost must not grow with commit count: with
    compact_every=2, ten commits leave a current read touching at most 2
    filesets (latest compacted snapshot + tail), newest-wins resolution
    stays exact, and as_of time travel over the raw commit log is
    unaffected by compactions."""
    io = ParquetTableIO(str(tmp_path / "cmp"), compact_every=2)
    from ssimulacra2_spark.operators.checks import VERDICT_SCHEMA

    for i in range(10):
        # partition i gets a fresh verdict each commit; partition 0 is
        # rewritten every time (newest-wins must keep only commit 9's row)
        rows = [(0, "chk", i % 2 == 0, i, None), (i + 1, "chk", True, 0, None)]
        io.write_results("r", spark.createDataFrame(rows, schema=VERDICT_SCHEMA), None)

    batches = io.committed_batches("r")
    assert len(batches) == 10
    assert len(io._verdict_paths("r", as_of=None)) <= 2

    got = {
        r.partition_id: (r.passed, r.n_violations)
        for r in io.read_verdicts(spark, "r").collect()
    }
    assert got[0] == (False, 9)  # newest write wins through compactions
    assert set(got) == set(range(12)) - {11}

    # time travel: the view as of commit 4 is exactly commits 0..4
    snap = {
        r.partition_id: r.n_violations
        for r in io.read_verdicts(spark, "r", as_of=batches[4]).collect()
    }
    assert snap[0] == 4 and set(snap) == {0, 1, 2, 3, 4, 5}

    # empty-path handling: fresh run ids give typed empty frames
    assert io.read_verdicts(spark, "nope").count() == 0
    assert io.read_violations(spark, "r").count() == 0

    # explicit double-compact with no new commits is an idempotent no-op
    # (must NOT overwrite the snapshot its own read plan scans)
    io.compact(spark, "r")
    io.compact(spark, "r")
    again = {
        r.partition_id: (r.passed, r.n_violations)
        for r in io.read_verdicts(spark, "r").collect()
    }
    assert again == got


def test_manifest_stats_skip_filesets(spark, tmp_path):
    """Iceberg manifest file-skipping analog: commit-time min/max stats on
    (partition_id, check_id) let a selective read prune whole filesets —
    after 10 commits over disjoint partition ranges, reading one partition
    opens at most 2 filesets (here: exactly the 1 containing it), and
    pruning never changes newest-wins resolution for the wanted keys."""
    from ssimulacra2_spark.operators.checks import VERDICT_SCHEMA

    io = ParquetTableIO(str(tmp_path / "skip"), compact_every=0)
    for i in range(10):
        # commit i covers partitions [10*i, 10*i+9]; partition 5 is also
        # rewritten by commit 1 (newest-wins must survive pruning; commit
        # 1's stats widen to [5, 19] — still disjoint from the probe below)
        rows = [(10 * i + j, "chk", True, i, None) for j in range(10)]
        if i == 1:
            rows.append((5, "chk", False, 99, None))
        io.write_results("r", spark.createDataFrame(rows, schema=VERDICT_SCHEMA), None)

    assert len(io.committed_batches("r")) == 10
    # stats were recorded at commit time for every batch
    m = io._load_manifest()
    assert all(c.get("stats", {}).get("partition_id") for c in m["commits"])

    # selective read: only the fileset whose range covers the key is opened
    assert len(io._verdict_paths("r", None, {"partition_id": (35, 35)})) == 1
    assert len(io._verdict_paths("r", None)) == 10  # non-selective unchanged
    got = {
        r.partition_id: r.n_violations
        for r in io.read_verdicts(spark, "r", partition_range=(35, 35)).collect()
    }
    assert got == {35: 3}

    # pruning keeps EVERY fileset that may hold the wanted key: partition 5
    # lives in commits 0 and 1, so both are read and commit 1 wins
    assert len(io._verdict_paths("r", None, {"partition_id": (5, 5)})) == 2
    got5 = {
        r.partition_id: (r.passed, r.n_violations)
        for r in io.read_verdicts(spark, "r", partition_range=(5, 5)).collect()
    }
    assert got5 == {5: (False, 99)}

    # compaction records stats too and a selective read after it opens
    # snapshot only (tail is empty)
    io.compact(spark, "r")
    assert len(io._verdict_paths("r", None, {"partition_id": (35, 35)})) == 1


def test_snapshot_time_travel(spark, synth_tables, tmp_path):
    """as_of pins reads to a past commit: the snapshot view equals what a
    reader saw at that commit, regardless of later appends."""
    import pytest

    t = synth_tables
    ref = t["ref"].drop("partition_id")
    cand = t["cand"].drop("partition_id")
    cfg = replace(t["cfg"], commit_batches=2)
    io = ParquetTableIO(str(tmp_path / "tt"))
    ValidationSuite(cfg).run(spark, ref, cand, io=io, run_id="r")
    batches = io.committed_batches("r")
    assert len(batches) == 2
    snap0 = {
        (r.partition_id, r.check_id)
        for r in io.read_verdicts(spark, "r", as_of=batches[0]).collect()
    }
    full = {
        (r.partition_id, r.check_id)
        for r in io.read_verdicts(spark, "r").collect()
    }
    assert snap0 < full  # strictly fewer partitions visible at snapshot 0
    # pinned partitions are exactly slice 0 of the pid space (plus schema)
    pids0 = {p for p, _ in snap0 if p >= 0}
    assert pids0 and all(p % 2 == 0 for p in pids0)
    with pytest.raises(KeyError):
        io.committed_batches("r", as_of="nonexistent")


def test_resume_across_pre_commit_seq_filesets(spark, tmp_path):
    """Schema evolution on resume: a run can mix filesets written before
    the commit_seq column existed with new ones. Plain spark.read.parquet
    infers the schema from a single file, so whether that read crashed
    (UNRESOLVED_COLUMN) or silently nulled depended on path order;
    read_verdicts must instead merge schemas, backfill commit_seq for the
    old fileset, and resolve newest-wins with old rows losing to any
    sequenced commit (nulls_last)."""
    import shutil

    from ssimulacra2_spark.operators.checks import VERDICT_SCHEMA

    io = ParquetTableIO(str(tmp_path / "mix"), compact_every=0)
    io.write_results(
        "r",
        spark.createDataFrame(
            [(0, "chk", True, 0, None), (1, "chk", True, 0, None)],
            schema=VERDICT_SCHEMA,
        ),
        None,
    )
    # emulate a pre-upgrade fileset: rewrite batch 0 without commit_seq
    old_dir = io._verdict_paths("r", None)[0]
    stripped = str(tmp_path / "stripped")
    spark.read.parquet(old_dir).drop("commit_seq").write.parquet(stripped)
    shutil.rmtree(old_dir)
    shutil.move(stripped, old_dir)
    assert "commit_seq" not in spark.read.parquet(old_dir).columns

    # new engine commits a batch rewriting partition 0
    io.write_results(
        "r",
        spark.createDataFrame([(0, "chk", False, 7, None)], schema=VERDICT_SCHEMA),
        None,
    )
    got = {
        r.partition_id: (r.passed, r.n_violations)
        for r in io.read_verdicts(spark, "r").collect()
    }
    assert got == {0: (False, 7), 1: (True, 0)}

    # the all-old-filesets path also reads cleanly (backfilled column)
    v0 = io.read_verdicts(spark, "r", as_of=io.committed_batches("r")[0])
    assert "commit_seq" in v0.columns
    assert {r.partition_id for r in v0.collect()} == {0, 1}
