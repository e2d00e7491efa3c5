"""Engine output must equal the single-node pandas oracle exactly
(counts/keys) and to 1e-9 relative (float scores) — SURVEY §5.2."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ssimulacra2_spark import oracle
from ssimulacra2_spark.operators import checks as C
from ssimulacra2_spark.operators.drift import drift_score_check
from ssimulacra2_spark.plans.suite import ValidationSuite


def _viol_keys(violations, check_id):
    rows = violations.filter(F.col("check_id") == check_id).collect()
    return {(r.conv_id, r.turn_idx) for r in rows}


@pytest.fixture(scope="module")
def suite_out(spark, synth_tables):
    t = synth_tables
    suite = ValidationSuite(t["cfg"])
    verdicts, violations = suite.run(spark, t["ref"].drop("partition_id"), t["cand"].drop("partition_id"))
    return verdicts.cache(), violations.cache()


def test_uniqueness_matches_oracle(suite_out, synth_tables):
    _, violations = suite_out
    got = _viol_keys(violations, "uniqueness")
    want = oracle.uniqueness_violations(synth_tables["res"].cand)
    assert got == want
    injected = set(synth_tables["res"].injections["duplicate_key"])
    assert injected <= want


def test_monotone_matches_oracle(suite_out, synth_tables):
    _, violations = suite_out
    got = _viol_keys(violations, "monotone_ts")
    want = oracle.monotone_violations(synth_tables["res"].cand)
    assert got == want
    assert set(synth_tables["res"].injections["ts_swap"]) <= want


def test_vocab_matches_oracle(suite_out, synth_tables):
    _, violations = suite_out
    res = synth_tables["res"]
    cfg = synth_tables["cfg"]
    got_role = _viol_keys(violations, "vocab_role")
    want_role = oracle.vocab_violations(res.cand, "role", cfg.roles, nullable=False)
    assert got_role == want_role
    assert set(res.injections["unknown_role"]) <= want_role

    got_tool = _viol_keys(violations, "vocab_tool")
    want_tool = oracle.vocab_violations(res.cand, "tool", cfg.tools, nullable=True)
    assert got_tool == want_tool
    assert set(res.injections["unknown_tool"]) <= want_tool


def test_text_parity_matches_oracle(suite_out, synth_tables):
    _, violations = suite_out
    res = synth_tables["res"]
    rows = violations.filter(F.col("check_id") == "text_parity").collect()
    got = {(r.conv_id, r.turn_idx): r["class"] for r in rows}
    want = oracle.text_parity_classes(res.ref, res.cand)
    assert got == want
    for k in res.injections["drop_turn"]:
        assert want.get(k) == "missing"
    for k in res.injections["add_turn"]:
        assert want.get(k) == "added"
    for k in res.injections["text_mutate"] + res.injections["text_null"]:
        if k not in res.injections["drop_turn"]:
            assert want.get(k) == "mismatch", k


def test_row_parity_counts(suite_out, synth_tables):
    verdicts, _ = suite_out
    res = synth_tables["res"]
    pof = synth_tables["partition_of"]
    ref_counts = res.ref.assign(pid=res.ref.conv_id.map(pof)).groupby("pid").size()
    cand_counts = res.cand.assign(pid=res.cand.conv_id.map(pof)).groupby("pid").size()
    rows = verdicts.filter(F.col("check_id") == "row_parity").collect()
    for r in rows:
        want = abs(int(ref_counts.get(r.partition_id, 0)) - int(cand_counts.get(r.partition_id, 0)))
        assert r.n_violations == want
        assert r.passed == (want == 0)


@pytest.mark.parametrize("impl", ["window", "arrow"])
def test_drift_scores_match_oracle(spark, synth_tables, impl):
    """Both drift implementations (pure-window and Arrow-kernel) must match
    the pandas oracle to 1e-9 relative."""
    from ssimulacra2_spark.operators.drift_arrow import drift_score_check_arrow

    t = synth_tables
    cfg = t["cfg"]
    ref_p = C.prepare(t["ref"].drop("partition_id"), cfg)
    cand_p = C.prepare(t["cand"].drop("partition_id"), cfg)
    parts = C.partition_counts(ref_p)
    fn = drift_score_check_arrow if impl == "arrow" else drift_score_check
    out = fn(ref_p, cand_p, parts, cfg)
    got = {r.partition_id: r.score for r in out.verdicts.collect()}
    want = oracle.drift_scores(t["res"].ref, t["res"].cand, cfg, t["partition_of"])
    assert set(got) == set(want)
    for pid, s in want.items():
        assert math.isclose(got[pid], s, rel_tol=1e-9), (pid, got[pid], s)


def test_emb_drift_matches_oracle(spark, synth_tables):
    """Embedding-centroid drift cosines must match the numpy oracle to
    1e-9 relative, and ref-vs-ref must pass everywhere."""
    from ssimulacra2_spark.operators.drift import emb_drift_check

    t = synth_tables
    cfg = t["cfg"]
    ref_p = C.prepare(t["ref"].drop("partition_id"), cfg)
    cand_p = C.prepare(t["cand"].drop("partition_id"), cfg)
    parts = C.partition_counts(ref_p)
    out = emb_drift_check(ref_p, cand_p, parts, cfg)
    got = {r.partition_id: (r.score, r.passed) for r in out.verdicts.collect()}
    want = oracle.emb_drift_cosines(t["res"].ref, t["res"].cand, cfg, t["partition_of"])
    assert set(got) == set(want)
    for pid, cos in want.items():
        assert math.isclose(got[pid][0], cos, rel_tol=1e-9), (pid, got[pid], cos)
        assert got[pid][1] == (cos >= cfg.emb_drift_min_cos)
    clean = emb_drift_check(ref_p, ref_p, parts, cfg).verdicts.collect()
    assert all(r.passed for r in clean)
    # negative case: gut the text on one side -> centroids diverge and the
    # check FIRES (guards against a threshold that can never fail)
    import pyspark.sql.functions as F2

    broken = C.prepare(
        t["cand"].drop("partition_id").withColumn("text", F2.lit("x")), cfg
    )
    fired = emb_drift_check(ref_p, broken, parts, cfg).verdicts.collect()
    assert any(not r.passed for r in fired)


def test_psi_emb_fused_matches_standalone(spark, synth_tables):
    """The fused single-scan psi_ks+emb_drift branch must reproduce both
    standalone checks: identical verdicts, scores equal to 1e-9 (the only
    permitted difference is f64 partial-sum order)."""
    from ssimulacra2_spark.operators.drift import (
        emb_drift_check,
        psi_emb_fused_check,
        psi_ks_check,
    )

    t = synth_tables
    cfg = t["cfg"]
    ref_p = C.prepare(t["ref"].drop("partition_id"), cfg)
    cand_p = C.prepare(t["cand"].drop("partition_id"), cfg)
    parts = C.partition_counts(ref_p)
    fused = {
        (r.partition_id, r.check_id): (r.score, r.passed)
        for r in psi_emb_fused_check(ref_p, cand_p, parts, cfg).verdicts.collect()
    }
    sa = {
        (r.partition_id, r.check_id): (r.score, r.passed)
        for out in (
            psi_ks_check(ref_p, cand_p, parts, cfg),
            emb_drift_check(ref_p, cand_p, parts, cfg),
        )
        for r in out.verdicts.collect()
    }
    assert set(fused) == set(sa)
    for k, (score, passed) in sa.items():
        assert fused[k][1] == passed, k
        if score is None:
            assert fused[k][0] is None, k
        else:
            assert math.isclose(fused[k][0], score, rel_tol=1e-9, abs_tol=1e-12), (
                k, fused[k][0], score,
            )


def test_drifted_partitions_score_lower(spark, synth_tables):
    t = synth_tables
    want = oracle.drift_scores(t["res"].ref, t["res"].cand, t["cfg"], t["partition_of"])
    drift_pids = {t["partition_of"][c] for c in t["drift_convs"]}
    clean_pids = set(want) - drift_pids
    assert clean_pids and drift_pids
    mean_clean = sum(want[p] for p in clean_pids) / len(clean_pids)
    mean_drift = sum(want[p] for p in drift_pids) / len(drift_pids)
    assert mean_drift < mean_clean, (want, drift_pids)


def test_clean_pair_is_all_pass(spark, synth_tables):
    """The per-row invariant holds on the clean pair: ref vs ref has no
    violations anywhere and drift score is exactly 100."""
    t = synth_tables
    suite = ValidationSuite(t["cfg"])
    ref = t["ref"].drop("partition_id")
    verdicts, violations = suite.run(spark, ref, ref)
    assert violations.count() == 0
    # min_rows is a volume guard, not a pair invariant — a tiny partition
    # may legitimately trip it on clean data
    bad = verdicts.filter(~F.col("passed") & (F.col("check_id") != "min_rows")).collect()
    assert bad == []
    for r in verdicts.filter(F.col("check_id") == "drift_score").collect():
        assert r.score == 100.0
