"""Semantic properties of the round-5c web-pipeline operators (webops.py)
beyond oracle parity: the Bloom guard's no-false-negative guarantee,
sampling determinism and bounds, leakage-pair containment, segment
accounting, and a numpy cross-check of SemDeDup."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_bloom_guard_has_no_false_negatives(spark, queries):
    """Every document the EXACT contamination check flags must be flagged
    by the Bloom guard, with at least as many shingle hits — the defining
    Bloom-filter guarantee (false positives allowed, negatives never)."""
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in queries["contamination_ngram"](spark, SF).collect()
    }
    bloom = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in queries["bloom_membership_guard"](spark, SF).collect()
    }
    assert exact, "exact contamination check returned no rows on the fixture"
    for doc_id, n_overlap in exact.items():
        assert doc_id in bloom, f"doc {doc_id} flagged exactly but missed by bloom"
        assert bloom[doc_id] >= n_overlap, doc_id


def test_domain_mix_sample_bounds_and_determinism(spark, queries):
    rows1 = {r["source"]: r for r in queries["domain_mix_sample"](spark, SF).collect()}
    rows2 = {r["source"]: r for r in queries["domain_mix_sample"](spark, SF).collect()}
    assert rows1.keys() == rows2.keys() and len(rows1) == 20
    for src, r in rows1.items():
        assert 0.0 <= r["sample_rate"] <= 1.0
        assert 0 <= r["n_kept"] <= r["n_docs"]
        # deterministic hash -> bit-identical re-run
        assert rows2[src]["n_kept"] == r["n_kept"]
    # the target mixture is non-uniform (weights 1 + src_num % 4) over
    # uniform counts, so rates must actually differ across sources
    assert len({r["sample_rate"] for r in rows1.values()}) > 1


def test_split_leakage_pairs_are_lsh_candidates(spark, queries):
    leaks = queries["split_leakage_guard"](spark, SF).collect()
    assert leaks, "fixture corpus should have cross-split near-dup candidates"
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in queries["dedup_minhash_lsh"](spark, SF).collect()
    }
    for r in leaks:
        assert (r["doc_a"], r["doc_b"]) in pairs
        assert r["split_a"] != r["split_b"]
        assert {r["split_a"], r["split_b"]} == {"train", "test"}


def test_boilerplate_segment_accounting(spark, queries):
    from pyspark.sql import functions as F

    out = queries["boilerplate_segments"](spark, SF).collect()
    assert out
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' +'), t -> t <> '')")).alias("n_tok"),
    )
    ntok = {r["doc_id"]: r["n_tok"] for r in docs.collect()}
    flagged_any = False
    for r in out:
        assert r["n_segments"] == ntok[r["doc_id"]] // 8
        assert 0 <= r["n_boilerplate"] <= r["n_segments"]
        assert r["tokens_kept"] == 8 * (r["n_segments"] - r["n_boilerplate"])
        flagged_any = flagged_any or r["n_boilerplate"] > 0
    assert flagged_any, "fixture corpus should contain repeated segments"


def test_dedup_semantic_matches_numpy_bruteforce(spark, queries):
    """Within-cell cosine near-dups recomputed with numpy over the same
    centroid literals — an independent third implementation (the DuckDB
    oracle shares the SQL shape; this one shares nothing)."""
    from ssimulacra2_spark.registry.ivf import CENTROIDS
    from ssimulacra2_spark.registry.webops import _SEM_TAU

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    E = np.array([r["embedding"] for r in emb], dtype=np.float64)
    C = np.array(CENTROIDS, dtype=np.float64)
    # same argmin-by-(||c||^2 - 2<x,c>) assignment, ties to lower index
    d = (C * C).sum(axis=1)[None, :] - 2.0 * (E @ C.T)
    cell = d.argmin(axis=1)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cos = np.round(5.0123e-8 + En @ En.T, 6)  # r6 incl. the EPS6 nudge
    expected = {}
    order = np.argsort(ids)
    for ii in order:
        for jj in order:
            if ids[ii] < ids[jj] and cell[ii] == cell[jj] and cos[ii, jj] >= _SEM_TAU:
                cur = expected.get(ids[jj])
                if cur is None:
                    expected[ids[jj]] = [ids[ii], cos[ii, jj]]
                else:
                    cur[0] = min(cur[0], ids[ii])
                    cur[1] = max(cur[1], cos[ii, jj])
    got = {
        r["vec_dup"]: (r["keeper"], r["max_cosine"])
        for r in queries["dedup_semantic"](spark, SF).collect()
    }
    assert expected, "fixture embeddings should contain same-cell pairs above tau"
    assert set(got) == set(expected)
    for k, (keeper, mc) in got.items():
        assert keeper == expected[k][0], k
        assert abs(mc - expected[k][1]) <= 2e-6, k


def test_quality_quantile_filter_threshold_is_quartile(spark, queries):
    out = {r["lang"]: r for r in queries["quality_quantile_filter"](spark, SF).collect()}
    assert len(out) == 5  # 4 langs + 'und'-free synthetic set uses 5 langs
    for lang, r in out.items():
        assert r["n_total"] == r["n_kept"] + r["n_dropped"]
        # by definition of a 25th percentile, at most ~25% can fall below
        assert r["n_dropped"] <= r["n_total"] * 0.25 + 1
        assert r["n_kept"] >= r["n_total"] * 0.5


def test_perplexity_proxy_properties(spark, queries):
    """Every log-prob is negative (probabilities < 1), n_bigrams matches
    token count - 1, and a doc of frequent bigrams outscores the corpus
    minimum (the LM orders documents, which is all the filter needs)."""
    from pyspark.sql import functions as F

    out = {r["doc_id"]: r for r in queries["perplexity_proxy"](spark, SF).collect()}
    assert out
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' +'), t -> t <> '')")).alias("n_tok"),
    )
    ntok = {r["doc_id"]: r["n_tok"] for r in docs.collect()}
    for doc_id, r in out.items():
        assert r["n_bigrams"] == ntok[doc_id] - 1
        assert r["avg_logp"] < 0.0
    scores = [r["avg_logp"] for r in out.values()]
    assert max(scores) > min(scores)  # the LM actually discriminates


def test_ft_hash_classifier_is_projection_scored(spark, queries):
    out = queries["ft_hash_classifier"](spark, SF).collect()
    assert out
    for r in out:
        assert 0.0 < r["score"] < 1.0
        assert r["pred"] == (r["score"] >= 0.5)
    # frozen weights -> deterministic re-run
    again = {r["doc_id"]: r["score"] for r in queries["ft_hash_classifier"](spark, SF).collect()}
    for r in out:
        assert again[r["doc_id"]] == r["score"]


def test_corpus_rollup_totals_are_consistent(spark, queries):
    rows = queries["corpus_rollup"](spark, SF).collect()
    total = [r for r in rows if r["source"] is None and r["lang"] is None]
    per_source = [r for r in rows if r["source"] is not None and r["lang"] is None]
    leaves = [r for r in rows if r["source"] is not None and r["lang"] is not None]
    assert len(total) == 1
    assert total[0]["n_docs"] == sum(r["n_docs"] for r in per_source) == sum(
        r["n_docs"] for r in leaves
    )
    assert total[0]["n_tokens"] == sum(r["n_tokens"] for r in per_source)
