"""Fast in-pytest guard over the driver contract: a representative subset
of registry queries vs their DuckDB oracles at sf0.001 (the full sweep is
tools/check_contract.py; this keeps `pytest -x -q` self-sufficient)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from tools.check_contract import normalize  # noqa: E402

SUBSET = [
    "scan_parquet",
    "box_downsample_2x",
    "paired_zip_check",
    "windowed_moments",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "psi_ks_drift",
    "salted_two_phase_agg",
    "multimodal_decode_stub",
    "featurize_text",
    # round-3 additions / rewrites
    "asof_join_policy",
    "sessionize_gap",
    "multimodal_png_meta",
    "stream_session_counts",
    "ann_ivf_recall",
    # round-4 additions (ADVICE r03: order_unique_fused was in neither the
    # driver sweep window nor this subset — now in both)
    "order_unique_fused",
    "contamination_ngram",
    "multimodal_jpeg_meta",
    "multimodal_wav_meta",
    "tdigest_rank_check",
    "hll_error_check",
    "iir_impulse_check",
    "iir_biquad_impulse_check",
    "emb_drift_check",
    # round-5b pipeline ops (stratified_sample and token_entropy are
    # outside the r05 driver sweep window — this subset is their
    # recorded value-check alongside the judge sweep)
    "stratified_sample",
    "tfidf_topk",
    "token_entropy",
    "winnowing_fingerprint",
    "pack_sequences",
    "quality_gate",
    "dedup_apply",
    "dedup_incremental",
    "emb_project_rp",
    "text_normalize",
    # round-5c web-pipeline ops (webops.py) — outside the r05 driver
    # sweep window; this subset is their recorded value-check alongside
    # the judge sweep
    "bloom_membership_guard",
    "quality_quantile_filter",
    "boilerplate_segments",
    "dedup_semantic",
    "domain_mix_sample",
    "split_leakage_guard",
    "perplexity_proxy",
    "ft_hash_classifier",
    "corpus_rollup",
    # r06: word_pieces rewritten to regexp_extract_all (codegen) — the
    # oracle keeps the list_filter/regexp_split form, so this row pins the
    # two expressions equal
    "token_count",
]

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    from ssimulacra2_spark.tables import STAR_TABLES

    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).df()
    srows, scols = normalize(sdf)
    orows, ocols = normalize(odf)
    assert scols == ocols
    assert len(srows) == len(orows)
    assert srows == orows


def test_every_oracle_key_has_a_query():
    import __spark_entry__ as entrymod

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # rows-only checks are the documented exceptions only
    rows_only = set(qs) - set(os_)
    assert rows_only <= {"hll_tdigest_profile", "iir_smooth", "iir_smooth_biquad", "tdigest_quantiles"}
