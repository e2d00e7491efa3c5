"""Property tests for the round-5b pipeline operators (pipelineops.py):
crafted-fixture invariants that the sf-scale DuckDB contract check can't
express (determinism, entropy extremes, winnowing copy-equality, packing
conservation)."""

from __future__ import annotations

import pytest

from ssimulacra2_spark.registry import QUERIES


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    """Crafted documents table: entropy extremes, exact copies, a unique
    keyword, controlled token counts for packing."""
    rows = [
        # (doc_id, text, lang, source)
        (0, " ".join(["alpha"] * 40), "en", "srcA"),          # zero entropy
        (1, " ".join(f"w{i}" for i in range(32)), "en", "srcA"),  # uniform: ent = ln(32)
        (2, "zebra the and of", "en", "srcA"),  # corpus-unique kw, tf=1 each
        (3, "the and of extra words here now", "en", "srcA"),
        (4, "copy cat one two three four five six seven eight", "de", "srcB"),
        (5, "copy cat one two three four five six seven eight", "de", "srcB"),  # exact dup of 4
        (6, " ".join(["loop bit hop rep"] * 8), "de", "srcB"),  # periodic: 1 shingle class per offset
        # third doc containing the stopwords so df(the) > df(zebra)
        (7, " ".join(f"t{i}" for i in range(100)) + " the and of", "fr", "srcB"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path_factory.mktemp("pipedocs"))
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_stratified_sample_deterministic(spark):
    sf = "/root/testdata/sf0.001"
    a = _rows(QUERIES["stratified_sample"](spark, sf), "lang", "n_sampled", "first_doc", "last_doc")
    b = _rows(QUERIES["stratified_sample"](spark, sf), "lang", "n_sampled", "first_doc", "last_doc")
    assert a == b  # hash-derived, not RNG-state-dependent
    by_lang = {r[0]: r for r in a}
    if "es" in by_lang:  # threshold 'zz' = keep everything
        lang, n_s, first, last = by_lang["es"]
        full = {r["lang"]: r for r in QUERIES["stratified_sample"](spark, sf).collect()}
        assert full["es"]["n_sampled"] == full["es"]["n_total"]


def test_token_entropy_extremes(spark, doc_dir):
    out = {r["doc_id"]: r for r in QUERIES["token_entropy"](spark, doc_dir).collect()}
    assert out[0]["ent_nats"] == pytest.approx(0.0, abs=1e-6)
    assert out[0]["n_distinct"] == 1 and out[0]["ent_norm"] == pytest.approx(0.0)
    import math

    assert out[1]["ent_nats"] == pytest.approx(math.log(32), abs=1e-5)
    assert out[1]["ent_norm"] == pytest.approx(1.0, abs=1e-5)
    for r in out.values():
        assert -1e-9 <= r["ent_norm"] <= 1 + 1e-6


def test_tfidf_unique_keyword_wins(spark, doc_dir):
    out = QUERIES["tfidf_topk"](spark, doc_dir).collect()
    top1 = {r["doc_id"]: r["term"] for r in out if r["rk"] == 1}
    # doc 2: all terms tf=1, but 'zebra' is corpus-unique (df=1) while
    # the/and/of appear in three docs — idf must decide the ranking
    assert top1[2] == "zebra"
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["rk"])
    for ranks in per_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_winnowing_copy_equality_and_periodicity(spark, doc_dir):
    out = {r["doc_id"]: r for r in QUERIES["winnowing_fingerprint"](spark, doc_dir).collect()}
    # exact duplicate docs -> identical fingerprint summaries
    assert (out[4]["n_fp"], out[4]["fp_min"], out[4]["fp_max"]) == (
        out[5]["n_fp"],
        out[5]["fp_min"],
        out[5]["fp_max"],
    )
    # a purely periodic doc has only 4 distinct shingles -> at most 4 fps
    assert out[6]["n_fp"] <= 4
    # constant doc: every shingle identical -> exactly one fingerprint
    assert out[0]["n_fp"] == 1 and out[0]["fp_min"] == out[0]["fp_max"]


def test_quality_gate_reason_bits(spark, doc_dir):
    out = {r["doc_id"]: r for r in QUERIES["quality_gate"](spark, doc_dir).collect()}
    # doc 0 = one token repeated 40x: distinct_frac = 1/40 -> bit 8 fails
    assert out[0]["reason_mask"] & 8
    assert not out[0]["keep_doc"]
    # doc 7 = 100 unique tokens + stopwords: every gate passes
    assert out[7]["reason_mask"] == 0 and out[7]["keep_doc"]
    for r in out.values():
        assert r["keep_doc"] == (r["reason_mask"] == 0)


def test_dedup_apply_consistent_with_clusters(spark):
    sf = "/root/testdata/sf0.001"
    survivors = {r["doc_id"] for r in QUERIES["dedup_apply"](spark, sf).collect()}
    labels = QUERIES["dedup_clusters_star"](spark, sf).collect()
    clustered_keepers = {r["doc_id"] for r in labels if r["is_keeper"]}
    clustered_all = {r["doc_id"] for r in labels}
    from ssimulacra2_spark.registry._util import load

    all_docs = {r["doc_id"] for r in load(spark, sf, "documents").select("doc_id").collect()}
    # survivors = keepers of clustered docs + every unclustered doc
    assert survivors == clustered_keepers | (all_docs - clustered_all)


def test_emb_project_rp_distance_preservation(spark):
    """JL property on the real fixture: projected pairwise squared
    distances track the exact ones within the ~1/sqrt(k) band for most
    pairs (loose gate — k=8 is aggressive compression)."""
    sf = "/root/testdata/sf0.001"
    import numpy as np

    from ssimulacra2_spark.registry._util import load

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in load(spark, sf, "embeddings").where("vec_id < 40").collect()
    }
    proj = {
        r["vec_id"]: np.array([r[f"p{k}"] for k in range(8)])
        for r in QUERIES["emb_project_rp"](spark, sf).where("vec_id < 40").collect()
    }
    ratios = []
    ids = sorted(emb)
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d_true = float(np.sum((emb[a] - emb[b]) ** 2))
        d_proj = float(np.sum((proj[a] - proj[b]) ** 2))
        if d_true > 1e-12:
            ratios.append(d_proj / d_true)
    ratios = np.array(ratios)
    # unbiased in expectation; the median must sit near 1 and most mass
    # inside a wide JL band for k=8
    assert 0.5 < float(np.median(ratios)) < 2.0
    assert float(np.mean((ratios > 0.2) & (ratios < 5.0))) >= 0.8


def test_text_normalize_idempotent_key(spark, doc_dir):
    out1 = {r["doc_id"]: r["norm_md5"] for r in QUERIES["text_normalize"](spark, doc_dir).collect()}
    # docs 4 and 5 are byte-identical -> identical normal-form keys
    assert out1[4] == out1[5]
    # deterministic across runs
    out2 = {r["doc_id"]: r["norm_md5"] for r in QUERIES["text_normalize"](spark, doc_dir).collect()}
    assert out1 == out2


def test_dedup_incremental_flags_known_dups(spark):
    """Every odd doc whose text exactly equals some even doc must be
    flagged (identical text -> identical signature -> every band hits)."""
    sf = "/root/testdata/sf0.001"
    from ssimulacra2_spark.registry._util import load

    docs = {r["doc_id"]: r["text"] for r in load(spark, sf, "documents").collect()}
    hist_texts = {t for d, t in docs.items() if d % 2 == 0}
    out = {r["doc_id"]: r for r in QUERIES["dedup_incremental"](spark, sf).collect()}
    for d, t in docs.items():
        if d % 2 == 1 and t in hist_texts:
            assert out[d]["is_dup"], d
    for r in out.values():
        assert r["is_dup"] == (r["n_bands_hit"] > 0)


def test_pack_sequences_conservation(spark, doc_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{doc_dir}/documents.parquet")
    total = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.filter(F.split("text", " +"), lambda t: t != ""))).alias("t"))
        .collect()
    }
    out = QUERIES["pack_sequences"](spark, doc_dir).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r["source"], []).append(r)
    for src, shards in per_src.items():
        # token conservation across shards
        assert sum(r["n_tokens"] for r in shards) == total[src]
        # all docs here are << CAP, so shard ids are contiguous from 0
        ids = sorted(r["shard_id"] for r in shards)
        assert ids == list(range(len(ids)))
        for r in shards:
            assert 0 <= r["n_crossing"] <= r["n_docs"]


def test_pack_sequences_chunked_equals_single_window(spark, doc_dir):
    """The r06 chunked two-phase prefix scan must reproduce the
    single-window form exactly (VERDICT r05 #1): same (source, shard_id)
    manifest, bit-identical counts. The single-window reference is built
    inline here — it must never ship in the engine path."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ssimulacra2_spark.registry.pipelineops import _PACK_CAP, _tokens_spark

    docs = spark.read.parquet(f"{doc_dir}/documents.parquet")
    sized = docs.select(
        "doc_id", "source", F.size(_tokens_spark(F.col("text"))).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = (
        sized.withColumn("start_off", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("shard_id", F.floor(F.col("start_off") / _PACK_CAP))
        .withColumn(
            "crosses",
            F.when(
                (F.col("n_tok") > 0)
                & (
                    F.floor((F.col("start_off") + F.col("n_tok") - 1) / _PACK_CAP)
                    > F.col("shard_id")
                ),
                1,
            ).otherwise(0),
        )
        .groupBy("source", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("crosses").alias("n_crossing"),
        )
    )
    key = lambda r: (r["source"], r["shard_id"])
    got = sorted(QUERIES["pack_sequences"](spark, doc_dir).collect(), key=key)
    want = sorted(ref.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
