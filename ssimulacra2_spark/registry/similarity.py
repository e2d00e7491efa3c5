"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k as the correctness baseline, plus a
random-hyperplane LSH-bucketed variant as the scale path. Hyperplanes are
seeded driver-side constants embedded as literals in both engines.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import load, load_spread

QUERIES = {}
ORACLES = {}

_DIM = 64
_N_PLANES = 6
_TOP_K = 10
_N_QUERIES = 5

_rng = random.Random(1234)
HYPERPLANES = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(_DIM)] for _ in range(_N_PLANES)
]

_DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
_NORM_SPARK = "aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"

_DOT_DUCK = "list_sum([CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) for z in list_zip({a}, {b})])"
_NORM_DUCK = "list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in {a}])"


@(lambda fn: (QUERIES.__setitem__("ann_bruteforce_topk", fn), fn)[1])
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the first _N_QUERIES vectors against the
    whole table. Scale path: queries are broadcast (tiny side), candidates
    stream through; the rank<=k filter triggers Catalyst's
    WindowGroupLimit pushdown, so the physical plan is already two-phase —
    a MAP-SIDE per-scan-partition top-k before the exchange, then an exact
    re-rank of the <=k*P survivors per query (PLANS.md shows the plan:
    WindowGroupLimit -> Exchange -> WindowGroupLimit -> Window). No
    single-reducer global sort at 100 TB, and no hand-rolled extra
    shuffle."""
    emb = load_spread(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce"))
    j = F.broadcast(q).crossJoin(c).filter(F.col("q_id") != F.col("c_id"))
    dot = F.expr(_DOT_SPARK.format(a="qe", b="ce"))
    cos = dot / (F.sqrt(F.expr(_NORM_SPARK.format(a="qe"))) * F.sqrt(F.expr(_NORM_SPARK.format(a="ce"))))
    from ._util import r6
    scored = j.select("q_id", "c_id", r6(cos).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "c_id", "cosine", "rank")
    )


ORACLES["ann_bruteforce_topk"] = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings),
scored AS (
  SELECT q_id, c_id,
    ROUND({_DOT_DUCK.format(a="qe", b="ce")}
      / (SQRT({_NORM_DUCK.format(a="qe")}) * SQRT({_NORM_DUCK.format(a="ce")})), 6) AS cosine
  FROM q CROSS JOIN c WHERE q_id <> c_id
)
SELECT q_id, c_id, cosine, rank FROM (
  SELECT q_id, c_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


def _plane_literal_spark(p: list[float]) -> str:
    return "array(" + ", ".join(repr(x) + "D" for x in p) + ")"


def _plane_literal_duck(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]"


@(lambda fn: (QUERIES.__setitem__("ann_lsh_bucketed", fn), fn)[1])
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: sign bit of the dot product with
    each of _N_PLANES seeded hyperplanes -> bucket id; bucket occupancy is
    the output. Scale path: bucketing is a pure projection (no shuffle until
    the per-bucket groupBy, whose keys are near-uniform by construction);
    ANN then joins query buckets to candidate buckets only."""
    emb = load_spread(spark, sf_dir, "embeddings")
    bucket = None
    for i, p in enumerate(HYPERPLANES):
        dot = F.expr(_DOT_SPARK.format(a="embedding", b=_plane_literal_spark(p)))
        bit = F.when(dot > 0.0, F.lit(1)).otherwise(F.lit(0)) * (1 << i)
        bucket = bit if bucket is None else bucket + bit
    return (
        emb.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


ORACLES["ann_lsh_bucketed"] = (
    "SELECT bucket, COUNT(*) AS n_vectors FROM (SELECT "
    + " + ".join(
        f"(CASE WHEN {_DOT_DUCK.format(a='embedding', b=_plane_literal_duck(p))} > 0.0 "
        f"THEN 1 ELSE 0 END) * {1 << i}"
        for i, p in enumerate(HYPERPLANES)
    )
    + " AS bucket FROM embeddings) GROUP BY bucket"
)


# --------------------------------------------------------------------------
# LSH retrieval: query -> multi-probe buckets -> candidate join -> top-k
# --------------------------------------------------------------------------


def _bucket_expr(dialect: str, col: str) -> str:
    dot = _DOT_SPARK if dialect == "spark" else _DOT_DUCK
    lit = _plane_literal_spark if dialect == "spark" else _plane_literal_duck
    return " + ".join(
        f"(CASE WHEN {dot.format(a=col, b=lit(p))} > 0.0 THEN 1 ELSE 0 END) * {1 << i}"
        for i, p in enumerate(HYPERPLANES)
    )


def _lsh_topk_ctes(dialect: str) -> str:
    """Shared CTE chain: bucket candidates, multi-probe query buckets
    (exact + Hamming <= 2, 22 probes), join within buckets, cosine-score,
    rank."""
    dot = _DOT_SPARK if dialect == "spark" else _DOT_DUCK
    norm = _NORM_SPARK if dialect == "spark" else _NORM_DUCK
    # multi-probe at Hamming distance <= 2: 1 + 6 + 15 = 22 of the 64
    # buckets (~34% of candidates) — measured mean recall@10 ~0.5 on the
    # isotropic synthetic embeddings vs ~0.2 at Hamming <= 1 (random
    # vectors are LSH's worst case; clustered real corpora do far better)
    flips = [0] + [1 << i for i in range(_N_PLANES)] + [
        (1 << i) | (1 << j)
        for i in range(_N_PLANES)
        for j in range(i + 1, _N_PLANES)
    ]
    if dialect == "spark":
        flip_src = f"(SELECT explode(array({', '.join(map(str, flips))})) AS flip)"
        xor = "(qbucket ^ flip)"
    else:
        flip_src = f"(SELECT unnest([{', '.join(map(str, flips))}]) AS flip)"
        xor = "xor(qbucket, flip)"
    return f"""
cb AS (SELECT vec_id AS c_id, embedding AS ce, {_bucket_expr(dialect, "embedding")} AS bucket
       FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qe, {_bucket_expr(dialect, "embedding")} AS qbucket
      FROM embeddings WHERE vec_id < {_N_QUERIES}),
probes AS (SELECT q_id, qe, {xor} AS bucket FROM q CROSS JOIN {flip_src} f),
scored AS (
  SELECT q_id, c_id,
    ROUND({dot.format(a="qe", b="ce")}
      / (SQRT({norm.format(a="qe")}) * SQRT({norm.format(a="ce")})), 6) AS cosine
  FROM probes JOIN cb ON probes.bucket = cb.bucket
  WHERE c_id <> q_id
),
lsh_ranked AS (
  SELECT q_id, c_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
  FROM scored
)"""


def _lsh_topk_sql(dialect: str) -> str:
    return f"""
WITH {_lsh_topk_ctes(dialect)}
SELECT q_id, c_id, cosine, rank FROM lsh_ranked WHERE rank <= {_TOP_K}
"""


def _lsh_recall_sql(dialect: str) -> str:
    """recall@k of the LSH retrieval vs exact brute force, per query."""
    dot = _DOT_SPARK if dialect == "spark" else _DOT_DUCK
    norm = _NORM_SPARK if dialect == "spark" else _NORM_DUCK
    return f"""
WITH {_lsh_topk_ctes(dialect)},
bf_scored AS (
  SELECT q.q_id, c.vec_id AS c_id,
    ROUND({dot.format(a="qe", b="c.embedding")}
      / (SQRT({norm.format(a="qe")}) * SQRT({norm.format(a="c.embedding")})), 6) AS cosine
  FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.q_id
),
bf_ranked AS (
  SELECT q_id, c_id,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
  FROM bf_scored
),
hits AS (
  SELECT b.q_id, CASE WHEN l.c_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM (SELECT * FROM bf_ranked WHERE rank <= {_TOP_K}) b
  LEFT JOIN (SELECT * FROM lsh_ranked WHERE rank <= {_TOP_K}) l
    ON b.q_id = l.q_id AND b.c_id = l.c_id
)
SELECT q_id, ROUND(CAST(SUM(hit) AS DOUBLE) / {_TOP_K}, 6) AS recall_at_k
FROM hits GROUP BY q_id
"""


QUERIES["ann_lsh_topk"] = lambda spark, sf_dir: _run_shared(spark, sf_dir, _lsh_topk_sql("spark"))
QUERIES["ann_lsh_topk"].__doc__ = (
    "ANN retrieval via LSH buckets: query vectors hash to a bucket, "
    "multi-probe (all buckets at Hamming distance <= 2: 1+6+15 = 22 of "
    "the 64) widens recall, "
    "candidates join WITHIN buckets only, then per-query cosine top-k. "
    "Scale path: the candidate join shuffles on near-uniform bucket ids — "
    "never all-pairs; the per-query window ranks only the in-bucket "
    "survivors (~N/2^planes * probes rows per query). Reference analog of "
    "the scored fan-out returning ranked results: "
    "/root/reference/ssimulacra2_bin/src/video.rs:407-456,484-495."
)
ORACLES["ann_lsh_topk"] = _lsh_topk_sql("duck")

QUERIES["ann_lsh_recall"] = lambda spark, sf_dir: _run_shared(spark, sf_dir, _lsh_recall_sql("spark"))
QUERIES["ann_lsh_recall"].__doc__ = (
    "recall@k of ann_lsh_topk measured against the exact brute-force "
    "ranking, per query — the quality gate for the bucketed scale path. "
    "The brute-force arm exists only to score recall at demo scale; at "
    "100 TB one measures recall on a sampled query set the same way."
)
ORACLES["ann_lsh_recall"] = _lsh_recall_sql("duck")


def _run_shared(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    from ._util import shared_sql

    return shared_sql(spark, sf_dir, sql, ["embeddings"], spread=["embeddings"])


# --------------------------------------------------------------------------
# Embedding scalar quantization (int8) — ANN memory-footprint op
# --------------------------------------------------------------------------


def _quantize_sql(dialect: str) -> str:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5) (half-up — identical in both dialects,
    unlike ROUND tie rules). A pure projection — no shuffle, no Python —
    so at 100 TB it runs entirely inside the scan stage; the checked
    output is the compact per-vector summary (scale + q-vector moments),
    not the array itself."""
    if dialect == "spark":
        absmax = "aggregate(transform(embedding, x -> abs(CAST(x AS DOUBLE))), 0D, (a, v) -> greatest(a, v))"
        q = "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) / s + 0.5) AS INT))"
        qsum = "aggregate(q, 0, (a, v) -> a + v)"
        ql1 = "aggregate(q, 0, (a, v) -> a + abs(v))"
        qmax = "aggregate(q, -128, (a, v) -> greatest(a, v))"
    else:
        absmax = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        q = "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) / s + 0.5) AS INT))"
        qsum = "CAST(list_sum(q) AS INT)"
        ql1 = "CAST(list_sum(list_transform(q, v -> abs(v))) AS INT)"
        qmax = "CAST(list_max(q) AS INT)"
    return f"""
WITH scaled AS (
  SELECT vec_id, embedding,
         GREATEST({absmax} / 127.0, 1e-12) AS s
  FROM embeddings
),
quant AS (
  SELECT vec_id, s, {q} AS q FROM scaled
)
SELECT vec_id, ROUND(s, 6) AS scale,
       {qsum} AS q_sum, {ql1} AS q_l1, {qmax} AS q_max
FROM quant
"""


QUERIES["emb_quantize_int8"] = lambda spark, sf_dir: _run_shared(
    spark, sf_dir, _quantize_sql("spark")
)
QUERIES["emb_quantize_int8"].__doc__ = _quantize_sql.__doc__
ORACLES["emb_quantize_int8"] = _quantize_sql("duck")
