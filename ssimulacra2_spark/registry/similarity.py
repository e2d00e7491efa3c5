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

from ._util import load

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
    stream through; per-query top-k is a windowed rank — at 100 TB replace
    the global window with a per-partition top-k + re-rank of the k*P
    survivors (no single-partition sort)."""
    emb = load(spark, sf_dir, "embeddings")
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
    emb = load(spark, sf_dir, "embeddings")
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
