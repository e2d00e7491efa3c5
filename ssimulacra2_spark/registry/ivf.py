"""IVF-style ANN: coarse quantizer (fixed seeded centroids) -> assign each
vector to its nearest cell -> search only within the query's cell.

The scale path for similarity search when random-hyperplane LSH recall is
insufficient: the assign step is a pure projection (argmin over a
broadcast centroid table), the per-cell search is a co-partitioned join —
at 100 TB the table is bucketed by cell id so the search never shuffles
candidates. Centroids here are seeded driver-side constants (a production
pipeline would train them with KMeans and broadcast the model); both
engines evaluate the identical literals, so the full pipeline gets a
DuckDB oracle.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import load, load_spread, r6

QUERIES = {}
ORACLES = {}

_DIM = 64
_N_CELLS = 8
_TOP_K = 5
_N_QUERIES = 5

_rng = random.Random(777)
CENTROIDS = [
    [round(_rng.gauss(0.0, 0.5), 6) for _ in range(_DIM)] for _ in range(_N_CELLS)
]

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
_DOT_DUCK = "list_sum([CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) for z in list_zip({a}, {b})])"
_NORM = "aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
_NORM_DUCK = "list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in {a}])"


def _lit_spark(vec: list[float]) -> str:
    return "array(" + ", ".join(repr(x) + "D" for x in vec) + ")"


def _lit_duck(vec: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in vec) + "]"


def _cell_expr(col: str, lit) -> str:
    """argmin over centroids by squared L2 distance, deterministic
    tie-break by centroid index (distances computed identically in both
    engines — same literals, same fold order).

    Struct-sort form (the round-5b PQ argmin lesson, pq.py:_code_expr):
    the centroid table is ONE array-of-structs literal and the argmin is
    sort-(d, i)-take-first — the earlier LEAST+CASE form duplicated each
    64-term distance ~3x (once under LEAST, twice per CASE arm), and
    Janino took ~13 s to compile it per session, measured
    scale-independent (ARCHITECTURE §7b). Identical assignment
    semantics: min distance, then min index."""
    spark_side = lit is _lit_spark
    entries = []
    for i, cvec in enumerate(CENTROIDS):
        # ||x - c||^2 = ||x||^2 - 2<x,c> + ||c||^2 ; ||x||^2 common -> drop
        c2 = sum(v * v for v in cvec)
        if spark_side:
            entries.append(
                f"named_struct('v', {_lit_spark(cvec)}, 'n', {c2!r}D, 'i', {i})"
            )
        else:
            entries.append(f"{{'v': {_lit_duck(cvec)}, 'n': {c2!r}, 'i': {i}}}")
    if spark_side:
        cents = "array(" + ", ".join(entries) + ")"
        d = f"s.n - 2.0D * {_DOT.format(a=col, b='s.v')}"
        return (
            f"element_at(array_sort(transform({cents},"
            f" s -> named_struct('d', {d}, 'i', s.i))), 1).i"
        )
    cents = "[" + ", ".join(entries) + "]"
    d = f"s.n - 2.0 * {_DOT_DUCK.format(a=col, b='s.v')}"
    return f"list_sort(list_transform({cents}, s -> {{'d': {d}, 'i': s.i}}))[1].i"


@(lambda fn: (QUERIES.__setitem__("ann_ivf_topk", fn), fn)[1])
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: assign all vectors to cells, then top-k by cosine only
    among same-cell candidates for the first _N_QUERIES vectors."""
    emb = load_spread(spark, sf_dir, "embeddings")
    cell = F.expr(_cell_expr("embedding", _lit_spark))
    assigned = emb.select("vec_id", "embedding", cell.alias("cell"))
    q = assigned.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"), "cell"
    )
    c = assigned.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce"), "cell")
    j = F.broadcast(q).join(c, "cell").filter(F.col("q_id") != F.col("c_id"))
    cos = F.expr(_DOT.format(a="qe", b="ce")) / (
        F.sqrt(F.expr(_NORM.format(a="qe"))) * F.sqrt(F.expr(_NORM.format(a="ce")))
    )
    scored = j.select("q_id", "cell", "c_id", r6(cos).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "cell", "c_id", "cosine", "rank")
    )


def _ivf_recall_sql(dialect: str) -> str:
    """recall@k of the IVF cell-restricted search vs exact brute force,
    per query — the quality gate for the cell-bucketed scale path (same
    shape as ann_lsh_recall; deterministic, so fully oracle-checkable).
    On the isotropic driver fixture a single-probe 8-cell IVF misses
    same-rank neighbors in other cells — the measured value is the
    honest operating point; clustered corpora (and multi-probe) raise it
    exactly as with LSH."""
    lit = _lit_spark if dialect == "spark" else _lit_duck
    dot = _DOT if dialect == "spark" else _DOT_DUCK
    norm = _NORM if dialect == "spark" else _NORM_DUCK
    return f"""
WITH assigned AS (
  SELECT vec_id, embedding, {_cell_expr("embedding", lit)} AS cell
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding AS qe, cell FROM assigned WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id AS c_id, embedding AS ce, cell FROM assigned),
ivf_ranked AS (
  SELECT q_id, c_id,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
  FROM (
    SELECT q_id, c_id,
      ROUND({dot.format(a="qe", b="ce")}
        / (SQRT({norm.format(a="qe")}) * SQRT({norm.format(a="ce")})), 6) AS cosine
    FROM q JOIN c USING (cell) WHERE q_id <> c_id
  )
),
bf_ranked AS (
  SELECT q_id, c_id,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
  FROM (
    SELECT q.q_id, e.vec_id AS c_id,
      ROUND({dot.format(a="qe", b="e.embedding")}
        / (SQRT({norm.format(a="qe")}) * SQRT({norm.format(a="e.embedding")})), 6) AS cosine
    FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id
  )
),
hits AS (
  SELECT b.q_id, CASE WHEN i.c_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM (SELECT * FROM bf_ranked WHERE rank <= {_TOP_K}) b
  LEFT JOIN (SELECT * FROM ivf_ranked WHERE rank <= {_TOP_K}) i
    ON b.q_id = i.q_id AND b.c_id = i.c_id
)
SELECT q_id, ROUND(CAST(SUM(hit) AS DOUBLE) / {_TOP_K}, 6) AS recall_at_k
FROM hits GROUP BY q_id
"""


def _run_shared(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    from ._util import shared_sql

    return shared_sql(spark, sf_dir, sql, ["embeddings"], spread=["embeddings"])


QUERIES["ann_ivf_recall"] = lambda spark, sf_dir: _run_shared(
    spark, sf_dir, _ivf_recall_sql("spark")
)
QUERIES["ann_ivf_recall"].__doc__ = _ivf_recall_sql.__doc__
ORACLES["ann_ivf_recall"] = _ivf_recall_sql("duck")


ORACLES["ann_ivf_topk"] = f"""
WITH assigned AS (
  SELECT vec_id, embedding, {_cell_expr("embedding", _lit_duck)} AS cell
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding AS qe, cell FROM assigned WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id AS c_id, embedding AS ce, cell FROM assigned),
scored AS (
  SELECT q_id, cell, c_id,
    ROUND({_DOT_DUCK.format(a="qe", b="ce")}
      / (SQRT({_NORM_DUCK.format(a="qe")}) * SQRT({_NORM_DUCK.format(a="ce")})), 6) AS cosine
  FROM q JOIN c USING (cell) WHERE q_id <> c_id
)
SELECT q_id, cell, c_id, cosine, rank FROM (
  SELECT q_id, cell, c_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


def _kmeans_sql(dialect: str) -> str:
    """One full Lloyd's k-means refinement round over the seeded IVF
    centroids: assign -> per-(cell, dim) mean -> re-assign against the
    refined centroids, reporting per-cell membership, how many vectors
    moved, and the refined centroid norm.

    Scale shape (the Spark plan this generates): the first assignment is
    a pure projection (argmin over literal centroids); the centroid
    update is a map-side-combinable AVG on the uniform (cell, dim) key —
    8 x 64 = 512 output rows regardless of corpus size; the re-assign
    joins the exploded vectors against that tiny table (AQE broadcasts
    it) and reduces on (vec_id, cell). No driver-side iteration state,
    no collect: exactly the per-iteration shape a 1000-executor KMeans
    uses, here unrolled once so DuckDB can replay it as the oracle
    (further rounds repeat the same two stages). Distances and means are
    rounded through the EPS6/ROUND(6) parity machinery before ranking so
    the argmin tie-breaks identically in both engines.
    Reference analog: iterative per-frame refinement loop,
    video.rs:484-495."""
    lit = _lit_spark if dialect == "spark" else _lit_duck
    if dialect == "spark":
        ex1 = "SELECT cell, posexplode(embedding) AS (dim, val) FROM a1"
        ex2 = "SELECT vec_id, posexplode(embedding) AS (dim, val) FROM embeddings"
    else:
        ex1 = (
            "SELECT cell, generate_subscripts(embedding, 1) - 1 AS dim, "
            "unnest(embedding) AS val FROM a1"
        )
        ex2 = (
            "SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim, "
            "unnest(embedding) AS val FROM embeddings"
        )
    return f"""
WITH a1 AS (
  SELECT vec_id, embedding, {_cell_expr("embedding", lit)} AS cell FROM embeddings
),
d1 AS (
  SELECT cell, dim, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS mu
  FROM ({ex1}) ex GROUP BY cell, dim
),
ev AS ({ex2}),
dist2 AS (
  SELECT ev.vec_id, d1.cell,
         ROUND(SUM((CAST(ev.val AS DOUBLE) - d1.mu)
                   * (CAST(ev.val AS DOUBLE) - d1.mu)), 6) AS dist
  FROM ev JOIN d1 ON d1.dim = ev.dim
  GROUP BY ev.vec_id, d1.cell
),
a2 AS (
  SELECT vec_id, cell AS cell2 FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM dist2
  ) r WHERE rn = 1
),
moved AS (
  SELECT a2.cell2 AS cell, COUNT(*) AS n_vecs,
         SUM(CASE WHEN a1.cell <> a2.cell2 THEN 1 ELSE 0 END) AS n_moved
  FROM a2 JOIN a1 ON a1.vec_id = a2.vec_id
  GROUP BY a2.cell2
),
norms AS (
  SELECT cell, ROUND(SQRT(SUM(mu * mu)), 6) AS centroid_norm FROM d1 GROUP BY cell
)
SELECT m.cell, CAST(m.n_vecs AS BIGINT) AS n_vecs,
       CAST(m.n_moved AS BIGINT) AS n_moved, n.centroid_norm
FROM moved m JOIN norms n ON n.cell = m.cell
"""


from ._util import shared_sql as _shared_sql

QUERIES["kmeans_refine"] = lambda spark, sf_dir: _shared_sql(
    spark, sf_dir, _kmeans_sql("spark"), ["embeddings"], spread=["embeddings"]
)
QUERIES["kmeans_refine"].__doc__ = _kmeans_sql.__doc__
ORACLES["kmeans_refine"] = _kmeans_sql("duck")
