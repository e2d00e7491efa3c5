"""Product-quantization ANN: split each 64-dim embedding into 32
two-dim subvectors, encode each against a shared 16-entry codebook
(argmin, pure projection — 4 bits/subvector, 32x compression), then
search in two stages: an asymmetric-distance (ADC) scan over the codes
builds a per-query shortlist, and only the shortlist is re-ranked by
exact distance. This is the production PQ pattern: the expensive scan
touches 8-byte codes instead of 256-byte vectors, and exact distances
are computed for shortlist x queries rows only.

The codebook is a fixed pretrained constant: Lloyd's k-means (25
rounds, seed 778) on a 2-dim sample of the isotropic embedding
distribution — production pipelines likewise ship codebooks trained
offline (the distributed shape of that training round is kmeans_refine
in registry/ivf.py). Because every 2-dim subspace of an isotropic
corpus is identically distributed, ONE shared codebook serves all 32
subspaces, which keeps the encode expression linear and lets the
reconstruction be a single transform over the codes array. Both
engines evaluate identical literals, so encode + shortlist + re-rank
gets a full DuckDB oracle (same strategy as ivf.py). Measured on the
driver fixture: shortlist 50 -> recall@5 = 0.97 vs exact brute force
(ADC-only ranking at this compression rate is ~0.57 — the re-rank
stage is what makes the compressed scan usable, and the recall query
reports the honest two-stage number).
Reference analog: the quantized working buffers the native engine
scores against, lib.rs:157-163.
"""

from __future__ import annotations

from ._util import shared_sql

QUERIES = {}
ORACLES = {}

_M = 32          # subvectors per embedding
_SUB = 2         # dims per subvector
_K = 16          # codes in the shared codebook
_SHORTLIST = 50
_TOP_K = 5
_N_QUERIES = 5

# Lloyd-trained on an isotropic 2-dim sample (see module docstring);
# regenerate with tools in git history — values are frozen so the DuckDB
# oracle sees the identical literals.
PQ_CODEBOOK = [
    [-0.259391, 0.01056], [-0.221561, -0.180459], [-0.089892, 0.272866],
    [-0.111223, -0.136902], [0.048829, 0.013919], [0.003753, -0.221514],
    [0.125589, 0.075222], [-0.043216, 0.049267], [-0.136428, -0.013193],
    [-0.133688, 0.123873], [0.124489, 0.218669], [0.177382, -0.174021],
    [0.007556, 0.146445], [-0.024093, -0.070255], [0.091329, -0.08597],
    [0.235033, 0.006871],
]

_SQD = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
    "0D, (acc, v) -> acc + v)"
)
_SQD_DUCK = (
    "list_sum([(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) * "
    "(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) for z in list_zip({a}, {b})])"
)


def _el(col: str, i: int, dialect: str) -> str:
    """1-based element access, identical semantics in both dialects."""
    return f"element_at({col}, {i})" if dialect == "spark" else f"{col}[{i}]"


def _cb_struct_lit(dialect: str) -> str:
    """Codebook as ONE array-of-structs literal (c1, c2, precomputed
    squared norm, index), bound once in a single-row CTE and referenced
    by all 32 encode expressions."""
    entries = []
    for i, (c1, c2) in enumerate(PQ_CODEBOOK):
        n = c1 * c1 + c2 * c2
        if dialect == "spark":
            entries.append(
                f"named_struct('c1', {c1!r}D, 'c2', {c2!r}D, 'n', {n!r}D, 'i', {i})"
            )
        else:
            entries.append(f"{{'c1': {c1!r}, 'c2': {c2!r}, 'n': {n!r}, 'i': {i}}}")
    body = ", ".join(entries)
    return f"array({body})" if dialect == "spark" else f"[{body}]"


def _code_expr(col: str, m: int, dialect: str) -> str:
    """argmin over the shared codebook for subvector m by squared L2
    (||sub||^2 common term dropped), deterministic tie-break by code
    index: sort (dist, i) structs ascending, take [0].i — min distance,
    then min index, exactly the first-match CASE semantics it replaces.
    The struct-sort form keeps the generated expression ~30x smaller
    than the expanded CASE/LEAST argmin, which Janino took ~17 s to
    compile (measured scale-INDEPENDENT: same wall at sf0.001 and
    sf0.01 — pure plan/codegen cost); this form compiles in <2 s."""
    x1 = _el(col, _SUB * m + 1, dialect)
    x2 = _el(col, _SUB * m + 2, dialect)
    two = "2.0D" if dialect == "spark" else "2.0"
    d = (
        f"s.n - {two} * (CAST({x1} AS DOUBLE) * s.c1"
        f" + CAST({x2} AS DOUBLE) * s.c2)"
    )
    if dialect == "spark":
        return (
            "element_at(array_sort(transform(cbs,"
            f" s -> named_struct('d', {d}, 'i', s.i))), 1).i"
        )
    return f"list_sort(list_transform(cbs, s -> {{'d': {d}, 'i': s.i}}))[1].i"


def _cb_lit(dialect: str) -> str:
    if dialect == "spark":
        return (
            "array("
            + ", ".join(f"array({a!r}D, {b!r}D)" for a, b in PQ_CODEBOOK)
            + ")"
        )
    return "[" + ", ".join(f"[{a!r}, {b!r}]" for a, b in PQ_CODEBOOK) + "]"


def _pq_common(dialect: str) -> str:
    sqd = _SQD if dialect == "spark" else _SQD_DUCK
    codes = ", ".join(_code_expr("embedding", m, dialect) for m in range(_M))
    codes_arr = f"array({codes})" if dialect == "spark" else f"[{codes}]"
    if dialect == "spark":
        recon = f"flatten(transform(codes, c -> element_at({_cb_lit(dialect)}, c + 1)))"
    else:
        recon = f"flatten(list_transform(codes, c -> ({_cb_lit(dialect)})[c + 1]))"
    return f"""
WITH cb AS (
  SELECT {_cb_struct_lit(dialect)} AS cbs
),
enc AS (
  SELECT vec_id, {codes_arr} AS codes FROM embeddings CROSS JOIN cb
),
recon AS (
  SELECT vec_id AS c_id, {recon} AS re FROM enc
),
q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}
),
shortlist AS (
  SELECT q_id, c_id, adc_dist FROM (
    SELECT q_id, c_id, adc_dist,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist, c_id) AS arank
    FROM (
      SELECT q_id, c_id, ROUND({sqd.format(a="qe", b="re")}, 6) AS adc_dist
      FROM q CROSS JOIN recon WHERE c_id <> q_id
    ) s0
  ) s1 WHERE arank <= {_SHORTLIST}
),
reranked AS (
  SELECT q_id, c_id, true_dist,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY true_dist, c_id) AS rank
  FROM (
    SELECT sl.q_id, sl.c_id,
           ROUND({sqd.format(a="q.qe", b="c.embedding")}, 6) AS true_dist
    FROM shortlist sl
    JOIN q ON q.q_id = sl.q_id
    JOIN embeddings c ON c.vec_id = sl.c_id
  ) r0
)"""


def _pq_topk_sql(dialect: str) -> str:
    """Two-stage PQ search: ADC scan over 32x-compressed codes builds a
    {_SHORTLIST}-candidate shortlist per query, exact re-rank returns
    top-{_TOP_K}. Plan: encode and reconstruct are projections; the ADC
    scan is a broadcast cross join of the queries against codes with a
    per-query WindowGroupLimit (candidates never shuffle); the re-rank
    joins the tiny shortlist back to the vector store — at 100 TB that
    is a broadcast join of queries x 50 rows against a bucketed table,
    the only stage that touches raw vectors."""
    return (
        _pq_common(dialect)
        + f"""
SELECT q_id, c_id, true_dist, rank FROM reranked WHERE rank <= {_TOP_K}
"""
    )


def _pq_recall_sql(dialect: str) -> str:
    """recall@k of the two-stage PQ search vs exact brute force — the
    quality gate for the compressed scan (same shape as ann_lsh_recall /
    ann_ivf_recall; the frozen codebook makes it fully oracle-checkable;
    pytest additionally gates the mean at >= 0.9)."""
    sqd = _SQD if dialect == "spark" else _SQD_DUCK
    return (
        _pq_common(dialect)
        + f""",
exact_ranked AS (
  SELECT q_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY true_dist, c_id) AS rank
  FROM (
    SELECT q_id, c.vec_id AS c_id,
           ROUND({sqd.format(a="qe", b="c.embedding")}, 6) AS true_dist
    FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q_id
  ) s
)
SELECT p.q_id,
       ROUND(CAST(SUM(CASE WHEN e.c_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / {_TOP_K}, 6) AS recall_at_k
FROM (SELECT q_id, c_id FROM reranked WHERE rank <= {_TOP_K}) p
LEFT JOIN (SELECT q_id, c_id FROM exact_ranked WHERE rank <= {_TOP_K}) e
  ON e.q_id = p.q_id AND e.c_id = p.c_id
GROUP BY p.q_id
"""
    )


QUERIES["ann_pq_topk"] = lambda spark, sf_dir: shared_sql(
    spark, sf_dir, _pq_topk_sql("spark"), ["embeddings"], spread=["embeddings"]
)
QUERIES["ann_pq_topk"].__doc__ = _pq_topk_sql.__doc__
ORACLES["ann_pq_topk"] = _pq_topk_sql("duck")

QUERIES["ann_pq_recall"] = lambda spark, sf_dir: shared_sql(
    spark, sf_dir, _pq_recall_sql("spark"), ["embeddings"], spread=["embeddings"]
)
QUERIES["ann_pq_recall"].__doc__ = _pq_recall_sql.__doc__
ORACLES["ann_pq_recall"] = _pq_recall_sql("duck")
