"""Round-5b training-data-pipeline operators (SURVEY §2.10 extensions):
deterministic stratified sampling, TF-IDF keyword extraction, token-
distribution entropy, winnowing fingerprints, and sequence packing.

All five are pure Catalyst compositions (no Python UDF anywhere); each
has a full DuckDB oracle. Scale notes per op:

- stratified_sample: a pushable FILTER on a content hash — zero shuffle
  until the tiny per-stratum summary agg. The 100 TB shape: sampling is
  embarrassingly parallel, reproducible (hash-derived, not RNG-state-
  dependent), and resumable — re-running selects the identical subset.
- tfidf_topk: token TF is a map-side-combinable (doc, term) agg; DF is a
  map-side-combinable (term) agg; the TF⋈DF join shuffles on `term`
  (uniform — natural-language term skew is bounded because TF rows are
  per-(doc,term), not per-occurrence). Top-k per doc is WindowGroupLimit
  (rank pushed into the shuffle, no full sort materialization).
- token_entropy: two chained mergeable aggs, both keyed by doc_id after
  the first — one shuffle total.
- winnowing_fingerprint: every window function is partitioned by doc_id
  (never global); per-doc state is bounded by doc length.
- pack_sequences: running token-offset assignment via a prefix sum
  partitioned by the `source` stratum. For unbounded strata the engine
  path uses the chunked two-phase prefix scan (see
  registry/engineops.py sessionize_gap — same technique: per-chunk
  local sums, tiny chunk-totals exchange, broadcast back); the registry
  query keeps the single-window form for oracle parity at test scale.

Reference analog: the reference pipeline scores frame streams and
aggregates per-stream (ssimulacra2_bin/src/video.rs:484-495); these ops
are the corpus-side preparation stages SURVEY §2.10 mandates beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import load, load_spread, r6

QUERIES = {}
ORACLES = {}

# hex-prefix sampling thresholds per language stratum: P(substr(md5,1,2)
# < t) = int(t,16)/256. md5 is lowercase hex in BOTH Spark and DuckDB,
# and ASCII compare of hex strings is order-consistent across engines.
_STRATA_RATES = {"en": "40", "de": "80", "fr": "c0", "es": "zz"}  # 25/50/75/100%
_DEFAULT_RATE = "40"


def _tokens_spark(text):
    return F.filter(F.split(text, " +"), lambda t: t != "")


_TOKENS_DUCK = "list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')"


@(lambda fn: (QUERIES.__setitem__("stratified_sample", fn), fn)[1])
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: keep a doc iff the hex prefix
    of md5(doc_id ':' text) falls under the stratum's threshold. The
    selection is a pure pushable filter — reproducible across runs,
    engines, and partitionings (no RNG seed plumbing, no sampleBy state).
    Output is the per-language sample audit: totals, sampled count,
    achieved rate, and min/max sampled doc_id as a determinism witness."""
    docs = load(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))), 1, 2)
    thresh = F.lit(_DEFAULT_RATE)
    for lang, t in _STRATA_RATES.items():
        thresh = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thresh)
    picked = (key < thresh).cast("int")
    return (
        docs.select("doc_id", "lang", picked.alias("picked"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("picked").alias("n_sampled"),
            r6(F.sum("picked") / F.count("*")).alias("sample_rate"),
            F.min(F.when(F.col("picked") == 1, F.col("doc_id"))).alias("first_doc"),
            F.max(F.when(F.col("picked") == 1, F.col("doc_id"))).alias("last_doc"),
        )
    )


def _strat_case() -> str:
    whens = " ".join(f"WHEN lang = '{lang}' THEN '{t}'" for lang, t in _STRATA_RATES.items())
    return f"CASE {whens} ELSE '{_DEFAULT_RATE}' END"


ORACLES["stratified_sample"] = f"""
WITH flagged AS (
  SELECT doc_id, lang,
    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2)
              < {_strat_case()} THEN 1 ELSE 0 END AS picked
  FROM documents
)
SELECT lang, COUNT(*) AS n_total, CAST(SUM(picked) AS BIGINT) AS n_sampled,
  ROUND(CAST(SUM(picked) AS DOUBLE) / COUNT(*), 6) AS sample_rate,
  MIN(CASE WHEN picked = 1 THEN doc_id END) AS first_doc,
  MAX(CASE WHEN picked = 1 THEN doc_id END) AS last_doc
FROM flagged GROUP BY lang
"""


_TFIDF_K = 3


@(lambda fn: (QUERIES.__setitem__("tfidf_topk", fn), fn)[1])
def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf * (ln((N+1)/(df+1)) + 1), deterministic tie-break on the ROUNDED
    score (both engines rank the identical 6-decimal value) then term.
    The corpus size N rides a broadcast single-row cross join."""
    docs = load_spread(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens_spark(F.lower(F.col("text")))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))  # single-row N: broadcast-tiny by construction
        .withColumn(
            "score",
            r6(F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TFIDF_K)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


ORACLES["tfidf_topk"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_DUCK.replace('text', 'lower(text)')}) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
    ROUND(tf.tf * (ln(CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)) + 1), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, tf, df, score, rk FROM ranked WHERE rk <= {_TFIDF_K}
"""


@(lambda fn: (QUERIES.__setitem__("token_entropy", fn), fn)[1])
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document (nats), the
    perplexity-proxy quality signal: H = ln(T) - Σ tf·ln(tf) / T over the
    doc's term counts, plus the ln(V)-normalized variant. Two chained
    map-side-combinable aggs — one shuffle keyed by doc_id."""
    docs = load_spread(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens_spark(F.lower(F.col("text")))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("tf") * F.log(F.col("tf").cast("double"))).alias("s_tlnt"),
    )
    ent = F.log(F.col("n_tokens").cast("double")) - F.col("s_tlnt") / F.col("n_tokens")
    norm = F.when(
        F.col("n_distinct") > 1, ent / F.log(F.col("n_distinct").cast("double"))
    ).otherwise(F.lit(0.0))
    return per_doc.where(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        r6(ent).alias("ent_nats"),
        r6(norm).alias("ent_norm"),
    )


ORACLES["token_entropy"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_DUCK.replace('text', 'lower(text)')}) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
per_doc AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
         SUM(tf * ln(CAST(tf AS DOUBLE))) AS s_tlnt
  FROM tf GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
  ROUND(ln(CAST(n_tokens AS DOUBLE)) - s_tlnt / n_tokens, 6) AS ent_nats,
  ROUND(CASE WHEN n_distinct > 1
             THEN (ln(CAST(n_tokens AS DOUBLE)) - s_tlnt / n_tokens)
                  / ln(CAST(n_distinct AS DOUBLE))
             ELSE 0.0 END, 6) AS ent_norm
FROM per_doc WHERE n_tokens > 0
"""


_WINNOW_W = 4  # shingle-hashes per winnowing window


@(lambda fn: (QUERIES.__setitem__("winnowing_fingerprint", fn), fn)[1])
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS-style) fingerprint selection: hash every token
    3-shingle, slide a window of 4 consecutive shingle hashes, keep each
    window's minimum, dedup — guaranteeing any shared run of >= w+k-1
    tokens between two docs shares at least one fingerprint. Hashes are
    md5 hex strings ordered lexicographically (engine-portable min).
    Output: per-doc fingerprint-set summary (count + lexicographic
    min/max witness)."""
    docs = load_spread(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(_tokens_spark(F.lower(F.col("text")))).alias("pos", "tok")
    )
    w_lead = Window.partitionBy("doc_id").orderBy("pos")
    sh = (
        tok.withColumn("t1", F.lead("tok", 1).over(w_lead))
        .withColumn("t2", F.lead("tok", 2).over(w_lead))
        .where(F.col("t2").isNotNull())
        .select("doc_id", "pos", F.md5(F.concat_ws(" ", "tok", "t1", "t2")).alias("h"))
    )
    w_win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WINNOW_W - 1)
    fps = (
        sh.withColumn("wmin", F.min("h").over(w_win))
        .withColumn("wn", F.count("h").over(w_win))
        .where(F.col("wn") == _WINNOW_W)  # complete windows only
        .select("doc_id", "wmin")
        .distinct()
    )
    return fps.groupBy("doc_id").agg(
        F.count("*").alias("n_fp"),
        F.min("wmin").alias("fp_min"),
        F.max("wmin").alias("fp_max"),
    )


ORACLES["winnowing_fingerprint"] = f"""
WITH tok AS (
  SELECT doc_id,
    unnest({_TOKENS_DUCK.replace('text', 'lower(text)')}) AS tok,
    generate_subscripts({_TOKENS_DUCK.replace('text', 'lower(text)')}, 1) - 1 AS pos
  FROM documents
),
sh AS (
  SELECT doc_id, pos,
    md5(tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w) AS h,
    LEAD(tok, 2) OVER w AS t2
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
wins AS (
  SELECT doc_id,
    MIN(h) OVER v AS wmin,
    COUNT(h) OVER v AS wn
  FROM sh WHERE t2 IS NOT NULL
  WINDOW v AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
),
fps AS (SELECT DISTINCT doc_id, wmin FROM wins WHERE wn = {_WINNOW_W})
SELECT doc_id, COUNT(*) AS n_fp, MIN(wmin) AS fp_min, MAX(wmin) AS fp_max
FROM fps GROUP BY doc_id
"""


_PACK_CAP = 2048  # tokens per training shard
_PACK_CHUNK = 4096  # doc_id-range per prefix-scan chunk (bounds window rows)


@(lambda fn: (QUERIES.__setitem__("pack_sequences", fn), fn)[1])
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training shards: concatenate each source
    stratum's docs in doc_id order and assign every doc its token-offset
    range; shard_id = floor(start_offset / 2048). Output is the per-shard
    manifest (docs, tokens, boundary-crossing count). Pure integer window
    arithmetic — bit-identical across engines, no rounding machinery.

    r06: the prefix sum runs as the CHUNKED two-phase scan (the
    sessionize_gap technique, engineops.py — VERDICT r05 #1): local
    prefix sums per (source, doc_id DIV _PACK_CHUNK) window (<= 4096 rows
    per window task, never a whole-source stratum), chunk totals rolled
    up per source (one row per chunk — tiny), chunk base offsets
    broadcast back. start_off is identical to the single-window form
    (integer arithmetic, associative regrouping only); pinned by
    tests/test_pipelineops.py and the three-SF oracle sweep."""
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source", F.size(_tokens_spark(F.col("text"))).alias("n_tok")
    ).withColumn("cid", F.floor(F.col("doc_id") / _PACK_CHUNK))
    w_local = (
        Window.partitionBy("source", "cid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunk_tot = sized.groupBy("source", "cid").agg(F.sum("n_tok").alias("ctot"))
    w_chunk = (
        Window.partitionBy("source")
        .orderBy("cid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = chunk_tot.select(
        "source",
        "cid",
        F.coalesce(F.sum("ctot").over(w_chunk), F.lit(0)).alias("cbase"),
    )
    assigned = (
        sized.withColumn("loc", F.coalesce(F.sum("n_tok").over(w_local), F.lit(0)))
        .join(F.broadcast(base), ["source", "cid"])
        .withColumn("start_off", F.col("cbase") + F.col("loc"))
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
    )
    return assigned.groupBy("source", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("crosses").alias("n_crossing"),
    )


ORACLES["pack_sequences"] = f"""
WITH sized AS (
  SELECT doc_id, source, len({_TOKENS_DUCK}) AS n_tok FROM documents
),
assigned AS (
  SELECT source,
    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off,
    n_tok
  FROM sized
),
sharded AS (
  SELECT source, n_tok,
    CAST(FLOOR(CAST(start_off AS DOUBLE) / {_PACK_CAP}) AS BIGINT) AS shard_id,
    CASE WHEN n_tok > 0 AND
         CAST(FLOOR(CAST(start_off + n_tok - 1 AS DOUBLE) / {_PACK_CAP}) AS BIGINT)
         > CAST(FLOOR(CAST(start_off AS DOUBLE) / {_PACK_CAP}) AS BIGINT)
         THEN 1 ELSE 0 END AS crosses
  FROM assigned
)
SELECT source, shard_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(crosses) AS BIGINT) AS n_crossing
FROM sharded GROUP BY source, shard_id
"""


# --------------------------------------------------------------------------
# End-to-end composites: the two queries a pipeline user actually ships
# --------------------------------------------------------------------------

# (bit, name) -> row-local predicate pair; a doc is kept iff every gate
# passes. All five are single-scan projections (zero shuffle before the
# per-doc output row), the Gopher-style row-local subset; the shuffle-
# based repetition rules stay in quality_repetition_rules for unbounded
# documents.
_GATE_BITS = (
    (1, "len"),        # enough content to train on
    (2, "ws"),         # whitespace ratio sane
    (4, "wordlen"),    # mean word length in the natural-language band
    (8, "distinct"),   # in-array distinct-token fraction (bounded docs)
)


@(lambda fn: (QUERIES.__setitem__("quality_gate", fn), fn)[1])
def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused quality gate: every row-local filter evaluated in ONE scan,
    emitting keep/drop plus a reason bitmask (bit set = gate FAILED) so
    downstream audits can attribute drops without re-running filters.
    Gates: length (>=10 chars, >=3 tokens), whitespace ratio <= 0.35,
    mean word length in [2, 12], distinct-token fraction >= 0.2. The
    distinct-token gate is an in-array op — valid because docs are
    length-bounded upstream; the unbounded-doc variant is the shuffle
    pipeline in quality_repetition_rules."""
    docs = load_spread(spark, sf_dir, "documents")
    text = F.col("text")
    toks = _tokens_spark(text)
    n_chars = F.length(text)
    n_tok = F.size(toks)
    n_ws = F.length(text) - F.length(F.replace(text, F.lit(" ")))
    ws_ratio = n_ws.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    mean_wl = (n_chars - n_ws).cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    distinct_frac = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        n_tok, F.lit(1)
    ).cast("double")
    fails = {
        "len": ~((n_chars >= 10) & (n_tok >= 3)),
        "ws": ~(ws_ratio <= 0.35),
        "wordlen": ~((mean_wl >= 2.0) & (mean_wl <= 12.0)),
        "distinct": ~(distinct_frac >= 0.2),
    }
    mask = F.lit(0)
    for bit, name in _GATE_BITS:
        mask = mask + F.when(fails[name], F.lit(bit)).otherwise(F.lit(0))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        r6(ws_ratio).alias("ws_ratio"),
        r6(mean_wl).alias("mean_word_len"),
        r6(distinct_frac).alias("distinct_frac"),
        mask.cast("int").alias("reason_mask"),
        (mask == 0).alias("keep_doc"),
    )


ORACLES["quality_gate"] = """
WITH g AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')) AS n_tok,
    length(text) - length(replace(text, ' ', '')) AS n_ws,
    len(list_distinct(list_filter(regexp_split_to_array(text, ' +'), t -> t <> ''))) AS n_dist
  FROM documents
),
m AS (
  SELECT doc_id, n_tok,
    CAST(n_ws AS DOUBLE) / GREATEST(n_chars, 1) AS ws_ratio,
    CAST(n_chars - n_ws AS DOUBLE) / GREATEST(n_tok, 1) AS mean_wl,
    CAST(n_dist AS DOUBLE) / GREATEST(n_tok, 1) AS distinct_frac,
    (CASE WHEN NOT (n_chars >= 10 AND n_tok >= 3) THEN 1 ELSE 0 END
     + CASE WHEN NOT (CAST(n_ws AS DOUBLE) / GREATEST(n_chars, 1) <= 0.35) THEN 2 ELSE 0 END
     + CASE WHEN NOT (CAST(n_chars - n_ws AS DOUBLE) / GREATEST(n_tok, 1) BETWEEN 2.0 AND 12.0) THEN 4 ELSE 0 END
     + CASE WHEN NOT (CAST(n_dist AS DOUBLE) / GREATEST(n_tok, 1) >= 0.2) THEN 8 ELSE 0 END
    ) AS reason_mask
  FROM g
)
SELECT doc_id, n_tok AS n_tokens,
  ROUND(ws_ratio, 6) AS ws_ratio,
  ROUND(mean_wl, 6) AS mean_word_len,
  ROUND(distinct_frac, 6) AS distinct_frac,
  CAST(reason_mask AS INTEGER) AS reason_mask,
  reason_mask = 0 AS keep_doc
FROM m
"""


@(lambda fn: (QUERIES.__setitem__("dedup_apply", fn), fn)[1])
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself: MinHash-LSH star edges -> star-CC
    cluster labels -> LEFT ANTI join dropping every non-keeper (keeper =
    min doc_id per component). This is the query a 100 TB dedup run
    actually ships — clusters alone are diagnostics. Scale shape: the
    text column never enters the CC iteration (labels carry only
    (node, label) longs); the final anti-join shuffles on the uniform
    doc_id key, and survivors stream straight from the corpus scan.
    Oracle: the recursive-CTE component walk, NOT EXISTS non-keepers."""
    from ..operators.cc import connected_components_star

    from .dedup import _star_edges_df

    edges = _star_edges_df(spark, sf_dir, symmetric=False)
    labels, _rounds = connected_components_star(edges, canonical=True)
    non_keepers = labels.where(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    docs = load(spark, sf_dir, "documents")
    return docs.join(non_keepers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _dedup_apply_oracle() -> str:
    from .dedup import _star_edges_ctes

    return f"""
WITH RECURSIVE {_star_edges_ctes("duck")},
walk(node, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, w.label FROM edges e JOIN walk w ON w.node = e.v
),
non_keepers AS (
  SELECT node FROM walk GROUP BY node HAVING node <> MIN(label)
)
SELECT doc_id, lang, source, n_chars FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM non_keepers nk WHERE nk.node = d.doc_id)
"""


ORACLES["dedup_apply"] = _dedup_apply_oracle()


# --------------------------------------------------------------------------
# Incremental dedup: new batch vs historical corpus
# --------------------------------------------------------------------------


def _incremental_sql(dialect: str) -> str:
    """Incremental (cross-snapshot) dedup — the daily-ingest shape: an
    incoming batch is checked against the HISTORICAL corpus's LSH band
    keys, not against itself. Here the split is doc_id parity (even =
    historical, odd = incoming) so both engines see the identical
    partition. Per incoming doc: how many of its bands hit a historical
    bucket, and the dup verdict (>= 1 hit).

    Scale shape: at 100 TB the historical side is a pre-computed compact
    (band, bkey) index maintained incrementally at ingest — it never
    re-derives signatures from text. The probe is a join on the uniform
    (band, bkey) key with the (small) daily batch on the streaming side;
    historical text is never read. Same generated SQL runs on both
    engines (parity by construction)."""
    from .dedup import _minhash_ctes

    return f"""
WITH {_minhash_ctes(dialect)},
hist AS (SELECT DISTINCT band, bkey FROM bands WHERE doc_id % 2 = 0),
incoming AS (SELECT doc_id, band, bkey FROM bands WHERE doc_id % 2 = 1),
matched AS (
  SELECT i.doc_id, CAST(COUNT(DISTINCT i.band) AS BIGINT) AS n_bands_hit
  FROM incoming i JOIN hist h ON h.band = i.band AND h.bkey = i.bkey
  GROUP BY i.doc_id
),
newdocs AS (SELECT DISTINCT doc_id FROM incoming)
SELECT n.doc_id,
       CAST(COALESCE(m.n_bands_hit, 0) AS BIGINT) AS n_bands_hit,
       m.doc_id IS NOT NULL AS is_dup
FROM newdocs n LEFT JOIN matched m ON m.doc_id = n.doc_id
"""


def _incremental_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r06 shape: band keys come from the row-local signature projection
    (dedup._sigs_df) instead of the generated CTE chain, whose inlined
    `bands` subtree re-ran the token shuffle + signature aggregate once
    per reference (hist + incoming + newdocs). The probe join and the
    aggregation are unchanged; identical rows to the oracle SQL."""
    from .dedup import _sigs_df

    # checkpointed once: hist / incoming / newdocs are three references
    # to this subtree, and each would otherwise re-run the signature
    # pipeline (same multi-reference lesson as _lsh_prod_counts_df)
    sk = _sigs_df(spark, sf_dir).hint("rebalance").localCheckpoint()
    bands = sk.select("doc_id", F.posexplode("keys").alias("band", "bkey"))
    hist = (
        bands.filter(F.col("doc_id") % 2 == 0).select("band", "bkey").distinct()
    )
    incoming = bands.filter(F.col("doc_id") % 2 == 1)
    matched = (
        incoming.join(hist, ["band", "bkey"])
        .groupBy("doc_id")
        .agg(F.countDistinct("band").cast("long").alias("n_bands_hit"))
    )
    newdocs = incoming.select("doc_id").distinct()
    m = matched.select(
        F.col("doc_id").alias("m_doc"), F.col("n_bands_hit").alias("m_hits")
    )
    return (
        newdocs.join(m, newdocs["doc_id"] == m["m_doc"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m_hits"), F.lit(0)).cast("long").alias("n_bands_hit"),
            F.col("m_doc").isNotNull().alias("is_dup"),
        )
    )


def _register_incremental() -> None:
    QUERIES["dedup_incremental"] = _incremental_df
    QUERIES["dedup_incremental"].__doc__ = _incremental_sql.__doc__
    ORACLES["dedup_incremental"] = _incremental_sql("duck")


_register_incremental()


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (embedding dim reduction)
# --------------------------------------------------------------------------

_RP_IN = 64
_RP_OUT = 8


def _rp_matrix() -> list[list[float]]:
    """Frozen Rademacher projection matrix: entries ±1/sqrt(k), seeded so
    both engines embed the identical literals (the production analog
    ships the trained/generated matrix as a build artifact)."""
    import random

    rng = random.Random(20250817)
    s = 1.0 / (_RP_OUT ** 0.5)
    return [
        [s if rng.random() < 0.5 else -s for _ in range(_RP_IN)]
        for _ in range(_RP_OUT)
    ]


_RP = _rp_matrix()


def _rp_sql(dialect: str) -> str:
    """Random-projection sketch of each embedding (64 -> 8 dims, JL
    lemma: pairwise distances preserved within ~1/sqrt(k)) — the
    standard cheap pre-filter stage ahead of exact reranking. Pure
    projection: one fold per output dim, no shuffle, no UDF; distance
    contraction is property-tested in pytest (test_pipelineops)."""
    cols = []
    for k in range(_RP_OUT):
        if dialect == "spark":
            lit = "array(" + ", ".join(f"{v!r}D" for v in _RP[k]) + ")"
            dot = (
                f"aggregate(zip_with(embedding, {lit},"
                " (x, r) -> CAST(x AS DOUBLE) * r), 0D, (acc, v) -> acc + v)"
            )
        else:
            lit = "[" + ", ".join(repr(v) for v in _RP[k]) + "]"
            dot = (
                f"list_sum([CAST(z[1] AS DOUBLE) * z[2]"
                f" for z in list_zip(embedding, {lit})])"
            )
        cols.append(f"ROUND({dot}, 6) AS p{k}")
    return f"SELECT vec_id, {', '.join(cols)} FROM embeddings"


def _register_rp() -> None:
    from ._util import shared_sql as _ss

    QUERIES["emb_project_rp"] = lambda spark, sf_dir: _ss(
        spark, sf_dir, _rp_sql("spark"), ["embeddings"]
    )
    QUERIES["emb_project_rp"].__doc__ = _rp_sql.__doc__
    ORACLES["emb_project_rp"] = _rp_sql("duck")


_register_rp()


@(lambda fn: (QUERIES.__setitem__("text_normalize", fn), fn)[1])
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization ahead of hashing/dedup: lowercase,
    strip every non-[a-z0-9 space] char, collapse whitespace runs, trim.
    Emitted as the md5 of the normal form (the dedup key) plus raw and
    normalized lengths — a pure single-scan projection; the regex
    classes used are semantics-identical between Java regex and RE2."""
    docs = load_spread(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    norm = F.trim(F.regexp_replace(norm, " +", " "))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_raw"),
        F.length(norm).alias("n_norm"),
        F.md5(norm).alias("norm_md5"),
    )


ORACLES["text_normalize"] = """
WITH n AS (
  SELECT doc_id, length(text) AS n_raw,
    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                        ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, n_raw, length(norm) AS n_norm, md5(norm) AS norm_md5 FROM n
"""
