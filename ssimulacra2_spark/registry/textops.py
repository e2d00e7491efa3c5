"""Text-analysis operators over the documents table: language ID heuristic,
quality scoring, token counting, rolling-hash fingerprinting. All pure
Catalyst expressions (JVM-side, codegen'd) — the 100 TB hot path never
enters Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import load, load_spread, r6, shared_sql

QUERIES = {}
ORACLES = {}

# stopword markers per language (looked for as ' word ' substrings)
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def _count_sub_spark(col, sub: str):
    # occurrences of substring = (len(s) - len(replace(s, sub, ''))) / len(sub)
    return (F.length(col) - F.length(F.replace(col, F.lit(sub)))) / len(sub)


def _count_sub_duck(col: str, sub: str) -> str:
    return f"(length({col}) - length(replace({col}, '{sub}', ''))) / {len(sub)}"


@(lambda fn: (QUERIES.__setitem__("lang_id", fn), fn)[1])
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: count per-language marker
    words, argmax with a deterministic tie-break (score desc, lang asc)."""
    docs = load_spread(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    scores = [
        (
            sum(_count_sub_spark(padded, f" {m} ") for m in markers).alias(f"s_{lang}"),
            lang,
        )
        for lang, markers in _LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", *[s for s, _ in scores])
    pairs = F.array(
        *[F.struct(F.col(f"s_{lang}").alias("score"), F.lit(lang).alias("lang")) for _, lang in scores]
    )
    best = F.array_sort(pairs, lambda a, b: F.when(a.score > b.score, -1).when(a.score < b.score, 1).otherwise(F.when(a.lang < b.lang, -1).otherwise(1)))[0]
    pred = F.when(best.score > 0, best.lang).otherwise(F.lit("und"))
    return scored.select(pred.alias("pred_lang")).groupBy("pred_lang").agg(F.count("*").alias("n"))


def _lang_oracle() -> str:
    score_cols = []
    for lang, markers in _LANG_MARKERS.items():
        terms = " + ".join(_count_sub_duck("' ' || lower(text) || ' '", f" {m} ") for m in markers)
        score_cols.append(f"({terms}) AS s_{lang}")
    langs = list(_LANG_MARKERS)
    # argmax by (score desc, lang asc) without array lambdas: greatest + case
    great = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in sorted(langs):
        case += f"WHEN s_{lang} = mx THEN '{lang}' "
    case += "END"
    return f"""
WITH scored AS (SELECT doc_id, {', '.join(score_cols)} FROM documents),
best AS (SELECT doc_id, {great} AS mx, {case} AS lang_at_max,
         {', '.join(f's_{lang}' for lang in langs)} FROM scored)
SELECT CASE WHEN mx > 0 THEN lang_at_max ELSE 'und' END AS pred_lang, COUNT(*) AS n
FROM best GROUP BY 1
"""


ORACLES["lang_id"] = _lang_oracle()


@(lambda fn: (QUERIES.__setitem__("quality_score", fn), fn)[1])
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: length, mean word length, whitespace
    ratio, stopword ratio — the standard training-data quality gates."""
    docs = load_spread(spark, sf_dir, "documents")
    text = F.col("text")
    n_chars = F.length(text)
    n_ws = F.length(text) - F.length(F.replace(text, F.lit(" ")))
    n_tok = F.size(F.filter(F.split(text, " +"), lambda t: t != ""))
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    n_stop = sum(_count_sub_spark(padded, f" {m} ") for m in ["the", "and", "of", "a", "to"])
    safe_tok = F.when(n_tok > 0, n_tok.cast("double")).otherwise(F.lit(1.0))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        r6(n_ws.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")).alias("ws_ratio"),
        r6(n_stop.cast("double") / safe_tok).alias("stop_ratio"),
        ((n_chars >= 10) & (n_tok >= 3)).alias("passes_gate"),
    )


ORACLES["quality_score"] = f"""
SELECT doc_id,
  length(text) AS n_chars_m,
  len(list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')) AS n_tokens,
  ROUND(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
        / GREATEST(length(text), 1), 6) AS ws_ratio,
  ROUND(CAST({' + '.join(_count_sub_duck("' ' || lower(text) || ' '", f" {m} ") for m in ["the", "and", "of", "a", "to"])} AS DOUBLE)
        / (CASE WHEN len(list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')) > 0
                THEN CAST(len(list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')) AS DOUBLE)
                ELSE 1.0 END), 6) AS stop_ratio,
  length(text) >= 10 AND len(list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')) >= 3 AS passes_gate
FROM documents
"""


@(lambda fn: (QUERIES.__setitem__("token_count", fn), fn)[1])
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish subword estimate
    (word-boundary regex pieces + ceil(chars/4) cap blend)."""
    docs = load_spread(spark, sf_dir, "documents")
    text = F.col("text")
    ws_tokens = F.size(F.filter(F.split(text, " +"), lambda t: t != ""))
    # identical count to filter(split(text, '[^a-zA-Z0-9]+'), t -> t != '')
    # — maximal alnum runs — but regexp_extract_all is a codegen expression
    # while the negated-class split churns allocations and the higher-order
    # filter evaluates interpreted: interleaved A/B at sf1/32c measured
    # 2.58 s -> 0.35 s for this expression alone. The ' +' split form is NOT
    # rewritten: measured slightly faster than regexp_extract_all('[^ ]+').
    pieces = F.size(F.regexp_extract_all(text, F.lit("[a-zA-Z0-9]+"), 0))
    bpe_est = F.ceil(F.length(text) / 4.0)
    return docs.select(
        "doc_id",
        ws_tokens.alias("ws_tokens"),
        pieces.alias("word_pieces"),
        bpe_est.alias("bpe_estimate"),
    )


ORACLES["token_count"] = """
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')) AS ws_tokens,
  len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), t -> t <> '')) AS word_pieces,
  CAST(CEIL(length(text) / 4.0) AS BIGINT) AS bpe_estimate
FROM documents
"""


@(lambda fn: (QUERIES.__setitem__("doc_fingerprint", fn), fn)[1])
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: polynomial hash over sampled
    character positions (dialect-neutral; at scale: xxhash64 over shingles)."""
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    positions = [1, 5, 9, 17, 33, 65, 129]
    fp = F.lit(0).cast("bigint")
    for k, pos in enumerate(positions):
        ch = F.coalesce(F.ascii(F.substring(text, pos, 1)), F.lit(0))
        fp = fp + ch.cast("bigint") * (31 ** k)
    fp = fp + F.length(text).cast("bigint") * 1000003
    return docs.select("doc_id", (fp % 2147483647).alias("fingerprint"))


def _fp_oracle() -> str:
    positions = [1, 5, 9, 17, 33, 65, 129]
    terms = [
        f"COALESCE(ascii(substring(text, {pos}, 1)), 0) * CAST({31 ** k} AS BIGINT)"
        for k, pos in enumerate(positions)
    ]
    terms.append("length(text) * CAST(1000003 AS BIGINT)")
    return f"SELECT doc_id, ({' + '.join(terms)}) % 2147483647 AS fingerprint FROM documents"


ORACLES["doc_fingerprint"] = _fp_oracle()


# --------------------------------------------------------------------------
# Shingle fingerprint — the scale variant of doc_fingerprint
# --------------------------------------------------------------------------

_SHINGLE_K = 3  # tokens per shingle


def _shingle_fp_sql(dialect: str) -> str:
    """Min-rank fingerprint over token 3-shingles: tokenize, slide a
    k-token window, hash each shingle (dialect-neutral polynomial over
    the three token hashes), keep the MIN — one mergeable agg per doc, so
    the same plan holds at 10^12 docs (map-side MIN partials). This is
    the content-defined variant of doc_fingerprint (which samples fixed
    character positions): token insertions shift positions but leave most
    shingles — and usually the min shingle — intact."""
    th = (
        "(CAST(ascii(tok) AS BIGINT) * 1000003"
        " + length(tok) * 10007 + ascii(reverse(tok)) * 101)"
    )
    if dialect == "spark":
        toks = (
            "SELECT doc_id, posexplode(filter(split(text, ' +'), t -> t <> ''))"
            " AS (pos, tok) FROM documents"
        )
    else:
        toks = (
            "SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, ' +'),"
            " t -> t <> '')) AS tok,"
            " generate_subscripts(list_filter(regexp_split_to_array(text, ' +'),"
            " t -> t <> ''), 1) - 1 AS pos FROM documents"
        )
    return f"""
WITH tok AS ({toks}),
th AS (SELECT doc_id, pos, CAST({th} AS BIGINT) AS h FROM tok),
sh AS (
  SELECT a.doc_id, (a.h * 31 * 31 + b.h * 31 + c.h) % 2147483647 AS shingle_h
  FROM th a
  JOIN th b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN th c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
)
SELECT doc_id, MIN(shingle_h) AS fingerprint FROM sh GROUP BY doc_id
"""


QUERIES["doc_fingerprint_shingles"] = lambda spark, sf_dir: shared_sql(
    spark, sf_dir, _shingle_fp_sql("spark"), ["documents"]
)
QUERIES["doc_fingerprint_shingles"].__doc__ = _shingle_fp_sql.__doc__
ORACLES["doc_fingerprint_shingles"] = _shingle_fp_sql("duck")


@(lambda fn: (QUERIES.__setitem__("quality_repetition_rules", fn), fn)[1])
def quality_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): per doc,
    the share of tokens taken by the single most frequent token and the
    fraction of 2-gram occurrences that are repeats of an already-seen
    2-gram; docs above either threshold are flagged for drop.

    Scale shape: explode -> two-level count aggregation on the uniform
    (doc_id, gram) key, then a per-doc rollup — both map-side combinable,
    so the plan is two linear shuffles regardless of corpus size (an
    in-array O(tokens x distinct) rewrite would avoid the shuffle but
    degrades quadratically on long documents; this one does not).
    Reference analog: the per-frame error-map aggregation that flags
    outlier frames, video.rs:484-495."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " +"), lambda t: t != "")
    base = docs.select("doc_id", toks.alias("toks"))
    tok_counts = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
    )
    tok_agg = tok_counts.groupBy("doc_id").agg(
        F.max("count").alias("top_tok"), F.sum("count").alias("n_tokens")
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) > 1 THEN"
                " transform(sequence(1, size(toks) - 1),"
                "   i -> concat(element_at(toks, CAST(i AS INT)), ' ',"
                "               element_at(toks, CAST(i + 1 AS INT))))"
                " ELSE CAST(array() AS array<string>) END"
            )
        ).alias("gram"),
    )
    gram_counts = grams.groupBy("doc_id", "gram").count()
    gram_agg = gram_counts.groupBy("doc_id").agg(
        F.sum("count").alias("n_grams"),
        F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(F.lit(0))).alias(
            "dup_grams"
        ),
    )
    joined = tok_agg.join(gram_agg, "doc_id", "left")
    top_share = F.col("top_tok").cast("double") / F.col("n_tokens").cast("double")
    dup_frac = F.coalesce(F.col("dup_grams"), F.lit(0)).cast("double") / F.greatest(
        F.coalesce(F.col("n_grams"), F.lit(0)), F.lit(1)
    ).cast("double")
    return joined.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        r6(top_share).alias("top_token_share"),
        r6(dup_frac).alias("dup_2gram_frac"),
        ((top_share <= 0.20) & (dup_frac <= 0.60)).alias("keep_doc"),
    )


ORACLES["quality_repetition_rules"] = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, ' +'), t -> t <> '') AS toks
  FROM documents
),
tok_counts AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
  GROUP BY doc_id, tok
),
tok_agg AS (
  SELECT doc_id, MAX(c) AS top_tok, SUM(c) AS n_tokens FROM tok_counts GROUP BY doc_id
),
gram_counts AS (
  SELECT doc_id, gram, COUNT(*) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS gram
    FROM base
  )
  GROUP BY doc_id, gram
),
gram_agg AS (
  SELECT doc_id, SUM(c) AS n_grams,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_grams
  FROM gram_counts GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(t.n_tokens AS BIGINT) AS n_tokens,
  ROUND(CAST(t.top_tok AS DOUBLE) / CAST(t.n_tokens AS DOUBLE), 6) AS top_token_share,
  ROUND(CAST(COALESCE(g.dup_grams, 0) AS DOUBLE)
        / CAST(GREATEST(COALESCE(g.n_grams, 0), 1) AS DOUBLE), 6) AS dup_2gram_frac,
  (CAST(t.top_tok AS DOUBLE) / CAST(t.n_tokens AS DOUBLE)) <= 0.20
    AND (CAST(COALESCE(g.dup_grams, 0) AS DOUBLE)
         / CAST(GREATEST(COALESCE(g.n_grams, 0), 1) AS DOUBLE)) <= 0.60 AS keep_doc
FROM tok_agg t LEFT JOIN gram_agg g ON g.doc_id = t.doc_id
"""
