"""Text-analysis operators over the documents table: language ID heuristic,
quality scoring, token counting, rolling-hash fingerprinting. All pure
Catalyst expressions (JVM-side, codegen'd) — the 100 TB hot path never
enters Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import load, r6, shared_sql

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
    docs = load(spark, sf_dir, "documents")
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
    docs = load(spark, sf_dir, "documents")
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
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    ws_tokens = F.size(F.filter(F.split(text, " +"), lambda t: t != ""))
    pieces = F.size(F.filter(F.split(text, "[^a-zA-Z0-9]+"), lambda t: t != ""))
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
    th = "(ascii(tok) * 1000003 + length(tok) * 10007 + ascii(reverse(tok)) * 101)"
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
