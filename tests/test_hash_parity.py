"""Cross-engine fuzz of the dialect-neutral hash primitives.

Every oracle in the registry leans on the same bet: the polynomial token
hash (ascii/length/reverse) and the multiplicative doc-id hash evaluate
to the SAME integers in Spark and DuckDB. The parquet fixtures only
exercise ASCII word-soup, so this test fuzzes the primitives directly
over the full Unicode range (Latin-1, CJK, emoji, punctuation, long
tokens) plus 10^12-scale doc ids.

This fuzz found a real 100 TB-readiness bug: ascii() returns the first
CODEPOINT in both engines, and codepoint * 1000003 overflows int32 under
Spark ANSI mode for any non-Latin-1 token — every shingle-based operator
would have crashed on real web text. Fixed by widening the leading term
to BIGINT in all hash templates; this test pins both the fix and the
cross-engine agreement.
"""

from __future__ import annotations

import random
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from ssimulacra2_spark.registry.roundops import _TOK_HASH  # noqa: E402
from ssimulacra2_spark.registry.webops import _TH2, _dochash  # noqa: E402


def _fuzz_tokens() -> list[str]:
    toks = [
        "hello", "a", "Z~", "the", "spark",
        "café", "über", "naïve", "Ångström",          # Latin-1 / extended
        "日本", "中文分词", "データ",                    # CJK
        "мир", "Ελλάδα",                               # Cyrillic / Greek
        "🙂", "🚀x", "x🚀",                             # astral-plane (emoji)
        "'", '"q"', "`tick`", "a-b_c.d", "%percent%",  # punctuation
        "x" * 500,                                     # long token
        "é" * 100,
    ]
    rng = random.Random(99)
    ranges = [(0x21, 0x7E), (0xA1, 0x2FF), (0x4E00, 0x9FFF), (0x1F300, 0x1F64F)]
    for _ in range(120):
        lo, hi = rng.choice(ranges)
        n = rng.randint(1, 12)
        toks.append("".join(chr(rng.randint(lo, hi)) for _ in range(n)))
    # no whitespace/empty (the tokenizers split those away before hashing)
    return [t for t in toks if t.strip() == t and t]


def test_token_hash_agrees_across_engines_full_unicode(spark):
    toks = _fuzz_tokens()
    sdf = spark.createDataFrame(pd.DataFrame({"t": toks}))
    got = {
        r["t"]: (r["h"], r["a"], r["l"], r["rv"])
        for r in sdf.selectExpr(
            "t",
            _TOK_HASH.format(t="t") + " AS h",
            "ascii(t) AS a",
            "length(t) AS l",
            "ascii(reverse(t)) AS rv",
        ).collect()
    }
    con = duckdb.connect()
    for t in toks:
        h, a, l, rv = con.execute(
            "SELECT " + _TOK_HASH.format(t="$t")
            + ", ascii($t), length($t), ascii(reverse($t))",
            {"t": t},
        ).fetchone()
        assert got[t][1] == a, (t, "ascii", got[t][1], a)
        assert got[t][2] == l, (t, "length", got[t][2], l)
        assert got[t][3] == rv, (t, "reverse-ascii", got[t][3], rv)
        assert got[t][0] == h, (t, "hash", got[t][0], h)


def test_th2_segment_hash_agrees(spark):
    toks = _fuzz_tokens()[:60]
    sdf = spark.createDataFrame(pd.DataFrame({"t": toks}))
    got = {r["t"]: r["h"] for r in sdf.selectExpr("t", _TH2.format(t="t") + " AS h").collect()}
    con = duckdb.connect()
    for t in toks:
        (h,) = con.execute("SELECT " + _TH2.format(t="$t"), {"t": t}).fetchone()
        assert got[t] == h, t
        assert 0 <= h < 100003


def test_dochash_agrees_up_to_trillion_ids(spark):
    ids = [0, 1, 7, 19, 1000003, 2147483646, 2147483647, 10**9, 10**12, 10**12 + 13]
    expr = _dochash(374761393, 10)
    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    got = {r["doc_id"]: r["h"] for r in sdf.selectExpr("doc_id", expr + " AS h").collect()}
    con = duckdb.connect()
    for i in ids:
        (h,) = con.execute(
            "SELECT " + expr.replace("doc_id", "CAST($i AS BIGINT)"), {"i": i}
        ).fetchone()
        assert got[i] == h, i
        assert 0 <= h < 10


def test_shingle_ops_survive_unicode_corpus(spark, tmp_path):
    """End-to-end guard: the shingle-based operators must RUN (not
    overflow-crash) on a corpus containing CJK/emoji documents."""
    import __spark_entry__ as entrymod

    docs = pd.DataFrame(
        {
            "doc_id": range(60),
            "text": [
                ["这是 一个 中文 文档 测试 分词 器 的 行为 正确",
                 "日本語 の 文書 です トークン 化 を 確認 する ため",
                 "mixed 文本 with 🚀 emoji tokens and ascii words here",
                 "plain ascii words that repeat repeat repeat repeat now",
                 ][i % 4]
                for i in range(60)
            ],
            "lang": ["zh", "ja", "en", "en"] * 15,
            "source": [f"src{i % 3}" for i in range(60)],
            "n_chars": [30] * 60,
        }
    )
    d = str(tmp_path / "unidocs")
    import os

    os.makedirs(d)
    docs.to_parquet(f"{d}/documents.parquet", index=False)
    q = entrymod.queries()
    for name in ("contamination_ngram", "bloom_membership_guard", "boilerplate_segments",
                 "ft_hash_classifier", "doc_fingerprint_shingles", "dedup_minhash_lsh"):
        q[name](spark, d).collect()  # must not raise
