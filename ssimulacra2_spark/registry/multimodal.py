"""Multimodal-column plumbing + vectorized-UDF surface + sketch profiles.

Multimodal payloads (image/audio/video) are opaque binary columns with
typed metadata. The container has no codec libraries, so the *decode* step
is a clearly-marked deterministic fake — but the Spark-side plumbing
(binary schema, Arrow batching via mapInPandas, batch shapes, partition
behavior) is real and tested. The fake decode is pure arithmetic on byte
length, so even the UDF path gets a full DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ._util import load, r6

QUERIES = {}
ORACLES = {}


@(lambda fn: (QUERIES.__setitem__("multimodal_meta", fn), fn)[1])
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: payload bytes + content hash —
    pure Catalyst expressions over an opaque binary column (no Python)."""
    docs = load(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(F.col("text")).alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
    )


ORACLES["multimodal_meta"] = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5
FROM documents
"""


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _real_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Codec-gated REAL decoder: identical Arrow batch contract as the
    fake (same input columns, same output schema), dispatched when a codec
    library exists. This container ships no codecs, so importing raises a
    clearly-marked NotImplementedError rather than silently faking —
    production swaps in by having PIL installed, nothing else changes."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no codecs
        raise NotImplementedError(
            "real multimodal decode needs an image codec (PIL/Pillow) which "
            "this container does not ship; use multimodal_decode_stub for "
            "the plumbing-verified deterministic fake"
        ) from e
    import io as _io

    for pdf in batches:  # pragma: no cover - exercised only with codecs
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
            with Image.open(_io.BytesIO(blob)) as im:
                rows.append((doc_id, im.width, im.height, getattr(im, "n_frames", 1)))
        yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "n_frames"])


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODER — deterministic fake. Real image/audio decode needs
    codec libs absent from this container (see _real_decode for the
    codec-gated path with the identical batch contract); the Arrow batch
    plumbing, schema, and partitioning are the real thing."""
    for pdf in batches:
        n = pdf["n_bytes"].to_numpy()
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (n % 640 + 16).astype("int32"),
                "height": (n % 480 + 16).astype("int32"),
                "n_frames": (n % 24 + 1).astype("int32"),
            }
        )


@(lambda fn: (QUERIES.__setitem__("multimodal_decode_stub", fn), fn)[1])
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas (Arrow
    batches; ref analog: per-frame decode fan-out video.rs:407-456). The
    fake is deterministic arithmetic so the oracle can verify the full
    UDF round-trip, not just row counts."""
    docs = load(spark, sf_dir, "documents")
    staged = docs.select("doc_id", F.octet_length(F.col("text")).alias("n_bytes"))
    return staged.mapInPandas(_fake_decode, schema=_DECODE_SCHEMA)


ORACLES["multimodal_decode_stub"] = """
SELECT doc_id,
  CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
  CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height,
  CAST(octet_length(encode(text)) % 24 + 1 AS INT) AS n_frames
FROM documents
"""


@(lambda fn: (QUERIES.__setitem__("col_stats_profile", fn), fn)[1])
def col_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-stats profile (north rule): null-rate, min/max, distinct,
    mean per group. Exact COUNT(DISTINCT) here for oracle parity; the
    engine's scale path uses approx_count_distinct (HLL) — see
    hll_tdigest_profile for the sketch variant."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.count("*") - F.count("value")).alias("n_null"),
        r6(F.min("value")).alias("min_v"),
        r6(F.max("value")).alias("max_v"),
        F.countDistinct("user_id").alias("n_users"),
        r6(F.avg("value")).alias("mean_v"),
    )


ORACLES["col_stats_profile"] = """
SELECT event_type, COUNT(*) AS n,
  COUNT(*) - COUNT(value) AS n_null,
  ROUND(MIN(value), 6) AS min_v, ROUND(MAX(value), 6) AS max_v,
  COUNT(DISTINCT user_id) AS n_users,
  ROUND(AVG(value), 6) AS mean_v
FROM events GROUP BY event_type
"""


@(lambda fn: (QUERIES.__setitem__("hll_tdigest_profile", fn), fn)[1])
def hll_tdigest_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based profile — the 100 TB path: approx_count_distinct (HLL,
    mergeable, fixed memory) + percentile_approx (GK/t-digest-like,
    mergeable). No SQL oracle: sketch estimates are engine-specific by
    design (driver records the rows-only check; exactness is covered by
    col_stats_profile)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
        F.percentile_approx("value", 0.95, 10000).alias("approx_p95"),
    )


# no ORACLES entry for hll_tdigest_profile (rows-only by design)


@(lambda fn: (QUERIES.__setitem__("iir_smooth", fn), fn)[1])
def iir_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive smoothing per user over event order — this entry runs the
    CHEAP first-order forward-backward EMA variant (kernel='ema',
    functions/smoothing.py). The faithful reference kernel is the separate
    iir_smooth_biquad entry. Stateful recurrences are not SQL-expressible;
    pytest pins both against the pandas oracle instead (test_smoothing)."""
    from ..functions.smoothing import iir_smooth_grouped

    ev = load(spark, sf_dir, "events")
    return iir_smooth_grouped(ev, key="user_id", order_col="event_id", value_col="value")


# no ORACLES entry for iir_smooth (stateful recurrence; pytest-pinned)


@(lambda fn: (QUERIES.__setitem__("iir_smooth_biquad", fn), fn)[1])
def iir_smooth_biquad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful recursive-Gaussian smoothing — the reference's 3-section
    truncated-cosine IIR (gaussian.rs:37-92, coefficients per
    build.rs:24-117) as kernel='biquad' (functions/recursive_gaussian.py),
    vectorized numpy inside applyInPandas. No SQL oracle — a 2nd-order
    stateful recurrence is not SQL-expressible; pytest pins Spark == pandas
    oracle bit-exact (test_smoothing.py::test_biquad_grouped_matches_oracle)."""
    from ..functions.smoothing import iir_smooth_grouped

    ev = load(spark, sf_dir, "events")
    return iir_smooth_grouped(
        ev, key="user_id", order_col="event_id", value_col="value", kernel="biquad"
    )


# no ORACLES entry for iir_smooth_biquad (stateful recurrence; pytest-pinned)
