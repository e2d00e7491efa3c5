"""Multimodal-column plumbing + vectorized-UDF surface + sketch profiles.

Multimodal payloads (image/audio/video) are opaque binary columns with
typed metadata. Decode dispatch has three tiers:

  1. _real_decode   — full codec decode (PIL); codec-gated, raises a
                      clearly-marked NotImplementedError in this
                      codec-less container.
  2. _png_parse     — REAL header parsing without any codec: PNG IHDR
                      width/height/bit-depth straight from the bytes
                      (signature + big-endian fields + CRC32 verified);
                      oracle-checked end-to-end (multimodal_png_meta).
  3. _fake_decode   — deterministic arithmetic fake, kept so the Arrow
                      plumbing (binary schema, batch shapes, partition
                      behavior) is exercised for formats tier 2 can't
                      header-parse; fully oracle-checked too.
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

from ._util import load, load_spread, r6

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
    docs = load_spread(spark, sf_dir, "documents")
    staged = docs.select("doc_id", F.octet_length(F.col("text")).alias("n_bytes"))
    return staged.mapInPandas(_fake_decode, schema=_DECODE_SCHEMA)


ORACLES["multimodal_decode_stub"] = """
SELECT doc_id,
  CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
  CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height,
  CAST(octet_length(encode(text)) % 24 + 1 AS INT) AS n_frames
FROM documents
"""


# --------------------------------------------------------------------------
# Real header parsing without codecs: PNG IHDR (width/height/bit-depth need
# no decoder — the third dispatch tier between _real_decode and _fake_decode)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_LEN = 33  # 8 sig + 4 len + 4 'IHDR' + 13 data + 4 crc


def _png_synthesize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Emit REAL PNG file headers (signature + IHDR chunk with a valid
    CRC32) as a binary payload column — the writer half of the binary
    round-trip. bit depth 8, color type 2 (truecolor), per the PNG spec."""
    import struct
    import zlib

    for pdf in batches:
        payloads = []
        for w, h in zip(pdf["width"], pdf["height"]):
            chunk = b"IHDR" + struct.pack(">IIBBBBB", int(w), int(h), 8, 2, 0, 0, 0)
            payloads.append(
                _PNG_SIG
                + struct.pack(">I", 13)
                + chunk
                + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _png_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Parse width/height/bit-depth/color-type out of PNG IHDR bytes —
    genuinely reading the binary payload (signature checked, big-endian
    fields decoded, CRC32 verified), no codec library involved. Fixed
    header length makes the field extraction a single reshaped-uint8
    numpy pass, vectorized across the Arrow batch."""
    import zlib

    import numpy as np

    cols = ["doc_id", "width", "height", "bit_depth", "color_type"]
    sig = np.frombuffer(_PNG_SIG, np.uint8)
    shifts = np.array([24, 16, 8, 0], np.uint32)

    def be32(arr, lo):  # big-endian u32 column slice
        return (arr[:, lo : lo + 4].astype(np.uint32) << shifts).sum(
            axis=1, dtype=np.uint64
        )

    for pdf in batches:
        if len(pdf) == 0:
            yield pd.DataFrame(columns=cols)
            continue
        raw = b"".join(pdf["payload"])
        arr = np.frombuffer(raw, np.uint8).reshape(len(pdf), _PNG_LEN)
        if not (arr[:, :8] == sig).all():
            raise ValueError("payload is not a PNG (bad signature)")
        crc = be32(arr, 29)
        for i, p in enumerate(pdf["payload"]):
            if zlib.crc32(p[12:29]) & 0xFFFFFFFF != int(crc[i]):
                raise ValueError(f"IHDR CRC mismatch in row {i}")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": be32(arr, 16).astype("int32"),
                "height": be32(arr, 20).astype("int32"),
                "bit_depth": arr[:, 24].astype("int32"),
                "color_type": arr[:, 25].astype("int32"),
            }
        )


@(lambda fn: (QUERIES.__setitem__("multimodal_png_meta", fn), fn)[1])
def multimodal_png_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free REAL decode tier: synthesize valid PNG headers into a
    binary column (Arrow stage 1), then parse width/height/bit-depth back
    OUT of the bytes (Arrow stage 2: signature + big-endian fields + CRC32
    check). Unlike multimodal_decode_stub's arithmetic fake, the parsed
    values only match the oracle if the byte-level write->read round trip
    is correct — so the oracle verifies real binary parsing. Scale shape:
    two chained mapInPandas projections, no shuffle. Ref analog: container
    metadata probing before decode, video.rs:268-287."""
    docs = load_spread(spark, sf_dir, "documents")
    nb = F.octet_length(F.coalesce(F.col("text"), F.lit("")))  # null payload -> 0 bytes
    dims = docs.select(
        "doc_id",
        (nb % 640 + 16).cast("int").alias("width"),
        (nb % 480 + 16).cast("int").alias("height"),
    )
    blobs = dims.mapInPandas(_png_synthesize, schema="doc_id long, payload binary")
    return blobs.mapInPandas(
        _png_parse,
        schema="doc_id long, width int, height int, bit_depth int, color_type int",
    )


ORACLES["multimodal_png_meta"] = """
SELECT doc_id,
  CAST(octet_length(encode(COALESCE(text, ''))) % 640 + 16 AS INT) AS width,
  CAST(octet_length(encode(COALESCE(text, ''))) % 480 + 16 AS INT) AS height,
  CAST(8 AS INT) AS bit_depth, CAST(2 AS INT) AS color_type
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
