"""Mergeable quantile sketch (t-digest style) as a two-phase pandas UDAF.

North rule names t-digest for length/quantile profiles. Spark's built-in
percentile_approx already gives a mergeable GK sketch; this module exists
for the cases it can't serve: (a) persisting per-partition sketches so
later runs merge them without re-reading data, (b) cross-snapshot drift
stats over merged sketches.

Design: the classic merging t-digest (Dunning) with a scale-function cap:
centroid i may absorb weight until its quantile span exceeds what the
compression delta allows. Phase 1 (applyInPandas per (group, salt)): build
a digest per slice — the salt bounds slice size under hot keys. Phase 2
(applyInPandas per group): merge slice digests. Both phases emit the same
(mean, weight) row encoding, so digests are closed under merge — exactly
the mergeability contract HLL/GK give the built-ins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)


def compress(means: np.ndarray, weights: np.ndarray, delta: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted centroids so at most ~delta remain, k1 scale function
    (uniform in asin sqrt space — tighter at the tails)."""
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = weights.sum()
    if total == 0:
        return means[:0], weights[:0]
    out_m: list[float] = []
    out_w: list[float] = []
    cum = 0.0

    def k(q: float) -> float:
        q = min(max(q, 0.0), 1.0)
        return delta / (2 * np.pi) * 2.0 * np.arcsin(2 * q - 1)

    cur_m, cur_w = means[0], weights[0]
    k_lo = k(0.0)
    for m, w in zip(means[1:], weights[1:]):
        q_new = (cum + cur_w + w) / total
        if k(q_new) - k_lo <= 1.0:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = m, w
            k_lo = k(cum / total)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Interpolated quantile from centroids."""
    if len(means) == 0:
        return float("nan")
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights) - weights / 2.0
    target = q * weights.sum()
    return float(np.interp(target, cum, means))


_DIGEST_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("means", ArrayType(DoubleType())),
        StructField("weights", ArrayType(DoubleType())),
    ]
)


def tdigest_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    delta: int = 100,
    salt_buckets: int = 8,
    row_key_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Two-phase mergeable quantile profile per group (salted phase 1 so a
    hot group cannot overload one task; ≙ SURVEY §2.10 tdigest_agg)."""

    def phase1(pdf: pd.DataFrame) -> pd.DataFrame:
        g = str(pdf[group_col].iloc[0])
        v = pdf[value_col].to_numpy(np.float64)
        m, w = compress(v, np.ones_like(v), delta)
        return pd.DataFrame({"group": [g], "means": [list(m)], "weights": [list(w)]})

    def phase2(pdf: pd.DataFrame) -> pd.DataFrame:
        g = str(pdf["group"].iloc[0])
        m = np.concatenate([np.asarray(x) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x) for x in pdf["weights"]])
        m, w = compress(m, w, delta)
        row = {"group": g}
        for q in quantiles:
            row[f"p{int(q * 100)}"] = quantile(m, w, q)
        return pd.DataFrame([row])

    out_fields = [StructField("group", StringType())] + [
        StructField(f"p{int(q * 100)}", DoubleType()) for q in quantiles
    ]
    # The salt must (a) fan out a hot group even when its value is
    # CONSTANT (the degenerate skew case — hashing the value alone
    # collapses to one bucket) and (b) be DETERMINISTIC under task retry:
    # a nondeterministic shuffle key (e.g. monotonically_increasing_id)
    # can re-bucket recomputed rows after a fetch failure, silently
    # dropping/duplicating rows in the phase-1 digests. Callers should
    # pass row_key_cols (a stable per-row key like event_id) to get both.
    # Without one, the fallback hashes (group, value) only — deterministic
    # and type-safe on any frame (hashing all columns would break on
    # hash-unsupported types like maps and scan every column for nothing),
    # at the documented cost that a constant-valued hot group collapses
    # into one phase-1 bucket (digests stay correct; skew fanout degrades).
    key_cols = list(row_key_cols) if row_key_cols else [group_col, value_col]
    salted = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(value_col).alias(value_col),
        F.pmod(F.xxhash64(*key_cols), F.lit(salt_buckets)).alias("_salt"),
    )
    partials = salted.groupBy(group_col, "_salt").applyInPandas(phase1, _DIGEST_SCHEMA)
    return partials.groupBy("group").applyInPandas(phase2, StructType(out_fields))
