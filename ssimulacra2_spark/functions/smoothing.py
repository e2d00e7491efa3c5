"""Recursive (IIR) smoothing — the faithful variant of the reference blur.

Reference: per-row recursive Gaussian IIR, 3 cascaded 2nd-order sections
(/root/reference/ssimulacra2/blur/gaussian.rs:37-92), coefficients
constant-folded at build time (build.rs:24-117). Engine variant: a
forward-backward first-order recursive smoother with alpha derived from
sigma — O(1) per sample like the reference, zero-phase like a Gaussian.
Runs inside applyInPandas: one Arrow batch per group (conversation/user),
numpy state recurrence — never per-row Python at the Spark row level.

The idiomatic finite-window variant (truncated Gaussian taps over a
rowsBetween window) lives in registry/windows.py and operators/drift.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..constants import SIGMA


def iir_alpha(sigma: float = SIGMA) -> float:
    """Smoothing factor for a forward-backward first-order IIR whose
    combined impulse response has standard deviation ~= sigma.
    Each direction contributes variance q/(1-q)^2 (geometric), q = 1-a."""
    # solve 2*q/(1-q)^2 = sigma^2 for q in (0, 1)
    s2 = sigma * sigma
    # quadratic: s2*(1-q)^2 = 2q  ->  s2*q^2 - (2*s2+2)*q + s2 = 0
    disc = (2 * s2 + 2) ** 2 - 4 * s2 * s2
    q = ((2 * s2 + 2) - math.sqrt(disc)) / (2 * s2)
    return 1.0 - q


def _ema(x: np.ndarray, alpha: float) -> np.ndarray:
    """EMA recurrence y[i] = a*x[i] + (1-a)*y[i-1] (state seeded with
    x[0]) as a BLOCKED linear scan — no per-element Python loop.

    The recurrence is affine, so a block of length B with carry-in c
    satisfies y[j] = p[j] + q^(j+1) * c, where p is the block's partial
    EMA with zero carry. Partials for all blocks are computed together
    (one vectorized loop over the B in-block time steps), carries chain
    through c[k] = q^B * c[k-1] + p[k-1, B-1] (one cheap scalar loop over
    n/B blocks), and the combine is a single outer product. With
    B ~ sqrt(n) the Python-level step count is ~2*sqrt(n) instead of n
    (same shape as recursive_gaussian.rg_smooth_many: loop over time
    steps, vectorize across everything else)."""
    n = x.shape[0]
    q = 1.0 - alpha
    B = 1 << max(4, (n.bit_length() + 1) // 2)  # ~sqrt(n), floor 16
    nb = -(-n // B)
    X = np.zeros(nb * B)
    X[:n] = x
    X = X.reshape(nb, B)
    P = np.empty_like(X)
    acc = alpha * X[:, 0]
    P[:, 0] = acc
    for j in range(1, B):
        acc = alpha * X[:, j] + q * acc
        P[:, j] = acc
    qB = q**B  # underflows to 0.0 for large B — harmless (q < 1)
    c = np.empty(nb)
    c[0] = x[0]
    for k in range(1, nb):
        c[k] = qB * c[k - 1] + P[k - 1, -1]
    qp = q ** np.arange(1.0, B + 1.0)
    return (P + c[:, None] * qp[None, :]).reshape(-1)[:n]


def iir_smooth_series(x: np.ndarray, sigma: float = SIGMA) -> np.ndarray:
    """Forward-backward pass (zero phase); O(1) per sample. Shared by the
    Spark grouped UDF and the single-node pandas oracle so both sides run
    bit-identical code."""
    a = iir_alpha(sigma)
    if len(x) == 0:
        return x.astype(np.float64)
    fwd = _ema(np.asarray(x, dtype=np.float64), a)
    return _ema(fwd[::-1], a)[::-1]


def smooth_series(x: np.ndarray, sigma: float = SIGMA, kernel: str = "ema") -> np.ndarray:
    """Kernel dispatch shared by the Spark UDF and the pandas oracle:
      'ema'    — first-order forward-backward smoother (cheap default)
      'biquad' — the reference's faithful 3-section recursive Gaussian
                 (gaussian.rs:37-92; see functions/recursive_gaussian.py)
    """
    if kernel == "biquad":
        from .recursive_gaussian import rg_smooth_series

        return rg_smooth_series(x, sigma)
    if kernel == "ema":
        return iir_smooth_series(x, sigma)
    raise ValueError(kernel)


def iir_smooth_grouped(
    df: DataFrame,
    key: str,
    order_col: str,
    value_col: str,
    sigma: float = SIGMA,
    kernel: str = "ema",
) -> DataFrame:
    """applyInPandas grouped-map: per-key ordered recurrence."""
    out_schema = StructType(
        [
            df.schema[key],
            df.schema[order_col],
            StructField("smooth", DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        return pd.DataFrame(
            {
                key: pdf[key].to_numpy(),
                order_col: pdf[order_col].to_numpy(),
                "smooth": np.round(
                    smooth_series(pdf[value_col].to_numpy(), sigma, kernel), 6
                ),
            }
        )

    return (
        df.select(key, order_col, value_col)
        .groupBy(key)
        .applyInPandas(fn, schema=out_schema)
    )
