"""Faithful IIR smoothing: Spark applyInPandas result == pandas oracle
(bit-identical — both run iir_smooth_series)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ssimulacra2_spark import oracle
from ssimulacra2_spark.constants import KERNEL_TAPS
from ssimulacra2_spark.functions.smoothing import iir_alpha, iir_smooth_grouped


def test_kernel_taps_normalized():
    assert abs(sum(KERNEL_TAPS) - 1.0) < 1e-12  # ≙ build.rs:81-82 assert


def test_iir_alpha_in_range():
    a = iir_alpha()
    assert 0.0 < a < 1.0


def test_iir_grouped_matches_oracle(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(20), 50),
            "event_id": np.tile(np.arange(50), 20),
            "value": rng.normal(10, 3, 1000),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        iir_smooth_grouped(df, key="user_id", order_col="event_id", value_col="value")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = (
        oracle.iir_smooth_frame(pdf, key="user_id", order_col="event_id", value_col="value")
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert (got["smooth"].to_numpy() == want["smooth"].to_numpy()).all()


def test_iir_smooths_toward_mean():
    from ssimulacra2_spark.functions.smoothing import iir_smooth_series

    x = np.array([0.0, 0, 0, 100, 0, 0, 0])
    y = iir_smooth_series(x)
    assert y[3] < 100  # peak attenuated
    assert y[2] > 0 and y[4] > 0  # mass spread to neighbors
    assert abs(y.sum() - x.sum()) / x.sum() < 0.35  # roughly mass-preserving


# --------------------------------------------------------------------------
# Faithful cascaded-biquad recursive Gaussian (gaussian.rs:37-92)
# --------------------------------------------------------------------------


def test_biquad_impulse_matches_gaussian():
    """The recursive filter's impulse response approximates a true
    Gaussian of the same sigma (the Charalampidis construction's whole
    point) — symmetric, unit-sum, max error well under 1%."""
    from ssimulacra2_spark.constants import SIGMA
    from ssimulacra2_spark.functions.recursive_gaussian import rg_smooth_series

    n = 41
    x = np.zeros(n)
    x[n // 2] = 1.0
    y = rg_smooth_series(x)
    idx = np.arange(n) - n // 2
    g = np.exp(-0.5 * (idx / SIGMA) ** 2)
    g /= g.sum()
    assert abs(y.sum() - 1.0) < 1e-3  # DC gain ~ 1 (normalized weights)
    assert np.abs(y - y[::-1]).max() < 1e-9  # zero-phase/symmetric
    assert np.abs(y - g).max() < 0.01  # tracks the true Gaussian


def test_biquad_zero_pad_edges():
    """Edges zero-pad exactly like the reference (gaussian.rs:50-61):
    a constant series decays near the borders instead of renormalizing."""
    from ssimulacra2_spark.functions.recursive_gaussian import rg_smooth_series

    y = rg_smooth_series(np.ones(32))
    mid = len(y) // 2
    assert abs(y[mid] - 1.0) < 1e-3  # interior ~ identity on constants
    assert y[0] < y[mid]  # borders see zero padding


def test_biquad_many_matches_single():
    """Batch vectorization across series is exact: each padded series
    produces the same output as filtering it alone."""
    from ssimulacra2_spark.functions.recursive_gaussian import (
        rg_smooth_many,
        rg_smooth_series,
    )

    rng = np.random.default_rng(3)
    series = [rng.normal(0, 1, n) for n in (1, 2, 7, 40, 160)]
    got = rg_smooth_many(series)
    for s, g in zip(series, got):
        assert (g == rg_smooth_series(s)).all()


def test_biquad_grouped_matches_oracle(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(12), 30),
            "event_id": np.tile(np.arange(30), 12),
            "value": rng.normal(5, 2, 360),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        iir_smooth_grouped(
            df, key="user_id", order_col="event_id", value_col="value", kernel="biquad"
        )
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = (
        oracle.iir_smooth_frame(
            pdf, key="user_id", order_col="event_id", value_col="value", kernel="biquad"
        )
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert (got["smooth"].to_numpy() == want["smooth"].to_numpy()).all()
