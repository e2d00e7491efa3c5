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
