"""Mergeable t-digest UDAF: estimates within tolerance of exact quantiles,
and digests are closed under merge (partial -> merge == single pass)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ssimulacra2_spark.functions.tdigest import compress, quantile, tdigest_quantiles


def test_compress_and_quantile_accuracy():
    rng = np.random.default_rng(3)
    v = rng.normal(50, 10, 50_000)
    m, w = compress(v, np.ones_like(v))
    assert len(m) < 300
    assert w.sum() == len(v)
    for q in (0.05, 0.5, 0.95):
        est = quantile(m, w, q)
        exact = float(np.quantile(v, q))
        assert abs(est - exact) < 0.5, (q, est, exact)


def test_merge_closure():
    rng = np.random.default_rng(4)
    a, b = rng.exponential(5, 20_000), rng.exponential(5, 20_000)
    ma, wa = compress(a, np.ones_like(a))
    mb, wb = compress(b, np.ones_like(b))
    mm, wm = compress(np.concatenate([ma, mb]), np.concatenate([wa, wb]))
    both = np.concatenate([a, b])
    for q in (0.5, 0.95):
        est = quantile(mm, wm, q)
        exact = float(np.quantile(both, q))
        assert abs(est - exact) / exact < 0.02, (q, est, exact)


def test_spark_two_phase_vs_exact(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], 20_000),
            "v": np.concatenate([rng.normal(100, 15, 20_000), rng.exponential(30, 20_000)]),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r.group: (r.p50, r.p95) for r in tdigest_quantiles(df, "g", "v").collect()}
    for g, sub in pdf.groupby("g"):
        p50, p95 = float(np.quantile(sub.v, 0.5)), float(np.quantile(sub.v, 0.95))
        assert abs(got[g][0] - p50) / max(p50, 1) < 0.02
        assert abs(got[g][1] - p95) / max(p95, 1) < 0.02
