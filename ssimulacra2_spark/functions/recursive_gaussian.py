"""Faithful recursive-Gaussian IIR — the reference's blur kernel.

Implements "Recursive Implementation of the Gaussian Filter Using
Truncated Cosine Functions" (Charalampidis, 2016), exactly as the
reference does it: three parallel 2nd-order recursive sections (k=1,3,5)
driven by the truncated-cosine input trick, zero-padded outside the
series (/root/reference/ssimulacra2/src/blur/gaussian.rs:37-92;
coefficients constant-folded at build time, build.rs:24-117 — the
equation numbers below are the paper's, mirrored from build.rs).

Differences from the reference, by design:
  * coefficients and state stay float64 (the reference casts to f32 for
    SIMD; the engine's score tolerance is 1e-9, so f64 end-to-end)
  * the recurrence is vectorized ACROSS series: a whole Arrow batch of
    conversations is padded into one (n_series, L) matrix and the
    sequential loop runs only over time steps, each step a (3, n_series)
    numpy op — no per-row Python at the Spark row level.

The cheap first-order EMA variant lives in smoothing.py; this module is
the `kernel="biquad"` alternative behind the same grouped API.
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import SIGMA


def rg_coeffs(sigma: float = SIGMA) -> tuple[int, np.ndarray, np.ndarray]:
    """Radius N plus per-section input gain n2[k] and feedback d1[k]
    (recurrence (35): o[n] = n2*s[n] - d1*o[n-1] - o[n-2]).
    Mirrors build.rs:24-117 in float64."""
    # (57), "N"
    radius = round(3.2795 * sigma + 0.2546)
    # Table I, first row
    pi_div_2r = math.pi / (2.0 * radius)
    omega = [pi_div_2r, 3.0 * pi_div_2r, 5.0 * pi_div_2r]
    # (37), k={1,3,5}
    p = [
        1.0 / math.tan(0.5 * omega[0]),
        -1.0 / math.tan(0.5 * omega[1]),
        1.0 / math.tan(0.5 * omega[2]),
    ]
    # (44)
    r = [
        p[0] * p[0] / math.sin(omega[0]),
        -p[1] * p[1] / math.sin(omega[1]),
        p[2] * p[2] / math.sin(omega[2]),
    ]
    # (50)
    neg_half_sigma2 = -0.5 * sigma * sigma
    rho = [math.exp(neg_half_sigma2 * w * w) / radius for w in omega]
    # (52)
    d_13 = p[0] * r[1] - r[0] * p[1]
    d_35 = p[1] * r[2] - r[1] * p[2]
    d_51 = p[2] * r[0] - r[2] * p[0]
    zeta_15 = d_35 / d_13
    zeta_35 = d_51 / d_13
    # (56) / (55) / (53)
    a = np.array([p, r, [zeta_15, zeta_35, 1.0]], dtype=np.float64)
    gamma = np.array(
        [1.0, radius * radius - sigma * sigma, zeta_15 * rho[0] + zeta_35 * rho[1] + rho[2]],
        dtype=np.float64,
    )
    beta = np.linalg.solve(a, gamma)
    # (39) sanity: IIR weights normalized (≙ build.rs:81-82 assert)
    assert abs(float(beta @ np.array(p)) - 1.0) < 1e-12
    # (33)
    n2 = np.array(
        [-beta[i] * math.cos(omega[i] * (radius + 1.0)) for i in range(3)], dtype=np.float64
    )
    d1 = np.array([-2.0 * math.cos(omega[i]) for i in range(3)], dtype=np.float64)
    return int(radius), n2, d1


def rg_smooth_many(series: list[np.ndarray], sigma: float = SIGMA) -> list[np.ndarray]:
    """Recursive Gaussian of each series (zero-padded edges, matching
    gaussian.rs:50-61). Vectorized across series: sequential only in the
    time dimension."""
    big_n, n2, d1 = rg_coeffs(sigma)
    lens = [len(x) for x in series]
    if not series or max(lens, default=0) == 0:
        return [np.asarray(x, dtype=np.float64) for x in series]
    L = max(lens)
    m = len(series)
    x = np.zeros((m, L), dtype=np.float64)
    for i, s in enumerate(series):
        x[i, : lens[i]] = s
    out = np.zeros((m, L), dtype=np.float64)
    # per-section state, shape (3, m)
    prev = np.zeros((3, m))
    prev2 = np.zeros((3, m))
    n2c = n2[:, None]
    d1c = d1[:, None]
    for n in range(-big_n + 1, L):
        left = n - big_n - 1
        right = n + big_n - 1
        s = np.zeros(m)
        if left >= 0:
            s += x[:, left]
        if right < L:
            s += x[:, right]
        o = n2c * s[None, :] - d1c * prev - prev2
        prev2 = prev
        prev = o
        if n >= 0:
            out[:, n] = o.sum(axis=0)
    return [out[i, : lens[i]] for i in range(m)]


def rg_smooth_series(x: np.ndarray, sigma: float = SIGMA) -> np.ndarray:
    return rg_smooth_many([np.asarray(x, dtype=np.float64)], sigma)[0]
