"""Product-quantization quality gates (registry/pq.py).

The two-stage search (ADC shortlist over 32x-compressed codes -> exact
re-rank) must stay retrieval-adequate even on the isotropic driver
fixture — PQ's worst case, since isotropic data has no cluster
structure for the codebook to exploit. The recall gate pins that; the
distortion test pins the codebook itself (encode determinism and
bounded reconstruction error), so a codebook regression fails even if
shortlist luck keeps recall up.
"""

from __future__ import annotations

import numpy as np
import pytest

from ssimulacra2_spark.registry.pq import _K, _M, _SUB, PQ_CODEBOOK, QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_pq_two_stage_recall_gate(spark):
    rows = QUERIES["ann_pq_recall"](spark, SF_DIR).collect()
    assert len(rows) == 5
    recalls = [r.recall_at_k for r in rows]
    assert np.mean(recalls) >= 0.9, recalls


def test_pq_codebook_distortion_bound():
    """Quantization MSE of the frozen codebook on the driver fixture must
    stay well under the per-dim variance (a useless codebook would sit at
    ratio ~1.0); measured ~0.35 on isotropic data, gated at 0.5."""
    import duckdb

    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    X = np.array([np.asarray(e, dtype=np.float64) for e in emb.embedding])
    n, d = X.shape
    assert d == _M * _SUB
    C = np.array(PQ_CODEBOOK)
    assert C.shape == (_K, _SUB)
    subs = X.reshape(n, _M, _SUB)
    d2 = ((subs[:, :, None, :] - C[None, None, :, :]) ** 2).sum(-1)
    codes = d2.argmin(-1)
    assert codes.min() >= 0 and codes.max() < _K
    recon = C[codes].reshape(n, d)
    mse = float(((X - recon) ** 2).mean())
    var = float(X.var())
    assert mse / var < 0.5, (mse, var)
    # encode is deterministic: re-encoding reconstructed vectors is a
    # fixed point (each recon subvector is exactly a codebook entry)
    subs2 = recon.reshape(n, _M, _SUB)
    codes2 = ((subs2[:, :, None, :] - C[None, None, :, :]) ** 2).sum(-1).argmin(-1)
    assert (codes2 == codes).all()
