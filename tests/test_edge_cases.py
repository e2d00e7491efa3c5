"""Degenerate-input robustness: empty tables, single-turn conversations at
full pyramid depth, identical texts (score exactly 100), all-null payloads."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ssimulacra2_spark.config import CheckSuiteConfig
from ssimulacra2_spark.plans.suite import ValidationSuite

CFG = CheckSuiteConfig(n_buckets=4, min_rows_per_partition=1, num_scales=6)
DDL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_empty_inputs(spark):
    empty = spark.createDataFrame([], DDL)
    v, x = ValidationSuite(CFG).run(spark, empty, empty)
    assert x.count() == 0
    rows = v.collect()
    assert [r.check_id for r in rows] == ["schema"]  # no partitions exist


def test_single_turn_conversation_full_pyramid(spark):
    one = pd.DataFrame(
        {
            "conv_id": ["a"],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["hello"],
            "tool": [None],
            "ts": pd.to_datetime(["2025-01-01"]).astype("datetime64[us]"),
        }
    )
    df = spark.createDataFrame(one)
    v, x = ValidationSuite(CFG).run(spark, df, df)
    assert x.count() == 0
    assert all(r.passed for r in v.collect())


def _same_frame():
    return pd.DataFrame(
        {
            "conv_id": ["a"] * 5 + ["b"] * 3,
            "turn_idx": pd.array(list(range(5)) + list(range(3)), dtype="int32"),
            "role": ["user"] * 8,
            "text": ["same text"] * 8,
            "tool": [None] * 8,
            "ts": pd.to_datetime(["2025-01-01"] * 8).astype("datetime64[us]"),
        }
    )


def test_identical_texts_score_exactly_100(spark):
    df = spark.createDataFrame(_same_frame())
    v, _ = ValidationSuite(CFG).run(spark, df, df)
    for r in v.filter(F.col("check_id") == "drift_score").collect():
        assert r.score == 100.0


def test_all_null_candidate_texts_flagged(spark):
    ref = spark.createDataFrame(_same_frame())
    nulls = _same_frame()
    nulls["text"] = None
    cand = spark.createDataFrame(nulls)
    v, x = ValidationSuite(CFG).run(spark, ref, cand)
    mism = x.filter((F.col("check_id") == "text_parity") & (F.col("class") == "mismatch"))
    assert mism.count() == 8
    tp = v.filter(F.col("check_id") == "text_parity").collect()
    assert all(not r.passed for r in tp)
