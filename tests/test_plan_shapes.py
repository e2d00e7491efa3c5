"""Physical-plan regression guards.

PLANS.md documents the plan shapes the engine RELIES on at scale; these
tests pin the load-bearing ones so a refactor that silently regresses a
plan (a range join materializing a product, a lost broadcast, a lost
map-side top-k or partial aggregation) fails CI instead of surviving to
a 100 TB run. Assertions are on operator PRESENCE/ABSENCE — robust
across Spark versions — not on full plan text.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_asof_join_has_no_product_join(spark, queries):
    """The as-of join must stay the sorted-carry shape: any nested-loop /
    cartesian node means the range-join row blowup is back."""
    p = _plan(queries["asof_join_policy"](spark, SF))
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # bucket carry-in comes back broadcast


def test_topk_uses_window_group_limit(spark, queries):
    """Catalyst's rank<=k pushdown = two-phase (map-side partial) top-k;
    losing it degrades to a single-reducer global window sort."""
    for name in ("ann_bruteforce_topk", "ann_lsh_topk"):
        assert "WindowGroupLimit" in _plan(queries[name](spark, SF)), name


def test_dim_joins_are_broadcast(spark, queries):
    """Small dimensions must broadcast — a shuffled fact side here is the
    classic 100 TB regression."""
    for name in ("elementwise_product_join", "vocab_ref_integrity"):
        p = _plan(queries[name](spark, SF))
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_aggregations_have_partial_phase(spark, queries):
    """Map-side combine before the exchange (partial_count/partial_sum in
    the HashAggregate) — the reason turn-level groupBys tolerate skew."""
    for name in ("uniqueness_check", "l1_l4_norms"):
        p = _plan(queries[name](spark, SF))
        assert "partial_" in p, name


def test_drift_exchange_ships_float32(spark):
    """The prepared channel columns must stay FloatType: a well-meaning
    'fix' back to double doubles the drift exchange bytes."""
    from ssimulacra2_spark.config import CheckSuiteConfig
    from ssimulacra2_spark.operators.checks import prepare

    cfg = CheckSuiteConfig()
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "CAST(user_id AS STRING) AS conv_id",
        "CAST(event_id AS INT) AS turn_idx",
        "event_type AS role",
        "props AS text",
        "event_type AS tool",
        "ts",
    )
    df = prepare(ev, cfg)
    for ch in cfg.channels:
        assert df.schema[f"ch_{ch}"].dataType.simpleString() == "float", ch
