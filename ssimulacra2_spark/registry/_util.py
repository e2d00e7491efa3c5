"""Shared helpers for registry queries."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# uniform unique key per table for the spread repartition (hash-even)
_SPREAD_KEYS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, key: str | None = None
) -> DataFrame:
    """Scan with a PARALLELISM FLOOR for compute-heavy row-local stages.

    The driver corpus ships single-row-group parquet files, so a table
    like `documents` yields 1-2 input splits regardless of
    maxPartitionBytes — and the expensive per-row projections above it
    (higher-order lambdas run INTERPRETED, outside whole-stage codegen;
    guide §4.2's "per-task work" applies to the JVM too) serialize onto
    1-2 of the 32 cores. Measured at sf1/32c: bloom_membership_guard
    8.2 s -> 1.7 s from this repartition alone.

    Scale-safe by construction: the repartition happens ONLY when the
    scan yields fewer partitions than defaultParallelism. A 100 TB table
    scans into thousands of splits and passes through untouched — this
    is a floor (what spark.sql.files.minPartitionNum would provide if
    the files had enough row groups to split), not a resize."""
    df = load(spark, sf_dir, name)
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, F.col(key or _SPREAD_KEYS[name]))
    return df


# Tie-breaking nudge for 6-decimal rounding. Spark rounds on the exact
# binary expansion of the double (BigDecimal), DuckDB on the scaled product;
# data with few decimal digits (prices, 2-decimal values) lands *exactly* on
# x.xxxxxx5 tie boundaries where the two implementations disagree. Adding a
# fixed 5e-8 (5% of the rounding grid) on BOTH sides pushes every tie off
# the boundary consistently; uppercase "ROUND(" in oracle strings is
# rewritten by with_eps6 (lowercase "round(" opts out for non-6 precisions).
EPS6 = 5.0123e-8


def r6(c: Column | str) -> Column:
    """Round float outputs to 6 decimals (after the EPS6 tie nudge) so the
    driver's value-hash is insensitive to last-ulp and tie-rounding
    differences between Spark and DuckDB (SURVEY §7.0 determinism)."""
    if isinstance(c, str):
        c = F.col(c)
    return F.round(F.lit(EPS6) + c, 6)


def with_eps6(sql: str) -> str:
    return sql.replace("ROUND(", f"ROUND({EPS6!r} + ")


def shared_sql(
    spark: SparkSession,
    sf_dir: str,
    sql: str,
    tables: list[str],
    spread: list[str] | None = None,
) -> DataFrame:
    """Run a dialect-neutral SQL string on Spark temp views.

    Used for programmatically generated queries (multi-tap windows, LSH,
    pyramids) where emitting ONE generated string for both engines makes
    Spark/DuckDB parity true by construction. The same with_eps6 transform
    is applied here and to the oracle copy in registry.__init__.

    Tables named in `spread` are registered through load_spread (scan
    parallelism floor — see its docstring); purely a physical-plan
    change, results identical.
    """
    for t in tables:
        df = (
            load_spread(spark, sf_dir, t)
            if spread and t in spread
            else load(spark, sf_dir, t)
        )
        df.createOrReplaceTempView(t)
    return spark.sql(with_eps6(sql))
