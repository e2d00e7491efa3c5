"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation suite, ``queries()`` exposes
one query per implemented operator (SURVEY.md §2 + training-data pipeline
ops), ``oracle_sql()`` the DuckDB-equivalent SQL for each (rows-only checks
reserved for genuinely non-SQL-expressible ops: sketches, stateful IIR).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the validation suite run over a star-schema snapshot pair
    (orders/lineitem as reference/candidate), returning verdict rows —
    the engine's headline artifact (per-partition pass/fail + counts)."""
    from ssimulacra2_spark.plans.suite import star_schema_demo_suite

    return star_schema_demo_suite(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ssimulacra2_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ssimulacra2_spark.registry import ORACLES

    return dict(ORACLES)
