"""Star-schema testdata loaders (driver corpus at /root/testdata/sf*)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan; Catalyst handles column pruning + predicate pushdown."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
