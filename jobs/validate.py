"""Production entry point: spark-submit --py-files engine.zip jobs/validate.py

Validates a candidate snapshot against a reference snapshot, writes
verdicts + violations to a checkpointed results table (resume-safe), and
prints a per-check summary.

    spark-submit --master local[32] --py-files engine.zip jobs/validate.py \
        --ref /data/transcripts_ref --cand /data/transcripts_cand \
        --results /data/results --run-id nightly-2025-06-01 [--config cfg.json]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True)
    p.add_argument("--cand", required=True)
    p.add_argument("--results", required=True)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--config", default=None, help="CheckSuiteConfig JSON path")
    args = p.parse_args()

    spark = SparkSession.builder.getOrCreate()

    from ssimulacra2_spark.config import CheckSuiteConfig
    from ssimulacra2_spark.plans.suite import ValidationSuite, summarize
    from ssimulacra2_spark.sources.tableio import ParquetTableIO

    if args.config:
        with open(args.config) as f:
            cfg = CheckSuiteConfig.from_json(f.read())
    else:
        cfg = CheckSuiteConfig()

    io = ParquetTableIO(args.results)
    ref = io.read_snapshot(spark, args.ref)
    cand = io.read_snapshot(spark, args.cand)
    suite = ValidationSuite(cfg)
    suite.run(spark, ref, cand, io=io, run_id=args.run_id)

    verdicts = io.read_verdicts(spark, args.run_id)
    for row in summarize(verdicts).collect():
        print("CHECK_SUMMARY " + json.dumps(row.asDict(), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
