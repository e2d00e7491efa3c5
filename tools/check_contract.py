"""Local simulation of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same sf dir, then compares row count, column names and
order-insensitive values (floats compared exactly after both sides' ROUND,
with a 1e-9 fallback report). Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from ssimulacra2_spark.session import get_spark
from ssimulacra2_spark.tables import STAR_TABLES


def normalize(df):
    """pandas DF -> sorted list of tuples with canonicalized values."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return None
            return repr(round(v, 9))
        if hasattr(v, "isoformat"):
            return v.isoformat()[:26]
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(canon(x) for x in v)
        try:
            import numpy as np

            if isinstance(v, np.integer):
                return int(v)
            if isinstance(v, np.floating):
                return canon(float(v))
            if isinstance(v, np.bool_):
                return bool(v)
        except Exception:
            pass
        try:
            from decimal import Decimal

            if isinstance(v, Decimal):
                return canon(float(v))
        except Exception:
            pass
        return v

    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r)), list(df.columns)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.001"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    spark = get_spark("contract-check", cores=8)
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc(limit=8)
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {str(e)[:300]}")
            n_fail += 1
            failures.append(name)
            continue
        srows, scols = normalize(sdf)
        orows, ocols = normalize(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            n_fail += 1
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1
            failures.append(name)
            continue
        if srows != orows:
            bad = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, e.g. {bad}")
            n_fail += 1
            failures.append(name)
            continue
        print(f"PASS  {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
