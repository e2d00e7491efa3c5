"""Windowed-smoothing / multi-scale queries (SURVEY §2.5, §2.6 limit_scales,
§2.2 ssim/edgediff expressions).

The kernel-smoothing and pyramid queries are *generated once* as
dialect-neutral SQL and executed by both Spark (temp views) and DuckDB —
parity by construction (see _util.shared_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..constants import C2, KERNEL_TAPS, NUM_SCALES, RADIUS
from ._util import load, r6, shared_sql

QUERIES = {}
ORACLES = {}


def _tap_terms(value: str, over: str) -> tuple[str, str]:
    """Numerator & denominator of the edge-renormalized (2R+1)-tap kernel.

    Reference blur zero-pads outside the frame (gaussian.rs:50-61); Spark /
    SQL window frames *shrink* at partition edges instead (SURVEY §7.2).
    Renormalizing by the sum of present-tap weights is the documented
    engine convention; the oracle uses the identical expression.
    """
    nums, dens = [], []
    for i in range(-RADIUS, RADIUS + 1):
        w = repr(KERNEL_TAPS[i + RADIUS])
        if i < 0:
            term = f"LAG({value}, {-i}) OVER ({over})"
        elif i > 0:
            term = f"LEAD({value}, {i}) OVER ({over})"
        else:
            term = value
        nums.append(f"COALESCE({w} * ({term}), 0.0)")
        dens.append(f"CASE WHEN ({term}) IS NOT NULL THEN {w} ELSE 0.0 END")
    return " + ".join(nums), " + ".join(dens)


def _horizontal_sql() -> str:
    over = "PARTITION BY user_id ORDER BY event_id"
    num, den = _tap_terms("value", over)
    return f"""
SELECT user_id, event_id, ROUND(({num}) / ({den}), 6) AS smooth
FROM events
"""


QUERIES["win_horizontal_scan"] = lambda spark, sf_dir: shared_sql(
    spark, sf_dir, _horizontal_sql(), ["events"]
)
QUERIES["win_horizontal_scan"].__doc__ = (
    "Horizontal blur pass (recursive IIR per row, gaussian.rs:37-92) — "
    "idiomatic variant: truncated-Gaussian taps over an ordered window per "
    "conversation/user; the faithful IIR lives in functions/smoothing.py "
    "(vectorized numpy inside applyInPandas)."
)
ORACLES["win_horizontal_scan"] = _horizontal_sql()


def _vertical_sql() -> str:
    # Second axis (across users within a time bucket), mirroring the
    # vertical IIR pass down columns (gaussian.rs:124-185).
    over = "PARTITION BY bucket ORDER BY user_id"
    num, den = _tap_terms("mv", over)
    return f"""
WITH cell AS (
  SELECT date_trunc('hour', ts) AS bucket, user_id, AVG(value) AS mv
  FROM events GROUP BY 1, 2
)
SELECT bucket, user_id, ROUND(({num}) / ({den}), 6) AS smooth
FROM cell
"""


QUERIES["win_vertical_scan"] = lambda spark, sf_dir: shared_sql(
    spark, sf_dir, _vertical_sql(), ["events"]
)
ORACLES["win_vertical_scan"] = _vertical_sql()


def _pyramid_sql(num_scales: int = NUM_SCALES) -> str:
    """Iterated edge-clamped 2x downsample pyramid (lib.rs:68-113): at each
    scale, pairwise box means with the last element duplicated on odd
    lengths (lib.rs:181-182), per order over the linenumber sequence."""
    ctes = [
        # extra ORDER BY keys: (l_orderkey, l_linenumber) is not unique, the
        # row_number must be a total ordering for engine parity
        "lvl0 AS (SELECT l_orderkey AS g, "
        "ROW_NUMBER() OVER (PARTITION BY l_orderkey "
        "ORDER BY l_linenumber, l_extendedprice, l_quantity, l_discount) - 1 AS rn, "
        "CAST(l_quantity AS DOUBLE) AS v FROM lineitem)"
    ]
    for s in range(1, num_scales):
        p = s - 1
        # no QUALIFY (Spark SQL lacks it): window in one CTE, filter in next
        ctes.append(
            f"lvl{s}raw AS (SELECT g, rn, "
            f"(v + COALESCE(LEAD(v) OVER (PARTITION BY g ORDER BY rn), v))/2.0 AS v "
            f"FROM lvl{p})"
        )
        ctes.append(
            f"lvl{s} AS (SELECT g, CAST(FLOOR(rn/2.0) AS BIGINT) AS rn, v "
            f"FROM lvl{s}raw WHERE rn % 2 = 0)"
        )
    selects = []
    for s in range(num_scales):
        selects.append(
            f"SELECT {s} AS scale, COUNT(*) AS n_rows, ROUND(AVG(v), 6) AS avg_v FROM lvl{s}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _pyramid_df(spark: SparkSession, sf_dir: str, num_scales: int = NUM_SCALES) -> DataFrame:
    """DataFrame translation of _pyramid_sql with each level PERSISTED.

    Spark inlines the CTE chain, so the generated-SQL form re-executed
    the whole window pyramid once per UNION branch (level 5's aggregate
    re-ran levels 0-4; exchange reuse dedups only the shuffles, not the
    Sort+Window above them — ~21 window executions for 6 levels).
    Each level is materialized EAGERLY with localCheckpoint, in order:
    every window executes exactly once, and no union branch ever blocks
    on another branch's half-built cache (lazy persist was tried first —
    the union's branches race the unbuilt InMemoryRelation and stall on
    its per-partition cache locks while holding task slots, the same
    pathology bench.py documents for concurrent sinks). Expression
    arithmetic is identical term-for-term to the SQL the oracle still
    runs (same row_number keys, same (v + COALESCE(lead, v))/2.0 fold,
    same ROUND-with-EPS6 via r6), so parity is preserved. Measured at
    sf1/32c (paired in-session A/B): repeat runs 3.8-7.7 s -> ~1.1 s;
    first runs comparable."""
    from functools import reduce

    lvl = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("g"),
        (
            F.row_number().over(
                Window.partitionBy("l_orderkey").orderBy(
                    "l_linenumber", "l_extendedprice", "l_quantity", "l_discount"
                )
            )
            - 1
        ).cast("long").alias("rn"),
        F.col("l_quantity").cast("double").alias("v"),
    )
    levels = [lvl.localCheckpoint()]
    for _ in range(1, num_scales):
        w = Window.partitionBy("g").orderBy("rn")
        nxt = (
            levels[-1]
            .select(
                "g",
                "rn",
                (
                    (F.col("v") + F.coalesce(F.lead("v").over(w), F.col("v"))) / 2.0
                ).alias("v"),
            )
            .filter(F.col("rn") % 2 == 0)
            .select(
                "g",
                F.floor(F.col("rn") / 2.0).cast("long").alias("rn"),
                "v",
            )
        )
        levels.append(nxt.localCheckpoint())
    aggs = [
        lv.agg(F.count("*").alias("n_rows"), r6(F.avg("v")).alias("avg_v")).select(
            F.lit(s).alias("scale"), "n_rows", "avg_v"
        )
        for s, lv in enumerate(levels)
    ]
    return reduce(DataFrame.unionAll, aggs)


QUERIES["limit_scales"] = _pyramid_df
QUERIES["limit_scales"].__doc__ = _pyramid_df.__doc__
ORACLES["limit_scales"] = _pyramid_sql()


# --------------------------------------------------------------------------
# SSIM / edge-diff expressions over windowed moments (DataFrame API)
# --------------------------------------------------------------------------


def _pair_with_moments(spark: SparkSession, sf_dir: str):
    """events self-pair: v1 = value, v2 = deterministically distorted copy;
    windowed mu/sigma for both plus the co-moment (lib.rs:95-105)."""
    ev = load(spark, sf_dir, "events")
    v1 = F.col("value")
    v2 = F.col("value") + (F.col("event_id") % 7).cast("double") - 3.0
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-RADIUS, RADIUS)
    d = ev.select("user_id", "event_id", v1.alias("v1"), v2.alias("v2"))
    return d.select(
        "user_id",
        "event_id",
        "v1",
        "v2",
        F.avg("v1").over(w).alias("mu1"),
        F.avg("v2").over(w).alias("mu2"),
        F.avg(F.col("v1") * F.col("v1")).over(w).alias("s11"),
        F.avg(F.col("v2") * F.col("v2")).over(w).alias("s22"),
        F.avg(F.col("v1") * F.col("v2")).over(w).alias("s12"),
    )


_PAIR_SQL = f"""
SELECT user_id, event_id, v1, v2,
  AVG(v1) OVER w AS mu1, AVG(v2) OVER w AS mu2,
  AVG(v1*v1) OVER w AS s11, AVG(v2*v2) OVER w AS s22, AVG(v1*v2) OVER w AS s12
FROM (
  SELECT user_id, event_id, value AS v1,
         value + CAST(event_id % 7 AS DOUBLE) - 3.0 AS v2
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN {RADIUS} PRECEDING AND {RADIUS} FOLLOWING)
"""


@(lambda fn: (QUERIES.__setitem__("proj_ssim_expr", fn), fn)[1])
def proj_ssim_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-element SSIM' error (lib.rs:211-244): num_m = 1 - (mu1-mu2)^2;
    num_s = 2(s12 - mu1*mu2) + C2; den_s = (s11-mu1^2)+(s22-mu2^2)+C2;
    d = max(0, 1 - num_m*num_s/den_s); then L1/L4 per user (lib.rs:245-250)."""
    m = _pair_with_moments(spark, sf_dir)
    mu1, mu2 = F.col("mu1"), F.col("mu2")
    num_m = 1.0 - (mu1 - mu2) * (mu1 - mu2)
    num_s = 2.0 * (F.col("s12") - mu1 * mu2) + C2
    den_s = (F.col("s11") - mu1 * mu1) + (F.col("s22") - mu2 * mu2) + C2
    d = F.greatest(F.lit(0.0), 1.0 - (num_m * num_s) / den_s)
    return (
        m.select("user_id", d.alias("d"))
        .groupBy("user_id")
        .agg(r6(F.avg("d")).alias("l1"), r6(F.pow(F.avg(F.pow("d", 4)), 0.25)).alias("l4"))
        .orderBy("user_id")
    )


ORACLES["proj_ssim_expr"] = f"""
WITH m AS ({_PAIR_SQL})
SELECT user_id, ROUND(AVG(d), 6) AS l1, ROUND(POW(AVG(POW(d, 4)), 0.25), 6) AS l4
FROM (
  SELECT user_id, GREATEST(0.0,
    1.0 - ((1.0 - (mu1-mu2)*(mu1-mu2)) * (2.0*(s12 - mu1*mu2) + {C2!r}))
        / ((s11 - mu1*mu1) + (s22 - mu2*mu2) + {C2!r})) AS d
  FROM m
) GROUP BY user_id ORDER BY user_id
"""


@(lambda fn: (QUERIES.__setitem__("proj_edgediff_expr", fn), fn)[1])
def proj_edgediff_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-diff map (lib.rs:274-289): d1 = (1+|v2-mu2|)/(1+|v1-mu1|) - 1;
    artifact = max(d1, 0) (added), detail_lost = max(-d1, 0) (missing) —
    the added/missing violation-class split."""
    m = _pair_with_moments(spark, sf_dir)
    d1 = (1.0 + F.abs(F.col("v2") - F.col("mu2"))) / (1.0 + F.abs(F.col("v1") - F.col("mu1"))) - 1.0
    return (
        m.select(
            "user_id",
            F.greatest(d1, F.lit(0.0)).alias("artifact"),
            F.greatest(-d1, F.lit(0.0)).alias("detail_lost"),
        )
        .groupBy("user_id")
        .agg(
            r6(F.avg("artifact")).alias("artifact_l1"),
            r6(F.pow(F.avg(F.pow("artifact", 4)), 0.25)).alias("artifact_l4"),
            r6(F.avg("detail_lost")).alias("detail_l1"),
            r6(F.pow(F.avg(F.pow("detail_lost", 4)), 0.25)).alias("detail_l4"),
        )
        .orderBy("user_id")
    )


ORACLES["proj_edgediff_expr"] = f"""
WITH m AS ({_PAIR_SQL})
SELECT user_id,
  ROUND(AVG(artifact), 6) AS artifact_l1,
  ROUND(POW(AVG(POW(artifact, 4)), 0.25), 6) AS artifact_l4,
  ROUND(AVG(detail_lost), 6) AS detail_l1,
  ROUND(POW(AVG(POW(detail_lost, 4)), 0.25), 6) AS detail_l4
FROM (
  SELECT user_id,
    GREATEST((1.0 + ABS(v2-mu2))/(1.0 + ABS(v1-mu1)) - 1.0, 0.0) AS artifact,
    GREATEST(-((1.0 + ABS(v2-mu2))/(1.0 + ABS(v1-mu1)) - 1.0), 0.0) AS detail_lost
  FROM m
) GROUP BY user_id ORDER BY user_id
"""
