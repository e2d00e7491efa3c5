"""Distribution-drift queries (PSI / KS between two snapshots) and the
streaming-surface batch equivalent.

The engine-grade drift machinery (merged histograms + sketches per
partition pair) lives in operators/drift.py; this registry entry
demonstrates the same math on an events split with a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import load, r6

QUERIES = {}
ORACLES = {}

_N_BINS = 20
_EPS = 1e-6


@(lambda fn: (QUERIES.__setitem__("psi_ks_drift", fn), fn)[1])
def psi_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI + KS drift between two halves of events (even/odd event_id as
    ref/cand snapshots). Fixed bin edges from the global min/max (two
    scalar aggregates, broadcast); per-bin shares, PSI = sum((p-q)*ln(p/q))
    with epsilon floor, KS = max |cumP - cumQ|. At 100 TB the histogram is
    a map-side-combinable count per (partition, bin) — one narrow shuffle.

    Graft: drift stats between snapshots ≙ the SSIM drift machinery over
    paired planes (/root/reference/ssimulacra2/src/lib.rs:197-299)."""
    ev = load(spark, sf_dir, "events")
    side = ev.select(
        (F.col("event_id") % 2 == 0).alias("is_ref"),
        F.col("value").cast("double").alias("v"),
    )
    rng = side.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = side.crossJoin(F.broadcast(rng)).select(
        "is_ref",
        F.least(
            F.lit(_N_BINS - 1),
            F.floor((F.col("v") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / _N_BINS)).cast("int"),
        ).alias("bin"),
    )
    counts = (
        binned.groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cand"),
        )
    )
    tot = counts.agg(F.sum("n_ref").alias("t_ref"), F.sum("n_cand").alias("t_cand"))
    shares = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        (F.col("n_ref") / F.col("t_ref") + _EPS).alias("p"),
        (F.col("n_cand") / F.col("t_cand") + _EPS).alias("q"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = shares.select(
        "bin",
        ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi_term"),
        F.abs(F.sum("p").over(w) - F.sum("q").over(w)).alias("cdf_gap"),
    )
    return cum.agg(r6(F.sum("psi_term")).alias("psi"), r6(F.max("cdf_gap")).alias("ks"))


ORACLES["psi_ks_drift"] = f"""
WITH side AS (
  SELECT event_id % 2 = 0 AS is_ref, CAST(value AS DOUBLE) AS v FROM events
),
rng AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM side),
binned AS (
  SELECT is_ref,
    LEAST({_N_BINS - 1}, CAST(FLOOR((v - lo) / ((hi - lo) / {_N_BINS})) AS INT)) AS bin
  FROM side, rng
),
counts AS (
  SELECT bin,
    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
    SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cand
  FROM binned GROUP BY bin
),
tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cand) AS t_cand FROM counts),
shares AS (
  SELECT bin, n_ref / t_ref + {_EPS!r} AS p, n_cand / t_cand + {_EPS!r} AS q
  FROM counts, tot
),
cum AS (
  SELECT bin, (p - q) * LN(p / q) AS psi_term,
    ABS(SUM(p) OVER w - SUM(q) OVER w) AS cdf_gap
  FROM shares
  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT ROUND(SUM(psi_term), 6) AS psi, ROUND(MAX(cdf_gap), 6) AS ks FROM cum
"""


@(lambda fn: (QUERIES.__setitem__("stream_tumbling_counts", fn), fn)[1])
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of the streaming surface: tumbling 1-hour windows
    over event time (streaming/validate_stream.py runs the identical
    aggregation via readStream + watermark; Structured Streaming's
    incremental execution reuses this same logical plan)."""
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), r6(F.avg("value")).alias("mean_v"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type",
            "n",
            "mean_v",
        )
    )


ORACLES["stream_tumbling_counts"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS win_start,
       event_type, COUNT(*) AS n, ROUND(AVG(value), 6) AS mean_v
FROM events GROUP BY 1, 2
"""


@(lambda fn: (QUERIES.__setitem__("stream_session_counts", fn), fn)[1])
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of streaming session windows: Spark's built-in
    session_window(ts, gap) — the Structured Streaming form of
    sessionize_gap (streaming/validate_stream.py::session_stream runs the
    identical aggregation incrementally with a watermark; state closes
    when event time passes session end, tests/test_streaming.py).

    Boundary semantics pinned by the oracle AND verified empirically:
    Spark's session_window MERGES an event arriving exactly gap after
    the previous one (two events 1800s apart with a 30-minute gap form
    ONE session) — a new session starts only when the gap EXCEEDS the
    threshold, the same > convention as sessionize_gap. The oracle's
    is_start therefore uses > 1800."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            "user_id",
            "n_events",
            "first_event",
            "last_event",
        )
    )


ORACLES["stream_session_counts"] = """
WITH lagged AS (
  SELECT user_id, event_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
              OR date_part('epoch', ts) - date_part('epoch', prev_ts) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM lagged
),
sess AS (
  SELECT user_id, event_id, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start, user_id,
       COUNT(*) AS n_events, MIN(event_id) AS first_event,
       MAX(event_id) AS last_event
FROM sess GROUP BY user_id, sid
"""


_CENT_MIN_COS = 0.98


@(lambda fn: (QUERIES.__setitem__("stream_centroid_drift", fn), fn)[1])
def stream_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of the streaming centroid monitor
    (streaming/validate_stream.py::centroid_stream): per 1-hour window,
    the even/odd event_id halves act as ref/cand snapshots; each side's
    centroid over the (value, props-length) feature pair is a mergeable
    AVG, and the verdict is the cosine between the two centroids —
    exactly the emb_drift math at window granularity. One narrow
    map-combinable shuffle per side; the cosine join is n_windows rows."""
    ev = load(spark, sf_dir, "events")
    side = ev.select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias("win_start"),
        (F.col("event_id") % 2 == 0).alias("is_ref"),
        F.col("value").cast("double").alias("v"),
        F.length(F.coalesce(F.col("props"), F.lit(""))).cast("double").alias("pl"),
    )
    c = side.groupBy("win_start").agg(
        F.avg(F.when(F.col("is_ref"), F.col("v"))).alias("rv"),
        F.avg(F.when(F.col("is_ref"), F.col("pl"))).alias("rp"),
        F.avg(F.when(~F.col("is_ref"), F.col("v"))).alias("cv"),
        F.avg(F.when(~F.col("is_ref"), F.col("pl"))).alias("cp"),
    )
    cos = (F.col("rv") * F.col("cv") + F.col("rp") * F.col("cp")) / (
        F.sqrt(F.col("rv") * F.col("rv") + F.col("rp") * F.col("rp"))
        * F.sqrt(F.col("cv") * F.col("cv") + F.col("cp") * F.col("cp"))
    )
    # flag derives from the SAME rounded expression reported as cos_shift
    # so a near-threshold cosine flips identically on both engines (flag
    # parity inherits r6/EPS6 rounding parity)
    return c.select(
        "win_start",
        r6(cos).alias("cos_shift"),
        F.coalesce(r6(cos) >= F.lit(_CENT_MIN_COS), F.lit(False)).alias("stable"),
    )


ORACLES["stream_centroid_drift"] = f"""
WITH side AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS win_start,
         event_id % 2 = 0 AS is_ref,
         CAST(value AS DOUBLE) AS v,
         CAST(length(COALESCE(props, '')) AS DOUBLE) AS pl
  FROM events
),
c AS (
  SELECT win_start,
         AVG(CASE WHEN is_ref THEN v END) AS rv,
         AVG(CASE WHEN is_ref THEN pl END) AS rp,
         AVG(CASE WHEN NOT is_ref THEN v END) AS cv,
         AVG(CASE WHEN NOT is_ref THEN pl END) AS cp
  FROM side GROUP BY win_start
)
SELECT win_start,
       ROUND((rv * cv + rp * cp) / (SQRT(rv * rv + rp * rp) * SQRT(cv * cv + cp * cp)), 6)
         AS cos_shift,
       COALESCE(ROUND((rv * cv + rp * cp) / (SQRT(rv * rv + rp * rp) * SQRT(cv * cv + cp * cp)), 6)
         >= {_CENT_MIN_COS!r}, FALSE) AS stable
FROM c
"""


# ~P10 of the successive-window cosine on the synthetic events table —
# alerts are the exceptional signal (~9% of windows), not the default
_ALERT_MIN_COS = 0.85


@(lambda fn: (QUERIES.__setitem__("stream_centroid_alert", fn), fn)[1])
def stream_centroid_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of the streaming successive-window drift ALERT
    (streaming/validate_stream.py::centroid_alert_stream): per
    event_type, the centroid of each 1-hour window is compared to the
    centroid of the window immediately before it; an alert fires when
    the rounded cosine drops below threshold. The per-(type, hour)
    centroid is one map-combinable shuffle; the successive-window
    comparison is a self-join of the tiny aggregate on
    (event_type, hour - 1h) — n_types x n_windows rows regardless of
    event volume, so it broadcasts. Flag derives from the SAME rounded
    expression reported as cos_prev (rounding-parity convention).
    Reference analog: the per-frame score stream consumed by a rolling
    monitor, video.rs:484-495."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.avg(F.col("value").cast("double")).alias("cv"),
        F.avg(
            F.length(F.coalesce(F.col("props"), F.lit(""))).cast("double")
        ).alias("cp"),
    )
    prev = c.select(
        "event_type",
        (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("h"),
        F.col("cv").alias("pv"),
        F.col("cp").alias("pp"),
    )
    j = c.join(prev, ["event_type", "h"])
    cos = (F.col("cv") * F.col("pv") + F.col("cp") * F.col("pp")) / (
        F.sqrt(F.col("cv") * F.col("cv") + F.col("cp") * F.col("cp"))
        * F.sqrt(F.col("pv") * F.col("pv") + F.col("pp") * F.col("pp"))
    )
    return j.select(
        F.date_format("h", "yyyy-MM-dd HH:mm").alias("win_start"),
        "event_type",
        r6(cos).alias("cos_prev"),
        (r6(cos) < F.lit(_ALERT_MIN_COS)).alias("alert"),
    )


ORACLES["stream_centroid_alert"] = f"""
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         AVG(CAST(value AS DOUBLE)) AS cv,
         AVG(CAST(length(COALESCE(props, '')) AS DOUBLE)) AS cp
  FROM events GROUP BY 1, 2
)
SELECT strftime(a.h, '%Y-%m-%d %H:%M') AS win_start, a.event_type,
       ROUND((a.cv * b.cv + a.cp * b.cp)
             / (SQRT(a.cv * a.cv + a.cp * a.cp) * SQRT(b.cv * b.cv + b.cp * b.cp)), 6)
         AS cos_prev,
       (ROUND((a.cv * b.cv + a.cp * b.cp)
             / (SQRT(a.cv * a.cv + a.cp * a.cp) * SQRT(b.cv * b.cv + b.cp * b.cp)), 6)
         < {_ALERT_MIN_COS!r}) AS alert
FROM c a JOIN c b ON b.event_type = a.event_type AND b.h = a.h - INTERVAL 1 HOUR
"""


@(lambda fn: (QUERIES.__setitem__("stream_dedup_counts", fn), fn)[1])
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of the streaming ingest dedup
    (streaming/validate_stream.py::dedup_stream — dropDuplicates bounded
    by an event-time watermark): duplicates are injected deterministically
    (every 7th event re-appended), then deduplicated on the key and
    counted per type. The streaming path runs the same logical dedup with
    watermark-bounded state (tests/test_streaming.py)."""
    ev = load(spark, sf_dir, "events")
    dup = ev.unionByName(ev.filter(F.col("event_id") % 7 == 0))
    deduped = dup.dropDuplicates(["user_id", "event_id"])
    return deduped.groupBy("event_type").agg(F.count("*").alias("n_events"))


ORACLES["stream_dedup_counts"] = """
WITH dup AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id % 7 = 0
),
d AS (
  SELECT DISTINCT user_id, event_id, event_type FROM dup
)
SELECT event_type, COUNT(*) AS n_events FROM d GROUP BY event_type
"""
