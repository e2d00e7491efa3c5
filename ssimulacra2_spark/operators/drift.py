"""Distribution-drift scoring between snapshot pairs — the engine's graft
of the full SSIMULACRA2 pipeline (/root/reference/ssimulacra2/src/lib.rs):

  text -> numeric feature channels        (≙ planar Xyb channels, lib.rs:84-93)
  -> paired alignment on (conv, turn)     (≙ elementwise zip, lib.rs:157-163)
  -> 6-scale edge-clamped 2x rollup       (≙ downscale_by_2, lib.rs:165-195)
  -> kernel-windowed mu/sigma/cov         (≙ 5 blurs, lib.rs:95-105)
  -> ssim + edgediff error expressions    (≙ ssim_map/edge_diff_map, lib.rs:197-299)
  -> L1/L4 norms per (partition,channel)  (≙ lib.rs:245-250)
  -> broadcast-weighted reduce + calibration -> 0-100 health score
                                          (≙ score(), lib.rs:344-487)

plus PSI/KS over per-partition histograms (classic drift stats over the
same merged-count machinery). Everything is DataFrame ops — the only
shuffles are the pair join, the per-scale row_number windows (partitioned
by conversation — bounded), and the final per-partition agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import CheckSuiteConfig
from ..constants import (
    C2,
    CALIB_CUBIC_1,
    CALIB_CUBIC_2,
    CALIB_CUBIC_3,
    CALIB_LINEAR,
    CALIB_POW,
    KERNEL_TAPS,
)
from .checks import CheckOutput


def featurize(df: DataFrame, cfg: CheckSuiteConfig) -> DataFrame:
    """Pivot the prepared channel columns (ch_<name>, computed once in
    checks.prepare — ≙ xyb_to_planar lib.rs:137-155) to long format:
    (partition_id, conv_id, turn_idx, channel, v), v in ~[0, 1]."""
    chans = list(cfg.channels)
    # ch_<name> are f32 (see drift_arrow.channel_expr); upcast here so all
    # windowed-moment arithmetic runs in f64 over the f32-quantized values,
    # matching the Arrow path and the oracle exactly
    stack_args = ", ".join(f"'{c}', CAST(ch_{c} AS DOUBLE)" for c in chans)
    return df.selectExpr(
        "partition_id",
        "conv_id",
        "turn_idx",
        f"stack({len(chans)}, {stack_args}) AS (channel, v)",
    )


def pair(ref_f: DataFrame, cand_f: DataFrame) -> DataFrame:
    """Aligned pair join (inner: missing/added rows are text_parity's job)."""
    c = cand_f.select("conv_id", "turn_idx", "channel", F.col("v").alias("v2"))
    return (
        ref_f.withColumnRenamed("v", "v1")
        .join(c, ["conv_id", "turn_idx", "channel"])
        .select(
            "partition_id",
            "conv_id",
            "channel",
            F.col("turn_idx").cast("long").alias("idx"),
            "v1",
            "v2",
        )
    )


def downsample_2x(paired: DataFrame) -> DataFrame:
    """Edge-clamped pairwise mean along the turn axis per (conv, channel)
    (≙ downscale_by_2 lib.rs:165-195; clamp lib.rs:181-182): odd tails pair
    with themselves via lead(..) default."""
    w = Window.partitionBy("conv_id", "channel").orderBy("idx")
    d = paired.withColumn("rn", F.row_number().over(w) - 1)
    wl = Window.partitionBy("conv_id", "channel").orderBy("rn")
    out = (
        d.withColumn("v1n", F.coalesce(F.lead("v1").over(wl), F.col("v1")))
        .withColumn("v2n", F.coalesce(F.lead("v2").over(wl), F.col("v2")))
        .filter(F.col("rn") % 2 == 0)
        .select(
            "partition_id",
            "conv_id",
            "channel",
            F.floor(F.col("rn") / 2).alias("idx"),
            ((F.col("v1") + F.col("v1n")) / 2.0).alias("v1"),
            ((F.col("v2") + F.col("v2n")) / 2.0).alias("v2"),
        )
    )
    return out


def _w() -> Window:
    # built lazily: Window specs need an active SparkSession
    return Window.partitionBy("conv_id", "channel").orderBy("idx")


def _kernel_sum(col: str, taps: list[float]) -> Column:
    """Sum_i w_i * series[n+i] with NULL-skip (edge)."""
    r = len(taps) // 2
    w_spec = _w()
    terms = []
    for i in range(-r, r + 1):
        w = taps[i + r]
        if i < 0:
            c = F.lag(col, -i).over(w_spec)
        elif i > 0:
            c = F.lead(col, i).over(w_spec)
        else:
            c = F.col(col)
        terms.append(F.coalesce(F.lit(w) * c, F.lit(0.0)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _presence_denom(taps: list[float]) -> Column:
    """Sum of tap weights whose neighbor exists — the edge renormalization
    (reference zero-pads, gaussian.rs:50-61; Spark frames shrink, so we
    renormalize: SURVEY §7.2)."""
    r = len(taps) // 2
    w_spec = _w()
    terms = []
    for i in range(-r, r + 1):
        w = taps[i + r]
        if i < 0:
            c = F.lag("v1", -i).over(w_spec)
        elif i > 0:
            c = F.lead("v1", i).over(w_spec)
        else:
            c = F.col("v1")
        terms.append(F.when(c.isNotNull(), F.lit(w)).otherwise(F.lit(0.0)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def windowed_moments(paired: DataFrame, cfg: CheckSuiteConfig) -> DataFrame:
    """The 5 smoothings of the reference (blur of v1, v2, v1^2, v2^2, v1*v2
    — lib.rs:95-105) as kernel-weighted window sums sharing one
    renormalization denominator."""
    taps = KERNEL_TAPS
    d = paired.select(
        "partition_id",
        "conv_id",
        "channel",
        "idx",
        "v1",
        "v2",
        (F.col("v1") * F.col("v1")).alias("v11"),
        (F.col("v2") * F.col("v2")).alias("v22"),
        (F.col("v1") * F.col("v2")).alias("v12"),
    )
    den = _presence_denom(taps)
    return d.select(
        "partition_id",
        "conv_id",
        "channel",
        "idx",
        "v1",
        "v2",
        (_kernel_sum("v1", taps) / den).alias("mu1"),
        (_kernel_sum("v2", taps) / den).alias("mu2"),
        (_kernel_sum("v11", taps) / den).alias("s11"),
        (_kernel_sum("v22", taps) / den).alias("s22"),
        (_kernel_sum("v12", taps) / den).alias("s12"),
    )


def scale_metrics(moments: DataFrame, scale: int) -> DataFrame:
    """ssim + edgediff error maps -> L1/L4 norms per (partition, channel)
    (lib.rs:197-299). Long metrics: (partition_id, channel, scale, map,
    norm, value)."""
    mu1, mu2 = F.col("mu1"), F.col("mu2")
    num_m = 1.0 - (mu1 - mu2) * (mu1 - mu2)
    num_s = 2.0 * (F.col("s12") - mu1 * mu2) + C2
    den_s = (F.col("s11") - mu1 * mu1) + (F.col("s22") - mu2 * mu2) + C2
    d_ssim = F.greatest(F.lit(0.0), 1.0 - (num_m * num_s) / den_s)
    d1 = (1.0 + F.abs(F.col("v2") - mu2)) / (1.0 + F.abs(F.col("v1") - mu1)) - 1.0
    maps = moments.select(
        "partition_id",
        "channel",
        d_ssim.alias("ssim"),
        F.greatest(d1, F.lit(0.0)).alias("artifact"),
        F.greatest(-d1, F.lit(0.0)).alias("detail"),
    )
    agg = maps.groupBy("partition_id", "channel").agg(
        F.avg("ssim").alias("ssim_l1"),
        F.pow(F.avg(F.pow("ssim", 4)), 0.25).alias("ssim_l4"),
        F.avg("artifact").alias("artifact_l1"),
        F.pow(F.avg(F.pow("artifact", 4)), 0.25).alias("artifact_l4"),
        F.avg("detail").alias("detail_l1"),
        F.pow(F.avg(F.pow("detail", 4)), 0.25).alias("detail_l4"),
    )
    return agg.selectExpr(
        "partition_id",
        "channel",
        f"{scale} AS scale",
        "stack(6, 'ssim','l1',ssim_l1, 'ssim','l4',ssim_l4,"
        " 'artifact','l1',artifact_l1, 'artifact','l4',artifact_l4,"
        " 'detail','l1',detail_l1, 'detail','l4',detail_l4) AS (map, norm, value)",
    )


def calibrated_score(metrics: DataFrame, cfg: CheckSuiteConfig) -> DataFrame:
    """Broadcast-weighted 108-term reduce + nonlinear calibration
    (lib.rs:344-487). Returns (partition_id, score)."""
    from ..constants import default_weights

    spark = metrics.sparkSession
    wdf = spark.createDataFrame(
        default_weights(cfg.channels, cfg.num_scales),
        ["channel", "scale", "map", "norm", "weight"],
    )
    s = (
        metrics.join(F.broadcast(wdf), ["channel", "scale", "map", "norm"])
        .groupBy("partition_id")
        .agg(F.sum(F.col("weight") * F.abs(F.col("value"))).alias("ssum"))
    )
    # the raw weighted sum is in [0, ~1]; rescale into the reference's
    # working range before the published calibration polynomial
    sc = F.col("ssum") * 10.0 * CALIB_LINEAR
    cubic = CALIB_CUBIC_3 * sc * sc * sc + CALIB_CUBIC_2 * sc * sc + CALIB_CUBIC_1 * sc
    score = F.when(cubic > 0.0, 100.0 - 10.0 * F.pow(cubic, CALIB_POW)).otherwise(F.lit(100.0))
    return s.select("partition_id", score.alias("score"))


def drift_score_check(
    ref: DataFrame, cand: DataFrame, parts: DataFrame, cfg: CheckSuiteConfig
) -> CheckOutput:
    ref_f = featurize(ref, cfg)
    cand_f = featurize(cand, cfg)
    paired = pair(ref_f, cand_f)
    all_metrics = []
    cur = paired
    for s in range(cfg.num_scales):
        if s > 0:
            cur = downsample_2x(cur)
        m = windowed_moments(cur, cfg)
        all_metrics.append(scale_metrics(m, s))
    metrics = all_metrics[0]
    for m in all_metrics[1:]:
        metrics = metrics.unionByName(m)
    scores = calibrated_score(metrics, cfg)
    verdicts = (
        parts.select("partition_id")
        .join(scores, "partition_id", "left")
        .select(
            F.col("partition_id").cast("int"),
            F.lit("drift_score").alias("check_id"),
            F.coalesce(F.col("score") >= cfg.score_threshold, F.lit(True)).alias("passed"),
            F.lit(0).cast("long").alias("n_violations"),
            F.col("score").cast("double").alias("score"),
        )
    )
    return CheckOutput(verdicts=verdicts, metrics=metrics)


# --------------------------------------------------------------------------
# PSI / KS over per-partition histograms
# --------------------------------------------------------------------------


def psi_ks_check(
    ref: DataFrame, cand: DataFrame, parts: DataFrame, cfg: CheckSuiteConfig
) -> CheckOutput:
    """PSI + KS on the text-length distribution per partition. Histogram =
    map-side-combinable counts per (partition, bin); fixed [0, 2048] range
    so no global pass is needed (mergeable across 10^12 rows)."""
    eps = 1e-6
    nb = cfg.drift_bins

    def binned(df: DataFrame, name: str) -> DataFrame:
        b = F.least(
            F.lit(nb - 1),
            F.floor(F.least(F.coalesce(F.col("text_len"), F.lit(0)), F.lit(2047)) / (2048 / nb)),
        ).cast("int")
        return df.groupBy("partition_id", b.alias("bin")).agg(F.count("*").alias(name))

    j = binned(ref, "n_ref").join(binned(cand, "n_cand"), ["partition_id", "bin"], "full_outer").fillna(
        0, ["n_ref", "n_cand"]
    )
    tot = j.groupBy("partition_id").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cand").alias("t_cand")
    )
    shares = j.join(tot, "partition_id").select(
        "partition_id",
        "bin",
        (F.col("n_ref") / F.col("t_ref") + eps).alias("p"),
        (F.col("n_cand") / F.col("t_cand") + eps).alias("q"),
    )
    w = Window.partitionBy("partition_id").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = shares.select(
        "partition_id",
        ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi_term"),
        F.abs(F.sum("p").over(w) - F.sum("q").over(w)).alias("gap"),
    )
    stats = cum.groupBy("partition_id").agg(
        F.sum("psi_term").alias("psi"), F.max("gap").alias("ks")
    )
    verdicts = (
        parts.select("partition_id")
        .join(stats, "partition_id", "left")
        .select(
            F.col("partition_id").cast("int"),
            F.lit("psi_ks").alias("check_id"),
            (
                (F.coalesce(F.col("psi"), F.lit(0.0)) <= cfg.psi_threshold)
                & (F.coalesce(F.col("ks"), F.lit(0.0)) <= cfg.ks_threshold)
            ).alias("passed"),
            F.lit(0).cast("long").alias("n_violations"),
            F.col("psi").cast("double").alias("score"),
        )
    )
    return CheckOutput(verdicts=verdicts)


def emb_drift_check(
    ref: DataFrame, cand: DataFrame, parts: DataFrame, cfg: CheckSuiteConfig
) -> CheckOutput:
    """Per-partition embedding-centroid drift between the snapshot pair.

    Each turn's channel vector (the prepared ch_<name> features — the
    engine's per-turn embedding) is averaged into one centroid per
    (partition, side); the check passes iff the cosine between the two
    centroids stays >= cfg.emb_drift_min_cos. Complements psi_ks (which
    watches ONE marginal distribution): a coordinated shift across
    channels moves the centroid even when each marginal looks calm.

    Scale shape: AVG is map-side combinable, so the corpus contributes
    only partial sums per partition — ONE tiny shuffle of
    n_buckets x n_channels partials per side, then an n_buckets-row join.
    Nothing here grows with corpus size; this is the same centroid/cosine
    machinery as registry/ivf.py's coarse quantizer, applied at suite
    scale. Ref analog: the weighted cross-plane reduce, lib.rs:344-487.
    """
    chans = [c for c in cfg.emb_channels if c in cfg.channels]
    if not chans:
        raise ValueError("emb_channels must be a non-empty subset of channels")

    def centroid(side: DataFrame, tag: str) -> DataFrame:
        return side.groupBy("partition_id").agg(
            *[
                F.avg(F.col(f"ch_{c}").cast("double")).alias(f"{tag}{i}")
                for i, c in enumerate(chans)
            ]
        )

    j = (
        parts.select("partition_id")
        .join(centroid(ref, "a"), "partition_id", "left")
        .join(centroid(cand, "b"), "partition_id", "left")
    )
    dot = sum(
        (F.col(f"a{i}") * F.col(f"b{i}") for i in range(1, len(chans))),
        F.col("a0") * F.col("b0"),
    )
    na = F.sqrt(
        sum((F.col(f"a{i}") * F.col(f"a{i}") for i in range(1, len(chans))), F.col("a0") * F.col("a0"))
    )
    nb = F.sqrt(
        sum((F.col(f"b{i}") * F.col(f"b{i}") for i in range(1, len(chans))), F.col("b0") * F.col("b0"))
    )
    cos = dot / (na * nb)  # null when a side is missing or has zero norm
    verdicts = j.select(
        F.col("partition_id").cast("int"),
        F.lit("emb_drift").alias("check_id"),
        F.coalesce(cos >= F.lit(cfg.emb_drift_min_cos), F.lit(False)).alias("passed"),
        F.lit(0).cast("long").alias("n_violations"),
        cos.cast("double").alias("score"),
    )
    return CheckOutput(verdicts=verdicts)


def psi_emb_fused_check(
    ref: DataFrame, cand: DataFrame, parts: DataFrame, cfg: CheckSuiteConfig
) -> CheckOutput:
    """psi_ks + emb_drift from ONE scan per side.

    Standalone, emb_drift pays two full featurization scans (ref + cand)
    just to average the channel vectors — measured 3.97 s isolated at
    8M turns/32c, almost all of it the scan the psi_ks branch performs
    anyway. Fused: each side aggregates once to (partition, text_len-bin)
    with BOTH the histogram count and per-channel partial sums; the
    psi/ks statistics read the counts exactly as psi_ks_check does, and
    the centroids re-aggregate the partial sums per partition
    (sum-of-sums / sum-of-counts — same values as a direct AVG up to f64
    summation order, pinned at 1e-9 by pytest). One scan, one
    map-side-combinable shuffle per side serves both checks."""
    eps = 1e-6
    nb = cfg.drift_bins
    chans = [c for c in cfg.emb_channels if c in cfg.channels]
    if not chans:
        raise ValueError("emb_channels must be a non-empty subset of channels")

    def agg_side(df: DataFrame, tag: str) -> DataFrame:
        b = F.least(
            F.lit(nb - 1),
            F.floor(
                F.least(F.coalesce(F.col("text_len"), F.lit(0)), F.lit(2047)) / (2048 / nb)
            ),
        ).cast("int")
        return df.groupBy("partition_id", b.alias("bin")).agg(
            F.count("*").alias(f"n_{tag}"),
            *[
                F.sum(F.col(f"ch_{c}").cast("double")).alias(f"s_{tag}{i}")
                for i, c in enumerate(chans)
            ],
        )

    j = (
        agg_side(ref, "ref")
        .join(agg_side(cand, "cand"), ["partition_id", "bin"], "full_outer")
        .fillna(0, ["n_ref", "n_cand"])
    )

    # --- psi/ks over the counts (identical math to psi_ks_check) ---
    tot = j.groupBy("partition_id").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cand").alias("t_cand")
    )
    shares = j.join(tot, "partition_id").select(
        "partition_id",
        "bin",
        (F.col("n_ref") / F.col("t_ref") + eps).alias("p"),
        (F.col("n_cand") / F.col("t_cand") + eps).alias("q"),
    )
    w = Window.partitionBy("partition_id").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = shares.select(
        "partition_id",
        ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi_term"),
        F.abs(F.sum("p").over(w) - F.sum("q").over(w)).alias("gap"),
    )
    stats = cum.groupBy("partition_id").agg(
        F.sum("psi_term").alias("psi"), F.max("gap").alias("ks")
    )
    psi_verdicts = (
        parts.select("partition_id")
        .join(stats, "partition_id", "left")
        .select(
            F.col("partition_id").cast("int"),
            F.lit("psi_ks").alias("check_id"),
            (
                (F.coalesce(F.col("psi"), F.lit(0.0)) <= cfg.psi_threshold)
                & (F.coalesce(F.col("ks"), F.lit(0.0)) <= cfg.ks_threshold)
            ).alias("passed"),
            F.lit(0).cast("long").alias("n_violations"),
            F.col("psi").cast("double").alias("score"),
        )
    )

    # --- centroid cosine over the partial sums (bins collapse away) ---
    # side-missing bins carry n=0 (fillna) and NULL partial sums, so
    # sum(s)/sum(n) is exactly the side's mean; a partition with zero rows
    # on a side yields NULL -> cos NULL -> passed=False, matching the
    # standalone check's left-join-miss behavior
    cents = j.groupBy("partition_id").agg(
        *[(F.sum(f"s_ref{i}") / F.sum("n_ref")).alias(f"a{i}") for i in range(len(chans))],
        *[(F.sum(f"s_cand{i}") / F.sum("n_cand")).alias(f"b{i}") for i in range(len(chans))],
    )
    dot = sum(
        (F.col(f"a{i}") * F.col(f"b{i}") for i in range(1, len(chans))),
        F.col("a0") * F.col("b0"),
    )
    na = F.sqrt(
        sum((F.col(f"a{i}") * F.col(f"a{i}") for i in range(1, len(chans))), F.col("a0") * F.col("a0"))
    )
    nbn = F.sqrt(
        sum((F.col(f"b{i}") * F.col(f"b{i}") for i in range(1, len(chans))), F.col("b0") * F.col("b0"))
    )
    cos = dot / (na * nbn)
    emb_verdicts = (
        parts.select("partition_id")
        .join(cents, "partition_id", "left")
        .select(
            F.col("partition_id").cast("int"),
            F.lit("emb_drift").alias("check_id"),
            F.coalesce(cos >= F.lit(cfg.emb_drift_min_cos), F.lit(False)).alias("passed"),
            F.lit(0).cast("long").alias("n_violations"),
            cos.cast("double").alias("score"),
        )
    )
    return CheckOutput(verdicts=psi_verdicts.unionByName(emb_verdicts))
