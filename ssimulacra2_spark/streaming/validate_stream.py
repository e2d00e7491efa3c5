"""Structured Streaming surface of the engine.

The reference's only streaming trait is stdin y4m decode + a bounded
worker queue (/root/reference/ssimulacra2_bin/src/video.rs:198-232,
134-168) — batch per-frame with incremental collection. The engine's
streaming path mirrors that shape idiomatically: a file-source stream of
transcript rows, event-time tumbling-window stats with a watermark for
late turns, and a custom stateful per-conversation monotonicity check via
applyInPandasWithState (state = last seen (turn_idx, ts) per conv).

Batch/stream parity: the windowed aggregation is the same logical plan as
registry.drift.stream_tumbling_counts — Structured Streaming executes it
incrementally; tests drive both with trigger(availableNow=True) and
compare against the batch result.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_transcript_stream(spark: SparkSession, in_dir: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_dir)
    )


def windowed_stats_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h event-time stats per window (late rows beyond the
    watermark are dropped — the streaming analog of the stride/skip
    admission controls, video.rs:145-161)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.avg(F.length("text")).alias("mean_len"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(F.col("w.start").alias("win_start"), "role", "n_turns", "mean_len", "approx_convs")
    )


def centroid_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-window channel centroid of the transcript stream — the
    incremental form of the emb_drift centroid build (operators/drift.
    emb_drift_check): each tumbling window accumulates mergeable partial
    sums for the cheap channel pair (length, xxhash bucket), so a drift
    monitor can compare successive windows' centroids as they close.
    Watermark bounds the open-window state exactly like the batch check
    bounds its shuffle (n_windows x n_dims partials)."""
    t = F.coalesce(F.col("text"), F.lit(""))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.avg(F.length(t)).alias("c_len"),
            F.avg(F.pmod(F.xxhash64(t), F.lit(4096)) / 4096.0).alias("c_hash"),
            F.count("*").alias("n_turns"),
        )
        .select(F.col("w.start").alias("win_start"), "c_len", "c_hash", "n_turns")
    )


_STATE_SCHEMA = StructType(
    [StructField("last_turn", IntegerType()), StructField("n_seen", LongType())]
)
_OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("violation", StringType()),
    ]
)


def _monotone_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-conversation strictly-increasing
    turn_idx across micro-batches (≙ the atomically claimed, strictly
    increasing frame index, video.rs:159-161). State: (last_turn, n_seen).

    Vectorized (no per-row Python, per the north rule): after sorting a
    batch ascending, the "last accepted turn" seen by row i is
    max(carried_last, t[i-1]) — so the violation mask is a single
    elementwise compare; only actual violations (rare) format messages."""
    import numpy as np

    (conv_id,) = key
    if state.exists:
        last_turn, n_seen = state.get
    else:
        last_turn, n_seen = -1, 0
    outs = []
    for pdf in pdfs:
        t = np.sort(pdf["turn_idx"].to_numpy(np.int64))
        n_seen += len(t)
        if len(t) == 0:
            continue
        prev = np.empty_like(t)
        prev[0] = last_turn
        np.maximum(t[:-1], last_turn, out=prev[1:])
        bad = t <= prev
        if bad.any():
            tb, pb = t[bad], prev[bad]
            outs.append(
                pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "turn_idx": tb.astype("int32"),
                        "violation": [
                            f"turn_idx {x} <= last seen {p}" for x, p in zip(tb, pb)
                        ],
                    }
                )
            )
        last_turn = int(max(last_turn, t[-1]))
    state.update((int(last_turn), int(n_seen)))
    yield from outs


def session_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming session windows per conversation: Spark's built-in
    session_window merges turns separated by < gap; the watermark lets
    the state store CLOSE a session (and emit its final row) once event
    time passes session-end + watermark, so state is bounded by open
    sessions only. This is the incremental form of the batch
    sessionization (registry stream_session_counts / sessionize_gap) —
    the session-assembly stage of a streaming training-data pipeline."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "conv_id",
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on the transcript key: state holds each seen
    (conv_id, turn_idx) only until the event-time watermark passes it, so
    state size is bounded by the watermark window instead of the full
    history — the streaming analog of dedup_exact for an ingest pipeline.
    Batch-equivalent plan: registry stream_dedup_counts."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def monotone_stream(stream: DataFrame) -> DataFrame:
    return (
        stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _monotone_state_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(df: DataFrame, out_dir: str, checkpoint: str) -> None:
    """Drain everything currently in the source, then stop (the test/bench
    driver for the streaming path)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
