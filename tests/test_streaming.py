"""Structured Streaming surface: windowed stats (stream == batch under
availableNow) and the custom stateful monotone check across micro-batches."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ssimulacra2_spark.streaming.validate_stream import (
    centroid_stream,
    monotone_stream,
    read_transcript_stream,
    run_available_now,
    windowed_stats_stream,
)


def _write_chunks(res, d):
    """Two event-time-ordered files so availableNow processes multiple
    micro-batches with no late data (late-drop semantics are covered by
    the monotone-state test below)."""
    ref = res.ref.sort_values("ts").reset_index(drop=True)
    half = len(ref) // 2
    (d / "in").mkdir()
    ref.iloc[:half].to_parquet(str(d / "in" / "part1.parquet"), index=False)
    ref.iloc[half:].to_parquet(str(d / "in" / "part2.parquet"), index=False)
    return str(d / "in")


def test_windowed_stats_stream_matches_batch(spark, synth_tables, tmp_path):
    in_dir = _write_chunks(synth_tables["res"], tmp_path)
    stream = read_transcript_stream(spark, in_dir)
    out = str(tmp_path / "out")
    run_available_now(windowed_stats_stream(stream), out, str(tmp_path / "ckpt"))
    got = spark.read.parquet(out).toPandas()
    batch = (
        spark.read.parquet(in_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("win_start"), "role", "n_turns")
        .toPandas()
    )
    # append mode emits only watermark-closed windows: every emitted
    # window must exactly equal its batch counterpart, and most windows
    # must have been emitted
    merged = got.merge(batch, on=["win_start", "role"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_turns_s"] == merged["n_turns_b"]).all()
    assert len(got) >= 0.8 * len(batch), (len(got), len(batch))


def test_centroid_stream_matches_batch(spark, synth_tables, tmp_path):
    """The incremental centroid monitor must emit, for every closed
    window, exactly the batch centroid of that window (the emb_drift
    centroid math at window granularity)."""
    in_dir = _write_chunks(synth_tables["res"], tmp_path)
    stream = read_transcript_stream(spark, in_dir)
    out = str(tmp_path / "cent_out")
    run_available_now(centroid_stream(stream), out, str(tmp_path / "cent_ckpt"))
    got = spark.read.parquet(out).toPandas()
    t = F.coalesce(F.col("text"), F.lit(""))
    batch = (
        spark.read.parquet(in_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.avg(F.length(t)).alias("c_len"),
            F.avg(F.pmod(F.xxhash64(t), F.lit(4096)) / 4096.0).alias("c_hash"),
            F.count("*").alias("n_turns"),
        )
        .select(F.col("w.start").alias("win_start"), "c_len", "c_hash", "n_turns")
        .toPandas()
    )
    merged = got.merge(batch, on="win_start", suffixes=("_s", "_b"))
    assert len(merged) == len(got) > 0
    assert (merged["n_turns_s"] == merged["n_turns_b"]).all()
    assert (abs(merged["c_len_s"] - merged["c_len_b"]) < 1e-9).all()
    assert (abs(merged["c_hash_s"] - merged["c_hash_b"]) < 1e-9).all()
    assert len(got) >= 0.8 * len(batch), (len(got), len(batch))


def test_monotone_stream_state_across_batches(spark, tmp_path):
    # conv "a": turn 5 arrives in batch 1, turn 3 in batch 2 -> violation
    (tmp_path / "in2").mkdir()
    b1 = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": pd.array([1, 5, 1], dtype="int32"),
            "role": ["user"] * 3,
            "text": ["x"] * 3,
            "tool": [None] * 3,
            "ts": pd.to_datetime(["2025-01-01 00:00:01"] * 3).astype("datetime64[us]"),
        }
    )
    b2 = pd.DataFrame(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pd.array([3, 2], dtype="int32"),
            "role": ["user"] * 2,
            "text": ["x"] * 2,
            "tool": [None] * 2,
            "ts": pd.to_datetime(["2025-01-01 00:10:00"] * 2).astype("datetime64[us]"),
        }
    )
    b1.to_parquet(str(tmp_path / "in2" / "b1.parquet"), index=False)
    import time

    time.sleep(1.1)  # distinct mtimes so the file source orders b1 -> b2
    b2.to_parquet(str(tmp_path / "in2" / "b2.parquet"), index=False)
    stream = read_transcript_stream(spark, str(tmp_path / "in2"), max_files=1).coalesce(1)
    out = str(tmp_path / "out2")
    run_available_now(monotone_stream(stream), out, str(tmp_path / "ckpt2"))
    got = spark.read.parquet(out).collect()
    keys = {(r.conv_id, r.turn_idx) for r in got}
    assert ("a", 3) in keys
    assert ("b", 2) not in keys


def test_session_stream_closes_on_watermark(spark, tmp_path):
    """session_window + watermark: a session is emitted (append mode)
    once event time passes session-end + watermark; still-open sessions
    stay in state. Three single-file micro-batches so the watermark from
    batch 2's max event time takes effect in batch 3 and closes the
    early sessions."""
    import time

    from ssimulacra2_spark.streaming.validate_stream import session_stream

    (tmp_path / "in4").mkdir()

    def mk(rows):
        return pd.DataFrame(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
                "role": ["user"] * len(rows),
                "text": ["x"] * len(rows),
                "tool": pd.array([None] * len(rows), dtype="string"),
                "ts": pd.to_datetime([r[2] for r in rows]).astype("datetime64[us]"),
            }
        )

    # batch 1: conv a turns 1,2 ten minutes apart (one session); conv b
    mk(
        [
            ("a", 1, "2025-01-01 00:00:00"),
            ("a", 2, "2025-01-01 00:10:00"),
            ("b", 1, "2025-01-01 00:00:00"),
        ]
    ).to_parquet(str(tmp_path / "in4" / "b1.parquet"), index=False)
    time.sleep(1.1)
    # batch 2: conv a re-appears 3h later -> NEW session (stays open)
    mk([("a", 3, "2025-01-01 03:00:00")]).to_parquet(
        str(tmp_path / "in4" / "b2.parquet"), index=False
    )
    time.sleep(1.1)
    # batch 3: advances nothing new for a/b; lets batch-2's watermark act
    mk([("c", 1, "2025-01-01 03:00:01")]).to_parquet(
        str(tmp_path / "in4" / "b3.parquet"), index=False
    )

    stream = read_transcript_stream(spark, str(tmp_path / "in4"), max_files=1)
    out = str(tmp_path / "out4")
    run_available_now(session_stream(stream), out, str(tmp_path / "ckpt4"))
    got = {
        (r.conv_id, r.first_turn): (r.n_turns, r.last_turn)
        for r in spark.read.parquet(out).collect()
    }
    assert got[("a", 1)] == (2, 2)  # closed session: both turns merged
    assert got[("b", 1)] == (1, 1)
    assert ("a", 3) not in got  # still open at stream end
    assert ("c", 1) not in got


def test_dedup_stream_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a key re-arriving in a later
    micro-batch (within the watermark) is suppressed; distinct keys pass."""
    from ssimulacra2_spark.streaming.validate_stream import dedup_stream

    (tmp_path / "in3").mkdir()
    b1 = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": pd.array([1, 2, 1], dtype="int32"),
            "role": ["user"] * 3,
            "text": ["x"] * 3,
            "tool": pd.array([None] * 3, dtype="string"),
            "ts": pd.to_datetime(["2025-01-01 00:00:01"] * 3).astype("datetime64[us]"),
        }
    )
    b2 = pd.DataFrame(
        {
            "conv_id": ["a", "b"],  # ("a", 2) is a duplicate, ("b", 2) is new
            "turn_idx": pd.array([2, 2], dtype="int32"),
            "role": ["user"] * 2,
            "text": ["x"] * 2,
            "tool": pd.array([None] * 2, dtype="string"),
            "ts": pd.to_datetime(["2025-01-01 00:05:00"] * 2).astype("datetime64[us]"),
        }
    )
    b1.to_parquet(str(tmp_path / "in3" / "b1.parquet"), index=False)
    import time

    time.sleep(1.1)
    b2.to_parquet(str(tmp_path / "in3" / "b2.parquet"), index=False)
    stream = read_transcript_stream(spark, str(tmp_path / "in3"), max_files=1)
    out = str(tmp_path / "out3")
    run_available_now(dedup_stream(stream), out, str(tmp_path / "ckpt3"))
    got = spark.read.parquet(out)
    keys = [(r.conv_id, r.turn_idx) for r in got.collect()]
    assert len(keys) == len(set(keys)) == 4  # (a,1) (a,2) (b,1) (b,2)


def test_centroid_alert_stream_matches_batch(spark, synth_tables, tmp_path):
    """Two-stage streaming drift alerting: keyed per-(role, window)
    centroids (stage 1) feed the stateful successive-window comparator
    (stage 2, applyInPandasWithState, O(1) state per key). The emitted
    (key, window, cos, alert) rows must equal the batch lag-join
    computation — the same math the stream_centroid_alert registry
    query runs over events with a DuckDB oracle."""
    import numpy as np

    from ssimulacra2_spark.streaming.validate_stream import (
        ALERT_MIN_COS,
        centroid_alert_stream,
        keyed_centroid_stream,
    )

    in_dir = _write_chunks(synth_tables["res"], tmp_path)
    stream = read_transcript_stream(spark, in_dir)
    cent_dir = str(tmp_path / "cent")
    run_available_now(
        keyed_centroid_stream(stream), cent_dir, str(tmp_path / "ckpt_c")
    )
    cent_schema = spark.read.parquet(cent_dir).schema
    cent_stream = (
        spark.readStream.schema(cent_schema).parquet(cent_dir)
    )
    alert_dir = str(tmp_path / "alerts")
    run_available_now(
        centroid_alert_stream(cent_stream), alert_dir, str(tmp_path / "ckpt_a")
    )
    got = spark.read.parquet(alert_dir).toPandas()
    assert len(got) > 0

    # batch expectation: lag-join the BATCH per-(role, hour) centroids
    t = F.coalesce(F.col("text"), F.lit(""))
    c = (
        spark.read.parquet(in_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("role").alias("k"))
        .agg(
            F.avg(F.length(t)).alias("c_len"),
            F.avg(F.pmod(F.xxhash64(t), F.lit(4096)) / 4096.0).alias("c_hash"),
        )
        .select(F.col("w.start").alias("win_start"), "k", "c_len", "c_hash")
        .toPandas()
        .sort_values(["k", "win_start"])
    )
    exp = {}
    for k, grp in c.groupby("k"):
        ep = grp["win_start"].to_numpy().astype("datetime64[s]").astype("int64")
        a = grp["c_len"].to_numpy()
        b = grp["c_hash"].to_numpy()
        for i in range(1, len(grp)):
            if ep[i] - ep[i - 1] != 3600:
                continue
            cos = (a[i] * a[i - 1] + b[i] * b[i - 1]) / (
                np.hypot(a[i], b[i]) * np.hypot(a[i - 1], b[i - 1])
            )
            cos_r = round(cos + 5.0123e-8, 6)
            exp[(k, grp["win_start"].iloc[i])] = (cos_r, cos_r < ALERT_MIN_COS)

    got_map = {
        (r.k, r.win_start): (r.cos_prev, r.alert) for r in got.itertuples()
    }
    # append mode emits watermark-closed windows; every emitted row must
    # exactly match its batch counterpart and coverage must be high
    for key, val in got_map.items():
        assert key in exp, key
        assert abs(exp[key][0] - val[0]) < 1e-9 and exp[key][1] == val[1], (key, val, exp[key])
    assert len(got_map) >= 0.7 * len(exp), (len(got_map), len(exp))


def test_bloom_probe_stream_matches_batch_guard(spark, tmp_path):
    """The streaming contamination probe (stream-static broadcast join
    against the batch-built Bloom bitset) must produce, after the batch
    per-doc rollup, EXACTLY the batch bloom_membership_guard output."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from ssimulacra2_spark.registry.webops import (
        _BENCH_MOD,
        _BENCH_REM,
        build_bloom,
        shingle_rows,
    )
    from ssimulacra2_spark.streaming.validate_stream import (
        bloom_probe_stream,
        read_document_stream,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # split the corpus into two files so availableNow runs >1 micro-batch
    in_dir = str(tmp_path / "docs_in")
    half = docs.count() // 2
    pdf = docs.toPandas().sort_values("doc_id")
    import os

    os.makedirs(in_dir)
    pdf.iloc[:half].to_parquet(f"{in_dir}/part1.parquet", index=False)
    pdf.iloc[half:].to_parquet(f"{in_dir}/part2.parquet", index=False)

    is_bench = F.col("doc_id") % _BENCH_MOD == _BENCH_REM
    bloom = build_bloom(shingle_rows(docs.filter(is_bench)))

    stream = read_document_stream(spark, in_dir).filter(~is_bench)
    out = str(tmp_path / "probe_out")
    from ssimulacra2_spark.streaming.validate_stream import run_available_now

    run_available_now(bloom_probe_stream(stream, bloom), out, str(tmp_path / "ckpt"))

    rolled = {
        r["doc_id"]: r
        for r in (
            spark.read.parquet(out)
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_shingles"),
                F.sum(F.col("hit").cast("int")).cast("long").alias("n_bloom_hits"),
            )
            .filter(F.col("n_bloom_hits") > 0)
            .collect()
        )
    }
    batch = {
        r["doc_id"]: r
        for r in entrymod.queries()["bloom_membership_guard"](spark, sf).collect()
    }
    assert rolled.keys() == batch.keys()
    for doc_id, r in batch.items():
        assert rolled[doc_id]["n_shingles"] == r["n_shingles"], doc_id
        assert rolled[doc_id]["n_bloom_hits"] == r["n_bloom_hits"], doc_id
