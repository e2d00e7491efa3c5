"""Physical-plan regression guards.

PLANS.md documents the plan shapes the engine RELIES on at scale; these
tests pin the load-bearing ones so a refactor that silently regresses a
plan (a range join materializing a product, a lost broadcast, a lost
map-side top-k or partial aggregation) fails CI instead of surviving to
a 100 TB run. Assertions are on operator PRESENCE/ABSENCE — robust
across Spark versions — not on full plan text.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_asof_join_has_no_product_join(spark, queries):
    """The as-of join must stay the sorted-carry shape: any nested-loop /
    cartesian node means the range-join row blowup is back."""
    p = _plan(queries["asof_join_policy"](spark, SF))
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # bucket carry-in comes back broadcast


def test_topk_uses_window_group_limit(spark, queries):
    """Catalyst's rank<=k pushdown = two-phase (map-side partial) top-k;
    losing it degrades to a single-reducer global window sort."""
    for name in ("ann_bruteforce_topk", "ann_lsh_topk"):
        assert "WindowGroupLimit" in _plan(queries[name](spark, SF)), name


def test_dim_joins_are_broadcast(spark, queries):
    """Small dimensions must broadcast — a shuffled fact side here is the
    classic 100 TB regression."""
    for name in ("elementwise_product_join", "vocab_ref_integrity"):
        p = _plan(queries[name](spark, SF))
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_aggregations_have_partial_phase(spark, queries):
    """Map-side combine before the exchange (partial_count/partial_sum in
    the HashAggregate) — the reason turn-level groupBys tolerate skew."""
    for name in ("uniqueness_check", "l1_l4_norms"):
        p = _plan(queries[name](spark, SF))
        assert "partial_" in p, name


def test_fused_order_unique_single_fact_exchange(spark):
    """The fused ordering+uniqueness check must keep ONE fact exchange and
    ONE fact sort serving BOTH window specs (the duplicate-count window
    partitions by a refinement of the lag window's sort prefix). A refactor
    that breaks the refinement re-shuffles/re-sorts 10^12 fact rows."""
    import pyspark.sql.functions as F

    from ssimulacra2_spark.config import CheckSuiteConfig
    from ssimulacra2_spark.operators.checks import order_unique_violations, prepare

    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("conv_id"),
        (F.col("id") % 13).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    cfg = CheckSuiteConfig()
    p = _plan(order_unique_violations(prepare(df, cfg), cfg, True, True))
    import re

    # fact side: 1 exchange + 1 sort + 2 windows; boundary summary adds at
    # most 2 more exchanges, 1 more sort, 1 more window (all summary-sized)
    assert len(re.findall(r"Exchange hashpartitioning", p)) <= 3
    assert len(re.findall(r"\bSort \[", p)) <= 2
    assert len(re.findall(r"\bWindow ", p)) == 3


def test_drift_probe_selects_plan_not_row_split(spark):
    """drift_hot_turns is a PLAN choice (probe -> whole kernel chunked or
    plain), never a row-level hot/cold split: the split design measured
    ~+10s on the bench (it re-merges the pair join per consumer). Exactly
    ONE FlatMapGroupsInPandas must appear either way; the probe flips the
    halo Generate (explode) on only when a conversation exceeds the
    threshold."""
    import pyspark.sql.functions as F

    from ssimulacra2_spark.config import CheckSuiteConfig
    from ssimulacra2_spark.operators.checks import partition_counts, prepare
    from ssimulacra2_spark.operators.drift_arrow import drift_score_check_arrow

    df = spark.range(20000).select(
        (F.col("id") % 50).cast("string").alias("conv_id"),
        (F.col("id") / 50).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("w "), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    base = CheckSuiteConfig(
        n_buckets=4, num_scales=4, channels=("len", "tok"), drift_subbuckets=2
    )
    from dataclasses import replace

    for hot, expect_chunked in ((100, True), (10**9, False)):
        cfg = replace(base, drift_hot_turns=hot)
        ref, cand = prepare(df, cfg), prepare(df, cfg)
        out = drift_score_check_arrow(
            ref, cand, partition_counts(ref).select("partition_id"), cfg
        )
        p = _plan(out.verdicts)
        assert p.count("FlatMapGroupsInPandas") == 1, hot
        assert ("explode(" in p) == expect_chunked, hot  # the halo duplication


def _window_specs(plan: str) -> list[tuple[tuple[str, ...], tuple[str, ...]]]:
    """Parse (partition_cols, order_cols) out of every windowspecdefinition
    in an executed-plan string (column names only, exprIds stripped)."""
    import re

    specs = []
    for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        part: list[str] = []
        order: list[str] = []
        for tok in (t.strip() for t in s.split(",")):
            if tok.startswith("specifiedwindowframe"):
                break
            name = tok.split("#")[0]
            (order if (" ASC" in tok or " DESC" in tok) else part).append(name)
        specs.append((tuple(part), tuple(order)))
    return specs


def test_sessionize_asof_windows_stay_chunked(spark, queries):
    """The two round-3 scale rewrites must KEEP their skew-safe window
    shapes (the property tests pin VALUES; this pins the PLAN):

    * sessionize_gap — every fact-row window (ordered by ts) must
      partition by (user, chunk), never a bare whole-user key: one hot
      user with 10^8 events in a single window task is the scale-killer
      the chunked two-phase prefix scan removed.
    * asof_join_policy — the sorted-carry window must partition by the
      time bucket (bounded rows per window), and the only global
      (unpartitioned) window allowed is the per-bucket summary scan
      ordered by bkt — a global window ordered by ts would funnel all
      fact rows through one task."""
    p = _plan(queries["sessionize_gap"](spark, SF))
    fact = [(pa, o) for pa, o in _window_specs(p) if "ts" in o]
    assert fact, "sessionize_gap lost its fact-row windows entirely?"
    for part, order in fact:
        assert "chunk" in part and "user_id" in part, (part, order)

    p = _plan(queries["asof_join_policy"](spark, SF))
    specs = _window_specs(p)
    carry = [(pa, o) for pa, o in specs if "ts" in o]
    assert carry, "asof_join_policy lost its sorted-carry window?"
    for part, order in carry:
        assert "bkt" in part, (part, order)
    for part, order in specs:
        if not part:  # global window: summary scan over buckets only
            assert order == ("bkt",), (part, order)


def test_drift_exchange_ships_float32(spark):
    """The prepared channel columns must stay FloatType: a well-meaning
    'fix' back to double doubles the drift exchange bytes."""
    from ssimulacra2_spark.config import CheckSuiteConfig
    from ssimulacra2_spark.operators.checks import prepare

    cfg = CheckSuiteConfig()
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "CAST(user_id AS STRING) AS conv_id",
        "CAST(event_id AS INT) AS turn_idx",
        "event_type AS role",
        "props AS text",
        "event_type AS tool",
        "ts",
    )
    df = prepare(ev, cfg)
    for ch in cfg.channels:
        assert df.schema[f"ch_{ch}"].dataType.simpleString() == "float", ch


def test_bucketed_snapshots_eliminate_fact_exchanges(spark, tmp_path):
    """The 100 TB layout lever: a snapshot pair written bucketed by
    conv_id (TableIO.write_snapshot via stage_pair layout='bucketed')
    must run BOTH fact shuffles of the suite exchange-free — the
    text-parity full-outer join on (conv_id, turn_idx) and the fused
    order+unique (conv_id, chunk) window — because
    HashPartitioning(conv_id) from the bucketed scan satisfies every
    superset clustering. Values must equal the unbucketed path."""
    from ssimulacra2_spark.benchgen import stage_pair
    from ssimulacra2_spark.config import CheckSuiteConfig
    from ssimulacra2_spark.operators import checks as C

    cfg = CheckSuiteConfig(n_buckets=8)
    ref_p, cand_p = stage_pair(spark, 60_000, 600, str(tmp_path / "plain"))
    ref_b, cand_b = stage_pair(
        spark, 60_000, 600, str(tmp_path / "bkt"), layout="bucketed", n_buckets=8
    )
    pb_ref, pb_cand = C.prepare(ref_b, cfg), C.prepare(cand_b, cfg)

    tp = C.text_parity_violations(pb_ref, pb_cand, cfg)
    assert "Exchange" not in _plan(tp)
    ou = C.order_unique_violations(pb_cand, cfg)
    assert "Exchange" not in _plan(ou)

    # parity with the unbucketed path (same generator, same distortions)
    pp_ref, pp_cand = C.prepare(ref_p, cfg), C.prepare(cand_p, cfg)
    assert set(map(tuple, tp.collect())) == set(
        map(tuple, C.text_parity_violations(pp_ref, pp_cand, cfg).collect())
    )
    assert set(map(tuple, ou.collect())) == set(
        map(tuple, C.order_unique_violations(pp_cand, cfg).collect())
    )


def test_bucketed_snapshot_survives_catalog_loss(spark, tmp_path):
    """Session catalogs are in-memory: read_snapshot must re-register a
    bucketed snapshot from the manifest spec (CREATE TABLE ... CLUSTERED
    BY ... LOCATION) and still expose the bucketed scan."""
    from pyspark.sql import functions as F

    from ssimulacra2_spark.sources.tableio import ParquetTableIO

    io = ParquetTableIO(str(tmp_path / "meta"))
    df = spark.range(5000).select(
        (F.col("id") % 50).cast("string").alias("conv_id"),
        (F.col("id") / 50).cast("int").alias("turn_idx"),
        F.xxhash64("id").alias("h"),
    )
    path = str(tmp_path / "snap")
    io.write_snapshot(df, path, bucket_by=("conv_id",), n_buckets=4,
                      sort_by=("conv_id", "turn_idx"))
    spec = io._load_manifest()["snapshots"][path]
    spark.sql(f"DROP TABLE `{spec['table']}`")  # simulate a fresh session
    got = io.read_snapshot(spark, path)
    # Spark only engages the bucketed scan when an operator needs the
    # distribution — assert through a conv_id aggregation, which must run
    # exchange-free off the re-registered table
    agg = got.groupBy("conv_id").agg(F.count("*").alias("n"))
    p = _plan(agg)
    assert "Bucketed: true" in p and "Exchange" not in p
    assert got.count() == 5000
    # and an unbucketed path still round-trips as plain parquet
    io.write_snapshot(df, str(tmp_path / "plainsnap"))
    assert io.read_snapshot(spark, str(tmp_path / "plainsnap")).count() == 5000


def test_pipelineops_plan_shapes(spark, queries):
    """Round-5b pipeline ops: pin the scale-load-bearing shapes.

    - quality_gate is a single-scan projection: ANY exchange means the
      fused gate gained a shuffle it must never have.
    - tfidf_topk keeps the rank<=k pushdown (map-side partial top-k) and
      broadcasts the single-row corpus-count side.
    - winnowing_fingerprint / pack_sequences window only within doc_id /
      source partitions: exactly one fact exchange each, and no global
      (empty-partition-spec) window that would single-thread 10^12 rows.
    """
    import re

    p = _plan(queries["quality_gate"](spark, SF))
    # r06: the load_spread parallelism floor may add exactly one
    # REPARTITION_BY_NUM exchange on doc_id (single-split corpus files;
    # _util.load_spread) — but the gate itself must stay shuffle-free:
    # no hash exchange other than that floor, and none on content
    ex = [l for l in p.splitlines() if "Exchange" in l and "REPARTITION_BY_NUM" not in l]
    assert not ex, ex
    p = _plan(queries["tfidf_topk"](spark, SF))
    assert "WindowGroupLimit" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    p = _plan(queries["winnowing_fingerprint"](spark, SF))
    n_fact_exchanges = len(re.findall(r"Exchange hashpartitioning", p))
    assert n_fact_exchanges == 1, ("winnowing_fingerprint", n_fact_exchanges)
    assert "SinglePartition" not in p, "winnowing_fingerprint"
    # pack_sequences (r06): the prefix scan must stay CHUNKED — every
    # doc-ordered window partitions by (source, cid), never a bare
    # whole-source stratum (VERDICT r05 #1: one dominant source would
    # funnel its whole prefix sum through a single window task)
    p = _plan(queries["pack_sequences"](spark, SF))
    assert "SinglePartition" not in p, "pack_sequences"
    fact = [(pa, o) for pa, o in _window_specs(p) if "doc_id" in o]
    assert fact, "pack_sequences lost its doc-ordered window?"
    for part, order in fact:
        assert "cid" in part and "source" in part, (part, order)


def test_webops_plan_shapes(spark, queries):
    """Round-5c web-pipeline ops: pin the scale-load-bearing shapes.

    - bloom_membership_guard: the corpus side must meet the 128-row Bloom
      bitset through BROADCAST joins only — a SortMergeJoin here means
      the 100 TB corpus shuffles against a ~1 KB filter.
    - quality_quantile_filter / domain_mix_sample: the learned-threshold /
      rate tables are tiny per-group aggregates and must come back
      broadcast; the corpus never shuffles on content.
    - dedup_semantic: the pair join must stay equi-keyed on cell — any
      nested-loop/cartesian node means all-pairs is back.
    - boilerplate_segments: the segment count keeps a map-side partial
      phase before its exchange.
    """
    p = _plan(queries["bloom_membership_guard"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    for name in ("quality_quantile_filter", "domain_mix_sample"):
        p = _plan(queries[name](spark, SF))
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name
    p = _plan(queries["dedup_semantic"](spark, SF))
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    p = _plan(queries["boilerplate_segments"](spark, SF))
    assert "partial_" in p


def test_webops_round5c_batch2_plan_shapes(spark, queries):
    """perplexity_proxy meets its tiny LM tables by broadcast only;
    ft_hash_classifier is inference-as-projection — ZERO exchanges;
    corpus_rollup keeps Expand + a map-side partial phase."""
    p = _plan(queries["perplexity_proxy"](spark, SF))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    p = _plan(queries["ft_hash_classifier"](spark, SF))
    # the single-row weight table arrives by broadcast (the "broadcast
    # the model" shape); the corpus itself must never shuffle ON CONTENT
    # — the only hash exchange allowed is load_spread's doc_id
    # parallelism floor (REPARTITION_BY_NUM; see _util.load_spread)
    ex = [
        l
        for l in p.splitlines()
        if "Exchange hashpartitioning" in l and "REPARTITION_BY_NUM" not in l
    ]
    assert not ex, ex
    p = _plan(queries["corpus_rollup"](spark, SF))
    assert "Expand" in p and "partial_" in p
