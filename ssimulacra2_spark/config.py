"""Check-suite configuration.

Analog of the reference's YuvConfig metadata record
(/root/reference/ssimulacra2_bin/src/video.rs:369-386): everything that
governs interpretation of the raw table — expected schema, vocabularies,
guards, window radius, scale count, thresholds — in one serializable
object. All scale knobs (buckets, salt fanout, sketch precision) are
config-driven so the same code path runs at sf0.001 and at 10^12 rows
(SURVEY §7.2).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

from .constants import MIN_SIZE, NUM_SCALES, RADIUS, SCORE_PASS_THRESHOLD

DEFAULT_ROLES = ("system", "user", "assistant", "tool")
DEFAULT_TOOLS = (
    "search",
    "browser",
    "python",
    "bash",
    "calculator",
    "retrieval",
    "sql",
    "editor",
    "compiler",
    "planner",
    "memory",
    "vision",
    "speech",
    "translate",
    "summarize",
    "classify",
    "extract",
    "rank",
    "route",
    "none",
)

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


@dataclass
class CheckSuiteConfig:
    # data model
    key_cols: tuple[str, str] = ("conv_id", "turn_idx")
    order_col: str = "ts"
    text_col: str = "text"
    roles: tuple[str, ...] = DEFAULT_ROLES
    tools: tuple[str, ...] = DEFAULT_TOOLS

    # partitioning: partition_id = pmod(xxhash64(conv_id), n_buckets) —
    # conversations never straddle partitions, so per-partition verdicts
    # are complete and resumable units (≙ per-frame scoring video.rs:134-177)
    n_buckets: int = 16

    # guards (≙ min 8x8 / dimension parity, lib.rs:49-55)
    min_rows_per_partition: int = MIN_SIZE * MIN_SIZE

    # windowed stats / drift (≙ blur radius build.rs:28, 6 scales lib.rs:9)
    radius: int = RADIUS
    num_scales: int = NUM_SCALES
    # feature channels for the drift score (≙ the 3 Xyb planes). 'hash'
    # uses Spark's xxhash64 — exclude it when pinning against the
    # pure-pandas oracle, which cannot reproduce that hash
    channels: tuple[str, ...] = ("len", "tok", "hash")
    score_threshold: float = SCORE_PASS_THRESHOLD
    psi_threshold: float = 0.25
    ks_threshold: float = 0.2
    drift_bins: int = 20
    # embedding-centroid drift (drift.emb_drift_check): minimum cosine
    # between the per-partition channel-vector centroids of the two sides
    emb_drift_min_cos: float = 0.995
    # channels forming the per-turn vector for emb_drift. Default is the
    # CHEAP pair: 'len' (length) and 'hash' (xxhash) — deliberately NOT
    # 'tok', whose regex is the expensive featurization (measured
    # ~1.9s/8M-rows/eval); referencing only cheap channels lets Catalyst
    # prune the tok regex out of the fused psi+emb branch entirely
    # (interleaved A/B: fused-with-tok cost ~+2-4s at 8M/32c, cheap pair
    # ~+0). Must be a subset of `channels`.
    emb_channels: tuple[str, ...] = ("len", "hash")

    # skew handling: two-phase salted aggregation fanout for hot conv_ids
    salt_buckets: int = 8
    # monotone check chunking: the adjacent-turn lag runs per
    # (conv_id, turn_idx div monotone_chunk_turns) so a hot conversation
    # spreads over n_turns/chunk tasks; chunk-boundary pairs are checked
    # over a tiny per-chunk summary (see checks.monotone_ts_violations)
    monotone_chunk_turns: int = 8192
    # treat a conversation as "hot" above this many turns (doc only; the
    # salted path is applied unconditionally — it is a pure win when cheap)
    hot_conv_turns: int = 100_000

    # sketch knobs (100 TB path)
    hll_rsd: float = 0.02
    percentile_accuracy: int = 10_000

    # drift implementation: 'arrow' = one applyInPandas kernel per
    # partition bucket (fast path); 'window' = pure Spark window
    # expressions (same math; useful for plan inspection / tiny inputs)
    drift_impl: str = "arrow"
    # Arrow-path fanout WITHIN a verdict bucket: the applyInPandas group key
    # is (partition_id, pmod(hash(conv_id), drift_subbuckets)) so one pandas
    # batch holds ~rows/(n_buckets*drift_subbuckets) rows regardless of how
    # coarse the verdict bucketing is. Conversations never straddle
    # sub-buckets; partial sums merge downstream, so results are identical.
    drift_subbuckets: int = 16
    # Chunked drift kernel (0 = off): bounds one pandas batch by this many
    # JOINED turns even when a single conversation exceeds a whole
    # sub-bucket's memory budget (a conversation hashes entirely to one
    # (bucket, sub-bucket) — the one skew drift_subbuckets can't split).
    # Positions are ranked two-phase (per (conv, turn-range) windows, no
    # whole-conversation window), rows are halo-duplicated to neighbor
    # chunks (< 2% at the value below), and each chunk emits partial sums
    # only for the scale outputs it owns. Must be a multiple of
    # 2^num_scales and >= 2*halo_turns(cfg). Off by default: it costs two
    # extra fact exchanges, worth paying only for corpora with
    # pathological conversation lengths (>= ~10^7 turns in one conv).
    drift_chunk_turns: int = 0
    # Adaptive PLAN choice for the kernel (0 = off): when set (and
    # drift_chunk_turns is 0), a driver-side probe — one map-combinable
    # max-of-conv-counts over a conv_id-pruned scan — switches the WHOLE
    # kernel to the chunked path iff some conversation exceeds this many
    # turns. Plan-level choice, deliberately NOT row-level hot/cold
    # routing: the split design was built and measured ~+10s on the 8M
    # bench (its two filtered consumers re-merge the pair join on every
    # row, a tax bigger than any straggler it saves — drift_arrow.
    # _probe_chunking documents the numbers). Off by default because the
    # probe costs a scan per run; at warehouse scale the same decision
    # comes free from table statistics (a transcript store tracks
    # conversation lengths). Set to the corpus size where chunking
    # measurably wins: >= ~2M turns in one conversation (1.8-2.3x faster
    # there; net slower below — ARCHITECTURE §3).
    drift_hot_turns: int = 0

    # how check branches share the prepared compact projection:
    #   'none'    — each branch rescans the pruned source columns (cheap
    #               featurization recomputes in parallel; best measured
    #               default here and the right call on Iceberg, where
    #               column pruning makes rescans cheap)
    #   'memory'  — DataFrame persist (columnar cache; costs heap + a
    #               serial build pass — measured slower at 32M rows)
    #   'staging' — write the projection once to a staging parquet dir and
    #               scan that (the 100 TB pattern for very expensive
    #               featurization)
    cache_mode: str = "none"
    staging_dir: str | None = None

    # checkpoint/resume commit granularity: when results are written
    # through TableIO, the partition-id space is processed as this many
    # independently committed slices (pid % commit_batches) — a crash
    # preserves completed slices and the next run resumes from them.
    # 1 = single commit at end of run (cheapest; no mid-run durability).
    commit_batches: int = 4

    checks: tuple[str, ...] = (
        "schema",
        "min_rows",
        "row_parity",
        "uniqueness",
        "monotone_ts",
        "vocab_role",
        "vocab_tool",
        "text_parity",
        "column_stats",
        "emb_drift",
        "drift_score",
    )

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> CheckSuiteConfig:
        d = json.loads(s)
        for k in ("key_cols", "roles", "tools", "checks", "channels"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)
