"""Deterministic transcript snapshot-pair synthesizer.

Generates a clean reference table and a candidate table = reference +
injected violations, each class independently configurable (analog:
`distort_yuv` perturbing a clone of the source image,
/root/reference/ssimulacra2/benches/benches.rs:66-80). Returns pandas
frames (tests write them to parquet) plus an injection log so tests can
assert the engine finds *exactly* the injected violations.

All randomness is numpy-seeded; identical inputs -> identical tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .config import DEFAULT_ROLES, DEFAULT_TOOLS

_VOCAB = (
    "data query table scan join merge sort hash group window filter batch "
    "stream vector column row key value fast slow big small the a of and to "
    "agg spark line order customer"
).split()


@dataclass
class InjectionRates:
    duplicate_key: float = 0.005
    ts_swap: float = 0.005
    unknown_role: float = 0.003
    unknown_tool: float = 0.003
    text_mutate: float = 0.01
    text_null: float = 0.002
    drop_turn: float = 0.005
    add_turn: float = 0.003


@dataclass
class SynthResult:
    ref: pd.DataFrame
    cand: pd.DataFrame
    injections: dict = field(default_factory=dict)


def synth_ref(
    n_convs: int = 100,
    seed: int = 42,
    hot_convs: int = 1,
    hot_turns: int = 1500,
    max_turns: int = 64,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    base_ts = np.datetime64("2025-01-01T00:00:00")
    for i in range(n_convs):
        conv = f"c{i:06d}"
        if i < hot_convs:
            n = hot_turns  # skew lever: hot conversations
        else:
            n = int(np.clip(np.exp(rng.normal(2.0, 0.8)), 2, max_turns))
        t = base_ts + np.timedelta64(int(rng.integers(0, 10**6)), "s")
        for k in range(n):
            t = t + np.timedelta64(int(rng.integers(1, 120)), "s")
            role = DEFAULT_ROLES[k % 2 + 1] if k > 0 else "system"
            tool = (
                DEFAULT_TOOLS[int(rng.integers(0, len(DEFAULT_TOOLS)))]
                if role == "assistant" and rng.random() < 0.3
                else None
            )
            n_tok = int(rng.integers(3, 40))
            text = " ".join(
                _VOCAB[j] for j in rng.integers(0, len(_VOCAB), n_tok)
            )
            rows.append((conv, k, role, text, tool, t))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # microsecond precision: Spark cannot read parquet TIMESTAMP(NANOS)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def inject(
    ref: pd.DataFrame,
    rates: InjectionRates | None = None,
    seed: int = 43,
    drift_convs: set[str] | None = None,
) -> SynthResult:
    """Candidate = ref + violations. Each injected row is logged by class."""
    rates = rates or InjectionRates()
    rng = np.random.default_rng(seed)
    cand = ref.copy().reset_index(drop=True)
    n = len(cand)
    log: dict[str, list] = {k: [] for k in (
        "duplicate_key", "ts_swap", "unknown_role", "unknown_tool",
        "text_mutate", "text_null", "drop_turn", "add_turn", "drift_convs",
    )}

    def pick(rate: float) -> np.ndarray:
        k = int(round(rate * n))
        if k == 0:
            return np.array([], dtype=int)
        return rng.choice(n, size=k, replace=False)

    # text mutations (breaks the per-turn text-equality invariant)
    for i in pick(rates.text_mutate):
        cand.loc[i, "text"] = str(cand.loc[i, "text"]) + " MUTATED"
        log["text_mutate"].append((cand.loc[i, "conv_id"], int(cand.loc[i, "turn_idx"])))
    for i in pick(rates.text_null):
        cand.loc[i, "text"] = None
        log["text_null"].append((cand.loc[i, "conv_id"], int(cand.loc[i, "turn_idx"])))

    # vocabulary violations
    for i in pick(rates.unknown_role):
        cand.loc[i, "role"] = "intruder"
        log["unknown_role"].append((cand.loc[i, "conv_id"], int(cand.loc[i, "turn_idx"])))
    for i in pick(rates.unknown_tool):
        cand.loc[i, "tool"] = "unregistered_tool"
        log["unknown_tool"].append((cand.loc[i, "conv_id"], int(cand.loc[i, "turn_idx"])))

    # ts order swaps (monotonicity violations): swap ts with previous turn
    for i in pick(rates.ts_swap):
        c, k = cand.loc[i, "conv_id"], int(cand.loc[i, "turn_idx"])
        prev = cand[(cand.conv_id == c) & (cand.turn_idx == k - 1)]
        if len(prev) == 1 and k > 0:
            j = prev.index[0]
            a, b = cand.loc[i, "ts"], cand.loc[j, "ts"]
            if a != b:
                cand.loc[i, "ts"], cand.loc[j, "ts"] = b, a
                log["ts_swap"].append((c, k))

    # duplicates of existing keys
    dup_rows = cand.loc[pick(rates.duplicate_key)]
    for _, r in dup_rows.iterrows():
        log["duplicate_key"].append((r["conv_id"], int(r["turn_idx"])))

    # dropped turns (missing on candidate side)
    drop_idx = pick(rates.drop_turn)
    for i in drop_idx:
        log["drop_turn"].append((cand.loc[i, "conv_id"], int(cand.loc[i, "turn_idx"])))

    # added turns (keys beyond the conversation end)
    add_src = cand.loc[pick(rates.add_turn)].copy()
    added = []
    for _, r in add_src.iterrows():
        new_idx = int(ref[ref.conv_id == r["conv_id"]]["turn_idx"].max()) + 1000 + int(r["turn_idx"])
        rr = r.copy()
        rr["turn_idx"] = np.int32(new_idx)
        added.append(rr)
        log["add_turn"].append((r["conv_id"], new_idx))

    cand = cand.drop(index=drop_idx)
    parts = [cand, dup_rows]
    if added:
        parts.append(pd.DataFrame(added))
    cand = pd.concat(parts, ignore_index=True)

    # distribution drift: lengthen all texts in selected conversations
    drift_convs = drift_convs or set()
    if drift_convs:
        mask = cand["conv_id"].isin(drift_convs) & cand["text"].notna()
        cand.loc[mask, "text"] = cand.loc[mask, "text"].astype(str) + (
            " padding" * 30
        )
        log["drift_convs"] = sorted(drift_convs)

    cand["turn_idx"] = cand["turn_idx"].astype("int32")
    cand["ts"] = cand["ts"].astype("datetime64[us]")
    return SynthResult(ref=ref, cand=cand, injections=log)


def synth_pair(
    n_convs: int = 100,
    seed: int = 42,
    rates: InjectionRates | None = None,
    drift_convs: set[str] | None = None,
    **kw,
) -> SynthResult:
    ref = synth_ref(n_convs=n_convs, seed=seed, **kw)
    return inject(ref, rates=rates, seed=seed + 1, drift_convs=drift_convs)
