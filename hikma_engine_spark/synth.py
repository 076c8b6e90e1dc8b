"""Deterministic synthetic transcript corpus (seeded; no external data).

Produces the input table of BASELINE.json's input_hint:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``, with the skew/alias properties from
FIXTURES.md §1:

- turns-per-conversation is heavy-tailed: most 2-20, a few 100-5000
- a small set of "hot" entities appears in >30% of turns (hot-key skew)
- entity surfaces are drawn from vocab.ALIAS_CLUSTERS so multiple
  aliases of one canonical entity occur (exercises linking + CC)
- deterministic triple-bearing sentence templates so a pure-Python
  oracle can recompute the expected triple set exactly

Generation is test/bench-only (the real input is an existing table);
pandas on the driver is fine for the ≤1M-turn corpora used here.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pandas as pd

from . import vocab

_TEMPLATES = [
    "I think {e1} is better than {e2} for this workload.",
    "Can you check how {e1} handles large joins compared to {e2}?",
    "@{at} please review the {e1} migration plan.",
    "We migrated from {e1} to {e2} last quarter.",
    "{e1} depends on {e2} in our production stack.",
    "Benchmark results: {e1} was faster than {e2} on the scan-heavy suite.",
    "The incident was caused by a misconfigured {e1} cluster.",
    "call:{tool} lookup the latest {e1} release notes.",
    "Let's ask @{at} whether {e1} supports vectorized reads.",
    "Status update: the {e1} rollout is complete.",
    "No entities here, just small talk about the weather.",
    "{e1} depends on {e2} according to the dependency graph.",
    "Deploy notes: {e1} and {e2} both pinned to LTS versions.",
]

_AT_NAMES = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]

_TOOL_RESULTS = [
    "tool result: found 3 documents about {e1}.",
    "tool result: query returned 42 rows mentioning {e1}.",
    "tool result: no results for {e1}.",
]

_BASE_TS = int(datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp())


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    hot_prob: float = 0.35,
    big_conv_every: int = 500,
    big_conv_turns: int = 2000,
    max_sentences: int = 4,
) -> pd.DataFrame:
    """Seeded corpus; every ``big_conv_every``-th conversation is a
    pathological ``big_conv_turns``-turn conversation (skew driver).
    Turns are 1-``max_sentences`` template sentences (realistic text
    volume per turn). Fully vectorized — ~1M turns/s generation."""
    rng = np.random.RandomState(seed)
    surfaces = np.array(
        sorted({a for aliases in vocab.ALIAS_CLUSTERS.values() for a in aliases})
    )
    hot = np.array([a for c in vocab.HOT_ENTITIES for a in vocab.ALIAS_CLUSTERS[c]])
    at_names = np.array(_AT_NAMES)
    tools_arr = np.array(vocab.TOOLS)

    # --- per-conversation turn counts (heavy-tailed + periodic giants) ---
    n_turns = rng.randint(2, 21, size=n_convs)
    long_mask = rng.rand(n_convs) < 0.02
    n_turns[long_mask] = rng.randint(50, 201, size=int(long_mask.sum()))
    if big_conv_every:
        n_turns[big_conv_every - 1 :: big_conv_every] = big_conv_turns
    total = int(n_turns.sum())

    conv_idx = np.repeat(np.arange(n_convs), n_turns)
    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(n_turns)[:-1]
    turn_idx = np.arange(total) - np.repeat(starts, n_turns)

    # --- roles / tools ---
    is_tool = (rng.rand(total) < 0.12) & (turn_idx > 0)
    tool_pick = tools_arr[rng.randint(len(tools_arr), size=total)]
    roles = np.where(is_tool, "tool", np.where(turn_idx % 2 == 0, "user", "assistant"))

    # --- sentences (vectorized slot filling) ---
    n_sent = np.where(is_tool, 1, rng.randint(1, max_sentences + 1, size=total))
    s_total = int(n_sent.sum())
    s_tmpl = rng.randint(len(_TEMPLATES), size=s_total)
    s_tool_tmpl = rng.randint(len(_TOOL_RESULTS), size=s_total)

    def pick_entities(n: int) -> np.ndarray:
        use_hot = rng.rand(n) < hot_prob
        out = surfaces[rng.randint(len(surfaces), size=n)]
        out[use_hot] = hot[rng.randint(len(hot), size=int(use_hot.sum()))]
        return out

    e1 = pick_entities(s_total)
    e2 = pick_entities(s_total)
    at = at_names[rng.randint(len(at_names), size=s_total)]
    s_tool = tools_arr[rng.randint(len(tools_arr), size=s_total)]
    s_is_tool = np.repeat(is_tool, n_sent)

    sentences = [
        (
            _TOOL_RESULTS[s_tool_tmpl[i]].format(e1=e1[i])
            if s_is_tool[i]
            else _TEMPLATES[s_tmpl[i]].format(e1=e1[i], e2=e2[i], at=at[i], tool=s_tool[i])
        )
        for i in range(s_total)
    ]
    bounds = np.zeros(total + 1, dtype=np.int64)
    bounds[1:] = np.cumsum(n_sent)
    texts = [" ".join(sentences[bounds[i] : bounds[i + 1]]) for i in range(total)]

    # --- timestamps: per-conv base + cumulative gaps ---
    gaps = rng.randint(1, 120, size=total).astype(np.int64)
    cs = np.cumsum(gaps)
    conv_start_cs = np.repeat(cs[starts] - gaps[starts], n_turns)
    ts_vals = _BASE_TS + conv_idx * 3600 + (cs - conv_start_cs)

    conv_ids = np.array([f"conv{c:07d}" for c in range(n_convs)])[conv_idx]
    return pd.DataFrame(
        {
            "conv_id": pd.Series(conv_ids, dtype="string"),
            "turn_idx": pd.Series(turn_idx.astype(np.int32), dtype="int32"),
            "role": pd.Series(roles, dtype="string"),
            "text": pd.Series(texts, dtype="string"),
            "tool": pd.Series(np.where(is_tool, tool_pick, None), dtype="string"),
            "ts": pd.to_datetime(pd.Series(ts_vals), unit="s", utc=True).dt.tz_localize(None),
        }
    )


def corpus_path(n_convs: int, seed: int = 42, root: str | None = None) -> str:
    root = root or os.environ.get("HIKMA_SYNTH_DIR", "/tmp/hikma_synth")
    return os.path.join(root, f"transcripts_n{n_convs}_s{seed}_v2.parquet")


def ensure_corpus(n_convs: int, seed: int = 42, root: str | None = None) -> str:
    """Generate-once cache of the corpus parquet; returns the path."""
    path = corpus_path(n_convs, seed, root)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pdf = generate_transcripts(n_convs=n_convs, seed=seed)
        tmp = path + ".tmp"
        # Spark's parquet reader rejects TIMESTAMP(NANOS); coerce to µs
        # many row groups = realistic, SPLITTABLE layout (a real table
        # has >= parallelism row groups; pandas' default single row
        # group caps scan parallelism at ONE task regardless of cores)
        pdf.to_parquet(
            tmp, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
            row_group_size=max(8192, len(pdf) // 64),
        )
        os.replace(tmp, path)
    return path
