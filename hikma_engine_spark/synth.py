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
) -> pd.DataFrame:
    """Seeded corpus; every ``big_conv_every``-th conversation is a
    pathological ``big_conv_turns``-turn conversation (skew driver)."""
    rng = np.random.RandomState(seed)
    surfaces = sorted(
        {a for aliases in vocab.ALIAS_CLUSTERS.values() for a in aliases}
    )
    hot = [a for c in vocab.HOT_ENTITIES for a in vocab.ALIAS_CLUSTERS[c]]

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str | None] = []
    ts_vals: list[int] = []

    for c in range(n_convs):
        cid = f"conv{c:07d}"
        if big_conv_every and c % big_conv_every == big_conv_every - 1:
            n_turns = big_conv_turns
        else:
            # heavy-tailed 2..20 with occasional 50-200
            n_turns = int(rng.randint(2, 21))
            if rng.rand() < 0.02:
                n_turns = int(rng.randint(50, 201))
        t0 = _BASE_TS + c * 3600
        t = t0
        for i in range(n_turns):
            is_tool = rng.rand() < 0.12 and i > 0
            if is_tool:
                role = "tool"
                tool = vocab.TOOLS[rng.randint(len(vocab.TOOLS))]
                tmpl = _TOOL_RESULTS[rng.randint(len(_TOOL_RESULTS))]
            else:
                role = "user" if i % 2 == 0 else "assistant"
                tool = None
                tmpl = _TEMPLATES[rng.randint(len(_TEMPLATES))]

            def pick() -> str:
                if rng.rand() < hot_prob:
                    return hot[rng.randint(len(hot))]
                return surfaces[rng.randint(len(surfaces))]

            text = tmpl.format(
                e1=pick(),
                e2=pick(),
                at=_AT_NAMES[rng.randint(len(_AT_NAMES))],
                tool=vocab.TOOLS[rng.randint(len(vocab.TOOLS))],
            )
            conv_ids.append(cid)
            turn_idxs.append(i)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            ts_vals.append(t)
            t += int(rng.randint(1, 120))

    return pd.DataFrame(
        {
            "conv_id": pd.Series(conv_ids, dtype="string"),
            "turn_idx": pd.Series(turn_idxs, dtype="int32"),
            "role": pd.Series(roles, dtype="string"),
            "text": pd.Series(texts, dtype="string"),
            "tool": pd.Series(tools, dtype="string"),
            "ts": pd.to_datetime(pd.Series(ts_vals), unit="s", utc=True).dt.tz_localize(None),
        }
    )


def corpus_path(n_convs: int, seed: int = 42, root: str | None = None) -> str:
    root = root or os.environ.get("HIKMA_SYNTH_DIR", "/tmp/hikma_synth")
    return os.path.join(root, f"transcripts_n{n_convs}_s{seed}_v1.parquet")


def ensure_corpus(n_convs: int, seed: int = 42, root: str | None = None) -> str:
    """Generate-once cache of the corpus parquet; returns the path."""
    path = corpus_path(n_convs, seed, root)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pdf = generate_transcripts(n_convs=n_convs, seed=seed)
        tmp = path + ".tmp"
        # Spark's parquet reader rejects TIMESTAMP(NANOS); coerce to µs
        pdf.to_parquet(
            tmp, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.replace(tmp, path)
    return path
