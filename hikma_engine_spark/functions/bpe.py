"""Distributed BPE tokenizer training + apply (Sennrich et al. 2016,
arXiv:1508.07909 — the byte-pair-encoding subword algorithm used by
GPT-2/RoBERTa-family tokenizers).

Architecture — the standard one at corpus scale: the CORPUS-sized work
is a single distributed word-frequency aggregation (tokenize → groupBy
word → sum counts; map-side combinable, hot words like "the" absorbed
by partial aggregation). The merge loop then runs over the
VOCABULARY-sized (word, count) table on the driver: each merge is an
O(Σ|word symbols|) scan of the word-shape dict, independent of corpus
size — this is exactly how production BPE trainers operate (word-count
dicts, not token streams). Spark's jobs are the n-billion-doc word
count and the distributed APPLY pass (an Arrow-batched UDF with a
per-batch word→encoding memo; the merge table rides a broadcast).

The driver dict is bounded by ``max_vocab_words`` (top by count,
deterministic tie-break) — the published trade: dropping singleton
long-tail word SHAPES changes pair statistics negligibly while keeping
driver state O(vocab), and the accounting (how many shapes were
dropped) is returned rather than hidden.

Determinism doctrine (matches the repo's extraction rules): merge
selection ties break by lexicographic pair order; within-word merging
is left-to-right non-overlapping; the apply pass merges the
lowest-rank pair present, all occurrences per round. No randomness,
no dict-order dependence — retry/partition stable.

Reference analog: none (the reference tokenizes by whitespace only);
this is a target-domain (LLM training pipeline) operator.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker (Sennrich's convention)

_TOKENIZE = (
    lambda col: F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")), " "),
        lambda t: t != "",
    )
)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-shape frequencies: the one corpus-sized job of BPE
    training. Tokenization shared with the query layer (lowercase,
    non-alnum → space). Returns (word, cnt)."""
    return (
        df.select(F.explode(_TOKENIZE(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def train_bpe(
    wc: DataFrame,
    n_merges: int = 100,
    max_vocab_words: int = 200_000,
) -> tuple[list[tuple[str, str]], dict]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) DataFrame.

    Collects at most ``max_vocab_words`` word shapes (top by count,
    (cnt DESC, word ASC) deterministic order — a TakeOrdered, no global
    sort) and runs the classic merge loop driver-side. Returns
    (merges, info) where info carries the bounded-state accounting:
    total vs kept word shapes and the kept-count mass share.
    """
    total_shapes = wc.count()
    rows = (
        wc.orderBy(F.desc("cnt"), "word").limit(max_vocab_words).collect()
    )  # bounded: vocabulary-sized by contract
    kept = [(r["word"], int(r["cnt"])) for r in rows]
    info = {
        "word_shapes_total": int(total_shapes),
        "word_shapes_kept": len(kept),
        "word_shapes_dropped": int(total_shapes) - len(kept),
    }

    vocab: dict[tuple[str, ...], int] = {}
    for w, c in kept:
        vocab[tuple(w) + (EOW,)] = vocab.get(tuple(w) + (EOW,), 0) + c

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        vocab = {_merge_word(syms, best): c for syms, c in vocab.items()}
        # identical post-merge shapes collapse (counts add)
        collapsed: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            collapsed[syms] = collapsed.get(syms, 0) + c
        vocab = collapsed
    return merges, info


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Left-to-right non-overlapping merge of ``pair`` in one word."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (the GPT-2/HF
    apply algorithm): repeatedly merge ALL occurrences of the
    present pair with the smallest merge rank."""
    syms: tuple[str, ...] = tuple(word) + (EOW,)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair)
    return list(syms)


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Distributed apply: encode every doc's words with the learned
    merges. Arrow-batched mapInPandas with a per-batch word→encoding
    memo (corpus words repeat heavily — the memo makes the pass
    amortized O(distinct words) per batch); the merge table rides the
    closure (vocabulary-sized — a broadcast in Spark's pickled-closure
    sense). Output column is array<string>; joining a word's pieces
    and stripping the end-of-word marker reconstructs the word exactly
    (pinned by pytest)."""
    import re  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    ranks = {p: i for i, p in enumerate(merges)}
    fields = [f.name for f in df.schema.fields]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` array<string>"]
    )
    word_re = re.compile(r"[^a-z0-9]+")

    def encode_batches(batches):
        memo: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in word_re.sub(" ", (text or "").lower()).split():
                hit = memo.get(w)
                if hit is None:
                    hit = encode_word(w, ranks)
                    memo[w] = hit
                out.extend(hit)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [enc(t) for t in pdf[text_col]], index=pdf.index, dtype=object
            )
            yield pdf[fields + [out_col]]

    return df.mapInPandas(encode_batches, out_schema)
