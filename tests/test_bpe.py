"""BPE trainer/apply vs the canonical Sennrich et al. example and
reconstruction/bounded-state invariants."""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hikma_engine_spark.functions import bpe

CORPUS_WORDS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
# hand-derived on paper from the arXiv:1508.07909 example, with this
# module's tie-break (count DESC, pair lexicographic ASC):
# pair counts round 1: es 9, st 9, t</w> 9 (tie -> ('e','s')), we 8, ...
EXPECTED_FIRST_5 = [
    ("e", "s"),
    ("es", "t"),
    ("est", "</w>"),
    ("l", "o"),
    ("lo", "w"),
]


def _corpus_df(spark):
    text = " ".join(w for w, c in CORPUS_WORDS.items() for _ in range(c))
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_word_counts_matches_counter(spark):
    wc = bpe.word_counts(_corpus_df(spark)).toPandas()
    assert dict(zip(wc.word, wc.cnt)) == CORPUS_WORDS


def test_train_bpe_sennrich_example(spark):
    wc = bpe.word_counts(_corpus_df(spark))
    merges, info = bpe.train_bpe(wc, n_merges=5)
    assert merges == EXPECTED_FIRST_5
    assert info["word_shapes_dropped"] == 0


def test_encode_word_greedy_rank():
    ranks = {p: i for i, p in enumerate(EXPECTED_FIRST_5)}
    assert bpe.encode_word("lowest", ranks) == ["low", "est</w>"]
    # word with no applicable merges stays char-split
    assert bpe.encode_word("zq", ranks) == ["z", "q", "</w>"]


def test_apply_bpe_reconstructs_words(spark):
    df = spark.createDataFrame(
        [
            (0, "the lowest and newest widgets"),
            (1, "Lower, LOWER!  widest..."),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    wc = bpe.word_counts(_corpus_df(spark))
    merges, _ = bpe.train_bpe(wc, n_merges=5)
    out = bpe.apply_bpe(df, merges).toPandas().set_index("doc_id")

    import re

    for doc_id, row in out.iterrows():
        words = re.sub(r"[^a-z0-9]+", " ", (row.text or "").lower()).split()
        rebuilt = "".join(row.bpe_tokens).split(bpe.EOW)
        assert [w for w in rebuilt if w] == words
    assert list(out.loc[2].bpe_tokens) == []


def test_train_bpe_vocab_cap_accounting(spark):
    wc = bpe.word_counts(_corpus_df(spark))
    merges, info = bpe.train_bpe(wc, n_merges=3, max_vocab_words=2)
    assert info["word_shapes_total"] == 4
    assert info["word_shapes_kept"] == 2
    assert info["word_shapes_dropped"] == 2
    # kept = top-2 by count: newest(6), low(5) -> first merge from them
    # pair counts: es/st/t</w> 9 via newest(6)+... only newest has es now
    # (widest dropped): n-e 6, e-w 6, w-e 6, e-s 6, s-t 6, t-</w> 6,
    # l-o 5, o-w 5, w-</w> 5 -> max 6 tie -> ('e','s')
    assert merges[0] == ("e", "s")


def test_pair_counts_agree_with_entry_tokenization(spark):
    """word_counts and the d_bpe_merges entry share one tokenization:
    bigrams derived from word_counts' words reproduce the entry's
    vocabulary on the same corpus slice."""
    df = _corpus_df(spark)
    wc = bpe.word_counts(df).toPandas()
    ref = Counter()
    for w, c in CORPUS_WORDS.items():
        ref[w] += c
    assert Counter(dict(zip(wc.word, wc.cnt))) == ref


def test_bpe_pack_composition(spark):
    """End-to-end tokenize→pack: documents encoded with learned merges,
    packed into budgeted sequences on the REAL subword counts — every
    doc packed exactly once, no sequence over budget (single-doc
    overflow excepted by next-fit contract)."""
    from pyspark.sql import functions as F

    from hikma_engine_spark.operators.export import pack_sequences

    docs = spark.createDataFrame(
        [(i, "the lowest newest widest low lower " * (1 + i % 4))
         for i in range(40)],
        "doc_id long, text string",
    )
    wc = bpe.word_counts(_corpus_df(spark))
    merges, _ = bpe.train_bpe(wc, n_merges=5)
    encoded = bpe.apply_bpe(docs, merges).withColumn(
        "n_bpe", F.size("bpe_tokens")
    )
    packed = pack_sequences(
        encoded, "doc_id", token_col="n_bpe", budget=64, n_buckets=4
    ).toPandas()
    assert sorted(packed.doc_id) == list(range(40))  # exactly once each
    sums = packed.groupby(["bucket", "seq_idx"]).n_tokens.agg(["sum", "count"])
    over = sums[sums["sum"] > 64]
    # only single-doc sequences may exceed the budget
    assert (over["count"] == 1).all()
