"""Edge-case oracles for the round-5 wave-2 entries: each test builds a
tiny adversarial table layout on disk, runs the ACTUAL queries() entry
against it (same code path as the driver gate), and compares to a
pure-Python reference — catching semantics the sf-corpora can't probe
(rule-order attribution, same-timestamp ties, degree-cap boundaries,
first-char block misses)."""

from __future__ import annotations

import os
import sys
from collections import Counter
from datetime import datetime, timedelta

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def _write(tmp_path, name: str, pdf: pd.DataFrame) -> str:
    pdf.to_parquet(str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def test_filter_cascade_first_failing_rule_wins(spark, tmp_path):
    """A doc failing several rules is attributed to the FIRST in order:
    short+wrong-lang -> r1, long+wrong-lang -> r2, wrong-lang never
    shadows digit-heavy for an en doc."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "x",  # short AND effectively unscored -> r1
                "w " * 150,  # 300 chars, lang de -> r2
                "1234567890 " * 30,  # en, digit-heavy -> r3
                ("ok tokens here " * 20).strip(),  # clean -> kept
            ],
            "lang": ["de", "de", "en", "en"],
            "source": ["s"] * 4,
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_filter_cascade"](spark, sf).toPandas()
    got = dict(zip(pdf.verdict, pdf.n_docs))
    assert got == {
        "r1_too_short": 1,
        "r2_not_target_lang": 1,
        "r3_digit_heavy": 1,
        "kept": 1,
    }


def test_state_intervals_same_ts_ties_and_singletons(spark, tmp_path):
    """Two events at the SAME timestamp order by event_id (stable
    islands), and a single-event user yields one open interval."""
    t0 = datetime(2024, 1, 1)
    rows = [
        # user 7: a,a at same ts (one island via event_id order), then b
        (1, t0, 7, "a"),
        (2, t0, 7, "a"),
        (3, t0 + timedelta(hours=1), 7, "b"),
        # user 32 (also %25==7): singleton
        (4, t0, 32, "a"),
        # user 5: filtered out by the 1-in-25 slice
        (5, t0, 5, "z"),
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    events["value"] = 0.0
    events["props"] = "{}"
    sf = _write(tmp_path, "events", events)
    pdf = (
        entrymod.queries()["ev_state_intervals"](spark, sf)
        .toPandas()
        .sort_values(["user_id", "valid_from_us"])
        .reset_index(drop=True)
    )
    assert set(pdf.user_id) == {7, 32}
    u7 = pdf[pdf.user_id == 7]
    assert list(u7.state) == ["a", "b"]
    assert list(u7.n_events) == [2, 1]
    assert u7.valid_to_us.iloc[0] == u7.valid_from_us.iloc[1]
    assert u7.valid_to_us.iloc[1] == -1
    u32 = pdf[pdf.user_id == 32]
    assert len(u32) == 1 and u32.valid_to_us.iloc[0] == -1


def test_bpe_merges_matches_python_counter(spark, tmp_path):
    """Pair counts equal a pure-Python bigram Counter over the same
    tokenization; single-token and empty docs contribute nothing."""
    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "solo",
        "",
        "Punct!!! only??? the--cat",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_bpe_merges"](spark, sf).toPandas()

    import re

    ref: Counter = Counter()
    for t in texts:
        toks = [x for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if x]
        ref.update(zip(toks, toks[1:]))
    got = {(r.w1, r.w2): r.pair_count for r in pdf.itertuples()}
    # entry returns top-30; with < 30 distinct pairs it is the full map
    assert got == dict(ref)


def test_markov_transitions_python_oracle(spark, tmp_path):
    """Transition counts/normalization against a hand-walked chain."""
    t0 = datetime(2024, 1, 1)
    rows = []
    seq = ["a", "a", "b", "a", "b"]  # user 1: aa, ab, ba, ab
    for i, s in enumerate(seq):
        rows.append((i, t0 + timedelta(minutes=i), 1, s))
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    events["value"] = 0.0
    events["props"] = "{}"
    sf = _write(tmp_path, "events", events)
    pdf = entrymod.queries()["ev_markov_transitions"](spark, sf).toPandas()
    got = {(r.from_type, r.to_type): (r.n, r.prob_millis) for r in pdf.itertuples()}
    # from a: a->a 1, a->b 2 (margin 3); from b: b->a 1 (margin 1)
    assert got == {
        ("a", "a"): (1, 333),
        ("a", "b"): (2, 666),
        ("b", "a"): (1, 1000),
    }


def test_fuzzy_match_first_char_block_miss_is_honest(spark, tmp_path):
    """A typo that deletes the FIRST character leaves the block, so the
    row is absent (an honest blocking miss) — never a wrong match; a
    mid-name deletion resolves back to its original."""
    # p_partkey % 7 == 3 rows are dirtied at position p_partkey % len
    names = {
        3: "red widget",   # k = 3 % 10 = 3 -> deletes 'd' (mid-name)
        10: "blue bolt",   # clean (10 % 7 = 3? no: 10 % 7 = 3 -> dirty!)
        17: "hot gear",    # 17 % 7 = 3 -> k = 17 % 8 = 1 -> deletes 'o'
        2: "red widget",
        4: "blue bolt",
        5: "hot gear",
    }
    # recompute honestly: dirty rows are partkeys 3, 10, 17
    part = pd.DataFrame(
        {"p_partkey": list(names), "p_name": list(names.values())}
    )
    sf = _write(tmp_path, "part", part)
    pdf = entrymod.queries()["kg_fuzzy_match"](spark, sf).toPandas()
    by_key = {r.p_partkey: r for r in pdf.itertuples()}
    # partkey 3: "red widget" k=3 -> "re widget"? (0-based deletion at 3
    # removes ' '): either way lev<=2 from the original, must recover it
    assert by_key[3].best_match == "red widget" and by_key[3].matched_correct
    # partkey 10: "blue bolt" k = 10 % 9 = 1 -> "bue bolt" (block 'b' kept)
    assert by_key[10].best_match == "blue bolt" and by_key[10].matched_correct
    # partkey 17: "hot gear" k = 17 % 8 = 1 -> "ht gear" (block 'h' kept)
    assert by_key[17].best_match == "hot gear" and by_key[17].matched_correct


def test_fuzzy_match_first_char_deletion_absent(spark, tmp_path):
    """partkey where k == 0 deletes the first char -> the first-char
    block no longer contains the original; with no other canonical in
    the new block the row must be ABSENT, not mismatched."""
    # k = p_partkey % len(name) == 0 and p_partkey % 7 == 3 -> partkey 24,
    # name of length 8: 24 % 8 == 0 deletes 'h' from "hot gear"
    part = pd.DataFrame(
        {"p_partkey": [24, 1, 2], "p_name": ["hot gear", "red bolt", "red ring"]}
    )
    sf = _write(tmp_path, "part", part)
    pdf = entrymod.queries()["kg_fuzzy_match"](spark, sf).toPandas()
    assert 24 not in set(pdf.p_partkey)


def test_link_predict_degree_cap_excludes_hot_part(spark, tmp_path):
    """A part bought by every customer (degree > 40) must contribute no
    wedges: customers sharing ONLY the hot part never pair."""
    n_cust = 50
    orders = pd.DataFrame(
        {
            "o_orderkey": range(n_cust),
            "o_custkey": range(n_cust),
        }
    )
    rows = []
    # every customer buys hot part 999 (degree 50 > cap 40)
    for c in range(n_cust):
        rows.append((c, 999))
    # customers 0..5 share cold parts 1..6 pairwise-completely
    for c in range(6):
        for p in range(1, 7):
            rows.append((c, p))
    lineitem = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", lineitem)
    pdf = entrymod.queries()["g_link_predict"](spark, sf).toPandas()
    # only the cold clique pairs (0..5 choose 2 = 15), all with common=6
    # (>=5 threshold), jacc = 6/(6+6-6) = 1000 millis
    assert len(pdf) == 15
    assert set(pdf.c1) | set(pdf.c2) <= set(range(6))
    assert (pdf.common == 6).all()
    assert (pdf.jacc_millis == 1000).all()


def test_ccnet_buckets_rank_by_avg_logprob(spark, tmp_path):
    """Three docs with strictly ordered per-token rarity land in
    head/middle/tail respectively."""
    # 'common' appears 8x, 'mid' 4x, 'rare' 1x -> doc avg logprob ordered
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "common common common common common common",  # highest avg
                "common mid mid mid mid",
                "common mid rare",  # lowest avg
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = (
        entrymod.queries()["d_ccnet_buckets"](spark, sf)
        .toPandas()
        .set_index("bucket")
    )
    assert (pdf.n_docs == 1).all()
    assert (
        pdf.loc["head"].bucket_avg_lp_micro
        > pdf.loc["middle"].bucket_avg_lp_micro
        > pdf.loc["tail"].bucket_avg_lp_micro
    )


def test_inverted_postings_noncontiguous_doc_ids(spark, tmp_path):
    """Gap encoding over sparse doc ids: first delta is the absolute id,
    later deltas the gaps; tf counts duplicates within a doc."""
    docs = pd.DataFrame(
        {
            "doc_id": [5, 100, 1000],
            "text": ["zz zz yy", "zz yy", "zz"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = (
        entrymod.queries()["s_inverted_postings"](spark, sf)
        .toPandas()
        .set_index("token")
    )
    assert pdf.loc["zz"].postings == "5:2,95:1,900:1"
    assert pdf.loc["zz"].df == 3 and pdf.loc["zz"].total_tf == 4
    assert pdf.loc["yy"].postings == "5:1,95:1"


# ---------------------------------------------------------------------------
# SemDeDup (operators.dedup.semantic_dedup_pairs / semantic_dedup_keep)
# ---------------------------------------------------------------------------


def _clustered_embeddings(spark, per_cluster=6, dim=8):
    """Three tight clusters around orthogonal axes + per-row jitter —
    within-cluster cosine ~0.99+, across ~0."""
    import numpy as np

    rows = []
    rid = 0
    rng_base = 1000
    for c in range(3):
        axis = np.zeros(dim)
        axis[c] = 1.0
        for i in range(per_cluster):
            jitter = np.zeros(dim)
            jitter[(c + 3 + i) % dim] = 0.03 * ((i % 3) + 1)
            v = axis + jitter
            rows.append((rid, [float(x) for x in v]))
            rid += 1
    return spark.createDataFrame(rows, "doc_id long, embedding array<double>")


def test_semdedup_pairs_within_clusters_only(spark):
    from hikma_engine_spark.operators import dedup as dd
    from hikma_engine_spark.operators.similarity_search import (
        train_ivf_centroids,
    )

    df = _clustered_embeddings(spark)
    cents = train_ivf_centroids(
        df, n_cells=3, emb_col="embedding", id_col="doc_id", seed=7
    )
    pairs = dd.semantic_dedup_pairs(
        df, cents, threshold=0.95, id_col="doc_id"
    ).toPandas()
    assert len(pairs) > 0
    # a < b always; pairs never straddle clusters (ids 0-5, 6-11, 12-17)
    assert (pairs.a < pairs.b).all()
    assert ((pairs.a // 6) == (pairs.b // 6)).all()
    assert (pairs.cosine >= 0.95).all()


def test_semdedup_matches_bruteforce_with_one_cell(spark):
    """n_cells=1 removes the clustering approximation: pairs must equal
    the exact all-pairs cosine thresholding (numpy reference)."""
    import numpy as np

    from hikma_engine_spark.operators import dedup as dd

    df = _clustered_embeddings(spark)
    pdf = df.toPandas().sort_values("doc_id")
    m = np.array([list(v) for v in pdf.embedding], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1)[:, None]
    sims = np.round(m @ m.T, 6)
    ids = pdf.doc_id.to_numpy()
    ref = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.95
    }
    one_cell = np.zeros((1, m.shape[1]))
    one_cell[0, 0] = 1.0
    pairs = dd.semantic_dedup_pairs(
        df, one_cell, threshold=0.95, id_col="doc_id"
    ).toPandas()
    got = {(int(r.a), int(r.b)) for r in pairs.itertuples()}
    assert got == ref


def test_semdedup_hot_cell_cap_accounts_dropped(spark):
    from hikma_engine_spark.operators import dedup as dd
    from hikma_engine_spark.operators.similarity_search import (
        train_ivf_centroids,
    )

    df = _clustered_embeddings(spark)
    cents = train_ivf_centroids(
        df, n_cells=3, emb_col="embedding", id_col="doc_id", seed=7
    )
    pairs, dropped = dd.semantic_dedup_pairs(
        df, cents, threshold=0.95, id_col="doc_id",
        max_cell_size=5, return_dropped=True,
    )
    dr = dropped.toPandas()
    # every 6-row cell exceeds the cap of 5 -> all dropped, no pairs
    assert len(dr) == 3 and (dr.cell_size == 6).all()
    assert pairs.count() == 0


def test_semdedup_keep_one_per_group(spark):
    from hikma_engine_spark.operators import dedup as dd
    from hikma_engine_spark.operators.similarity_search import (
        train_ivf_centroids,
    )

    df = _clustered_embeddings(spark)
    cents = train_ivf_centroids(
        df, n_cells=3, emb_col="embedding", id_col="doc_id", seed=7
    )
    pairs = dd.semantic_dedup_pairs(df, cents, threshold=0.95, id_col="doc_id")
    keep = dd.semantic_dedup_keep(df, pairs, id_col="doc_id").toPandas()
    assert len(keep) == 18  # every input row classified
    # exactly one keeper per group, and it is the group min
    for g, grp in keep.groupby("group"):
        assert grp.keep.sum() == 1
        assert grp[grp.keep].id.iloc[0] == grp.id.min() == g


# ---------------------------------------------------------------------------
# Product quantization (operators.similarity_search.train_pq_codebooks /
# pq_encode / pq_topk)
# ---------------------------------------------------------------------------


def _pq_corpus(spark, n_clusters=5, per_cluster=40, dim=32, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    rid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + 0.08 * rng.randn(dim)
            rows.append((rid, [float(x) for x in v]))
            rid += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        centers,
    )


def test_pq_codebook_shapes_and_dim_guard(spark):
    import pytest as _pytest

    from hikma_engine_spark.operators import similarity_search as ss

    df, _ = _pq_corpus(spark)
    books = ss.train_pq_codebooks(df, m=8, k=16)
    assert books.shape == (8, 16, 4)
    with _pytest.raises(ValueError):
        ss.train_pq_codebooks(df, m=5, k=16)  # 32 % 5 != 0


def test_pq_adc_recall_and_rerank(spark):
    """ADC resolves the CLUSTER exactly (all top-10 from the query's
    cluster — the honest PQ contract: m-byte codes localize, they do
    not rank within-cluster); the two-stage ADC-shortlist -> exact
    cosine re-rank recovers the exact fine ranking."""
    from hikma_engine_spark.operators import similarity_search as ss

    df, centers = _pq_corpus(spark)
    books = ss.train_pq_codebooks(df, m=16, k=16)
    enc = ss.pq_encode(df, books).cache()
    query = [float(x) for x in centers[2]]

    exact = ss.brute_force_topk(df, query, k=10).toPandas()
    adc = ss.pq_topk(enc, books, query, k=10, rerank=None).toPandas()
    assert len(adc) == 10
    # cluster 2 owns ids 80..119: ADC never leaves the right cluster
    assert ((adc.vec_id >= 80) & (adc.vec_id < 120)).all()
    recall_adc = len(set(adc.vec_id) & set(exact.vec_id)) / 10.0
    assert recall_adc >= 0.4

    two_stage = ss.pq_topk(enc, books, query, k=10, rerank=8).toPandas()
    recall_two = len(set(two_stage.vec_id) & set(exact.vec_id)) / 10.0
    assert recall_two >= 0.9
    # re-ranked scores are EXACT cosines: equal to brute force on the
    # intersection
    merged = two_stage.merge(exact, on="vec_id", suffixes=("_pq", "_bf"))
    assert (merged.cosine_pq == merged.cosine_bf).all()
    enc.unpersist()


def test_pq_adc_score_is_jvm_side_lut_sum(spark):
    """One row's JVM-computed ADC score equals the numpy LUT sum — and
    the scoring plan contains no Python UDF (codes are the only
    Arrow-produced column; scoring is pure Catalyst)."""
    import numpy as np

    from hikma_engine_spark.operators import similarity_search as ss
    from hikma_engine_spark.plans import inspect

    df, centers = _pq_corpus(spark)
    books = ss.train_pq_codebooks(df, m=8, k=16)
    enc = ss.pq_encode(df, books)
    query = [float(x) for x in centers[0]]
    adc_df = ss.pq_topk(
        enc.select("vec_id", "embedding", "pq_code"),
        books, query, k=3, rerank=None,
    )

    row = enc.filter("vec_id = 0").select("pq_code").collect()[0][0]
    q = np.asarray(query)
    q = q / np.linalg.norm(q)
    sub_d = 32 // 8
    lut = np.array(
        [books[j] @ q[j * sub_d : (j + 1) * sub_d] for j in range(8)]
    )
    want = round(float(sum(lut[j][row[j]] for j in range(8))), 6)
    got = (
        enc.filter("vec_id = 0")
        .select("vec_id", "embedding", "pq_code")
        .transform(lambda d: ss.pq_topk(d, books, query, k=1, rerank=None))
        .toPandas()
        .adc_score.iloc[0]
    )
    assert got == want
    # scoring stage (downstream of the encode) has no Python evals:
    # the only Arrow node belongs to pq_encode's code column
    plan = inspect.physical_plan(adc_df, "simple")
    assert plan.count("ArrowEvalPython") <= 1  # encode only
    assert "BatchEvalPython" not in plan  # never row-at-a-time


def test_ivf_pq_composed_pruned_search(spark):
    """The FAISS IVF+PQ recipe out of existing parts: restrict to the
    query's nprobe nearest cells (partition pruning on ivf_cell), then
    ADC + exact re-rank over the pruned subset only — same top-10 as
    brute force over the full corpus, while the ADC stage reads a
    fraction of the rows."""
    import numpy as np

    from hikma_engine_spark.operators import similarity_search as ss

    df, centers = _pq_corpus(spark)
    cents = ss.train_ivf_centroids(df, n_cells=5, seed=7)
    with_cells = ss.add_ivf_cells(df, cents)
    books = ss.train_pq_codebooks(df, m=16, k=16)
    enc = ss.pq_encode(with_cells, books)

    query = [float(x) for x in centers[1]]
    q = np.asarray(query)
    q = q / np.linalg.norm(q)
    probe = np.argsort(-(cents @ q))[:2]  # nprobe=2
    pruned = enc.filter(enc.ivf_cell.isin([int(c) for c in probe]))

    got = ss.pq_topk(pruned, books, query, k=10, rerank=8).toPandas()
    exact = ss.brute_force_topk(df, query, k=10).toPandas()
    assert list(got.vec_id) == list(exact.vec_id)
    assert (got.cosine.values == exact.cosine.values).all()
    # the prune is real: a strict fraction of the 200-row corpus
    # enters the ADC stage (k-means cells approximate the planted
    # clusters, so allow drift around the ideal 80)
    assert pruned.count() <= 120


def test_redact_pii_placeholders_and_idempotence(spark):
    from pyspark.sql import functions as F

    from hikma_engine_spark.functions.text import redact_pii

    rows = [
        (0, "mail me at jane.doe+x@corp.example.org today"),
        (1, "see https://example.com/a?b=c#d and http://x.io"),
        (2, "call +1 (415) 555-0199 or 020-7946-0958 now"),
        (3, "server at 192.168.001.1 responded"),
        (4, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id", redact_pii(F.col("text")).alias("red")
    ).toPandas().set_index("doc_id")
    assert out.loc[0].red == "mail me at <EMAIL> today"
    assert out.loc[1].red == "see <URL> and <URL>"
    assert out.loc[2].red == "call <PHONE> or <PHONE> now"
    assert out.loc[3].red == "server at <IP> responded"
    assert out.loc[4].red == rows[4][1]
    # idempotent: redacting redacted text is a no-op
    twice = df.select(
        "doc_id", redact_pii(redact_pii(F.col("text"))).alias("red")
    ).toPandas().set_index("doc_id")
    assert (twice.red == out.red).all()


def test_corpus_release_pipeline_composes(spark):
    """End-to-end release flow across the package APIs: quality
    cascade -> PII redaction -> exact-dup removal (first-wins) ->
    benchmark decontamination -> sequence packing. Each stage's
    invariant holds on the final artifact: only 'kept' docs, no raw
    PII, one survivor per fingerprint, no contaminated doc, every
    survivor packed exactly once."""
    from pyspark.sql import functions as F

    from hikma_engine_spark.functions.text import (
        filter_cascade_verdict,
        fingerprint,
        redact_pii,
    )
    from hikma_engine_spark.operators.dedup import exact_duplicates
    from hikma_engine_spark.operators.export import (
        decontaminate,
        pack_sequences,
    )

    base = "useful training words appear here repeatedly " * 6  # ~270 chars
    rows = [
        (0, base + "alpha beta gamma", "en"),
        (1, base + "alpha beta gamma", "en"),            # exact dup of 0
        (2, base + "email me x@y.org soon", "en"),       # PII
        (3, "short", "en"),                              # r1 drop
        (4, base + "delta epsilon zeta", "de"),          # r2 drop
        (5, base + "the secret benchmark answer is fortytwo", "en"),  # contam
        (6, base + "totally clean unique content", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    docs = docs.withColumn("n_chars", F.length("text"))
    evals = spark.createDataFrame(
        [(100, "the secret benchmark answer is fortytwo")],
        "doc_id long, text string",
    )

    # 1. quality cascade
    kept = docs.filter(
        filter_cascade_verdict(F.col("text"), F.col("lang"), F.col("n_chars"))
        == "kept"
    )
    # 2. PII redaction
    red = kept.withColumn("text", redact_pii(F.col("text")))
    # 3. exact dedup, first-wins
    dup_losers = exact_duplicates(red, "doc_id", "text").select(
        F.explode(F.slice("doc_ids", 2, 1000)).alias("doc_id")
    )
    deduped = red.join(dup_losers, "doc_id", "left_anti")
    # 4. decontamination
    contaminated = decontaminate(
        deduped, evals, "doc_id", "text", n=3, containment=0.5
    ).select("doc_id").distinct()
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    # 5. packing
    packed = pack_sequences(clean, "doc_id", text_col="text", budget=128)

    survivors = sorted(r.doc_id for r in clean.select("doc_id").collect())
    assert survivors == [0, 2, 6]  # 1 dup-dropped, 3/4 cascade, 5 contam
    assert clean.filter(F.col("text").contains("x@y.org")).count() == 0
    assert clean.filter(F.col("text").contains("<EMAIL>")).count() == 1
    pk = packed.toPandas()
    assert sorted(pk.doc_id) == survivors  # each survivor exactly once


def _phrase_ref(texts: dict[int, str], phrase: list[str]) -> dict[int, int]:
    """Pure-Python positional phrase counter over the same tokenizer."""
    import re as _re

    out = {}
    for did, text in texts.items():
        toks = [t for t in _re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
        n = sum(
            1
            for i in range(len(toks) - len(phrase) + 1)
            if toks[i : i + len(phrase)] == phrase
        )
        if n:
            out[did] = n
    return out


def test_phrase_match_three_terms_and_overlaps(spark):
    """3-term phrase, overlapping occurrences ("a b a b a" contains
    "a b a" twice, overlapping), punctuation collapse, and a repeated
    single-term phrase ("big big")."""
    from hikma_engine_spark.query.search import phrase_match

    texts = {
        0: "a b a b a",                 # "a b a" x2 (overlap)
        1: "x, A??b!a zz a b a",         # punctuation collapses -> x2
        2: "a b b a",                    # 0
        3: "big big small big big big",  # "big big" x3 (pos 0,3,4)
        4: "",                           # empty doc
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    for phrase in (["a", "b", "a"], ["big", "big"]):
        got = {
            r["doc_id"]: r["phrase_tf"]
            for r in phrase_match(docs, phrase, k=10).collect()
        }
        assert got == _phrase_ref(texts, phrase), phrase


def test_phrase_match_single_shuffle_no_join(spark):
    """Plan contract: exactly one exchange (the groupBy), zero joins —
    the shifted-list intersection happens inside the aggregate's
    project, never as a self-join."""
    from hikma_engine_spark.query.search import phrase_match

    docs = spark.createDataFrame(
        [(i, "table scan fast table scan") for i in range(10)],
        "doc_id long, text string",
    )
    plan = phrase_match(docs, ["table", "scan"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # one pre-agg exchange; TakeOrderedAndProject handles the top-k
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan


def test_bounded_sssp_improving_path_and_bounds(spark):
    """A 3-hop cheap path (1+1+1=3) must beat the direct heavy edge
    (10) — but only once k reaches 3; k=1 reports the heavy edge, k=0
    the sources alone. Unreachable nodes never appear; negative
    weights raise."""
    from hikma_engine_spark.operators.graph import bounded_sssp

    edges = spark.createDataFrame(
        [("s", "x", 10), ("s", "a", 1), ("a", "b", 1), ("b", "x", 1),
         ("z", "q", 1)],  # z/q unreachable from s
        "src string, dst string, w long",
    )
    src = spark.createDataFrame([("s",)], "node string")

    def d(k):
        return {r["node"]: r["dist"] for r in bounded_sssp(edges, src, k).collect()}

    assert d(0) == {"s": 0}
    assert d(1) == {"s": 0, "x": 10, "a": 1}
    assert d(3) == {"s": 0, "a": 1, "b": 2, "x": 3}
    assert d(5) == d(3)  # converged; early-exit path

    import pytest as _pt

    bad = spark.createDataFrame([("s", "x", -1)], "src string, dst string, w long")
    with _pt.raises(ValueError):
        bounded_sssp(bad, src, 2)


def test_dialog_pairs_gates_dedup_and_context(spark):
    """Role gate (response must follow a prompt_role turn), corpus-wide
    first-wins dedup on exact response text, null context on the first
    exchange, and length gates."""
    from hikma_engine_spark.operators.export import dialog_pairs

    rows = [
        # conv A: clean 2-exchange dialog
        ("a", 0, "user", "q1 aaaa"),
        ("a", 1, "assistant", "answer one"),
        ("a", 2, "user", "q2 bbbb"),
        ("a", 3, "assistant", "answer two"),
        # conv B: duplicate response text (loses to conv a, turn 1)
        ("b", 0, "user", "other q"),
        ("b", 1, "assistant", "answer one"),
        # conv C: assistant after assistant -> gated out
        ("c", 0, "assistant", "no prompt before me"),
        ("c", 1, "assistant", "me neither"),
        # conv D: too-short response
        ("d", 0, "user", "q"),
        ("d", 1, "assistant", "x"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in dialog_pairs(t, context_turns=2, min_resp_chars=2).collect()
    }
    assert set(got) == {("a", 1), ("a", 3)}
    r1, r3 = got[("a", 1)], got[("a", 3)]
    assert r1["context"] is None and r1["n_context_turns"] == 0
    assert r1["prompt"] == "q1 aaaa" and r1["response"] == "answer one"
    assert r3["n_context_turns"] == 2
    assert r3["context"] == "q1 aaaa\nanswer one"
    # context_turns=0 keeps the pair but carries no context
    z = dialog_pairs(t, context_turns=0, min_resp_chars=2).collect()
    assert all(r["context"] is None and r["n_context_turns"] == 0 for r in z)


def test_negative_samples_disjoint_capped_deterministic(spark):
    """Negatives never collide with positives, per-u count caps at k,
    ranks are 1..n dense, valid_items filters out-of-dim candidates,
    and same-seed re-runs are identical while a different seed
    differs."""
    from hikma_engine_spark.operators.graph import negative_edge_samples

    pos = spark.createDataFrame(
        [(u, v) for u in range(3) for v in range(4)],  # dense-ish positives
        "u long, v long",
    )
    items = spark.createDataFrame([(v,) for v in range(10)], "v long")
    kw = dict(n_items=10, k=3, n_candidates=8, valid_items=items)
    a = negative_edge_samples(pos, seed="s1", **kw).collect()
    b = negative_edge_samples(pos, seed="s1", **kw).collect()
    c = negative_edge_samples(pos, seed="s2", **kw).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    pos_set = {(r["u"], r["v"]) for r in pos.collect()}
    by_u = {}
    for r in a:
        assert (r["u"], r["neg_v"]) not in pos_set
        assert 0 <= r["neg_v"] < 10
        by_u.setdefault(r["u"], []).append(r["rnk"])
    for u, rnks in by_u.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= 3


def test_bigram_logprob_matches_hand_model(spark, tmp_path):
    """Add-one-smoothed bigram scores on a 3-doc corpus equal a pure-
    Python LM trained on the same corpus (short docs drop out)."""
    import math
    from collections import Counter

    texts = {0: "a b a b c", 1: "b a", 2: "x"}  # doc 2: no bigrams
    docs = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_bigram_logprob"](spark, sf).toPandas()

    kept = {k: v.split() for k, v in texts.items() if len(v.split()) >= 2}
    uni = Counter(t for ts in kept.values() for t in ts)
    big = Counter(
        (ts[i], ts[i + 1]) for ts in kept.values() for i in range(len(ts) - 1)
    )
    V = len(uni)
    exp = {}
    for did, ts in kept.items():
        s = 0
        for i in range(len(ts) - 1):
            p = (big[(ts[i], ts[i + 1])] + 1) / (uni[ts[i]] + V)
            s += round(math.log2(p) * 1e6)
        exp[did] = (len(ts) - 1, s)
    got = {
        int(r.doc_id): (int(r.n_bigrams), int(r.sum_lp2_micro))
        for r in pdf.itertuples()
    }
    assert got == exp


def test_anomaly_mad_hand_case_and_breakdown(spark, tmp_path):
    """Hand-checkable MAD flags, even-count interpolation (x.5 medians
    stay exact as doubled ints), and the breakdown property a stddev
    z-score lacks: one huge outlier must not mask a second, smaller
    one."""
    t0 = datetime(2024, 1, 1)
    # type 'a': values 1..8 plus outliers 100 and 13
    vals_a = [1, 2, 3, 4, 5, 6, 7, 8, 100, 13.5]
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "a", float(v), "{}")
        for i, v in enumerate(vals_a)
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["ev_anomaly_mad"](spark, sf).toPandas()
    r = pdf.iloc[0]
    # cents: 100..800,10000,1350 -> sorted median = (500+600)/2 = 550
    assert r.med_half == 2 * 550
    # dev_half: [900,700,500,300,100,100,300,500,18900,1600] ->
    # sorted median = (500+500)/2 = 500 -> mad2_half = 1000
    assert r.mad2_half == 1000
    # flag: 2*dev > 3*1000 -> dev_half > 1500: 18900 (100.0), 1600 (13.5)
    assert r.n_anomalies == 2  # the big outlier does NOT mask the 13.5
    assert r.max_dev_half == 18900


def test_hyperball_sparse_mode_exact_on_hand_graph(spark):
    """At tiny cardinality the DataSketches HLL is sparse-mode exact,
    so the HyperBall estimate must EQUAL the true ≤k-hop reach on a
    hand graph — directed semantics, k=0/1/2, union idempotence under
    a duplicated edge."""
    from hikma_engine_spark.operators.graph import neighborhood_function

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("a", "b")],
        "src string, dst string",
    )

    def reach(k):
        return {
            r["node"]: r["reach_est"]
            for r in neighborhood_function(edges, k).collect()
        }

    assert reach(0) == {"a": 1, "b": 1, "c": 1, "d": 1}
    # 1 hop: a->{b,c}, b->{c}, c->{d}
    assert reach(1) == {"a": 3, "b": 2, "c": 2, "d": 1}
    # 2 hops: a reaches {a,b,c,d}, b {b,c,d}
    assert reach(2) == {"a": 4, "b": 3, "c": 2, "d": 1}


def test_temporal_reachability_respects_time_ordering(spark):
    """The defining case: a path that exists statically but walks
    BACKWARDS in time must not be taken; a later parallel edge can
    rescue it. Also: waiting at a node is allowed (t == arrival)."""
    from hikma_engine_spark.operators.graph import temporal_reachability

    edges = spark.createDataFrame(
        [
            ("s", "a", 10),
            ("a", "b", 5),    # arrives at a at 10 -> 5 < 10, unusable
            ("a", "b", 10),   # equal time: usable (waiting allowed)
            ("b", "c", 9),    # 9 < 10, unusable -> c unreachable
            ("x", "s", 1),    # into the seed: s keeps arrival 0
        ],
        "src string, dst string, t long",
    )
    src = spark.createDataFrame([("s", 0)], "node string, t0 long")
    got = {
        r["node"]: r["arrival"]
        for r in temporal_reachability(edges, src, k=4).collect()
    }
    assert got == {"s": 0, "a": 10, "b": 10}
    # static shortest path WOULD reach c via s->a->b->c; temporal must not
    assert "c" not in got


def test_hour_chi2_missing_hours_and_flag(spark, tmp_path):
    """Zero-event hours must contribute n² to the numerator (a stream
    concentrated in one hour is maximally non-uniform: S = 24·n²·(23/24)
    ... exactly (24n−n)² + 23·n² = 529n²+23n² = 552n²), and a small
    perfectly-uniform stream must not be flagged."""
    t0 = datetime(2024, 1, 1)
    rows = []
    # type 'burst': 48 events all in hour 0 -> flagged
    for i in range(48):
        rows.append((i, t0 + timedelta(minutes=i % 60), 1, "burst"))
    # type 'flat': one event in every hour -> chi2 = 0
    for h in range(24):
        rows.append((100 + h, t0 + timedelta(hours=h), 2, "flat"))
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["value"] = 0.0
    ev["props"] = "{}"
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["ev_hour_chi2"](spark, sf).toPandas()
    r = {x.event_type: x for x in pdf.itertuples()}
    n = 48
    assert r["burst"].chi2_numer == (24 * n - n) ** 2 + 23 * n * n
    assert bool(r["burst"].non_uniform_1pct)
    assert r["flat"].chi2_numer == 0 and not bool(r["flat"].non_uniform_1pct)


def test_ks_value_drift_hand_cases(spark, tmp_path):
    """KS decision against hand-computed D: identical-ish small samples
    don't reject; fully-separated n=30 samples do. Values straddle the
    64-cent prefix-sum buckets so the two-phase offsets are exercised."""
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # case data: clicks at 0.50 (bucket 0) x30, views at 1.50 (bucket 2) x30
    for _ in range(30):
        rows.append((eid, t0, 1, "click", 0.50, "{}")); eid += 1
        rows.append((eid, t0, 1, "view", 1.50, "{}")); eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    r = entrymod.queries()["ev_ks_value_drift"](spark, sf).toPandas().iloc[0]
    # D_scaled = max|n2*cum1 - n1*cum2| = |30*30 - 30*0| = 900
    assert (r.n1, r.n2, r.d_scaled) == (30, 30, 900)
    # 900^2 = 810000 >= (26504*30*30*60)//10000 = 143121 -> reject
    assert bool(r.reject_1pct)

    # same distribution: interleaved identical values -> D_scaled = small
    rows2 = []
    eid = 0
    for v in (0.50, 1.50, 2.50):
        for _ in range(10):
            rows2.append((eid, t0, 1, "click", v, "{}")); eid += 1
            rows2.append((eid, t0, 1, "view", v, "{}")); eid += 1
    ev2 = pd.DataFrame(
        rows2, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev2["ts"] = ev2["ts"].astype("datetime64[us]")
    (tmp_path / "b").mkdir(exist_ok=True)
    ev2.to_parquet(str(tmp_path / "b" / "events.parquet"))
    r2 = entrymod.queries()["ev_ks_value_drift"](spark, str(tmp_path / "b")).toPandas().iloc[0]
    assert r2.d_scaled == 0 and not bool(r2.reject_1pct)


def test_ks_prefix_sum_is_two_phase(spark, tmp_path):
    """Plan contract: the per-value CDF window is PARTITIONED by the
    prefix-sum bucket (hashpartitioning(b…)), and the only
    SinglePartition exchanges are the fixed-size ones (the ~32-row
    bucket-offset dim and the final scalar agg) — never the full
    value stream."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "click" if i % 2 else "view", float(i % 40), "{}")
        for i in range(400)
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    plan = (
        entrymod.queries()["ev_ks_value_drift"](spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(b#" in plan  # the big window is co-partitioned
    assert plan.count("Exchange SinglePartition") <= 2


def test_functional_scc_known_graph(spark):
    """Pointer-doubling SCC on a hand-built functional graph: a
    2-cycle, a 3-cycle, a self-loop, and tails feeding each — every
    node's (scc_id, on_cycle) is forced."""
    from hikma_engine_spark.operators.graph import functional_scc

    ptr = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),          # 2-cycle {a,b}
            ("c", "a"),                        # tail into it
            ("d", "e"), ("e", "f"), ("f", "d"),  # 3-cycle {d,e,f}
            ("g", "g"),                        # self-loop (1-cycle)
            ("h", "g"), ("i", "h"),            # 2-deep tail chain
        ],
        ["node", "succ"],
    )
    got = {
        r["node"]: (r["scc_id"], r["on_cycle"])
        for r in functional_scc(ptr).collect()
    }
    assert got == {
        "a": ("a", True), "b": ("a", True), "c": ("c", False),
        "d": ("d", True), "e": ("d", True), "f": ("d", True),
        "g": ("g", True), "h": ("h", False), "i": ("i", False),
    }


def test_mannwhitney_hand_computed(spark, tmp_path):
    """U, tie term, and the rejection boolean against a pure-Python
    midrank computation on a tied sample."""
    click = [1.00, 2.00, 2.00, 5.00]
    view = [2.00, 3.00, 4.00, 4.00, 6.00]
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "click", v, "{}") for i, v in enumerate(click)
    ] + [
        (100 + i, t0, 1, "view", v, "{}") for i, v in enumerate(view)
    ] + [(900, t0, 1, "purchase", 99.0, "{}")]  # other types excluded
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    r = entrymod.queries()["ev_mannwhitney"](spark, sf).toPandas().iloc[0]

    # pure-Python midranks over cents
    allv = sorted(int(round(v * 100)) for v in click + view)
    rank_x2 = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        # midrank of positions i+1..j (1-based), doubled
        rank_x2[allv[i]] = (i + 1) + j  # 2 * (i+1+j)/2
        i = j
    r1_x2 = sum(rank_x2[int(round(v * 100))] for v in click)
    n1, n2 = len(click), len(view)
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    tie_sizes = Counter(allv).values()
    tie_cubes = sum(t**3 - t for t in tie_sizes)
    assert (r.n1, r.n2) == (n1, n2)
    assert r.u1_x2 == u1_x2
    assert r.tie_cubes == tie_cubes
    n = n1 + n2
    var = (n1 * n2 / 12.0) * ((n + 1.0) - tie_cubes / (n * (n - 1.0)))
    d = u1_x2 - n1 * n2
    assert bool(r.reject_1pct) == (d * d > 4.0 * 6.6349 * var)


def test_tfidf_pairs_identical_docs_hit_cos_1000(spark, tmp_path):
    """Two identical docs (below the df cap thanks to 28 unique-token
    fillers) must surface with cos_milli == 1000 and dot == both
    norms; disjoint docs never pair."""
    texts = ["shared signal tokens alpha beta gamma"] * 2 + [
        f"unique{w}a unique{w}b unique{w}c" for w in range(28)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["s_tfidf_pairs"](spark, sf).toPandas()
    assert list(zip(pdf.doc_a, pdf.doc_b)) == [(0, 1)]
    row = pdf.iloc[0]
    assert row.cos_milli == 1000
    assert row.dot_w == row.norm_a2 == row.norm_b2 > 0


def test_dsir_weights_prefer_target_like_docs(spark, tmp_path):
    """A raw doc written in the target domain's language must outscore
    a raw doc of off-domain bigrams (both with the same length)."""
    target_text = "alpha beta gamma delta " * 10
    rows = (
        [(i, target_text, "en", "src0") for i in range(5)]       # target
        + [(100, target_text, "en", "src9"),                      # mimic
           (101, "zeta eta theta iota " * 10, "en", "src9")]      # off
    )
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_dsir_weights"](spark, sf).toPandas()
    assert set(pdf.doc_id) == {100, 101}
    w = dict(zip(pdf.doc_id, pdf.dsir_micro))
    assert w[100] > w[101]
    # same bigram count -> the contrast is purely distributional
    assert pdf.n_bigrams.nunique() == 1


def test_cusum_alarm_matches_python_recurrence(spark, tmp_path):
    """A rate shift (2/hour -> 12/hour at hour 12) must alarm, and the
    scaled window identity must equal the literal Page recurrence
    S_t = max(0, S_{t-1} + x_t - k) computed in pure Python — including
    EMPTY hours (8-9), which must advance the recurrence."""
    t0 = datetime(2024, 1, 1)
    counts = [2] * 8 + [0, 0] + [2, 2] + [12] * 8  # hours 0..19
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for j in range(c):
            rows.append(
                (eid, t0 + timedelta(hours=h, minutes=j), 1, "click", 1.0, "{}")
            )
            eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    r = entrymod.queries()["ev_cusum_alarm"](spark, sf).toPandas().iloc[0]

    n_hours = len(counts)
    total = sum(counts)
    # literal recurrence on the n_hours-scaled series
    s, max_s, n_alarm, first = 0, 0, 0, -1
    for h, c in enumerate(counts):
        s = max(0, s + n_hours * c - total)
        max_s = max(max_s, s)
        if s > 3 * total:
            n_alarm += 1
            if first < 0:
                first = h
    assert r.n_hours == n_hours
    assert r.max_s_scaled == max_s
    assert r.n_alarm_hours == n_alarm > 0
    assert r.first_alarm_h == first >= 12


def _scc_python(succ: dict) -> dict:
    """Pure-Python SCC of a functional graph: walk each node to its
    terminal cycle; nodes ON the cycle get the cycle min, tails
    themselves."""
    out = {}
    for u in succ:
        seen = {}
        x, i = u, 0
        while x not in seen:
            seen[x] = i
            x, i = succ[x], i + 1
        cycle = {n for n, idx in seen.items() if idx >= seen[x]}
        cmin = min(cycle)
        for n, idx in seen.items():
            if n not in out or idx >= seen[x]:
                out[n] = (cmin, True) if n in cycle else (n, False)
    return out


def test_functional_scc_random_graphs_match_python(spark):
    """Property: pointer-doubling SCC equals the walk-based reference
    on seeded random functional graphs of varied shape (many small
    cycles, one long cycle, deep tails)."""
    import random

    for seed, n in ((7, 40), (13, 97), (29, 256)):
        rnd = random.Random(seed)
        nodes = [f"n{i:03d}" for i in range(n)]
        succ = {u: nodes[rnd.randrange(n)] for u in nodes}
        ptr = spark.createDataFrame(sorted(succ.items()), ["node", "succ"])
        from hikma_engine_spark.operators.graph import functional_scc

        got = {
            r["node"]: (r["scc_id"], r["on_cycle"])
            for r in functional_scc(ptr).collect()
        }
        assert got == _scc_python(succ), f"seed={seed} n={n}"


def test_welch_ttest_hand_computed(spark, tmp_path):
    """Moments, t², Welch df and the rejection boolean against a pure-
    Python computation on small unequal-variance samples."""
    click = [10.00, 12.00, 11.00, 13.00, 9.00, 12.50]
    view = [1.00, 25.00, 3.00, 22.00, 5.00, 30.00, 2.00]
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "click", v, "{}") for i, v in enumerate(click)
    ] + [(100 + i, t0, 1, "view", v, "{}") for i, v in enumerate(view)]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    r = entrymod.queries()["ev_welch_ttest"](spark, sf).toPandas().iloc[0]

    c1 = [int(round(v * 100)) for v in click]
    c2 = [int(round(v * 100)) for v in view]
    n1, s1, q1 = len(c1), sum(c1), sum(v * v for v in c1)
    n2, s2, q2 = len(c2), sum(c2), sum(v * v for v in c2)
    assert (r.n1, r.n2) == (n1, n2)
    assert (r.sum1_cents, r.sum2_cents) == (s1, s2)
    assert (r.sumsq1_cents, r.sumsq2_cents) == (q1, q2)
    v1 = (n1 * q1 - s1 * s1) / (n1 * n1 * (n1 - 1))
    v2 = (n2 * q2 - s2 * s2) / (n2 * n2 * (n2 - 1))
    dm = s1 / n1 - s2 / n2
    t2 = dm * dm / (v1 + v2)
    df = (v1 + v2) ** 2 / (v1 * v1 / (n1 - 1) + v2 * v2 / (n2 - 1))
    assert abs(r.t2_milli - round(1000 * t2)) <= 1
    assert abs(r.df_welch - round(df)) <= 1
    assert bool(r.reject_1pct) == (t2 > 6.6349)
    # unequal variances is the point of Welch: df must sit well below
    # the pooled n1+n2-2
    assert r.df_welch < n1 + n2 - 2


def test_new_stats_entries_plan_contracts(spark, tmp_path):
    """Plan pins for the final-wave entries: Mann-Whitney rides the
    same bucket-partitioned two-phase prefix sum as KS (big windows
    hash-partitioned, only fixed-size SinglePartition exchanges);
    CUSUM's ordered windows are per-event-type, never global."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1,
         "click" if i % 2 else "view", float(i % 40), "{}")
        for i in range(400)
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)

    mw = (
        entrymod.queries()["ev_mannwhitney"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(b#" in mw
    assert mw.count("Exchange SinglePartition") <= 2

    cu = (
        entrymod.queries()["ev_cusum_alarm"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(event_type#" in cu
    assert cu.count("Exchange SinglePartition") == 0

    we = (
        entrymod.queries()["ev_welch_ttest"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one pass: a single scalar aggregation, no joins at all
    assert "Join" not in we


def test_tfidf_and_dsir_dims_are_broadcast(spark, tmp_path):
    """The vocabulary-sized idf dim and the 1024-bucket DSIR log-ratio
    dim must reach their corpus-sized streams as broadcasts — never a
    shuffle join on the big side."""
    texts = [f"alpha beta w{i} w{i + 1} gamma" for i in range(40)]
    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": texts,
            "lang": ["en"] * 40,
            "source": [f"src{i % 10}" for i in range(40)],
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    for name in ("s_tfidf_pairs", "d_dsir_weights"):
        plan = (
            entrymod.queries()[name](spark, sf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan, name


def test_attribution_u_shape_and_window(spark, tmp_path):
    """k=3 splits 40/40/20 in time order, k=1 takes 100%, and touches
    outside the 7-day window or after the conversion get nothing."""
    t0 = datetime(2024, 2, 1)
    rows = [
        # user 1: purchase at t0, touches 3d/2d/1d before (k=3),
        # plus one 8 days before (outside) and one after (excluded)
        (1, t0, 1, "purchase", 10.00, "{}"),
        (2, t0 - timedelta(days=3), 1, "click", 0.0, "{}"),   # first: 40%
        (3, t0 - timedelta(days=2), 1, "view", 0.0, "{}"),    # middle: 20%
        (4, t0 - timedelta(days=1), 1, "click", 0.0, "{}"),   # last: 40%
        (5, t0 - timedelta(days=8), 1, "click", 0.0, "{}"),   # outside
        (6, t0 + timedelta(days=1), 1, "view", 0.0, "{}"),    # after
        # user 2: purchase with exactly one prior view (k=1)
        (7, t0, 2, "purchase", 5.00, "{}"),
        (8, t0 - timedelta(hours=2), 2, "view", 0.0, "{}"),
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["ev_attribution"](spark, sf).toPandas()
    got = {r.touch_type: r for r in pdf.itertuples()}
    # clicks: first (400k) + last (400k) of user 1 = 800k micros on 1000 cents
    assert got["click"].n_touches == 2
    assert got["click"].credit_micros_total == 800000
    assert got["click"].credited_value_micros == 1000 * 800000
    # views: middle (200k on 1000c) + k=1 full credit (1e6 on 500c)
    assert got["view"].n_touches == 2
    assert got["view"].credit_micros_total == 200000 + 1000000
    assert got["view"].credited_value_micros == 1000 * 200000 + 500 * 1000000


def test_corpus_diff_every_status_classified(spark, tmp_path):
    """Each doc lands in exactly the status its id forces: %13==5 →
    added (absent from OLD), %17==3 → removed (absent from NEW),
    %19==2 → changed, rest unchanged; totals partition the id space."""
    n = 60
    docs = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"document body {i}" for i in range(n)],
            "lang": ["en"] * n,
            "source": ["s"] * n,
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_corpus_diff"](spark, sf).toPandas()
    got = dict(zip(pdf.status, pdf.n_docs))
    want = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for i in range(n):
        in_old, in_new = i % 13 != 5, i % 17 != 3
        if not in_old and not in_new:
            continue
        if not in_old:
            want["added"] += 1
        elif not in_new:
            want["removed"] += 1
        elif i % 19 == 2:
            want["changed"] += 1
        else:
            want["unchanged"] += 1
    assert got == {k: v for k, v in want.items() if v > 0}


def test_time_weighted_avg_locf_semantics(spark, tmp_path):
    """A value held for 9 hours must dominate a burst of ticks in one
    minute: TWA = Σ cents·dt / span computed by hand; trailing event
    contributes no segment."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "view", 100.0, "{}"),                      # holds 9h at 10000c
        (2, t0 + timedelta(hours=9), 7, "view", 2.0, "{}"),    # burst minute
        (3, t0 + timedelta(hours=9, minutes=1), 7, "view", 2.0, "{}"),  # trailing
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    r = entrymod.queries()["ev_time_weighted_avg"](spark, sf).toPandas().iloc[0]
    h9, m1 = 9 * 3600 * 1000, 60 * 1000
    assert r.n_segments == 2 and r.span_ms == h9 + m1
    numer = 10000 * h9 + 200 * m1
    assert r.twa_numer == numer
    assert r.twa_cents == numer // (h9 + m1)
    assert r.twa_cents > 9900  # the held value dominates, plain avg would say ~3400


def test_boolean_query_and_not_semantics(spark, tmp_path):
    """AND requires both musts, NOT excludes even when musts match."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "merge the window now",          # match
                "merge the window but slow",     # NOT-excluded
                "merge only here",               # missing a must
                "window only here",              # missing a must
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["s_boolean_query"](spark, sf).toPandas()
    assert list(pdf.doc_id) == [0]


def test_right_to_erasure_propagates_fk_chain(spark, tmp_path):
    """An erased customer takes their orders, those orders' lineitems,
    and their events; unrelated rows stay."""
    cust = pd.DataFrame({"c_custkey": [11, 20], "c_nationkey": [0, 0],
                         "c_name": ["a", "b"], "c_acctbal": [0.0, 0.0]})
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3], "o_custkey": [11, 11, 20],
        "o_totalprice": [1.0, 2.0, 3.0], "o_orderstatus": ["F"] * 3,
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
        "o_orderpriority": ["1-URGENT"] * 3,
    })
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3, 3], "l_partkey": [1] * 5,
        "l_suppkey": [1] * 5, "l_quantity": [1.0] * 5,
        "l_extendedprice": [1.0] * 5, "l_discount": [0.0] * 5,
        "l_tax": [0.0] * 5, "l_returnflag": ["N"] * 5,
        "l_linestatus": ["O"] * 5,
        "l_shipdate": pd.to_datetime(["2024-01-02"] * 5),
    })
    ev = pd.DataFrame({
        "event_id": [1, 2, 3], "ts": pd.to_datetime(["2024-01-01"] * 3),
        "user_id": [11, 20, 20], "event_type": ["view"] * 3,
        "value": [0.0] * 3, "props": ["{}"] * 3,
    })
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    sf = str(tmp_path)
    for name, pdf in (("customer", cust), ("orders", orders),
                      ("lineitem", li), ("events", ev)):
        pdf.to_parquet(str(tmp_path / f"{name}.parquet"))
    out = entrymod.queries()["d_right_to_erasure"](spark, sf).toPandas()
    got = {r.table_name: (r.n_purged, r.n_kept) for r in out.itertuples()}
    assert got == {
        "customer": (1, 1), "orders": (2, 1),
        "lineitem": (3, 2), "events": (1, 2),
    }


def test_minmax_prune_soundness_and_value_dim_pruning(spark, tmp_path):
    """Pure-Python replay of the prune algebra on a crafted table:
    pruning must be SOUND (false_pruned == 0, identical match totals
    across layouts), and a file disjoint from the predicate ONLY on
    the value dimension must be prunable under zorder while the
    linear (user-leading) layout has to scan it."""
    import numpy as np

    rng = np.random.RandomState(7)
    n = 4000
    users = rng.randint(0, 200, n)
    # bimodal values so many files sit entirely outside [100, 200]
    values = np.where(rng.rand(n) < 0.5,
                      rng.uniform(0, 60, n), rng.uniform(300, 480, n))
    # a user inside the predicate band whose values are ALL outside it:
    # under linear layout their file survives on user alone
    users[:50] = 40
    values[:50] = 400.0
    ev = pd.DataFrame({"user_id": users.astype("int64"),
                       "value": values.astype("float64")})
    ev.to_parquet(str(tmp_path / "events.parquet"))

    out = entrymod.queries()["l_minmax_prune"](spark, str(tmp_path)).toPandas()
    got = {r.layout: r for r in out.itertuples()}

    # python reference of the exact algebra
    bits, m = 10, 1023
    (u_lo, u_hi, v_lo, v_hi) = entrymod._PRUNE_PRED
    (_, ulo, uhi), (_, vlo, vhi) = entrymod._PRUNE_SPEC

    def scale(x, lo, hi):
        s = np.floor((x.astype("float64") - lo) * m / (hi - lo)).astype("int64")
        return np.clip(s, 0, m)

    su, sv = scale(users, ulo, uhi), scale(values, vlo, vhi)
    zkey = np.zeros(n, dtype="int64")
    for i in range(bits):
        zkey |= ((su >> i) & 1) << (2 * i)
        zkey |= ((sv >> i) & 1) << (2 * i + 1)
    match = ((users >= u_lo) & (users <= u_hi)
             & (values >= v_lo) & (values <= v_hi))
    for layout, fid in (("zorder", zkey >> bits), ("linear", su)):
        df = pd.DataFrame({"f": fid, "u": users, "v": values, "m": match})
        g = df.groupby("f").agg(min_u=("u", "min"), max_u=("u", "max"),
                                min_v=("v", "min"), max_v=("v", "max"),
                                n=("m", "size"), nm=("m", "sum"))
        pruned = ((g.max_u < u_lo) | (g.min_u > u_hi)
                  | (g.max_v < v_lo) | (g.min_v > v_hi))
        r = got[layout]
        assert (r.n_files, r.files_pruned) == (len(g), int(pruned.sum()))
        assert r.rows_scanned == int(g.n[~pruned].sum())
        assert r.rows_matched == int(match.sum())
        assert r.false_pruned == 0 and int(g.nm[pruned].sum()) == 0

    assert got["zorder"].rows_matched == got["linear"].rows_matched
    # the planted user-40/value-400 file: linear MUST scan those rows
    # (user 40 is inside the band), zorder skips most of them
    assert got["linear"].rows_scanned >= 50
    assert got["zorder"].rows_scanned < got["linear"].rows_scanned


def test_bloom_semijoin_soundness_under_forced_collisions(spark, tmp_path):
    """With a deliberately undersized bitmap (m = 256 bits, m/n ~ 2)
    false positives MUST appear — and false negatives still must not:
    a Bloom filter is sound by construction. The Spark probe is
    replayed bit-for-bit in pure Python."""
    import numpy as np
    from pyspark.sql import functions as F

    from hikma_engine_spark.operators import bloom

    m_bits, k = 8, 4
    m = 1 << m_bits
    build_keys = list(range(3, 400, 3))          # 133 keys
    probe_keys = list(range(0, 1000))            # 1000 probes
    keys = spark.createDataFrame([(x,) for x in build_keys], "key long")
    bf = bloom.bloom_build(keys, "key", m_bits, k)
    probes = spark.createDataFrame([(x,) for x in probe_keys], "pk long")
    got = (
        probes.crossJoin(F.broadcast(bf))
        .select("pk", bloom.bloom_hit("pk", "bf", m_bits, k).alias("hit"))
        .toPandas()
        .sort_values("pk")
        .reset_index(drop=True)
    )

    # pure-python replay of the same hash algebra
    bits = set()
    for x in build_keys:
        for a, b in bloom.HASHES[:k]:
            bits.add((((x % bloom.P) * a + b) % bloom.P) % m)

    def py_hit(x):
        return all(
            (((x % bloom.P) * a + b) % bloom.P) % m in bits
            for a, b in bloom.HASHES[:k]
        )

    expect = [py_hit(x) for x in probe_keys]
    assert got.hit.tolist() == expect
    member = set(build_keys)
    fn = [x for x, h in zip(probe_keys, expect) if x in member and not h]
    fp = [x for x, h in zip(probe_keys, expect) if x not in member and h]
    assert fn == []            # soundness: never drops a member
    assert len(fp) > 0         # undersized filter really collides


# --- final-wave entries: skyline, profiling, priority sample, top paths ---


def test_pareto_frontier_matches_bruteforce(spark):
    """The two-phase local/global window skyline equals the O(n²)
    dominance definition exactly (local pruning is safe because
    dominance is transitive)."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_pareto_frontier"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    p = pd.read_parquet("/root/testdata/sf0.001/part.parquet")
    p["size"] = p.p_size.astype("int64")
    p["price_cents"] = (p.p_retailprice * 100).round().astype("int64")
    keep = []
    for _, a in p.iterrows():
        dominated = (
            (p["size"] >= a["size"])
            & (p.price_cents <= a.price_cents)
            & ((p["size"] > a["size"]) | (p.price_cents < a.price_cents))
        ).any()
        if not dominated:
            keep.append((a.p_partkey, a["size"], a.price_cents))
    expect = (
        pd.DataFrame(keep, columns=["p_partkey", "size", "price_cents"])
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(expect.astype("int64"))


def test_priority_sample_plan_and_bias(spark):
    """Bottom-k by an embarrassingly-parallel key must compile to
    TakeOrderedAndProject (per-partition heaps, no full sort shuffle),
    and weight-biased sampling must actually bias: the sampled docs'
    mean n_chars exceeds the corpus mean."""
    import pandas as pd

    import __spark_entry__ as entrymod

    df = entrymod.queries()["d_priority_sample"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = df.toPandas()
    assert len(got) == 200
    # deterministic: re-running yields the identical sample
    again = (
        entrymod.queries()["d_priority_sample"](spark, "/root/testdata/sf0.01")
        .toPandas()
    )
    assert got.doc_id.tolist() == again.doc_id.tolist()
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    assert got.w.mean() > docs.n_chars.mean()


def test_top_paths_bounded_and_shuffle_reuse(spark):
    """Every surfaced path has 2–8 hops (state bounded BEFORE
    assembly), counts are non-increasing, and with broadcast disabled
    the path-assembly groupBy reuses the join's (user_id, day)
    partitioning — exactly 4 hash exchanges end to end: day counts,
    join probe side, and the histogram's two-phase exact
    count(distinct user_id) (partial by (path, user) then by path).
    Crucially there is NO exchange between the join and the
    collect_list assembly — that reuse is the scale claim."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["ev_top_paths"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan_str = plan
        assert plan_str.count("Exchange hashpartitioning") == 4, plan_str
        # the scale claim: join output feeds collect_list directly —
        # no exchange between SortMergeJoin and the path assembly
        join_to_agg = plan_str.split("SortMergeJoin")[0]
        assert "collect_list" in join_to_agg
        assert "Exchange" not in join_to_agg.split("ObjectHashAggregate")[-1]
        got = df.toPandas()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert len(got) > 0
    hops = got.path.str.count(">") + 1
    assert hops.between(2, 8).all()
    assert (got.n_sessions.values[:-1] >= got.n_sessions.values[1:]).all()
    assert (got.n_users <= got.n_sessions).all()


def test_profile_columns_matches_pandas(spark):
    """The one-pass long-format profile equals a pandas profile of the
    same four columns."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_profile_columns"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("col_name")
    )
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    o["o_total_cents"] = (o.o_totalprice * 100).round().astype("int64")
    for c in ["o_custkey", "o_orderstatus", "o_orderpriority", "o_total_cents"]:
        row = got.loc[c]
        assert row.n_rows == len(o)
        assert row.n_null == int(o[c].isna().sum())
        assert row.n_distinct == o[c].nunique()
        assert row.min_val == str(o[c].min())
        assert row.max_val == str(o[c].max())


def test_halfsample_ci_replicate_properties(spark):
    """32 replicates, each holding ~half the rows (frac_millis near
    500), total membership ~16N (each row joins popcount(h)≈16
    replicates), and the replicate means actually spread (nonzero
    variance — the CI material exists)."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["ev_halfsample_ci"](spark, "/root/testdata/sf0.01")
        .toPandas()
    )
    assert len(got) == 32
    assert got.frac_millis.between(400, 600).all()
    ev = pd.read_parquet("/root/testdata/sf0.01/events.parquet")
    n_purch = int((ev.event_type == "purchase").sum())
    assert abs(got.n.sum() - 16 * n_purch) < 0.05 * 16 * n_purch
    assert got.mean_millicents.nunique() > 1
    # replicate means bracket the full-sample mean (half samples are
    # centered on the full estimate)
    full_mean = (ev[ev.event_type == "purchase"].value * 100).round().sum()
    full_milli = int(1000 * full_mean) // n_purch
    assert got.mean_millicents.min() <= full_milli <= got.mean_millicents.max()


def test_vocab_growth_matches_pandas_cumulative(spark):
    """The parallel first-seen identity equals a literal sequential
    scan: vocab_cum(k) == |distinct tokens among docs in buckets
    0..k|, tokens_cum is monotone, bucket 0 mints the most types."""
    import re

    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["d_vocab_growth"](spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    max_id = docs.doc_id.max()
    docs["bucket"] = (10 * docs.doc_id // (max_id + 1)).clip(upper=9)

    def toks(s):
        return [t for t in re.sub(r"[^a-z0-9]+", " ", s.lower()).split() if t]

    seen, expect_vocab, expect_tokens, tok_cum = set(), [], [], 0
    for k in sorted(docs.bucket.unique()):
        for s in docs[docs.bucket == k].text:
            tt = toks(s)
            tok_cum += len(tt)
            seen.update(tt)
        expect_vocab.append(len(seen))
        expect_tokens.append(tok_cum)
    assert got.vocab_cum.tolist() == expect_vocab
    assert got.tokens_cum.tolist() == expect_tokens
    assert got.n_new_types.iloc[0] == got.n_new_types.max()


def test_benford_terms_match_scipy_free_reference(spark):
    """χ² milli-terms equal a pure-Python replay of the same integer
    algebra, probabilities sum to exactly 1000, and the chi2 total is
    the term sum."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["ev_benford"](spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    assert len(got) == 9
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype("int64")
    cents = cents[cents >= 1]
    digits = cents.astype(str).str[0].astype(int)
    n_all = len(cents)
    p = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}
    assert sum(p.values()) == 1000
    for _, row in got.iterrows():
        n_obs = int((digits == row.digit).sum())
        e_milli = n_all * p[row.digit]
        term = (1000 * n_obs - e_milli) ** 2 // e_milli
        assert row.n_obs == n_obs
        assert row.expected_milli == e_milli
        assert row.term_milli == term
    assert (got.chi2_milli == got.term_milli.sum()).all()


def test_gini_matches_sequential_formula(spark):
    """The distributed tie-block rank identity equals the literal
    sorted-scan Gini, and the value sits in (0, 1000)."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_gini_revenue"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .iloc[0]
    )
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    rev = o.groupby("o_custkey").cents.sum().sort_values().reset_index(drop=True)
    n, s = len(rev), int(rev.sum())
    t = int(sum((i + 1) * int(v) for i, v in enumerate(rev)))
    assert got.n_customers == n
    assert got.sum_cents == s
    assert got.t_rank_weighted == t
    assert got.gini_milli == (1000 * (2 * t - (n + 1) * s)) // (n * s)
    assert 0 < got.gini_milli < 1000


def test_sliding_window_max_matches_bruteforce(spark):
    """The RANGE-frame sliding count equals a literal per-user O(n²)
    window scan, and the peak row is the tie-broken argmax."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["ev_sliding_window_max"](
            spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("user_id")
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["epoch_us"] = ev.ts.values.astype("datetime64[us]").astype("int64")
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["epoch_us", "event_id"]).reset_index(drop=True)
        best = None
        for _, row in g.iterrows():
            cnt = int(
                (
                    (g.epoch_us >= row.epoch_us - 60_000_000)
                    & (g.epoch_us <= row.epoch_us)
                ).sum()
            )
            key = (-cnt, row.epoch_us, row.event_id)
            if best is None or key < best[0]:
                best = (key, cnt, row.epoch_us)
        assert got.loc[uid].peak_60s_events == best[1], uid
        assert got.loc[uid].peak_window_end_us == best[2], uid


def test_log_histogram_buckets_and_p99(spark):
    """Bucket = floor(log2)+1 exactly, bounds are the power-of-two
    interval, cumulative is monotone, and exactly one bucket contains
    the ceil(0.99 N) rank — and the true p99 lies inside its bounds."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_log_histogram"](spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    cents = (ev.value * 100).round().astype("int64")
    cents = cents[cents >= 1]
    for _, row in got.iterrows():
        assert row.lo_cents == 1 << (row.bucket - 1)
        assert row.hi_cents == (1 << row.bucket) - 1
        assert row.n == int(
            ((cents >= row.lo_cents) & (cents <= row.hi_cents)).sum()
        )
    assert (got.cum.values[1:] > got.cum.values[:-1]).all()
    assert got.contains_p99.sum() == 1
    p99 = int(cents.sort_values().iloc[(99 * len(cents) + 99) // 100 - 1])
    b = got[got.contains_p99].iloc[0]
    assert b.lo_cents <= p99 <= b.hi_cents


def test_entity_lifespan_spans_are_ordered(spark):
    """first ≤ last under (conv, turn) order, counts consistent, and
    every gazetteer surface that appears has a row."""
    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["kg_entity_lifespan"](
            spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    assert len(got) > 0
    for _, r in got.iterrows():
        assert (r.first_conv, r.first_turn) <= (r.last_conv, r.last_turn)
        assert 1 <= r.n_convs <= r.n_mentions
    # singleton mention → first == last
    ones = got[got.n_mentions == 1]
    for _, r in ones.iterrows():
        assert (r.first_conv, r.first_turn) == (r.last_conv, r.last_turn)


def test_autocomplete_prefix_table_properties(spark):
    """Each prefix holds ≤5 completions ranked (freq DESC, token ASC),
    every completion actually starts with its prefix, and the rank-1
    completion of a 1-char prefix is the corpus's most frequent token
    with that initial (replayed in pandas)."""
    import re

    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["s_query_autocomplete"](
            spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    assert got.groupby("prefix").rnk.max().le(5).all()
    assert all(c.startswith(p) for p, c in zip(got.prefix, got.completion))
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    toks = pd.Series(
        [t for s in docs.text
         for t in re.sub(r"[^a-z0-9]+", " ", s.lower()).split()
         if len(t) >= 2]
    )
    freq = toks.value_counts()
    for p in got[got.prefix.str.len() == 1].prefix.unique():
        sub = freq[freq.index.str.startswith(p)]
        best = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        row1 = got[(got.prefix == p) & (got.rnk == 1)].iloc[0]
        assert (row1.completion, row1.freq) == best


def test_pareto8020_club_is_smallest_covering_prefix(spark):
    """The 80% club is exactly the smallest descending-revenue prefix
    reaching 800 millis, shares sum to ~1000, cum is monotone."""
    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_pareto8020"](spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    assert (got.cum_millis.values[1:] >= got.cum_millis.values[:-1]).all()
    club = got[got.in_80club]
    rest = got[~got.in_80club]
    # club rows are a prefix (all before any non-club row)
    assert club.index.max() < (rest.index.min() if len(rest) else 1 << 30)
    # the club covers >= 800 millis, and dropping its last member doesn't
    assert club.cum_millis.iloc[-1] >= 800
    if len(club) > 1:
        assert club.cum_millis.iloc[-2] < 800
    assert abs(got.share_millis.sum() - 1000) <= len(got)  # floor slack


def test_dau_wau_matches_pandas(spark):
    """DAU/WAU equal a literal pandas replay; stickiness ≤ 1000 and
    WAU ≥ DAU always."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["ev_dau_wau"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("day")
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    act = ev.assign(day=ev.ts.dt.date).groupby(["user_id", "day"]).size()
    act = act.reset_index()[["user_id", "day"]]
    for day_str, row in got.iterrows():
        day = pd.Timestamp(day_str).date()
        dau = act[act.day == day].user_id.nunique()
        lo = day - pd.Timedelta(days=6)
        wau = act[(act.day >= lo) & (act.day <= day)].user_id.nunique()
        assert (row.dau, row.wau) == (dau, wau), day_str
        assert row.wau >= row.dau
        assert row.stickiness_millis == 1000 * dau // wau


def test_corr_lineitem_matches_numpy(spark):
    """r_micro equals numpy's corrcoef on the same quantized columns
    to 1e-6 (the synthetic lineitem draws price independently of
    quantity, so all three pairs hover near zero — the test pins the
    MOMENT algebra, not a domain story)."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_corr_lineitem"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("pair")
    )
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = (li.l_quantity * 100).round().astype("int64")
    p = li.l_extendedprice.round().astype("int64")
    d = (li.l_discount * 1000).round().astype("int64")
    cols = {"q": q, "p": p, "d": d}
    for pair in ["p~d", "q~d", "q~p"]:
        x, y = pair.split("~")
        r = np.corrcoef(cols[x], cols[y])[0, 1]
        assert abs(got.loc[pair].r_micro - round(r * 1e6)) <= 1, pair
        assert abs(got.loc[pair].r_micro) <= 1_000_000


def test_seasonal_backtest_matches_pandas(spark):
    """Lag-7 forecasts, per-day errors and both MAEs equal a literal
    pandas replay."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["ev_seasonal_backtest"](
            spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    daily = (
        ev.assign(day=ev.ts.dt.date,
                  cents=(ev.value * 100).round().astype("int64"))
        .groupby("day").cents.sum().sort_index()
    )
    f7, f1 = daily.shift(7), daily.shift(1)
    mask = f7.notna() & f1.notna()
    e7 = (daily - f7)[mask].abs().astype("int64")
    e1 = (daily - f1)[mask].abs().astype("int64")
    assert got.abs_err7.tolist() == e7.tolist()
    assert (got.mae7_cents == int(e7.sum()) // len(e7)).all()
    assert (got.mae1_cents == int(e1.sum()) // len(e1)).all()
    assert (got.seasonal_beats_naive1
            == (int(e7.sum()) // len(e7) < int(e1.sum()) // len(e1))).all()


def test_srm_check_balanced_hash_and_forced_skew(spark):
    """A healthy 50/50 hash split must NOT flag SRM on real data, and
    the chi-square identity (n_a-n_b)^2/n is replayed exactly; a
    synthetic 70/30 frame MUST flag."""
    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_srm_check"](spark, "/root/testdata/sf0.01")
        .toPandas().iloc[0]
    )
    assert got.n_a + got.n_b == got.n_users
    assert got.chi2_milli == 1000 * (got.n_a - got.n_b) ** 2 // got.n_users
    assert not got.srm_detected  # md5 is not biased
    # forced skew: 700 vs 300 → chi2 = 160 >> 10.828
    assert 1000 * (700 - 300) ** 2 // 1000 >= 10828


def test_turn_fanout_accounts_every_turn(spark):
    """Histogram covers ALL turns (Σ n_turns == corpus turn count,
    including silent turns in the k=0 bucket) and shares are floor
    millis of that total."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["kg_turn_fanout"](spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    assert got.n_turns.sum() == len(docs)  # one turn per document row
    # silent turns land in the k=0 bucket IFF the corpus has any
    # (this corpus is entity-dense; the accounting identity above is
    # what proves no turn was dropped either way)
    import re
    gaz = ("sort merge", "table scan", "hash join", "filter", "stream",
           "vector", "window", "batch", "query", "spark")
    pat = re.compile(r"\b(?:" + "|".join(gaz) + r")\b")
    n_silent = int((~docs.text.str.lower().str.contains(pat)).sum())
    if n_silent:
        assert int(got[got.k == 0].n_turns.iloc[0]) == n_silent
    else:
        assert 0 not in got.k.values
    total = int(got.n_turns.sum())
    assert (got.share_millis == 1000 * got.n_turns // total).all()


def test_cuped_matches_numpy(spark):
    """theta and the variance-reduction factor equal numpy's
    cov/var and corr² on the same per-user covariates (≤1 micro),
    and 0 ≤ var_reduction ≤ 1e6."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["ev_cuped"](spark, "/root/testdata/sf0.001")
        .toPandas().iloc[0]
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    ev["is_pre"] = ev.ts.dt.day <= 15
    pu = ev.groupby("user_id").apply(
        lambda g: pd.Series({
            "x": int(g.cents[g.is_pre].sum()),
            "y": int(g.cents[~g.is_pre].sum()),
        }),
        include_groups=False,
    )
    x, y = pu.x.values.astype(float), pu.y.values.astype(float)
    n = len(pu)
    cov = n * (x * y).sum() - x.sum() * y.sum()
    varx = n * (x * x).sum() - x.sum() ** 2
    vary = n * (y * y).sum() - y.sum() ** 2
    theta = cov / varx
    corr2 = cov * cov / varx / vary
    assert got.n == n
    assert abs(got.theta_micro - round(theta * 1e6)) <= 1
    assert abs(got.var_reduction_micro - round(corr2 * 1e6)) <= 1
    assert 0 <= got.var_reduction_micro <= 1_000_000


def test_experiment_readout_matches_numpy(spark):
    """theta and both Welch t statistics equal a numpy replay of the
    same moment algebra (≤1 milli/micro), and the A/A design holds:
    hash assignment of a non-causal id must not reject at 1%."""
    import numpy as np
    import pandas as pd
    import hashlib

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["ev_experiment_readout"](
            spark, "/root/testdata/sf0.01")
        .toPandas().iloc[0]
    )
    ev = pd.read_parquet("/root/testdata/sf0.01/events.parquet")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    ev["is_pre"] = ev.ts.dt.day <= 15
    pu = ev.groupby("user_id").apply(
        lambda g: pd.Series({
            "x": int(g.cents[g.is_pre].sum()),
            "y": int(g.cents[~g.is_pre].sum()),
        }),
        include_groups=False,
    ).reset_index()
    pu["arm"] = pu.user_id.map(
        lambda u: int(hashlib.md5(f"{u}:exp1".encode()).hexdigest()[:12], 16)
        % 2
    )
    x, y = pu.x.values.astype(float), pu.y.values.astype(float)
    n = len(pu)
    theta = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    assert abs(got.theta_micro - round(theta * 1e6)) <= 1

    def welch(vals_a, vals_b):
        ma, mb = vals_a.mean(), vals_b.mean()
        va = vals_a.var(ddof=1)
        vb = vals_b.var(ddof=1)
        return (ma - mb) / np.sqrt(va / len(vals_a) + vb / len(vals_b))

    ya, yb = y[pu.arm == 0], y[pu.arm == 1]
    adj = y - theta * x
    assert abs(got.t_raw_milli - round(welch(ya, yb) * 1000)) <= 1
    assert abs(
        got.t_adj_milli
        - round(welch(adj[pu.arm == 0], adj[pu.arm == 1]) * 1000)
    ) <= 1
    assert got.a_n + got.b_n == n
    assert not got.any_reject_1pct  # A/A calibration


# ---------------------------------------------------------------------------
# session-3 entries
# ---------------------------------------------------------------------------


def test_weighted_median_halfmass_replay(spark):
    """Exact pandas replay of the quantity-weighted price median per
    return flag: the reported price must be the SMALLEST price whose
    cumulative quantity reaches half the flag's total (2*cum >= total
    in integers), and total_weight must equal the flag's quantity sum."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_weighted_median"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("l_returnflag")
    )
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    li = li.assign(
        price_cents=(li.l_extendedprice * 100).round().astype("int64"),
        qty=li.l_quantity.round().astype("int64"),
    )
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.groupby("price_cents").qty.sum().sort_index()
        tot = int(g.sum())
        cum = g.cumsum()
        expect = int(cum[2 * cum >= tot].index[0])
        assert int(got.loc[flag, "weighted_median_cents"]) == expect
        assert int(got.loc[flag, "total_weight"]) == tot


def test_zscore_outliers_matches_numpy(spark):
    """The division-free 3-sigma predicate (n*x - s1)^2 > 9*(n*s2 - s1^2)
    replayed with arbitrary-precision Python ints per event type."""
    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["a_zscore_outliers"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    cents = (ev.value * 100).round().astype("int64")
    for et, grp in cents.groupby(ev.event_type):
        n = int(len(grp))
        s1 = int(grp.sum())
        s2 = int((grp.astype(object) ** 2).sum())
        n_out = sum(
            1 for x in grp if (n * int(x) - s1) ** 2 > 9 * (n * s2 - s1 * s1)
        )
        assert int(got.loc[et, "n"]) == n
        assert int(got.loc[et, "n_outliers"]) == n_out
        assert int(got.loc[et, "outlier_permille"]) == 1000 * n_out // n


def test_peak_concurrency_inclusive_boundary(spark, tmp_path):
    """Hand-built intervals pin the sweep semantics: at an exactly-shared
    timestamp the +1 is applied before the -1 (delta DESC tie-break), so
    a session starting the instant another ends counts as concurrent."""
    from datetime import datetime

    import pandas as pd

    import __spark_entry__ as entrymod

    d = datetime(2024, 1, 1)
    rows = []
    # u1 active [1s, 10s]; u2 [5s, 12s]; u3 starts exactly at u1's end
    for uid, (a, b) in {1: (1, 10), 2: (5, 12), 3: (10, 20)}.items():
        for sec in (a, b):
            rows.append(
                {
                    "event_id": len(rows),
                    "ts": d.replace(second=sec % 60, minute=sec // 60),
                    "user_id": uid,
                    "event_type": "x",
                    "value": 1.0,
                    "props": "{}",
                }
            )
    pd.DataFrame(rows).to_parquet(
        str(tmp_path / "events.parquet"), coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    got = (
        entrymod.queries()["ev_peak_concurrency"](spark, str(tmp_path))
        .toPandas()
        .iloc[0]
    )
    # at t=10s: u1 still live (+1 before -1), u2 live, u3 starts -> 3
    assert int(got.peak_concurrent) == 3
    assert int(got.first_peak_us) == 10_000_000
    assert int(got.n_sessions) == 3


def test_winnowing_detects_long_shared_run(spark, tmp_path):
    """The winnowing guarantee: documents sharing a token run of length
    >= w+k-1 share at least one selected fingerprint — a 30-token shared
    run across different contexts must surface the pair; a disjoint doc
    must not pair with anything."""
    import pandas as pd

    import __spark_entry__ as entrymod

    shared = " ".join(f"tok{i}" for i in range(30))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "alpha beta gamma " + shared + " delta epsilon",
                "one two three four five " + shared,
                " ".join(f"zzz{i}" for i in range(40)),
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    got = entrymod.queries()["d_winnowing_pairs"](spark, str(tmp_path)).toPandas()
    pairs = set(zip(got.doc_a, got.doc_b))
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_assoc_confidence_replay_and_asymmetry(spark):
    """Full pandas replay of the directed confidence table via the same
    gazetteer regex over the documents-as-turns view; also asserts the
    operator's point: conf(a->b) != conf(b->a) somewhere on this corpus."""
    import re

    import pandas as pd

    import __spark_entry__ as entrymod

    got = entrymod.queries()["kg_assoc_confidence"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    gaz = sorted(set(entrymod.DOC_SURFACES), key=lambda x: (-len(x), x))
    pat = re.compile(r"\b(" + "|".join(gaz) + r")\b")
    units = [set(pat.findall(t.lower())) for t in docs.text]
    from collections import Counter

    marg: Counter = Counter()
    co: Counter = Counter()
    for s in units:
        for a in s:
            marg[a] += 1
            for b in s:
                if a != b:
                    co[(a, b)] += 1
    expect = {
        k: (v, marg[k[0]], 1000 * v // marg[k[0]]) for k, v in co.items()
    }
    got_map = {
        (r.e1, r.e2): (r.n_co, r.n_a, r.conf_permille)
        for r in got.itertuples(index=False)
    }
    assert got_map == expect
    assert any(
        got_map[(a, b)][2] != got_map[(b, a)][2]
        for (a, b) in got_map
        if (b, a) in got_map
    )


def test_resource_alloc_matches_bruteforce(spark):
    """RA index replayed exactly: distinct customer-part edges, degree
    band [2, 40], score = sum(1000000 // deg) over shared parts, top-50
    with (score desc, c1, c2) tie-break."""
    from collections import Counter, defaultdict

    import pandas as pd

    import __spark_entry__ as entrymod

    got = entrymod.queries()["g_resource_alloc"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    li = pd.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    )
    o = pd.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
    )
    cp = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_partkey"]
        ]
        .drop_duplicates()
        .itertuples(index=False)
    )
    by_part = defaultdict(list)
    for c, p in cp:
        by_part[p].append(c)
    score: Counter = Counter()
    ncom: Counter = Counter()
    for p, cs in by_part.items():
        d = len(cs)
        if not (2 <= d <= 40):
            continue
        cs = sorted(cs)
        for i in range(d):
            for j in range(i + 1, d):
                key = (cs[i], cs[j])
                score[key] += 1_000_000 // d
                ncom[key] += 1
    top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    expect = [(c1, c2, ncom[(c1, c2)], s) for (c1, c2), s in top]
    assert [tuple(r) for r in got.itertuples(index=False)] == expect


def test_keyphrases_argmax_tiebreak_and_stopword_cap(spark, tmp_path):
    """A token present in EVERY doc is excluded by the 90% df cap; a
    within-doc weight tie resolves alphabetically."""
    import pandas as pd

    import __spark_entry__ as entrymod

    # 10 docs all containing 'common'; doc0 has alpha+beta once each
    # (equal tf, equal df -> equal w -> 'alpha' wins the tie);
    # docs 1-9 each have a unique token twice.
    texts = ["common alpha beta"] + [
        f"common uniq{i} uniq{i}" for i in range(1, 10)
    ]
    pd.DataFrame(
        {
            "doc_id": range(10),
            "text": texts,
            "lang": ["en"] * 10,
            "source": ["s"] * 10,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = entrymod.queries()["d_keyphrases"](spark, str(tmp_path)).toPandas()
    assert "common" not in set(got.keyword)
    top1 = dict(zip(got.keyword, got.n_docs_top1))
    assert top1.get("alpha") == 1 and "beta" not in top1
    assert all(top1.get(f"uniq{i}") == 1 for i in range(1, 10))


def test_entropy_mix_hand_distributions(spark, tmp_path):
    """Uniform 2-type day = exactly 1000 milli-bits; single-type day =
    0; uniform 3-type day = round(1000*log2(3)) = 1585."""
    from datetime import datetime

    import pandas as pd

    import __spark_entry__ as entrymod

    rows = []
    days = {
        1: ["a", "a", "b", "b"],
        2: ["a", "a", "a"],
        3: ["a", "b", "c"],
    }
    for day, types in days.items():
        for t in types:
            rows.append(
                {
                    "event_id": len(rows),
                    "ts": datetime(2024, 1, day, 12, 0, len(rows) % 60),
                    "user_id": 1,
                    "event_type": t,
                    "value": 1.0,
                    "props": "{}",
                }
            )
    pd.DataFrame(rows).to_parquet(
        str(tmp_path / "events.parquet"), coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    got = (
        entrymod.queries()["ev_entropy_mix"](spark, str(tmp_path))
        .toPandas()
        .set_index("day")
    )
    assert int(got.loc["2024-01-01", "entropy_milli"]) == 1000
    assert int(got.loc["2024-01-02", "entropy_milli"]) == 0
    assert int(got.loc["2024-01-03", "entropy_milli"]) == 1585
    assert int(got.loc["2024-01-03", "n_types"]) == 3


def test_busy_time_hand_intervals(spark, tmp_path):
    """Union-coverage replay on hand intervals: overlapping+touching
    sessions merge into one block (inclusive boundary), disjoint ones
    count the gap between them."""
    from datetime import datetime

    import pandas as pd

    import __spark_entry__ as entrymod

    rows = []
    # day 1: u1 [1,10], u2 [5,12], u3 [10,20] -> one block [1,20]
    for uid, (a, b) in {1: (1, 10), 2: (5, 12), 3: (10, 20)}.items():
        for sec in (a, b):
            rows.append(
                {
                    "event_id": len(rows),
                    "ts": datetime(2024, 1, 1, 0, 0, sec),
                    "user_id": uid,
                    "event_type": "x",
                    "value": 1.0,
                    "props": "{}",
                }
            )
    # day 2: u1 [0,5], u2 [10,15] -> two blocks, 5s gap
    for uid, (a, b) in {1: (0, 5), 2: (10, 15)}.items():
        for sec in (a, b):
            rows.append(
                {
                    "event_id": len(rows),
                    "ts": datetime(2024, 1, 2, 0, 0, sec),
                    "user_id": uid,
                    "event_type": "x",
                    "value": 1.0,
                    "props": "{}",
                }
            )
    pd.DataFrame(rows).to_parquet(
        str(tmp_path / "events.parquet"), coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    got = (
        entrymod.queries()["ev_busy_time"](spark, str(tmp_path))
        .toPandas()
        .set_index("day")
    )
    d1 = got.loc["2024-01-01"]
    assert (int(d1.covered_us), int(d1.gap_us), int(d1.n_blocks)) == (
        19_000_000, 0, 1,
    )
    d2 = got.loc["2024-01-02"]
    assert (int(d2.covered_us), int(d2.gap_us), int(d2.n_blocks)) == (
        10_000_000, 5_000_000, 2,
    )


def test_snippets_positions_and_counts(spark, tmp_path):
    """KWIC algebra on hand docs: 1-based first position, non-overlapping
    hit count via the replace-length identity, 80-char window clamped at
    the string start."""
    import pandas as pd

    import __spark_entry__ as entrymod

    texts = [
        "xx Window yy window zz",  # pos 4 (case-folded), 2 hits
        "no match here",
        "window leads",  # pos 1 -> clamp
    ]
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = (
        entrymod.queries()["s_snippets"](spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert 1 not in got.index
    assert (int(got.loc[0, "pos"]), int(got.loc[0, "n_hits"])) == (4, 2)
    assert got.loc[0, "snippet"] == texts[0].lower()
    assert (int(got.loc[2, "pos"]), int(got.loc[2, "n_hits"])) == (1, 1)
    assert got.loc[2, "snippet"] == texts[2].lower()[:80]


def _mention_units(docs, surfaces):
    import re

    gaz = sorted(set(surfaces), key=lambda x: (-len(x), x))
    pat = re.compile(r"\b(" + "|".join(gaz) + r")\b")
    return [set(pat.findall(t.lower())) for t in docs.text]


def test_two_hop_inference_maxmin_replay(spark):
    """Full replay: inferred = max over intermediates of min(conf_ab,
    conf_bc) with (score desc, via asc) tie-break; direct column equals
    the assoc-confidence table (0 when the pair never co-occurs)."""
    from collections import Counter

    import pandas as pd

    import __spark_entry__ as entrymod

    got = entrymod.queries()["kg_two_hop_inference"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    units = _mention_units(docs, entrymod.DOC_SURFACES)
    marg: Counter = Counter()
    co: Counter = Counter()
    for s in units:
        for x in s:
            marg[x] += 1
            for y in s:
                if x != y:
                    co[(x, y)] += 1
    conf = {k: 1000 * v // marg[k[0]] for k, v in co.items()}
    best = {}
    for (x, via), c1 in conf.items():
        for (v2, y), c2 in conf.items():
            if v2 != via or y == x:
                continue
            s = min(c1, c2)
            cur = best.get((x, y))
            if cur is None or (-s, via) < (-cur[0], cur[1]):
                best[(x, y)] = (s, via)
    expect = {
        (x, y): (via, s, conf.get((x, y), 0))
        for (x, y), (s, via) in best.items()
    }
    got_map = {
        (r.a, r.c): (r.via, r.inferred_permille, r.direct_permille)
        for r in got.itertuples(index=False)
    }
    assert got_map == expect


def test_entity_cards_replay(spark):
    """Card columns replayed: unit share permille, co-mention degree,
    deterministic top-3 CSV."""
    from collections import Counter

    import pandas as pd

    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["kg_entity_cards"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("entity")
    )
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    units = [u for u in _mention_units(docs, entrymod.DOC_SURFACES) if u]
    n_total = len(units)
    marg: Counter = Counter()
    co: Counter = Counter()
    for s in units:
        for x in s:
            marg[x] += 1
            for y in s:
                if x != y:
                    co[(x, y)] += 1
    for ent, n in marg.items():
        row = got.loc[ent]
        assert int(row.n_units) == n
        assert int(row.share_permille) == 1000 * n // n_total
        cos = [(c, y) for (x, y), c in co.items() if x == ent]
        assert int(row.degree) == len(cos)
        top = [y for c, y in sorted(cos, key=lambda t: (-t[0], t[1]))[:3]]
        assert row.top_co == ",".join(top)


def _round_away(x: float) -> int:
    """round-half-away-from-zero, matching Spark/DuckDB round()."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def test_gap_fill_locf_and_lerp(spark, tmp_path):
    """Hand spine: type A observed at hours 0,1,4 -> hours 2,3 are gaps
    (LOCF carries 3; lerp walks 3->9 exactly); type B observed only at
    hour 3 -> leading hours fall back flat to the next observation
    (NOCB), trailing hours carry it forward."""
    rows = []
    for h, n in [(0, 2), (1, 3), (4, 9)]:
        rows += [
            {"ts": datetime(2024, 1, 1, h, 30), "event_type": "A"}
        ] * n
    rows += [{"ts": datetime(2024, 1, 1, 3, 30), "event_type": "B"}] * 4
    ev = pd.DataFrame(rows)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    got = entrymod.queries()["ev_gap_fill"](spark, sf).toPandas()
    a = got[got.event_type == "A"].reset_index(drop=True)
    assert list(a.hour) == [f"2024-01-01 0{h}:00" for h in range(5)]
    assert [None if pd.isna(v) else int(v) for v in a.observed] == [
        2, 3, None, None, 9,
    ]
    assert [int(v) for v in a.locf] == [2, 3, 3, 3, 9]
    # idx2: (1000*3*2 + 1000*9*1) // 3 ; idx3: (1000*3*1 + 1000*9*2) // 3
    assert [int(v) for v in a.lerp_milli] == [2000, 3000, 5000, 7000, 9000]
    b = got[got.event_type == "B"].reset_index(drop=True)
    assert [int(v) for v in b.locf] == [4] * 5
    assert [int(v) for v in b.lerp_milli] == [4000] * 5


def test_autocorr_matches_numpy(spark, tmp_path):
    """Known 8-hour count series replayed against a numpy Pearson over
    the (x_t, x_{t+k}) pair sets; lags with no pairs are absent."""
    import numpy as np

    counts = [5, 1, 4, 2, 8, 3, 7, 2]
    rows = []
    for h, n in enumerate(counts):
        rows += [{"ts": datetime(2024, 1, 1, h, 15)}] * n
    ev = pd.DataFrame(rows)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    got = entrymod.queries()["ev_autocorr"](spark, sf).toPandas()
    x = np.array(counts, dtype=float)
    exp = {}
    for k in [1, 2, 3, 6, 12, 24]:
        if k >= len(counts):
            continue
        a, b = x[:-k], x[k:]
        n = float(len(a))
        denx = n * np.sum(a * a) - np.sum(a) ** 2
        deny = n * np.sum(b * b) - np.sum(b) ** 2
        if denx <= 0 or deny <= 0:
            exp[k] = None
        else:
            r = (
                (n * np.sum(a * b) - np.sum(a) * np.sum(b))
                / np.sqrt(denx)
                / np.sqrt(deny)
            )
            exp[k] = _round_away(r * 1e6)
    got_map = {
        int(r.k): (None if pd.isna(r.r_micro) else int(r.r_micro))
        for r in got.itertuples(index=False)
    }
    assert got_map == exp


def test_winsorized_mean_matches_python(spark, tmp_path):
    """Values 1.00..20.00: exact disc cutoffs are ranks 2 and 18 ->
    [200, 1800] cents; the clamped mean is hand-computable."""
    vals = [float(i) for i in range(1, 21)]
    pdf = pd.DataFrame(
        {
            "event_id": range(1, 21),
            "event_type": ["A"] * 20,
            "value": vals,
        }
    )
    sf = _write(tmp_path, "events", pdf)
    got = entrymod.queries()["a_winsorized_mean"](spark, sf).toPandas()
    row = got.iloc[0]
    assert (int(row.n), int(row.lo_cents), int(row.hi_cents)) == (
        20, 200, 1800,
    )
    # clamp: 100->200; 1900,2000->1800; middle unchanged
    assert int(row.win_mean_cents) == (200 + sum(range(200, 1900, 100)) + 2 * 1800) // 20
    assert int(row.raw_mean_cents) == sum(range(100, 2100, 100)) // 20


def test_assortativity_star_is_minus_one(spark, tmp_path):
    """K_{1,3} star (hub 'spark', leaves window/filter/stream): the
    directed edge list is 6 rows with endpoint degrees (3,1)x3 and
    (1,3)x3 -> Pearson exactly -1."""
    texts = ["spark window", "spark filter", "spark stream"]
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["s1"] * 3,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["g_degree_assortativity"](spark, sf).toPandas()
    row = got.iloc[0]
    assert int(row.n_edges) == 6
    assert int(row.r_micro) == -1000000


def test_bcubed_hand_clustering(spark, tmp_path):
    """Hand-checkable B³: corpus with mentions {spark x2, stream x1,
    hash join x1, sort merge x1}. Gold (alias-canonical): {spark,
    spark}, {stream}, {join=hash join, join=sort merge}. Pred
    (first char): 's'={spark, spark, stream, sort merge}, 'h'={hash
    join}. Items N=5 (distinct (conv,turn,surface) slots).

    Cells: (s,spark)=2 (s,stream)=1 (s,join)=1 (h,join)=1.
    P = (4/4 + 1/4 + 1/4 + 1/1)/5 = (1 + .25 + .25 + 1)/5 = 0.5
    R = (4/2 + 1/1 + 1/2 + 1/2)/5 = (2 + 1 + .5 + .5)/5 = 0.8
    F1 = 2*.5*.8/1.3 = 0.615384...
    """
    texts = [
        "spark here",       # turn 0: spark
        "spark again",      # turn 1: spark (distinct slot: new turn)
        "stream of data",   # turn 2: stream
        "hash join now",    # turn 3: hash join (NOT join/hash singles)
        "sort merge done",  # turn 4: sort merge
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(5)),
            "text": texts,
            "lang": ["en"] * 5,
            "source": ["c1"] * 5,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["kg_bcubed_eval"](spark, sf).toPandas()
    row = got.iloc[0]
    assert int(row.n_items) == 5
    assert int(row.n_pred_clusters) == 2
    assert int(row.n_gold_clusters) == 3
    # floor-division micro terms: P = (1000000 + 250000*2 + 1000000)//?
    # per-cell: (4*1e6//4=1e6) + (1*1e6//4=250000)*2 + (1*1e6//1=1e6)
    # = 2500000; // N=5 -> 500000
    assert int(row.p_micro) == 500000
    # R: (4*1e6//2=2e6) + (1e6//1=1e6) + (1e6//2=5e5)*2 = 4000000
    # // 5 -> 800000
    assert int(row.r_micro) == 800000
    # F1 = 2*500000*800000 // 1300000 = 615384
    assert int(row.f1_micro) == 615384


def test_blocking_quality_hand_blocks(spark, tmp_path):
    """Three near-identical docs (gold pairs under Jaccard>=0.5) where
    one pair is split across blocks by a DIFFERENT FIRST TOKEN: PC
    counts exactly the within-block gold pairs; candidates = algebraic
    sum n(n-1)/2 over block sizes."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        base + " one",          # doc 0: block ('alpha', 9//8=1)
        base + " two",          # doc 1: same block -> covered pair
        "omega " + base,        # doc 2: block ('omega', 1) -> missed
        "solo words here",      # doc 3: block ('solo', 0), no gold
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(4)),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["c1"] * 4,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["kg_blocking_quality"](spark, sf).toPandas()
    row = got.iloc[0]
    assert int(row.n_docs) == 4
    # gold: (0,1) J=7/11>0.5; (0,2),(1,2): shingles shift — verify the
    # operator's own gold count instead of hand-deriving all three,
    # but (0,1) is certainly gold and (x,3) certainly not:
    assert int(row.n_gold_pairs) >= 1
    # blocks: {alpha#1: docs 0,1}, {omega#1: doc 2}, {solo#0: doc 3}
    # candidates = C(2,2->1) + 0 + 0 = 1
    assert int(row.n_cand_pairs) == 1
    assert int(row.tp) == 1  # only (0,1) shares a block
    # RR = 1 - 1/C(4,2)=1-1/6 -> 833334 micro (floor: 1e6 - 1e6//6)
    assert int(row.rr_micro) == 1000000 - 1000000 // 6


def test_extractor_pr_prefix_firing_and_multiword_miss(spark, tmp_path):
    """The degraded extractor fires inside 'filtering' (spurious slot:
    precision < 1 for 'filter') and can never emit 'hash join'
    (n_pred = 0, p_permille NULL, recall 0 denominator n_gold)."""
    texts = [
        "filtering the stream",   # pred: filter (spurious), stream (tp)
        "filter it now",          # both find filter -> tp
        "hash join wins",         # gold-only multiword
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(3)),
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["c1"] * 3,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = (
        entrymod.queries()["kg_extractor_pr"](spark, sf)
        .toPandas()
        .set_index("surface_norm")
    )
    f = got.loc["filter"]
    assert (int(f.n_gold), int(f.n_pred), int(f.n_tp)) == (1, 2, 1)
    assert int(f.p_permille) == 500 and int(f.r_permille) == 1000
    hj = got.loc["hash join"]
    assert (int(hj.n_gold), int(hj.n_pred), int(hj.n_tp)) == (1, 0, 0)
    assert pd.isna(hj.p_permille) and int(hj.r_permille) == 0
    s = got.loc["stream"]
    assert int(s.p_permille) == 1000 and int(s.r_permille) == 1000


def test_pred_functionality_hand_graph(spark, tmp_path):
    """One conv, three turns: IN_CONV is functional (1000) with ifun
    1000//3=333; SAME_AS from {hash join, sort merge} -> join is
    functional with ifun 500; MENTIONS counts distinct turn-entity
    pairs."""
    texts = [
        "hash join and sort merge",  # turn 0: 2 entities
        "hash join again",           # turn 1: 1 entity
        "spark here",                # turn 2: 1 entity
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(3)),
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["c1"] * 3,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = (
        entrymod.queries()["kg_pred_functionality"](spark, sf)
        .toPandas()
        .set_index("edge_type")
    )
    ic = got.loc["IN_CONV"]
    assert (int(ic.n_pairs), int(ic.n_subj), int(ic.n_obj)) == (3, 3, 1)
    assert int(ic.fun_permille) == 1000 and int(ic.ifun_permille) == 333
    sa = got.loc["SAME_AS"]
    assert (int(sa.n_pairs), int(sa.n_subj), int(sa.n_obj)) == (2, 2, 1)
    assert int(sa.fun_permille) == 1000 and int(sa.ifun_permille) == 500
    me = got.loc["MENTIONS"]
    # turn0 -> {hash join, sort merge}, turn1 -> {hash join}, turn2 -> {spark}
    assert (int(me.n_pairs), int(me.n_subj), int(me.n_obj)) == (4, 3, 3)
    assert int(me.fun_permille) == 750 and int(me.ifun_permille) == 750


def test_hard_negatives_mask_inside_topk(spark):
    """The nearest SAME-label vector must never appear, even when it
    outranks every cross-label candidate — the failure a kNN+filter
    composition would hit."""
    from hikma_engine_spark.operators.similarity_search import (
        hard_negative_join,
    )

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.999, 0.01]),   # same-label near-twin of 1
        (3, 1, [0.7, 0.7]),      # true hard negative for 1 and 2
        (4, 1, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = (
        hard_negative_join(df, k=1)
        .toPandas()
        .set_index("a")
    )
    assert int(got.loc[1].b) == 3 and int(got.loc[1].b_label) == 1
    assert int(got.loc[2].b) == 3
    # labels of the pair always differ
    assert (got.a_label != got.b_label).all()


def test_hard_negatives_blocked_equals_broadcast(spark):
    """Forcing the block-pair-grid path yields the identical result
    set as the broadcast GEMM on the same input."""
    import numpy as np

    from hikma_engine_spark.operators.similarity_search import (
        hard_negative_join,
    )

    rng = np.random.RandomState(7)
    rows = [
        (i, int(i % 3), rng.randn(8).tolist()) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    wide = hard_negative_join(df, k=2).toPandas()
    blocked = hard_negative_join(
        df, k=2, broadcast_limit=0, block_size=16
    ).toPandas()
    key = ["a", "rank"]
    assert (
        wide.sort_values(key).reset_index(drop=True)[
            ["a", "b", "cosine", "rank"]
        ].equals(
            blocked.sort_values(key).reset_index(drop=True)[
                ["a", "b", "cosine", "rank"]
            ]
        )
    )


def test_cluster_coherence_hand_values(spark, tmp_path):
    """Identical vectors -> 1e6; orthogonal pair (after the boost is
    cancelled by using zero-label rows whose dim-0 boost is shared)
    -> computed via the same centroid identity; singleton -> NULL."""
    # label 0: two IDENTICAL vectors (boost lands identically): coherence = 1.0
    # label 1: single vector: NULL
    rows = [
        (1, 0, [0.3, 0.4, 0.0, 0.0]),
        (2, 0, [0.3, 0.4, 0.0, 0.0]),
        (3, 1, [0.0, 0.0, 1.0, 0.0]),
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    pdf["label"] = pdf["label"].astype("int32")
    sf = _write(tmp_path, "embeddings", pdf)
    got = (
        entrymod.queries()["e_cluster_coherence"](spark, sf)
        .toPandas()
        .set_index("label")
    )
    assert int(got.loc[0].n_vecs) == 2
    assert int(got.loc[0].coherence_micro) == 1000000
    assert int(got.loc[1].n_vecs) == 1
    assert pd.isna(got.loc[1].coherence_micro)


def test_struct_equiv_hand_jaccard(spark, tmp_path):
    """spark∈{t0,t1,t2}, stream∈{t1,t2,t3}: common=2, union=4 -> 500;
    disjoint pair (spark, batch@t4) -> no row (common=0 never emitted)."""
    texts = [
        "spark a",          # t0
        "spark stream",     # t1
        "spark stream",     # t2
        "stream x",         # t3
        "batch y",          # t4
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(5)),
            "text": texts,
            "lang": ["en"] * 5,
            "source": ["c1"] * 5,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["g_struct_equiv"](spark, sf).toPandas()
    row = got.set_index(["e1", "e2"]).loc[("spark", "stream")]
    assert (int(row.n_1), int(row.n_2), int(row.n_common)) == (3, 3, 2)
    assert int(row.jaccard_permille) == 500
    assert ("batch", "spark") not in got.set_index(["e1", "e2"]).index


def test_conv_signature_dups_alias_fold(spark, tmp_path):
    """Convs c1={hash join} and c2={sort merge} FOLD to the same
    canonical signature {join} -> one dup group; c3={spark} is a
    singleton fingerprint -> filtered out."""
    rows = [
        (0, "hash join here", "c1"),
        (1, "sort merge there", "c2"),
        (2, "spark solo", "c3"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["kg_conv_signature_dups"](spark, sf).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row.n_convs) == 2 and int(row.n_entities) == 1
    assert row.convs_csv == "c1,c2"


def test_edge_support_weak_tie_bridge(spark):
    """Two triangles joined by one bridge edge: every triangle edge
    has support 1; the bridge (c,d) closes no triangle -> support 0,
    weak_tie true."""
    from hikma_engine_spark.operators.graph import edge_support

    ed = [
        ("a", "b"), ("a", "c"), ("b", "c"),   # triangle 1
        ("d", "e"), ("d", "f"), ("e", "f"),   # triangle 2
        ("c", "d"),                           # bridge
    ]
    df = spark.createDataFrame(ed, "e1 string, e2 string")
    got = edge_support(df, "e1", "e2").toPandas().set_index(["e1", "e2"])
    assert int(got.loc[("a", "b")].support) == 1
    assert int(got.loc[("e", "f")].support) == 1
    assert int(got.loc[("c", "d")].support) == 0
    assert bool(got.loc[("c", "d")].weak_tie)
    assert len(got) == 7 and int(got.support.sum()) == 6


def test_edge_support_shared_edge_counts_both_triangles(spark):
    """An edge shared by two triangles (bowtie on (b,c)) has support 2."""
    from hikma_engine_spark.operators.graph import edge_support

    ed = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]
    df = spark.createDataFrame(ed, "e1 string, e2 string")
    got = edge_support(df, "e1", "e2").toPandas().set_index(["e1", "e2"])
    assert int(got.loc[("b", "c")].support) == 2
    assert int(got.loc[("a", "b")].support) == 1
    assert not bool(got.loc[("b", "c")].weak_tie)


def test_dedup_survivors_longest_wins(spark, tmp_path):
    """Component {0,1,2} (shared shingles): doc 1 is longest -> the
    sole keeper; unique doc 3 never appears."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,                 # 8 shingles
        base + " extra",      # 9 shingles, J(0,1)=8/9, longest member
        base + " x",          # 9 shingles, J(0,2)=8/9, J(1,2)=8/10=0.8
        "completely different text with no overlap at all here",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(4)),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["c1"] * 4,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["d_dedup_survivors"](spark, sf).toPandas()
    assert set(got.doc_id) == {0, 1, 2}
    assert (got.representative_id == 1).all()
    assert got.set_index("doc_id").keep.to_dict() == {
        0: False, 1: True, 2: False
    }


def test_linker_ablation_no_linking_perfect_precision(spark, tmp_path):
    """no_linking never over-merges -> B³ precision exactly 1e6; its
    recall pays only for unfolded aliases. first_char_blocking on
    {spark, stream} over-merges -> precision < 1e6."""
    texts = [
        "hash join a",      # alias -> join
        "sort merge b",     # alias -> join (same gold, different pred)
        "spark c",
        "stream d",         # same first char as spark -> over-merge
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(4)),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["c1"] * 4,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = (
        entrymod.queries()["kg_linker_ablation"](spark, sf)
        .toPandas()
        .set_index("config")
    )
    nl = got.loc["no_linking"]
    assert int(nl.n_items) == 4
    # P: each pred cluster is a single surface -> every item 1/1
    assert int(nl.p_micro) == 1000000
    # R: gold 'join' has 2 items, each covering 1/2 -> (1e6//2)*2 + 2*1e6
    # = 3000000 // 4 = 750000
    assert int(nl.r_micro) == 750000
    fc = got.loc["first_char_blocking"]
    # pred 's' = {spark, stream, sort merge}: over-merged
    assert int(fc.p_micro) < 1000000


def test_link_threshold_curve_monotone(spark, tmp_path):
    """Match rate is nondecreasing in the threshold, and thr=3
    dominates thr=0 on matches; all permilles are in [0, 1000]."""
    sf = "/root/testdata/sf0.001"
    got = entrymod.queries()["kg_link_threshold_curve"](spark, sf).toPandas()
    assert list(got.thr) == [0, 1, 2, 3]
    assert got.n_matched.is_monotonic_increasing
    assert (got.n_correct <= got.n_matched).all()
    ok = got.match_rate_permille.dropna()
    assert ((ok >= 0) & (ok <= 1000)).all()


def test_shard_balance_uniform_contract(spark, tmp_path):
    """64 docs over 16 md5 shards: totals add up, imbalance >= 1000
    by construction (max >= ideal), gini in [0, 1e6)."""
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(64)),
            "text": ["t"] * 64,
            "lang": ["en"] * 64,
            "source": ["c1"] * 64,
            "n_chars": [1] * 64,
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["d_shard_balance"](spark, sf).toPandas().iloc[0]
    assert int(got.n_rows) == 64
    assert int(got.min_rows) >= 1 and int(got.max_rows) <= 64
    assert int(got.imbalance_permille) >= 1000
    assert 0 <= int(got.gini_micro) < 1000000


def test_entity_churn_new_and_retired(spark, tmp_path):
    """One conv, 4 turns (midpoint: early = turns 0-1): 'spark' only
    early -> retired; 'batch' only late -> new; 'stream' both ->
    stable with exact shares."""
    texts = [
        "spark stream",   # t0 early
        "stream here",    # t1 early
        "batch stream",   # t2 late
        "batch end",      # t3 late
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(4)),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["c1"] * 4,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = (
        entrymod.queries()["kg_entity_churn"](spark, sf)
        .toPandas()
        .set_index("surface_norm")
    )
    assert got.loc["spark"].status == "retired"
    assert got.loc["batch"].status == "new"
    st = got.loc["stream"]
    assert st.status == "stable"
    # early slots: spark, stream, stream = 3; late: batch, batch, stream = 3
    assert int(st.share_early_permille) == 2000 // 3  # 2 of 3 -> 666
    assert int(st.share_late_permille) == 1000 // 3   # 1 of 3 -> 333
    assert int(st.delta_permille) == 333 - 666


def test_canonical_stability_chain_bridge(spark, tmp_path):
    """Old clusters A={0,1} and B={2,3} are 0.8-separated; four NEW
    docs form a sliding-window chain connecting them -> both B members
    change canonical id (component 2 -> 0), nothing newly clustered:
    blast = 2/4 = 500 permille."""
    toks = [f"t{i:02d}" for i in range(27)]

    def win(i):
        return " ".join(toks[i : i + 20])

    # ids 0,1 = windows 0,1 (cluster A); ids 2,3 = windows 6,7
    # (cluster B); ids 4-7 = windows 2-5 (the new bridge chain).
    # Consecutive windows share 17/19 shingles (0.894 >= 0.8);
    # win1 vs win6 shares 13/23 (0.565 < 0.8) so A,B are separate
    # in the old half (cut = 7 DIV 2 = 3).
    texts = [win(0), win(1), win(6), win(7), win(2), win(3), win(4), win(5)]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": texts,
            "lang": ["en"] * 8,
            "source": ["c1"] * 8,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["kg_canonical_stability"](spark, sf).toPandas()
    row = got.iloc[0]
    assert int(row.n_old_touched) == 4
    assert int(row.n_changed) == 2
    assert int(row.n_newly_clustered) == 0
    assert int(row.blast_permille) == 500


def test_modularity_identity_on_hand_graph(spark):
    """Two 4-cliques joined by one bridge: LPA labels converge to the
    two cliques (bridge endpoints keep their clique majority), and
    the modularity identity holds: Σ q_num / 4m² matches the direct
    Q = Σ [e_c/m - (d_c/2m)²] computed in Python."""
    from hikma_engine_spark.operators.graph import label_propagation

    def clique(prefix, names):
        return [
            (f"{prefix}{x}", f"{prefix}{y}")
            for i, x in enumerate(names)
            for y in names[i + 1 :]
        ]

    ed = clique("a", "1234") + clique("b", "1234") + [("a1", "b1")]
    df = spark.createDataFrame(ed, "a string, b string")
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(df, rounds=4).collect()
    }
    m = len(ed)
    from collections import Counter, defaultdict

    e_c: Counter = Counter()
    for x, y in ed:
        if labels[x] == labels[y]:
            e_c[labels[x]] += 1
    d_c: Counter = Counter()
    for x, y in ed:
        d_c[labels[x]] += 1
        d_c[labels[y]] += 1
    q_direct = sum(
        e_c[c] / m - (d_c[c] / (2 * m)) ** 2 for c in d_c
    )
    q_num_sum = sum(4 * m * e_c[c] - d_c[c] ** 2 for c in d_c)
    assert abs(q_num_sum / (4 * m * m) - q_direct) < 1e-12
    # the partition is better than chance on this graph
    assert q_direct > 0.3


def test_coverage_per_conv_hand_counts(spark, tmp_path):
    """Conv c1: 2 of 3 turns carry mentions, 2 distinct entities
    (coverage 666); conv c2: no mentions at all -> zeros, not a
    dropped row."""
    rows = [
        (0, "spark and stream", "c1"),
        (1, "nothing here", "c1"),
        (2, "spark again", "c1"),
        (3, "still nothing", "c2"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", pdf)
    got = (
        entrymod.queries()["kg_coverage_per_conv"](spark, sf)
        .toPandas()
        .set_index("conv_id")
    )
    c1 = got.loc["c1"]
    assert (int(c1.n_turns), int(c1.n_turns_with_mentions)) == (3, 2)
    assert int(c1.n_entities) == 2
    assert int(c1.coverage_permille) == 666
    c2 = got.loc["c2"]
    assert int(c2.n_turns_with_mentions) == 0
    assert int(c2.coverage_permille) == 0


def test_more_like_this_rarity_beats_count(spark, tmp_path):
    """Doc 1 shares ONE rare term (df=2) with the seed; doc 2 shares
    TWO common terms (df=4 each) -> rarity ranks doc 1 first
    (500000 > 250000+250000? no — equal; make doc2's terms df=5).
    Seed terms: {rare, com1, com2}; fillers push df up."""
    texts = [
        "rare com1 com2",          # seed doc 0
        "rare only here",          # doc 1: shares 'rare' (df=2) -> 500000
        "com1 com2 words",         # doc 2: shares com1+com2 (df=5) -> 400000
        "com1 com2 filler a",      # docs 3-5 inflate df of com1/com2
        "com1 com2 filler b",
        "com1 com2 filler c",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": texts,
            "lang": ["en"] * 6,
            "source": ["c1"] * 6,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = entrymod.queries()["s_more_like_this"](spark, sf).toPandas()
    # df(rare)=2 -> 500000; df(com1)=df(com2)=5 -> 200000 each = 400000
    top = got.iloc[0]
    assert int(top.doc_id) == 1 and int(top.rarity_micro) == 500000
    second = got.iloc[1]
    assert int(second.doc_id) == 2 and int(second.rarity_micro) == 400000
    assert int(second.n_shared_terms) == 2


def test_alias_candidates_channel_attribution(spark, tmp_path):
    """'batch'/'match' differ by one letter but never co-occur ->
    surface-only; 'spark'/'stream' co-occur in every turn but lev>2
    -> structural-only; no pair carries both on this corpus."""
    texts = [
        "spark stream batch",
        "spark stream",
        "spark stream",
        "spark stream match",  # match: @-gazetteer? not in gazetteer
    ]
    # 'match' is NOT in DOC_SURFACES -> use 'query'/'queue'? queue not
    # in gazetteer either. Surface channel needs two gazetteer
    # surfaces with lev<=2: DOC_SURFACES has none... 'batch' vs
    # 'match' impossible. Use lev('query','queue')? queue absent.
    # So: assert structural-only pair exists and no surface signal
    # fires on this gazetteer (documenting the channel attribution).
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(4)),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["c1"] * 4,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = (
        entrymod.queries()["kg_alias_candidates"](spark, sf)
        .toPandas()
        .set_index(["e1", "e2"])
    )
    sp = got.loc[("spark", "stream")]
    assert bool(sp.structural_signal) and not bool(sp.surface_signal)
    assert int(sp.jaccard_permille) == 1000
    assert int(sp.lev) == -1
    assert not got.both_signals.any()


def test_dup_source_matrix_cross_vs_within(spark, tmp_path):
    """Near-identical docs across src_a/src_b -> one cross cell; a
    within-src_c dup -> one diagonal cell; shares sum to 1000-ish."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, "src_a"),
        (1, base + " x", "src_b"),          # cross-source dup
        (2, "one two three four five six seven eight nine", "src_c"),
        (3, "one two three four five six seven eight nine", "src_c"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", pdf)
    got = (
        entrymod.queries()["d_dup_source_matrix"](spark, sf)
        .toPandas()
        .set_index(["src_1", "src_2"])
    )
    cross = got.loc[("src_a", "src_b")]
    assert int(cross.n_pairs) == 1 and not bool(cross.within_source)
    diag = got.loc[("src_c", "src_c")]
    assert int(diag.n_pairs) == 1 and bool(diag.within_source)
    assert int(cross.share_permille) == 500


# ---------------------------------------------------------------------------
# k-bounded Brandes betweenness (operators.graph.k_betweenness)
# ---------------------------------------------------------------------------

def _py_k_betweenness(pairs, sources, k):
    """Independent pure-python replica of the micro-integer Brandes
    recurrence (floor per term, order-free integer sums)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    bc = defaultdict(int)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for d in range(1, k + 1):
            nxt = {}
            for u in levels[d - 1]:
                for v in adj[u]:
                    if v in dist:
                        continue
                    nxt[v] = nxt.get(v, 0) + sigma[u]
            if not nxt:
                break
            for v, sg in nxt.items():
                dist[v] = d
                sigma[v] = sg
            levels.append(sorted(nxt))
        depth = len(levels) - 1
        if depth < 2:
            continue
        delta = {v: 0 for v in levels[depth]}
        for d in range(depth - 1, 0, -1):
            nd = {}
            succ = set(levels[d + 1])
            for v in levels[d]:
                t = 0
                for w in adj[v]:
                    if w in succ:
                        t += sigma[v] * (10**6 + delta[w]) // sigma[w]
                nd[v] = t
                bc[v] += t
            delta = nd
    return {n: x for n, x in bc.items()}


def test_k_betweenness_star_hand_case(spark):
    """Star K1,3, all nodes as sources, k=2: every leaf pair's unique
    shortest path pivots on the center -> bc(center) = 6 ordered pairs
    = 6e6 micro; leaves are never interior."""
    from hikma_engine_spark.operators.graph import k_betweenness

    edges = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("c", "l3")], ["a", "b"]
    )
    srcs = spark.createDataFrame(
        [("c",), ("l1",), ("l2",), ("l3",)], ["node"]
    )
    got = {r["node"]: r["bc_micro"] for r in k_betweenness(edges, srcs, k=2).collect()}
    assert got.get("c") == 6_000_000
    assert all(v == 0 for n, v in got.items() if n != "c")


def test_k_betweenness_matches_python_replica(spark):
    """Deterministic 14-node graph with branching shortest paths (so
    sigma > 1 and the per-term floor genuinely fires), three sources,
    k=3: distributed == replica exactly, including 0-delta interiors."""
    from hikma_engine_spark.operators.graph import k_betweenness

    pairs = [
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
        ("e", "f"), ("e", "g"), ("f", "h"), ("g", "h"), ("h", "i"),
        ("b", "j"), ("j", "k"), ("k", "e"), ("c", "l"), ("l", "m"),
        ("m", "n"), ("i", "n"),
    ]
    sources = ["a", "e", "n"]
    expect = _py_k_betweenness(pairs, sources, k=3)
    edges = spark.createDataFrame(pairs, ["a", "b"])
    srcs = spark.createDataFrame([(s,) for s in sources], ["node"])
    got = {r["node"]: r["bc_micro"] for r in k_betweenness(edges, srcs, k=3).collect()}
    assert got == expect


def test_topic_segments_single_turn_conv_and_boundary(spark, tmp_path):
    """A single-turn conversation yields NO gap rows (the sequence(0,-1)
    descending-sequence trap), and a planted topic shift — two 2-turn
    topic blocks sharing zero vocabulary — is a boundary at the seam
    with cohesion 0 while intra-topic gaps are not."""
    docs = pd.DataFrame(
        {
            # source = conv; row order within source = doc_id order
            "doc_id": [0, 1, 2, 3, 4, 5],
            "source": ["solo", "multi", "multi", "multi", "multi", "multi"],
            "text": [
                "only turn here",
                # topic A: shared vocab alpha/beta
                "alpha beta gamma talk",
                "alpha beta delta talk",
                "alpha beta epsilon talk",
                # topic B: disjoint vocab
                "zulu yankee xray",
                "zulu yankee whiskey",
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_topic_segments"](spark, sf).toPandas()
    assert not (pdf.conv_id == "solo").any()
    m = pdf[pdf.conv_id == "multi"].set_index("gap")
    assert len(m) == 4
    # seam between turn 2 (epsilon) and turn 3 (zulu): blocks share only
    # 'talk' from turns {1,2} vs nothing -> cohesion 0 at gap 2
    assert m.loc[2, "cohesion"] == 0
    assert bool(m.loc[2, "is_boundary"])
    assert not bool(m.loc[0, "is_boundary"])
    assert not bool(m.loc[3, "is_boundary"])


# ---------------------------------------------------------------------------
# Luby MIS (operators.graph.luby_mis)
# ---------------------------------------------------------------------------

def _py_luby_mis(pairs, rounds):
    """Independent replica: hash-priority synchronous Luby rounds."""
    import hashlib
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    pr = {
        v: (int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16), v)
        for v in adj
    }
    undecided = set(adj)
    status = {}
    for r in range(1, rounds + 1):
        if not undecided:
            break
        newm = {
            v
            for v in undecided
            if all(u not in undecided or pr[v] < pr[u] for u in adj[v])
        }
        excl = {
            u for v in newm for u in adj[v] if u in undecided
        } - newm
        for v in newm:
            status[v] = ("mis", r)
        for v in excl:
            status[v] = ("excluded", r)
        undecided -= newm
        undecided -= excl
    for v in undecided:
        status[v] = ("undecided", rounds)
    return status


def test_luby_mis_matches_replica_and_is_maximal_independent(spark):
    """Chain + clique + star mix: distributed == replica exactly per
    (node, status, round); the MIS is independent and maximal."""
    from hikma_engine_spark.operators.graph import luby_mis

    pairs = (
        [(f"n{i}", f"n{i+1}") for i in range(12)]        # 13-chain
        + [("c1", "c2"), ("c1", "c3"), ("c2", "c3")]      # triangle
        + [("h", f"s{i}") for i in range(5)]              # star
        + [("n5", "c1"), ("s0", "n0")]                    # bridges
    )
    expect = _py_luby_mis(pairs, rounds=6)
    edges = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        r["node"]: (r["status"], r["round"])
        for r in luby_mis(edges, rounds=6).collect()
    }
    assert got == expect
    mis = {n for n, (s, _) in got.items() if s == "mis"}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert all(not (adj[v] & mis) for v in mis)            # independent
    assert all(adj[v] & mis for v in adj if v not in mis)  # maximal


# ---------------------------------------------------------------------------
# closing wave: definite-NP anaphora / dictionary encode / RLE runs
# ---------------------------------------------------------------------------

def test_definite_anaphora_resolves_to_latest_prior_mention(spark, tmp_path):
    """'the <entity>' links to the MOST RECENT prior turn mentioning
    that entity; first references drop; multi-word surfaces win over
    any shorter alternation ('the table scan' is one entity)."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5, 6],
            "source": ["c", "c", "c", "c", "d", "m", "m"],
            "text": [
                "spark is fast",                 # c t0: mention spark
                "we tune the spark here",        # c t1: definite -> t0
                "nothing here",                  # c t2
                "the spark and the window",      # c t3: spark -> t1; window unresolved
                "the window arrives first",      # d t0: unresolved
                "we ran a table scan yesterday",  # m t0
                "the table scan was slow",       # m t1: definite -> t0
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_definite_anaphora"](spark, sf).toPandas()
    got = {
        (r.conv_id, r.turn_idx, r.entity): (r.antecedent_turn, r.gap)
        for r in pdf.itertuples()
    }
    assert got == {
        ("c", 1, "spark"): (0, 1),
        ("c", 3, "spark"): (1, 2),
        ("m", 1, "table scan"): (0, 1),
    }


def test_dict_encode_ledger_exact(spark, tmp_path):
    """Codes are dense_rank-1 in conv_id order; every ledger column is
    exact BIGINT arithmetic (negative saving at toy scale exercises the
    trunc-toward-zero DIV both engines share)."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "source": ["beta", "beta", "alpha", "gamma", "gamma", "gamma"],
            "text": ["x"] * 6,
        }
    )
    sf = _write(tmp_path, "documents", docs)
    row = entrymod.queries()["l_dict_encode"](spark, sf).toPandas().iloc[0]
    # alpha=0, beta=1, gamma=2
    assert row.n_rows == 6 and row.n_distinct == 3
    assert row.min_code == 0 and row.max_code == 2
    assert row.dict_code_sum == 3
    assert row.fact_code_sum == 1 * 2 + 0 * 1 + 2 * 3
    assert row.raw_bytes == 4 * 2 + 5 + 5 * 3
    assert row.encoded_bytes == 6 * 4 + ((5 + 4) + (4 + 4) + (5 + 4))
    assert row.saving_bp == (28 - 50) * 10000 // 28 + 1  # trunc, not floor
    assert row.saving_bp == -7857


def test_rle_runs_gaps_islands_and_same_ts_ties(spark, tmp_path):
    """Same-ts rows order by event_id (stable runs); runs never span
    users; avg_run_micro is exact integer micro."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "A"),
        (2, t0, 1, "A"),                       # same ts -> one run of 2
        (3, t0 + timedelta(hours=1), 1, "B"),
        (4, t0 + timedelta(hours=2), 1, "A"),  # A again: new run
        (5, t0, 2, "B"),
        (6, t0 + timedelta(hours=1), 2, "B"),
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    events["value"] = 0.0
    events["props"] = "{}"
    sf = _write(tmp_path, "events", events)
    pdf = entrymod.queries()["ev_rle_runs"](spark, sf).toPandas()
    got = {
        r.event_type: (r.n_rows, r.n_runs, r.max_run, r.avg_run_micro)
        for r in pdf.itertuples()
    }
    assert got == {
        "A": (3, 2, 2, 1500000),
        "B": (3, 2, 2, 1500000),
    }


# ---------------------------------------------------------------------------
# closing wave: attribute edges / temporal edge episodes / mention context
# ---------------------------------------------------------------------------

def test_attribute_edges_share_and_rank(spark, tmp_path):
    """Qualifier adjectives bind the gazetteer entity (multi-word
    surfaces intact), share_permille is exact integer permille of the
    per-entity total, and qrank tie-breaks (n_mentions DESC, quality
    ASC)."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["c", "c", "d", "d"],
            "text": [
                "fast spark is a fast spark",        # 2x (fast, spark)
                "slow spark here",                   # 1x (slow, spark)
                "fast spark again",                  # 1x (fast, spark)
                "big sort merge and slow window",    # multi-word entity
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_attribute_edges"](spark, sf).toPandas()
    got = {
        (r.entity, r.quality): (
            r.n_mentions, r.n_convs, r.share_permille, r.qrank
        )
        for r in pdf.itertuples()
    }
    assert got == {
        ("spark", "fast"): (3, 2, 750, 1),
        ("spark", "slow"): (1, 1, 250, 2),
        ("sort merge", "big"): (1, 1, 1000, 1),
        ("window", "slow"): (1, 1, 1000, 1),
    }


def test_temporal_edges_episode_split_at_gap(spark, tmp_path):
    """A co-mention pair silent for more than _EPISODE_GAP global turns
    starts a new validity episode; adjacent supports merge; density is
    exact integer permille over the clock span."""
    gap = entrymod._EPISODE_GAP
    texts = ["spark and window"]                  # rank 1: support
    texts += ["nothing here"] * gap               # ranks 2..gap+1
    texts += ["spark window", "window spark"]     # ranks gap+2, gap+3
    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "source": ["c"] * len(texts),
            "text": texts,
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_temporal_edges"](spark, sf).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    # gap between rank 1 and rank gap+2 is gap+1 > gap -> episode split
    assert (r.u, r.v) == ("spark", "window")
    assert r.n_episodes == 2
    assert r.n_turns == 3
    assert r.max_episode_turns == 2
    assert (r.first_rank, r.last_rank) == (1, gap + 3)
    assert r.density_permille == 3 * 1000 // (gap + 3)


def test_mention_context_ledger_edges(spark, tmp_path):
    """Context windows clamp at conversation edges (lag/lead -> 0), a
    turn with many mentions yields ONE window, and avg_ctx_micro is
    exact BIGINT micro arithmetic."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "source": ["c", "c", "c", "d", "m"],
            "text": [
                "abcd",                  # len 4, no mention
                "spark!",                # len 6, mention -> ctx 4+6+2
                "xy",                    # len 2, no mention
                "spark",                 # len 5, single-turn conv
                "spark spark window",    # len 18, 3 mentions -> 1 window
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_mention_context"](spark, sf).toPandas()
    got = {
        r.conv_id: (
            r.n_windows, r.total_ctx_chars, r.max_ctx_chars, r.avg_ctx_micro
        )
        for r in pdf.itertuples()
    }
    assert got == {
        "c": (1, 12, 12, 12000000),
        "d": (1, 5, 5, 5000000),
        "m": (1, 18, 18, 18000000),
    }


def test_wl_refinement_path_and_star_classes(spark):
    """P5 path: endpoints {a,e} / inner {b,d} / center {c} separate by
    round 2 and stay stable; codes are dense 1..k."""
    from hikma_engine_spark.operators.graph import wl_refinement

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["a", "b"]
    )
    pdf = wl_refinement(edges, rounds=3).toPandas().set_index("node")
    # c0 = degree classes: {a,e} deg1, {b,c,d} deg2
    assert pdf.loc["a", "c0"] == pdf.loc["e", "c0"]
    assert pdf.loc["b", "c0"] == pdf.loc["c", "c0"] == pdf.loc["d", "c0"]
    # round 1 splits c (two deg-2 neighbors) from b/d (one deg-1 one deg-2)
    assert pdf.loc["b", "c1"] == pdf.loc["d", "c1"]
    assert pdf.loc["c", "c1"] != pdf.loc["b", "c1"]
    assert pdf.loc["a", "c1"] == pdf.loc["e", "c1"]
    # round 2 = round 1 partition (stable), still 3 classes, dense codes
    for col in ("c1", "c2", "c3"):
        assert sorted(pdf[col].unique()) == [1, 2, 3]
    assert (
        pdf.groupby("c2").groups.keys() == pdf.groupby("c3").groups.keys()
    )


def test_wl_refinement_cannot_split_c6_from_two_triangles(spark):
    """The canonical 1-WL limitation, asserted as a contract: C6 and
    2xC3 are WL-indistinguishable (every node degree 2, every
    neighborhood tree identical) — all 12 nodes share one class at
    every round."""
    from hikma_engine_spark.operators.graph import wl_refinement

    c6 = [(f"x{i}", f"x{(i + 1) % 6}") for i in range(6)]
    tri = [("p0", "p1"), ("p1", "p2"), ("p2", "p0"),
           ("q0", "q1"), ("q1", "q2"), ("q2", "q0")]
    edges = spark.createDataFrame(c6 + tri, ["a", "b"])
    pdf = wl_refinement(edges, rounds=3).toPandas()
    assert len(pdf) == 12
    for col in ("c0", "c1", "c2", "c3"):
        assert pdf[col].nunique() == 1


def test_spearman_midranks_exact(spark, tmp_path):
    """Tied quantities take the exact average rank (doubled-integer
    midranks): q=[1,1,2] vs a strictly increasing p gives
    rho = 18/sqrt(18*24) = 0.866025...; a perfectly monotone pair
    gives exactly 1e6; the n(n+1) rank-sum invariant holds."""
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2],
            "l_linenumber": [1, 2, 1],
            "l_quantity": [1.0, 1.0, 2.0],
            "l_extendedprice": [10.0, 20.0, 30.0],
            "l_discount": [0.0, 0.01, 0.02],
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    row = entrymod.queries()["a_spearman"](spark, sf).toPandas().iloc[0]
    assert row.n == 3
    assert row.rho_qp_micro == 866025
    assert row.rho_qd_micro == 866025
    assert row.rho_pd_micro == 1000000
    assert bool(row.ranks_ok)


def _py_jp_coloring(pairs, rounds):
    """Independent replica: hash-priority synchronous Jones-Plassmann
    rounds with minimum-excludant color assignment."""
    import hashlib
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    pr = {
        v: (int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16), v)
        for v in adj
    }
    color, rnd = {}, {}
    uncolored = set(adj)
    for r in range(1, rounds + 1):
        front = {
            v
            for v in uncolored
            if all(u not in uncolored or pr[v] < pr[u] for u in adj[v])
        }
        for v in front:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v], rnd[v] = c, r
        uncolored -= front
    return {
        v: (color.get(v), rnd.get(v), "colored" if v in color else "uncolored")
        for v in adj
    }


def test_jp_coloring_matches_replica_and_is_proper(spark):
    """Chain + clique + star mix: distributed == replica exactly per
    (node, color, round); the coloring is proper and within Δ+1."""
    from hikma_engine_spark.operators.graph import jp_coloring

    pairs = (
        [(f"n{i}", f"n{i+1}") for i in range(12)]        # 13-chain
        + [("c1", "c2"), ("c1", "c3"), ("c2", "c3")]      # triangle
        + [("h", f"s{i}") for i in range(5)]              # star
        + [("n5", "c1"), ("s0", "n0")]                    # bridges
    )
    expect = _py_jp_coloring(pairs, rounds=10)
    edges = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        r["node"]: (r["color"], r["round"], r["status"])
        for r in jp_coloring(edges, rounds=10).collect()
    }
    assert got == expect
    col = {n: c for n, (c, _, _) in got.items()}
    assert all(c is not None for c in col.values())
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert all(col[a] != col[b] for a, b in pairs)                  # proper
    max_deg = max(len(v) for v in adj.values())
    assert len(set(col.values())) <= max_deg + 1                    # greedy


# ---------------------------------------------------------------------------
# capstone wave: triple fusion / negative sampling / bursts / k-anonymity
# ---------------------------------------------------------------------------

def test_triple_fusion_reliability_weighted_confidence(spark, tmp_path):
    """Source reliability is the exact permille of its assertions that
    are corroborated (>=2 sources); fused confidence SUMS the asserting
    sources' permilles — a corroborated edge from reliable sources
    outranks a singleton even before counting votes."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["c1", "c2", "c2", "c3"],
            "text": [
                "spark window",   # c1 t0: (spark, window)
                "spark window",   # c2 t0: (spark, window)
                "spark batch",    # c2 t1: (batch, spark)
                "batch query",    # c3 t0: (batch, query)
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_triple_fusion"](spark, sf).toPandas()
    got = {
        (r.u, r.v): (r.n_sources, r.corroborated, r.fused_conf_permille)
        for r in pdf.itertuples()
    }
    # c1 rel: 1/1 corroborated -> 1000; c2: 1/2 -> 500; c3: 0/1 -> 0
    assert got == {
        ("spark", "window"): (2, True, 1500),
        ("batch", "spark"): (1, False, 500),
        ("batch", "query"): (1, False, 0),
    }


def test_negative_samples_deterministic_and_filtered(spark, tmp_path):
    """Corruption index replays md5-48bit mod |vocab| exactly; a
    corruption landing on the head entity or the true tail is flagged,
    and re-running mints the identical sample set (no rand())."""
    import hashlib

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "source": ["c1", "c1", "c2"],
            "text": ["spark window", "spark batch", "window batch"],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_negative_samples"](spark, sf).toPandas()
    vocab = sorted({"spark", "window", "batch"})
    pos = {("spark", "window"), ("batch", "spark"), ("batch", "window")}
    expect = {}
    for u, v in pos:
        rk = int(hashlib.md5(f"{u}|{v}".encode()).hexdigest()[:12], 16) % 3
        v_neg = vocab[rk]
        if v_neg in (u, v):
            status = "self_loop"
        elif (min(u, v_neg), max(u, v_neg)) in pos:
            status = "true_edge"
        else:
            status = "ok"
        expect[(u, v)] = (v_neg, status)
    got = {(r.u, r.v_pos): (r.v_neg, r.status) for r in pdf.itertuples()}
    assert got == expect
    pdf2 = entrymod.queries()["kg_negative_samples"](spark, sf).toPandas()
    assert got == {
        (r.u, r.v_pos): (r.v_neg, r.status) for r in pdf2.itertuples()
    }


def test_entity_bursts_integer_threshold(spark, tmp_path):
    """130 turns -> 3 global buckets; a front-loaded entity bursts
    (cnt*n_buckets >= 2*total), an evenly spread one never does, and a
    singleton bursts by definition; repeated mentions in one turn count
    once (distinct mention grain)."""
    texts = ["zzz"] * 130
    for i in range(10):
        texts[i] = "spark spark"          # 10 mentions, all bucket 0
    for i in (0, 64, 128):
        texts[i] += " window"             # one per bucket
    texts[5] += " batch"                  # singleton
    docs = pd.DataFrame(
        {"doc_id": range(130), "source": ["c"] * 130, "text": texts}
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_entity_bursts"](spark, sf).toPandas()
    got = {
        r.surface_norm: (
            r.total_mentions,
            r.n_active_buckets,
            r.max_bucket_cnt,
            r.n_burst_buckets,
        )
        for r in pdf.itertuples()
    }
    assert got == {
        "spark": (10, 1, 10, 1),    # 10*3 >= 2*10
        "window": (3, 3, 1, 0),     # 1*3 < 2*3
        "batch": (1, 1, 1, 1),      # 1*3 >= 2*1
    }


def test_k_anonymity_contract_row(spark, tmp_path):
    """k is the SMALLEST class over (source, lang, n_chars//256); the
    below-k accounting counts rows (not classes) and reports the exact
    truncated permille."""
    rows = (
        [("s", "en", 10)] * 5          # class size 5: not below k=5
        + [("s", "de", 10)]            # class size 1
        + [("t", "en", 300)] * 2       # bucket 1, class size 2
    )
    docs = pd.DataFrame(rows, columns=["source", "lang", "n_chars"])
    docs["doc_id"] = range(len(docs))
    docs["text"] = "zzz"
    docs["n_chars"] = docs["n_chars"].astype("int64")
    sf = _write(tmp_path, "documents", docs)
    row = entrymod.queries()["d_k_anonymity"](spark, sf).toPandas().iloc[0]
    assert row.k_anonymity == 1
    assert row.n_classes == 3
    assert row.n_rows == 8
    assert row.n_rows_below_k == 3
    assert row.below_k_permille == 1000 * 3 // 8  # 375


def test_coref_chains_break_on_plain_mention(spark, tmp_path):
    """A definite mention extends the current chain (even across a
    mention gap); a PLAIN re-mention starts a new chain; a definite
    first reference forms its own singleton chain."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5, 6],
            "source": ["c", "c", "c", "c", "c", "c", "d"],
            "text": [
                "spark is here",      # c t0: plain -> chain A
                "the spark again",    # c t1: definite -> extends A
                "zzz",                # c t2
                "the spark onward",   # c t3: definite -> extends A
                "spark returns",      # c t4: plain -> chain B
                "the spark",          # c t5: definite -> extends B
                "the window arrives",  # d t0: definite first ref, singleton
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_coref_chains"](spark, sf).toPandas()
    got = {
        (r.conv_id, r.entity, r.chain_start): (r.chain_len, r.span, r.n_definite)
        for r in pdf.itertuples()
    }
    assert got == {
        ("c", "spark", 0): (3, 3, 2),
        ("c", "spark", 4): (2, 1, 1),
        ("d", "window", 0): (1, 0, 1),
    }


def test_negated_mentions_cue_scoping(spark, tmp_path):
    """Only cue-adjacent surfaces count as negated; the negated stream
    stays a subset of the mention stream at the turn grain; permille is
    truncated integer."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "source": ["c"] * 5,
            "text": [
                "never spark today",       # spark negated
                "spark is good",           # spark plain
                "no window",               # window negated
                "without batch and batch",  # batch negated (distinct per turn)
                "the query",               # query plain
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_negated_mentions"](spark, sf).toPandas()
    got = {
        r.surface_norm: (r.n_mention_turns, r.n_negated_turns,
                         r.negated_permille)
        for r in pdf.itertuples()
    }
    assert got == {
        "spark": (2, 1, 500),
        "window": (1, 1, 1000),
        "batch": (1, 1, 1000),
        "query": (1, 0, 0),
    }


def test_l_diversity_contract_row(spark, tmp_path):
    """l is the MINIMUM distinct-sensitive count over (event_type,
    hour); below-l accounting counts rows, permille truncates."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0 + timedelta(hours=1, minutes=5), 1, "a"),
        (2, t0 + timedelta(hours=1, minutes=9), 1, "a"),
        (3, t0 + timedelta(hours=1, minutes=30), 2, "a"),   # (a,1): l=2, 3 rows
        (4, t0 + timedelta(hours=2), 3, "a"),               # (a,2): l=1, 1 row
        (5, t0 + timedelta(hours=1), 4, "b"),
        (6, t0 + timedelta(hours=1, minutes=2), 5, "b"),
        (7, t0 + timedelta(hours=1, minutes=4), 6, "b"),    # (b,1): l=3, 3 rows
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", events)
    row = entrymod.queries()["d_l_diversity"](spark, sf).toPandas().iloc[0]
    assert row.l_diversity == 1
    assert row.n_classes == 3
    assert row.n_rows == 7
    assert row.n_rows_below_l == 4
    assert row.below_l_permille == 1000 * 4 // 7  # 571


def test_transitive_reduction_two_hop(spark, tmp_path):
    """Direction follows first-introduction order (global clock), and
    the edge closed by a 2-hop path is flagged redundant."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["c"] * 4,
            "text": [
                "spark",          # spark introduced first
                "spark window",   # window second; edge spark->window
                "window batch",   # batch third; edge window->batch
                "spark batch",    # edge spark->batch: implied by 2-hop
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_transitive_reduction"](spark, sf).toPandas()
    got = {(r.src, r.dst): r.status for r in pdf.itertuples()}
    assert got == {
        ("spark", "window"): "direct",
        ("window", "batch"): "direct",
        ("spark", "batch"): "redundant",
    }


def test_query_expansion_rarity_contrast(spark, tmp_path):
    """Expansion terms are scored by feedback-to-corpus df contrast;
    query terms and terms absent from the feedback docs drop out; ties
    break by token."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["s"] * 4,
            "text": [
                "spark query alpha beta",
                "spark alpha gamma",
                "query beta delta",
                "gamma delta epsilon",   # no query term: not feedback
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["s_query_expansion"](spark, sf).toPandas()
    got = [(r.token, r.df_fb, r.df, r.score) for r in pdf.itertuples()]
    assert got == [
        ("alpha", 2, 2, 1000000),
        ("beta", 2, 2, 1000000),
        ("delta", 1, 2, 500000),
        ("gamma", 1, 2, 500000),
    ]


def test_dp_sensitivity_clip_accounting(spark, tmp_path):
    """max_user_rows is the L-inf sensitivity; rows_clipped counts only
    the excess above the clip; permille truncates."""
    t0 = datetime(2024, 1, 1)
    rows = (
        [(i, t0, 1, "a") for i in range(12)]         # user 1: 12 rows of a
        + [(100 + i, t0, 2, "a") for i in range(3)]  # user 2: 3 rows of a
        + [(200, t0, 1, "b"), (201, t0, 1, "b")]     # user 1: 2 rows of b
    )
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["d_dp_sensitivity"](spark, sf).toPandas()
    got = {
        r.event_type: (r.max_user_rows, r.n_users, r.n_rows, r.rows_clipped,
                       r.clipped_permille)
        for r in pdf.itertuples()
    }
    assert got == {
        "a": (12, 2, 15, 2, 1000 * 2 // 15),
        "b": (2, 1, 2, 0, 0),
    }


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_spell_suggest_matches_python_replica(spark, tmp_path):
    """The full SymSpell pipeline (tokenize -> vocab/df -> md5-picked
    typos -> deletion-variant equi-join -> levenshtein<=1 verify ->
    (dist, df desc, term) rank) equals a pure-python replica."""
    import hashlib
    import re as _re

    texts = (
        ["distributed compute cluster"] * 3
        + ["partition pruning rocks"] * 2
        + ["cluster compute"]
    )
    docs = pd.DataFrame(
        {"doc_id": range(len(texts)), "source": ["s"] * len(texts),
         "text": texts}
    )
    sf = _write(tmp_path, "documents", docs)
    # replica
    df_cnt = Counter()
    for t in texts:
        df_cnt.update(set(_re.sub(r"[^a-z0-9]+", " ", t.lower()).split()))
    vocab = {t: c for t, c in df_cnt.items() if _re.fullmatch(r"[a-z]{3,}", t)}

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    def dels(s):
        return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}

    index = [(v, d, c) for v, c in vocab.items() for d in dels(v)]
    expect = {}
    for term in vocab:
        if len(term) >= 5 and h48(term) % 2 == 0:
            pos = h48(term) % len(term)
            typo = term[:pos] + term[pos + 1:]
            cands = {
                (v, c) for v, d, c in index
                if d in dels(typo) and _py_lev(typo, v) <= 1
            }
            best = min(
                cands, key=lambda vc: (_py_lev(typo, vc[0]), -vc[1], vc[0])
            )
            expect[typo] = (term, best[0], _py_lev(typo, best[0]), best[1],
                            best[0] == term)
    assert expect, "picker must select at least one typo in this corpus"
    pdf = entrymod.queries()["s_spell_suggest"](spark, sf).toPandas()
    got = {
        r.typo: (r.orig, r.suggestion, r.dist, r.df, r.recovered)
        for r in pdf.itertuples()
    }
    assert got == expect


def test_entity_trend_closed_form_slope(spark, tmp_path):
    """Empty buckets enter the slope as zeros via the closed-form
    Σx/Σx² (never materialized): front-loaded slopes negative, uniform
    slopes zero, tail-loaded slopes positive."""
    texts = ["zzz"] * 130
    for i in range(10):
        texts[i] = "spark"            # bucket 0 only -> decaying
    for i in (0, 64, 128):
        texts[i] += " window"         # uniform across the 3 buckets
    texts[128] += " batch"            # tail only -> growing
    docs = pd.DataFrame(
        {"doc_id": range(130), "source": ["c"] * 130, "text": texts}
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_entity_trend"](spark, sf).toPandas()
    got = {
        r.surface_norm: (r.total_mentions, r.first_bucket, r.last_bucket,
                         r.slope_micro)
        for r in pdf.itertuples()
    }
    # n=3 buckets: sx=3, sxx=5; den = 3*5-9 = 6
    assert got == {
        "spark": (10, 0, 0, 1000000 * (3 * 0 - 3 * 10) // 6),   # -5000000
        "window": (3, 0, 2, 0),
        "batch": (1, 2, 2, 1000000 * (3 * 2 - 3 * 1) // 6),     # 500000
    }


def _write_emb(tmp_path, vecs, labels):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    arr = pa.array(
        [np.asarray(v, dtype="float32").tolist() for v in vecs],
        type=pa.list_(pa.float32()),
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": arr,
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_matryoshka_contract_detects_prefix_misses(spark, tmp_path):
    """The recall flag MEASURES the prefix path: an adversarial corpus
    whose similarity lives entirely in the tail dims fills the prefix
    candidate list with decoys -> ann_recall_ok False, while the exact
    top-10 rows stay correct."""
    import numpy as np

    rng = []
    q = np.zeros(64); q[0] = 1.0; q[32] = 10.0
    rng.append(q)                       # vec_id 0: the query
    for i in range(120):                # decoys: prefix-aligned, tail-empty
        v = np.zeros(64); v[0] = 1.0; v[2] = 1e-4 * (i + 1)
        rng.append(v)
    for j in range(30):                 # true: prefix-orthogonal, tail-aligned
        v = np.zeros(64); v[1] = 1e-3; v[32] = 10.0 + 0.01 * j
        rng.append(v)
    sf = _write_emb(tmp_path, rng, [63] * len(rng))
    pdf = entrymod.queries()["e_matryoshka_topk"](spark, sf).toPandas()
    assert len(pdf) == 10
    assert not pdf.ann_recall_ok.any()          # prefix path missed them all
    assert set(pdf.vec_id) <= set(range(121, 151))   # rows are true tail-top


def test_matryoshka_contract_passes_when_prefix_carries_signal(spark, tmp_path):
    """Signal inside the prefix -> candidates contain the exact top-10
    and the contract passes."""
    import numpy as np

    vecs = []
    q = np.zeros(64); q[0] = 1.0
    vecs.append(q)
    for i in range(40):
        v = np.zeros(64); v[0] = 1.0 + 0.01 * i; v[1] = 0.3 * (i % 7)
        vecs.append(v)
    sf = _write_emb(tmp_path, vecs, [63] * len(vecs))
    pdf = entrymod.queries()["e_matryoshka_topk"](spark, sf).toPandas()
    assert len(pdf) == 10
    assert pdf.ann_recall_ok.all()


def test_rule_marginals_unique_vs_attributed(spark, tmp_path):
    """A doc failing two rules is attributed to the first but counts
    as a unique kill for neither; single-rule docs drive both."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "short en",                    # A: f1 only
                "word " * 60,                  # B: 300 chars, de -> f2 only
                "kurz",                        # C: short AND de -> f1+f2
                "1234567890 " * 25,            # D: digit-heavy -> f3 only
                "x" * 300,                     # E: one 300-char token -> f4
                ("ok tokens here " * 20).strip(),   # F: kept
            ],
            "lang": ["en", "de", "de", "en", "en", "en"],
            "source": ["s"] * 6,
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_rule_marginals"](spark, sf).toPandas()
    got = {
        r.rule: (r.n_attributed, r.n_failing, r.n_unique_kill)
        for r in pdf.itertuples()
    }
    assert got == {
        "r1_too_short": (2, 2, 1),
        "r2_not_target_lang": (1, 2, 1),
        "r3_digit_heavy": (1, 1, 1),
        "r4_long_words": (1, 1, 1),
    }


def test_span_corruption_matches_python_replica(spark, tmp_path):
    """Token positions, the md5 mask pick and adjacent-mask span
    merging equal a pure-python replica; an all-unmasked doc emits
    zeros."""
    import hashlib
    import re as _re

    texts = ["alpha beta gamma delta epsilon " * 8, "one two", "zzz"]
    docs = pd.DataFrame(
        {"doc_id": range(len(texts)), "source": ["s"] * len(texts),
         "text": texts}
    )
    sf = _write(tmp_path, "documents", docs)
    expect = {}
    for did, t in enumerate(texts):
        toks = [x for x in _re.sub(r"[^a-z0-9]+", " ", t.lower()).split()
                if x]
        masked = [
            p for p, tok in enumerate(toks)
            if int(hashlib.md5(f"{did}|{p}|{tok}".encode()).hexdigest()[:12],
                   16) % 100 < 15
        ]
        spans = len({p - r for r, p in enumerate(masked)})
        expect[did] = (len(toks), len(masked), spans,
                       1000 * len(masked) // len(toks))
    pdf = entrymod.queries()["d_span_corruption"](spark, sf).toPandas()
    got = {
        r.doc_id: (r.n_tokens, r.n_masked, r.n_spans, r.masked_permille)
        for r in pdf.itertuples()
    }
    assert got == expect
    assert any(v[1] > 0 for v in expect.values())  # the pick fires somewhere


def test_entity_adoption_intro_and_span(spark, tmp_path):
    """The introducing conversation is the arg-min on the global clock;
    adoption span covers first to last first-adoption rank."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["a", "a", "b", "b"],
            "text": [
                "spark",          # a t0 -> gr 1
                "window",         # a t1 -> gr 2
                "zzz",            # b t0 -> gr 3
                "spark window",   # b t1 -> gr 4
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_entity_adoption"](spark, sf).toPandas()
    got = {
        r.surface_norm: (r.intro_conv, r.intro_gr, r.n_convs,
                         r.last_adoption_gr, r.adoption_span)
        for r in pdf.itertuples()
    }
    assert got == {
        "spark": ("a", 1, 2, 4, 3),
        "window": ("a", 2, 2, 4, 2),
    }


def test_extractive_summary_rarity_centrality(spark, tmp_path):
    """Centrality sums rarity weights over WITHIN-conv shared tokens;
    ties break to the earlier turn; single-turn and no-overlap convs
    emit no row (template-path fallback)."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["c", "c", "c", "d"],
            "text": [
                "alpha beta gamma",   # c t0
                "alpha beta delta",   # c t1 (tie with t0 -> t0 wins)
                "zzz unique",         # c t2: no overlap
                "alpha",              # d: single turn, no pairs
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_extractive_summary"](spark, sf).toPandas()
    # turn_df: alpha 3 -> 333333, beta 2 -> 500000
    assert [(r.conv_id, r.turn_idx, r.centrality, r.n_turns)
            for r in pdf.itertuples()] == [("c", 0, 833333, 3)]


def test_power_mde_lehr_rule(spark, tmp_path):
    """n_required replays ceil(16 sigma^2 / (0.05 mu)^2) from the exact
    integer milli anchors; non-positive mean yields the -1 sentinel."""
    import math

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 1.0), (2, t0, 1, "a", 2.0), (3, t0, 1, "a", 3.0),
        (4, t0, 1, "b", -1.0),
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["ev_power_mde"](spark, sf).toPandas()
    got = {r.event_type: (r.n, r.sv, r.svv, r.n_required)
           for r in pdf.itertuples()}
    var = (14_000_000 - 6000**2 / 3) / 3
    exp_n = math.ceil(16.0 * var / (0.05 * 2000) ** 2)
    assert got == {"a": (3, 6000, 14_000_000, exp_n), "b": (1, -1000, 1_000_000, -1)}


def test_datasheet_mode_and_dups(spark, tmp_path):
    """Dominant language ties break lexicographically; dup_docs counts
    EXTRA copies per content hash within the source."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "source": ["s", "s", "s", "t", "u", "u"],
            "lang": ["en", "en", "de", "fr", "en", "de"],
            "text": ["same text", "same text", "other", "x", "y", "z"],
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_dataset_datasheet"](spark, sf).toPandas()
    got = {
        r.source: (r.n_docs, r.n_langs, r.dominant_lang, r.en_permille,
                   r.dup_docs, r.mean_chars)
        for r in pdf.itertuples()
    }
    assert got == {
        "s": (3, 2, "en", 666, 1, (9 + 9 + 5) // 3),
        "t": (1, 1, "fr", 0, 0, 1),
        "u": (2, 2, "de", 500, 0, 1),   # tie 1-1 -> lexicographic
    }


def test_dim_variance_integer_form(spark, tmp_path):
    """var_milli2 = (n sxx - sx^2) DIV n^2 per dimension; constant dims
    read zero, symmetric dims match by hand."""
    vecs = [
        [1.0, 0.0, 0.25, -1.0],
        [1.0, 1.0, 0.0, 0.0],
        [1.0, 2.0, 0.0, 1.0],
    ]
    sf = _write_emb(tmp_path, vecs, [0, 0, 0])
    pdf = entrymod.queries()["e_dim_variance"](spark, sf).toPandas()
    got = {r.dim: (r.n_vecs, r.var_milli2) for r in pdf.itertuples()}
    assert got == {
        0: (3, 0),
        1: (3, (3 * 5_000_000 - 3000 * 3000) // 9),     # 666666
        2: (3, (3 * 250 * 250 - 250 * 250) // 9),       # 13888
        3: (3, (3 * 2_000_000 - 0) // 9),               # 666666
    }


def test_memorization_risk_shared_shingles(spark, tmp_path):
    """8-gram exposure: a doc sharing one of its two shingles reads
    500 permille; fully-contained docs read 1000; short docs zeros."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["s"] * 4,
            "text": [
                "a b c d e f g h i",     # 2 shingles, 1 shared with doc 1
                "a b c d e f g h",       # 1 shingle, shared
                "x x x x x x x x",       # 1 unique shingle
                "one two",               # too short
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_memorization_risk"](spark, sf).toPandas()
    got = {r.doc_id: (r.n_shingles, r.n_shared, r.shared_permille)
           for r in pdf.itertuples()}
    assert got == {0: (2, 1, 500), 1: (1, 1, 1000), 2: (1, 0, 0),
                   3: (0, 0, 0)}


def test_psi_drift_smoothed_bins(spark, tmp_path):
    """PSI contributions replay the smoothed (p-q)ln(p/q) exactly;
    halves split on doc_id*2 <= max."""
    import math

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["s"] * 4,
            "text": ["x"] * 4,
            "n_chars": [100, 300, 100, 100],
        }
    )
    docs["n_chars"] = docs["n_chars"].astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_psi_drift"](spark, sf).toPandas()

    def contrib(ne, nl, te, tl, nb):
        p = (ne + 1) / (te + nb)
        q = (nl + 1) / (tl + nb)
        return round((p - q) * math.log(p / q) * 1_000_000)

    got = {r.bin: (r.n_early, r.n_late, r.contrib_micro)
           for r in pdf.itertuples()}
    assert got == {
        0: (1, 2, contrib(1, 2, 2, 2, 2)),
        1: (1, 0, contrib(1, 0, 2, 2, 2)),
    }


def test_neyman_alloc_largest_remainder(spark, tmp_path):
    """Allocation replays N_h sigma_h shares with floor +
    largest-remainder and sums exactly to the budget; a zero-variance
    stratum draws nothing."""
    import math

    rows = (
        [("s", 10), ("s", 30)]
        + [("t", 20)]
        + [("u", 10), ("u", 10), ("u", 40)]
    )
    docs = pd.DataFrame(rows, columns=["source", "n_chars"])
    docs["doc_id"] = range(len(docs))
    docs["text"] = "x"
    docs["n_chars"] = docs["n_chars"].astype("int64")
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_neyman_alloc"](spark, sf).toPandas()
    # python replica
    stats = {}
    for src in ("s", "t", "u"):
        xs = [c for s2, c in rows if s2 == src]
        n = len(xs); sx = sum(xs); sxx = sum(x * x for x in xs)
        stats[src] = n * math.sqrt((sxx - sx * sx / n) / n)
    tot = sum(stats.values())
    raw = {s2: 1000 * w / tot for s2, w in stats.items()}
    base = {s2: math.floor(r) for s2, r in raw.items()}
    left = 1000 - sum(base.values())
    order = sorted(raw, key=lambda s2: (-(raw[s2] - base[s2]), s2))
    expect = {
        s2: base[s2] + (1 if order.index(s2) < left else 0) for s2 in raw
    }
    got = {r.source: r.alloc for r in pdf.itertuples()}
    assert got == expect
    assert sum(got.values()) == 1000
    assert got["t"] == 0


def test_dedup_threshold_curve_bands(spark, tmp_path):
    """Pairs land in the band of their exact Jaccard; affected-doc
    counts are per-band distinct."""
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["s"] * 4,
            "text": [
                base,                                  # doc 0
                base.rsplit(" ", 1)[0] + " zz",        # doc 1: J 7/9 vs 0
                base,                                  # doc 2: J 1.0 vs 0
                "unrelated totally different tokens here now",
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["d_dedup_threshold_curve"](spark, sf).toPandas()
    got = [(r.band, r.n_pairs, r.n_docs) for r in pdf.itertuples()]
    assert got == [("a_0.70-0.79", 2, 3), ("c_0.90+", 1, 2)]


def test_entity_polarity_negation_flip(spark, tmp_path):
    """A negation cue immediately before the qualifier flips the vote;
    positive and negative adjectives tally signed."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "source": ["c"] * 6,
            "text": [
                "fast spark today",
                "not fast spark",
                "fast spark again",
                "slow window",
                "never slow window",
                "big query and small query",
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_entity_polarity"](spark, sf).toPandas()
    got = {
        r.entity: (r.n_scored, r.n_pos, r.n_neg, r.net_polarity,
                   r.net_permille)
        for r in pdf.itertuples()
    }
    assert got == {
        "spark": (3, 2, 1, 1, 333),
        "window": (2, 1, 1, 0, 0),
        "query": (2, 1, 1, 0, 0),
    }


def test_community_cards_k21_graph(spark, tmp_path):
    """On the K2,1 bipartite graph, 4-round deterministic LPA settles
    to {c1,c2} + {p10}; internal edges are label-internal only and the
    top node breaks degree ties lexicographically."""
    orders = pd.DataFrame(
        {"o_orderkey": [1, 2], "o_custkey": [1, 2]}
    )
    lineitem = pd.DataFrame(
        {"l_orderkey": [1, 2], "l_partkey": [10, 10]}
    )
    orders.to_parquet(str(tmp_path / "orders.parquet"))
    lineitem.to_parquet(str(tmp_path / "lineitem.parquet"))
    pdf = entrymod.queries()["kg_community_cards"](
        spark, str(tmp_path)
    ).toPandas()
    got = [
        (r.label, r.n_nodes, r.n_internal_edges, r.density_permille,
         r.top_node)
        for r in pdf.itertuples()
    ]
    assert got == [("c1", 2, 0, 0, "c1"), ("p10", 1, 0, 0, "p10")]


def test_step_latency_median_doubled(spark, tmp_path):
    """median2 is lower+upper middle lag in exact micros; steps with
    one user read twice that user's lag."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view"), (2, t0 + timedelta(seconds=10), 1, "click"),
        (3, t0, 2, "view"), (4, t0 + timedelta(seconds=20), 2, "click"),
        (5, t0, 3, "view"), (6, t0 + timedelta(seconds=30), 3, "click"),
        (7, t0 + timedelta(seconds=15), 1, "purchase"),
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["ev_step_latency_median"](spark, sf).toPandas()
    got = [(r.step, r.n_users, r.median2_micros) for r in pdf.itertuples()]
    assert got == [
        ("1_view_to_click", 3, 40_000_000),
        ("2_click_to_purchase", 1, 10_000_000),
    ]


def test_burstiness_param_hand_moments(spark, tmp_path):
    """B = (sigma-mu)/(sigma+mu) from exact second moments: regular
    gaps read negative, a single gap reads -1, zero gaps read the 0
    sentinel."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a"), (2, t0 + timedelta(seconds=10), 1, "a"),
        (3, t0 + timedelta(seconds=30), 1, "a"),       # gaps 10, 20
        (4, t0, 2, "b"), (5, t0 + timedelta(seconds=7), 2, "b"),  # one gap
        (6, t0, 3, "c"), (7, t0, 3, "c"),              # same-ts: gap 0
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["ev_burstiness_param"](spark, sf).toPandas()
    got = {r.event_type: (r.n_gaps, r.sg, r.sgg, r.b_micro)
           for r in pdf.itertuples()}
    # a: mu=15 sigma=5 -> B=-0.5 ; b: sigma=0 -> B=-1 ; c: mu=sigma=0 -> 0
    assert got == {
        "a": (2, 30, 500, -500_000),
        "b": (1, 7, 49, -1_000_000),
        "c": (1, 0, 0, 0),
    }


def test_cohort_ltv_curve(spark, tmp_path):
    """Cohorts anchor on the ISO Monday of the user's first event; LTV
    accumulates cohort value per cohort user in exact millis."""
    t0 = datetime(2024, 1, 1)         # a Monday
    rows = [
        (1, t0, 1, "view", 1.0),
        (2, t0 + timedelta(days=8), 1, "view", 2.0),    # week 1
        (3, t0 + timedelta(days=2), 2, "view", 3.0),    # same cohort wk0
        (4, t0 + timedelta(days=9), 3, "view", 5.0),    # cohort 2024-01-08
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["ev_cohort_ltv"](spark, sf).toPandas()
    got = [
        (r.cohort_week, r.age_weeks, r.cohort_users, r.period_value_milli,
         r.cum_value_milli, r.ltv_per_user_milli)
        for r in pdf.itertuples()
    ]
    assert got == [
        ("2024-01-01", 0, 2, 4000, 4000, 2000),
        ("2024-01-01", 1, 2, 2000, 6000, 3000),
        ("2024-01-08", 0, 1, 5000, 5000, 5000),
    ]


def test_merge_preview_threshold_blast_radius(spark, tmp_path):
    """Loosening 0.8 -> 0.7 absorbs the J=7/9 doc into the exact-dup
    group: group structure readout changes exactly as hand-computed."""
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["s"] * 4,
            "text": [
                base,
                base,                              # J=1 with doc 0
                base.rsplit(" ", 1)[0] + " zz",    # J=7/9 with 0 and 1
                "unrelated totally different tokens here now",
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_merge_preview"](spark, sf).toPandas()
    got = [
        (r.variant, r.n_grouped_docs, r.n_groups, r.max_group)
        for r in pdf.itertuples()
    ]
    assert got == [("t_0.70", 3, 1, 3), ("t_0.80", 2, 1, 2)]


def test_kb_completion_matches_python_replica(spark, tmp_path):
    """Holdout pick, RA scoring over the train graph, filtered
    candidate set and (score, name) ranks equal a pure-python
    replica."""
    import hashlib
    from collections import defaultdict

    texts = [
        "batch filter",     # held out (md5 % 5 == 0)
        "vector window",    # held out, isolated: no candidates -> rank 1
        "batch spark", "filter spark", "batch query",
        "filter query", "spark query",
    ]
    docs = pd.DataFrame(
        {"doc_id": range(len(texts)), "source": ["c"] * len(texts),
         "text": texts}
    )
    sf = _write(tmp_path, "documents", docs)
    edges = {tuple(sorted(t.split())) for t in texts}

    def held(u, v):
        return int(hashlib.md5(f"{u}|{v}".encode()).hexdigest()[:12],
                   16) % 5 == 0

    test = sorted(e for e in edges if held(*e))
    train = [e for e in edges if not held(*e)]
    assert test, "fixture must hold out at least one edge"
    adj = defaultdict(set)
    for u, v in train:
        adj[u].add(v); adj[v].add(u)
    adj = dict(adj)
    deg = {z: len(n) for z, n in adj.items()}

    def nbr(x):
        return adj.get(x, set())

    def score(u, w):
        return sum(1_000_000 // deg[z] for z in nbr(u) & nbr(w))

    expect = {}
    for u, v in test:
        cands = {
            w: score(u, w) for w in adj
            if w != u and w not in nbr(u) and nbr(u) & nbr(w)
        }
        s_true = cands.get(v, 0)
        n_better = sum(
            1 for w, s in cands.items()
            if w != v and (s > s_true or (s == s_true and w < v))
        )
        rk = n_better + 1
        expect[(u, v)] = (s_true, rk, 1_000_000 // rk, rk <= 3)
    pdf = entrymod.queries()["kg_kb_completion"](spark, sf).toPandas()
    got = {
        (r.u, r.v): (r.ra_score, r.rank, r.rr_micro, r.hit_at_3)
        for r in pdf.itertuples()
    }
    assert got == expect


def test_neighborhood_growth_first_buckets(spark, tmp_path):
    """A pair counts once at its FIRST co-mention bucket; cumulative
    partner counts accumulate per entity."""
    texts = ["zzz"] * 130
    texts[0] = "spark window"
    texts[64] = "batch spark"
    texts[70] = "spark window again"   # repeat pair: still bucket 0 only
    texts[128] = "batch window"
    docs = pd.DataFrame(
        {"doc_id": range(130), "source": ["c"] * 130, "text": texts}
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_neighborhood_growth"](spark, sf).toPandas()
    got = {
        (r.entity, r.bucket): (r.new_partners, r.cum_partners)
        for r in pdf.itertuples()
    }
    assert got == {
        ("spark", 0): (1, 1), ("spark", 1): (1, 2),
        ("window", 0): (1, 1), ("window", 2): (1, 2),
        ("batch", 1): (1, 1), ("batch", 2): (1, 2),
    }


def test_slo_burn_multiwindow_gate(spark, tmp_path):
    """A fast-burn hour pages only while the trailing 6h window also
    burns: the diluted later spike does NOT page."""
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(hour, n_ok, n_err):
        nonlocal eid
        for i in range(n_ok):
            rows.append((eid, t0 + timedelta(hours=hour, minutes=1,
                                             seconds=i), 1, "view"))
            eid += 1
        for i in range(n_err):
            rows.append((eid, t0 + timedelta(hours=hour, minutes=30,
                                             seconds=i), 1, "error"))
            eid += 1

    add(0, 5, 5)      # 1h: 50000>28800 OK; 6h == 1h -> page
    add(1, 99, 1)     # quiet hour
    add(2, 6, 4)      # 1h burns, but 6h diluted -> no page
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", ev)
    pdf = entrymod.queries()["ev_slo_burn"](spark, sf).toPandas()
    got = {r.hour_idx: (r.n_total, r.n_err, r.n_total_6h, r.n_err_6h, r.page)
           for r in pdf.itertuples()}
    assert got == {
        0: (10, 5, 10, 5, True),
        1: (100, 1, 110, 6, False),
        2: (10, 4, 120, 10, False),
    }


def test_dim_covariance_top_integer_form(spark, tmp_path):
    """Identical dims dominate |cov|; ties order by (i, j); the
    n·Σxy − ΣxΣy integer form matches by hand."""
    vecs = [
        [1.0, 1.0, 0.0],
        [2.0, 2.0, 0.0],
        [3.0, 3.0, 1.0],
    ]
    sf = _write_emb(tmp_path, vecs, [0, 0, 0])
    pdf = entrymod.queries()["e_dim_covariance_top"](spark, sf).toPandas()
    got = [(r.i, r.j, r.cov_milli2) for r in pdf.itertuples()]
    assert got == [
        (0, 1, (3 * 14_000_000 - 6000 * 6000) // 9),     # 666666
        (0, 2, (3 * 3_000_000 - 6000 * 1000) // 9),      # 333333
        (1, 2, (3 * 3_000_000 - 6000 * 1000) // 9),
    ]


def test_rich_club_profile(spark, tmp_path):
    """phi(k) counts edges among deg>k nodes only: the single hub-hub
    edge yields phi=1000 at k=2 and empty clubs read zeros."""
    orders = pd.DataFrame({"o_orderkey": [1, 2, 3], "o_custkey": [1, 2, 3]})
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 3],
            "l_partkey": [10, 11, 12, 10, 11, 10],
        }
    )
    orders.to_parquet(str(tmp_path / "orders.parquet"))
    lineitem.to_parquet(str(tmp_path / "lineitem.parquet"))
    pdf = entrymod.queries()["g_rich_club"](spark, str(tmp_path)).toPandas()
    got = [(r.k, r.n_rich, r.e_rich, r.phi_permille) for r in pdf.itertuples()]
    assert got == [(2, 2, 1, 1000), (4, 0, 0, 0), (8, 0, 0, 0),
                   (16, 0, 0, 0)]


def test_quality_dup_confound_odds_ratio(spark, tmp_path):
    """The 2x2 cells partition the corpus and the odds ratio replays
    a·d·10⁶ DIV (b·c) exactly."""
    good = ("ok tokens here " * 20).strip()
    docs = pd.DataFrame(
        {
            "doc_id": range(7),
            "source": ["s"] * 7,
            "lang": ["en"] * 7,
            "text": [
                good + " one", good + " two",      # kept unique ×2
                good, good,                        # kept dup pair
                "short",                           # killed unique
                "tiny", "tiny",                    # killed dup pair
            ],
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", docs)
    row = entrymod.queries()["d_quality_dup_confound"](spark, sf).toPandas().iloc[0]
    assert (row.kept_unique, row.kept_dup, row.killed_unique,
            row.killed_dup) == (2, 2, 1, 2)
    assert row.odds_ratio_micro == 1_000_000 * 2 * 2 // (2 * 1)


def test_dup_transitivity_open_and_closed_wedges(spark, tmp_path):
    """An identical triple contributes 3 closed wedges; a similarity
    chain a~b~c with J(a,c) < 0.8 contributes 1 open wedge."""
    toks = [f"w{i}" for i in range(1, 31)]
    a = " ".join(toks)
    b = " ".join(toks[:-1] + ["zz"])                    # J(a,b) = 25/31
    c = " ".join(["y1", "y2", "y3"] + toks[3:-1] + ["zz"])  # J(b,c)=25/31, J(a,c)<0.8
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "source": ["s"] * 6,
            "text": [a, b, c, "same alpha beta", "same alpha beta",
                     "same alpha beta"],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    row = entrymod.queries()["d_dup_transitivity"](spark, sf).toPandas().iloc[0]
    assert (row.n_wedges, row.n_closed, row.n_open,
            row.closure_permille) == (4, 3, 1, 750)


def test_conv_threads_shared_span(spark, tmp_path):
    """Conversations sharing a verbatim 8-gram thread together; the
    unrelated conversation stays out; spans use conv clock starts."""
    span1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    span2 = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "source": ["a", "b", "c", "d", "e"],
            "text": [
                span1, span1,
                "totally unrelated words only here now forever more zz",
                span2, span2,
            ],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    pdf = entrymod.queries()["kg_conv_threads"](spark, sf).toPandas()
    got = [(r.thread_id, r.n_convs, r.first_gr, r.last_gr, r.span_gr)
           for r in pdf.itertuples()]
    assert got == [("a", 2, 1, 2, 1), ("d", 2, 4, 5, 1)]


def test_epoch_shuffle_quality_replica(spark, tmp_path):
    """md5 epoch ranks and the exact Spearman rational match a pure
    python replica."""
    import hashlib

    n = 6
    docs = pd.DataFrame(
        {"doc_id": range(n), "source": ["s"] * n, "text": ["x"] * n}
    )
    sf = _write(tmp_path, "documents", docs)

    def ranks(seed):
        order = sorted(
            range(n),
            key=lambda d: (hashlib.md5(f"{seed}|{d}".encode()).hexdigest(),
                           d),
        )
        return {d: i + 1 for i, d in enumerate(order)}

    p1, p2 = ranks("e1"), ranks("e2")
    sum_d2 = sum((p1[d] - p2[d]) ** 2 for d in range(n))
    den = n * (n * n - 1)
    num = den - 6 * sum_d2
    rho = (1_000_000 * num) // den if num >= 0 else -(
        (1_000_000 * -num) // den
    )
    row = entrymod.queries()["d_epoch_shuffle_quality"](spark, sf).toPandas().iloc[0]
    assert (row.n_docs, row.sum_d2, row.rho_micro) == (n, sum_d2, rho)
    assert bool(row.decorrelated) == (abs(rho) < 200000)


# ---------------------------------------------------------------------------
# continuation wave (round-5 final session)
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_weights_match_reference(spark, tmp_path):
    """The md5-derived Poisson(1) weights, per-replicate integer-cent
    sums, and the order-statistic CI replay exactly against a pure-
    Python reference over a tiny orders table."""
    import hashlib

    keys = [11, 22, 33, 44, 55]
    prices = [10.01, 20.02, 33.33, 47.99, 100.00]
    orders = pd.DataFrame({"o_orderkey": keys, "o_totalprice": prices})
    orders.to_parquet(str(tmp_path / "orders.parquet"))

    ts = entrymod._POIS_T48

    def w(k, r):
        # replicates 2h and 2h+1 share one md5: hex slices [0:12]/[12:24]
        hx = hashlib.md5(f"boot|{k}|{r // 2}".encode()).hexdigest()
        u = int(hx[:12] if r % 2 == 0 else hx[12:24], 16)
        for i, t in enumerate(ts):
            if u < t:
                return i
        return 8

    cents = [round(p * 100) for p in prices]
    reps = []
    for r in range(entrymod._BOOT_R):
        ws = [w(k, r) for k in keys]
        n_eff = sum(ws)
        s = sum(wi * c for wi, c in zip(ws, cents))
        reps.append((r, n_eff, s, s // n_eff if n_eff else None))
    assert all(r[1] > 0 for r in reps), "test fixture: no empty replicate"
    ordered = sorted(reps, key=lambda t: (t[3], t[0]))
    ci_lo, ci_hi = ordered[1][3], ordered[entrymod._BOOT_R - 2][3]

    pdf = (
        entrymod.queries()["ev_poisson_bootstrap"](spark, str(tmp_path))
        .toPandas()
        .sort_values("rep")
    )
    got = list(
        zip(pdf.rep, pdf.n_eff, pdf.sum_cents, pdf.mean_cents)
    )
    assert got == reps
    assert set(pdf.ci_lo_cents) == {ci_lo}
    assert set(pdf.ci_hi_cents) == {ci_hi}


def test_t_closeness_mirror_class_zero_skewed_class_flagged(spark, tmp_path):
    """A class whose sensitive distribution mirrors the global one
    reads a small EMD; a class concentrated in the far bucket reads a
    large one and fails the t gate — both replayed with the exact
    floor-permille algebra."""
    rows = []
    # classes s1 and s2: identical spread across buckets 0 and 1
    for src in ("s1", "s2"):
        rows += [(src, "en", 50), (src, "en", 150)]
    # class s3: all mass in bucket 2 (the skewness attack shape)
    rows += [("s3", "en", 250), ("s3", "en", 299)]
    docs = pd.DataFrame(rows, columns=["source", "lang", "n_chars"])
    docs["doc_id"] = range(len(docs))
    docs["text"] = "x"
    docs.to_parquet(str(tmp_path / "documents.parquet"))

    # pure-Python replay of the floor-permille EMD
    b = [(s, l, c // 100) for s, l, c in rows]
    buckets = sorted({x[2] for x in b})
    n_g = len(b)
    gcum, acc = {}, 0
    for bk in buckets:
        acc += sum(1 for x in b if x[2] == bk)
        gcum[bk] = (1000 * acc) // n_g
    exp = {}
    for src in ("s1", "s2", "s3"):
        mine = [x for x in b if x[0] == src]
        n_c = len(mine)
        acc, gaps = 0, []
        for bk in buckets:
            acc += sum(1 for x in mine if x[2] == bk)
            gaps.append(abs((1000 * acc) // n_c - gcum[bk]))
        exp[src] = sum(gaps) // (len(buckets) - 1)

    pdf = (
        entrymod.queries()["d_t_closeness"](spark, str(tmp_path))
        .toPandas()
        .set_index("source")
    )
    for src in ("s1", "s2", "s3"):
        assert pdf.loc[src].emd_milli == exp[src]
        assert bool(pdf.loc[src].t_ok) == (exp[src] <= 300)
    # the mirrored classes are closer than the concentrated one
    assert exp["s1"] < exp["s3"] and not pdf.loc["s3"].t_ok


def test_eigencentrality_star_graph_integer_iteration(spark, tmp_path):
    """On a star (spark—batch, spark—filter, spark—query) the lazy
    (A+I) iteration converges with the center at 10⁶ and the three
    leaves equal; every iterate replays the integer algebra exactly."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "source": ["c1", "c1", "c1"],
            "text": ["spark batch", "spark filter", "spark query"],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))

    adj = {
        "spark": ["batch", "filter", "query", "spark"],
        "batch": ["spark", "batch"],
        "filter": ["spark", "filter"],
        "query": ["spark", "query"],
    }
    x = {n: 1_000_000 for n in adj}
    for _ in range(entrymod._EIGEN_ROUNDS):
        y = {n: sum(x[u] for u in nbrs) for n, nbrs in adj.items()}
        mx = max(y.values())
        x = {n: (1_000_000 * v) // mx for n, v in y.items()}

    pdf = (
        entrymod.queries()["g_eigencentrality"](spark, str(tmp_path))
        .toPandas()
        .set_index("node")
    )
    for n, v in x.items():
        assert pdf.loc[n].score_micro == v
    assert pdf.loc["spark"].score_micro == 1_000_000
    leaves = {pdf.loc[n].score_micro for n in ("batch", "filter", "query")}
    assert len(leaves) == 1 and leaves.pop() < 1_000_000


def test_ktruss_prunes_pendant_triangle_keeps_clique(spark, tmp_path):
    """A 4-clique survives the 4-truss (every edge in 2 triangles
    inside the survivor set); a triangle hanging off the clique by
    two weak edges is pruned in round one; the fixpoint converges."""
    pairs = [
        ("batch", "filter"), ("batch", "query"), ("batch", "spark"),
        ("filter", "query"), ("filter", "spark"), ("query", "spark"),
        ("query", "stream"), ("spark", "stream"),
    ]
    docs = pd.DataFrame(
        {
            "doc_id": range(len(pairs)),
            "source": ["c1"] * len(pairs),
            "text": [f"{a} {b}" for a, b in pairs],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    pdf = entrymod.queries()["g_ktruss"](spark, str(tmp_path)).toPandas()
    got = sorted((r.a, r.b, r.support) for r in pdf.itertuples())
    clique = ["batch", "filter", "query", "spark"]
    want = sorted(
        (a, b, 2)
        for i, a in enumerate(clique)
        for b in clique[i + 1:]
    )
    assert got == want
    assert set(pdf.converged) == {True}


def test_amie_rules_match_bruteforce_reference(spark, tmp_path):
    """The mined rule table (support, confidence, head coverage)
    replays a pure-Python mini-AMIE over the same fact projection."""
    nation = pd.DataFrame(
        {"n_nationkey": [1, 2], "n_name": ["A", "B"], "n_regionkey": [0, 0]}
    )
    customer = pd.DataFrame(
        {"c_custkey": [1, 2, 3, 4, 5, 6], "c_nationkey": [1, 2, 1, 2, 1, 2]}
    )
    supplier = pd.DataFrame({"s_suppkey": [1, 2], "s_nationkey": [1, 2]})
    orders = pd.DataFrame(
        {"o_orderkey": [10, 20, 30, 40, 50, 60], "o_custkey": [1, 2, 3, 4, 5, 6]}
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [10, 20, 30, 40, 50, 60, 60],
            "l_partkey": [7, 7, 7, 7, 7, 8, 7],
            "l_suppkey": [1, 1, 1, 1, 1, 2, 2],
        }
    )
    for name, df in [
        ("nation", nation), ("customer", customer), ("supplier", supplier),
        ("orders", orders), ("lineitem", lineitem),
    ]:
        df.to_parquet(str(tmp_path / f"{name}.parquet"))

    facts = set()
    for _, r in customer.iterrows():
        facts.add((f"c:{r.c_custkey}", "cust_nation", f"n:{r.c_nationkey}"))
    for _, r in supplier.iterrows():
        facts.add((f"s:{r.s_suppkey}", "supp_nation", f"n:{r.s_nationkey}"))
    for _, r in nation.iterrows():
        facts.add((f"n:{r.n_nationkey}", "nation_region", f"r:{r.n_regionkey}"))
    ol = orders.merge(lineitem, left_on="o_orderkey", right_on="l_orderkey")
    for _, r in ol.iterrows():
        facts.add((f"c:{r.o_custkey}", "bought", f"p:{r.l_partkey}"))
        facts.add((f"c:{r.o_custkey}", "ordered_from", f"s:{r.l_suppkey}"))
    for _, r in lineitem.iterrows():
        facts.add((f"p:{r.l_partkey}", "sold_by", f"s:{r.l_suppkey}"))
    cn = customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    for _, r in cn.iterrows():
        facts.add((f"c:{r.c_custkey}", "cust_region", f"r:{r.n_regionkey}"))
    sn = supplier.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    for _, r in sn.iterrows():
        facts.add((f"s:{r.s_suppkey}", "supp_region", f"r:{r.n_regionkey}"))

    body = {
        (p, q, x, z)
        for (x, p, y1) in facts
        for (y2, q, z) in facts
        if y1 == y2 and x != z
    }
    bn = Counter((p, q) for p, q, _, _ in body)
    heads = Counter(p for _, p, _ in facts)
    sup = Counter(
        (p, q, r)
        for (p, q, x, z) in body
        for r in heads
        if (x, r, z) in facts
    )
    want = sorted(
        [
            (p, q, r, s, bn[(p, q)],
             (1000 * s) // bn[(p, q)], (1000 * s) // heads[r])
            for (p, q, r), s in sup.items()
            if s >= entrymod._AMIE_MIN_SUPPORT
        ],
        key=lambda t: (-t[5], t[0], t[1], t[2]),
    )

    pdf = entrymod.queries()["kg_amie_rules"](spark, str(tmp_path)).toPandas()
    got = [
        (r.body1, r.body2, r.head, r.support, r.body_n,
         r.conf_permille, r.head_coverage_permille)
        for r in pdf.itertuples()
    ]
    assert got == want
    # the deductive composition is rediscovered at full confidence
    assert ("cust_nation", "nation_region", "cust_region", 6, 6, 1000, 1000) in got


def test_evalue_sequential_crossing_index(spark, tmp_path):
    """The integer e-process and its first-crossing index replay a
    pure-Python reference on a hand-built conversion sequence; an arm
    that never accumulates evidence never crosses."""
    t0 = datetime(2024, 1, 1)
    rows = []
    # arm 0 (even user): heavy converter — crosses quickly
    for i in range(40):
        rows.append((i, t0 + timedelta(minutes=i), 0,
                     "purchase" if i % 2 == 0 else "view", 1.0, "{}"))
    # arm 1 (odd user): zero conversions — loge only falls
    for i in range(40):
        rows.append((100 + i, t0 + timedelta(minutes=i), 1, "view", 1.0, "{}"))
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    events.to_parquet(str(tmp_path / "events.parquet"))

    C1, C2, TH = entrymod._EVALUE_C1, entrymod._EVALUE_C2, entrymod._EVALUE_TH
    k = n = 0
    first = None
    mx = -(10**18)
    for i in range(40):
        n += 1
        k += 1 if i % 2 == 0 else 0
        lg = k * C1 + (n - k) * C2
        mx = max(mx, lg)
        if first is None and lg >= TH:
            first = n

    pdf = (
        entrymod.queries()["ev_evalue_sequential"](spark, str(tmp_path))
        .toPandas()
        .set_index("arm")
    )
    a0 = pdf.loc[0]
    assert (a0.n_events, a0.n_conversions) == (40, 20)
    assert a0.loge_final_micro == 20 * C1 + 20 * C2
    assert a0.max_loge_micro == mx and bool(a0.crossed) == (first is not None)
    if first is not None:
        assert a0.first_cross_n == first
    a1 = pdf.loc[1]
    assert a1.n_conversions == 0 and not bool(a1.crossed)
    assert pd.isna(a1.first_cross_n)
    assert a1.loge_final_micro == 40 * C2 < 0


def test_rp_project_known_vectors(spark, tmp_path):
    """Projection, distances, and the distortion ratio replay a
    numpy reference built from the same md5 sign matrix; an
    identical-point pair is excluded from the audit."""
    import numpy as np

    rng = [((i * 37 + j * 11) % 19 - 9) / 7.0 for i in range(3) for j in range(64)]
    v0 = rng[0:64]
    v1 = rng[64:128]
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [v0, v1, list(v0)],  # vec 2 duplicates vec 0
            "label": [0, 1, 0],
        }
    )
    emb.to_parquet(str(tmp_path / "embeddings.parquet"))

    signs = np.array(entrymod._rp_signs())  # (16, 64)
    q = np.round(np.array([v0, v1, v0]) * 1000).astype(np.int64)
    p = q @ signs.T  # (3, 16)
    d2o = int(((q[0] - q[1]) ** 2).sum())
    d2p = int(((p[0] - p[1]) ** 2).sum())
    ratio = (1000 * d2p) // (entrymod._RP_DIMS * d2o)

    pdf = entrymod.queries()["e_rp_project"](spark, str(tmp_path)).toPandas()
    got = {(r.a, r.b): r for r in pdf.itertuples()}
    # the identical pair (0,2) is excluded; (0,1) and (1,2) audit equal
    assert set(got) == {(0, 1), (1, 2)}
    assert got[(0, 1)].dist2_orig == d2o
    assert got[(0, 1)].dist2_proj == d2p
    assert got[(0, 1)].ratio_permille == ratio
    assert got[(1, 2)].dist2_orig == d2o and got[(1, 2)].dist2_proj == d2p


def test_hilbert_key_matches_xy2d_reference(spark):
    """The level-bound Hilbert projection replays the canonical xy2d
    walk cell-for-cell (bits=4: the full 16×16 grid), and the key is
    a bijection onto [0, 4^bits)."""
    from hikma_engine_spark.operators import layout

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = (n - 1) - x, (n - 1) - y
                x, y = y, x
            s //= 2
        return d

    n = 16
    from pyspark.sql import functions as F

    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, ["x", "y"])
    out = layout.with_hilbert_key(
        df, F.col("x"), F.col("y"), 4, key="h"
    ).collect()
    assert all(r.h == xy2d(n, r.x, r.y) for r in out)
    assert sorted(r.h for r in out) == list(range(n * n))


def test_hilbert_layout_sound_and_tighter_than_zorder(spark, tmp_path):
    """On a uniform grid the row-balanced Hilbert files carry no more
    bbox mass than Z-order's (the seam effect), pruning stays sound
    (false_pruned = 0), and every layout sees the same matches."""
    rows = [(i, i % 256, float((i * 7) % 512)) for i in range(2048)]
    ev = pd.DataFrame(rows, columns=["event_id", "user_id", "value"])
    ev["ts"] = pd.Timestamp("2024-01-01")
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["event_type"] = "view"
    ev["props"] = "{}"
    ev.to_parquet(str(tmp_path / "events.parquet"))
    pdf = (
        entrymod.queries()["l_hilbert_layout"](spark, str(tmp_path))
        .toPandas()
        .set_index("layout")
    )
    assert set(pdf.false_pruned) == {0}
    assert len(set(pdf.rows_matched)) == 1
    assert pdf.loc["hilbert"].bbox_permille_of_zorder <= 1000
    assert pdf.loc["zorder"].bbox_permille_of_zorder == 1000


def test_theilsen_robust_slope_matches_reference(spark, tmp_path):
    """The pairwise floor-slope median replays a pure-Python
    reference on a linear series with one corrupted day — and stays
    at the true trend where the mean of slopes would not."""
    t0 = datetime(2024, 1, 1)
    days = list(range(10))
    cents = [1000 + 250 * d for d in days]
    cents[5] = 99_000_000  # the backfill spike
    rows = []
    for d, c in zip(days, cents):
        rows.append((d, t0 + timedelta(days=d), 1, "view", c / 100.0, "{}"))
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(str(tmp_path / "events.parquet"))

    base_day = (t0 - datetime(1970, 1, 1)).days
    daily = {base_day + d: c for d, c in zip(days, cents)}
    slopes = []
    ds = sorted(daily)
    for i, d1 in enumerate(ds):
        for d2 in ds[i + 1:]:
            num = daily[d2] - daily[d1]
            den = d2 - d1
            s = (1_000_000 * num) // den if num >= 0 else -((1_000_000 * -num) // den)
            slopes.append(s)
    slopes.sort()
    want = slopes[(len(slopes) + 1) // 2 - 1]

    row = entrymod.queries()["ev_theilsen_trend"](spark, str(tmp_path)).toPandas().iloc[0]
    assert (row.n_days, row.n_pairs) == (10, 45)
    assert row.ts_slope_micro == want
    # robustness: the estimate stays near the uncorrupted 250¢/day
    assert abs(row.ts_slope_micro - 250_000_000) < 100_000_000


def test_diff_in_diff_two_by_two(spark, tmp_path):
    """Cell means and the DiD contrast replay exactly: control moves
    +10, treated moves +30 → effect +20 (in micro-cents)."""
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # (treat, post, value): control pre 10, post 20; treat pre 40, post 70
    for treat, post, val, n in [
        (0, 0, 10.0, 3), (0, 1, 20.0, 3), (1, 0, 40.0, 3), (1, 1, 70.0, 3)
    ]:
        for i in range(n):
            ts = t0 + timedelta(hours=(48 if post else 0) + i)
            rows.append((eid, ts, treat, "view", val, "{}"))
            eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(str(tmp_path / "events.parquet"))

    row = entrymod.queries()["ev_diff_in_diff"](spark, str(tmp_path)).toPandas().iloc[0]
    assert (row.n_cpre, row.n_cpost, row.n_tpre, row.n_tpost) == (3, 3, 3, 3)
    assert row.mean_micro_cpre == 1_000_000 * 1000
    assert row.mean_micro_tpost == 1_000_000 * 7000
    assert row.did_micro == ((7000 - 4000) - (2000 - 1000)) * 1_000_000


def test_quantile_treatment_exact_order_statistics(spark, tmp_path):
    """Per-arm q25/q50/q75 are the exact (n+1)-rank order statistics
    and the QTE rows contrast them — replayed in pure Python on a
    hand-built two-arm value set."""
    t0 = datetime(2024, 1, 1)
    ctrl = [10, 20, 30, 40, 50, 60, 70]           # arm 0 (even user)
    trt = [10, 20, 30, 40, 50, 600, 700]          # tail-fattened arm 1
    rows = []
    for i, v in enumerate(ctrl):
        rows.append((i, t0, 0, "view", float(v), "{}"))
    for i, v in enumerate(trt):
        rows.append((100 + i, t0, 1, "view", float(v), "{}"))
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(str(tmp_path / "events.parquet"))

    def qs(vals):
        s = sorted(round(v * 100) for v in vals)
        n = len(s)
        pick = lambda r: s[max(1, r) - 1]
        return pick((n + 1) // 4), pick((n + 1) // 2), pick((3 * (n + 1)) // 4)

    c25, c50, c75 = qs(ctrl)
    t25, t50, t75 = qs(trt)
    row = entrymod.queries()["ev_quantile_treatment"](spark, str(tmp_path)).toPandas().iloc[0]
    assert (row.n_c, row.n_t) == (7, 7)
    assert (row.q25_c, row.q50_c, row.q75_c) == (c25, c50, c75)
    assert (row.q25_t, row.q50_t, row.q75_t) == (t25, t50, t75)
    # the tail effect is invisible at the median, visible at p75
    assert row.qte50_cents == t50 - c50 == 0
    assert row.qte75_cents == t75 - c75 > 0


def test_butterflies_identity_and_degree_cap(spark, tmp_path):
    """Two customers sharing 3 kept parts → C(3,2) = 3 butterflies; a
    part above the degree cap contributes nothing."""
    # customers 1,2 share parts 10,11,12; part 99 is bought by
    # 41 customers (degree > _BFLY_DEG_HI) and must be excluded
    orders = pd.DataFrame(
        {"o_orderkey": range(1, 44), "o_custkey": [1, 2] + list(range(1, 42))}
    )
    li_rows = []
    for ok, parts in [(1, [10, 11, 12]), (2, [10, 11, 12])]:
        for p in parts:
            li_rows.append((ok, p))
    for ok in range(3, 44):  # orders 3..43 → customers 1..41 buy part 99
        li_rows.append((ok, 99))
    lineitem = pd.DataFrame(li_rows, columns=["l_orderkey", "l_partkey"])
    orders.to_parquet(str(tmp_path / "orders.parquet"))
    lineitem.to_parquet(str(tmp_path / "lineitem.parquet"))
    row = entrymod.queries()["g_butterflies"](spark, str(tmp_path)).toPandas().iloc[0]
    # kept edges: (1,10),(1,11),(1,12),(2,10),(2,11),(2,12)
    assert row.n_edges == 6
    assert row.n_pairs == 1 and row.n_wedges == 3
    assert row.n_butterflies == 3


def test_powerlaw_alpha_matches_reference(spark, tmp_path):
    """α replays the Clauset MLE with per-term rounded-ln micros on a
    constructed frequency spectrum."""
    import math

    words = {"alpha": 20, "beta": 10, "gamma": 5, "rare": 2}
    text = " ".join(w for w, k in words.items() for _ in range(k))
    docs = pd.DataFrame(
        {"doc_id": [0], "source": ["s"], "lang": ["en"], "text": [text]}
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    docs.to_parquet(str(tmp_path / "documents.parquet"))

    kmin = entrymod._PLAW_KMIN
    ks = [k for k in words.values() if k >= kmin]
    s = sum(round(1_000_000 * math.log(k / (kmin - 0.5))) for k in ks)
    alpha = 1_000_000 + (1_000_000_000_000 * len(ks)) // s
    row = entrymod.queries()["g_powerlaw_alpha"](spark, str(tmp_path)).toPandas().iloc[0]
    assert (row.kmin, row.n_tokens, row.sum_ln_micro) == (kmin, len(ks), s)
    assert row.alpha_micro == alpha


def test_shape_constraints_fire_on_planted_violations(spark, tmp_path):
    """Every rule's violation counter fires on a planted offender:
    a single-turn conversation, an over-long turn, a turn with 7+
    mentions, and a single-conversation entity; the by-construction
    domain/range rule stays at zero."""
    long_text = "x" * 401
    seven = "spark batch filter query stream vector window"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["lonely", "c1", "c1", "c1"],
            "text": ["hash join alone", long_text, seven, "spark again"],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    pdf = (
        entrymod.queries()["kg_shape_constraints"](spark, str(tmp_path))
        .toPandas()
        .set_index("rule_id")
    )
    # conv 'lonely' has 1 turn -> r1 fires once over 2 conversations
    assert (pdf.loc["r1_conv_min_turns"].n_checked,
            pdf.loc["r1_conv_min_turns"].n_violations) == (2, 1)
    assert (pdf.loc["r2_turn_len_cap"].n_checked,
            pdf.loc["r2_turn_len_cap"].n_violations) == (4, 1)
    # mention-bearing turns: 'hash join alone'(1), seven(7), 'spark again'(1)
    assert (pdf.loc["r3_mention_fanout_cap"].n_checked,
            pdf.loc["r3_mention_fanout_cap"].n_violations) == (3, 1)
    # entities: hash join (1 conv), + the 7 (1 conv each except spark in c1
    # twice but still ONE conv) -> every entity has exactly 1 conv except none
    r4 = pdf.loc["r4_entity_min_support"]
    assert r4.n_checked == 8 and r4.n_violations == 8
    r5 = pdf.loc["r5_triple_domain_range"]
    assert r5.n_violations == 0 and bool(r5.shape_ok)


def test_qini_uplift_targets_persuadables(spark, tmp_path):
    """Users are ranked by click engagement; the top decile holds the
    treated converters, so the cumulative Qini rises there — replayed
    against a pure-Python reference."""
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 10 users: ids 0..9; treat = id % 2. High-click users 8,9; user 9
    # (treated) converts, user 8 (control) does not. Low-click users
    # 0..7 never convert.
    for uid in range(10):
        clicks = 10 if uid >= 8 else uid + 1  # distinct scores, all >= 1
        for _ in range(clicks):
            rows.append((eid, t0, uid, "click", 1.0, "{}")); eid += 1
        if uid == 9:
            rows.append((eid, t0, uid, "purchase", 1.0, "{}")); eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(str(tmp_path / "events.parquet"))

    users = []
    for uid in range(10):
        clicks = 10 if uid >= 8 else uid + 1
        users.append((uid, uid % 2, clicks, 1 if uid == 9 else 0))
    ranked = sorted(users, key=lambda u: (-u[2], u[0]))
    n = len(ranked)
    per = {}
    for i, (uid, tr, sc, cv) in enumerate(ranked):
        d = (i * 10) // n
        a = per.setdefault(d, [0, 0, 0, 0])
        if tr: a[0] += 1; a[2] += cv
        else: a[1] += 1; a[3] += cv
    cn_t = cn_c = ck_t = ck_c = 0
    want = []
    for d in sorted(per):
        n_t, n_c, k_t, k_c = per[d]
        cn_t += n_t; cn_c += n_c; ck_t += k_t; ck_c += k_c
        q = (1_000_000 * ck_t) if cn_c == 0 else (
            1_000_000 * ck_t - (1_000_000 * ck_c * cn_t) // cn_c)
        want.append((d, n_t, n_c, k_t, k_c, q))

    pdf = entrymod.queries()["ev_qini_uplift"](spark, str(tmp_path)).toPandas()
    got = [tuple(r) for r in pdf.itertuples(index=False)]
    assert got == want
    # once the treated converter enters the ranking (decile 1), the
    # cumulative Qini turns and stays positive
    assert got[1][5] > 0 and got[-1][5] > 0


def test_rule_apply_proposes_missing_heads(spark, tmp_path):
    """Applied rules propose exactly the body pairs whose head fact is
    absent, scored by the mined confidence — replayed by the same
    brute-force mini-AMIE used for the rule table."""
    nation = pd.DataFrame(
        {"n_nationkey": [1, 2], "n_name": ["A", "B"], "n_regionkey": [0, 0]}
    )
    customer = pd.DataFrame(
        {"c_custkey": [1, 2, 3, 4, 5, 6], "c_nationkey": [1, 2, 1, 2, 1, 2]}
    )
    supplier = pd.DataFrame({"s_suppkey": [1, 2], "s_nationkey": [1, 2]})
    orders = pd.DataFrame(
        {"o_orderkey": [10, 20, 30, 40, 50, 60], "o_custkey": [1, 2, 3, 4, 5, 6]}
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [10, 20, 30, 40, 50, 60, 60],
            "l_partkey": [7, 7, 7, 7, 7, 8, 7],
            "l_suppkey": [1, 1, 1, 1, 1, 2, 2],
        }
    )
    for name, df in [
        ("nation", nation), ("customer", customer), ("supplier", supplier),
        ("orders", orders), ("lineitem", lineitem),
    ]:
        df.to_parquet(str(tmp_path / f"{name}.parquet"))

    facts = set()
    for _, r in customer.iterrows():
        facts.add((f"c:{r.c_custkey}", "cust_nation", f"n:{r.c_nationkey}"))
    for _, r in supplier.iterrows():
        facts.add((f"s:{r.s_suppkey}", "supp_nation", f"n:{r.s_nationkey}"))
    for _, r in nation.iterrows():
        facts.add((f"n:{r.n_nationkey}", "nation_region", f"r:{r.n_regionkey}"))
    ol = orders.merge(lineitem, left_on="o_orderkey", right_on="l_orderkey")
    for _, r in ol.iterrows():
        facts.add((f"c:{r.o_custkey}", "bought", f"p:{r.l_partkey}"))
        facts.add((f"c:{r.o_custkey}", "ordered_from", f"s:{r.l_suppkey}"))
    for _, r in lineitem.iterrows():
        facts.add((f"p:{r.l_partkey}", "sold_by", f"s:{r.l_suppkey}"))
    cn = customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    for _, r in cn.iterrows():
        facts.add((f"c:{r.c_custkey}", "cust_region", f"r:{r.n_regionkey}"))
    sn = supplier.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    for _, r in sn.iterrows():
        facts.add((f"s:{r.s_suppkey}", "supp_region", f"r:{r.n_regionkey}"))

    body = {
        (p, q, x, z)
        for (x, p, y1) in facts
        for (y2, q, z) in facts
        if y1 == y2 and x != z
    }
    bn = Counter((p, q) for p, q, _, _ in body)
    heads = {p for _, p, _ in facts}
    sup = Counter(
        (p, q, r)
        for (p, q, x, z) in body
        for r in heads
        if (x, r, z) in facts
    )
    rules = {
        (p, q, r): (1000 * s) // bn[(p, q)]
        for (p, q, r), s in sup.items()
        if s >= entrymod._AMIE_MIN_SUPPORT
        and (1000 * s) // bn[(p, q)] >= entrymod._RULE_APPLY_MIN_CONF
    }
    props = [
        (p, q, r, x, z, conf)
        for (p, q, r), conf in rules.items()
        for (p2, q2, x, z) in body
        if p2 == p and q2 == q and (x, r, z) not in facts
    ]
    props.sort(key=lambda t: (-t[5], t[3], t[4], t[0], t[1], t[2]))
    want = props[: entrymod._RULE_APPLY_TOP]

    pdf = entrymod.queries()["kg_rule_apply"](spark, str(tmp_path)).toPandas()
    got = [
        (r.body1, r.body2, r.head, r.subj, r.obj, r.conf_permille)
        for r in pdf.itertuples()
    ]
    assert got == want
    # every proposal's head fact is genuinely absent from the KB
    assert all((x, r, z) not in facts for _, _, r, x, z, _ in got)
    assert len(got) > 0
