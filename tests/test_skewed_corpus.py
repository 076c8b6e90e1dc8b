"""FIXTURES.md §6 skewed_corpus: a pathological giant conversation and
hot entities must not break correctness or balance (skew gate)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hikma_engine_spark import synth
from hikma_engine_spark.pipeline import Pipeline

import oracle_kg


def test_pipeline_on_skewed_corpus(spark, tmp_path):
    # 60 convs, every 20th is a 1000-turn giant (3 giants), hot entities on
    pdf = synth.generate_transcripts(
        n_convs=60, seed=7, big_conv_every=20, big_conv_turns=1000
    )
    path = str(tmp_path / "skewed.parquet")
    pdf.to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    out = str(tmp_path / "skew_out")
    p = Pipeline(spark, path, out, run_id="skew")
    p.run()

    # correctness unaffected by skew: P/R vs oracle still ≥ 0.95
    edges = (
        p.edges()
        .filter("edge_type != 'SAME_AS'")
        .select("src", "edge_type", "dst")
        .toPandas()
    )
    engine = set(zip(edges.src, edges.edge_type, edges.dst))
    same_as = p._read("same_as").toPandas()
    engine |= set(zip(same_as.src, same_as.edge_type, same_as.dst))
    golden = oracle_kg.golden_triples(pdf)
    tp = len(engine & golden)
    assert tp / len(engine) >= 0.95
    assert tp / len(golden) >= 0.95

    # the giant conversation's turns are all present and verbatim
    giant = pdf.groupby("conv_id").size().idxmax()
    n_giant = int((pdf.conv_id == giant).sum())
    assert n_giant == 1000
    turns = (
        p.nodes()
        .filter((F.col("node_type") == "Turn") & (F.col("conv_id") == giant))
        .count()
    )
    assert turns == n_giant

    # extraction COMPUTE spreads across tasks, not funneled into one
    # (storage is bucket-grouped by conv hash — that's intentional COW
    # layout; the skew question is about the UDF stage's parallelism)
    from hikma_engine_spark.stages import extract

    m = extract.extract_mentions(p.transcripts())
    per_task = (
        m.filter(F.col("conv_id") == giant)
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .toPandas()
    )
    assert len(per_task) > 1
    assert per_task["count"].max() / per_task["count"].sum() < 0.6


def test_simhash_hot_bucket_cap(spark):
    """Round-2 verdict item 2: boilerplate-heavy corpora must not blow
    up the simhash chunk join. 300 identical docs saturate all four
    chunk buckets; with the cap their O(n²) pair explosion is dropped
    (and accounted), while a distinct near-dup pair outside the hot
    buckets is still found."""
    from hikma_engine_spark.operators import dedup

    boiler = [(i, "standard legal disclaimer repeated verbatim in every doc") for i in range(300)]
    # long doc + one-token perturbation → simhash hamming 2 (precomputed);
    # short docs flip too many bits per token to stay under the threshold
    t1 = (
        "a unique long report about spark shuffle tuning and partition sizing "
        "across many executors with adaptive query execution enabled and skew "
        "mitigation "
    ) * 3
    distinct = [(1000, t1), (1001, t1.replace("skew ", "xskew ", 1))]
    df = spark.createDataFrame(boiler + distinct, "doc_id long, text string")

    pairs, dropped = dedup.simhash_pairs(
        df, "doc_id", "text", max_hamming=3, max_bucket_size=100, return_dropped=True
    )
    got = pairs.toPandas()
    # the boilerplate group (4 hot buckets of 300) is dropped, not exploded
    drop_pdf = dropped.toPandas()
    assert len(drop_pdf) == 4 and (drop_pdf["count"] == 300).all()
    assert set(zip(got.a, got.b)) == {(1000, 1001)}

    # without the cap the same corpus yields the full O(n²) explosion
    uncapped = dedup.simhash_pairs(
        df, "doc_id", "text", max_hamming=3, max_bucket_size=10_000
    )
    assert uncapped.count() == 300 * 299 // 2 + 1


def test_embdup_hot_bucket_cap(spark):
    """Round-3 verdict item 2: a duplicate-heavy embedding corpus must
    not blow up the hyperplane bucket self-join. 500 identical vectors
    collapse into ONE signature bucket per table; with the cap their
    O(n²) pair explosion is dropped (and accounted per table), while a
    distinct near-dup pair whose buckets stay cold is still found."""
    import numpy as np

    from hikma_engine_spark.operators import dedup

    rng = np.random.RandomState(11)
    hot_vec = [float(x) for x in rng.randn(16)]
    boiler = [(i, hot_vec) for i in range(500)]
    base = rng.randn(16)
    near = base + rng.randn(16) * 0.01
    distinct = [
        (1000, [float(x) for x in base]),
        (1001, [float(x) for x in near]),
    ]
    df = spark.createDataFrame(
        boiler + distinct, "vec_id long, embedding array<double>"
    )

    pairs, dropped = dedup.embedding_near_dup_pairs(
        df,
        "vec_id",
        "embedding",
        threshold=0.9,
        n_planes=4,
        n_tables=4,
        max_bucket_size=100,
        return_dropped=True,
    )
    got = pairs.toPandas()
    drop_pdf = dropped.toPandas()
    # the identical-vector group saturates one bucket in EVERY table
    assert len(drop_pdf) >= 4 and (drop_pdf["count"] >= 500).all()
    assert (1000, 1001) in set(zip(got.a, got.b))
    # candidate volume is bounded: none of the 500×499/2 hot pairs leak
    assert not ((got.a < 500) & (got.b < 500)).any()

    # without the cap the same corpus yields the full O(n²) explosion
    uncapped = dedup.embedding_near_dup_pairs(
        df,
        "vec_id",
        "embedding",
        threshold=0.9,
        n_planes=4,
        n_tables=4,
        max_bucket_size=10**6,
    )
    assert uncapped.count() >= 500 * 499 // 2


def test_auto_n_planes_scales_bucket_population(spark):
    """Round-2 verdict item 3: the hyperplane count derives from corpus
    size so bucket populations track the target band at any scale."""
    import numpy as np

    from hikma_engine_spark.operators.dedup import auto_n_planes
    from hikma_engine_spark.operators.similarity_search import add_lsh_buckets

    # pure arithmetic: expected bucket population stays within 2x of
    # target across six orders of magnitude
    for n in [10_000, 1_000_000, 100_000_000, 10**9]:
        p = auto_n_planes(n, target_bucket_rows=256)
        expected = n / 2**p
        assert expected <= 256 * 2, (n, p)
    assert auto_n_planes(100, target_bucket_rows=256) == 4  # clamped low
    assert auto_n_planes(10**15, target_bucket_rows=1) == 40  # clamped high
    # the population contract must HOLD at trillion-row scale (round 4:
    # the old hi=24 clamp silently broke it past ~4.3B rows)
    p12 = auto_n_planes(10**12, target_bucket_rows=256)
    assert 10**12 / 2**p12 <= 256 * 2

    # empirically at two corpus sizes: mean bucket population lands in
    # the target band (isotropic vectors spread evenly over sign buckets)
    rng = np.random.RandomState(3)
    for n_rows, target in [(512, 64), (4096, 64)]:
        rows = [
            (i, [float(x) for x in rng.randn(16)]) for i in range(n_rows)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        p = auto_n_planes(n_rows, target_bucket_rows=target)
        bucketed = add_lsh_buckets(df, n_planes=None, target_bucket_rows=target)
        pops = (
            bucketed.groupBy("lsh_bucket").count().toPandas()["count"]
        )
        mean_pop = pops.mean()
        assert target / 4 <= mean_pop <= target * 2, (n_rows, p, mean_pop)


def test_pagerank_distributed_hot_hub_equals_driver(spark):
    """Distributed PageRank on a skewed graph: one hub receives 25% of
    all edges (hot destination absorbed by map-side partial sums), plus
    a dangling sink. Distributed == driver-numpy to 1e-9."""
    import numpy as np

    from hikma_engine_spark.operators.graph import pagerank

    rng = np.random.RandomState(3)
    n_nodes = 5000
    srcs = rng.randint(1, n_nodes, 30_000)
    dsts = rng.randint(1, n_nodes, 30_000)
    hub_srcs = rng.randint(1, n_nodes, 10_000)
    edges = {(f"n{s}", f"n{d}") for s, d in zip(srcs, dsts) if s != d}
    edges |= {(f"n{s}", "hub") for s in hub_srcs}
    edges |= {("hub", "sink")}  # sink is dangling
    df = spark.createDataFrame(sorted(edges), "src string, dst string")
    drv = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(df, driver_threshold=0).collect()
    }
    assert set(drv) == set(dist)
    worst = max(abs(drv[k] - dist[k]) for k in drv)
    assert worst < 1e-9, worst
    # the dangling sink is fed the hub's whole mass and keeps it (self-
    # loop treatment) → top rank; the hub itself tops every normal node
    ranked = sorted(drv, key=drv.get, reverse=True)
    assert ranked[0] == "sink" and ranked[1] == "hub"


def test_substring_spans_hot_gram(spark):
    """A boilerplate phrase shared by EVERY doc (the 'terms of service'
    pathology): the operator marks positions via one algebraic groupBy
    + semi-join — each shingle row emits at most once, so a gram in 300
    docs costs 300 marked rows, never a 300² pair explosion. Verify
    exact spans under maximal gram heat."""
    from hikma_engine_spark.operators import dedup

    boiler = "standard legal disclaimer applies to every document in this corpus"
    rows = [
        (i, f"unique{i} prefix{i} " + boiler + f" suffix{i} tail{i}")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = dedup.substring_duplicate_spans(df, "doc_id", "text", n=8).toPandas()
    # one span per doc: the 10-token boiler at tokens 3-12, 3 windows
    assert len(spans) == 300
    assert set(spans.doc_id) == set(range(300))
    assert (spans.span_start == 3).all()
    assert (spans.span_end == 12).all()
    assert (spans.span_tokens == 10).all()
    assert (spans.n_shingles == 3).all()
