"""Skew utilities: salted agg/join equal their unsalted counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from hikma_engine_spark.operators import skew


def test_salted_agg_equals_plain_groupby(spark):
    # hot key: 'hot' carries 90% of rows
    rows = [("hot" if i % 10 != 0 else f"cold{i}", i) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"])
        for r in skew.salted_agg(
            df,
            ["k"],
            [F.count("*").alias("pn"), F.sum("v").alias("ps")],
            [F.sum("pn").alias("n"), F.sum("ps").alias("s")],
            n_salt=8,
            salt_source=["k", "v"],
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        ["k", "v"],
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "label"])
    plain = sorted(
        (r["k"], r["v"], r["label"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in skew.salted_join(big, small, "k", n_salt=8).collect()
    )
    assert salted == plain


def test_salt_is_deterministic(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    s1 = [r[0] for r in df.select(skew.salt_col(16, "k", "v")).collect()]
    s2 = [r[0] for r in df.select(skew.salt_col(16, "k", "v")).collect()]
    assert s1 == s2
    assert all(0 <= s < 16 for s in s1)


def test_salted_topn_collect_equals_plain(spark):
    """Capped adjacency via salted two-phase == plain groupBy top-n,
    including a pathological hot key (1 key owning 80% of rows)."""
    import random

    from hikma_engine_spark.operators.skew import salted_topn_collect

    random.seed(3)
    rows = [("hot", f"item{i:05d}") for i in range(4000)] + [
        (f"k{random.randint(0, 50)}", f"item{i:05d}") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, ["k", "item"])
    got = {
        r["k"]: (r["degree"], tuple(r["items"]))
        for r in salted_topn_collect(
            df, ["k"], "item", n=5, n_salt=8, salt_source=["item"]
        ).collect()
    }
    want = {
        r["k"]: (r["degree"], tuple(r["items"]))
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("degree"),
            F.slice(F.sort_array(F.collect_list("item")), 1, 5).alias("items"),
        )
        .collect()
    }
    assert got == want
