"""Stage-1 discover: ordering-stable hashes, dim correctness, validation."""

from __future__ import annotations

from pyspark.sql import functions as F

from hikma_engine_spark.stages import discover


def test_conversations_dim(spark, tiny_df):
    dim = discover.conversations_dim(tiny_df).toPandas().set_index("conv_id")
    assert dim.loc["c1", "n_turns"] == 3
    assert dim.loc["c1", "n_tool_turns"] == 1
    assert dim.loc["c2", "n_turns"] == 2
    assert dim.loc["c1", "max_turn_idx"] == 2


def test_content_hash_order_invariant(spark, tiny_df):
    """content_hash must not depend on physical row order (the anchor of
    the per-turn text-equality invariant)."""
    h1 = discover.conversations_dim(tiny_df).select("conv_id", "content_hash")
    shuffled = tiny_df.orderBy(F.desc("turn_idx"), F.col("conv_id")).repartition(7)
    h2 = discover.conversations_dim(shuffled).select("conv_id", "content_hash")
    a = {r["conv_id"]: r["content_hash"] for r in h1.collect()}
    b = {r["conv_id"]: r["content_hash"] for r in h2.collect()}
    assert a == b


def test_ordered_turns_window(spark, tiny_df):
    ot = discover.ordered_turns(tiny_df).toPandas()
    c1 = ot[ot.conv_id == "c1"].sort_values("turn_idx")
    assert list(c1.pos) == [1, 2, 3]
    assert list(c1.is_first) == [True, False, False]
    assert c1.iloc[1].prev_role == "user"
    assert c1.iloc[1].next_role == "tool"


def test_validate_catches_duplicates(spark, tiny_df):
    assert discover.validate(tiny_df).count() == 0
    dup = tiny_df.unionByName(tiny_df.limit(1))
    assert discover.validate(dup).count() == 1
