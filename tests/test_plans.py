"""Plan-shape assertions: pushdown, broadcast, no cartesian, bounded
shuffles — the explain-driven part of the performance contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from hikma_engine_spark.plans import inspect
from hikma_engine_spark.sources import transcripts as src
from hikma_engine_spark.stages import extract, link


def test_scan_filter_pushdown(spark, corpus_path):
    df = src.read_transcripts(spark, corpus_path, conv_prefix_filter="conv0000001")
    assert inspect.has_pushed_filter(df, "StringStartsWith(conv_id,conv0000001)")


def test_scan_column_pruning(spark, corpus_path):
    df = spark.read.parquet(corpus_path).select("conv_id", "turn_idx")
    rs = inspect.read_schema(df)
    assert "text" not in rs  # projection reached the scan
    assert "conv_id" in rs


def test_alias_join_is_broadcast(spark, pipeline_out):
    mentions = pipeline_out._read("mentions")
    surfaces = link.observed_surfaces(mentions)
    plan_df = link.alias_edges(surfaces)
    assert inspect.has_broadcast_join(plan_df)
    assert not inspect.has_cartesian(plan_df)


def test_triple_assembly_is_shuffle_free(spark, pipeline_out, corpus_path):
    """The core scale property: assembling the full triple set adds NO
    exchange beyond the input rebalance."""
    t = spark.read.parquet(corpus_path)  # multi-split path: no rebalance
    mentions = pipeline_out._read("mentions")
    triples = extract.assemble_triples(t, mentions)
    assert inspect.shuffle_count(triples) == 0


def test_semantic_search_no_shuffle_before_topk(spark, pipeline_out):
    from hikma_engine_spark.query import search

    res = search.semantic_search(pipeline_out.nodes(), "postgresql", k=5)
    plan = inspect.physical_plan(res, "simple")
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
