"""Query layer: semantic / text / metadata / hybrid / find-similar
(reference behaviors from §3.2 / enhanced-search-service)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hikma_engine_spark.query import search


def test_semantic_search_topk(spark, pipeline_out):
    nodes = pipeline_out.nodes()
    res = search.semantic_search(
        nodes, "postgresql migration plan", k=5, node_types=["Turn"]
    ).toPandas()
    assert len(res) == 5
    assert list(res["rank"]) == [1, 2, 3, 4, 5]
    assert res.similarity.is_monotonic_decreasing
    assert "embedding" not in res.columns  # projection strips the vector
    assert (res.node_type == "Turn").all()


def test_semantic_search_min_similarity(spark, pipeline_out):
    nodes = pipeline_out.nodes()
    res = search.semantic_search(nodes, "postgresql", k=50, min_similarity=0.4)
    assert res.filter(F.col("similarity") < 0.4).count() == 0


def test_semantic_search_query_relevance(spark, pipeline_out):
    """A query naming an entity must score that entity at cosine 1.0 and
    rank it at the top (modulo 64-dim hash-bucket collisions between
    single-token surfaces, which tie at 1.0 — hence top-2, not top-1)."""
    nodes = pipeline_out.nodes()
    res = search.semantic_search(
        nodes, "kubernetes", k=3, node_types=["Entity"]
    ).toPandas()
    hit = res[res.id == "entity:kubernetes"]
    assert len(hit) == 1
    assert hit.iloc[0]["rank"] <= 2
    assert abs(hit.iloc[0].similarity - 1.0) < 1e-6


def test_text_search(spark, pipeline_out):
    nodes = pipeline_out.nodes()
    res = search.text_search(nodes, "kubernetes", k=10).toPandas()
    assert len(res) > 0
    assert res.source_text.str.contains("kubernetes").all()
    # T3 heuristic: shortest matches first
    lens = res.source_text.str.len()
    assert lens.is_monotonic_increasing


def test_metadata_search(spark, pipeline_out):
    nodes = pipeline_out.nodes()
    res = search.metadata_search(
        nodes, node_types=["Turn"], prop_equals={"role": "tool"}, limit=20
    ).toPandas()
    assert 0 < len(res) <= 20
    assert all(p["role"] == "tool" for p in res.properties)


def test_hybrid_search_dedups_best_wins(spark, pipeline_out):
    nodes = pipeline_out.nodes()
    res = search.hybrid_search(nodes, "postgresql", k=10).toPandas()
    assert len(res) <= 10
    assert res.id.is_unique
    assert list(res["rank"]) == list(range(1, len(res) + 1))


def test_comprehensive_search(spark, pipeline_out):
    res = search.comprehensive_search(pipeline_out.nodes(), "postgresql", k=12).toPandas()
    assert 0 < len(res) <= 12
    assert res.id.is_unique
    assert list(res["rank"]) == list(range(1, len(res) + 1))
    # semantic hits (weight 3) rank above text (2) and metadata (1)
    assert res.source_weight.is_monotonic_decreasing


def test_facets(spark, pipeline_out):
    res = search.semantic_search(pipeline_out.nodes(), "postgresql", k=20)
    f = search.facets(res, columns=("node_type",))
    assert sum(f["node_type"].values()) == res.count()
    assert set(f["node_type"]) <= {"Turn", "Entity", "Mention", "Conversation", "Tool"}


def test_find_similar(spark, pipeline_out):
    nodes = pipeline_out.nodes()
    res = search.find_similar(nodes, "entity:postgresql", k=5).toPandas()
    assert len(res) == 5
    assert "entity:postgresql" not in set(res.id)
    # alias surfaces embed over near-identical text → should rank high
    assert res.iloc[0].similarity > 0.0
