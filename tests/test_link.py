"""Stage-3 linking: alias canonicalization, CC, similarity blocking."""

from __future__ import annotations

from pyspark.sql import functions as F

from hikma_engine_spark.operators.graph import connected_components, k_hop
from hikma_engine_spark.stages import link

import oracle_kg


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")], ["src", "dst"]
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == "a"
    assert cc["x"] == cc["y"] == "x"


def test_cc_chain_converges(spark):
    """A path graph needs multiple label-propagation rounds — forced
    through the DISTRIBUTED iterative path (driver_threshold=0)."""
    n = 12
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(n)], ["src", "dst"]
    )
    cc = connected_components(edges, driver_threshold=0).collect()
    assert {r["component"] for r in cc} == {"n00"}
    assert len(cc) == n + 1


def test_cc_distributed_equals_driver_path(spark):
    """Both physical CC strategies produce identical labelings."""
    import random

    rnd = random.Random(3)
    edges = [(f"v{rnd.randrange(60)}", f"v{rnd.randrange(60)}") for _ in range(80)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {r["node"]: r["component"] for r in connected_components(df).collect()}
    b = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert a == b


def test_build_links_distributed_equals_driver_path(spark, pipeline_out):
    """Full linking (LSH blocking + scoring + CC + canonical choice):
    the distributed path must agree with the driver twin on every
    surface that either path links (the LSH path may miss sub-threshold
    borderline candidates by design — it must never DISAGREE)."""
    mentions = pipeline_out._read("mentions")
    drv = {
        (r["surface_norm"], r["canonical_norm"])
        for r in link.build_links(mentions).collect()
    }
    dist = {
        (r["surface_norm"], r["canonical_norm"])
        for r in link.build_links(mentions, driver_threshold=0).collect()
    }
    drv_map = dict(drv)
    dist_map = dict(dist)
    assert set(drv_map) == set(dist_map)  # same surface universe
    # alias-map-backed canonicals must agree exactly
    import oracle_kg

    expected = oracle_kg.expected_canonical(set(drv_map))
    for s, exp in expected.items():
        if exp != s:
            assert drv_map[s] == exp
            assert dist_map[s] == exp


def test_alias_clusters_canonicalize(spark, pipeline_out, corpus_pdf):
    """aliased_entities fixture (FIXTURES.md §6): every observed alias
    surface must map to its gazetteer canonical."""
    links = pipeline_out._read("links").toPandas()
    got = dict(zip(links.surface_norm, links.canonical_norm))
    expected = oracle_kg.expected_canonical(set(got))
    mismatches = {
        s: (got[s], expected[s])
        for s in got
        if expected[s] != s and got[s] != expected[s]
    }
    assert not mismatches, f"alias canonicalization wrong: {mismatches}"


def test_no_cross_cluster_merges(spark, pipeline_out):
    """Precision side: surfaces from different gazetteer clusters must
    not land in the same component."""
    links = pipeline_out._read("links").toPandas()
    got = dict(zip(links.surface_norm, links.canonical_norm))
    expected = oracle_kg.expected_canonical(set(got))
    for s, canon in got.items():
        exp = expected[s]
        if exp != s:  # gazetteer surface: canonical must be exactly exp
            assert canon == exp, f"{s} merged into {canon}, expected {exp}"


def test_similarity_edges_near_spelling(spark):
    """The similarity path (not the alias map) must catch near-spellings."""
    surfaces = spark.createDataFrame(
        [("postgresql",), ("postgresql9",), ("zebra",)], ["surface_norm"]
    )
    pairs = {
        (r["src"], r["dst"]) for r in link.similarity_edges(surfaces).collect()
    }
    assert ("postgresql", "postgresql9") in pairs or (
        "postgresql9",
        "postgresql",
    ) in pairs
    assert not any("zebra" in p for pair in pairs for p in pair)


def test_k_hop_traversal(spark, pipeline_out):
    edges = pipeline_out.edges()
    one_mention = (
        edges.filter(F.col("edge_type") == "IN_TURN").limit(1).collect()[0]
    )
    reached = k_hop(
        edges.select("src", "dst", "edge_type"), [one_mention["src"]], k=2
    ).toPandas()
    # mention -> turn -> conv
    assert (reached.depth == 2).any()
    assert any(reached[reached.depth == 2].id.str.startswith("conv:"))
