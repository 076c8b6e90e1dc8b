"""Stage-2 extraction: hand-written cases + P/R vs the pure-Python oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from hikma_engine_spark.stages import extract

import oracle_kg


def test_tiny_mentions(spark, tiny_df):
    m = extract.extract_mentions(tiny_df).toPandas()
    # c1#0: PostgreSQL (13..23), redis (29..34)
    c10 = m[(m.conv_id == "c1") & (m.turn_idx == 0)].sort_values("start")
    assert list(c10.surface) == ["PostgreSQL", "redis"]
    assert list(c10.surface_norm) == ["postgresql", "redis"]
    assert list(c10.kind) == ["gazetteer", "gazetteer"]
    s = tiny_df.toPandas()
    row = s[(s.conv_id == "c1") & (s.turn_idx == 0)].iloc[0]
    for _, r in c10.iterrows():
        assert row.text[r.start : r.end] == r.surface  # span fidelity

    # c2#0: @alice (at), linter (toolcall), JS (gazetteer)
    c20 = m[(m.conv_id == "c2") & (m.turn_idx == 0)]
    kinds = set(zip(c20.kind, c20.surface_norm))
    assert ("at", "alice") in kinds
    assert ("toolcall", "linter") in kinds
    assert ("gazetteer", "js") in kinds

    # depends_on in c1#1: postgres depends on python
    dep = m[(m.kind == "depends_on")]
    assert len(dep) == 1
    assert dep.iloc[0].surface_norm == "postgres"
    assert dep.iloc[0].obj_norm == "python"


def test_tiny_triples(spark, tiny_df):
    mentions = extract.extract_mentions(tiny_df)
    triples = extract.assemble_triples(tiny_df, mentions).toPandas()
    tset = set(zip(triples.src, triples.edge_type, triples.dst))
    assert ("turn:c1#0", "IN_CONV", "conv:c1") in tset
    assert ("turn:c1#0", "MENTIONS", "entity:postgresql") in tset
    assert ("turn:c1#2", "INVOKES", "tool:search") in tset  # from tool column
    assert ("turn:c2#0", "INVOKES", "tool:linter") in tset  # from call: pattern
    assert ("entity:postgres", "DEPENDS_ON", "entity:python") in tset
    assert ("turn:c1#2", "MENTIONS", "entity:k8s") in tset


@pytest.fixture(scope="module")
def engine_triples(pipeline_out):
    """Triple projection of the materialized edge table (minus the
    linking-derived SAME_AS edges, which join the set in the P/R test)."""
    t = (
        pipeline_out.edges()
        .filter("edge_type != 'SAME_AS'")
        .select("src", "edge_type", "dst")
        .toPandas()
    )
    return set(zip(t.src, t.edge_type, t.dst))


def test_precision_recall_vs_oracle(engine_triples, corpus_pdf, pipeline_out):
    """The headline gate: P/R ≥ 0.95 on (src, edge_type, dst) — includes
    linking's SAME_AS output (golden = alias-map closure)."""
    golden = oracle_kg.golden_triples(corpus_pdf)
    same_as = pipeline_out._read("same_as").toPandas()
    engine = engine_triples | set(zip(same_as.src, same_as.edge_type, same_as.dst))
    tp = len(engine & golden)
    precision = tp / len(engine)
    recall = tp / len(golden)
    assert precision >= 0.95, f"precision {precision:.4f}; extra: {list(engine - golden)[:10]}"
    assert recall >= 0.95, f"recall {recall:.4f}; missing: {list(golden - engine)[:10]}"


def test_extraction_deterministic(spark, tiny_df):
    a = extract.extract_mentions(tiny_df).toPandas().sort_values(
        ["conv_id", "turn_idx", "start", "kind"]
    ).reset_index(drop=True)
    b = extract.extract_mentions(tiny_df).toPandas().sort_values(
        ["conv_id", "turn_idx", "start", "kind"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
