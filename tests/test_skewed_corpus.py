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
