"""Robustness: empty/null/unicode inputs through the full pipeline."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hikma_engine_spark.pipeline import Pipeline


def _write(pdf: pd.DataFrame, path: str) -> str:
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf.to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    return path


def test_pipeline_on_degenerate_turns(spark, tmp_path):
    rows = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c1", "c2"],
            "turn_idx": [0, 1, 2, 0],
            "role": ["user", "assistant", "tool", "user"],
            "text": [
                None,                      # null text
                "",                        # empty text
                "Δ unicode → postgresql 🚀 und étoile",  # unicode + entity
                "   ",                     # whitespace only
            ],
            "tool": [None, None, "shell", None],
            "ts": pd.to_datetime(["2025-01-01"] * 4),
        }
    )
    path = _write(rows, str(tmp_path / "deg.parquet"))
    out = str(tmp_path / "deg_out")
    p = Pipeline(spark, path, out, run_id="deg")
    p.run()

    nodes = p.nodes()
    turns = nodes.filter(F.col("node_type") == "Turn").toPandas()
    assert len(turns) == 4
    # null/empty text preserved as-is on the invariant column
    by_key = turns.set_index(["conv_id", "turn_idx"]).source_text
    assert by_key.loc[("c1", 0)] is None or pd.isna(by_key.loc[("c1", 0)])
    assert by_key.loc[("c1", 1)] == ""
    assert "🚀" in by_key.loc[("c1", 2)]

    edges = p.edges().toPandas()
    eset = set(zip(edges.src, edges.edge_type, edges.dst))
    assert ("turn:c1#2", "MENTIONS", "entity:postgresql") in eset
    assert ("turn:c1#2", "INVOKES", "tool:shell") in eset
    # the german marker 'und' inside unicode text feeds lang features fine
    assert ("turn:c1#0", "IN_CONV", "conv:c1") in eset


def test_pipeline_on_empty_corpus(spark, tmp_path):
    rows = pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype="string"),
            "turn_idx": pd.Series([], dtype="int32"),
            "role": pd.Series([], dtype="string"),
            "text": pd.Series([], dtype="string"),
            "tool": pd.Series([], dtype="string"),
            "ts": pd.Series([], dtype="datetime64[us]"),
        }
    )
    path = str(tmp_path / "empty.parquet")
    rows.to_parquet(path, index=False)
    out = str(tmp_path / "empty_out")
    p = Pipeline(spark, path, out, run_id="empty")
    p.run()
    assert p.nodes().count() == 0
    assert p.edges().count() == 0
