"""Streaming ingestion: availableNow drain, streaming extraction parity
with batch, watermarked windowed aggregation."""

from __future__ import annotations

import os

import pytest

from hikma_engine_spark.stages import extract
from hikma_engine_spark.streaming import ingest


@pytest.fixture(scope="module")
def stream_dir(tiny_path, tmp_path_factory):
    """A directory containing the tiny corpus as its single file."""
    d = tmp_path_factory.mktemp("stream_in")
    os.link(tiny_path, d / "part-000.parquet")
    return str(d)


def test_streaming_extraction_matches_batch(spark, stream_dir, tiny_df):
    stream = ingest.stream_transcripts(spark, stream_dir)
    assert stream.isStreaming
    mentions_stream = ingest.stream_extract_mentions(stream)
    ingest.run_available_now(mentions_stream, "m_stream")
    got = spark.sql("SELECT * FROM m_stream").toPandas()
    want = extract.extract_mentions(tiny_df).toPandas()
    key = ["conv_id", "turn_idx", "start", "kind"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, want[key].values.tolist())
    )


def test_streaming_windowed_mention_counts(spark, stream_dir):
    stream = ingest.stream_transcripts(spark, stream_dir)
    agg = ingest.streaming_mention_counts(stream, window="1 hour", watermark="1 hour")
    ingest.run_available_now(agg, "wc_stream", output_mode="complete")
    got = spark.sql("SELECT * FROM wc_stream").toPandas()
    assert len(got) > 0
    counts = dict(zip(got.surface_norm, got.n_mentions))
    # tiny corpus: postgresql + redis + postgres + python + k8s + js mentions
    assert counts.get("postgresql") == 1
    assert counts.get("k8s") == 1
    assert (got.n_mentions >= 1).all()
