"""functions/: embeddings, similarity, text analysis."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hikma_engine_spark.functions import text as tx
from hikma_engine_spark.functions.embeddings import embed_text, embed_udf
from hikma_engine_spark.functions.similarity import cosine, cosine_to_literal


def test_embed_deterministic_and_normalized():
    a = embed_text("spark is fast")
    b = embed_text("spark is fast")
    assert np.allclose(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-5
    assert np.linalg.norm(embed_text("")) == 0.0


def test_embed_udf_matches_driver(spark):
    df = spark.createDataFrame([("spark is fast",), ("hello world",)], ["t"])
    rows = df.select(embed_udf("t").alias("e")).collect()
    assert np.allclose(np.array(rows[0]["e"]), embed_text("spark is fast"), atol=1e-6)


def test_embed_udf_iterator_one_time_init(spark):
    """Round-3 verdict item 6: embed_udf is the Iterator[pd.Series]
    form with a worker-global model slot — the model resolves ONCE per
    worker process no matter how many tasks/batches stream through.
    Unit-level: drive the generator body directly with multiple batches
    and multiple 'tasks'; the init counter must stay at 1. Spark-level:
    outputs are unchanged by the conversion."""
    import pandas as pd

    from hikma_engine_spark.functions import embeddings as E

    E._MODEL_SLOT.clear()
    b1 = pd.Series(["spark is fast", "hello"])
    b2 = pd.Series(["another batch"])
    out1 = list(E._embed_batches(iter([b1, b2])))  # one task, two batches
    assert len(out1) == 2 and E._MODEL_SLOT["init_count"] == 1
    list(E._embed_batches(iter([b1])))  # second task, same worker
    assert E._MODEL_SLOT["init_count"] == 1

    df = spark.createDataFrame([("spark is fast",), (None,)], ["t"])
    rows = df.select(embed_udf("t").alias("e")).collect()
    assert np.allclose(
        np.array(rows[0]["e"]), embed_text("spark is fast"), atol=1e-6
    )
    assert np.linalg.norm(np.array(rows[1]["e"])) == 0.0


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
        ["a", "b"],
    )
    sims = [r["s"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("s")).collect()]
    assert abs(sims[0] - 1.0) < 1e-9
    assert abs(sims[1]) < 1e-9
    assert sims[2] == 0.0  # zero-norm guard


def test_cosine_to_literal(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["a"])
    s = df.select(cosine_to_literal(F.col("a"), [3.0, 4.0]).alias("s")).collect()[0]["s"]
    assert abs(s - 1.0) < 1e-9


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("The quick brown fox and the lazy dog.",), ("el que la de los!!!",), ("",)],
        ["t"],
    )
    out = df.select(
        tx.token_count(F.col("t")).alias("toks"),
        tx.lang_guess(F.col("t")).alias("lang"),
        tx.quality_score(F.col("t")).alias("q"),
        tx.fingerprint(F.col("t")).alias("fp"),
        tx.punct_ratio(F.col("t")).alias("pr"),
    ).collect()
    assert out[0]["toks"] == 8
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "es"
    assert out[2]["lang"] == "und"
    assert 0.0 <= out[0]["q"] <= 1.0
    assert out[0]["fp"] != out[1]["fp"]


def test_fingerprint_whitespace_case_invariant(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("HELLO\tWORLD ",)], ["t"]
    )
    fps = {r["fp"] for r in df.select(tx.fingerprint(F.col("t")).alias("fp")).collect()}
    assert len(fps) == 1
