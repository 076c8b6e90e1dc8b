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


def test_streaming_stateful_conversation_state(spark, corpus_pdf, tmp_path):
    """applyInPandasWithState accumulator: state persists across
    micro-batches; the LAST emitted row per conversation must equal the
    batch groupBy result."""
    d = tmp_path / "multi_batch"
    d.mkdir()
    # two files → two availableNow micro-batches (maxFilesPerTrigger=1)
    half = len(corpus_pdf) // 2
    for i, chunk in enumerate([corpus_pdf.iloc[:half], corpus_pdf.iloc[half:]]):
        chunk.to_parquet(
            str(d / f"part-{i}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    stream = (
        spark.readStream.schema(
            __import__("hikma_engine_spark.schemas", fromlist=["TRANSCRIPTS"]).TRANSCRIPTS
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    prog = ingest.streaming_conversation_state(stream)
    q = (
        prog.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM conv_state").toPandas()
    # last emission per conversation (multiple batches → multiple rows)
    final = (
        got.sort_values("n_turns").groupby("conv_id").last().reset_index()
    )
    want = (
        corpus_pdf.assign(n_chars=corpus_pdf.text.str.len())
        .groupby("conv_id")
        .agg(n_turns=("turn_idx", "size"), max_turn_idx=("turn_idx", "max"),
             total_chars=("n_chars", "sum"))
        .reset_index()
    )
    merged = final.merge(want, on="conv_id", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    assert (merged.n_turns_got == merged.n_turns_want).all()
    assert (merged.max_turn_idx_got == merged.max_turn_idx_want).all()
    assert (merged.total_chars_got == merged.total_chars_want).all()


def test_streaming_dedup_matches_batch_fingerprints(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the
    shared fingerprint spec) keeps exactly one doc per distinct
    fingerprint across micro-batches — same surviving-fingerprint SET
    as batch exact dedup (which duplicate wins is arrival-order
    dependent by design; the batch path pins first-wins)."""
    import pandas as pd

    d = tmp_path / "docs_stream"
    d.mkdir()
    rows = [
        (0, "the quick brown fox", "2024-01-01 10:00:00"),
        (1, "THE  quick   brown FOX", "2024-01-01 10:01:00"),  # dup of 0
        (2, "unrelated database text", "2024-01-01 10:02:00"),
        (3, "the quick brown fox", "2024-01-01 10:03:00"),  # dup of 0
        (4, "unrelated database text", "2024-01-01 10:04:00"),  # dup of 2
        (5, "a third distinct doc", "2024-01-01 10:05:00"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    # two files → two micro-batches; dups straddle the batch boundary
    for i, chunk in enumerate([pdf.iloc[:3], pdf.iloc[3:]]):
        chunk.to_parquet(
            str(d / f"part-{i}.parquet"), index=False, coerce_timestamps="us"
        )
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    deduped = ingest.streaming_dedup(stream)
    ingest.run_available_now(deduped, "dedup_stream")
    got = spark.sql("SELECT * FROM dedup_stream").toPandas()
    assert len(got) == 3  # one survivor per distinct fingerprint
    assert got["fingerprint"].is_unique
    from hikma_engine_spark.functions.text import fingerprint
    from pyspark.sql import functions as F

    batch_fps = {
        r["fp"]
        for r in spark.createDataFrame(pdf)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .collect()
    }
    assert set(got["fingerprint"]) == batch_fps


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


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Three-way sessionization parity: streaming session_window ==
    batch session_window == the lag+cumsum rule (with the matching
    >= gap boundary). Gap 30 min; events spread so every user has
    multiple sessions."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = []
    base = pd.Timestamp("2025-01-01 00:00:00")
    for u in range(5):
        t = base + pd.Timedelta(minutes=7 * u)
        for i in range(20):
            # gaps alternate 5 min (same session) / 45 min (new session)
            t = t + pd.Timedelta(minutes=5 if i % 3 else 45)
            rows.append((u, t, i))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "seq"])
    src = str(tmp_path / "sess_events")
    spark.createDataFrame(pdf).write.parquet(src)

    batch_df = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch_df.schema).parquet(src)
    )
    agg = ingest.streaming_user_sessions(stream, gap="30 minutes")
    ingest.run_available_now(agg, "sess_stream", output_mode="complete")
    got = spark.sql("SELECT * FROM sess_stream").toPandas()

    batch_sw = ingest.streaming_user_sessions(batch_df, gap="30 minutes").toPandas()
    key = ["user_id", "session_start", "session_end", "n_events"]

    def norm(p):
        return sorted(map(tuple, p[key].astype(str).values.tolist()))

    assert norm(got) == norm(batch_sw)

    # lag+cumsum twin (>= gap boundary per session_window's exclusive end)
    w = Window.partitionBy("user_id").orderBy("ts", "seq")
    delta = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    lagged = (
        batch_df.withColumn(
            "new_sess", F.when(delta.isNull() | (delta >= 1800), 1).otherwise(0)
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
    )
    a = sorted(
        map(tuple, got[["user_id", "session_start", "n_events"]].astype(str).values.tolist())
    )
    b = sorted(
        map(
            tuple,
            lagged.toPandas()[["user_id", "session_start", "n_events"]]
            .astype(str)
            .values.tolist(),
        )
    )
    assert a == b


def test_streaming_filter_cascade_matches_batch(spark, tmp_path):
    """The quality-filter cascade is a stateless projection, so its
    per-rule ledger under Structured Streaming (complete-mode count
    agg over micro-batches) equals the batch ledger exactly."""
    import pandas as pd

    from hikma_engine_spark.functions.text import filter_cascade_verdict
    from pyspark.sql import functions as F

    d = tmp_path / "docs_cascade"
    d.mkdir()
    rows = [
        (0, "x", "de"),                        # r1
        (1, "w " * 150, "de"),                 # r2
        (2, "1234567890 " * 30, "en"),         # r3
        (3, ("ok tokens here " * 20).strip(), "en"),  # kept
        (4, "y", "en"),                        # r1
        (5, ("fine text words " * 20).strip(), "en"),  # kept
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["n_chars"] = pdf.text.str.len().astype("int64")
    for i, chunk in enumerate([pdf.iloc[:3], pdf.iloc[3:]]):
        chunk.to_parquet(str(d / f"part-{i}.parquet"), index=False)

    schema = "doc_id long, text string, lang string, n_chars long"
    verdict = lambda df: df.groupBy(  # noqa: E731
        filter_cascade_verdict(
            F.col("text"), F.col("lang"), F.col("n_chars")
        ).alias("verdict")
    ).agg(F.count("*").alias("n_docs"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        verdict(stream)
        .writeStream.format("memory")
        .queryName("cascade_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM cascade_stream")
        .toPandas()
        .set_index("verdict")
        .n_docs.to_dict()
    )
    want = (
        verdict(spark.read.parquet(str(d)))
        .toPandas()
        .set_index("verdict")
        .n_docs.to_dict()
    )
    assert got == want == {
        "r1_too_short": 2,
        "r2_not_target_lang": 1,
        "r3_digit_heavy": 1,
        "kept": 2,
    }


def test_streaming_graph_sink_matches_batch_index(spark, corpus_pdf, tmp_path):
    """End-to-end streaming→graph parity: drain the corpus through the
    foreachBatch sink in three micro-batches (conversations DO span
    batches), then byte-digest-compare nodes/edges against a fresh
    batch index of the identical corpus — one indexing code path, two
    execution modes."""
    import hashlib

    from hikma_engine_spark.pipeline import Pipeline
    from hikma_engine_spark.schemas import TRANSCRIPTS

    def digest(df) -> str:
        pdf = df.toPandas()
        pdf = pdf[sorted(pdf.columns)]
        rows = sorted(
            pdf.astype(str).apply(lambda r: "\x1f".join(r.values), axis=1)
        )
        return hashlib.sha256("\n".join(rows).encode()).hexdigest()

    src = tmp_path / "sink_src"
    src.mkdir()
    third = len(corpus_pdf) // 3
    for i, chunk in enumerate(
        [corpus_pdf.iloc[:third], corpus_pdf.iloc[third : 2 * third],
         corpus_pdf.iloc[2 * third :]]
    ):
        chunk.to_parquet(
            str(src / f"part-{i}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    staging = str(tmp_path / "staging")
    p_stream = Pipeline(
        spark, staging, str(tmp_path / "kg_stream"), run_id="sink",
        n_buckets=16,
    )
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ingest.streaming_graph_sink(
        stream, p_stream, staging, checkpoint_dir=str(tmp_path / "ckpt")
    )

    full = tmp_path / "full.parquet"
    corpus_pdf.to_parquet(
        str(full), index=False, coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    p_batch = Pipeline(
        spark, str(full), str(tmp_path / "kg_batch"), run_id="ref",
        n_buckets=16,
    )
    p_batch.run(resume=False)

    for table in ("nodes", "edges"):
        assert digest(p_stream._read(table)) == digest(p_batch._read(table)), table
    # wrong staging dir is rejected up front
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ingest.streaming_graph_sink(stream, p_batch, staging)


def test_streaming_enrich_mentions_matches_batch(spark, stream_dir, tiny_df):
    """Stream-static broadcast join parity: enriched streaming mentions
    equal the same join run in batch; unmatched surfaces survive with
    NULL canonical ids."""
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [("postgres", "ent:postgres", "Technology")],
        ["surface_norm", "canonical_id", "entity_type"],
    )
    stream = ingest.stream_transcripts(spark, stream_dir)
    enriched = ingest.streaming_enrich_mentions(
        ingest.stream_extract_mentions(stream), dim
    )
    ingest.run_available_now(enriched, "enriched_stream")
    got = spark.sql("SELECT * FROM enriched_stream").toPandas()
    want = (
        extract.extract_mentions(tiny_df)
        .join(F.broadcast(dim), "surface_norm", "left")
        .toPandas()
    )
    key = ["conv_id", "turn_idx", "start", "surface_norm", "canonical_id"]
    assert sorted(map(tuple, got[key].fillna("∅").values.tolist())) == sorted(
        map(tuple, want[key].fillna("∅").values.tolist())
    )
    assert (got.canonical_id.notna()).any() and (got.canonical_id.isna()).any()


def test_streaming_rate_alerts_matches_batch(spark, tmp_path):
    """Sliding-window rate alerts: streaming == the identical window()
    agg run in batch, and every alert really has >= threshold events
    inside its pane (replayed in pandas). Burst users alarm; slow
    users never appear."""
    import pandas as pd
    from pyspark.sql import functions as F

    rows = []
    base = pd.Timestamp("2025-01-01 00:00:00")
    for u in range(4):
        if u % 2 == 0:  # burst user: 8 events in 30 s, twice
            for burst in range(2):
                t0 = base + pd.Timedelta(minutes=10 * burst + u)
                rows += [(u, t0 + pd.Timedelta(seconds=3 * i), len(rows))
                         for i in range(8)]
        else:  # slow user: one event per 5 minutes
            rows += [(u, base + pd.Timedelta(minutes=5 * i), len(rows))
                     for i in range(8)]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "seq"])
    src = str(tmp_path / "rate_events")
    spark.createDataFrame(pdf).write.parquet(src)

    batch_df = spark.read.parquet(src)
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    agg = ingest.streaming_rate_alerts(stream, threshold=5)
    ingest.run_available_now(agg, "rate_stream", output_mode="complete")
    got = (
        spark.sql("SELECT * FROM rate_stream")
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    batch = (
        ingest.streaming_rate_alerts(batch_df, threshold=5)
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    assert got.astype(str).equals(batch.astype(str))
    assert set(got.user_id) == {0, 2}  # bursts alarm, slow users don't
    # every alert pane really contains n_events rows
    for _, a in got.iterrows():
        inside = pdf[
            (pdf.user_id == a.user_id)
            & (pdf.ts >= a.window_start)
            & (pdf.ts < a.window_end)
        ]
        assert len(inside) == a.n_events
        assert a.n_events >= 5
