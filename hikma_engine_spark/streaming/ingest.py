"""Structured-Streaming ingestion of transcript turns (optional layer).

The reference is strictly batch (SURVEY.md §2.9 — its "incremental"
mode is a commit-watermark re-run). This module is the optional
streaming front-end the Spark-first design gets almost for free:

- ``stream_transcripts``: file-source stream over a transcripts
  directory with the fixed input schema (no inference in prod).
- ``streaming_mention_counts``: watermarked event-time windowed
  aggregation over detected mentions — late turns beyond the watermark
  are dropped deterministically.
- ``stream_extract_mentions``: the SAME mapInPandas extraction body as
  batch Stage 2 — one extraction spec, two execution modes.

``trigger(availableNow=True)`` turns any of these into an incremental
batch job with exactly-once file-source tracking — the productionized
version of the reference's last_indexed_commit loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extraction import EXTRACTION_SCHEMA, extract_mentions_batch
from ..schemas import TRANSCRIPTS


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def stream_extract_mentions(turns: DataFrame) -> DataFrame:
    """Streaming mention extraction — identical spec to batch Stage 2."""
    return turns.select("conv_id", "turn_idx", "text").mapInPandas(
        extract_mentions_batch, EXTRACTION_SCHEMA
    )


def streaming_mention_counts(
    turns: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Windowed per-entity mention counts with late-data watermarking."""
    mentions = (
        turns.withWatermark("ts", watermark)
        .select("ts", "conv_id", "turn_idx", "text")
        .withColumn(
            "surface_norm",
            F.explode(
                F.expr(
                    # JVM-side gazetteer scan for the streaming agg path
                    # (regexp_extract_all; the UDF path works too but the
                    # windowed agg only needs surfaces, not spans)
                    "regexp_extract_all(lower(text), '(?<![a-z0-9_])("
                    + _sql_gazetteer()
                    + ")(?![a-z0-9_])', 1)"
                )
            ),
        )
        .groupBy(F.window("ts", window), "surface_norm")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "surface_norm",
            "n_mentions",
        )
    )
    return mentions


def streaming_rate_alerts(
    events: DataFrame,
    window: str = "60 seconds",
    slide: str = "15 seconds",
    threshold: int = 5,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sliding-window rate alerting — the live sibling of the
    batch ``ev_sliding_window_max`` audit: per (user, sliding window)
    event counts with only the windows at/over ``threshold`` emitted.
    ``F.window(ts, window, slide)`` is the native sliding-window
    operator (each event lands in window/slide overlapping panes);
    the watermark bounds pane state exactly like the other streaming
    aggs — at stream scale an unwatermarked sliding agg accumulates
    one pane per user per slide forever.

    Semantics note (pinned by the batch-parity test): pane boundaries
    are FIXED (aligned to the epoch grid), so this flags "≥ threshold
    events in some aligned 60-s pane" — the streamable approximation
    of the batch entry's exact "any 60-s window ending at an event"
    RANGE frame. A burst that straddles two panes can need up to 2×
    the events to alarm; the slide narrows that gap (pane grid every
    15 s), which is the standard latency/recall trade for streaming
    rate limits."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= threshold)
        .select(
            user_col,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


def streaming_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup: first-seen document per content
    fingerprint (the SAME ``functions.text.fingerprint`` spec the batch
    ``exact_duplicates`` groups on — one dedup definition, two
    execution modes). ``dropDuplicates`` on the fingerprint is Spark's
    built-in stateful dedup operator; the watermark bounds its state —
    at 10^12 rows an unwatermarked dedup state is the OOM, so the
    contract is "exact within the watermark horizon, re-admitted
    after" (cross-horizon dedup belongs to the batch index path,
    dedup.dedup_index)."""
    from ..functions.text import fingerprint

    return (
        docs.withWatermark(ts_col, watermark)
        .withColumn("fingerprint", fingerprint(F.col(text_col)))
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization via ``F.session_window`` — the native
    Structured Streaming session operator, and the streaming twin of
    the batch lag+cumsum sessionizer (``ev_sessionize``): state is one
    OPEN window per (user, session), merged as events arrive and
    finalized (append mode) once the watermark passes the window end,
    so session state is bounded by the watermark horizon, never by
    stream length.

    Boundary semantics: an event exactly ``gap`` after the previous
    one starts a NEW session (window end is exclusive) — the lag-based
    batch rule must use ``delta >= gap`` to match (pinned by the
    three-way parity test in tests/test_streaming.py).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def _sql_gazetteer() -> str:
    from .. import vocab

    return "|".join(s.replace(" ", r"\\s") for s in vocab.all_surfaces())


CONV_STATE_SCHEMA = "n_turns long, max_turn_idx int, total_chars long"
CONV_PROGRESS_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx int, total_chars long"
)


def streaming_conversation_state(turns: DataFrame) -> DataFrame:
    """Custom stateful operator: per-conversation running accumulator
    via ``applyInPandasWithState`` — the streaming twin of Stage 1's
    conversations dim. State (turn count, max index, char volume)
    persists across micro-batches; each batch that touches a
    conversation emits its updated row (output mode 'update').
    """
    import pandas as pd  # noqa: PLC0415

    def update(key, pdfs, state):
        n, mx, chars = state.get if state.exists else (0, -1, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["turn_idx"].max()))
                chars += int(pdf["text"].fillna("").str.len().sum())
        state.update((n, mx, chars))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n],
                "max_turn_idx": [mx],
                "total_chars": [chars],
            }
        )

    return turns.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=CONV_PROGRESS_SCHEMA,
        stateStructType=CONV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drain everything currently available into an in-memory sink
    (exactly-once per file), then stop — the incremental-batch trigger.
    Windowed aggregations use output_mode='complete' (append would hold
    back open windows until the watermark passes them)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_graph_sink(
    turns_stream: DataFrame,
    pipeline,
    staging_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """foreachBatch bridge from the streaming front-end into the SAME
    graph store the batch pipeline maintains — one indexing code path,
    two execution modes (previously the streaming layer only had
    parity on the extraction/agg operators; this closes the sink).

    Each micro-batch lands under ``staging_dir/batch_id=N`` with
    mode=overwrite — a crash-replayed batch rewrites ITS OWN directory
    and never duplicates rows (the standard foreachBatch exactly-once
    idiom) — then drives ``pipeline.run_incremental()`` over the
    cumulative staging area. Change detection is the pipeline's
    content-hash diff, so replayed or overlapping batches converge to
    the same store (idempotent upsert); the first batch bootstraps
    with a full ``run()``.

    Conversations may SPAN micro-batches, which is exactly why this
    uses content-hash mode (O(cumulative input) rescan) and not delta
    mode: a partial conversation in one batch would violate delta
    mode's full-row-set-per-changed-conversation contract. A producer
    that closes whole conversations per batch can pass each batch as
    ``delta_path`` instead for O(batch) change detection — same store,
    same semantics (pipeline.run_incremental docstring).
    """
    import os

    if os.path.abspath(pipeline.transcripts_path) != os.path.abspath(
        staging_dir
    ):
        raise ValueError(
            "pipeline.transcripts_path must be the staging_dir the sink "
            f"writes ({staging_dir!r}); got {pipeline.transcripts_path!r}"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(staging_dir, f"batch_id={batch_id}")
        )
        if pipeline._exists("conversations"):
            pipeline.run_incremental(run_id=f"stream-{batch_id}")
        else:
            pipeline.run(resume=False)

    writer = turns_stream.writeStream.foreachBatch(_sink).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()


def streaming_enrich_mentions(
    mention_stream: DataFrame,
    entity_dim: DataFrame,
    key: str = "surface_norm",
) -> DataFrame:
    """Stream-static enrichment: left-join each streaming mention
    against a STATIC entity dim (canonical id, type — the Entity rows
    of a built graph store). Structured Streaming re-plans the static
    side per micro-batch, so a dim refreshed on disk is picked up at
    the next trigger without restarting the query; ``broadcast`` pins
    the hash-side to the dim (vocabulary-sized) so the stream side
    never shuffles. Unmatched mentions keep NULL enrichment — they are
    the new-entity signal downstream linking consumes, never dropped.
    """
    return mention_stream.join(F.broadcast(entity_dim), key, "left")
