"""Driver-side orchestrator: phases, checkpoint/resume, lineage, metrics.

Analog of the reference's PhaseManager (src/core/PhaseManager.ts:82-228):
- ordered phase list (data_discovery → structure_extraction →
  ai_enrichment → final_assembly ⇒ discover → extract → link →
  materialize)
- skip-if-complete resume (PhaseManager.ts:167-187): a phase whose
  state row says 'completed' and whose output exists is loaded, not
  recomputed
- markPhaseStarted/Completed/Failed bookkeeping (phase_status table ⇒
  ``_pipeline_state`` JSONL, written atomically per phase)
- per-phase AND per-partition metrics (itemsProcessed analog,
  PhaseManager.ts:480-486; per-partition row counts = lineage manifest)

Outputs are parquet directories under ``out_dir`` (with an Iceberg
catalog these become MERGE INTO table writes; deterministic business
keys make either idempotent). Each phase write is atomic at the
directory level: write to ``<name>.tmp`` then rename.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query import cache as query_cache
from .splits import effective_scan_splits
from .stages import discover, extract, link, materialize

PHASES = ("discover", "extract", "link", "materialize")

_OUTPUTS = {
    "discover": ["conversations"],
    "extract": ["mentions"],
    "link": ["links", "same_as"],
    "materialize": ["nodes", "edges"],
}

# Layout is a workload choice (Pipeline(n_buckets=...)):
# - unbucketed (default): fastest full builds — no bucket shuffle before
#   the big writes; incremental runs are not available.
# - bucketed (n_buckets=N): big per-conversation tables are additionally
#   partitioned by hash(conv_id) buckets — the copy-on-write granularity
#   for run_incremental: only buckets touched by changed conversations
#   get rewritten (the parquet-level analog of Iceberg MERGE rewriting
#   only affected data files). Costs ~10-20% on full builds.
_PARTITION_BY_PLAIN = {"nodes": ["node_type"], "edges": ["edge_type"]}
_PARTITION_BY_BUCKETED = {
    "mentions": ["bucket"],
    "nodes": ["node_type", "bucket"],
    "edges": ["edge_type", "bucket"],
}
_BUCKETED = ("mentions", "nodes", "edges")
# node/edge types keyed by conv_id (bucket-surgical); the rest are
# small global dims rewritten wholesale on incremental runs
_PER_CONV_NODE_TYPES = ("Turn", "Mention")
_GLOBAL_NODE_TYPES = ("Conversation", "Entity", "Tool")
_PER_CONV_EDGE_TYPES = ("IN_CONV", "IN_TURN", "REFERS_TO", "MENTIONS", "INVOKES")
_GLOBAL_EDGE_TYPES = ("DEPENDS_ON", "SAME_AS")


def bucket_col(n_buckets: int) -> F.Column:
    return F.pmod(
        F.xxhash64(F.coalesce(F.col("conv_id"), F.lit("∅"))), F.lit(n_buckets)
    ).cast("int")


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def _histogram_from_lineage(per_partition: dict[str, int], prefix: str) -> dict[str, int]:
    """Aggregate per-file lineage counts by partition value (the dirs
    written by partitionBy carry '<col>=<value>/' path segments)."""
    hist: dict[str, int] = {}
    for rel, n in per_partition.items():
        for seg in rel.split(os.sep):
            if seg.startswith(prefix):
                key = seg[len(prefix):]
                hist[key] = hist.get(key, 0) + n
    return hist


def _parquet_file_counts(root: str) -> dict[str, int]:
    """Per-file row counts straight from parquet footers (driver-side
    metadata read — zero Spark jobs). Keys are paths relative to root,
    so partitionBy dirs (node_type=.../) stay visible in the lineage.
    Footers are read with a thread pool — bucketed tables have hundreds
    of files and a serial walk costs seconds per write."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    paths = [
        os.path.join(dirpath, f)
        for dirpath, _dirs, files in os.walk(root)
        for f in files
        if f.endswith(".parquet")
    ]
    if not paths:
        return {}
    with ThreadPoolExecutor(min(32, len(paths))) as ex:
        counts = list(ex.map(lambda p: pq.read_metadata(p).num_rows, paths))
    return {os.path.relpath(p, root): n for p, n in zip(paths, counts)}


@dataclass
class PipelineResult:
    run_id: str
    out_dir: str
    phase_stats: dict[str, dict] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)
    elapsed_sec: float = 0.0


class StateStore:
    """``_pipeline_state`` — JSONL of phase status rows (schema mirrors
    phase_status, src/persistence/models/PhaseStatusModel.ts:9-27)."""

    def __init__(self, out_dir: str) -> None:
        import threading

        self.path = os.path.join(out_dir, "_pipeline_state", "state.jsonl")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        # concurrent phases (discover ∥ extract) append from two
        # threads; a stats row with a big lineage map can exceed the
        # atomic-append size, so serialize writers
        self._lock = threading.Lock()

    def rows(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def append(self, row: dict) -> None:
        with self._lock, open(self.path, "a") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")

    def status(self, run_id: str, phase: str) -> str | None:
        """Latest status for (run, phase); any run counts — outputs are
        keyed by deterministic ids, so a completed phase from a prior
        run is equally valid (INSERT OR REPLACE semantics)."""
        row = self.latest(phase)
        return row["status"] if row else None

    def latest(self, phase: str) -> dict | None:
        """Latest state row for a phase (status + the input watermark it
        was computed against — resume compares both, mirroring the
        reference's IndexingStrategy watermark check before skipping)."""
        row = None
        for r in self.rows():
            if r["phase_name"] == phase:
                row = r
        return row

    def watermark(self) -> str | None:
        wm = None
        for r in self.rows():
            if r.get("watermark"):
                wm = r["watermark"]
        return wm


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        transcripts_path: str,
        out_dir: str,
        run_id: str = "run-0",
        n_buckets: int | None = None,
    ) -> None:
        self.spark = spark
        self.transcripts_path = transcripts_path
        self.out_dir = out_dir
        self.run_id = run_id
        self.n_buckets = n_buckets  # None → unbucketed layout (full-build speed)
        self.partition_by = (
            _PARTITION_BY_BUCKETED if n_buckets else _PARTITION_BY_PLAIN
        )
        os.makedirs(out_dir, exist_ok=True)
        self.state = StateStore(out_dir)
        self._needs_rebalance: bool | None = None

    # ---- IO helpers ----
    def _path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _exists(self, name: str) -> bool:
        p = self._path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    def _write(self, df: DataFrame, name: str) -> dict:
        """Atomic parquet write + per-partition lineage counts.

        Lineage counts are computed from the *written files* (cheap
        metadata-only scan), not from the input plan — counting the
        plan itself would re-execute every upstream UDF a second time.
        """
        tmp = self._path(name) + ".tmp"
        final = self._path(name)
        df = self._prep_for_write(df, name)
        writer = df.write.mode("overwrite")
        if name in self.partition_by:
            writer = writer.partitionBy(*self.partition_by[name])
        writer.parquet(tmp)
        if not _parquet_file_counts(tmp) and name in self.partition_by:
            # a partitioned write of zero rows emits no files at all —
            # rewrite unpartitioned so the table keeps a readable schema
            df.limit(0).write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        per_part = _parquet_file_counts(final)
        return {
            "rows": sum(per_part.values()),
            "partitions": len(per_part),
            "per_partition": per_part,
        }

    def _prep_for_write(self, df: DataFrame, name: str) -> DataFrame:
        """In bucketed layout, bucketed tables get the conv-hash bucket
        column and are repartitioned so each task owns whole buckets
        (bounds file count: one file per (partition values × bucket))."""
        if self.n_buckets and name in _BUCKETED and "bucket" not in df.columns:
            df = df.withColumn("bucket", bucket_col(self.n_buckets))
            df = df.repartition(self.n_buckets, "bucket")
        return df

    def _read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def _input_watermark(self, path: str | None = None) -> str:
        """Cheap input-change signal (analog of last_indexed_commit,
        src/persistence/db/connection.ts:262-287): max mtime across the
        input's files — directories of parquet parts included. Content
        hashes (the strong signal) drive run_incremental; this guards
        run(resume=True) against silently serving stale outputs."""
        p = path or self.transcripts_path
        if os.path.isdir(p):
            stats = [
                os.stat(os.path.join(dp, f))
                for dp, _dirs, files in os.walk(p)
                for f in files
            ] or [os.stat(p)]
        else:
            stats = [os.stat(p)]
        # nanosecond mtime + file count + total bytes: whole-second
        # truncation let a rewrite within the same second as the
        # recorded watermark serve stale outputs on resume
        mt_ns = max(st.st_mtime_ns for st in stats)
        return f"{mt_ns}:{len(stats)}:{sum(st.st_size for st in stats)}"

    # ---- phase bodies ----
    def transcripts(self, keys: tuple[str, ...] = ("conv_id", "turn_idx")) -> DataFrame:
        """Input scan, rebalanced for the UDF-heavy stages.

        Small local corpora arrive as a single parquet split; the
        extraction/embedding pandas UDFs are CPU-bound per row, so a
        one-split input would serialize them on one core. Hash-
        repartitioning on (conv_id, turn_idx) spreads rows evenly —
        including the rows of pathological 10k-turn conversations
        (extraction is per-turn, so no co-location is needed). On a
        real cluster the input already has ≥ parallelism splits and
        this is a no-op. Discover passes keys=("conv_id",) so its
        groupBy(conv_id) REUSES this exchange (Catalyst sees the
        hashpartitioning requirement already satisfied — one shuffle,
        not two).

        The trigger is ROW-GROUP aware (splits.effective_scan_splits):
        getNumPartitions() counts byte-range splits, which Spark pads
        to defaultParallelism even when a single row group puts every
        row in one task — the round-2 guard was fooled exactly this way
        and serialized the whole extract+embed path on one core.
        """
        df = self.spark.read.parquet(self.transcripts_path)
        target = self.spark.sparkContext.defaultParallelism
        if self._needs_rebalance is None:
            # decided once per Pipeline instance: the probe costs one
            # tiny job (DF→RDD conversion) and every phase calls
            # transcripts() — the input path cannot change under a run
            # (the watermark guard recomputes stale phases anyway)
            self._needs_rebalance = effective_scan_splits(df, target) < target
        if self._needs_rebalance:
            df = df.repartition(target, *keys)
        return df

    def _run_discover(self) -> dict:
        t = self.transcripts(keys=("conv_id",))
        stats = {"conversations": self._write(discover.conversations_dim(t), "conversations")}
        # duplicate-key validation from the written dim (n_turns vs
        # distinct turn_idx count). Spark-side: one metadata-cheap job
        # over the just-written parquet — never the whole dim in driver
        # memory (at 100x the dim is billions of rows).
        n_bad = (
            self._read("conversations")
            .filter(F.col("n_turns") != F.col("n_distinct_turns"))
            .limit(1)
            .count()
        )
        if n_bad:
            raise ValueError(
                "duplicate (conv_id, turn_idx) keys detected in conversations dim"
            )
        return stats

    def _run_extract(self) -> dict:
        """Mention detection (the expensive UDF pass) is the extract
        phase's materialized output; triple assembly is a cheap
        projection over it and is folded into materialize — writing the
        triple set twice (triples + edges) would double the pipeline's
        largest IO volume for no resume benefit."""
        t = self.transcripts()
        mentions = extract.extract_mentions(t)
        return {"mentions": self._write(mentions, "mentions")}

    def _run_link(self) -> dict:
        mentions = self._read("mentions")
        links = link.build_links(mentions)
        stats = {"links": self._write(links, "links")}
        stats["same_as"] = self._write(link.same_as_edges(self._read("links")), "same_as")
        return stats

    def _run_materialize(self) -> dict:
        t = self.transcripts()
        mentions = self._read("mentions")
        triples = extract.assemble_triples(t, mentions)
        edges = materialize.build_edges(triples, self._read("same_as"))
        # Node build, branch by branch so each pays only its own cost:
        # - Turn nodes: bucket-shuffle the COMPACT text rows first, embed
        #   post-shuffle (vectors never cross the exchange), one branch-
        #   level UDF — a when()-guarded UDF over the full union would
        #   still evaluate on every row (Spark extracts pandas UDFs into
        #   an unconditional projection)
        # - Mention nodes: reuse the bucket lineage of the mentions scan
        # - Global dims (Conversation/Entity/Tool): tiny; one small
        #   shuffle bounds their output file count
        if not self.n_buckets:
            # unbucketed layout: single build, embeddings inline, no
            # pre-write shuffle — and the edges/nodes writes are two
            # INDEPENDENT jobs submitted from two threads (supported by
            # the Spark scheduler; on a cluster, concurrent jobs fill
            # executor gaps the other job's stage tails leave). Tool
            # nodes read the in-memory INVOKES triple slice instead of
            # the written edges table precisely to break the only
            # edges→nodes dependency; the slice recompute is paid inside
            # the overlapped wall time, which is cheaper than a serial
            # edges-commit barrier at every parallelism level measured.
            nodes = materialize.build_nodes(
                t,
                self._read("conversations"),
                mentions,
                None,
                self._read("links"),
                tool_ids=materialize.tool_source_ids(t, mentions),
            )
            from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

            with ThreadPoolExecutor(2) as pool:
                f_edges = pool.submit(self._write, edges, "edges")
                f_nodes = pool.submit(self._write, nodes, "nodes")
                stats = {"edges": f_edges.result(), "nodes": f_nodes.result()}
        else:
            # bucketed layout keeps the sequential edges-then-nodes order
            # (the incremental COW machinery depends on committed edges)
            stats = {"edges": self._write(edges, "edges")}
            from .functions.embeddings import embed_udf  # noqa: PLC0415
            from .stages.materialize import _NODE_COLS  # noqa: PLC0415

            bcol = bucket_col(self.n_buckets)
            links_df = self._read("links")
            edges_df = self._read("edges")
            turn_b = (
                materialize.turn_nodes(t, embed=False)
                .withColumn("bucket", bcol)
                .repartition(self.n_buckets, "bucket")
                .withColumn("embedding", embed_udf(F.col("source_text")))
            )
            mention_b = materialize.mention_nodes(mentions, links_df).withColumn(
                "bucket", bcol
            )
            glob = (
                materialize.conversation_nodes(self._read("conversations"))
                .unionByName(
                    materialize.entity_nodes(links_df, mentions, embed=True)
                )
                .unionByName(materialize.tool_nodes(edges_df))
                .withColumn("bucket", bcol)
                .repartition(min(self.n_buckets, 8), "bucket")
            )
            cols = [*_NODE_COLS, "bucket"]
            nodes = (
                turn_b.select(*cols)
                .unionByName(mention_b.select(*cols))
                .unionByName(glob.select(*cols))
            )
            stats["nodes"] = self._write(nodes, "nodes")
        # node/edge-type histograms (A2 metrics) — free from the
        # partitionBy directory layout + footer counts, no Spark job
        stats["node_types"] = _histogram_from_lineage(
            stats["nodes"]["per_partition"], "node_type="
        )
        stats["edge_types"] = _histogram_from_lineage(
            stats["edges"]["per_partition"], "edge_type="
        )
        return stats

    # ---- orchestration ----
    def run(self, resume: bool = True, stop_after: str | None = None) -> PipelineResult:
        bodies = {
            "discover": self._run_discover,
            "extract": self._run_extract,
            "link": self._run_link,
            "materialize": self._run_materialize,
        }
        result = PipelineResult(run_id=self.run_id, out_dir=self.out_dir)
        t0 = time.time()
        # same stale-plan-cache guard as run_incremental: a cached plan
        # from an earlier run over this out_dir would serve pre-rewrite
        # file contents after phases overwrite their tables
        self.spark.catalog.clearCache()
        query_cache.invalidate_all()
        watermark = self._input_watermark()

        def state_row(phase: str, status: str, started: str, stats: dict) -> None:
            self.state.append(
                {
                    "run_id": self.run_id,
                    "phase_name": phase,
                    "partition_id": None,
                    "status": status,
                    "started_at": started,
                    "completed_at": None if status == "running" else _now(),
                    "watermark": watermark,
                    "stats": stats,
                }
            )

        def exec_phase(phase: str) -> None:
            started = _now()
            state_row(phase, "running", started, {})
            try:
                stats = bodies[phase]()
            except Exception:
                state_row(phase, "failed", started, {})
                raise
            result.phase_stats[phase] = stats
            state_row(phase, "completed", started, stats)

        # skip only when a phase completed AGAINST THE SAME INPUT:
        # a completed row with a different watermark means the
        # transcripts changed since — recompute (reference:
        # IndexingStrategy compares last_indexed_commit before
        # deciding to skip, src/core/indexing/IndexingStrategy.ts:15-75)
        pending: list[str] = []
        for phase in PHASES:
            outputs_ok = all(self._exists(o) for o in _OUTPUTS[phase])
            latest = self.state.latest(phase)
            fresh = (
                latest is not None
                and latest["status"] == "completed"
                and latest.get("watermark") == watermark
            )
            if resume and fresh and outputs_ok:
                result.skipped.append(phase)
            else:
                pending.append(phase)
            if phase == stop_after:
                break

        # discover and extract both read ONLY the input transcripts —
        # when both need recompute, run them as concurrent Spark jobs
        # (the scheduler interleaves them; discover's small window agg
        # fills extract's scan/UDF stage tails instead of paying its
        # wall serially). Each still writes its own state rows, so
        # crash/resume semantics are per-phase exactly as before.
        i = 0
        while i < len(pending):
            phase = pending[i]
            if (
                phase == "discover"
                and i + 1 < len(pending)
                and pending[i + 1] == "extract"
            ):
                from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

                with ThreadPoolExecutor(2) as pool:
                    f_d = pool.submit(exec_phase, "discover")
                    f_e = pool.submit(exec_phase, "extract")
                    f_d.result()
                    f_e.result()
                i += 2
                continue
            exec_phase(phase)
            i += 1
        result.elapsed_sec = time.time() - t0
        return result

    # ---- incremental (reference: IndexingStrategy.determine,
    # src/core/indexing/IndexingStrategy.ts:15-75 — compare watermark,
    # process only the changed set, upsert) ----
    def _replace_partition_dirs(
        self, tmp_name: str, final_name: str, rel_dirs: list[str]
    ) -> None:
        """Copy-on-write commit: swap only the named partition dirs of a
        table (the parquet emulation of Iceberg MERGE rewriting only
        affected data files). A missing dir in tmp means the partition
        became empty — the old dir is still removed."""
        tmp, final = self._path(tmp_name), self._path(final_name)
        for rel in rel_dirs:
            dst = os.path.join(final, rel)
            src = os.path.join(tmp, rel)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)

    def _write_tmp(self, df: DataFrame, name: str, table: str) -> str:
        df = self._prep_for_write(df, table)
        tmp = self._path(name)
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").partitionBy(*self.partition_by[table]).parquet(tmp)
        return tmp

    def run_incremental(
        self,
        run_id: str | None = None,
        delta_path: str | None = None,
        deleted_conv_ids: tuple[str, ...] = (),
    ) -> PipelineResult:
        """Re-index only conversations whose content changed.

        Two change-detection modes:

        - **content-hash** (default): rescan the full input, diff
          per-conversation content hashes FULL OUTER against the stored
          dim. O(input) but requires nothing from the producer.
        - **delta-driven** (``delta_path``): the producer hands the FULL
          new row set of every changed/added conversation (the
          reference's changed-files re-read,
          src/core/indexing/IndexingStrategy.ts:15-75; on Iceberg this
          is the snapshot-range incremental read) plus an explicit
          ``deleted_conv_ids`` list. Change detection is O(delta) — the
          unchanged 99.99% of a 100 TB corpus is never rescanned.

        Both modes produce byte-identical results to a full rebuild
        (tested).

        Change detection: per-conversation content_hash from the
        discover dim (stronger than the reference's commit watermark —
        it is content-addressed), via a FULL OUTER join of old vs new
        dim so additions, modifications AND deletions all enter the
        changed set. The expensive per-turn work (regex extraction,
        turn embedding) runs ONLY on changed conversations, AND the
        writes are bucket-surgical copy-on-write: mentions/nodes/edges
        are partitioned by hash(conv_id) buckets, and only buckets
        containing changed conversations (plus small global dims:
        Entity/Tool/Conversation nodes, DEPENDS_ON/SAME_AS edges) are
        rewritten — the parquet emulation of Iceberg MERGE INTO
        rewriting only affected data files (same last-writer-wins
        semantics as the reference's INSERT OR REPLACE,
        GenericRepository.ts:23,64). If re-linking changes any
        canonical mapping, mention buckets containing the affected
        surfaces get their canonical_id refreshed too.

        Crash safety: the OLD conversations dim and links table stay
        committed until every dependent bucket rewrite has landed —
        they are swapped LAST, so a retried run after any mid-run crash
        recomputes the identical changed set from the still-intact old
        dim and repairs the delta idempotently.

        Scale posture: the changed set, links diff and changed-surface
        set stay DataFrames end-to-end; the only driver materializations
        are bucket-id lists (bounded by n_buckets) and scalar counts.
        """
        if not self.n_buckets:
            raise ValueError(
                "run_incremental requires the bucketed layout — construct "
                "Pipeline(..., n_buckets=64) (and build the base tables "
                "with it) so copy-on-write has bucket dirs to swap"
            )
        # deletions are only honored by the delta-driven mode (the
        # content-hash mode derives the changed set purely from the
        # input diff) — silently dropping an explicit deletion list
        # would report success while not honoring the user's intent
        if deleted_conv_ids and delta_path is None:
            raise ValueError(
                "deleted_conv_ids requires delta_path (delta-driven mode); "
                "in content-hash mode deletions are detected from the "
                "input itself — remove the conversations from the input "
                "instead of passing an explicit deletion list"
            )
        # fail fast (before any write) when the stored tables were built
        # WITHOUT the bucketed layout — otherwise the mismatch surfaces
        # as an UNRESOLVED_COLUMN `bucket` crash halfway through
        if "bucket" not in self._read("mentions").columns:
            raise ValueError(
                f"store at {self.out_dir} was built without the bucketed "
                "layout (no bucket column in mentions) — rebuild with "
                f"Pipeline(..., n_buckets={self.n_buckets}).run() before "
                "incremental runs"
            )
        rid = run_id or (self.run_id + "-incr")
        t0 = time.time()
        # drop cached plans from earlier runs: Spark's CacheManager
        # matches by logical plan, so a cache built over THIS out_dir's
        # previous file contents would silently serve stale data after
        # the copy-on-write swaps below (QueryCache entries likewise:
        # their persisted plans reference the pre-swap dirs)
        self.spark.catalog.clearCache()
        query_cache.invalidate_all()
        result = PipelineResult(run_id=rid, out_dir=self.out_dir)
        watermark = self._input_watermark(delta_path)
        started = _now()

        def state_row(status: str, stats: dict) -> None:
            self.state.append(
                {
                    "run_id": rid,
                    "phase_name": "incremental",
                    "partition_id": None,
                    "status": status,
                    "started_at": started,
                    "completed_at": None if status == "running" else _now(),
                    "watermark": watermark,
                    "stats": stats,
                }
            )

        state_row("running", {})
        try:
            if delta_path is not None:
                n_changed = self._run_incremental_delta_body(
                    result, delta_path, deleted_conv_ids
                )
            else:
                n_changed = self._run_incremental_body(result)
        except Exception:
            state_row("failed", {})
            raise
        state_row("completed", {"changed_convs": n_changed})
        result.elapsed_sec = time.time() - t0
        return result

    def _run_incremental_body(self, result: PipelineResult) -> int:
        t_all = self.transcripts()

        # --- discover (full refresh of the cheap dim) + changed set ---
        # new dim goes to a tmp table: change detection must see the OLD
        # files, and the old dim must SURVIVE until all dependent tables
        # commit (on Iceberg the old snapshot stays readable; on raw
        # parquet we sequence the writes instead)
        new_conv = discover.conversations_dim(self.transcripts(keys=("conv_id",)))
        stats_d = self._write(new_conv, "conversations_incr")
        old_hashes = self._read("conversations").select(
            "conv_id", F.col("content_hash").alias("old_hash")
        )
        new_hashes = self._read("conversations_incr").select(
            "conv_id", F.col("content_hash").alias("new_hash")
        )
        changed = (
            new_hashes.join(old_hashes, "conv_id", "full_outer")
            .filter(
                F.col("old_hash").isNull()  # added conversation
                | F.col("new_hash").isNull()  # deleted conversation
                | (F.col("new_hash") != F.col("old_hash"))  # modified
            )
            .select("conv_id")
            .localCheckpoint(eager=True)  # reused ~8x below; never collected
        )
        n_changed = changed.count()
        result.phase_stats["discover"] = {
            "conversations": stats_d,
            "changed_convs": n_changed,
        }

        if n_changed == 0:
            self._swap("conversations_incr", "conversations")
            return 0

        t_changed = t_all.join(
            F.broadcast(changed) if n_changed <= 1_000_000 else changed,
            "conv_id",
            "left_semi",
        )
        return self._incremental_core(result, changed, t_changed, n_changed)

    def _run_incremental_delta_body(
        self,
        result: PipelineResult,
        delta_path: str,
        deleted_conv_ids: tuple[str, ...],
    ) -> int:
        spark = self.spark
        delta = spark.read.parquet(delta_path)
        target = spark.sparkContext.defaultParallelism
        if effective_scan_splits(delta, target) < target:
            delta = delta.repartition(target, "conv_id", "turn_idx")
        # reject ambiguous input up front: a conversation present in the
        # delta AND in the deletion list would otherwise be silently
        # resurrected (rebuilt from its delta rows) — make the producer
        # pick one intent
        if deleted_conv_ids:
            conflict = (
                delta.select("conv_id")
                .filter(F.col("conv_id").isin(list(deleted_conv_ids)))
                .limit(1)
                .collect()
            )
            if conflict:
                raise ValueError(
                    f"conv_id {conflict[0]['conv_id']!r} appears in both "
                    "delta_path and deleted_conv_ids — a deleted "
                    "conversation must not ship delta rows"
                )
        deleted = spark.createDataFrame(
            [(c,) for c in deleted_conv_ids], "conv_id string"
        )
        changed = (
            delta.select("conv_id")
            .distinct()
            .unionByName(deleted)
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_changed = changed.count()
        # merged dim: carry untouched rows, recompute changed convs from
        # the delta (which holds their FULL new row sets); deleted convs
        # are dropped by the anti-join and contribute no new rows
        new_rows = discover.conversations_dim(delta)
        merged_dim = (
            self._read("conversations")
            .join(changed, "conv_id", "left_anti")
            .unionByName(new_rows.select(*self._read("conversations").columns))
        )
        stats_d = self._write(merged_dim, "conversations_incr")
        # delta mode skips content hashing, so a malformed delta (e.g.
        # duplicate (conv_id, turn_idx) rows from a producer that
        # appended instead of replacing) would otherwise corrupt the
        # store undetected until a later full-scan incremental — apply
        # the same dup-key guard _run_discover applies to the full dim
        n_bad = (
            self._read("conversations_incr")
            .filter(F.col("n_turns") != F.col("n_distinct_turns"))
            .limit(1)
            .count()
        )
        if n_bad:
            raise ValueError(
                "duplicate (conv_id, turn_idx) keys in the merged dim — "
                "delta_path must hold the FULL deduplicated row set of "
                "each changed conversation (not an append-only fragment)"
            )
        result.phase_stats["discover"] = {
            "conversations": stats_d,
            "changed_convs": n_changed,
            "mode": "delta",
        }
        if n_changed == 0:
            self._swap("conversations_incr", "conversations")
            return 0
        return self._incremental_core(result, changed, delta, n_changed)

    def _incremental_core(
        self,
        result: PipelineResult,
        changed: DataFrame,
        t_changed: DataFrame,
        n_changed: int,
    ) -> int:
        """Bucket-surgical rewrite shared by both change-detection
        modes: ``changed`` = conv_id DataFrame (incl. deletions),
        ``t_changed`` = the full transcript rows of changed convs."""
        # broadcast the changed set only when it is actually small — a
        # backfill can flip the whole corpus and a forced broadcast of
        # that would OOM the driver on a real cluster
        changed_side = F.broadcast(changed) if n_changed <= 1_000_000 else changed

        bcol = bucket_col(self.n_buckets)
        affected = sorted(
            r["b"] for r in changed.select(bcol.alias("b")).distinct().collect()
        )
        result.phase_stats["discover"]["affected_buckets"] = affected

        # --- extract only changed conversations; bucket-surgical merge ---
        mentions_new = extract.extract_mentions(t_changed).withColumn("bucket", bcol)
        m_old_aff = self._read("mentions").filter(F.col("bucket").isin(affected))
        m_keep = m_old_aff.join(changed_side, "conv_id", "left_anti")
        merged_aff = m_keep.unionByName(mentions_new.select(*m_keep.columns))
        self._write_tmp(merged_aff, "mentions_incr", "mentions")
        self._replace_partition_dirs(
            "mentions_incr", "mentions", [f"bucket={b}" for b in affected]
        )
        result.phase_stats["extract"] = {
            "mentions_rewritten_buckets": len(affected),
            "mentions_rows": sum(
                _parquet_file_counts(self._path("mentions")).values()
            ),
        }

        # --- link globally (cheap: distinct surfaces); diff vs old links
        #     DataFrame-side (exceptAll both ways — never a full collect;
        #     links = distinct surfaces, unbounded under open @-mentions) ---
        mentions = self._read("mentions")
        stats_l = self._write(link.build_links(mentions), "links_incr")
        links_new = self._read("links_incr")
        old_links = self._read("links")
        diff_surfaces = (
            old_links.exceptAll(links_new)
            .unionByName(links_new.exceptAll(old_links))
            .select("surface_norm")
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_diff_surfaces = diff_surfaces.count()
        extra_buckets: list[int] = []
        if n_diff_surfaces:
            extra_buckets = sorted(
                {
                    r["bucket"]
                    for r in mentions.join(
                        diff_surfaces, "surface_norm", "left_semi"
                    )
                    .select("bucket")
                    .distinct()
                    .collect()
                }
                - set(affected)
            )
        result.phase_stats["link"] = {
            "links": stats_l,
            "changed_surfaces": n_diff_surfaces,
        }

        # --- edges: carry unchanged rows of affected buckets, rebuild
        #     changed convs; global edge types rebuilt wholesale ---
        m_changed = mentions.filter(F.col("bucket").isin(affected)).join(
            changed_side, "conv_id", "left_semi"
        )
        triples_changed = extract.assemble_triples(t_changed, m_changed)
        empty_same_as = link.same_as_edges(links_new).limit(0)
        per_conv_new = materialize.build_edges(
            triples_changed.filter(F.col("edge_type") != "DEPENDS_ON"), empty_same_as
        ).withColumn("bucket", bcol)
        e_carried = (
            self._read("edges")
            .filter(
                F.col("edge_type").isin(list(_PER_CONV_EDGE_TYPES))
                & F.col("bucket").isin(affected)
            )
            .join(changed_side, "conv_id", "left_anti")
        )
        # global types from the merged mentions, pre-filtered to the
        # DEPENDS_ON-bearing rows (kind pushdown to the parquet scan —
        # no point exploding the other 99% of mentions)
        dep_triples = extract.assemble_triples(
            t_changed.limit(0),  # schema only — the turn branch is empty
            mentions.drop("bucket").filter(F.col("kind") == "depends_on"),
        ).filter(F.col("edge_type") == "DEPENDS_ON")
        global_edges = materialize.build_edges(
            dep_triples, link.same_as_edges(links_new)
        ).withColumn("bucket", bcol)
        all_edges = (
            e_carried.select(*per_conv_new.columns)
            .unionByName(per_conv_new)
            .unionByName(global_edges)
        )
        self._write_tmp(all_edges, "edges_incr", "edges")
        edge_dirs = [
            f"edge_type={e}/bucket={b}"
            for e in _PER_CONV_EDGE_TYPES
            for b in affected
        ] + [f"edge_type={e}" for e in _GLOBAL_EDGE_TYPES]
        self._replace_partition_dirs("edges_incr", "edges", edge_dirs)
        result.phase_stats.setdefault("materialize", {})["edges_rewritten"] = {
            "per_conv_buckets": len(affected),
            "global_types": list(_GLOBAL_EDGE_TYPES),
        }

        # --- nodes: carry + refresh Turn/Mention in affected buckets,
        #     re-embed only changed convs; global dims rebuilt wholesale ---
        def refresh_canonical(df: DataFrame) -> DataFrame:
            if not n_diff_surfaces:
                return df
            return (
                df.withColumn("surface_norm", F.col("properties")["surface_norm"])
                # links = distinct surfaces, unbounded under open
                # @-mentions — AQE picks broadcast only when small
                .join(links_new, "surface_norm", "left")
                .withColumn(
                    "canonical_id",
                    F.when(
                        (F.col("node_type") == "Mention")
                        & F.col("canonical_norm").isNotNull(),
                        F.concat(F.lit("entity:"), F.col("canonical_norm")),
                    ).otherwise(F.col("canonical_id")),
                )
                .drop("surface_norm", "canonical_norm")
            )

        n_carried = refresh_canonical(
            self._read("nodes")
            .filter(
                F.col("node_type").isin(list(_PER_CONV_NODE_TYPES))
                & F.col("bucket").isin(affected)
            )
            .join(changed_side, "conv_id", "left_anti")
        )
        n_extra = refresh_canonical(
            self._read("nodes").filter(
                (F.col("node_type") == "Mention")
                & F.col("bucket").isin(extra_buckets)
            )
        ) if extra_buckets else None
        n_new = materialize.build_nodes(
            t_changed,
            self._read("conversations_incr").join(
                changed_side, "conv_id", "left_semi"
            ),
            m_changed.drop("bucket"),
            self._read("edges"),
            links_new,
        ).filter(F.col("node_type").isin(list(_PER_CONV_NODE_TYPES))).withColumn(
            "bucket", bcol
        )
        # NOTE: the FULL merged mentions feed the global build — entity
        # nodes carry adjacency aggregates (A7) over the whole corpus;
        # the per-conv branches are pruned away by the node_type filter
        n_global = materialize.build_nodes(
            t_changed.limit(0),
            self._read("conversations_incr"),
            mentions.drop("bucket"),
            self._read("edges"),
            links_new,
        ).filter(F.col("node_type").isin(list(_GLOBAL_NODE_TYPES))).withColumn(
            "bucket", bcol
        )
        all_nodes = (
            n_carried.select(*n_new.columns)
            .unionByName(n_new)
            .unionByName(n_global)
        )
        if n_extra is not None:
            all_nodes = all_nodes.unionByName(n_extra.select(*n_new.columns))
        self._write_tmp(all_nodes, "nodes_incr", "nodes")
        node_dirs = (
            [f"node_type=Turn/bucket={b}" for b in affected]
            + [
                f"node_type=Mention/bucket={b}"
                for b in sorted(set(affected) | set(extra_buckets))
            ]
            + [f"node_type={t}" for t in _GLOBAL_NODE_TYPES]
        )
        self._replace_partition_dirs("nodes_incr", "nodes", node_dirs)
        result.phase_stats["materialize"]["nodes_rewritten"] = {
            "turn_buckets": len(affected),
            "mention_buckets": len(set(affected) | set(extra_buckets)),
            "global_types": list(_GLOBAL_NODE_TYPES),
        }

        # --- commit the change-detection signals LAST: links, then the
        #     conversations dim (the content-hash source). A crash any
        #     time before this point leaves both old tables intact, so a
        #     retry re-detects the same delta and repairs everything. ---
        self._swap("links_incr", "links")
        self._write(link.same_as_edges(self._read("links")), "same_as")
        self._swap("conversations_incr", "conversations")
        return n_changed

    def _swap(self, tmp_name: str, final_name: str) -> None:
        """Replace a table dir with a freshly-written one (the parquet
        emulation of an atomic MERGE commit)."""
        tmp, final = self._path(tmp_name), self._path(final_name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    # ---- maintenance ----
    _COMPACTABLE = ("conversations", "mentions", "links", "same_as", "nodes", "edges")

    def compact(
        self,
        tables: tuple[str, ...] | None = None,
        target_files_per_dir: int = 1,
    ) -> dict:
        """File-compaction maintenance for the COW layout.

        Repeated ``run_incremental`` calls rewrite only the touched
        bucket dirs, and each surgical rewrite leaves its own task
        files — over many deltas a partition dir fragments into small
        files (the classic small-files problem; at cluster scale this
        is the bin-packing rewrite every table format schedules:
        Iceberg ``rewrite_data_files`` / OPTIMIZE). ``compact()``
        rewrites each fragmented table back to one file per
        partition/bucket dir, content-identical (footer row counts
        re-verified BEFORE the swap; byte-level digest equality pinned
        by ``test_incremental.test_compact_preserves_content``),
        using the same atomic tmp-write + swap as every other write.
        Only fragmented tables are touched; query caches invalidated.
        """
        from .query import cache as query_cache

        report: dict[str, dict] = {}
        default_par = self.spark.sparkContext.defaultParallelism
        for name in tables or self._COMPACTABLE:
            path = self._path(name)
            # recover/sweep leftovers of a CRASHED previous compact()
            # before any rewrite decision (r4 advice 5) — otherwise a
            # table that never re-crosses the fragmentation threshold
            # keeps a full stale copy on disk forever:
            # - .compact_old present + table present: crash after the
            #   swap completed but before cleanup → drop the stale copy
            # - .compact_old present + table ABSENT: crash between the
            #   two os.replace calls → the old dir IS the table;
            #   restore it (the documented mid-swap recovery)
            # - .compact_tmp: incomplete rewrite, always safe to drop
            old_dir = path + ".compact_old"
            if os.path.exists(old_dir):
                if not os.path.exists(path):
                    os.replace(old_dir, path)
                else:
                    shutil.rmtree(old_dir)
            tmp_dir = path + ".compact_tmp"
            if os.path.exists(tmp_dir):
                shutil.rmtree(tmp_dir)
            if not os.path.exists(path):
                continue
            before = _parquet_file_counts(path)
            dirs: dict[str, int] = {}
            for rel in before:
                d = os.path.dirname(rel)
                dirs[d] = dirs.get(d, 0) + 1
            if not dirs or max(dirs.values()) <= target_files_per_dir:
                report[name] = {
                    "files_before": len(before),
                    "files_after": len(before),
                    "rewritten": False,
                }
                continue
            rows_before = sum(before.values())
            df = self._read(name)
            # partition layout comes from the DIRS actually on disk
            # (key= segments of the relative file paths), NOT the
            # configured partition_by map: compacting a plain-layout
            # store with --buckets set must not reference a missing
            # bucket column, and compacting a BUCKETED store through a
            # Pipeline built with n_buckets=None must not demote the
            # bucket= dirs to a data column (ADVICE r3)
            disk_cols: list[str] = []
            for rel in before:
                for seg in rel.split(os.sep)[:-1]:
                    if "=" in seg:
                        c = seg.split("=", 1)[0]
                        if c not in disk_cols:
                            disk_cols.append(c)
            cols = [c for c in disk_cols if c in df.columns]
            if cols:
                # hash on the partition columns: every dir's rows land
                # in exactly one task → one file per dir
                df = df.repartition(
                    max(1, min(default_par, len(dirs))), *cols
                )
            else:
                # unpartitioned dim: size by bytes (~128 MB per file)
                total_bytes = sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(path)
                    for f in fs
                )
                df = df.repartition(
                    max(1, min(default_par, total_bytes // (128 << 20) + 1))
                )
            tmp = path + ".compact_tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            writer = df.write.mode("overwrite")
            if cols:
                writer = writer.partitionBy(*cols)
            writer.parquet(tmp)
            after = _parquet_file_counts(tmp)
            rows_after = sum(after.values())
            if rows_after != rows_before:
                shutil.rmtree(tmp)
                raise RuntimeError(
                    f"compact({name}): row count changed "
                    f"{rows_before} → {rows_after}; rewrite aborted, "
                    "original table left untouched"
                )
            # crash-safe swap (ADVICE r3): keep a readable table at
            # every crash point — park the old dir, move the new one
            # in, THEN delete the old. A crash between the first two
            # steps leaves path absent only for the duration of one
            # rename (vs the full rmtree before), and the .old dir
            # still holds the data for manual recovery.
            old = path + ".compact_old"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.replace(path, old)
            os.replace(tmp, path)
            shutil.rmtree(old)
            report[name] = {
                "files_before": len(before),
                "files_after": len(after),
                "rows": rows_after,
                "rewritten": True,
            }
        query_cache.invalidate_all()
        self.spark.catalog.clearCache()
        self.state.append(
            {
                "phase_name": "compact",
                "status": "completed",
                "run_id": self.run_id,
                "completed_at": _now(),
                "stats": report,
            }
        )
        return report

    # convenience readers
    def nodes(self) -> DataFrame:
        return self._read("nodes")

    def edges(self) -> DataFrame:
        return self._read("edges")
