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

from .stages import discover, extract, link, materialize

PHASES = ("discover", "extract", "link", "materialize")

_OUTPUTS = {
    "discover": ["conversations"],
    "extract": ["mentions"],
    "link": ["links", "same_as"],
    "materialize": ["nodes", "edges"],
}

_PARTITION_BY = {"nodes": ["node_type"], "edges": ["edge_type"]}


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
    so partitionBy dirs (node_type=.../) stay visible in the lineage."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = pq.read_metadata(p).num_rows
    return out


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
        self.path = os.path.join(out_dir, "_pipeline_state", "state.jsonl")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

    def rows(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def append(self, row: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")

    def status(self, run_id: str, phase: str) -> str | None:
        """Latest status for (run, phase); any run counts — outputs are
        keyed by deterministic ids, so a completed phase from a prior
        run is equally valid (INSERT OR REPLACE semantics)."""
        st = None
        for r in self.rows():
            if r["phase_name"] == phase:
                st = r["status"]
        return st

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
    ) -> None:
        self.spark = spark
        self.transcripts_path = transcripts_path
        self.out_dir = out_dir
        self.run_id = run_id
        os.makedirs(out_dir, exist_ok=True)
        self.state = StateStore(out_dir)

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
        writer = df.write.mode("overwrite")
        if name in _PARTITION_BY:
            writer = writer.partitionBy(*_PARTITION_BY[name])
        writer.parquet(tmp)
        if not _parquet_file_counts(tmp) and name in _PARTITION_BY:
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

    def _read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

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
        """
        df = self.spark.read.parquet(self.transcripts_path)
        target = self.spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target, *keys)
        return df

    def _run_discover(self) -> dict:
        t = self.transcripts(keys=("conv_id",))
        stats = {"conversations": self._write(discover.conversations_dim(t), "conversations")}
        # duplicate-key validation from the written dim (n_turns vs
        # distinct turn_idx count — no extra pass over the input)
        import pandas as pd  # noqa: PLC0415

        dim = pd.read_parquet(self._path("conversations"))
        bad = dim[dim.n_turns != dim.n_distinct_turns]
        if len(bad):
            raise ValueError(
                f"duplicate (conv_id, turn_idx) keys in {len(bad)} conversations"
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
        # edges first: the triple assembly executes exactly once; the
        # node build then reads tool ids from the written edges table
        # (edge_type partition pruning) instead of recomputing triples
        triples = extract.assemble_triples(t, mentions)
        edges = materialize.build_edges(triples, self._read("same_as"))
        stats = {"edges": self._write(edges, "edges")}
        nodes = materialize.build_nodes(
            t,
            self._read("conversations"),
            mentions,
            self._read("edges"),
            self._read("links"),
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
        watermark = str(int(os.path.getmtime(self.transcripts_path)))
        for phase in PHASES:
            outputs_ok = all(self._exists(o) for o in _OUTPUTS[phase])
            if resume and self.state.status(self.run_id, phase) == "completed" and outputs_ok:
                result.skipped.append(phase)
                if phase == stop_after:
                    break
                continue
            started = _now()
            self.state.append(
                {
                    "run_id": self.run_id,
                    "phase_name": phase,
                    "partition_id": None,
                    "status": "running",
                    "started_at": started,
                    "completed_at": None,
                    "watermark": watermark,
                    "stats": {},
                }
            )
            try:
                stats = bodies[phase]()
            except Exception:
                self.state.append(
                    {
                        "run_id": self.run_id,
                        "phase_name": phase,
                        "partition_id": None,
                        "status": "failed",
                        "started_at": started,
                        "completed_at": _now(),
                        "watermark": watermark,
                        "stats": {},
                    }
                )
                raise
            result.phase_stats[phase] = stats
            self.state.append(
                {
                    "run_id": self.run_id,
                    "phase_name": phase,
                    "partition_id": None,
                    "status": "completed",
                    "started_at": started,
                    "completed_at": _now(),
                    "watermark": watermark,
                    "stats": stats,
                }
            )
            if phase == stop_after:
                break
        result.elapsed_sec = time.time() - t0
        return result

    # ---- incremental (reference: IndexingStrategy.determine,
    # src/core/indexing/IndexingStrategy.ts:15-75 — compare watermark,
    # process only the changed set, upsert) ----
    def run_incremental(self, run_id: str | None = None) -> PipelineResult:
        """Re-index only conversations whose content changed.

        Change detection: per-conversation content_hash from the
        discover dim (stronger than the reference's commit watermark —
        it is content-addressed). The expensive per-turn work (regex
        extraction, turn embedding) runs ONLY on changed conversations;
        unchanged rows are carried over. The merge itself is a full
        table rewrite here (parquet); on an Iceberg catalog it becomes
        MERGE INTO keyed by the deterministic ids, same semantics as
        the reference's INSERT OR REPLACE (GenericRepository.ts:23,64).
        """
        rid = run_id or (self.run_id + "-incr")
        t0 = time.time()
        result = PipelineResult(run_id=rid, out_dir=self.out_dir)
        old_conv = self._read("conversations").select(
            "conv_id", F.col("content_hash").alias("old_hash")
        )
        t_all = self.transcripts()

        # --- discover (full refresh of the cheap dim) + changed set ---
        # new dim goes to a tmp table first: the changed-set comparison
        # must see the OLD files (on Iceberg the old snapshot stays
        # readable; on raw parquet we sequence the writes instead)
        new_conv = discover.conversations_dim(self.transcripts(keys=("conv_id",)))
        stats_d = self._write(new_conv, "conversations_incr")
        changed_ids = [
            r["conv_id"]
            for r in (
                self._read("conversations_incr")
                .select("conv_id", "content_hash")
                .join(old_conv, "conv_id", "left")
                .filter(
                    F.col("old_hash").isNull()
                    | (F.col("content_hash") != F.col("old_hash"))
                )
                .select("conv_id")
                .collect()
            )
        ]
        self._swap("conversations_incr", "conversations")
        changed = self.spark.createDataFrame(
            [(c,) for c in changed_ids] or [("__none__",)], "conv_id string"
        )
        n_changed = len(changed_ids)
        result.phase_stats["discover"] = {
            "conversations": stats_d,
            "changed_convs": n_changed,
        }

        # --- extract only changed conversations; merge mentions ---
        t_changed = t_all.join(F.broadcast(changed), "conv_id", "left_semi")
        mentions_new = extract.extract_mentions(t_changed)
        mentions_keep = self._read("mentions").join(
            F.broadcast(changed), "conv_id", "left_anti"
        )
        merged = mentions_keep.unionByName(mentions_new)
        result.phase_stats["extract"] = {
            "mentions": self._write(merged, "mentions_incr")
        }
        self._swap("mentions_incr", "mentions")

        # --- link globally (cheap: distinct surfaces) ---
        mentions = self._read("mentions")
        links = link.build_links(mentions)
        result.phase_stats["link"] = {"links": self._write(links, "links")}
        self._write(link.same_as_edges(self._read("links")), "same_as")

        # --- materialize: recompute edges (projection, no UDF);
        #     carry over unchanged per-conv nodes, re-embed only changed ---
        triples = extract.assemble_triples(t_all, mentions)
        edges = materialize.build_edges(triples, self._read("same_as"))
        result.phase_stats.setdefault("materialize", {})["edges"] = self._write(
            edges, "edges_incr"
        )
        self._swap("edges_incr", "edges")

        links_df = self._read("links")
        old_nodes = self._read("nodes")
        keep_perconv = (
            old_nodes.filter(F.col("node_type").isin("Turn", "Mention"))
            .join(F.broadcast(changed), "conv_id", "left_anti")
        )
        # refresh canonical_id on carried-over mentions (links may have changed)
        keep_refreshed = (
            keep_perconv.withColumn("surface_norm", F.col("properties")["surface_norm"])
            .join(F.broadcast(links_df), "surface_norm", "left")
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
        recomputed = materialize.build_nodes(
            t_changed,
            self._read("conversations").join(F.broadcast(changed), "conv_id", "left_semi"),
            mentions.join(F.broadcast(changed), "conv_id", "left_semi"),
            self._read("edges"),
            links_df,
        ).filter(F.col("node_type").isin("Turn", "Mention"))
        global_nodes = materialize.build_nodes(
            t_changed.limit(0),
            self._read("conversations"),
            mentions.limit(0),
            self._read("edges"),
            links_df,
        ).filter(F.col("node_type").isin("Conversation", "Entity", "Tool"))
        nodes = keep_refreshed.select(*[f.name for f in old_nodes.schema.fields]) \
            .unionByName(recomputed).unionByName(global_nodes)
        result.phase_stats["materialize"]["nodes"] = self._write(nodes, "nodes_incr")
        self._swap("nodes_incr", "nodes")

        self.state.append(
            {
                "run_id": rid,
                "phase_name": "incremental",
                "partition_id": None,
                "status": "completed",
                "started_at": _now(),
                "completed_at": _now(),
                "watermark": str(int(os.path.getmtime(self.transcripts_path))),
                "stats": {"changed_convs": n_changed},
            }
        )
        result.elapsed_sec = time.time() - t0
        return result

    def _swap(self, tmp_name: str, final_name: str) -> None:
        """Replace a table dir with a freshly-written one (the parquet
        emulation of an atomic MERGE commit)."""
        tmp, final = self._path(tmp_name), self._path(final_name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    # convenience readers
    def nodes(self) -> DataFrame:
        return self._read("nodes")

    def edges(self) -> DataFrame:
        return self._read("edges")
