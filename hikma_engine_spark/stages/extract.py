"""Stage 2 — extract: mention detection + (subj, pred, obj) triple assembly.

Analog of the reference's phase 2 ``structure_extraction``
(src/core/PhaseManager.ts:290-312 → AstParser.parseFiles,
src/modules/ast-parser.ts:145-298: per-document AST visit emitting
entity nodes + CALLS/DEFINED_IN/CONTAINS edges).

Execution shape:
- mention detection runs as ``mapInPandas`` (Arrow-batched; regex spec
  in extraction.py). It is *per-turn* — embarrassingly parallel at row
  granularity, so a 10k-turn conversation causes no skew here (rows of
  one conversation need no co-location for extraction; parallelism
  follows parquet splits, not conv_id).
- triple assembly is pure JVM-side DataFrame code (select/distinct/
  union) over the mention rows — stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extraction import (
    EXTRACTION_SCHEMA,
    KIND_AT,
    KIND_DEPENDS,
    KIND_GAZETTEER,
    KIND_TOOLCALL,
    extract_mentions_batch,
    make_extractor,
)

_TRIPLE_COLS = ["src", "edge_type", "dst", "conv_id", "turn_idx", "rule"]


def _turn_id() -> F.Column:
    return F.concat(F.lit("turn:"), F.col("conv_id"), F.lit("#"), F.col("turn_idx"))


def _mention_id() -> F.Column:
    return F.concat(
        F.lit("mention:"),
        F.col("conv_id"),
        F.lit("#"),
        F.col("turn_idx"),
        F.lit("#"),
        F.col("start"),
    )


def extract_mentions(
    transcripts: DataFrame, surfaces: list[str] | None = None
) -> DataFrame:
    """transcripts → mention rows (1 turn → N matches, flatMap-shaped).

    ``surfaces`` overrides the gazetteer (domain-specific lexicons)."""
    body = extract_mentions_batch if surfaces is None else make_extractor(surfaces)
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        body, EXTRACTION_SCHEMA
    )


def assemble_triples(transcripts: DataFrame, mentions: DataFrame) -> DataFrame:
    """Mentions + transcripts → the raw (pre-canonicalization) triple set.

    Vocabulary (schemas.EDGE_TYPES; analog of the reference's EdgeTypes,
    src/types/index.ts:18-29):
      turn IN_CONV conv | mention IN_TURN turn | mention REFERS_TO entity
      turn MENTIONS entity (distinct per turn) | turn INVOKES tool
      entity DEPENDS_ON entity (SVO rule)
    """
    entity_mentions = mentions.filter(F.col("kind").isin(KIND_GAZETTEER, KIND_AT))

    in_conv = transcripts.select(
        _turn_id().alias("src"),
        F.lit("IN_CONV").alias("edge_type"),
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("dst"),
        "conv_id",
        "turn_idx",
        F.lit("structural").alias("rule"),
    )

    in_turn = entity_mentions.select(
        _mention_id().alias("src"),
        F.lit("IN_TURN").alias("edge_type"),
        _turn_id().alias("dst"),
        "conv_id",
        "turn_idx",
        F.lit("structural").alias("rule"),
    )

    refers_to = entity_mentions.select(
        _mention_id().alias("src"),
        F.lit("REFERS_TO").alias("edge_type"),
        F.concat(F.lit("entity:"), F.col("surface_norm")).alias("dst"),
        "conv_id",
        "turn_idx",
        F.col("kind").alias("rule"),
    )

    mentions_edge = (
        entity_mentions.select("conv_id", "turn_idx", "surface_norm", "kind")
        .groupBy("conv_id", "turn_idx", "surface_norm")
        .agg(F.min("kind").alias("rule"))
        .select(
            _turn_id().alias("src"),
            F.lit("MENTIONS").alias("edge_type"),
            F.concat(F.lit("entity:"), F.col("surface_norm")).alias("dst"),
            "conv_id",
            "turn_idx",
            "rule",
        )
    )

    # INVOKES from the tool column (role='tool' turns) …
    invokes_col = (
        transcripts.filter((F.col("role") == "tool") & F.col("tool").isNotNull())
        .select(
            _turn_id().alias("src"),
            F.lit("INVOKES").alias("edge_type"),
            F.concat(F.lit("tool:"), F.lower(F.col("tool"))).alias("dst"),
            "conv_id",
            "turn_idx",
            F.lit("tool_col").alias("rule"),
        )
    )
    # … and from call:<tool> patterns in text
    invokes_txt = (
        mentions.filter(F.col("kind") == KIND_TOOLCALL)
        .select("conv_id", "turn_idx", "surface_norm")
        .distinct()
        .select(
            _turn_id().alias("src"),
            F.lit("INVOKES").alias("edge_type"),
            F.concat(F.lit("tool:"), F.col("surface_norm")).alias("dst"),
            "conv_id",
            "turn_idx",
            F.lit(KIND_TOOLCALL).alias("rule"),
        )
    )

    depends_on = (
        mentions.filter(F.col("kind") == KIND_DEPENDS)
        .select("conv_id", "turn_idx", "surface_norm", "obj_norm")
        .distinct()
        .select(
            F.concat(F.lit("entity:"), F.col("surface_norm")).alias("src"),
            F.lit("DEPENDS_ON").alias("edge_type"),
            F.concat(F.lit("entity:"), F.col("obj_norm")).alias("dst"),
            "conv_id",
            "turn_idx",
            F.lit(KIND_DEPENDS).alias("rule"),
        )
    )

    parts = [in_conv, in_turn, refers_to, mentions_edge, invokes_col, invokes_txt, depends_on]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*_TRIPLE_COLS)
