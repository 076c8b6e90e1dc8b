"""Stage 3 — link: blocking-based entity linking + CC canonicalization.

Analog of the reference's name-resolution joins + call-graph closure
(pathToIdMap broadcast join src/core/PhaseManager.ts:298-301; callee
resolution src/modules/ast-parser.ts:378-383; transitive closure
ast-parser.ts:398-449), upgraded from exact-match blocking
(signature_hash, src/modules/data-loader.ts:193-197) to the north
rule's pipeline:

  distinct entity surfaces
    → char-3-gram shingles                      (JVM higher-order fns)
    → MinHash/LSH band blocking                 (operators/lsh.py, JVM)
    → candidate-pair scoring: exact Jaccard (JVM) +
      shingle-embedding cosine (Arrow-batched pandas UDF)
    → ∪ deterministic gazetteer alias edges     (broadcast join)
    → connected components (iterative min-label) → canonical ids

Output ``links``: (surface_norm, canonical_norm) for every observed
surface — identity when unlinked. Canonical choice: the gazetteer
canonical if any component member has one, else the lexicographically
smallest member (deterministic; the CC label is already the min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import vocab
from ..extraction import KIND_AT, KIND_GAZETTEER
from ..functions.embeddings import embed_tokens_udf
from ..functions.similarity import cosine
from ..operators import lsh
from ..operators.graph import connected_components

JACCARD_THRESHOLD = 0.40
COSINE_THRESHOLD = 0.75


def observed_surfaces(mentions: DataFrame) -> DataFrame:
    return (
        mentions.filter(F.col("kind").isin(KIND_GAZETTEER, KIND_AT))
        .select("surface_norm")
        .distinct()
    )


def similarity_edges(surfaces: DataFrame) -> DataFrame:
    """LSH-blocked candidate pairs scored by Jaccard + embedding cosine."""
    feats = surfaces.select(
        F.col("surface_norm").alias("s"),
        lsh.char_shingles(F.col("surface_norm")).alias("shingles"),
    ).withColumn("emb", embed_tokens_udf(F.col("shingles")))
    feats = feats.cache()

    cands = lsh.lsh_candidate_pairs(
        feats, id_col="s", shingle_col="shingles", k=32, bands=16, rows=2
    )
    fa = feats.select(
        F.col("s").alias("a"),
        F.col("shingles").alias("sh_a"),
        F.col("emb").alias("emb_a"),
    )
    fb = feats.select(
        F.col("s").alias("b"),
        F.col("shingles").alias("sh_b"),
        F.col("emb").alias("emb_b"),
    )
    scored = (
        cands.join(fa, "a")
        .join(fb, "b")
        .withColumn("jaccard", lsh.jaccard(F.col("sh_a"), F.col("sh_b")))
        .withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
    )
    return (
        scored.filter(
            (F.col("jaccard") >= JACCARD_THRESHOLD)
            | (F.col("cos") >= COSINE_THRESHOLD)
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def alias_edges(surfaces: DataFrame) -> DataFrame:
    """Deterministic gazetteer edges: observed surface → its canonical
    surface (broadcast hash join against the tiny alias dim — the exact
    shape of the reference's pathToIdMap join, PhaseManager.ts:298-301)."""
    spark = surfaces.sparkSession
    alias_map = spark.createDataFrame(
        [(a, c) for a, c in vocab.surface_to_canonical().items()],
        ["surface_norm", "gaz_canonical"],
    )
    return (
        surfaces.join(F.broadcast(alias_map), "surface_norm")
        .filter(F.col("surface_norm") != F.col("gaz_canonical"))
        .select(F.col("surface_norm").alias("src"), F.col("gaz_canonical").alias("dst"))
    )


def build_links(mentions: DataFrame) -> DataFrame:
    """mentions → links (surface_norm, canonical_norm)."""
    spark = mentions.sparkSession
    surfaces = observed_surfaces(mentions).cache()
    edges = similarity_edges(surfaces).unionByName(alias_edges(surfaces))
    comp = connected_components(edges)  # (node, component)

    # every observed surface, linked or not
    all_nodes = surfaces.select(F.col("surface_norm").alias("node")).unionByName(
        comp.select("node")
    ).distinct()
    labeled = all_nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )

    # canonical choice per component: gazetteer canonical of any member, else min member
    alias_map = F.broadcast(
        spark.createDataFrame(
            [(a, c) for a, c in vocab.surface_to_canonical().items()],
            ["node", "gaz_canonical"],
        )
    )
    comp_canon = (
        labeled.join(alias_map, "node", "left")
        .groupBy("component")
        .agg(
            F.min("gaz_canonical").alias("gaz"),
            F.min("node").alias("min_member"),
        )
        .select("component", F.coalesce("gaz", "min_member").alias("canonical_norm"))
    )
    return (
        labeled.join(comp_canon, "component")
        .select(F.col("node").alias("surface_norm"), "canonical_norm")
    )


def same_as_edges(links: DataFrame) -> DataFrame:
    """(entity:surface) SAME_AS (entity:canonical) for merged surfaces."""
    return (
        links.filter(F.col("surface_norm") != F.col("canonical_norm"))
        .select(
            F.concat(F.lit("entity:"), F.col("surface_norm")).alias("src"),
            F.lit("SAME_AS").alias("edge_type"),
            F.concat(F.lit("entity:"), F.col("canonical_norm")).alias("dst"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit("linking").alias("rule"),
        )
    )
