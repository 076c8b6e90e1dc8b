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

# thresholds calibrated on the alias fixture: true pairs like
# postgres/postgresql sit at J≈0.64 / cos≈0.78; confusable different-
# entity pairs like "apache arrow"/"apache airflow" at J≈0.44 / cos≈0.62
JACCARD_THRESHOLD = 0.50
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


def _build_links_driver(surfaces: list[str]) -> list[tuple[str, str]]:
    """Driver-side twin of the distributed linker for small vocabularies
    (same spec: shingle Jaccard ∨ shingle-embedding cosine ∨ alias map →
    CC → canonical). O(n²) in distinct surfaces — used below the
    threshold where a Spark job graph is pure overhead."""
    import numpy as np  # noqa: PLC0415

    from ..functions.embeddings import embed_tokens  # noqa: PLC0415
    from ..operators.graph import _union_find_local  # noqa: PLC0415

    def shingles(s: str) -> set[str]:
        p = "^" + s.lower() + "$"
        if len(p) < 3:
            return {p}
        return {p[i : i + 3] for i in range(len(p) - 2)}

    alias_map = vocab.surface_to_canonical()
    sh = {s: shingles(s) for s in surfaces}
    emb = {s: embed_tokens(sorted(sh[s])) for s in surfaces}
    pairs: list[tuple[str, str]] = []
    ordered = sorted(surfaces)
    for i, a in enumerate(ordered):
        for b in ordered[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            jac = inter / union if union else 0.0
            cos = float(np.dot(emb[a], emb[b]))
            if jac >= JACCARD_THRESHOLD or cos >= COSINE_THRESHOLD:
                pairs.append((a, b))
        canon = alias_map.get(a)
        if canon and canon != a:
            pairs.append((a, canon))
    comp = _union_find_local(pairs)
    nodes = set(surfaces) | set(comp)
    labeled = {n: comp.get(n, n) for n in nodes}
    # canonical per component: min gazetteer canonical of members, else min member
    by_comp: dict[str, list[str]] = {}
    for n, c in labeled.items():
        by_comp.setdefault(c, []).append(n)
    out = []
    for c, members in by_comp.items():
        gaz = sorted(alias_map[m] for m in members if m in alias_map)
        canonical = gaz[0] if gaz else min(members)
        out.extend((m, canonical) for m in members)
    return sorted(out)


def build_links(mentions: DataFrame, driver_threshold: int = 2_000) -> DataFrame:
    """mentions → links (surface_norm, canonical_norm).

    ≤ ``driver_threshold`` distinct surfaces: driver-side twin (a Spark
    job graph over a few hundred strings is pure scheduler overhead).
    Above it: the distributed LSH → score → CC path. The threshold is
    deliberately low: the driver twin is O(n²) pure Python, so 2,000
    surfaces ≈ 2x10⁶ pair evaluations (well under a second) is the
    point where the distributed path's fixed job-graph latency wins —
    at 20,000 the silent driver cost would be minutes on one core.
    """
    spark = mentions.sparkSession
    surfaces = observed_surfaces(mentions).cache()
    surface_list = [r[0] for r in surfaces.limit(driver_threshold + 1).collect()]
    if len(surface_list) <= driver_threshold:
        rows = _build_links_driver(surface_list)
        schema = "surface_norm string, canonical_norm string"
        if not rows:
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(rows, schema)
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


def alias_only_links(
    mentions: DataFrame, alias_map: dict[str, str] | None = None
) -> DataFrame:
    """Deterministic (SQL-expressible) linking: canonical = gazetteer
    alias-map lookup, identity otherwise — the LSH/CC similarity path
    disabled. This is exactly the reference's resolution model
    (pathToIdMap broadcast lookup, src/core/PhaseManager.ts:298-301 +
    exact signature_hash blocking, src/modules/data-loader.ts:193-197);
    the full build_links is its superset. Used by the oracle-verified
    end-to-end pipeline twin (kg_pipeline_alias_only)."""
    spark = mentions.sparkSession
    amap = alias_map if alias_map is not None else vocab.surface_to_canonical()
    surfaces = observed_surfaces(mentions)
    alias_df = spark.createDataFrame(
        list(amap.items()) or [("", "")], ["surface_norm", "gaz_canonical"]
    )
    return (
        surfaces.join(F.broadcast(alias_df), "surface_norm", "left")
        .select(
            "surface_norm",
            F.coalesce("gaz_canonical", "surface_norm").alias("canonical_norm"),
        )
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
