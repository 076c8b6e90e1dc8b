"""Similarity expressions — JVM-side where possible.

Cosine similarity as a pure Column expression (whole-stage codegen,
no Python boundary) — the Spark analog of the reference's
``calculateSimilarity`` (src/modules/embedding-service.ts:729-746) and
its SQLite ``vec_distance_cosine`` extension
(src/persistence/db/vector.ts:40): no extension needed on Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_to_literal(a: Column, vec) -> Column:
    """Cosine of a column against a driver-side vector (broadcast as a
    literal array — the semantic-search hot path, one query vector vs
    all rows; reference: enhanced-search-service.ts:139-171)."""
    lit_vec = F.array(*[F.lit(float(x)) for x in vec])
    return cosine(a, lit_vec)
