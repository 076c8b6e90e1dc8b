"""Similarity search (ANN) over an embedding column.

- brute_force_topk: exact cosine top-k — the correctness baseline
  (TakeOrderedAndProject: one scan, no shuffle of the vectors).
- lsh_topk: random-hyperplane bucket ANN — the 100 TB path: the scan
  touches only the query's (multiprobe) buckets. With a bucketed/
  partitioned table the bucket filter becomes partition pruning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine_to_literal
from .dedup import _hyperplanes


def brute_force_topk(
    df: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    return (
        df.withColumn(
            "cosine", F.round(cosine_to_literal(F.col(emb_col), query_vec), 6)
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cosine")
    )


def add_lsh_buckets(
    df: DataFrame, emb_col: str = "embedding", n_planes: int = 8, seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Assign each vector its hyperplane sign bucket (a column an
    Iceberg table would partition/z-order by)."""
    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    # JVM-side: sign bit per plane via aggregate over the array
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        dot_i = F.aggregate(
            F.zip_with(
                F.col(emb_col),
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_i > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket)


def lsh_topk(
    df_with_buckets: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: score only the query's bucket + 1-bit-flip multiprobe
    neighbors (prunes ~ (n_planes+1)/2^n_planes of the data)."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    bits = (planes @ qv) > 0
    base = int(sum(1 << i for i, b in enumerate(bits) if b))
    probes = [base] + [base ^ (1 << i) for i in range(n_planes)]
    return (
        df_with_buckets.filter(F.col("lsh_bucket").isin(probes))
        .withColumn(
            "cosine", F.round(cosine_to_literal(F.col(emb_col), query_vec), 6)
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cosine")
    )
