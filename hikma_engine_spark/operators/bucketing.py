"""Bucketed (pre-shuffled, pre-sorted) tables — co-located joins.

The one shuffle-elimination pattern the engine was missing: every
`groupBy`/`join` on a key shuffles UNLESS the data is already
hash-partitioned on that key on disk. `df.write.bucketBy(n, key)`
persists that partitioning in the catalog; every later join or
aggregation on the key reads the buckets co-located and skips the
Exchange entirely. At 100 TB this is THE strategy for dimension/fact
keys that are joined repeatedly (conv_id, entity id, custkey): pay the
shuffle ONCE at ingest, amortize it over every downstream query. We
also `sortBy` the key (and repartition pre-write so each bucket is one
file), but Spark >= 3.0 distrusts on-disk sort order by default
(SPARK-28220 — multi-file buckets made it unsafe; opt back in via
spark.sql.legacy.bucketedTableScan.outputOrdering), so the merge join
keeps an IN-TASK per-bucket Sort. That sort is CPU inside the map
stage over one co-located bucket, not a network shuffle: the scaling
cost that matters (all-to-all data movement) is zero.

Reference analog: the reference keeps SQLite b-tree indexes on its id
columns (src/persistence/db-clients.ts CREATE INDEX) so repeated id
joins never re-sort; bucketing is the distributed-warehouse equivalent.

Scale notes:
- bucket count is the sizing knob: choose so one bucket ≈ 100-500 MB
  (e.g. 10 TB fact / 256 MB ≈ 40k buckets). Both sides of a co-located
  join MUST use the same count (Spark requires it to elide the
  Exchange; since 3.1 a compatible multiple also works with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled).
- bucket pruning: an equality filter on the bucket key scans 1/n of
  the files (Catalyst's BucketScan prunes before IO).
- skew: bucketing hashes the key, so one hot key still lands in one
  bucket — salt first (operators/skew.py) if a key holds >1 bucket of
  rows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _safe_table_name(name: str) -> str:
    out = re.sub(r"[^A-Za-z0-9_]", "_", name)
    if not out or out[0].isdigit():
        out = "t_" + out
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> str:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    The pre-write ``repartition(n_buckets, key)`` makes each bucket a
    single file — the precondition for trusting on-disk sort order if
    a deployment opts into the legacy outputOrdering conf (module
    docstring); without it the scan is still Exchange-free, which is
    the part that matters. Returns the (sanitized) table name to read
    back with ``spark.table``.
    """
    table = _safe_table_name(table)
    spark = df.sparkSession
    # an in-memory catalog forgets tables across sessions while the
    # warehouse directory persists — saveAsTable then refuses the
    # orphaned location. Drop both (Hadoop FS API, scheme-agnostic —
    # works the same against an object store).
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm  # noqa: SLF001
    jsc = spark._jsc  # noqa: SLF001
    wh = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(wh + "/" + table)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)
    writer = (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
    return table


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys with a
    merge-join hint (broadcast would hide the co-location we are
    demonstrating; on a real fact×fact join SMJ is what Catalyst picks
    anyway). The resulting physical plan has ZERO Exchange operators
    feeding the join — pinned by tests/test_round5_ops.py."""
    left = spark.table(_safe_table_name(left_table)).hint("merge")
    right = spark.table(_safe_table_name(right_table))
    return left.join(right, F.col(left_key) == F.col(right_key), "inner")
