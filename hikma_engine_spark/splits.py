"""Input-split awareness: decide when a scan needs an explicit
repartition before CPU-heavy (UDF) stages.

``df.rdd.getNumPartitions()`` lies for this purpose: Spark bin-packs a
parquet file into ~defaultParallelism BYTE-RANGE splits, but a row
group is the real unit of scan parallelism — every split that doesn't
contain a row-group start is EMPTY. A pandas-written single-row-group
file therefore reports N splits while all rows land in one task, and
everything upstream of the first exchange runs on one core (measured:
the whole extract+embed path of the round-2 bench pipeline was serial
at every parallelism level — local[4] lost ~9 s to it).

The honest probe is driver-side footer metadata: count row groups
across the scan's input files, stopping as soon as ``target`` is
reached — bounded at ``target`` footer reads no matter how many
thousands of files a 100 TB table has.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def effective_scan_splits(df: DataFrame, target: int) -> int:
    """Upper bound on the scan's real task parallelism, capped at
    ``target`` (early stop — this is a threshold probe, not an exact
    count): min(byte-range splits, row groups). Both limits are real —
    Spark schedules one task per byte-range split, but a split only
    carries the row groups whose start falls inside it, so parallelism
    is capped by BOTH the packing (a 20 MB file packs into ~5 splits
    whatever its row-group count) and the layout (a single-row-group
    file yields one non-empty task whatever the split count).

    Falls back to getNumPartitions() when the plan exposes no input
    files (non-scan sources, in-memory DataFrames)."""
    byte_splits = df.rdd.getNumPartitions()
    if byte_splits < target:
        return byte_splits
    try:
        files = df.inputFiles()
    except Exception:
        return byte_splits
    if not files:
        return byte_splits
    import pyarrow.parquet as pq

    n = 0
    for uri in files:
        path = uri[7:] if uri.startswith("file://") else uri
        if not path.endswith(".parquet") or not os.path.exists(path):
            # unknown format — assume one split per file
            n += 1
        else:
            try:
                n += pq.read_metadata(path).num_row_groups
            except Exception:
                n += 1
        if n >= target:
            return min(byte_splits, n)
    return min(byte_splits, n)


def rebalance_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition a scan to defaultParallelism iff its REAL split
    count (row groups, not byte ranges) is below it. No-op on healthy
    inputs — a real cluster table has >= parallelism row groups, so
    this never adds a shuffle there."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if effective_scan_splits(df, target) < target:
        return df.repartition(target, *keys) if keys else df.repartition(target)
    return df
