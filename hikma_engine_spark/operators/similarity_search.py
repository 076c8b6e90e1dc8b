"""Similarity search (ANN) over an embedding column.

- brute_force_topk: exact cosine top-k — the correctness baseline
  (TakeOrderedAndProject: one scan, no shuffle of the vectors).
- lsh_topk: random-hyperplane bucket ANN — the 100 TB path: the scan
  touches only the query's (multiprobe) buckets. With a bucketed/
  partitioned table the bucket filter becomes partition pruning.
"""

from __future__ import annotations

import math
import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine_to_literal
from .dedup import _hyperplanes

# Hard cap on the hash-block count for the exact blocked-GEMM paths:
# the unordered block-pair grid has n_blocks·(n_blocks+1)/2 rows and is
# broadcast into both sides, so it must stay bounded whatever n is —
# at the cap it's ~525k (ba, bb) int pairs (~8 MB broadcast). Above
# ceil(n / block_size) = cap, the EFFECTIVE block size grows with n
# instead (bigger per-group GEMMs — sliced in 1024-row strips inside
# the worker, so peak memory stays strip × block).
MAX_GEMM_BLOCKS = 1024


def _n_gemm_blocks(n: int, block_size: int) -> int:
    return max(2, min(MAX_GEMM_BLOCKS, -(-n // block_size)))


def _block_pair_grid(spark, n_blocks: int) -> DataFrame:
    """All unordered block pairs (ba ≤ bb), generated DISTRIBUTEDLY
    (spark.range self-join) — never as a driver-side Python list, whose
    construction + createDataFrame would blow the driver long before
    any executor work at large n_blocks (round-4 advice item 3)."""
    ra = spark.range(n_blocks).select(F.col("id").cast("int").alias("ba"))
    rb = spark.range(n_blocks).select(F.col("id").cast("int").alias("bb"))
    return ra.join(rb, F.col("ba") <= F.col("bb"))


def all_pairs_cosine(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int = 5,
    broadcast_limit: int = 100_000,
    block_size: int = 4096,
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — EXACT, two strategies.

    ≤ ``broadcast_limit`` rows: the full normalized matrix is broadcast
    and each Arrow batch GEMMs its rows against it (fastest exact method
    for small sides; one collect, explicitly guarded).

    Above it: fully distributed block-partitioned GEMM — rows are hashed
    into n/block_size blocks, every unordered block pair (i ≤ j) becomes
    one ``applyInPandas`` group holding both blocks' rows, and the numpy
    GEMM runs per group. Nothing touches the driver; shuffle volume is
    the unavoidable O(n²/block_size) row replication of exact all-pairs
    (for sub-quadratic approximate pruning use embedding_near_dup_pairs
    / lsh_topk instead).
    """
    # cheap bounded probe to pick the strategy (same idiom as
    # connected_components / build_links); the full count is paid only
    # on the big-input path, where it sizes the blocks and is a
    # negligible share of the blocked GEMM's cost
    if df.limit(broadcast_limit + 1).count() <= broadcast_limit:
        return _all_pairs_cosine_broadcast(df, threshold, id_col, emb_col, round_digits)
    n = df.count()
    n_blocks = _n_gemm_blocks(n, block_size)
    return _all_pairs_cosine_blocked(
        df, threshold, id_col, emb_col, round_digits, n_blocks
    )


def _all_pairs_cosine_broadcast(
    df: DataFrame, threshold: float, id_col: str, emb_col: str, round_digits: int
) -> DataFrame:
    rows = df.select(id_col, emb_col).collect()
    ids = np.array([r[0] for r in rows])
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(matn)

    def body(batches):
        import pandas as pd  # noqa: PLC0415

        all_ids = b_ids.value
        allm = b_mat.value
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            if len(pdf):
                q = np.array([list(v) for v in pdf[emb_col]], dtype=np.float64)
                qn = np.linalg.norm(q, axis=1)
                qn[qn == 0] = 1.0
                sims = (q / qn[:, None]) @ allm.T
                sims = np.round(sims, round_digits)
                qids = pdf[id_col].to_numpy()
                for i in range(sims.shape[0]):
                    mask = (sims[i] >= threshold) & (all_ids > qids[i])
                    for j in np.nonzero(mask)[0]:
                        out_a.append(qids[i])
                        out_b.append(all_ids[j])
                        out_c.append(sims[i, j])
            yield pd.DataFrame({"a": out_a, "b": out_b, "cos": out_c})

    return df.select(id_col, emb_col).mapInPandas(body, "a long, b long, cos double")


def _all_pairs_cosine_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str,
    emb_col: str,
    round_digits: int,
    n_blocks: int,
) -> DataFrame:
    """Distributed exact all-pairs: hash-blocked pairwise GEMM.

    Each (block_a ≤ block_b) pair is one shuffle group; the GEMM inside
    is sliced over 1024-row strips so the similarity matrix never
    exceeds ~strip x block doubles in one python worker.
    """
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"), F.col(emb_col).alias("emb")
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int"))
    pairs = _block_pair_grid(spark, n_blocks)
    left = base.join(F.broadcast(pairs), base.blk == pairs.ba).select(
        "ba", "bb", "id", "emb", F.lit(0).alias("side")
    )
    right = base.join(F.broadcast(pairs), base.blk == pairs.bb).select(
        "ba", "bb", "id", "emb", F.lit(1).alias("side")
    )
    both = left.unionByName(right)

    def gemm(key, pdf):
        import pandas as pd  # noqa: PLC0415

        ba, bb = key
        a_rows = pdf[pdf["side"] == 0]
        b_rows = a_rows if ba == bb else pdf[pdf["side"] == 1]
        if not len(a_rows) or not len(b_rows):
            return pd.DataFrame({"a": [], "b": [], "cos": []})

        def norm_mat(rows):
            m = np.array([list(v) for v in rows["emb"]], dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0
            return m / nrm[:, None]

        am, bm = norm_mat(a_rows), norm_mat(b_rows)
        aids = a_rows["id"].to_numpy()
        bids = b_rows["id"].to_numpy()
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(aids), 1024):
            sims = np.round(am[s : s + 1024] @ bm.T, round_digits)
            ii, jj = np.nonzero(sims >= threshold)
            xa, xb = aids[s + ii], bids[jj]
            keep = xa < xb if ba == bb else xa != xb
            xa, xb, cs = xa[keep], xb[keep], sims[ii, jj][keep]
            # cross-block pairs arrive once per unordered block pair;
            # normalize to a < b by id
            lo, hi = np.minimum(xa, xb), np.maximum(xa, xb)
            out_a.extend(lo)
            out_b.extend(hi)
            out_c.extend(cs)
        return pd.DataFrame({"a": out_a, "b": out_b, "cos": out_c})

    return both.groupBy("ba", "bb").applyInPandas(gemm, "a long, b long, cos double")


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
    df: DataFrame, emb_col: str = "embedding", n_planes: int | None = 8, seed: int = 7,
    dim: int | None = None, target_bucket_rows: int = 256,
) -> DataFrame:
    """Assign each vector its hyperplane sign bucket (a column an
    Iceberg table would partition/z-order by).

    ``n_planes=None`` auto-scales from a row-count probe (see
    dedup.auto_n_planes) so bucket population tracks
    ``target_bucket_rows`` at any corpus size; the default stays a
    pinned 8 because lsh_topk must be called with the SAME n_planes to
    compute probe buckets — auto-scaling callers should derive the
    count once via auto_n_planes and pass it to both."""
    from .dedup import auto_n_planes

    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    if n_planes is None:
        n_planes = auto_n_planes(df.count(), target_bucket_rows)
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


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 10_000,
    n_iter: int = 5,
    seed: int = 7,
) -> np.ndarray:
    """IVF coarse quantizer: k-means centroids over a BOUNDED sample.

    The sample is DETERMINISTIC: the sample_size rows with the smallest
    xxhash64(id) — a bare limit() would take whichever rows arrive
    first and train different centroids per run/partitioning, breaking
    the repo-wide reruns-are-stable contract. TakeOrdered keeps it one
    bounded job (no global sort materialization); at 100 TB the
    quantizer still trains on the same bounded sample while
    assignment/search stay fully distributed. Lloyd iterations are
    plain numpy; empty cells re-seed deterministically from the sample."""
    rows = (
        df.select(emb_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(sample_size)
        .collect()
    )
    x = np.array([list(r[0]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    x = x / norms[:, None]
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(n_iter):
        sims = x @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                cents[c] = m / n if n > 0 else cents[c]
            else:  # deterministic re-seed for an empty cell
                cents[c] = x[rng.randint(len(x))]
    return cents


def add_ivf_cells(
    df: DataFrame, centroids: np.ndarray, emb_col: str = "embedding"
) -> DataFrame:
    """Assign each vector its nearest-centroid cell id (the IVF
    partition key — an Iceberg table would partition/z-order by it so
    probe queries prune files). Arrow-batched GEMM per batch."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    b_cents = df.sparkSession.sparkContext.broadcast(np.asarray(centroids))

    # no signature annotations: the locally-imported `pd` name is not
    # resolvable when pandas_udf inspects string type hints (PEP 563)
    def _cells(embs):
        cents = b_cents.value
        m = np.array([list(v) for v in embs], dtype=np.float64)
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        sims = (m / nrm[:, None]) @ cents.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    cell_udf = F.pandas_udf(_cells, T.IntegerType())

    return df.withColumn("ivf_cell", cell_udf(F.col(emb_col)))


def ivf_topk(
    df_with_cells: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: score only the ``nprobe`` cells whose centroids
    are nearest the query (with a partitioned/z-ordered table the cell
    filter becomes file pruning). nprobe = n_cells degrades gracefully
    to exact brute force."""
    qv = np.asarray(query_vec, dtype=np.float64)
    n = np.linalg.norm(qv)
    qn = qv / n if n > 0 else qv
    order = np.argsort(-(np.asarray(centroids) @ qn))
    probes = [int(c) for c in order[:nprobe]]
    return (
        df_with_cells.filter(F.col("ivf_cell").isin(probes))
        .withColumn(
            "cosine", F.round(cosine_to_literal(F.col(emb_col), query_vec), 6)
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cosine")
    )


def knn_join_exact(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int = 6,
    broadcast_limit: int = 100_000,
    block_size: int = 4096,
) -> DataFrame:
    """Exact cosine kNN SELF-join: every row's k nearest neighbors
    (a, b, cosine, rank) — the workhorse behind embedding clustering,
    near-dup grouping, and retrieval-index evaluation (one query per
    CORPUS row, vs the one-query ANN operators above).

    Same two-strategy shape as all_pairs_cosine: under
    ``broadcast_limit`` rows the normalized matrix broadcasts and each
    Arrow batch GEMMs + partial-top-ks against it; above it, the
    hash-blocked pairwise GEMM emits a per-(row, block) partial top-k
    (≤ k rows per row per block — the blocked shuffle's output is
    O(n·k·n_blocks), never O(n²)) and a final per-row window keeps the
    global top k. Ranking uses the ROUNDED cosine with id tie-break so
    the result is deterministic and exactly replayable in SQL."""
    # null embeddings (failed encodes) are quarantine rows, not task
    # killers — and they can't be anyone's neighbor
    df = df.filter(F.col(emb_col).isNotNull())
    small = df.limit(broadcast_limit + 1).count() <= broadcast_limit
    if small:
        partials = _knn_partials_broadcast(df, k, id_col, emb_col, round_digits)
    else:
        n = df.count()
        n_blocks = _n_gemm_blocks(n, block_size)
        partials = _knn_partials_blocked(
            df, k, id_col, emb_col, round_digits, n_blocks
        )
    return _knn_rank(partials, k)


def _knn_rank(partials: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("a").orderBy(F.desc("cosine"), F.asc("b"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("a", "b", "cosine", "rank")
    )


def _knn_partials_broadcast(
    df: DataFrame, k: int, id_col: str, emb_col: str, round_digits: int
) -> DataFrame:
    rows = df.select(id_col, emb_col).collect()
    ids = np.array([r[0] for r in rows])
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(matn)

    def body(batches):
        import pandas as pd  # noqa: PLC0415

        all_ids = b_ids.value
        allm = b_mat.value
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            if len(pdf):
                q = np.array([list(v) for v in pdf[emb_col]], dtype=np.float64)
                qn = np.linalg.norm(q, axis=1)
                qn[qn == 0] = 1.0
                sims = np.round((q / qn[:, None]) @ allm.T, round_digits)
                qids = pdf[id_col].to_numpy()
                for i in range(len(qids)):
                    s = sims[i]
                    mask = all_ids != qids[i]
                    cand_ids, cand_s = all_ids[mask], s[mask]
                    if len(cand_ids) > k:
                        # top-k by (-cos, id): argsort on the composite
                        order = np.lexsort((cand_ids, -cand_s))[:k]
                    else:
                        order = np.lexsort((cand_ids, -cand_s))
                    out_a.extend([qids[i]] * len(order))
                    out_b.extend(cand_ids[order])
                    out_c.extend(cand_s[order])
            yield pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_c})

    return df.select(id_col, emb_col).mapInPandas(
        body, "a long, b long, cosine double"
    )


def _knn_partials_blocked(
    df: DataFrame,
    k: int,
    id_col: str,
    emb_col: str,
    round_digits: int,
    n_blocks: int,
) -> DataFrame:
    """Per-(row, block-pair) partial top-k via the same unordered
    block-pair shuffle as _all_pairs_cosine_blocked; each group emits
    ≤ k neighbors for every row of BOTH its blocks."""
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"), F.col(emb_col).alias("emb")
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int"))
    pairs = _block_pair_grid(spark, n_blocks)
    left = base.join(F.broadcast(pairs), base.blk == pairs.ba).select(
        "ba", "bb", "id", "emb", F.lit(0).alias("side")
    )
    right = base.join(F.broadcast(pairs), base.blk == pairs.bb).select(
        "ba", "bb", "id", "emb", F.lit(1).alias("side")
    )
    both = left.unionByName(right)

    def gemm_topk(key, pdf):
        import pandas as pd  # noqa: PLC0415

        ba, bb = key
        a_rows = pdf[pdf["side"] == 0]
        b_rows = a_rows if ba == bb else pdf[pdf["side"] == 1]
        if not len(a_rows) or not len(b_rows):
            return pd.DataFrame({"a": [], "b": [], "cosine": []})

        def norm_mat(rows):
            m = np.array([list(v) for v in rows["emb"]], dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0
            return m / nrm[:, None]

        am, bm = norm_mat(a_rows), norm_mat(b_rows)
        aids = a_rows["id"].to_numpy()
        bids = b_rows["id"].to_numpy()
        out_a, out_b, out_c = [], [], []

        def emit(qids, qm, cids, cm):
            for s in range(0, len(qids), 1024):
                sims = np.round(qm[s : s + 1024] @ cm.T, round_digits)
                for i in range(sims.shape[0]):
                    qi = qids[s + i]
                    mask = cids != qi
                    cand_ids, cand_s = cids[mask], sims[i][mask]
                    order = np.lexsort((cand_ids, -cand_s))[:k]
                    out_a.extend([qi] * len(order))
                    out_b.extend(cand_ids[order])
                    out_c.extend(cand_s[order])

        emit(aids, am, bids, bm)
        if ba != bb:
            emit(bids, bm, aids, am)
        return pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_c})

    return both.groupBy("ba", "bb").applyInPandas(
        gemm_topk, "a long, b long, cosine double"
    )


def knn_join_ivf(
    df_with_cells: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate kNN self-join, IVF-accelerated: each row probes its
    ``nprobe`` nearest cells; candidates are scored per cell by a
    cogrouped Arrow GEMM that emits only a per-(row, cell) partial
    top-k, then a per-row window keeps the global k. Shuffle volume is
    O(n·nprobe) probe rows + O(n) base rows — candidate PAIRS never
    ride the shuffle (a hot cell costs m² numpy FLOPs inside one
    group, not m² shuffled rows). nprobe = n_cells degrades gracefully
    to the exact join. Degenerate corpora (massive identical-vector
    floods) should run exact_duplicates first, same as the LSH dedup
    family."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    df_with_cells = df_with_cells.filter(F.col(emb_col).isNotNull())
    b_cents = df_with_cells.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64)
    )

    def _probe_cells(embs):
        cents = b_cents.value
        m = np.array([list(v) for v in embs], dtype=np.float64)
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        sims = (m / nrm[:, None]) @ cents.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    probe_udf = F.pandas_udf(_probe_cells, T.ArrayType(T.IntegerType()))

    probes = df_with_cells.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("emb"),
        F.explode(probe_udf(F.col(emb_col))).alias("cell"),
    )
    basec = df_with_cells.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("emb"),
        F.col("ivf_cell").alias("cell"),
    )

    def cell_topk(key, qpdf, bpdf):
        if not len(qpdf) or not len(bpdf):
            return pd.DataFrame({"a": [], "b": [], "cosine": []})

        def norm_mat(rows):
            m = np.array([list(v) for v in rows["emb"]], dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0
            return m / nrm[:, None]

        qm, bm = norm_mat(qpdf), norm_mat(bpdf)
        qids = qpdf["id"].to_numpy()
        bids = bpdf["id"].to_numpy()
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(qids), 1024):
            sims = np.round(qm[s : s + 1024] @ bm.T, round_digits)
            for i in range(sims.shape[0]):
                qi = qids[s + i]
                mask = bids != qi
                cand_ids, cand_s = bids[mask], sims[i][mask]
                order = np.lexsort((cand_ids, -cand_s))[:k]
                out_a.extend([qi] * len(order))
                out_b.extend(cand_ids[order])
                out_c.extend(cand_s[order])
        return pd.DataFrame({"a": out_a, "b": out_b, "cosine": out_c})

    # no distinct needed: a base row lives in exactly ONE cell, so a
    # candidate pair (a, b) can only arise in b's cell — once
    partials = (
        probes.groupBy("cell")
        .cogroup(basec.groupBy("cell"))
        .applyInPandas(cell_topk, "a long, b long, cosine double")
    )
    return _knn_rank(partials, k)


def _probe_buckets(base: int, n_planes: int, radius: int) -> list[int]:
    """All bucket ids within Hamming distance ``radius`` of ``base``."""
    from itertools import combinations

    probes = [base]
    for r in range(1, radius + 1):
        for flips in combinations(range(n_planes), r):
            m = 0
            for i in flips:
                m |= 1 << i
            probes.append(base ^ m)
    return probes


def lsh_topk(
    df_with_buckets: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
    probe_radius: int = 1,
) -> DataFrame:
    """ANN top-k: score only buckets within Hamming ``probe_radius`` of
    the query's sign bucket. Recall/pruning knob: radius 1 scans
    ~(1+n)/2^n of the data, radius 2 ~(1+n+n(n-1)/2)/2^n. Uncorrelated
    (worst-case) vectors need a larger radius or fewer planes;
    clustered real embeddings need far less."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    bits = (planes @ qv) > 0
    base = int(sum(1 << i for i, b in enumerate(bits) if b))
    probes = _probe_buckets(base, n_planes, probe_radius)
    return (
        df_with_buckets.filter(F.col("lsh_bucket").isin(probes))
        .withColumn(
            "cosine", F.round(cosine_to_literal(F.col(emb_col), query_vec), 6)
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cosine")
    )


# ---------- int8 quantization (storage/bandwidth path) ----------

def quantize_int8(
    df: DataFrame, emb_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = 127/max|v_i|,
    q_i = floor(v_i·scale + 0.5) ∈ [−127, 127] — the standard
    4×-compression step for billion-vector ANN tables (float32 →
    int8; public FAISS SQ8 / product-quantization family). floor(x+.5)
    instead of round() because its result is identical across engines
    and rounding modes (SQL round() half-up vs banker's differ at .5).

    Pure JVM expression work (transform/array_max) — no UDF, no
    shuffle; at table scale this runs scan-side and the int8 column
    (+ one float scale) is what gets stored/shipped, cutting vector
    I/O 4× — usually the actual ANN bottleneck at 100 TB."""
    v = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    s = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
    return df.withColumn(
        out_col, F.transform(v, lambda x: F.floor(x * s + 0.5).cast("int"))
    )


def int8_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k under int8 quantization on BOTH sides: the
    dot product runs in integer domain (exactly reproducible — no
    float-sum order sensitivity), normalized by the int-vector norms.
    Cosine is scale-invariant, so per-vector scales cancel and the
    only error vs float cosine is the rounding itself (≤ ~1/127 per
    coordinate — measured recall 1.0 vs exact on the test views; the
    e_int8_topk entry asserts ≥ 8/10 in-query)."""
    q = quantize_int8(df, emb_col)
    mx = max(abs(float(x)) for x in query_vec)
    s = 127.0 / mx if mx > 0 else 0.0
    qv = [int(math.floor(float(x) * s + 0.5)) for x in query_vec]
    lit_qv = F.array(*[F.lit(x) for x in qv])
    dot = F.aggregate(
        F.zip_with(F.col("q"), lit_qv, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    norm_b = F.sqrt(
        F.aggregate(
            F.transform(F.col("q"), lambda a: (a * a).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    norm_q = float(sum(x * x for x in qv)) ** 0.5
    return (
        q.withColumn(
            "cosine_q",
            F.when(
                (norm_b > 0) & (F.lit(norm_q) > 0),
                F.round(dot / (norm_b * F.lit(norm_q)), 6),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy(F.desc("cosine_q"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cosine_q")
    )


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 10_000,
    n_iter: int = 8,
    seed: int = 11,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the vector space is
    split into ``m`` equal subspaces and each gets its own ``k``-word
    codebook — storage per vector drops from 4·d bytes (float32) to m
    code ids (m bytes at k ≤ 256), the 100×-class compression that
    makes billion-vector tables RAM-resident (int8 is only 4×; IVF+PQ
    is the canonical FAISS recipe, and the ``ivf_cell`` column this
    module already emits composes directly). Training mirrors
    train_ivf_centroids' determinism contract: bounded sample by
    smallest xxhash64(id) (rerun/partitioning stable), seeded numpy
    Lloyd per subspace, deterministic empty-cluster re-seed. Vectors
    are L2-normalized first, so asymmetric inner-product scoring
    approximates cosine. Returns (m, k, d/m); d % m must be 0."""
    rows = (
        df.select(emb_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(sample_size)
        .collect()
    )
    x = np.array([list(r[0]) for r in rows], dtype=np.float64)
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    x = x / norms[:, None]
    sub_d = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, sub_d), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * sub_d : (j + 1) * sub_d]
        cents = xs[rng.choice(len(xs), size=min(k, len(xs)), replace=False)]
        if len(cents) < k:  # tiny sample: pad deterministically
            cents = np.vstack([cents, xs[rng.randint(len(xs), size=k - len(cents))]])
        for _ in range(n_iter):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
                else:
                    cents[c] = xs[rng.randint(len(xs))]
        books[j] = cents
    return books


def pq_encode(
    df: DataFrame, codebooks: np.ndarray, emb_col: str = "embedding"
) -> DataFrame:
    """Attach the m-byte PQ code: per subspace, the L2-nearest codeword
    id of the normalized vector. Arrow-batched; pure per-row work."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    b_books = df.sparkSession.sparkContext.broadcast(
        np.asarray(codebooks, dtype=np.float64)
    )

    def _encode(embs):
        books = b_books.value
        m, k, sub_d = books.shape
        x = np.array([list(v) for v in embs], dtype=np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = 1.0
        x = x / norms[:, None]
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            xs = x[:, j * sub_d : (j + 1) * sub_d]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    enc = F.pandas_udf(_encode, T.ArrayType(T.IntegerType()))
    return df.filter(F.col(emb_col).isNotNull()).withColumn(
        "pq_code", enc(F.col(emb_col))
    )


def pq_topk(
    df_encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rerank: int | None = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query is NOT
    quantized — a per-subspace lookup table of query-subvector ·
    codeword inner products is baked into the plan as an array LITERAL
    (m×k doubles, the classic ADC table), and each row's score is
    Σ_j LUT[j][code_j], computed ENTIRELY JVM-side with
    zip_with + element_at + aggregate — no UDF, no shuffle, then
    TakeOrderedAndProject. Two-stage by default: ADC selects
    ``k·rerank`` candidates, exact cosine re-scores them (the standard
    IVF+PQ serving shape — ADC reads only the m-byte codes; the
    re-rank touches full vectors for k·rerank rows only). Pass
    ``rerank=None`` for pure-ADC results (scores rounded for
    engine determinism)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, sub_d = books.shape
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    lut = np.empty((m, kk))
    for j in range(m):
        lut[j] = books[j] @ q[j * sub_d : (j + 1) * sub_d]
    luts_col = F.array(
        *[
            F.array(*[F.lit(float(v)) for v in lut[j]])
            for j in range(m)
        ]
    )
    adc = F.round(
        F.aggregate(
            F.zip_with(
                F.col("pq_code"),
                luts_col,
                lambda c, l: F.element_at(l, c + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_digits,
    )
    scored = df_encoded.select(
        F.col(id_col), F.col(emb_col), adc.alias("adc_score")
    )
    if rerank is None:
        return (
            scored.select(id_col, "adc_score")
            .orderBy(F.desc("adc_score"), id_col)
            .limit(k)
        )
    cands = scored.orderBy(F.desc("adc_score"), id_col).limit(k * rerank)
    exact = cosine_to_literal(F.col(emb_col), query_vec)
    return (
        cands.select(id_col, F.round(exact, round_digits).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def hard_negative_join(
    df: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
    broadcast_limit: int = 100_000,
    block_size: int = 4096,
) -> DataFrame:
    """Cross-label kNN self-join — HARD-NEGATIVE MINING for contrastive
    training: for every row, the k nearest neighbors whose ``label``
    DIFFERS (the closest points outside the row's own class are the
    most informative negatives; in-batch random negatives are trivially
    easy once the encoder separates classes at all).

    A plain ``knn_join_exact`` + post-filter is UNSOUND here: the true
    nearest cross-label neighbor can sit at any same-label rank, so no
    fixed over-fetch k' bounds it. The mask must live inside the GEMM —
    same-label candidates are excluded before the partial top-k, which
    keeps the output bound at O(n·k·n_blocks) rows exactly like the
    unconstrained join.

    Strategies mirror knn_join_exact: under ``broadcast_limit`` rows
    the normalized matrix + label vector broadcast and each Arrow
    batch masks then GEMMs; above it, the unordered block-pair grid
    shuffle (distributed grid — never a driver-side list) with the
    label mask applied per block pair. Ranking is on the ROUNDED
    cosine with id tie-break (deterministic, SQL-replayable).

    Returns (a, a_label, b, b_label, cosine, rank), rank 1..k per a.
    """
    df = df.filter(F.col(emb_col).isNotNull())
    small = df.limit(broadcast_limit + 1).count() <= broadcast_limit
    if small:
        partials = _hardneg_partials_broadcast(
            df, k, id_col, emb_col, label_col, round_digits
        )
    else:
        n = df.count()
        n_blocks = _n_gemm_blocks(n, block_size)
        partials = _hardneg_partials_blocked(
            df, k, id_col, emb_col, label_col, round_digits, n_blocks
        )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("a").orderBy(F.desc("cosine"), F.asc("b"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("a", "a_label", "b", "b_label", "cosine", "rank")
    )


_HARDNEG_SCHEMA = (
    "a long, a_label int, b long, b_label int, cosine double"
)


def _hardneg_topk(qids, qlabels, qm, cids, clabels, cm, k, round_digits):
    """Mask-then-GEMM partial top-k: rows of (q) vs candidates (c),
    same-label and self pairs excluded BEFORE ranking."""
    out: list[tuple] = []
    for s in range(0, len(qids), 1024):
        sims = np.round(qm[s : s + 1024] @ cm.T, round_digits)
        for i in range(sims.shape[0]):
            qi, ql = qids[s + i], qlabels[s + i]
            mask = (clabels != ql) & (cids != qi)
            cand_ids, cand_lab, cand_s = cids[mask], clabels[mask], sims[i][mask]
            order = np.lexsort((cand_ids, -cand_s))[:k]
            for j in order:
                out.append((qi, ql, cand_ids[j], cand_lab[j], cand_s[j]))
    return out


def _hardneg_partials_broadcast(
    df: DataFrame,
    k: int,
    id_col: str,
    emb_col: str,
    label_col: str,
    round_digits: int,
) -> DataFrame:
    rows = df.select(id_col, label_col, emb_col).collect()
    ids = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows])
    mat = np.array([list(r[2]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_labels = spark.sparkContext.broadcast(labels)
    b_mat = spark.sparkContext.broadcast(matn)

    def body(batches):
        import pandas as pd  # noqa: PLC0415

        all_ids, all_lab, allm = b_ids.value, b_labels.value, b_mat.value
        for pdf in batches:
            out: list[tuple] = []
            if len(pdf):
                q = np.array([list(v) for v in pdf[emb_col]], dtype=np.float64)
                qn = np.linalg.norm(q, axis=1)
                qn[qn == 0] = 1.0
                out = _hardneg_topk(
                    pdf[id_col].to_numpy(),
                    pdf[label_col].to_numpy(),
                    q / qn[:, None],
                    all_ids,
                    all_lab,
                    allm,
                    k,
                    round_digits,
                )
            yield pd.DataFrame(
                out, columns=["a", "a_label", "b", "b_label", "cosine"]
            )

    return df.select(id_col, label_col, emb_col).mapInPandas(
        body, _HARDNEG_SCHEMA
    )


def _hardneg_partials_blocked(
    df: DataFrame,
    k: int,
    id_col: str,
    emb_col: str,
    label_col: str,
    round_digits: int,
    n_blocks: int,
) -> DataFrame:
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lab"),
        F.col(emb_col).alias("emb"),
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int"))
    pairs = _block_pair_grid(spark, n_blocks)
    left = base.join(F.broadcast(pairs), base.blk == pairs.ba).select(
        "ba", "bb", "id", "lab", "emb", F.lit(0).alias("side")
    )
    right = base.join(F.broadcast(pairs), base.blk == pairs.bb).select(
        "ba", "bb", "id", "lab", "emb", F.lit(1).alias("side")
    )
    both = left.unionByName(right)

    def gemm_topk(key, pdf):
        import pandas as pd  # noqa: PLC0415

        ba, bb = key
        a_rows = pdf[pdf["side"] == 0]
        b_rows = a_rows if ba == bb else pdf[pdf["side"] == 1]
        cols = ["a", "a_label", "b", "b_label", "cosine"]
        if not len(a_rows) or not len(b_rows):
            return pd.DataFrame(columns=cols)

        def norm_mat(rows):
            m = np.array([list(v) for v in rows["emb"]], dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0
            return m / nrm[:, None]

        am, bm = norm_mat(a_rows), norm_mat(b_rows)
        aids, alab = a_rows["id"].to_numpy(), a_rows["lab"].to_numpy()
        bids, blab = b_rows["id"].to_numpy(), b_rows["lab"].to_numpy()
        out = _hardneg_topk(aids, alab, am, bids, blab, bm, k, round_digits)
        if ba != bb:
            out += _hardneg_topk(bids, blab, bm, aids, alab, am, k, round_digits)
        return pd.DataFrame(out, columns=cols)

    return both.groupBy("ba", "bb").applyInPandas(gemm_topk, _HARDNEG_SCHEMA)
