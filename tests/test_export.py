"""Training-data export operators: deterministic shuffle/shard,
benchmark decontamination, token-budget sequence packing.

Invariants pinned here (the DuckDB oracles in __spark_entry__ pin
value equality; these pin the CONTRACTS):
- shuffle_shard: seeded determinism, permutation completeness, shard
  balance, seed sensitivity
- decontaminate: exact containment values, eval-side broadcast plan
- pack_sequences: every doc assigned exactly once; no sequence over
  budget unless it is a single oversized doc; sequences are contiguous
  per bucket; deterministic across runs
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hikma_engine_spark.operators import export  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_shuffle_shard_is_deterministic_permutation(spark, docs):
    a = export.shuffle_shard(docs, "doc_id", n_shards=8, seed="s1").toPandas()
    b = export.shuffle_shard(docs, "doc_id", n_shards=8, seed="s1").toPandas()
    key = ["doc_id", "shard", "shuffle_rank"]
    assert a[key].sort_values("doc_id").reset_index(drop=True).equals(
        b[key].sort_values("doc_id").reset_index(drop=True)
    )
    # complete permutation: every doc exactly once, ranks contiguous per shard
    assert sorted(a.doc_id) == sorted(docs.toPandas().doc_id)
    for _, g in a.groupby("shard"):
        assert sorted(g.shuffle_rank) == list(range(1, len(g) + 1))


def test_shuffle_shard_seed_changes_order_and_balances(spark, docs):
    a = export.shuffle_shard(docs, "doc_id", n_shards=8, seed="s1").toPandas()
    c = export.shuffle_shard(docs, "doc_id", n_shards=8, seed="s2").toPandas()
    assert not a.sort_values("doc_id")[["shard", "shuffle_rank"]].reset_index(
        drop=True
    ).equals(c.sort_values("doc_id")[["shard", "shuffle_rank"]].reset_index(drop=True))
    # md5 uniformity: no shard more than 2x the mean on 500 docs
    counts = a.shard.value_counts()
    assert counts.max() <= 2 * len(a) / 8


def test_decontaminate_containment_exact(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 10],
            "txt": [
                # train doc 1 fully contains eval doc 10's text
                "alpha beta gamma delta epsilon zeta eta theta",
                # train doc 2 shares half of eval's shingles
                "gamma delta epsilon unrelated words here now",
                # train doc 3 disjoint
                "totally different content with nothing shared",
                # eval doc: 4 tokens -> 2 distinct 3-shingles
                "beta gamma delta epsilon",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    ev = df.filter(F.col("id") == 10)
    tr = df.filter(F.col("id") != 10)
    got = (
        export.decontaminate(tr, ev, "id", "txt", n=3, containment=0.0)
        .orderBy("doc_id")
        .collect()
    )
    by_doc = {r.doc_id: r.containment for r in got}
    # eval shingles: {"beta gamma delta", "gamma delta epsilon"}
    assert by_doc[1] == 1.0
    assert by_doc[2] == 0.5
    assert 3 not in by_doc
    flagged = export.decontaminate(tr, ev, "id", "txt", containment=0.8).collect()
    assert [r.doc_id for r in flagged] == [1]


def test_decontaminate_eval_side_is_broadcast(spark, docs):
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    tr = docs.filter(F.col("doc_id") % 7 != 0)
    plan = export.decontaminate(tr, ev, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus side must not be exchanged on doc id before the join
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def _packed(spark, docs, budget=256):
    return export.pack_sequences(
        docs, "doc_id", text_col="text", budget=budget, n_buckets=8, seed="pack"
    ).toPandas()


def test_pack_sequences_invariants(spark, docs):
    pdf = _packed(spark, docs)
    assert sorted(pdf.doc_id) == sorted(docs.toPandas().doc_id)  # exactly once
    fills = pdf.groupby(["bucket", "seq_idx"]).n_tokens.agg(["sum", "count"])
    # a sequence over budget must be a single oversized doc
    over = fills[fills["sum"] > 256]
    assert (over["count"] == 1).all()
    # sequence ids are contiguous from 0 per bucket
    for _, g in pdf.groupby("bucket"):
        seqs = sorted(g.seq_idx.unique())
        assert seqs == list(range(len(seqs)))
    # deterministic
    assert pdf.equals(_packed(spark, docs))


def test_pack_sequences_next_fit_order(spark):
    # 1 bucket, known sizes: next-fit over doc order must break exactly
    # at the budget boundary and give an oversized doc its own sequence
    pdf = pd.DataFrame({"id": [1, 2, 3, 4, 5], "tok": [100, 100, 100, 400, 50]})
    df = spark.createDataFrame(pdf)
    got = (
        export.pack_sequences(df, "id", token_col="tok", budget=256, n_buckets=1)
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(got.seq_idx) == [0, 0, 1, 2, 3]


def test_pack_sequences_arg_validation(spark, docs):
    with pytest.raises(ValueError):
        export.pack_sequences(docs, "doc_id")
    with pytest.raises(ValueError):
        export.pack_sequences(docs, "doc_id", text_col="text", token_col="n_chars")


def test_stratified_sample_deterministic_and_partition_invariant(spark, docs):
    rates = {"src0": 1.0, "src1": 0.5}
    a = export.stratified_sample(
        docs, "doc_id", "source", rates, seed="mix", default_rate=0.1
    ).toPandas()
    b = export.stratified_sample(
        docs.repartition(5), "doc_id", "source", rates, seed="mix", default_rate=0.1
    ).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # content-keyed, not positional
    by_src = a.groupby("source").size()
    n_per_src = docs.toPandas().groupby("source").size()
    assert by_src.get("src0", 0) == n_per_src["src0"]  # rate 1.0 keeps all
    assert 0 < by_src.get("src1", 0) < n_per_src["src1"]
    # default-rate strata survive at roughly default_rate
    other = a[~a.source.isin(rates)].shape[0]
    n_other = docs.filter(~F.col("source").isin(*rates)).count()
    assert other < 0.35 * n_other
    # different seed, different survivors
    c = export.stratified_sample(
        docs, "doc_id", "source", rates, seed="mix2", default_rate=0.1
    ).toPandas()
    assert sorted(c.doc_id) != sorted(a.doc_id)


def test_export_ops_empty_inputs(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string, source string")
    one = spark.createDataFrame([(1, "alpha beta gamma delta", "s")],
                                "doc_id bigint, text string, source string")
    # decontaminate: empty corpus / empty eval both yield empty, no error
    assert export.decontaminate(empty, one, "doc_id", "text").count() == 0
    assert export.decontaminate(one, empty, "doc_id", "text").count() == 0
    # shuffle_shard and pack on empty are empty with the right schema
    ss = export.shuffle_shard(empty, "doc_id", n_shards=4)
    assert ss.count() == 0 and {"shard", "shuffle_rank"} <= set(ss.columns)
    pk = export.pack_sequences(empty, "doc_id", text_col="text", budget=10)
    assert pk.count() == 0
    # stratified sample of empty is empty; of one row with rate 1.0 keeps it
    assert export.stratified_sample(empty, "doc_id", "source", {"s": 1.0}).count() == 0
    assert export.stratified_sample(one, "doc_id", "source", {"s": 1.0}).count() == 1


def test_pagerank_empty_and_self_loop_only(spark):
    from hikma_engine_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0
    # pure self-loops filter to an empty graph
    selfy = spark.createDataFrame([("a", "a"), ("b", "b")], "src string, dst string")
    assert pagerank(selfy).count() == 0


def test_write_training_shards_layout_and_manifest(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    m = export.write_training_shards(docs, "doc_id", out, n_shards=8, seed="s")
    assert m["total"] == docs.count()
    assert sum(m["shards"].values()) == m["total"]
    back = spark.read.parquet(out)
    assert back.count() == m["total"]
    # within every shard, file read-back order == shuffle_rank order
    pdf = back.toPandas()
    for shard, g in pdf.groupby("shard"):
        assert sorted(g.shuffle_rank) == list(range(1, len(g) + 1))
    # the written assignment equals the pure query (determinism across
    # the write path)
    q = export.shuffle_shard(docs, "doc_id", n_shards=8, seed="s").toPandas()
    key = ["doc_id", "shard", "shuffle_rank"]
    left = pdf[key].sort_values("doc_id").reset_index(drop=True).astype("int64")
    right = q[key].sort_values("doc_id").reset_index(drop=True).astype("int64")
    assert left.equals(right)
    import json
    import os
    with open(os.path.join(out, "_manifest.json")) as fh:
        assert json.load(fh)["total"] == m["total"]


def test_write_training_shards_spark_manifest_equals_footer_walk(
    spark, docs, tmp_path
):
    """Round-3 verdict item 3: the manifest is now derived Spark-side
    (object-store-portable). verify_footers=True cross-checks the local
    footer walk against the Spark counts and raises on divergence — so
    a green run IS the equality proof; independently re-walk the
    footers here and compare against the returned manifest."""
    import os

    import pyarrow.parquet as pq

    out = str(tmp_path / "shards_v")
    m = export.write_training_shards(
        docs, "doc_id", out, n_shards=8, seed="s", verify_footers=True
    )
    footer_counts: dict[str, int] = {}
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                shard = os.path.basename(root).split("=", 1)[-1]
                footer_counts[shard] = footer_counts.get(shard, 0) + pq.read_metadata(
                    os.path.join(root, f)
                ).num_rows
    assert footer_counts == m["shards"]
    assert sum(footer_counts.values()) == m["total"] == docs.count()


def test_quota_sample_exact_and_equals_naive(spark):
    from pyspark.sql import Window

    from hikma_engine_spark.operators import export

    rows = [(i, "big" if i % 10 else "small") for i in range(3000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    quotas = spark.createDataFrame(
        [("big", 2700, 40), ("small", 300, 1000)],
        ["source", "n_in_stratum", "quota"],
    )
    got = export.quota_sample(df, "doc_id", "source", quotas, seed="s").toPandas()
    by = got.groupby("source").size().to_dict()
    # exact quota for the big stratum; capped at n for the small one
    assert by == {"big": 40, "small": 300}

    # the sliver path selects EXACTLY the quota smallest hashes — same
    # rows as ranking the whole stratum (no sliver)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("s"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / 16**8
    )
    naive = (
        df.join(F.broadcast(quotas), "source")
        .withColumn("_u", u)
        .withColumn(
            "_rk",
            F.row_number().over(Window.partitionBy("source").orderBy("_u", "doc_id")),
        )
        .filter(F.col("_rk") <= F.col("quota"))
        .select("doc_id", "source")
        .toPandas()
    )
    assert sorted(got.doc_id) == sorted(naive.doc_id)

    # content-keyed: repartitioning cannot change the sample
    got2 = export.quota_sample(
        df.repartition(17), "doc_id", "source", quotas, seed="s"
    ).toPandas()
    assert sorted(got2.doc_id) == sorted(got.doc_id)


def test_temperature_quotas_alpha(spark):
    from hikma_engine_spark.operators import export

    rows = [(i, "a" if i < 1600 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    q1 = {
        r["source"]: r["quota"]
        for r in export.temperature_quotas(df, "source", 100, alpha=1.0).collect()
    }
    q05 = {
        r["source"]: r["quota"]
        for r in export.temperature_quotas(df, "source", 100, alpha=0.5).collect()
    }
    # alpha=1 keeps natural proportions; alpha=0.5 boosts the small stratum
    assert q1 == {"a": 80, "b": 20}
    assert q05["b"] > 20 and q05["a"] < 80
    assert q05["a"] + q05["b"] <= 100


def test_chunk_documents_reconstruction_invariant(spark):
    """Dropping the first `overlap` tokens of every chunk after the
    first and concatenating reproduces the exact token stream — the
    no-token-lost/no-token-duplicated contract of sliding-window
    chunking. Also pins: short docs yield one chunk, zero-token docs
    none, consecutive chunks share exactly `overlap` tokens."""
    from hikma_engine_spark.operators.export import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(100))),   # multi-chunk
        (2, " ".join(f"s{i}" for i in range(32))),    # exactly one chunk
        (3, "solo"),                                  # tiny
        (4, "!!! ???"),                               # zero tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ch = chunk_documents(df, "doc_id", "text", chunk_tokens=32, overlap=8)
    got = {}
    for r in ch.collect():
        got.setdefault(r["id"], []).append((r["chunk_id"], r["chunk_text"].split(" ")))
    assert 4 not in got
    assert [c for c, _ in sorted(got[2])] == [0]
    assert got[3] == [(0, ["solo"])]
    for doc, want_n in ((1, 100), (2, 32), (3, 1)):
        chunks = [t for _, t in sorted(got[doc])]
        recon = list(chunks[0])
        for prev, cur in zip(chunks, chunks[1:]):
            assert prev[-8:] == cur[:8]  # exact overlap
            recon.extend(cur[8:])
        assert recon == [w for w, _ in [(f"t{i}", 0) for i in range(100)]][:want_n] or doc != 1
        assert len(recon) == want_n


def test_chunk_documents_param_validation(spark):
    import pytest as _pytest

    from hikma_engine_spark.operators.export import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=16, overlap=16)
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=16, overlap=-1)
