"""Regenerate PLANS.md — physical-plan evidence for headline operators.

Usage: python tools/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hikma_engine_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def plan(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode  # noqa: SLF001
    )


def main() -> None:
    import __spark_entry__ as e  # noqa: PLC0415
    from hikma_engine_spark.operators import dedup  # noqa: PLC0415
    from hikma_engine_spark.stages import extract  # noqa: PLC0415

    spark = get_spark(cores=8)
    sections = []

    sections.append((
        "q5_nation_revenue — multi-join star query",
        """What to look for: `PushedFilters` on the region scan (r_name = ASIA
reaches parquet), TWO BroadcastHashJoins for the nation/region dims
(no shuffle of the fact side for them), SortMergeJoin only where both
sides are large, and whole-stage codegen spans covering the join
pipeline.""",
        plan(e.q5_nation_revenue(spark, SF)),
    ))
    sections.append((
        "e_cosine_topk — vector top-k",
        """What to look for: `TakeOrderedAndProject` (top-k without a global
sort materialization) directly over the scan+projection — one pass,
no shuffle of the vectors.""",
        plan(e.e_cosine_topk(spark, SF)),
    ))
    t = e._doc_transcripts(spark, SF)  # noqa: SLF001
    m = e._doc_mentions(spark, SF)  # noqa: SLF001
    sections.append((
        "assemble_triples — the KG hot path",
        """What to look for: ZERO Exchange operators in the triple assembly
itself (uniqueness-by-construction: no global dedup aggregation); the
only exchanges belong to the input window. Asserted by
tests/test_plans.py::test_triple_assembly_is_shuffle_free.""",
        plan(extract.assemble_triples(t, m), "simple"),
    ))
    d = spark.read.parquet(f"{SF}/documents.parquet")
    sections.append((
        "ngram_jaccard_pairs — PPJoin prefix filtering",
        """What to look for: the bounded hot-shingle dim built by
TakeOrderedAndProject + BroadcastHashJoin back onto the exploded
shingles (no shuffle of the big side for frequency ordering); ONE
doc-side aggregation for the prefix; candidate equi-join; verification
as plain hash joins + count aggregation (whole-stage codegen — no
interpreted array expressions).""",
        plan(dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8), "simple"),
    ))

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from hikma_engine_spark.operators import similarity_search  # noqa: PLC0415

    qv = [0.1] * 64
    bucketed = similarity_search.add_lsh_buckets(emb.filter("vec_id != 0"))
    sections.append((
        "lsh_topk — ANN bucket pruning",
        """What to look for: the `lsh_bucket IN (...)` probe filter sits
directly above the scan (with a bucketed/partitioned table it becomes
file/partition pruning — only ~probe-set/2^n_planes of the data is
read), then TakeOrderedAndProject for the top-k. The bucket column
itself is JVM-side aggregate/zip_with — no Python in the plan.""",
        plan(similarity_search.lsh_topk(bucketed, qv, k=10, probe_radius=2)),
    ))
    sections.append((
        "structural_search — structure-gate + name-tier CASE rank",
        """What to look for: node-type IN filter and the substring predicate
pushed into the scan's filter stack, the CASE tier as a codegen
projection, and TakeOrderedAndProject (tier, length, id) — no global
sort, no shuffle.""",
        plan(e.s_structural_tier(spark, SF)),
    ))

    from hikma_engine_spark.operators import export  # noqa: PLC0415

    ev = d.filter("doc_id % 7 = 0")
    tr = d.filter("doc_id % 7 != 0")
    sections.append((
        "decontaminate — benchmark n-gram containment scan",
        """What to look for: the eval-shingle dim enters through a
BroadcastExchange (eval suites are tiny beside the corpus), the corpus
side is scan → project/explode → BroadcastHashJoin with NO exchange of
the corpus on doc id before the join, and the (doc, eval) intersection
count is a partial-aggregated hash aggregate. Asserted by
tests/test_export.py::test_decontaminate_eval_side_is_broadcast.""",
        plan(export.decontaminate(tr, ev, "doc_id", "text")),
    ))
    sections.append((
        "shuffle_shard — deterministic export shuffle",
        """What to look for: exactly ONE hashpartitioning Exchange (on the
md5-derived shard id — uniform, so skew-free) followed by a per-shard
window sort. No rangepartitioning, no global sort: the seeded global
permutation is realized shard-locally.""",
        plan(export.shuffle_shard(d, "doc_id", n_shards=8)),
    ))

    cents = similarity_search.train_ivf_centroids(emb, n_cells=8, seed=7)
    wc = similarity_search.add_ivf_cells(emb, cents)
    sections.append((
        "knn_join_ivf — IVF-accelerated kNN self-join (round 4)",
        """What to look for: THREE exchanges total (probe explode by cell,
base by cell, rank by row) — candidate PAIRS never ride a shuffle; the
per-cell GEMM is one FlatMapCoGroupsInPandas; and the rank filter
compiles to WindowGroupLimit with a PARTIAL pass before the final
exchange, so only each partition's top-k rows shuffle. Asserted by
tests/test_plans.py::test_knn_join_plans_use_group_limit_and_bounded_shuffles.""",
        plan(similarity_search.knn_join_ivf(wc, cents, k=5, nprobe=3)),
    ))

    sections.append((
        "g_link_predict — degree-capped CF Jaccard (round 5)",
        """What to look for: the per-part degree dim enters through a
BroadcastExchange (the cap filter makes it part-dim-sized), the capped
bipartite edge set materializes ONCE as an InMemoryTableScan feeding
all three consumers (degree dim + both self-join sides — without it
the lineitem⋈orders distinct re-derives per consumer), the wedge
self-join is the only big-big SortMergeJoin, and the top-50 compiles
to TakeOrderedAndProject.""",
        plan(e.g_link_predict(spark, SF), "simple"),
    ))
    sections.append((
        "kg_fuzzy_match — blocked-levenshtein entity resolution (round 5)",
        """What to look for: the canonical-name master arrives via
BroadcastExchange into a BroadcastHashJoin on the BLOCK key (first
char) — never a BroadcastNestedLoopJoin, despite the length-band and
levenshtein predicates (they stay residual filters above the hash
join); the best-match pick compiles to WindowGroupLimit before the
final window. Asserted by tests/test_contract_queries.py::
test_fuzzy_match_blocked_broadcast_and_recovery.""",
        plan(e.kg_fuzzy_match(spark, SF), "simple"),
    ))

    sections.append((
        "s_phrase_query — positional phrase search (round 5 late)",
        """What to look for: ZERO Join operators — the phrase match is a
per-doc shifted-position-list intersection inside the aggregate's
projection; ONE hashpartitioning Exchange (the groupBy(doc)) fed by a
scan-side filter to the phrase-term set (the pre-shuffle prune), and
TakeOrderedAndProject for the top-k. Asserted by
tests/test_round5_ops.py::test_phrase_match_single_shuffle_no_join.""",
        plan(e.s_phrase_query(spark, SF)),
    ))
    sections.append((
        "d_dialog_pairs — SFT pair extraction (round 5 late)",
        """What to look for: the lag/window assembly rides ONE
hashpartitioning Exchange on conv_id; the corpus-wide response dedup
is a sha256-keyed HashAggregate with a PARTIAL pass (map-side combine
— the hot-boilerplate-response guard) and re-enters as a semi-join,
never a partitionBy(response) window.""",
        plan(e.d_dialog_pairs(spark, SF), "simple"),
    ))

    out = [
        "# PLANS — physical-plan evidence for the headline operators",
        "",
        "Captured by `.explain()` at sf0.01 (plans are size-independent; AQE",
        "re-optimizes stage boundaries at runtime). Regenerate with",
        "`python tools/dump_plans.py`.",
        "",
    ]
    for title, commentary, p in sections:
        out += [f"## {title}", "", commentary, "", "```", p.strip()[:4000], "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
