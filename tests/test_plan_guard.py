"""Plan-regression guard: scale-critical physical-plan properties.

Every case pins a property that makes the operator viable at 100 TB —
no corpus-sized cartesian products, dimension joins staying broadcast,
filters reaching the parquet scan. A refactor that silently flips a
broadcast join to sort-merge or reintroduces an all-pairs product
fails HERE, at sf0.001, instead of in a cluster bill.
"""

from __future__ import annotations

import pytest

from pygrametl_spark.plans.explain import formatted_plan, plan_stats

SF = "/root/testdata/sf0.001"

# query name -> (forbidden physical operators, required plan properties)
CASES = {
    # TPC-H Q1: the shipdate filter must be pushed to the parquet scan.
    "q01_pricing_summary": (["CartesianProduct"], {"pushed_filters": 1}),
    # TPC-H Q5 shape: all five dims broadcast; lineitem never shuffles
    # into a sort-merge join.
    "sql_transforming": (
        ["CartesianProduct", "SortMergeJoin"],
        {"broadcast_joins": 4},
    ),
    # star ETL: dimension lookups broadcast.
    "etl_star_load": (["CartesianProduct"], {"broadcast_joins": 1}),
    # dedup family: bucket formulations — an all-pairs product (plain or
    # broadcast-nested-loop) must never reappear.
    "dedup_minhash_lsh": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    "dedup_ngram_jaccard": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    "embedding_neardup": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    "simhash": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    "neardup_clusters": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    "corpus_curation": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    # quality-ranked survivor selection: corpus joins the (small) cluster
    # relation by equi-key + one window per cluster — never a product.
    "cluster_survivors": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    # seeded shard shuffle: hash projection + per-shard window ONLY — any
    # join at all means the zero-join design regressed.
    "shuffle_shards": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin"],
        {},
    ),
    # SCD as-of interval join: member-key equi-join, never a range-only
    # product over the history.
    "scd_lookupasof": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    # generic as-of: ONE union-tagged window carry, no candidate product.
    "asof_generic": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    # bigram LM score: n-gram count joins, never a product; no
    # row-at-a-time Python anywhere (the global BatchEvalPython check).
    "lm_score": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    # semantic dedup: within-cluster Arrow scoring only — no corpus
    # product (the BNLJ nodes present are kmeans' one-row centroid-array
    # broadcast attaches, so BNLJ itself is not forbidden here).
    "ann_semdedup": (["CartesianProduct"], {}),
    # bucketized range join: hash equi-join on (key, bucket) — the raw
    # non-equi condition would plan as BroadcastNestedLoopJoin.
    "range_join_events": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    # streamed-then-compacted IVF-PQ lifecycle probe (r6): candidate
    # joins are broadcast hash equi-joins on the cluster partition key —
    # never a product over the codes/raw tiers (the BNLJ present is the
    # tiny query×centroid broadcast attach, as in ann_semdedup).
    "ann_ivfpq_compacted": (["CartesianProduct"], {}),
    # ExactSubstr span dedup: span-hash aggregation + equi-join back,
    # never a product over span occurrences; the dup-span table and the
    # per-doc removal table broadcast back so the occ relation and the
    # base corpus are never shuffled for the joins.
    "exact_substring": (
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        {"broadcast_joins": 2},
    ),
    # hashed linear classifier: pure scan-stage projection — any join at
    # all means the broadcast-weights design regressed (the only exchange
    # is catalog.spread's round-robin input spreading, local-only).
    "hashed_classifier": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin", "HashAggregate"],
        {},
    ),
    # Bloom decontamination probe: corpus side is scan-stage only (the
    # bitmap is a literal); no join against the eval relation may appear.
    "bloom_decontam": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin"],
        {},
    ),
    # Gopher rule filter + ftfy normalization (r9): pure scan-stage
    # projections — a join or aggregate appearing at all means the
    # zero-shuffle design regressed.
    "gopher_rules": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin", "HashAggregate", "Exchange"],
        {},
    ),
    "normalize_text": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin", "HashAggregate", "Exchange"],
        {},
    ),
    # inter-doc line dedup (r9): winner selection is a map-side-combined
    # groupBy min + equi-join back on the line key — never a product.
    "line_dedup": (["CartesianProduct", "BroadcastNestedLoopJoin"], {}),
    # URL canonicalization (r9): pure scan-stage projection — zero
    # exchange at any corpus size.
    "url_normalize": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin", "HashAggregate", "Exchange"],
        {},
    ),
    # domain blocklist (r9): the KB-scale blocklist must broadcast — a
    # sort-merge anti-join would shuffle the whole corpus for it.
    "host_blocklist": (
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        {"broadcast_joins": 1},
    ),
    # vocab coverage (r9), literal-vocab mode: in-row array probe + one
    # per-group rollup — any join means the vocab fell out of the row.
    "vocab_coverage": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin"],
        {},
    ),
    # per-language NTILE tiers (r9): below the distributed-rank
    # threshold this is ONE lang-partitioned window — no join may
    # appear (the >1M two-phase path joins per-group stats by design
    # and is pinned by tests/test_selection.py path equivalence).
    "quantile_buckets": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin"],
        {},
    ),
    # DSIR importance scoring (r9): the bucket weights ride in as a
    # dim-entry array literal, so scoring must stay a scan-stage
    # projection like hashed_classifier — no join, no aggregate (the
    # count sidecars are separate bounded jobs at build time).
    "dsir_importance": (
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "SortMergeJoin", "BroadcastHashJoin", "HashAggregate"],
        {},
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_plan_properties(spark, name):
    from pygrametl_spark.queries import ALL_QUERIES

    df = ALL_QUERIES[name](spark, SF)
    plan = formatted_plan(df)
    stats = plan_stats(df)
    forbidden, required = CASES[name]
    # row-at-a-time Python is never acceptable in a hot path — the only
    # Python execution anywhere is Arrow-batched (ArrowEvalPython /
    # FlatMapGroupsInPandas), and none of the guarded queries need even that
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    for op in forbidden:
        assert f") {op}" not in plan, f"{name}: plan contains {op}"
    for key, minimum in required.items():
        assert stats[key] >= minimum, f"{name}: {key}={stats[key]} < {minimum}"


def test_merge_joining_source_broadcasts_small_side(spark):
    """MergeJoiningSource leaves the strategy to Catalyst (VERDICT r2
    item 5): a sub-threshold side must plan as a broadcast hash join,
    and two sides forced above the threshold as sort-merge."""
    from pygrametl_spark.sources.sources import MergeJoiningSource

    big = spark.range(0, 100000).withColumnRenamed("id", "k")
    small = spark.range(0, 10).withColumnRenamed("id", "k2")
    p = formatted_plan(MergeJoiningSource(big, "k", small, "k2"))
    assert "BroadcastHashJoin" in p, "small sorted side must stay broadcastable"

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p2 = formatted_plan(MergeJoiningSource(big, "k", small, "k2"))
        assert "SortMergeJoin" in p2 or "ShuffledHashJoin" in p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
