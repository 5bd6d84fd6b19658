"""End-to-end training-data curation pipeline (net-new surface).

The LLM-corpus counterpart of the warehouse quickstarts: one lineage
from a raw document crawl to packed, split, sharded training data —
every stage an operator this engine ships, each scale-shaped for a
100 TB corpus (see PERF.md for the per-operator plan audits):

0. acquisition — URL canonicalization + canonical-URL dedup (the
               CCNet first pass: one crawl row per canonical URL),
               domain blocklist (broadcast anti-join), and ftfy-style
               unicode normalization — all scan-stage
1. hygiene   — C4-style boilerplate line removal + corpus-wide line
               dedup (first copy of every line survives), rebuilt in
               order
2. filtering — Gopher rule gate, language ID + quality score +
               repetition gates, the CCNet LM perplexity proxy, and
               the fastText-style hashed linear classifier as the
               model-based gate
3. dedup     — exact (hash-groupBy), ExactSubstr duplicated-span
               removal (docs that are mostly duplicated text go), then
               near-dup clusters over the MinHash-LSH pair graph; the
               BEST-quality doc per cluster survives (cluster_survivors)
4. leakage   — benchmark decontamination (broadcast eval shingles) and
               a cluster-aware split so near-dups never straddle splits
5. selection — DSIR importance weights vs the curated English slice as
               the target distribution, tiered CCNet-style per language
               (quantile_bucket); each language's least-target-like
               tier is dropped
6. balancing — per-domain quota cap so no source dominates
7. packing   — token-budget sequence packing per source shard
8. export    — val/test parquet partitioned by (split, source); train
               seeded-shuffled into row-ordered loader shards
               (shuffle_shards — reproducible epoch read order)

Run: python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pygrametl_spark import get_spark
from pygrametl_spark.catalog import load_catalog, spread
from pygrametl_spark.functions import dedup as dd
from pygrametl_spark.functions import text as tx
from pygrametl_spark.functions import urls as ur
from pygrametl_spark.functions.sampling import (
    cluster_split,
    pack_by_token_budget,
    per_group_cap,
    quantile_bucket,
    write_shuffled_shards,
)


def run_pipeline(spark, sf_dir: str, out_dir: str):
    """Returns (curated DataFrame, stage-count dict) and writes the
    sharded corpus under ``out_dir``."""
    docs = spread(load_catalog(spark, sf_dir).documents)
    counts = {"raw": docs.count()}

    # 0. acquisition hygiene — all scan-stage. A real crawl carries a
    # URL per row; the synthetic corpus derives a deterministic messy
    # one (two docs per group share a canonical URL) to exercise the
    # exact operators a crawl front-end runs.
    crawl = docs.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://WWW.Site-"),
            ((F.col("doc_id") / 2).cast("long") % 40).cast("string"),
            F.lit(".example.com:443/page/"),
            ((F.col("doc_id") / 2).cast("long")).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("?utm_source=crawl&v=1#top"))
            .otherwise(F.lit("/?v=1")),
        ),
    )
    blocklist = spark.createDataFrame(
        [("blocked.example.net",)], "reg_domain string"
    )
    crawl = ur.filter_by_host_blocklist(crawl, blocklist)
    # canonical-URL dedup: ONE crawl row per canonical URL (CCNet's
    # first pass — shuffles ~60-byte keys, never documents)
    first = ur.url_dedup(crawl, "doc_id", "url").select("doc_id")
    crawl = crawl.join(first, "doc_id")
    # ftfy-style normalization: defensively canonical text from here on
    docs0 = crawl.select(
        "doc_id", tx.normalize_text("text").alias("text"), "source"
    )
    counts["after_urlpass"] = docs0.count()

    # 1. hygiene: drop corpus-frequent lines, then keep only the FIRST
    # corpus-wide copy of every surviving line; rebuild documents
    cleaned = (
        tx.remove_boilerplate_lines(docs0, min_docs=3)
        .filter(F.length("clean_text") > 0)
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    cleaned = (
        tx.line_dedup_across_docs(cleaned)
        .filter(F.length("dedup_text") > 0)
        .select("doc_id", F.col("dedup_text").alias("text"))
        .join(docs0.select("doc_id", "source"), "doc_id")
    )
    counts["after_lineclean"] = cleaned.count()

    # 2. filtering: Gopher rule gate first (pure scan-stage — cheapest
    # possible rejection), then language + quality + repetition gates, then the
    # CCNet-style LM perplexity proxy — drop the most-gibberish tail
    # (NULL lm_score = <2 tokens, already gone via quality gates)
    gopher_ok = (
        tx.gopher_rules(cleaned, min_words=10, min_stopwords=1)
        .filter("gopher_pass")
        .select("doc_id")
    )
    cleaned = cleaned.join(gopher_ok, "doc_id")
    scored = tx.quality_score(tx.lang_id(cleaned))
    rep_ok = tx.repetition_stats(cleaned).filter(~F.col("repetitive")).select("doc_id")
    kept = (
        scored.filter((F.col("quality_score") >= 0.2) & (F.col("lang_pred") != "und"))
        .join(rep_ok, "doc_id")
        .select("doc_id", "text", "source", "lang_pred", "quality_score")
    )
    # pin the surviving set before the LM pass: self-training scans it
    # twice (bigram rows + model counts) and the filter-stage lineage
    # above is deep — the same stage-boundary materialization a real
    # pipeline would get from writing intermediate tables
    kept = kept.localCheckpoint(eager=False)
    lm = tx.ngram_lm_score(kept)
    cutoff = lm.agg(
        F.percentile_approx("lm_score", 0.95, 1000).alias("c")
    ).first()["c"]
    kept = kept.join(
        lm.filter(F.col("lm_score") <= F.lit(cutoff)).select("doc_id"), "doc_id"
    )
    # model-based gate: the hashed linear classifier (here the
    # deterministic pseudo-weights; swap in a trained vector via
    # weights=). Zero-shuffle scan-stage scoring.
    clf_ok = (
        tx.hashed_classifier_score(kept)
        .filter(F.col("score_units") > -400_000)
        .select("doc_id")
    )
    kept = kept.join(clf_ok, "doc_id")
    counts["after_quality"] = kept.count()

    # 3. dedup: exact first (cheap), then ExactSubstr span-level dedup
    # (drop docs that are mostly duplicated spans of earlier docs),
    # then near-dup clusters; keep the canonical doc per cluster
    exact = dd.exact_dedup(kept, "doc_id", "text").select("doc_id")
    kept = kept.join(exact, "doc_id")
    span_ok = (
        dd.exact_substring_dedup(kept, k=8)
        .filter(F.col("dup_bps") <= 5000)  # >50% duplicated text -> drop
        .select("doc_id")
    )
    kept = kept.join(span_ok, "doc_id")
    clusters = dd.neardup_clusters(kept, threshold=0.5)
    # keep the BEST copy of each near-dup cluster (quality rank), not an
    # arbitrary min-id representative — near-dup variants differ exactly
    # in boilerplate/truncation, so survivor choice is a quality lever
    ranked = dd.cluster_survivors(
        kept, "doc_id", score="quality_score", clusters=clusters
    )
    kept = kept.join(
        ranked.filter("rk = 1").select("doc_id", "cluster_id"), "doc_id"
    )
    counts["after_dedup"] = kept.count()

    # 4. leakage guards: decontaminate vs the held-out eval slice, then
    # split by near-dup CLUSTER so paraphrases cannot straddle splits
    bench = load_catalog(spark, sf_dir).documents.filter("doc_id % 50 = 0")
    flags = tx.decontaminate(kept, bench, n=8)
    kept = kept.join(flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id")
    # 90/5/5 demo ratios: at quickstart scale (hundreds of surviving
    # docs) the production 98/1/1 default can hash EVERY cluster into
    # train, leaving the eval export empty
    split = cluster_split(
        kept,
        clusters=clusters,
        splits={"train": (0, 90), "val": (90, 95), "test": (95, 100)},
    ).select("doc_id", "split")
    counts["after_decontam"] = kept.count()

    # 5. selection: DSIR importance of every surviving doc under the
    # curated English slice as the target distribution (hashed-ngram
    # bag models, integer micro-nat weight sidecar, scan-stage
    # scoring), then CCNet-style tiers per language over the mean
    # log-ratio — each language's least-target-like quartile goes.
    # Tiering, not a global threshold, so no language is wiped out.
    # Pin first: DSIR's two count sidecars and the tier rank each
    # re-evaluate their input, and the post-dedup lineage is deep —
    # same stage-boundary materialization as the LM pass above.
    kept = kept.localCheckpoint(eager=False)
    target = kept.filter("lang_pred = 'en'")
    dsir = tx.dsir_importance(kept, target, dim=1024)
    tiers = quantile_bucket(
        kept.join(dsir.select("doc_id", "dsir_score"), "doc_id"),
        "doc_id", "dsir_score", 4, by="lang_pred",
    )
    kept = kept.join(tiers.filter("bucket > 1").select("doc_id"), "doc_id")
    counts["after_selection"] = kept.count()

    # 6. balancing: per-domain quota — no source may exceed its cap
    # (deterministic longest-first ranking within each source)
    quota = per_group_cap(
        kept.withColumn("_len", F.length("text")),
        "doc_id", "source", cap=200, order_by=[F.col("_len").desc()],
    ).select("doc_id")
    kept = kept.join(quota, "doc_id")
    counts["after_domain_cap"] = kept.count()

    # 7. packing: token budgets per source shard
    packed = pack_by_token_budget(
        kept.withColumn("n_tokens", F.size(tx.tokens()).cast("long")),
        "n_tokens", 512, order_by="doc_id", partition_by="source",
    ).join(split, "doc_id")

    # 8. export: val/test as plain partitioned parquet (audited by
    # split/source); TRAIN through a seeded deterministic global shuffle
    # into loader shards — epoch read order is reproducible, restartable,
    # and uncorrelated with crawl/source order (reseed = new epoch)
    out = packed.select(
        "doc_id", "source", "split", "lang_pred", "n_tokens", "pack_id", "text"
    )
    out.filter("split != 'train'").write.mode("overwrite").partitionBy(
        "split", "source"
    ).parquet(os.path.join(out_dir, "eval"))
    manifest = write_shuffled_shards(
        out.filter("split = 'train'"),
        os.path.join(out_dir, "train"),
        "doc_id",
        n_shards=4,
        seed="epoch0",
        mode="overwrite",
    )
    counts["exported"] = out.count()
    counts["train_shards"] = manifest.count()
    return out, counts


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tempfile.gettempdir(), "pygrametl_spark_corpus_out"
    )
    spark = get_spark("corpus-pipeline")
    _, counts = run_pipeline(spark, sf, dst)
    print({**counts, "out": dst})
