"""Measure the in-line auto-compaction ingest stall (VERDICT r7 ask #5).

``ivfpq_upsert_fn(compact_every_n_bids=N)`` runs :func:`ivfpq_compact`
SYNCHRONOUSLY in the foreachBatch tail, so the stream's Nth batch pays
the full fold while ingest queues behind it. This harness measures that
stall at a realistic bid/corpus size and decomposes it:

- a BASE-REWRITE component (rewriting the consolidated generation's
  cluster partitions — proportional to index size, paid no matter how
  few stream bids are folded), and
- a STREAM-SLICE component (reading + merging the folded ``_bid``
  partitions — proportional to the backlog, the part
  ``max_fold_bids=`` caps).

Protocol (all on one corpus so numbers are comparable):

1. Build a base IVF-PQ index from ``base_n`` replicated sf0.1 vectors.
2. Ingest ``n_bids`` micro-batches of ``batch_n`` vectors through the
   REAL ``ivfpq_upsert_fn`` closure (no policy) — the per-batch ingest
   cost baseline.
3. On a copy: one UNCAPPED ``ivfpq_compact`` folding the whole backlog
   (what the policy tail runs by default) — the worst-case stall.
4. On another copy: capped folds (``max_fold_bids=2``) until drained —
   the bounded stall the knob buys, and (uncapped − capped) isolates
   the stream-slice share while the per-call floor is the base rewrite.

Usage: python scripts/compaction_stall.py [base_n] [n_bids] [batch_n]
Writes COMPACTION_STALL.json at the repo root and prints a
SCALING.md-ready summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def replicate(emb, n_target):
    from pyspark.sql import functions as F

    base = emb.count()
    k = (n_target + base - 1) // base
    copies = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.filter(F.col("vec_id").isNotNull()).limit(n_target)


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_bids = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else 6_000

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.session import get_spark
    from pygrametl_spark.streaming.ann import ivfpq_compact, ivfpq_upsert_fn

    spark = get_spark("compaction-stall")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = load_catalog(spark, sf_dir).embeddings

    root = "/tmp/pygrametl_spark_stall"
    shutil.rmtree(root, ignore_errors=True)
    idx = os.path.join(root, "idx")

    all_vecs = replicate(emb, base_n + n_bids * batch_n).cache()
    # One materialization feeds BOTH the base build and the stream
    # batches: limit(base_n) is not guaranteed to pick the same rows as
    # collect()[:base_n], so deriving the slices independently could
    # stream duplicates of base vec_ids and skew the timings.
    all_rows = all_vecs.collect()
    base_df = spark.createDataFrame(
        all_rows[:base_n], schema="vec_id long, embedding array<float>"
    )

    t0 = time.time()
    sim.ivfpq_write_index(
        base_df, idx, n_clusters=16, m=8, k=16, iters=2,
        store_raw=True,
    )
    t_build = round(time.time() - t0, 2)
    print(f"# base index: {base_n} vectors, built in {t_build}s")

    # 2. real upsert closure, no policy — per-batch ingest baseline
    up = ivfpq_upsert_fn(idx, namespace="stall-harness")
    rows = all_rows[base_n:]
    batch_secs = []
    for b in range(n_bids):
        bdf = spark.createDataFrame(
            rows[b * batch_n:(b + 1) * batch_n],
            schema="vec_id long, embedding array<float>",
        )
        t0 = time.time()
        up(bdf, b)
        batch_secs.append(round(time.time() - t0, 2))
    from pygrametl_spark.streaming.ann import ivfpq_release_writer

    ivfpq_release_writer(idx, namespace="stall-harness")
    print(f"# ingest batches ({batch_n} vecs each): {batch_secs}")

    idx_uncapped = os.path.join(root, "idx_uncapped")
    idx_capped = os.path.join(root, "idx_capped")
    shutil.copytree(idx, idx_uncapped)
    shutil.copytree(idx, idx_capped)

    # 3. uncapped fold — the default policy-tail stall
    t0 = time.time()
    ivfpq_compact(spark, idx_uncapped)
    t_uncapped = round(time.time() - t0, 2)
    print(f"# uncapped fold ({n_bids - 1} bids): {t_uncapped}s")

    # 4. capped folds until the backlog drains
    capped_secs = []
    while True:
        t0 = time.time()
        layout = ivfpq_compact(spark, idx_capped, max_fold_bids=2)
        capped_secs.append(round(time.time() - t0, 2))
        from pygrametl_spark.functions.similarity import _stream_tier_bids

        live = [
            b for b in _stream_tier_bids(
                os.path.join(idx_capped, "codes_stream")
            )
            if b >= layout["bid_cut"]
        ]
        if len(live) <= 1:
            break
    print(f"# capped folds (max_fold_bids=2): {capped_secs}")

    med_batch = sorted(batch_secs)[len(batch_secs) // 2]
    report = {
        "sf_dir": sf_dir,
        "base_n": base_n,
        "n_bids": n_bids,
        "batch_n": batch_n,
        "index_build_secs": t_build,
        "ingest_batch_secs": batch_secs,
        "median_batch_secs": med_batch,
        "uncapped_fold_secs": t_uncapped,
        "capped_fold_secs": capped_secs,
        "stall_multiple_uncapped": round(t_uncapped / med_batch, 1),
        "stall_multiple_capped": round(max(capped_secs) / med_batch, 1),
        "note": (
            "uncapped - capped ~= the stream-slice share; the per-call "
            "floor across capped folds is the base-generation rewrite, "
            "which max_fold_bids cannot reduce (inherent to the "
            "single-generation layout)"
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COMPACTION_STALL.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
