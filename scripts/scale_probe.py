"""Scaling evidence: replicate the sf0.1 tables K times (ids shifted so
keys stay unique) and measure how the heavy operators' runtimes grow.

An operator whose plan is scale-clean (scan-shaped work, bounded
shuffles, no quadratic joins) should grow ~linearly in rows on fixed
hardware; anything superlinear here would blow up 1000x harder at
100 TB. Run: python scripts/scale_probe.py [K ...]  (default 1 2 4 8)

Prints one JSON line per K with per-operator seconds, then a ratio
table vs K=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(spark, table: str, k: int, id_cols: list[str], out_root: str) -> str:
    """Union k shifted copies of a table; write once, reuse across runs."""
    from pyspark.sql import functions as F

    path = os.path.join(out_root, f"{table}_x{k}.parquet")
    if os.path.isdir(path):
        return path
    df = spark.read.parquet(f"{BASE}/{table}.parquet")
    n = df.count()
    copies = []
    for i in range(k):
        c = df
        for col in id_cols:
            c = c.withColumn(col, F.col(col) + F.lit(i * n * 10))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(path)
    return path


_BOOKS_CACHE: dict = {}


def _books(sim, emb, emb_path):
    """PQ codebooks per corpus (trained once per probe scale — training
    cost is measured separately by the pq trajectory gates; this probe
    measures the retrieval chain's growth). Keyed by the corpus PATH:
    id(emb) is unsafe here because each scale's DataFrame is dropped
    before the next is built, so CPython may reuse the id and silently
    hand back codebooks trained on a different scale's corpus."""
    if emb_path not in _BOOKS_CACHE:
        _BOOKS_CACHE[emb_path] = sim.pq_train(emb, m=8, k=16, iters=1)
    return _BOOKS_CACHE[emb_path]


_IVFPQ_CACHE: dict = {}


def _ivfpq_index(sim, emb, emb_path):
    """Persisted production-config IVF-PQ index per probe scale (16
    clusters, k=64 books, store_raw) — index build is one-off
    maintenance; the probe times only the retrieval chain."""
    if emb_path not in _IVFPQ_CACHE:
        idx = emb_path.rstrip("/") + "_ivfpq64_idx"
        sim.ivfpq_write_index(
            emb, idx, n_clusters=16, m=8, k=64, iters=1, store_raw=True,
        )
        _IVFPQ_CACHE[emb_path] = idx
    return _IVFPQ_CACHE[emb_path]


def probe(spark, docs_path: str, emb_path: str, ev_path: str, only=None) -> dict[str, float]:
    from pyspark.sql import functions as F

    from pygrametl_spark.functions import dedup as dd
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.functions import text as tx
    from pygrametl_spark.operators.scd import scd2_from_history

    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    ev = spark.read.parquet(ev_path)

    ops = {
        "minhash_lsh": lambda: dd.minhash_lsh_pairs(docs, threshold=0.5).count(),
        "ngram_jaccard": lambda: dd.ngram_jaccard_pairs(docs, threshold=0.2).count(),
        "simhash": lambda: dd.simhash32(docs).count(),
        "char_entropy": lambda: tx.char_entropy(docs).agg(F.sum("char_entropy")).count(),
        "quality_lang": lambda: tx.lang_id(tx.quality_score(docs)).count(),
        "lsh_banded_neardup": lambda: sim.lsh_banded_neardup(emb, threshold=0.45).count(),
        "sq8_topk": lambda: sim.sq8_topk(emb, emb.filter("vec_id < 5"), k=5).count(),
        "neardup_clusters": lambda: dd.neardup_clusters(docs, threshold=0.5).count(),
        "winnow_fp": lambda: tx.winnow_fingerprints(docs, k=5, w=4).count(),
        "tfidf_topk": lambda: tx.tfidf_topk(docs, k=3).count(),
        "line_clean": lambda: tx.remove_boilerplate_lines(docs, min_docs=3)
        .agg(F.sum("n_dropped")).count(),
        "ngram_containment": lambda: dd.ngram_jaccard_pairs(
            docs, threshold=0.5, metric="containment"
        ).count(),
        "scd2_build": lambda: scd2_from_history(
            ev.select("user_id", "event_type", "ts"),
            ["user_id"], ["event_type"], "ts",
        ).count(),
        "lm_score": lambda: tx.ngram_lm_score(docs).agg(
            F.sum("n_bigrams")
        ).count(),
        # n_clusters=None -> auto-scaled with corpus size (fixed k would
        # be quadratic in K; measured 54x at K=32 vs 12.8x scaled)
        "semantic_dedup": lambda: sim.semantic_dedup(
            emb, n_clusters=None, iters=2, threshold=0.45
        ).filter("NOT keep").count(),
        "exact_substring": lambda: dd.exact_substring_dedup(docs, k=5)
        .agg(F.sum("n_removed")).count(),
        "hashed_classifier": lambda: tx.hashed_classifier_score(docs)
        .agg(F.sum("score_units")).count(),
        "bloom_decontam": lambda: tx.bloom_decontaminate(
            docs, docs.filter("doc_id % 50 = 0"), m=65536, k_hashes=3
        ).filter("contaminated").count(),
        # rerank cost model: ADC scan grows linearly with corpus, the
        # exact pass is bounded at <=shortlist raw vectors per query
        "pq_rerank": lambda: sim.pq_topk_rerank(
            sim.pq_codes(emb, _books(sim, emb, emb_path)),
            emb.filter("vec_id < 5"),
            _books(sim, emb, emb_path), emb, shortlist=50, k=5,
        ).count(),
        # probe set x(planes+1) on the broadcast query side only; the
        # corpus hashing pass is identical to single-probe
        "lsh_multiprobe": lambda: sim.lsh_topk(
            emb, emb.filter("vec_id < 5"), n_bands=8, planes_per_band=6,
            k=5, multiprobe=True,
        ).count(),
        # production IVF-PQ chain (k=64 books, half the clusters probed,
        # rerank=200 — the >=0.8-recall config, RECALL.json r5): probe
        # cost = pruned ADC scan (linear in corpus/nprobe ratio) + a
        # bounded <=rerank raw-vector exact pass per query. Index write
        # is one-off maintenance, cached per scale outside the timing.
        "ivfpq_rerank": lambda: sim.ivfpq_topk(
            spark, _ivfpq_index(sim, emb, emb_path), emb.filter("vec_id < 5"),
            nprobe=8, k=5, rerank=200,
        ).count(),
    }
    times = {}
    for name, fn in ops.items():
        if only is not None and name not in only:
            continue
        fn()  # warm-up: codegen/JIT out of the measurement
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)
    return times


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# ETL-core replication axes: facts/events/members grow with K, the
# small dimensions stay fixed — the shape real warehouse growth has.
_ETL_REPL = {
    "lineitem": ["l_orderkey"],       # fact rows xK (orderkeys shifted)
    "orders": ["o_orderkey"],         # kept FK-consistent with lineitem
    "events": ["event_id"],           # K x history depth per member
    "customer": ["c_custkey"],        # K x members to snowflake-ensure
}


def build_etl_sfdir(spark, k: int, out_root: str) -> str:
    """A full sf-layout directory with the ETL growth axes replicated
    K x and everything else borrowed via symlink, so the registered
    queries run against it unchanged."""
    sf_dir = os.path.join(out_root, f"etl_sfx{k}")
    if os.path.isdir(sf_dir) and len(os.listdir(sf_dir)) == len(TABLES):
        return sf_dir
    os.makedirs(sf_dir, exist_ok=True)
    from pygrametl_spark.catalog import read_parquet

    for t in TABLES:
        dst = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        if t in _ETL_REPL and k > 1:
            from pyspark.sql import functions as F

            df = read_parquet(spark, f"{BASE}/{t}.parquet")
            copies = []
            for i in range(k):
                c = df
                for col in _ETL_REPL[t]:
                    c = c.withColumn(col, F.col(col) + F.lit(i * 100_000_000))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
            out.write.mode("overwrite").parquet(dst)
        else:
            os.symlink(f"{BASE}/{t}.parquet", dst)
    return sf_dir


def probe_etl(spark, sf_dir: str) -> dict[str, float]:
    """Time the registered ETL-core queries (the exact gate callables)
    against a replicated sf layout: star load, the SCD2 suite, snowflake
    lookup+ensure, and the accumulating snapshot."""
    from pygrametl_spark.queries import QUERIES

    names = [
        "etl_star_load", "scd2_build_close", "snowflake_lookup_ensure",
        "accumulating_snapshot", "dim_ensure", "fact_suite",
    ]
    times = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm-up
        t0 = time.time()
        fn(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> None:
    args = sys.argv[1:]
    etl = "--etl" in args
    args = [a for a in args if a != "--etl"]
    only = None
    for a in list(args):
        if a.startswith("--ops="):
            only = set(a[len("--ops="):].split(","))
            args.remove(a)
    ks = [int(a) for a in args] or ([1, 4, 16, 32] if etl else [1, 2, 4, 8])
    out_root = "/tmp/pygrametl_spark_scaleprobe"
    os.makedirs(out_root, exist_ok=True)

    from pygrametl_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.range(1).count()

    results = {}
    for k in ks:
        if etl:
            sf_dir = build_etl_sfdir(spark, k, out_root)
            times = probe_etl(spark, sf_dir)
        else:
            docs = replicate(spark, "documents", k, ["doc_id"], out_root)
            emb = replicate(spark, "embeddings", k, ["vec_id"], out_root)
            ev = replicate(spark, "events", k, ["event_id", "user_id"], out_root)
            times = probe(spark, docs, emb, ev, only=only)
        results[k] = times
        print(json.dumps({"k": k, "times": times}))

    base = results[ks[0]]
    print("\nratio vs K=%d (linear => ratio ~= K):" % ks[0])
    for k in ks[1:]:
        row = {op: round(results[k][op] / max(base[op], 1e-9), 2) for op in base}
        print(f"K={k}: {row}")


if __name__ == "__main__":
    main()
