"""ANN recall measurement (VERDICT r3 item 6): recall@k of every
approximate tier against exact brute-force cosine ground truth, on the
real embeddings table.

The correctness gate hash-verifies each tier against an oracle replaying
the SAME algorithm — that proves determinism, not retrieval quality.
This harness measures quality: for each query, recall@k =
|approx top-k ∩ exact top-k| / k, averaged over queries.

Usage: python scripts/ann_recall.py [sf_dir] [k] [n_queries]
Writes RECALL.json at the repo root and prints a table for PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topk_sets(df) -> dict:
    """(query_id -> frozenset of neighbor_ids) from a (query_id, rank,
    neighbor_id, score) frame."""
    out: dict = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict, truth: dict, k: int) -> float:
    if not truth:
        return float("nan")
    total = sum(len(approx.get(q, set()) & t) / min(k, len(t)) for q, t in truth.items())
    return round(total / len(truth), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    from pygrametl_spark.catalog import load_catalog
    from pygrametl_spark.functions import similarity as sim
    from pygrametl_spark.session import get_spark

    spark = get_spark("ann-recall")
    emb = load_catalog(spark, sf_dir).embeddings
    n_corpus = emb.count()
    queries = emb.filter(f"vec_id < {n_q}")
    print(f"# corpus={n_corpus} queries={n_q} k={k} ({sf_dir})")

    t0 = time.time()
    truth = topk_sets(sim.cosine_topk(emb, queries, k=k))
    t_exact = round(time.time() - t0, 1)
    print(f"# exact ground truth: {t_exact}s")

    results: dict[str, dict] = {}

    def run(name, fn, note=None, into=None, truth_=None):
        t = time.time()
        r = recall(topk_sets(fn()), truth_ or truth, k)
        secs = round(time.time() - t, 1)
        row = {"recall": r, "secs": secs}
        if note:  # self-describing artifact (VERDICT r5 "wrong" #2)
            row["note"] = note
        (results if into is None else into)[name] = row
        print(f"{name:40s} recall@{k} = {r:.4f}  ({secs}s)")

    for bands, ppb in [(4, 6), (8, 6), (16, 6), (8, 4)]:
        run(
            f"lsh_b{bands}_p{ppb}",
            lambda b=bands, p=ppb: sim.lsh_topk(
                emb, queries, n_bands=b, planes_per_band=p, k=k
            ),
        )

    # multiprobe: same corpus hashing/index size as 8x6, query side
    # additionally probes every Hamming-1 bucket per band
    run(
        "lsh_b8_p6_multiprobe",
        lambda: sim.lsh_topk(
            emb, queries, n_bands=8, planes_per_band=6, k=k, multiprobe=True
        ),
    )

    cent = sim.kmeans_refine(emb, n_clusters=16, iters=2)
    for nprobe in [1, 2, 4, 8]:
        run(
            f"ivf16_np{nprobe}",
            lambda np_=nprobe: sim.ivf_topk(
                emb, queries, n_clusters=16, nprobe=np_, k=k, centroids=cent
            ),
        )

    run("sq8", lambda: sim.sq8_topk(emb, queries, k=k))

    books = sim.pq_train(emb, m=8, k=16, iters=2)
    codes = sim.pq_codes(emb, books)
    run("pq_m8_k16", lambda: sim.pq_topk(codes, queries, books, k=k))

    # ADC shortlist -> exact re-rank (FAISS refine): the recall fix for
    # PQ-hostile distributions at the cost of <=R raw vectors per query
    for sl in [50, 100]:
        run(
            f"pq_m8_k16_rerank{sl}",
            lambda s=sl: sim.pq_topk_rerank(
                codes, queries, books, emb, shortlist=s, k=k
            ),
        )

    # finer codebooks: same 8 B/vector payload (codes stay <256), ~4x
    # the (one-off) training work — the PQ quality lever
    books64 = sim.pq_train(emb, m=8, k=64, iters=3)
    codes64 = sim.pq_codes(emb, books64)
    run("pq_m8_k64", lambda: sim.pq_topk(codes64, queries, books64, k=k))

    # the two quality levers composed: finer codebooks give the ADC
    # ordering enough signal for a fixed-size shortlist to capture the
    # true neighbors, and the exact pass restores their order
    run(
        "pq_m8_k64_rerank100",
        lambda: sim.pq_topk_rerank(
            codes64, queries, books64, emb, shortlist=100, k=k
        ),
    )

    idx = os.path.join(tempfile.gettempdir(), "pygrametl_spark_recall_ivfpq")
    sim.ivfpq_write_index(
        emb, idx, n_clusters=16, m=8, k=16, iters=2, books=books,
        store_raw=True,
    )
    for nprobe in [4, 8]:
        run(
            f"ivfpq16_np{nprobe}",
            lambda np_=nprobe: sim.ivfpq_topk(
                spark, idx, queries, nprobe=np_, k=k
            ),
        )
    for nprobe in [4, 8]:
        run(
            f"ivfpq16_np{nprobe}_rerank100",
            lambda np_=nprobe: sim.ivfpq_topk(
                spark, idx, queries, nprobe=np_, k=k, rerank=100
            ),
        )

    # the production IVF-PQ configuration hunt (VERDICT r4 next-round
    # #3): k=16 codebooks cap the composed chain at 0.57 — the ADC
    # shortlist misses true neighbors that the exact pass then cannot
    # recover. k=64 codebooks (same 8 B/vector payload) raised flat PQ
    # +rerank100 to 0.80; composed with IVF the pruning ceiling is
    # ivf16_np{nprobe} (0.854 at np8), so the curve below sweeps nprobe
    # x rerank depth to find the >=0.8 point.
    idx64 = os.path.join(
        tempfile.gettempdir(), "pygrametl_spark_recall_ivfpq64"
    )
    sim.ivfpq_write_index(
        emb, idx64, n_clusters=16, m=8, k=64, iters=3, books=books64,
        store_raw=True,
    )
    for nprobe, rr in [(8, 100), (8, 200), (12, 100), (12, 200)]:
        run(
            f"ivfpq16_np{nprobe}_k64_rerank{rr}",
            lambda np_=nprobe, r_=rr: sim.ivfpq_topk(
                spark, idx64, queries, nprobe=np_, k=k, rerank=r_
            ),
        )

    # residual encoding (FAISS IVFADC): expected to LOSE on this
    # near-isotropic corpus (no coarse structure for residuals to
    # shrink — the win case is clustered corpora, see
    # test_ivfpq_residual_encoding: +0.21 there); measured here so the
    # default (residual=False) is a recorded decision, not a guess.
    idxres = os.path.join(
        tempfile.gettempdir(), "pygrametl_spark_recall_ivfpq_res"
    )
    sim.ivfpq_write_index(
        emb, idxres, n_clusters=16, m=8, k=16, iters=2, residual=True,
    )
    run(
        "ivfpq16_np8_residual",
        lambda: sim.ivfpq_topk(spark, idxres, queries, nprobe=8, k=k),
        note=(
            "EXPECTED-NEGATIVE on this near-isotropic corpus: residual "
            "encoding exists for corpora with coarse structure (see the "
            "'clustered' section); with none, subtracting the centroid "
            "only adds noise for the codebooks to absorb. Recorded so "
            "the residual=False default is a measured decision."
        ),
    )

    # the residual PRODUCTION chain (VERDICT r5 next-round #2): residual
    # x k=64 codebooks x nprobe x rerank — the configuration a user
    # would actually deploy residual in, measured on the same gate
    # corpus so the raw-vs-residual k64 chains are directly comparable
    idxres64 = os.path.join(
        tempfile.gettempdir(), "pygrametl_spark_recall_ivfpq_res64"
    )
    sim.ivfpq_write_index(
        emb, idxres64, n_clusters=16, m=8, k=64, iters=3, residual=True,
        store_raw=True,
    )
    for nprobe, rr in [(8, 100), (8, 200), (12, 100), (12, 200)]:
        run(
            f"ivfpq16_np{nprobe}_k64_rerank{rr}_residual",
            lambda np_=nprobe, r_=rr: sim.ivfpq_topk(
                spark, idxres64, queries, nprobe=np_, k=k, rerank=r_
            ),
            note=(
                "residual production chain on the near-isotropic gate "
                f"corpus — compare to ivfpq16_np{nprobe}_k64_rerank{rr}"
            ),
        )

    # ---- clustered corpus: the regime residual encoding EXISTS for ----
    # Deterministic mixture-of-centers corpus (same md5 generator as
    # test_ivfpq_residual_encoding, scaled to the gate corpus size):
    # well-separated centers + small displacements, so codebooks that
    # quantize x - centroid only need to span the displacement ball.
    import hashlib as _hl

    def _h(s, lo, hi):
        v = int(_hl.md5(s.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
        return lo + (hi - lo) * v

    CD, CC, CN = 64, 16, 2000
    centers = [
        [_h(f"c{c}_{j}", -5, 5) for j in range(CD)] for c in range(CC)
    ]
    cl_rows = [
        (
            i,
            [
                round(centers[i % CC][j] + _h(f"d{i}_{j}", -0.35, 0.35), 6)
                for j in range(CD)
            ],
        )
        for i in range(CN)
    ]
    cl = spark.createDataFrame(
        cl_rows, "vec_id long, embedding array<double>"
    )
    cl_queries = cl.filter(f"vec_id < {n_q}")
    t0 = time.time()
    truth_cl = topk_sets(sim.cosine_topk(cl, cl_queries, k=k))
    t_exact_cl = round(time.time() - t0, 1)
    print(f"# clustered corpus ({CN}x{CD}, {CC} centers) truth: {t_exact_cl}s")

    results_cl: dict[str, dict] = {}
    cl_cent = sim.kmeans_refine(cl, n_clusters=16, iters=2)
    cl_raw = os.path.join(
        tempfile.gettempdir(), "pygrametl_spark_recall_cl_raw64"
    )
    cl_res = os.path.join(
        tempfile.gettempdir(), "pygrametl_spark_recall_cl_res64"
    )
    sim.ivfpq_write_index(
        cl, cl_raw, n_clusters=16, centroids=cl_cent, m=8, k=64, iters=3,
        store_raw=True,
    )
    sim.ivfpq_write_index(
        cl, cl_res, n_clusters=16, centroids=cl_cent, m=8, k=64, iters=3,
        residual=True, store_raw=True,
    )
    for name, idx_ in [("raw", cl_raw), ("residual", cl_res)]:
        run(
            f"clustered_ivfpq16_np8_k64_{name}",
            lambda p=idx_: sim.ivfpq_topk(spark, p, cl_queries, nprobe=8, k=k),
            note="ADC-only encoding-quality signal on the clustered corpus",
            into=results_cl, truth_=truth_cl,
        )
        for nprobe, rr in [(8, 200), (12, 200)]:
            run(
                f"clustered_ivfpq16_np{nprobe}_k64_rerank{rr}_{name}",
                lambda p=idx_, np_=nprobe, r_=rr: sim.ivfpq_topk(
                    spark, p, cl_queries, nprobe=np_, k=k, rerank=r_
                ),
                note=f"{name} production chain on the clustered corpus",
                into=results_cl, truth_=truth_cl,
            )

    out = {
        "sf_dir": sf_dir, "corpus": n_corpus, "n_queries": n_q, "k": k,
        "exact_secs": t_exact, "tiers": results,
        "clustered": {
            "note": (
                "deterministic mixture-of-centers corpus (md5 generator, "
                f"{CN} vectors x {CD} dims, {CC} centers, displacement "
                "±0.35) — the coarse-structure regime residual/IVFADC "
                "encoding exists for; 'tiers' rows compare raw vs "
                "residual k64 chains at identical config"
            ),
            "corpus": CN, "dim": CD, "centers": CC,
            "exact_secs": t_exact_cl, "tiers": results_cl,
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECALL.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
