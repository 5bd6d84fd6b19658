"""Retrieval-index pipeline: documents -> chunks -> vectors -> IVF-PQ.

The retrieval-side counterpart of examples/corpus_pipeline.py: one
lineage from raw documents to a persisted, probeable vector index —
the offline half of a RAG system, with every stage an engine operator:

1. chunk    — sliding token windows (text.chunk_by_tokens keeps only
              fingerprints; here chunks keep their text for embedding)
2. embed    — deterministic feature vectors over the chunk bytes
              (multimodal.extract_features: the md5-derived stand-in for
              a real embedding model, same Arrow mapInPandas plumbing)
3. index    — persisted IVF-PQ (similarity.ivfpq_write_index,
              store_raw=True): coarse routing + product-quantized codes
              per cluster partition, plus the raw tier for re-ranking
4. probe    — ivfpq_topk: dynamic partition pruning + ADC scoring;
              rerank=R re-scores the ADC top-R exactly from only the
              probed raw partitions (the FAISS refine pattern — the
              production recall fix, PERF.md "ANN recall")
5. maintain — late-arriving chunks land as exactly-once micro-batch
              tiers (streaming/ann.ivfpq_upsert_fn, namespaced by the
              stream's checkpoint id, writer-lease-guarded against a
              second concurrent stream) and fold back into a
              consolidated base on their own via the
              compact_every_n_bids auto-compaction policy (pointer-
              committed, crash-safe) — the index never accumulates
              small files, with no operator in the loop

Run: python examples/retrieval_index.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pygrametl_spark import get_spark
from pygrametl_spark.catalog import load_catalog, spread
from pygrametl_spark.functions import multimodal as mm
from pygrametl_spark.functions import similarity as sim
from pygrametl_spark.functions import text as tx


def chunk_with_text(docs, *, size=32, overlap=8):
    """Sliding token-window chunks KEEPING the chunk text (the retrieval
    unit a RAG system embeds and returns). Same binding discipline as
    chunk_by_tokens: the token array is a projected column, so the
    window lambda never re-tokenizes."""
    stride = size - overlap
    base = docs.select("doc_id", tx.tokens("text").alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    last = F.when(n <= size, F.lit(0)).otherwise(
        F.ceil((n - F.lit(size)) / F.lit(stride))
    )
    chunks = F.transform(
        F.sequence(F.lit(0), last),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.array_join(F.slice(toks, i * stride + 1, size), " ").alias("chunk_text"),
        ),
    )
    return (
        base.select("doc_id", F.explode(chunks).alias("_c"))
        .select(
            # one global chunk key so the index has a scalar id
            (F.col("doc_id") * 10000 + F.col("_c.chunk_id")).alias("vec_id"),
            "doc_id",
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )


def run_pipeline(spark, sf_dir: str, out_dir: str):
    docs = spread(load_catalog(spark, sf_dir).documents)

    chunks = chunk_with_text(docs)
    payloads = mm.to_binary_payload(chunks, "chunk_text")
    vecs = mm.extract_features(payloads, id_col="vec_id", dim=8).withColumnRenamed(
        "features", "embedding"
    )

    from pygrametl_spark.streaming.ann import (
        ivfpq_compact, ivfpq_release_writer, ivfpq_upsert_fn,
    )

    # "yesterday's corpus" is indexed offline; today's documents arrive
    # later as micro-batches against the frozen quantizers (vec_id
    # encodes doc_id * 10000 + chunk_id, so the split is per document)
    base = vecs.filter("(vec_id DIV 10000) % 10 != 0")
    late = vecs.filter("(vec_id DIV 10000) % 10 = 0")
    index_dir = os.path.join(out_dir, "ivfpq")
    sim.ivfpq_write_index(
        base, index_dir, n_clusters=4, m=4, k=16, store_raw=True
    )

    # exactly-once streamed maintenance: each batch owns its (cluster,
    # _bid) partitions; the namespace pins the bid lineage to the
    # stream's checkpoint so replays self-overwrite and a stream started
    # after a compaction can never write below the probe watermark. The
    # first batch also claims the index's writer lease — a second
    # concurrent stream would fail loudly instead of silently
    # overwriting. compact_every_n_bids is the unattended-maintenance
    # policy: the batch tail folds accumulated micro-partitions into a
    # consolidated generation on its own (the latest, still-replayable
    # batch always stays live), so nobody has to remember to compact.
    # compact_async moves the fold onto a daemon thread so ingest never
    # stalls for it (bound the tail instead with compact_max_fold_bids=
    # if you want the fold synchronous but capped — the measured stall
    # ladder is in SCALING.md). On an OBJECT-STORE index root, add
    # lease_protocol="pointer": the default POSIX lease needs O_EXCL/
    # rename/mtime, which S3-class stores lack — the pointer mode keeps
    # the same single-writer semantics on create-if-absent PUTs alone.
    upsert = ivfpq_upsert_fn(
        index_dir, namespace=f"{out_dir}/ckpt", compact_every_n_bids=2,
        compact_async=True,
    )
    for bid, batch in enumerate([
        late.filter("(vec_id DIV 10000) % 20 = 0"),
        late.filter("(vec_id DIV 10000) % 20 != 0"),
    ]):
        upsert(batch, bid)
    # the stream is quiesced: settle any in-flight async fold (also
    # surfaces a final-fold failure), release the writer lease, and
    # fold the final (no-longer-replayable) batch too
    upsert.join_compaction()
    ivfpq_release_writer(index_dir, namespace=f"{out_dir}/ckpt")
    ivfpq_compact(spark, index_dir, include_latest_bid=True)

    # probe with the first few chunks as queries: each must find itself
    # impossible (self filtered) but near-identical overlapping chunks
    # rank high; the ADC top-20 are re-scored exactly from the raw tier
    queries = vecs.orderBy("vec_id").limit(3)
    hits = sim.ivfpq_topk(
        spark, index_dir, queries, nprobe=2, k=3, rerank=20
    )
    return chunks, vecs, hits, index_dir


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tempfile.gettempdir(), "pygrametl_spark_retrieval_out"
    )
    spark = get_spark("retrieval-index")
    chunks, vecs, hits, index_dir = run_pipeline(spark, sf, dst)
    print({
        "chunks": chunks.count(),
        "vectors": vecs.count(),
        "probe_hits": hits.count(),
        "index": index_dir,
    })
