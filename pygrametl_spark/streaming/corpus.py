"""Streaming corpus ingestion: incremental exact deduplication.

The batch dedup operators (:mod:`pygrametl_spark.functions.dedup`)
assume the corpus is at rest; a live training-data pipeline ingests
continuously and must drop documents whose content has *already been
accepted in any earlier batch*. This module maintains that state with
``foreachBatch``: a fingerprint store grows batch by batch, and each
micro-batch keeps only fingerprints never seen before.

First-seen-wins over id-ordered micro-batches is deterministic, so the
whole streaming run has an exact batch twin: keep MIN(doc_id) per
fingerprint over the full corpus — which is what the DuckDB oracle
checks. (Net-new surface; the reference is batch-only, SURVEY §2.11.)
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygrametl_spark.functions.text import fingerprint
from pygrametl_spark.streaming.scratch import scratch_dir, scratch_path

__all__ = ["stream_dedup_exact", "stream_dedup_minhash", "minhash_accept_fn",
           "stream_dedup_exactsubstr", "exactsubstr_accept_fn",
           "stream_dedup_url"]


def _source_slice_key(path: str, n_files: int) -> str:
    """Cross-process-stable cache key for staged micro-batch slices of a
    source table: sha1 of (path, n_files, per-file size+mtime). The
    fingerprint part means regenerated data at the same path gets fresh
    slices instead of a stale cache hit."""
    import hashlib

    sig = []
    try:
        if os.path.isdir(path):
            for f in sorted(os.listdir(path)):
                st = os.stat(os.path.join(path, f))
                sig.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
        else:
            st = os.stat(path)
            sig.append(f":{st.st_size}:{st.st_mtime_ns}")
    except OSError:
        pass
    return hashlib.sha1(
        f"{path}|{n_files}|{';'.join(sig)}".encode()
    ).hexdigest()[:12]


def _stage_id_sliced(spark: SparkSession, sf_dir: str, n_files: int):
    """Stage documents as ``n_files`` doc_id-ordered parquet files (one
    per micro-batch with ``maxFilesPerTrigger=1``) — the arrival order a
    monotonically-keyed ingest has. Returns (full_df, stage_path).

    HARNESS-ONLY: the per-slice driver loop (one filtered write per
    micro-batch file) is O(n_files) driver round-trips, fine for
    simulating arrival order at test/bench scale but never a production
    ingest path — a real deployment's files arrive from the outside and
    this function does not exist in it. Slices are cached (keyed by
    source path + n_files) so repeated bench drains pay it once."""
    path = f"{sf_dir}/documents.parquet"
    full = spark.read.parquet(path)
    # hashlib key, not salted hash() (VERDICT r5): a hash()-named dir is
    # never found again by a fresh driver process — every bench/driver
    # run silently re-staged; completeness via the _SLICED marker. The
    # key carries the source fingerprint so regenerated testdata at the
    # same path can never serve stale slices cross-process.
    key = _source_slice_key(path, n_files)
    stage = scratch_path(f"docslice_{key}")
    if not os.path.isfile(f"{stage}/_SLICED"):
        bounds = full.select(
            F.percentile_approx("doc_id", [i / n_files for i in range(1, n_files)], 10000).alias("b")
        ).first()["b"]
        cuts = [None, *bounds, None]
        os.makedirs(stage, exist_ok=True)
        for i in range(n_files):
            sl = full
            if cuts[i] is not None:
                sl = sl.filter(F.col("doc_id") >= cuts[i])
            if cuts[i + 1] is not None:
                sl = sl.filter(F.col("doc_id") < cuts[i + 1])
            sl.coalesce(1).write.mode("overwrite").parquet(f"{stage}/part{i}")
        for i in range(n_files):  # mtime order = processing order
            for f in os.listdir(f"{stage}/part{i}"):
                os.utime(f"{stage}/part{i}/{f}", (1_700_000_000 + i, 1_700_000_000 + i))
        with open(f"{stage}/_SLICED", "w") as fh:  # completeness marker
            fh.write("ok")
    return full, stage


def stream_dedup_exact(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_files: int = 2,
) -> DataFrame:
    """Incremental exact dedup on a live document stream.

    Each micro-batch: fingerprint (md5 of normalized text), collapse
    within-batch duplicates to the lowest doc_id (one groupBy on the
    *batch*, not the history), then anti-join against the accepted-store
    and append the survivors. The store is a parquet directory written
    once per batch — the plain-files stand-in for the transactional
    table (Delta/Iceberg) a production deployment would append to; the
    anti-join's build side is the store's fingerprint column only.

    Because micro-batches are doc_id-ordered slices, first-seen-wins
    equals the global MIN(doc_id) per fingerprint — the oracle's batch
    twin. Returns the accepted (doc_id, fp) relation.
    """
    full, stage = _stage_id_sliced(spark, sf_dir, n_files)
    store = scratch_path(f"dedupstore_{uuid.uuid4().hex[:8]}")
    empty = spark.createDataFrame([], "doc_id long, fp string")
    empty.write.mode("overwrite").parquet(store)

    def accept(bdf, _bid):
        batch = (
            fingerprint(bdf)
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        seen = bdf.sparkSession.read.parquet(store).select("fp")
        batch.join(seen, "fp", "left_anti").select("doc_id", "fp").write.mode(
            "append"
        ).parquet(store)

    files = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    q = (
        files.writeStream.foreachBatch(accept)
        .option("checkpointLocation", scratch_dir("dedup_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store)


def minhash_accept_fn(band_store: str, accepted_store: str, threshold: float):
    """The foreachBatch body of :func:`stream_dedup_minhash`, exposed so
    the failure-injection recovery tests exercise the EXACT production
    logic: reject batch docs near-dup (band collision + est_jaccard >=
    threshold) of any smaller-id doc in (store ∪ batch), then append the
    batch's band rows and the surviving ids."""
    from pygrametl_spark.functions.dedup import MINHASH_K, minhash_band_rows

    def accept(bdf, _bid):
        sp = bdf.sparkSession
        bands = minhash_band_rows(bdf).localCheckpoint(eager=True)
        seen = sp.read.parquet(band_store)
        everyone = seen.unionByName(bands)
        eq = F.size(
            F.filter(F.zip_with("b_sig", "o_sig", lambda x, y: x == y), lambda v: v)
        )
        dropped = (
            bands.select(
                F.col("doc_id").alias("b_id"), F.col("sig").alias("b_sig"),
                "bidx", "bhash",
            )
            .join(
                everyone.select(
                    F.col("doc_id").alias("o_id"), F.col("sig").alias("o_sig"),
                    "bidx", "bhash",
                ),
                ["bidx", "bhash"],
            )
            .filter(F.col("o_id") < F.col("b_id"))
            .withColumn("_ej", F.round(eq / F.lit(float(MINHASH_K)), 4))
            .filter(F.col("_ej") >= threshold)
            .select(F.col("b_id").alias("doc_id"))
            .distinct()
        )
        bands.write.mode("append").parquet(band_store)
        bdf.select("doc_id").join(dropped, "doc_id", "left_anti").write.mode(
            "append"
        ).parquet(accepted_store)

    return accept


def stream_dedup_minhash(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_files: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental NEAR-duplicate rejection on a live document stream —
    the MinHash-LSH counterpart of :func:`stream_dedup_exact`.

    The accepted-store pattern generalizes: the store holds every SEEN
    document's LSH band rows (band hash + full signature — fingerprints,
    not text, so it stays tiny relative to the corpus), and a batch
    document is rejected iff some smaller-id document anywhere in
    (store ∪ batch) collides with it in a band AND matches at
    ``est_jaccard >= threshold``. Because micro-batches are id-ordered
    slices, "seen earlier" == "smaller id", so the whole streaming run
    has an exact batch twin: drop every ``id_2`` of
    :func:`pygrametl_spark.functions.dedup.minhash_lsh_pairs` over the
    full corpus — which is what the DuckDB oracle checks. (Dropped
    documents' fingerprints STAY in the store: a near-dup of a rejected
    document is itself rejected, keeping the rule transitive-free and
    batch-replayable.)

    Per batch: one in-row signature pass over the batch, a band-key
    equi-join of batch rows against (store ∪ batch) — never corpus ×
    corpus — and two appends. The join's build side is the batch's own
    band rows; the probe side is the store, which at 100 TB is the
    corpus's fingerprints only (~1% of text volume). Crash recovery:
    both effects are appends keyed by doc_id; a replayed batch re-drops
    the same ids (the store rows it appended earlier make its own docs
    collide with themselves at equal id — excluded by the strict ``<``)
    so re-appends duplicate rows at most, removed by the final distinct
    (failure-injection tested in tests/test_streaming_recovery.py).
    """
    full, stage = _stage_id_sliced(spark, sf_dir, n_files)
    root = scratch_path(f"mhstore_{uuid.uuid4().hex[:8]}")
    band_store, accepted_store = f"{root}/bands", f"{root}/accepted"
    spark.createDataFrame(
        [], "doc_id long, sig array<bigint>, bidx int, bhash string"
    ).write.mode("overwrite").parquet(band_store)
    spark.createDataFrame([], "doc_id long").write.mode("overwrite").parquet(
        accepted_store
    )

    accept = minhash_accept_fn(band_store, accepted_store, threshold)

    files = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    q = (
        files.writeStream.foreachBatch(accept)
        .option("checkpointLocation", scratch_dir("mhdedup_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(accepted_store).distinct()


def exactsubstr_accept_fn(span_store: str, result_store: str, k: int):
    """The foreachBatch body of :func:`stream_dedup_exactsubstr`,
    exposed so the failure-injection recovery tests exercise the EXACT
    production logic. Replay-safe per batch (foreachBatch retries reuse
    the same batch id):

    1. scrub the batch against ``span_store WHERE _bid != bid`` — a
       replayed batch's own already-landed spans are excluded, so the
       recomputation equals the first attempt;
    2. append per-doc results anti-joined on ``doc_id`` against rows
       already present (idempotent; completes partial appends);
    3. append the batch's net-new span keys tagged with ``bid``
       (anti-joined against the FULL store, so a replay appends
       nothing).
    """
    from pygrametl_spark.functions.dedup import (
        exact_substring_dedup_against,
        span_keys,
    )

    def accept(bdf, bid):
        sp = bdf.sparkSession
        store = sp.read.parquet(span_store)
        seen = store.filter(F.col("_bid") != F.lit(int(bid))).select("_key")
        out = exact_substring_dedup_against(
            bdf, None, k=k, corpus_spans=seen
        ).localCheckpoint(eager=True)
        done = sp.read.parquet(result_store).select("doc_id")
        out.join(done, "doc_id", "left_anti").write.mode("append").parquet(
            result_store
        )
        span_keys(bdf, k=k).join(store.select("_key"), "_key", "left_anti").select(
            "_key", F.lit(int(bid)).cast("long").alias("_bid")
        ).write.mode("append").parquet(span_store)

    return accept


def stream_dedup_exactsubstr(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_files: int = 2,
    k: int = 5,
) -> DataFrame:
    """Incremental SPAN-level dedup on a live document stream — the
    ExactSubstr member of the streaming dedup family (exact:
    :func:`stream_dedup_exact`; near-dup: :func:`stream_dedup_minhash`).

    The store holds the distinct k-token span HASHES of everything seen
    (8 bytes per distinct span — smaller still than the MinHash band
    store). Per batch: scrub the batch against (store ∪ earlier in
    batch) via :func:`...dedup.exact_substring_dedup_against`, append
    the batch's distinct span keys, and append the per-doc results.

    Because micro-batches are id-ordered, "span seen in an earlier
    batch" == "span whose global first occurrence has a smaller doc_id",
    so the streaming run's batch twin is EXACTLY the batch operator:
    ``exact_substring_dedup(full_corpus, k)`` row-for-row (test-pinned).

    Replay safety (foreachBatch effects are at-least-once): the span
    store is VERSIONED BY BATCH ID, and each batch scrubs against
    ``store WHERE _bid != current`` — so when a crashed batch replays
    after its own span append already landed, its spans are excluded
    from the corpus side and the recomputation is identical to the
    first attempt. The per-doc result append is made idempotent by
    anti-joining on ``doc_id`` against rows already present (a replayed
    batch's docs are exactly the already-present ones, and a partially
    landed append is completed with the correctly recomputed rows).
    Crash-injection tested in tests/test_streaming_recovery.py.
    """
    full, stage = _stage_id_sliced(spark, sf_dir, n_files)
    root = scratch_path(f"esstore_{uuid.uuid4().hex[:8]}")
    span_store, result_store = f"{root}/spans", f"{root}/results"
    spark.createDataFrame([], "_key long, _bid long").write.mode(
        "overwrite"
    ).parquet(span_store)
    spark.createDataFrame(
        [],
        "doc_id long, n_tokens long, n_dup_spans long, n_removed long, "
        "dup_bps long, kept_fp string",
    ).write.mode("overwrite").parquet(result_store)

    accept = exactsubstr_accept_fn(span_store, result_store, k)

    files = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    q = (
        files.writeStream.foreachBatch(accept)
        .option("checkpointLocation", scratch_dir("esdedup_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(result_store).dropDuplicates(["doc_id"])


def stream_dedup_url(
    spark: SparkSession,
    sf_dir: str,
    *,
    url,
    n_files: int = 2,
) -> DataFrame:
    """Incremental canonical-URL dedup on a live crawl stream — the
    CCNet first pass in streaming form. ``url`` is a Column expression
    deriving each document's raw URL from the staged row (a real crawl
    carries one; the harness synthesizes it deterministically).

    Each micro-batch: canonicalize (:func:`pygrametl_spark.functions.
    urls.url_normalize` — scan-stage, zero shuffle), collapse
    within-batch duplicates to the lowest doc_id (one groupBy on the
    ~60-byte canonical string, on the BATCH only), anti-join the
    accepted store, append survivors. Identical store/anti-join shape
    to :func:`stream_dedup_exact`, keyed on the canonical URL instead
    of a content fingerprint — in a production crawl this pass runs
    BEFORE content is fetched, so its state is also the fetch-dedup
    frontier. First-seen-wins over doc_id-ordered micro-batches equals
    the global MIN(doc_id) per canonical URL: the oracle's batch twin.
    Returns the accepted (doc_id, norm_url) relation.
    """
    from pygrametl_spark.functions.urls import url_normalize

    full, stage = _stage_id_sliced(spark, sf_dir, n_files)
    store = scratch_path(f"urldedupstore_{uuid.uuid4().hex[:8]}")
    empty = spark.createDataFrame([], "doc_id long, norm_url string")
    empty.write.mode("overwrite").parquet(store)

    def accept(bdf, _bid):
        batch = (
            bdf.select("doc_id", url_normalize(url).alias("norm_url"))
            .groupBy("norm_url")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        seen = bdf.sparkSession.read.parquet(store).select("norm_url")
        batch.join(seen, "norm_url", "left_anti").select(
            "doc_id", "norm_url"
        ).write.mode("append").parquet(store)

    files = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    q = (
        files.writeStream.foreachBatch(accept)
        .option("checkpointLocation", scratch_dir("urldedup_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store)
