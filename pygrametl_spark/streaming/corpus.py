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
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygrametl_spark.functions.text import fingerprint

__all__ = ["stream_dedup_exact"]


def _stage_id_sliced(spark: SparkSession, sf_dir: str, n_files: int):
    """Stage documents as ``n_files`` doc_id-ordered parquet files (one
    per micro-batch with ``maxFilesPerTrigger=1``) — the arrival order a
    monotonically-keyed ingest has. Returns (full_df, stage_path)."""
    path = f"{sf_dir}/documents.parquet"
    full = spark.read.parquet(path)
    stage = os.path.join(
        tempfile.gettempdir(),
        f"pygrametl_spark_docslice_{abs(hash((path, n_files))) % 10**8}",
    )
    if not os.path.isdir(stage) or len(os.listdir(stage)) != n_files:
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
    store = os.path.join(
        tempfile.gettempdir(), f"pygrametl_spark_dedupstore_{uuid.uuid4().hex[:8]}"
    )
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
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dedup_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store)
