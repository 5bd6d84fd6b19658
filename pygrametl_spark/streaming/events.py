"""Structured Streaming ingest for the events stream.

Net-new surface (the reference is batch-only, SURVEY §1.5/§2.11): a
file-source stream over the events table with event-time tumbling
windows and a watermark for late data. ``availableNow`` drains the
backlog as micro-batches and terminates — the same code keeps running
incrementally on a live directory at scale.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _raw_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/events.parquet"
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001
        pass
    schema = spark.read.parquet(path).schema  # file schema: ts as epoch-nanos long
    if os.path.isfile(path):
        # the file stream source needs a directory; expose the single file
        # through a scratch symlink dir (a real deployment streams a dir)
        link_dir = os.path.join(
            tempfile.gettempdir(), f"pygrametl_spark_stream_{abs(hash(path)) % 10**8}"
        )
        os.makedirs(link_dir, exist_ok=True)
        link = os.path.join(link_dir, "events.parquet")
        if not os.path.exists(link):
            os.symlink(path, link)
        path = link_dir
    stream = spark.readStream.schema(schema).parquet(path)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def stream_windowed_event_counts(
    spark: SparkSession, sf_dir: str, *, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type via a real streaming
    query (memory sink, complete mode, availableNow trigger). Returns
    the drained result as a DataFrame."""
    ev = _raw_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    name = f"events_windows_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def windowed_event_counts_batch(events: DataFrame, *, window: str = "1 hour") -> DataFrame:
    """The batch twin of the streaming aggregation (same plan shape)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
