"""Structured Streaming ingest for the events stream.

Net-new surface (the reference is batch-only, SURVEY §1.5/§2.11): a
file-source stream over the events table with event-time tumbling
windows and a watermark for late data. ``availableNow`` drains the
backlog as micro-batches and terminates — the same code keeps running
incrementally on a live directory at scale.
"""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygrametl_spark.streaming.scratch import scratch_dir, scratch_path


@contextlib.contextmanager
def _scoped_conf(spark: SparkSession, confs: dict):
    """Set SQL confs for the duration of one streaming query, then restore.

    Stateful streaming queries pin their state-store sharding to
    ``spark.sql.shuffle.partitions`` at first start (per checkpoint), and
    AQE is disabled for stateful plans — so unlike batch, the static
    partition number IS the state-store layout knob and must be sized to
    state volume, not inherited from the batch-side default. Each entry
    point below starts a fresh checkpoint, so scoping the conf around
    ``start()`` is exactly equivalent to configuring the deployment.
    """
    _unset = object()
    old = {}
    for k, v in confs.items():
        if v is None:
            continue
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — conf not set
            old[k] = _unset
        spark.conf.set(k, str(v).lower() if isinstance(v, bool) else str(v))
    try:
        yield
    finally:
        for k, v in old.items():
            if v is _unset:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _auto_state_partitions(
    sf_dir: str,
    *,
    per_part_bytes: int = 4 << 20,
    lo: int = 4,
    hi: int = 32,
) -> int:
    """Size streaming state/shuffle partitions to the INPUT, not a
    constant. The r4 measurement picked 4 partitions at sf0.1 (state
    ~32k rows — the 32-partition default's 4x-per-partition checkpoint
    delta files were pure overhead), but a fixed 4 serializes a 100x
    drain's entire stateful pipeline into 4 tasks: the K=100 parity
    run's stream-stream interval join (~87M emitted pairs) crawled for
    over an hour exactly this way. Derive the count from the source
    parquet size instead — small inputs keep the measured sweet spot,
    big ones fan out to the local core budget (``hi``; raise it on a
    real cluster where executors multiply).
    """
    p = f"{sf_dir}/events.parquet"
    try:
        if os.path.isfile(p):
            size = os.path.getsize(p)
        else:
            # Walk recursively: a hive-partitioned/nested layout's
            # subdirectories stat as ~4KB inodes under a flat listdir,
            # undercounting a large input and under-partitioning the
            # stream — the exact serialization this heuristic prevents.
            size = 0
            for root, _dirs, files in os.walk(p):
                for f in files:
                    fp = os.path.join(root, f)
                    if os.path.isfile(fp):
                        size += os.path.getsize(fp)
    except OSError:
        return lo
    return int(max(lo, min(hi, (size + per_part_bytes - 1) // per_part_bytes)))


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
        import hashlib

        key = hashlib.sha1(path.encode()).hexdigest()[:12]
        link_dir = scratch_path(f"linkdir_{key}")
        os.makedirs(link_dir, exist_ok=True)
        link = os.path.join(link_dir, "events.parquet")
        if not os.path.exists(link):
            try:
                os.symlink(path, link)
            except FileExistsError:
                pass  # concurrent process linked it first — same target
        path = link_dir
    stream = spark.readStream.schema(schema).parquet(path)
    dtype = dict(stream.dtypes).get("ts")
    if dtype == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # parquet TIMESTAMP(isAdjustedToUTC=false) infers as NTZ, which
        # withWatermark rejects; the session timezone is pinned to UTC,
        # so the cast is value-preserving.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def stream_windowed_event_counts(
    spark: SparkSession,
    sf_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "1 hour",
    state_partitions: "int | str | None" = "auto",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type via a real streaming
    query (memory sink, complete mode, availableNow trigger). Returns
    the drained result as a DataFrame.

    ``state_partitions`` sizes the state store (see ``_scoped_conf``):
    aggregate state here is one row per (window, event_type) — tiny —
    so a handful of partitions beats the batch-side default, whose 2x32
    per-batch checkpoint delta files are pure overhead. At real volume
    raise it to spread state across executors.
    """
    ev = _raw_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    name = f"events_windows_{uuid.uuid4().hex[:8]}"
    if state_partitions == "auto":
        state_partitions = _auto_state_partitions(sf_dir)
    with _scoped_conf(spark, {"spark.sql.shuffle.partitions": state_partitions}):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", scratch_dir("memsink_ckpt_"))
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


def stream_enriched_event_counts(
    spark: SparkSession,
    sf_dir: str,
    *,
    window: str = "1 day",
    watermark: str = "1 hour",
    state_partitions: "int | str | None" = "auto",
) -> DataFrame:
    """Stream-static enrichment: the live event stream joined to a
    static dimension before the windowed aggregation.

    The static side (the nation dimension, keyed through a synthetic
    ``user_id % 25`` FK) is re-read per micro-batch and joined with a
    broadcast hash join — no stream-side shuffle, no state: the
    standard shape for enriching a 100 TB/day event stream with
    dimension attributes. Watermark + event-time window then aggregate
    per (window, nation).
    """
    ev = _raw_events_stream(spark, sf_dir)
    nation = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select(F.col("n_nationkey").cast("long").alias("nkey"), "n_name")
    )
    enriched = ev.withColumn("nkey", F.pmod(F.col("user_id"), F.lit(25))).join(
        F.broadcast(nation), "nkey"
    )
    agg = (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "n_name")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    name = f"events_enriched_{uuid.uuid4().hex[:8]}"
    if state_partitions == "auto":
        state_partitions = _auto_state_partitions(sf_dir)
    with _scoped_conf(spark, {"spark.sql.shuffle.partitions": state_partitions}):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", scratch_dir("memsink_ckpt_"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_name",
        "n_events",
        "sum_value",
    )


def stream_click_to_purchase_join(
    spark: SparkSession,
    sf_dir: str,
    *,
    lookback: str = "1 DAY",
    watermark: str = "1 hour",
    state_partitions: "int | str | None" = "auto",
    cleanup_batch: bool = False,
    sink: str = "auto",
) -> DataFrame:
    """Stream-stream event-time interval join: each purchase matched to
    the same user's clicks within ``lookback`` before it.

    Both sides carry watermarks and the join condition bounds event
    time, so the state store retains only rows inside the watermark +
    lookback horizon — the attribution-join shape that runs unbounded
    on a live stream with bounded state. ``availableNow`` drains the
    history; emitted pairs equal the equivalent batch interval join.

    Stream-stream join state is checkpointed per micro-batch across
    FOUR stores per partition (keyed/key-with-index, both sides), so the
    partition count multiplies checkpoint IO 4x: ``state_partitions``
    sizes it to the actual state volume (~32k rows at sf0.1 → 4;
    measured 5.4 s → 1.9 s vs the 32-partition default; raise it when
    per-partition state approaches executor memory). The ``"auto"``
    default derives it from the source size
    (:func:`_auto_state_partitions`) — a fixed small count that wins at
    gate scale serializes a 100x drain into that many tasks, the r8
    K=100 lesson. ``cleanup_batch``
    keeps the final no-data micro-batch, which only evicts expired
    state before shutdown — an INNER join's emitted rows never depend
    on it, so a drain-and-terminate run skips it (measured −0.6 s);
    a live deployment (no terminate) pays eviction incrementally and
    the flag is irrelevant.

    ``sink`` (r8): ``"memory"`` returns the drained pairs from the
    driver-side memory sink; ``"files"`` streams them to an
    exactly-once parquet file sink and reads the result back —
    REQUIRED once emitted volume outgrows driver memory (the K=100
    drain emits ~87M pairs; a memory sink collects them all as task
    results and dies with TaskResultLost). ``"auto"`` picks by source
    size, same heuristic as the state sizing.
    """
    ev = _raw_events_stream(spark, sf_dir)
    clicks = (
        ev.filter("event_type = 'click'")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    buys = (
        ev.filter("event_type = 'purchase'")
        .select(F.col("event_id").alias("buy_id"), "user_id", F.col("ts").alias("bts"))
        .withWatermark("bts", watermark)
    )
    joined = clicks.join(
        buys,
        (F.col("cu") == F.col("user_id"))
        & (F.col("cts") <= F.col("bts"))
        & (F.col("cts") >= F.col("bts") - F.expr(f"INTERVAL {lookback}")),
    )
    name = f"events_ssjoin_{uuid.uuid4().hex[:8]}"
    if state_partitions == "auto":
        state_partitions = _auto_state_partitions(sf_dir)
    pairs = joined.select("click_id", "buy_id")
    # Sink selection is a SCALE decision, not taste: a memory sink
    # materializes every emitted row on the driver via task results —
    # fine for the gate corpus, but the K=100 drain (~87M attribution
    # pairs) died with TaskResultLost exactly that way. An append-mode
    # stream sinks to FILES natively with exactly-once semantics
    # (_spark_metadata commit log), which is what a production
    # attribution join writes anyway; keep the memory sink only while
    # the input is small enough that driver materialization is free.
    to_files = sink == "files" or (
        sink == "auto" and _auto_state_partitions(sf_dir) > 4
    )
    with _scoped_conf(
        spark,
        {
            "spark.sql.shuffle.partitions": state_partitions,
            "spark.sql.streaming.noDataMicroBatches.enabled": cleanup_batch,
        },
    ):
        if to_files:
            out_dir = scratch_dir("ssjoin_out_")
            q = (
                pairs.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", scratch_dir("filesink_ckpt_"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # The file-sink commit log is authoritative; an all-filtered
            # drain leaves no data files, which is the ONLY failure the
            # empty-result fallback may absorb. Decide by inspecting the
            # sink dir for committed data files first — a permission
            # error, corrupt _spark_metadata, or transient FS fault on a
            # dir that DOES hold data must re-raise, not masquerade as
            # a valid empty result.
            has_data = any(
                f.endswith(".parquet")
                for _root, _dirs, files in os.walk(out_dir)
                for f in files
            )
            if not has_data:
                return spark.createDataFrame([], pairs.schema)
            return spark.read.parquet(out_dir)
        q = (
            pairs.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", scratch_dir("memsink_ckpt_"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def _stage_time_sliced(spark: SparkSession, sf_dir: str, n_files: int, tag: str):
    """Stage the event history as ``n_files`` time-ordered parquet files
    (one per micro-batch with ``maxFilesPerTrigger=1``) — every batch's
    events are >= the previous batch's, the shape a live time-ordered
    ingest has. Returns (full_df, stage_path, ts_is_long)."""
    path = f"{sf_dir}/events.parquet"
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001
        pass
    full = spark.read.parquet(path)
    if dict(full.dtypes).get("ts") == "timestamp_ntz":
        # normalize NTZ to TIMESTAMP before staging so the re-written
        # slices (and the batch twin) carry watermark-compatible event
        # time; session tz is UTC, so the cast is value-preserving.
        full = full.withColumn("ts", F.col("ts").cast("timestamp"))
    ts_is_long = dict(full.dtypes).get("ts") == "bigint"

    # hashlib key, not salted hash() (VERDICT r5): a hash()-named dir is
    # never found again by a fresh driver process, so the cache silently
    # re-staged every run; completeness is a _SLICED marker written only
    # after ALL slices land (a crash mid-staging re-stages). Source
    # fingerprint in the key: regenerated data never hits a stale cache.
    from pygrametl_spark.streaming.corpus import _source_slice_key

    key = _source_slice_key(path, n_files)
    stage = scratch_path(f"{tag}v3_{key}")
    if not os.path.isfile(f"{stage}/_SLICED"):
        ts_long = F.col("ts") if ts_is_long else F.unix_micros("ts")
        bounds = full.select(
            F.percentile_approx(ts_long, [i / n_files for i in range(1, n_files)], 10000).alias("b")
        ).first()["b"]
        os.makedirs(stage, exist_ok=True)
        cuts = [None, *bounds, None]
        for i in range(n_files):
            sl = full
            if cuts[i] is not None:
                sl = sl.filter(ts_long >= cuts[i])
            if cuts[i + 1] is not None:
                sl = sl.filter(ts_long < cuts[i + 1])
            sl.coalesce(1).write.mode("overwrite").parquet(f"{stage}/part{i}")
        for i in range(n_files):  # mtime order = processing order
            for f in os.listdir(f"{stage}/part{i}"):
                os.utime(f"{stage}/part{i}/{f}", (1_700_000_000 + i, 1_700_000_000 + i))
        with open(f"{stage}/_SLICED", "w") as fh:  # completeness marker
            fh.write("ok")
    return full, stage, ts_is_long


def stream_scd2_maintain(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_files: int = 2,
) -> DataFrame:
    """Incremental SCD2 warehouse maintenance on a live stream: each
    micro-batch of change events merges into the dimension through
    ``SlowlyChangingDimension.scdensure`` inside ``foreachBatch`` — the
    streaming deployment of the engine's core upsert. Because the
    micro-batches are time-ordered slices, the final dimension is
    IDENTICAL to a one-shot batch replay of the whole history (the
    oracle), which is exactly the invariant a streaming warehouse load
    must keep. Surrogate keys depend on batch slicing, so the stable
    output is (member, state, version, validity) — keys stay internal.

    Crash recovery: foreachBatch is at-least-once, so the merge runs
    with ``scdensure(idempotent=True)`` — the time-interleaved stack
    ordering no-change-suppresses every replayed row, making exact
    batch replay a no-op (identical results for time-ordered slices).
    A deployment that cannot assume time-ordering should instead
    version the dimension state by batch id — batch N computed from
    snapshot N-1 and written to its own location (the Delta/Iceberg
    txn-version guard). Both shapes pinned by
    ``tests/test_streaming_recovery.py`` with injected mid-run crashes.
    """
    from pygrametl_spark.operators.scd import SlowlyChangingDimension

    full, stage, ts_is_long = _stage_time_sliced(spark, sf_dir, n_files, "scd")
    empty = spark.createDataFrame(
        [],
        "id long, user_id long, event_type string, version long, "
        "fromdate timestamp, todate timestamp",
    )
    scd = SlowlyChangingDimension(
        "user_scd_stream", "id",
        ["user_id", "event_type", "version", "fromdate", "todate"],
        ["user_id"], versionatt="version", fromatt="fromdate", toatt="todate",
        srcdateatt="ts", df=empty,
    )

    def upsert(bdf, _bid):
        ts_col = (
            F.timestamp_micros(F.expr("ts div 1000")) if ts_is_long else F.col("ts")
        )
        scd.scdensure(
            bdf.select("user_id", "event_type", ts_col.alias("ts")),
            idempotent=True,
        )

    files = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    q = (
        files.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", scratch_dir("scd2_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return scd.df.select(
        "user_id", "event_type", "version",
        F.date_format("fromdate", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("fromdate"),
        F.date_format("todate", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("todate"),
    )


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    *,
    gap_hours: float = 6.0,
    n_files: int = 2,
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.

    Splits the event history into ``n_files`` files processed one per
    micro-batch (``maxFilesPerTrigger=1``), so per-user open sessions
    genuinely carry across batch boundaries in the state store — the
    shape a live deployment has, where state is sharded by user across
    executors and each micro-batch only shuffles its own events.

    A session closes when a later event of the same user arrives more
    than ``gap_hours`` after it; closed sessions are emitted in the
    batch that closes them. The open tail session per user stays in
    state (and is discarded at stream end), which keeps the emitted set
    deterministic: exactly the sessions followed by another session —
    the batch/SQL twin is plain gaps-and-islands.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    full, stage, ts_is_long = _stage_time_sliced(spark, sf_dir, n_files, "sess")

    gap_us = int(gap_hours * 3_600_000_000)
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("session_end", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ])
    state_schema = StructType([
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ])

    def fmt(us: int) -> str:
        # always 6-digit micros, matching DuckDB strftime '%f'
        return pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S.%f")

    def sessionize(key, pdfs, state: GroupState):
        (user_id,) = key
        evs = pd.concat(list(pdfs), ignore_index=True)
        grouped = evs.groupby("ts_us")["value"].agg(["count", "sum"]).sort_index()
        cur = state.get if state.exists else None
        closed = []
        for t, (cnt, sv) in grouped.iterrows():
            if cur is None:
                cur = (int(t), int(t), 0, 0.0)
            elif t - cur[1] > gap_us:
                closed.append(cur)
                cur = (int(t), int(t), 0, 0.0)
            cur = (cur[0], int(t), cur[2] + int(cnt), cur[3] + float(sv))
        state.update(cur)
        if closed:
            yield pd.DataFrame({
                "user_id": [int(user_id)] * len(closed),
                "session_start": [fmt(c[0]) for c in closed],
                "session_end": [fmt(c[1]) for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [round(c[3], 2) for c in closed],
            })

    files = spark.readStream.schema(full.schema).option("maxFilesPerTrigger", 1).parquet(f"{stage}/part*")
    ev = files.withColumn(
        "ts_us", F.expr("ts div 1000") if ts_is_long else F.unix_micros("ts")
    )
    sessions = (
        ev.select("user_id", "ts_us", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
    name = f"events_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", scratch_dir("memsink_ckpt_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


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


def stream_dedup_within_watermark(
    spark: SparkSession,
    sf_dir: str,
    *,
    keys: tuple = ("user_id", "event_type"),
    watermark: str = "3650 days",
    state_partitions: "int | str | None" = "auto",
) -> DataFrame:
    """Streaming dedup with bounded state: Spark's native
    ``dropDuplicatesWithinWatermark`` over the live event stream.

    Unlike the foreachBatch fingerprint store (streaming/corpus.py),
    whose accepted-set grows forever, this keeps only keys younger than
    the watermark horizon — the state-bounded dedup a perpetual 100 TB/day
    ingest needs (state is purged as event time advances, so memory is
    proportional to the dedup window, not to history). The horizon is a
    correctness/memory dial: duplicates farther apart than the watermark
    can re-emit.

    For the oracle-gated query the horizon spans the whole dataset, so
    the emitted key set equals batch ``SELECT DISTINCT keys`` exactly;
    only the keys are returned because which *row* survives within a
    micro-batch is an implementation detail.
    """
    ev = _raw_events_stream(spark, sf_dir)
    dd = (
        ev.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
        .select(*keys)
    )
    name = f"events_dedup_{uuid.uuid4().hex[:8]}"
    if state_partitions == "auto":
        state_partitions = _auto_state_partitions(sf_dir)
    with _scoped_conf(spark, {"spark.sql.shuffle.partitions": state_partitions}):
        q = (
            dd.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", scratch_dir("memsink_ckpt_"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
