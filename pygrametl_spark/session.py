"""SparkSession factory tuned for the engine.

The reference (pygrametl) funnels all execution through a single
``ConnectionWrapper`` (reference ``pygrametl/__init__.py:654-729``); our
single entry point is one tuned :class:`SparkSession`.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would ship on a multi-executor cluster (AQE on, sane shuffle
partitioning, Arrow for the Pandas-UDF slow path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

# On local[N] a shuffle into hundreds of partitions is pure overhead; on a
# real cluster this would be sized to ~2-3x total cores (or left to AQE
# coalescing, which we enable).
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "pygrametl_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Return (create if needed) the engine's SparkSession.

    Settings rationale (all public Spark knobs):

    - ``spark.sql.adaptive.enabled`` — AQE re-plans at runtime: coalesces
      tiny shuffle partitions, converts sort-merge joins to broadcast when
      the built side turns out small, splits skewed partitions. This is
      the 100 TB safety net for skewed keys.
    - ``spark.sql.shuffle.partitions`` — starting parallelism before AQE
      coalescing; matched to cores locally.
    - Arrow enabled — every Pandas-UDF / ``toPandas`` boundary is
      Arrow-batched instead of pickled row-by-row.
    - Session timezone pinned to UTC so timestamp semantics are stable and
      match the DuckDB oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores TIMESTAMP(NANOS) which the Parquet reader
        # rejects; read as long and convert in the catalog (see catalog.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate adds `size(arr) > 0` before every
        # explode; predicate pushdown then inlines the FULL array
        # expression into the parquet scan's DataFilters. For derived
        # arrays that are expensive to compute (tokenize+shingle
        # pipelines) this re-evaluates the whole pipeline on the scan
        # side — BELOW any repartition, i.e. serialized onto the few
        # raw-file splits (measured: a 3.3 s single-task stage on a
        # 5000-doc corpus, per run). Empty-array rows are rare in our
        # operators; the inferred filter saves nothing and costs a
        # serial full recompute, so exclude the rule.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # the generated-class cache defaults to 100 entries; a benchmark
        # sweep over ~20 multi-stage queries compiles far more plans than
        # that, so later queries evict earlier ones and every run pays
        # Janino recompiles (measured: the same query swings 1.7 s - 6.2 s
        # across sweeps purely from cache state). 4096 keeps every plan
        # of a full sweep resident.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        # PySpark's DataFrame debugging captures the python call site
        # into JVM thread-local state around EVERY Column/DataFrame API
        # call — measured 13 py4j round-trips for one F.col (3 without),
        # 38 for a when/otherwise (8 without), at ~0.3 ms per round-trip
        # on this host. Query construction is driver-serialized, so this
        # overhead lands directly in every bench iteration; disabling it
        # trades the python call-site line in error messages (JVM stack
        # traces and error classes are unchanged) for ~4x less py4j
        # traffic per build. Public conf, SPARK-47274.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
