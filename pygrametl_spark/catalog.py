"""Table catalog: name -> path + role metadata.

The reference implicitly "registers" every table object in
``pygrametl._alltables`` (reference ``pygrametl/__init__.py:442-448``) and
assumes the RDBMS holds the schema. Here the catalog is explicit: each
table is a Parquet dataset with a name; dimensional *role* metadata (key,
lookupatts, keyrefs, measures, SCD attributes) lives on the operator
objects in :mod:`pygrametl_spark.operators`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

def _nanos_columns(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) in the Parquet footer (which
    Spark's vectorized reader rejects). Footer-only read — cheap."""
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        if os.path.isdir(path):
            files = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not files:
                return []
            path = os.path.join(path, files[0])
        schema = pq.read_schema(path)
        return [f.name for f in schema if pat.is_timestamp(f.type) and f.type.unit == "ns"]
    except Exception:  # noqa: BLE001
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates nanosecond timestamps.

    With ``spark.sql.legacy.parquet.nanosAsLong`` the NANOS column scans
    as epoch-nanos long; we convert to a microsecond timestamp (same
    truncation DuckDB applies), keeping the scan fully native/columnar —
    no driver-side detour, so it holds at any scale.
    """
    nanos = _nanos_columns(path)
    if nanos:
        try:  # runtime SQL conf — works on sessions we did not build
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001
            pass
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for c in nanos:
        if dict(df.dtypes).get(c) == "bigint":
            # integer division: epoch-nanos exceed double precision
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# Session-scoped catalog-relation memo — the metastore role. Every
# `spark.read.parquet` call re-lists files and re-reads footers
# (measured ~100 ms per table at sf0.1), and operator construction
# resolves the same immutable catalog tables hundreds of times per
# bench sweep / gate run. Spark caches the FileIndex per DataFrame but
# not across reads (guide §6 — file listing is meant to be cached per
# session); this memo provides that property one level up. It holds
# PLAN handles only — no rows, no results; every action recomputes
# from the parquet files. Keys include the path's mtime so a rewritten
# table can never serve a stale file index (Catalog is only ever
# pointed at the immutable test-data dirs, but the guard makes the
# memo safe even if that changes); keyed by applicationId so a new
# session never sees another session's plan handles.
_RELATION_MEMO: dict = {}


def _catalog_relation(spark: SparkSession, path: str) -> DataFrame:
    try:
        key = (spark.sparkContext.applicationId, path, os.path.getmtime(path))
    except Exception:  # noqa: BLE001 — unkeyable: read fresh
        key = None
    if key is not None and key in _RELATION_MEMO:
        return _RELATION_MEMO[key]
    df = read_parquet(spark, path)
    if key is not None:
        _RELATION_MEMO[key] = df
    return df


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class Catalog:
    """Maps table names to Parquet paths and hands out DataFrames.

    ``register_views=True`` additionally registers each table as a temp
    view so the SQL surface (``spark.sql``) sees the same names the
    DuckDB oracle does.
    """

    spark: SparkSession
    base_dir: str
    _cache: dict = field(default_factory=dict)

    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = _catalog_relation(self.spark, self.path(name))
        return self._cache[name]

    def register_views(self, names=TPCH_TABLES) -> None:
        for name in names:
            if os.path.exists(self.path(name)):
                self.table(name).createOrReplaceTempView(name)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TPCH_TABLES:
            return self.table(name)
        raise AttributeError(name)


def load_catalog(spark: SparkSession, sf_dir: str, *, views: bool = False) -> Catalog:
    cat = Catalog(spark, sf_dir)
    if views:
        cat.register_views()
    return cat


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition an under-partitioned input before heavy
    derived compute (shingling, hashing, per-row media work).

    A small file is one scan split, so everything narrow downstream runs
    on ONE core — this buys the cluster back for the price of shuffling
    the (small) raw rows. On a 100 TB input the scan already has
    thousands of splits and this is a no-op decision: only apply it when
    the source is small relative to the compute it fans out into.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # No-op when the scan already has enough splits: on a 100 TB input
    # repartition(n) would shuffle the whole corpus AND shrink its
    # parallelism to n. getNumPartitions is plan metadata — no job runs.
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
