"""External-database sinks: load the warehouse into a real RDBMS.

The reference engine's core deliverable is loading dimensional
warehouses into databases — ``ConnectionWrapper``
(ref ``pygrametl/__init__.py:654-729``), ``JDBCConnectionWrapper``
(ref ``JDBCConnectionWrapper.py:50-584``) and the bulkloader protocol
(ref ``tables.py:2508-2683``, ``docs/examples/bulkloading.rst:20-183``).

Spark restatement: the engine's durable state is a parquet/bucketed
warehouse, and loading an external RDBMS is a *sink* over a finished
DataFrame:

- :func:`jdbc_sink` — the JVM-native path (``df.write.jdbc``): every
  partition opens its own JDBC connection and streams inserts, fully
  parallel, zero Python in the loop. This is the 100 TB path whenever a
  JDBC driver jar is on the classpath (none ships in this container, so
  it is exercised only through its thin argument-passing layer).
- :func:`PEP249Sink` — the DB-API twin of ``PEP249Source``: a zero-arg
  ``connect`` factory plus ``executemany`` batches. ``parallel=True``
  runs one connection per partition via ``foreachPartition`` (for
  server databases — Postgres, MySQL); the default driver-side path
  streams ``toLocalIterator`` batches through ONE connection, which is
  what single-writer embedded databases (DuckDB, SQLite) require.

Both orderings preserve the engine's FK discipline when driven through
:meth:`pygrametl_spark.engine.Engine.endload`.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

__all__ = [
    "ddl_for", "PEP249Sink", "jdbc_sink", "PEP249Target", "definequote",
    "jsonl_sink",
]

# identifier quoting for generated SQL (ref definequote __init__.py:166-187:
# configures how identifiers are quoted in SQL the framework generates)
_QUOTE = None


def definequote(quotechar=None):
    """Set (and return) the identifier quote used in generated DDL/INSERT
    SQL. ``None`` (default) emits bare identifiers; pass e.g. ``'"'`` for
    ANSI quoting or a ``(left, right)`` tuple for bracket styles."""
    global _QUOTE
    _QUOTE = quotechar
    return _QUOTE


def _q(name: str) -> str:
    if _QUOTE is None:
        return name
    left, right = (_QUOTE, _QUOTE) if isinstance(_QUOTE, str) else _QUOTE
    return f"{left}{name}{right}"

# Spark simple type -> portable SQL column type
_SQL_TYPES = {
    "tinyint": "SMALLINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "REAL",
    "double": "DOUBLE PRECISION",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}


def ddl_for(df: DataFrame, table: str) -> str:
    """``CREATE TABLE`` DDL for a DataFrame's schema in portable SQL.

    Decimal keeps precision/scale; complex types (array/map/struct) are
    rejected — flatten or serialize them before loading an RDBMS.
    """
    cols = []
    for name, dtype in df.dtypes:
        if dtype.startswith("decimal"):
            sql = dtype.upper()
        elif dtype in _SQL_TYPES:
            sql = _SQL_TYPES[dtype]
        else:
            raise ValueError(
                f"column {name!r} has non-relational type {dtype!r}; "
                "flatten or serialize it before sinking to an RDBMS"
            )
        cols.append(f"{_q(name)} {sql}")
    return f"CREATE TABLE {_q(table)} ({', '.join(cols)})"


def _insert_sql(table: str, columns: Sequence[str], paramstyle: str) -> str:
    if paramstyle == "qmark":
        ph = ["?"] * len(columns)
    elif paramstyle in ("format", "pyformat"):
        # pyformat drivers (psycopg2, MySQLdb) accept positional %s too,
        # which keeps the executemany batches tuple-shaped
        ph = ["%s"] * len(columns)
    elif paramstyle == "numeric":
        ph = [f":{i + 1}" for i in range(len(columns))]
    else:
        raise ValueError(f"unsupported paramstyle {paramstyle!r}")
    quoted = [_q(c) for c in columns]
    return (
        f"INSERT INTO {_q(table)} ({', '.join(quoted)}) VALUES ({', '.join(ph)})"
    )


# Lowest common statement-parameter cap across DB-API drivers (SQLite's
# historic SQLITE_MAX_VARIABLE_NUMBER default). Multi-row groups are
# sized to stay under it so the batching never trips a driver limit.
_MAX_STMT_PARAMS = 999


def _multirow_insert_sql(
    table: str, columns: Sequence[str], paramstyle: str, nrows: int
) -> str:
    """``INSERT INTO t (cols) VALUES (...), (...), ...`` for ``nrows``
    rows — standard multi-row VALUES (SQLite >= 3.7.11, DuckDB,
    PostgreSQL, MySQL). One statement per row group replaces one
    prepared-statement execution PER ROW: DB-API ``executemany`` is a
    per-row loop in most embedded engines (measured r9: DuckDB 1.54 s
    for 1000 rows via executemany vs 0.04 s via multi-row VALUES).
    ``numeric``-style drivers (Oracle) keep the executemany path — no
    multi-row VALUES in that dialect."""
    if paramstyle == "qmark":
        row = f"({', '.join(['?'] * len(columns))})"
    elif paramstyle in ("format", "pyformat"):
        row = f"({', '.join(['%s'] * len(columns))})"
    else:  # pragma: no cover — callers route numeric to executemany
        raise ValueError(f"unsupported paramstyle {paramstyle!r}")
    quoted = [_q(c) for c in columns]
    return (
        f"INSERT INTO {_q(table)} ({', '.join(quoted)}) "
        f"VALUES {', '.join([row] * nrows)}"
    )


def _insert_rows(cur, table, columns, paramstyle, ins_sql, batch) -> None:
    """Insert one batch through the fastest portable path: full
    multi-row groups via one statement each, the remainder via a
    smaller multi-row statement; ``numeric`` falls back to
    executemany."""
    if paramstyle == "numeric" or not batch:
        if batch:
            cur.executemany(ins_sql, batch)
        return
    group = max(1, _MAX_STMT_PARAMS // max(1, len(columns)))
    if group > 1:
        full_sql = _multirow_insert_sql(table, columns, paramstyle, group)
        i = 0
        while i + group <= len(batch):
            flat = [v for row in batch[i : i + group] for v in row]
            cur.execute(full_sql, flat)
            i += group
        rest = batch[i:]
        if rest:
            cur.execute(
                _multirow_insert_sql(table, columns, paramstyle, len(rest)),
                [v for row in rest for v in row],
            )
    else:
        cur.executemany(ins_sql, batch)


def PEP249Sink(
    df: DataFrame,
    connect: Callable[[], object],
    table: str,
    *,
    create: bool = True,
    overwrite: bool = True,
    batch_size: int = 10_000,
    paramstyle: str = "qmark",
    parallel: bool | None = None,
) -> int:
    """Load a DataFrame into a PEP 249 database table. Returns rows written.

    ``connect`` is a zero-arg factory (mirrors ``PEP249Source``): for
    ``parallel=True`` it must cloudpickle, because every partition task
    opens its own connection executor-side and the driver never sees the
    data — the scale path for server databases. The driver-side path
    streams Arrow batches from ``toLocalIterator`` through one
    connection: required for single-writer embedded engines
    (DuckDB/SQLite), and still memory-bounded (one batch in flight).

    ``parallel=None`` (default) picks by ``paramstyle``: ``format`` /
    ``pyformat`` / ``numeric`` identify server drivers (psycopg2,
    MySQLdb, oracledb) that take concurrent writers, so the distributed
    path is used; ``qmark`` is the embedded-engine style (sqlite3,
    DuckDB, ODBC) and stays on the single-writer driver stream. The
    auto route probe-pickles ``connect`` first and quietly falls back
    to the driver-side path when the factory can't cloudpickle (e.g. it
    closes over an open connection), so existing callers never trade a
    working load for a serialization error. Pass an explicit bool to
    override either way — ``parallel=True`` with an unpicklable factory
    raises immediately with a pointer at ``parallel=False``.

    ``create``/``overwrite`` issue ``DROP TABLE IF EXISTS`` + portable
    ``CREATE TABLE`` DDL first. Ref parity: ConnectionWrapper's
    paramstyle translation (ref ``__init__.py:730-800``) becomes the
    ``paramstyle`` knob on one INSERT template.
    """

    def _picklable(fn) -> bool:
        try:
            from pyspark.serializers import CloudPickleSerializer

            CloudPickleSerializer().dumps(fn)
            return True
        except Exception:
            return False

    if parallel is None:
        parallel = paramstyle in ("format", "pyformat", "numeric") and _picklable(
            connect
        )
    elif parallel and not _picklable(connect):
        raise ValueError(
            "PEP249Sink(parallel=True) requires a cloudpicklable connect "
            "factory (each partition task opens its own connection "
            "executor-side); this factory does not serialize — build the "
            "connection inside the factory instead of closing over one, "
            "or pass parallel=False for the driver-side stream."
        )
    columns = df.columns
    ins = _insert_sql(table, columns, paramstyle)

    if create:
        con = connect()
        try:
            cur = con.cursor()
            if overwrite:
                cur.execute(f"DROP TABLE IF EXISTS {table}")
            cur.execute(ddl_for(df, table))
            con.commit()
        finally:
            con.close()

    if parallel:
        def write_partition(rows) -> None:
            con = connect()
            try:
                cur = con.cursor()
                batch = []
                for row in rows:
                    batch.append(tuple(row))
                    if len(batch) >= batch_size:
                        _insert_rows(cur, table, columns, paramstyle, ins, batch)
                        batch.clear()
                _insert_rows(cur, table, columns, paramstyle, ins, batch)
                con.commit()
            finally:
                con.close()

        df.foreachPartition(write_partition)
        # count from the target: foreachPartition returns nothing
        con = connect()
        try:
            cur = con.cursor()
            cur.execute(f"SELECT COUNT(*) FROM {table}")
            return int(cur.fetchone()[0])
        finally:
            con.close()

    n = 0
    con = connect()
    try:
        cur = con.cursor()
        batch = []
        for row in df.toLocalIterator(prefetchPartitions=True):
            batch.append(tuple(row))
            if len(batch) >= batch_size:
                _insert_rows(cur, table, columns, paramstyle, ins, batch)
                n += len(batch)
                batch.clear()
        if batch:
            _insert_rows(cur, table, columns, paramstyle, ins, batch)
            n += len(batch)
        con.commit()
    finally:
        con.close()
    return n


def jsonl_sink(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Export as JSON-lines — the counterpart of ``JSONLSource`` and the
    format downstream training loaders consume. Fully distributed (one
    file per task); ``partition_by`` lays out directories by e.g.
    (split, source), and ``max_records_per_file`` bounds shard size so a
    loader can stream fixed-size shards. Compression via the standard
    writer option (``df.write.option('compression', 'gzip')``-style
    options are accepted through the returned writer chain).
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.json(path)


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    properties: dict | None = None,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """JVM-native RDBMS load: ``df.write.jdbc``. One connection per
    partition, inserts batched ``batch_size`` at a time, no Python in
    the data path — use this over :func:`PEP249Sink` whenever a JDBC
    driver jar is available. ``num_partitions`` caps the connection
    count (a 1000-partition frame should not open 1000 connections
    against one primary)."""
    props = {"batchsize": str(batch_size), **(properties or {})}
    out = df
    if num_partitions is not None and df.rdd.getNumPartitions() > num_partitions:
        out = df.coalesce(num_partitions)
    out.write.jdbc(url, table, mode=mode, properties=props)


class PEP249Target:
    """endload target: where + how to load the finished warehouse.

    ``Engine.endload(target=PEP249Target(connect))`` loads every
    registered table into the external database in FK order (referenced
    dimensions before referencing facts), mirroring the reference's
    commit-time flush ordering (ref ``tables.py:2560-2563``).
    """

    def __init__(
        self,
        connect: Callable[[], object],
        *,
        paramstyle: str = "qmark",
        parallel: bool = False,
        batch_size: int = 10_000,
    ):
        self.connect = connect
        self.paramstyle = paramstyle
        self.parallel = parallel
        self.batch_size = batch_size

    def load(self, df: DataFrame, table: str) -> int:
        return PEP249Sink(
            df,
            self.connect,
            table,
            paramstyle=self.paramstyle,
            parallel=self.parallel,
            batch_size=self.batch_size,
        )
