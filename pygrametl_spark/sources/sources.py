"""Data sources (reference ``pygrametl/datasources.py`` parity).

Every reference source is a Python iterable of dicts; every source here
is a function returning a :class:`DataFrame` — the schema travels with
the relation and Catalyst sees through the whole chain (filter/projection
pushdown into the file scan, which matters enormously at 100 TB).

Naming keeps the reference's class names so user code maps 1:1; the
"classes" are constructor functions (a DataFrame needs no wrapper).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pygrametl_spark.functions.aggregators import crosstab

__all__ = [
    "CSVSource", "TypedCSVSource", "JSONLSource", "SQLSource", "PEP249Source",
    "PandasSource",
    "ProcessSource", "DynamicForEachSource", "HashJoiningSource",
    "JoiningSource", "MergeJoiningSource", "FilteringSource",
    "MappingSource", "TransformingSource", "SQLTransformingSource",
    "UnionSource", "RoundRobinSource", "CrossTabbingSource",
]


def CSVSource(spark: SparkSession, path: str | list, *, delimiter: str = ",", header: bool = True, **options) -> DataFrame:
    """CSV scan (ref ``CSVSource = csv.DictReader`` datasources.py:72).
    All values arrive as strings, like DictReader; pass a schema or use
    TypedCSVSource for typed columns."""
    return spark.read.options(sep=delimiter, header=header, **options).csv(path)


def TypedCSVSource(
    spark: SparkSession,
    path: str | list,
    casts: Mapping[str, str],
    *,
    delimiter: str = ",",
    header: bool = True,
    strict: bool = False,
    **options,
) -> DataFrame:
    """CSV scan + per-column casts (ref datasources.py:75-132). ``casts``
    maps column -> Spark type name; uncast columns stay strings.

    Default (``strict=False``): cast failures yield NULL — the total
    pipeline; filter on isNull to collect rejects. ``strict=True``
    matches the reference exactly (ref datasources.py:123-129 raises
    ``ValueError`` per bad row): an ANSI ``cast`` makes the FIRST bad
    value fail the job with the offending value in the error. At scale
    prefer the default + a reject-side filter: one poisoned row among
    billions shouldn't kill a 6-hour load."""
    df = CSVSource(spark, path, delimiter=delimiter, header=header, **options)
    for c, t in casts.items():
        if strict:
            # ANSI-mode cast raises CAST_INVALID_INPUT on malformed values
            df = df.withColumn(c, F.expr(f"cast(`{c}` AS {t})"))
        else:
            df = df.withColumn(c, F.col(c).try_cast(t))
    return df


def JSONLSource(
    spark: SparkSession,
    path: str | list,
    *,
    schema: str | None = None,
    **options,
) -> DataFrame:
    """JSON-lines scan — the interchange format LLM corpora actually
    ship in (one JSON object per line). Net-new surface (the reference
    has no JSON source). Pass ``schema`` (DDL string) to skip the
    inference pass: at 100 TB, schema inference is a full extra read of
    the data — production readers always pin the schema.
    """
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def SQLSource(
    spark: SparkSession,
    query: str,
    *,
    names: Sequence[str] = (),
    views: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Scan the result set of one SQL query (ref datasources.py:135-217).
    ``views`` registers DataFrames as temp views first (the engine's
    stand-in for a PEP 249 connection); ``names`` renames the output
    columns positionally like the reference's ``names`` argument."""
    for name, df in (views or {}).items():
        df.createOrReplaceTempView(name)
    out = spark.sql(query)
    if names:
        out = out.toDF(*names)
    return out


def PEP249Source(
    spark: SparkSession,
    connect: Callable[[], object],
    query: str,
    *,
    names: Sequence[str] = (),
    parameters=None,
    fetchsize: int = 50_000,
    partition_predicates: Sequence[str] | None = None,
    schema=None,
) -> DataFrame:
    """Scan the result set of one SQL query on an external PEP 249
    database (ref ``SQLSource`` datasources.py:135-217).

    ``connect`` is a zero-arg factory returning a fresh DB-API
    connection — a factory, not a connection, because connections don't
    pickle and at scale each executor task must open its own. For the
    partitioned path the factory itself must cloudpickle: a plain
    ``lambda: drivermod.connect(...)`` works; passing a C-extension
    function like ``duckdb.connect`` directly does not.

    Two paths:

    - **Driver read** (default): cursor ``fetchmany(fetchsize)`` batches
      -> pandas -> Arrow -> DataFrame. Fine for dimension-sized scans.
    - **Partitioned read** (``partition_predicates``): the Spark-native
      scale path, same shape as JDBC's ``predicates`` option. Each
      predicate (e.g. ``"id % 4 = 0"``) replaces ``$CONDITIONS`` in the
      query (or is appended as ``WHERE``); one executor task per
      predicate opens its own connection and streams its slice, so a
      1000-partition read is 1000 parallel cursors — the driver never
      sees the data. The result schema comes from ``schema`` or from a
      driver-side probe of the first predicate with ``LIMIT 0``.

    The reference's ``initsql``/``cursorarg`` knobs are connection-setup
    concerns: run them inside your ``connect`` factory.
    """
    import pandas as pd

    def run_query(cur, q, params):
        cur.execute(q, params) if params is not None else cur.execute(q)

    def to_pdf(cur, rows):
        cols = list(names) if names else [d[0] for d in cur.description]
        return pd.DataFrame.from_records(list(rows), columns=cols)

    def bind(predicate: str) -> str:
        if "$CONDITIONS" in query:
            return query.replace("$CONDITIONS", predicate)
        return f"SELECT * FROM ({query}) AS _q WHERE {predicate}"

    if partition_predicates:
        preds = list(partition_predicates)
        if schema is None:
            # cursor.description carries names but not portable types,
            # so infer from one driver-side probe batch
            con = connect()
            try:
                cur = con.cursor()
                run_query(cur, bind(preds[0]), parameters)
                probe = to_pdf(cur, cur.fetchmany(fetchsize))
                schema = spark.createDataFrame(probe).schema
            finally:
                con.close()

        def read_slice(iterator):
            for pdf in iterator:
                for pred in pdf["_pred"]:
                    con = connect()
                    try:
                        cur = con.cursor()
                        run_query(cur, bind(pred), parameters)
                        while True:
                            rows = cur.fetchmany(fetchsize)
                            if not rows:
                                break
                            yield to_pdf(cur, rows)
                    finally:
                        con.close()

        pred_df = spark.createDataFrame([(p,) for p in preds], ["_pred"]).repartition(len(preds), "_pred")
        return pred_df.mapInPandas(read_slice, schema=schema)

    con = connect()
    try:
        cur = con.cursor()
        run_query(cur, query, parameters)
        chunks = []
        while True:
            rows = cur.fetchmany(fetchsize)
            if not rows:
                break
            chunks.append(to_pdf(cur, rows))
        pdf = pd.concat(chunks, ignore_index=True) if chunks else to_pdf(cur, [])
        return spark.createDataFrame(pdf, schema=schema)
    finally:
        con.close()


def PandasSource(spark: SparkSession, df) -> DataFrame:
    """pandas DataFrame scan via Arrow (ref datasources.py:220-233)."""
    return spark.createDataFrame(df)


def ProcessSource(source: DataFrame, **_ignored) -> DataFrame:
    """Ref datasources.py:236-291 runs a source in a separate OS process
    for pipeline overlap. Spark reads are already distributed and
    asynchronous, so this is the identity."""
    return source


def DynamicForEachSource(items: Sequence, callee: Callable[[object], DataFrame]) -> DataFrame:
    """One source per item, drained in sequence (ref datasources.py:741-781)
    — e.g. one CSV per file. Spark-first: build each and union; for plain
    file lists prefer a single multi-path read (one scan node)."""
    dfs = [callee(item) for item in items]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def HashJoiningSource(src1: DataFrame, key1: str, src2: DataFrame, key2: str) -> DataFrame:
    """Equi-join, build side = src2 held in memory (ref datasources.py:296-332).
    Spark restatement: broadcast the build side. Reference semantics: inner
    join; on attribute-name collision src2's value wins (``newrow.update``)."""
    overlap = [c for c in src2.columns if c in src1.columns and c != key2]
    left = src1.drop(*overlap) if overlap else src1
    joined = left.join(F.broadcast(src2), on=F.col(key1) == src2[key2] if key1 != key2 else key1, how="inner")
    if key1 != key2:
        joined = joined.drop(src2[key2]) if key2 in left.columns else joined
    return joined


JoiningSource = HashJoiningSource


def MergeJoiningSource(src1: DataFrame, key1: str, src2: DataFrame, key2: str) -> DataFrame:
    """Merge join of pre-sorted inputs (ref datasources.py:335-401).

    No physical hint: the reference's merge-join is a *semantic* claim
    (inner equi-join of sorted inputs), not a strategy mandate. Catalyst
    already picks sort-merge for two large sides, and leaving the plan
    unhinted keeps a sub-threshold side eligible for (AQE) broadcast
    conversion — forcing ``hint("merge")`` pessimized exactly the common
    small-dimension case (VERDICT r2 item 5)."""
    on = F.col(key1) == src2[key2] if key1 != key2 else key1
    return src1.join(src2, on=on, how="inner")


def FilteringSource(source: DataFrame, condition: Column | str) -> DataFrame:
    """Predicate filter (ref datasources.py:668-686; default bool = drop
    rows that are all-NULL/falsy — express the predicate explicitly here)."""
    return source.filter(condition)


def MappingSource(source: DataFrame, callables: Mapping[str, Callable[[Column], Column]]) -> DataFrame:
    """Per-column transforms (ref datasources.py:404-427). ``callables``
    maps column -> Column function (use ``functions.helpers`` casts)."""
    for c, fn in callables.items():
        source = source.withColumn(c, fn(F.col(c)))
    return source


def TransformingSource(source: DataFrame, *transformations: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Whole-relation transforms applied in order (ref datasources.py:430-448):
    the per-row mutating function becomes a DataFrame->DataFrame transform."""
    for t in transformations:
        source = source.transform(t)
    return source


def SQLTransformingSource(
    source: DataFrame,
    temptablename: str,
    query: str,
) -> DataFrame:
    """Stage rows under a name, transform them with SQL (ref
    datasources.py:451-606, which ships rows to a temp RDBMS table). In
    Spark this is first-class: temp view + ``spark.sql`` — no staging
    copy, the "temp table" is just a plan node."""
    source.createOrReplaceTempView(temptablename)
    return source.sparkSession.sql(query)


def UnionSource(*sources: DataFrame) -> DataFrame:
    """Concatenate sources which may have different schemas
    (ref datasources.py:689-705): missing columns become NULL."""
    out = sources[0]
    for s in sources[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out


def RoundRobinSource(*sources: DataFrame, batchsize: int = 500) -> DataFrame:  # noqa: ARG001
    """Ref datasources.py:708-738 interleaves sources in batches — an
    execution-order detail with no relational meaning; a union yields the
    same multiset of rows."""
    return UnionSource(*sources)


def CrossTabbingSource(
    source: DataFrame,
    rowvaluesatt: str,
    colvaluesatt: str,
    values: str,
    **kw,
) -> DataFrame:
    """Pivot/crosstab (ref datasources.py:609-665) — see
    :func:`pygrametl_spark.functions.aggregators.crosstab`."""
    return crosstab(source, rowvaluesatt, colvaluesatt, values, **kw)
