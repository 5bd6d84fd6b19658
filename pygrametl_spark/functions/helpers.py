"""Scalar/projection/date helpers (reference ``pygrametl/__init__.py`` parity).

The reference operates on one Python dict at a time; every helper here is
the whole-relation (Column / DataFrame) restatement:

- ``getint``/``getfloat``/``getstr``/``getbool`` — casts with
  default-on-failure (reference ``__init__.py:190-289``). Spark's
  ``cast`` yields NULL on failure, so default-on-error is
  ``coalesce(cast, default)`` — same observable semantics, executed
  JVM-side for the whole column.
- ``project``/``copy``/``renamefromto``/``renametofrom`` — projection and
  renames (reference ``__init__.py:106-187``); a per-row dict copy
  becomes a zero-cost ``select`` on the relation.
- ``ymdparser``/``ymdhmsparser``/``getdate``/``gettimestamp`` — date
  parsing (reference ``__init__.py:292-337, 475-516``) via
  ``to_date``/``to_timestamp``.
- ``datespan`` — the date-dimension generator (reference
  ``__init__.py:561-630``), restated as ``sequence()`` + ``explode`` so
  the whole dimension materializes as one distributed expression, not a
  driver-side Python loop.
"""

from __future__ import annotations

import datetime
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "getint", "getfloat", "getstr", "getstrippedstr", "getbool",
    "getdate", "gettimestamp", "ymdparser", "ymdhmsparser",
    "datereader", "datetimereader", "rowfactory", "today", "now",
    "getvalue", "getvalueor", "setdefaults",
    "project", "copy", "rename", "renamefromto", "renametofrom",
    "toupper", "tolower", "keepasis", "datespan",
]


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def getint(value, default=None) -> Column:
    """Cast to int; ``default`` when the cast fails (ref __init__.py:190-208).
    ``try_cast`` keeps the reference's default-on-failure semantics under
    Spark's ANSI mode (plain ``cast`` would raise)."""
    casted = _col(value).try_cast("long")
    return casted if default is None else F.coalesce(casted, F.lit(default))


def getfloat(value, default=None) -> Column:
    casted = _col(value).try_cast("double")
    return casted if default is None else F.coalesce(casted, F.lit(default))


def getstr(value, default=None) -> Column:
    casted = _col(value).try_cast("string")
    return casted if default is None else F.coalesce(casted, F.lit(default))


def getstrippedstr(value, default=None) -> Column:
    return F.trim(getstr(value, default))


def getbool(value, default=None, truevalues=frozenset([True, 1, "1", "t", "true", "True"]),
            falsevalues=frozenset([False, 0, "0", "f", "false", "False"])) -> Column:
    """Membership-based bool coercion (ref __init__.py:241-274)."""
    c = _col(value)
    s = c.cast("string")
    expr = (
        F.when(s.isin([str(v) for v in truevalues]), F.lit(True))
        .when(s.isin([str(v) for v in falsevalues]), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    return expr if default is None else F.coalesce(expr, F.lit(default))


def getdate(value, fmt: str = "yyyy-MM-dd") -> Column:
    """String -> DateType (ref getdate/ymdparser __init__.py:292-311, 475-496)."""
    return F.to_date(_col(value), fmt)


def gettimestamp(value, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    return F.to_timestamp(_col(value), fmt)


ymdparser = getdate
ymdhmsparser = gettimestamp


def datereader(dateattribute: str, parsingfunction=None):
    """Attribute-picking date converter factory (ref __init__.py:519-538).

    The reference returns ``f(targetconnection, row, namemapping)`` used
    as an SCD ``fromfinder``; the Spark restatement returns
    ``f(namemapping=None) -> Column`` resolving the (name-mapped)
    attribute through the parsing function — pass it wherever a date
    Column for a named attribute is needed."""
    parse = parsingfunction or ymdparser

    def readerfunction(namemapping: Mapping[str, str] | None = None) -> Column:
        att = (namemapping or {}).get(dateattribute, dateattribute)
        return parse(att)

    return readerfunction


def datetimereader(datetimeattribute: str, parsingfunction=None):
    """Timestamp twin of :func:`datereader` (ref __init__.py:540-559)."""
    parse = parsingfunction or ymdhmsparser

    def readerfunction(namemapping: Mapping[str, str] | None = None) -> Column:
        att = (namemapping or {}).get(datetimeattribute, datetimeattribute)
        return parse(att)

    return readerfunction


def rowfactory(source: DataFrame, names=None, close: bool = True):  # noqa: ARG001
    """Iterate a DataFrame as dicts (ref rowfactory __init__.py:385-414:
    turns a cursor-like source into dict rows). Driver-side by design —
    for test fixtures and tiny control tables, never a data path;
    ``toLocalIterator`` keeps at most one partition in driver memory.
    ``close`` is accepted for signature parity (nothing to close)."""
    cols = list(names) if names else source.columns
    for row in source.select(*cols).toLocalIterator():
        yield dict(zip(cols, row))


_FROZEN: dict = {}


def today() -> Column:
    """Frozen-at-first-call date literal (ref today/now __init__.py:451-472).

    The reference memoizes the wall clock on first use so one ETL run
    stamps every row identically; the batch analogue is capturing it
    into a *literal* once — never ``current_date()`` evaluated at
    executor whim mid-job."""
    import datetime

    if "today" not in _FROZEN:
        _FROZEN["today"] = datetime.date.today()
    return F.lit(_FROZEN["today"])


def now() -> Column:
    """Frozen-at-first-call timestamp literal (see :func:`today`)."""
    import datetime

    if "now" not in _FROZEN:
        _FROZEN["now"] = datetime.datetime.now().replace(microsecond=0)
    return F.lit(_FROZEN["now"])


def getvalue(row: DataFrame | Mapping, name: str, mapping: Mapping[str, str] | None = None):
    """Attribute access honoring a namemapping (ref __init__.py:340-360)."""
    eff = (mapping or {}).get(name, name)
    if isinstance(row, DataFrame):
        return row[eff]
    return row[eff]


def getvalueor(row, name: str, mapping=None, default=None):
    eff = (mapping or {}).get(name, name)
    if isinstance(row, DataFrame):
        return F.coalesce(F.col(eff), F.lit(default)) if eff in row.columns else F.lit(default)
    return row.get(eff, default)


def setdefaults(df: DataFrame, atts, defaults=None) -> DataFrame:
    """Fill missing/NULL attributes with defaults (ref __init__.py:363-382).

    ``atts`` is either a list of (att, default) pairs or a list of atts with
    a parallel ``defaults`` list. Adds the column when absent; fills NULLs
    when present.
    """
    if defaults is not None:
        pairs = list(zip(atts, defaults))
    else:
        pairs = list(atts)
    for att, default in pairs:
        if att in df.columns:
            df = df.withColumn(att, F.coalesce(F.col(att), F.lit(default)))
        else:
            df = df.withColumn(att, F.lit(default))
    return df


def project(df: DataFrame, atts, renaming: Mapping[str, str] | None = None) -> DataFrame:
    """Keep only ``atts``; ``renaming`` maps target att -> source att
    (ref project __init__.py:106-127: reads ``renaming.get(a, a)``)."""
    renaming = renaming or {}
    return df.select(*[F.col(renaming.get(a, a)).alias(a) for a in atts])


def copy(df: DataFrame, **renaming: str) -> DataFrame:
    """Reference ``copy(row, **renaming)`` (__init__.py:130-143): a copy
    where target key ``t`` takes value of source key ``renaming[t]``.
    Relational form: the full relation with those extra/renamed columns."""
    out = df
    for target, source in renaming.items():
        out = out.withColumn(target, F.col(source))
    return out


def renamefromto(df: DataFrame, renaming: Mapping[str, str]) -> DataFrame:
    """Rename keys: mapping is {from: to} (ref __init__.py:146-166)."""
    for old, new in renaming.items():
        df = df.withColumnRenamed(old, new)
    return df


def renametofrom(df: DataFrame, renaming: Mapping[str, str]) -> DataFrame:
    """Rename keys: mapping is {to: from} (ref __init__.py:169-187)."""
    for new, old in renaming.items():
        df = df.withColumnRenamed(old, new)
    return df


rename = renamefromto


def getdbfriendlystr(value, nullvalue: str = "None") -> Column:
    """Value -> string for delimited load files: booleans to 0/1, NULL to
    ``nullvalue`` (ref getdbfriendlystr __init__.py:190-239)."""
    c = _col(value)
    s = F.when(c.cast("string").isin("true", "false"), (c.cast("boolean").cast("int")).cast("string")).otherwise(
        c.cast("string")
    )
    return F.coalesce(s, F.lit(nullvalue))


def getsqlfriendlystr(value, nullvalue: str = "NULL") -> Column:
    """Value -> quoted SQL literal: single quotes doubled, NULL unquoted
    (ref getsqlfriendlystr __init__.py:242-262)."""
    c = _col(value)
    quoted = F.concat(F.lit("'"), F.regexp_replace(c.cast("string"), "'", "''"), F.lit("'"))
    return F.coalesce(quoted, F.lit(nullvalue))


def getstrornullvalue(value, nullvalue: str = "None") -> Column:
    """Plain str() with a NULL substitute (ref __init__.py:265-274)."""
    return F.coalesce(_col(value).cast("string"), F.lit(nullvalue))


def toupper(value) -> Column:
    return F.upper(_col(value))


def tolower(value) -> Column:
    return F.lower(_col(value))


def keepasis(value) -> Column:
    return _col(value)


def datespan(
    spark: SparkSession,
    fromdate,
    todate,
    *,
    fromdateincl: bool = True,
    todateincl: bool = True,
    key: str = "dateid",
    strings: Mapping[str, str] | None = None,
    ints: Mapping[str, str] | None = None,
    expander=None,
) -> DataFrame:
    """Date-dimension generator (ref ``datespan`` __init__.py:561-630).

    Yields one row per date in the span. ``key`` is an int yyyymmdd.
    ``strings`` maps attribute -> Spark ``date_format`` pattern (defaults
    mirror the reference: date/monthname/weekday); ``ints`` maps
    attribute -> one of year/month/day.

    ``expander`` is the reference's per-row extension hook (ref
    ``__init__.py:600-614``: a callable mutating each row dict),
    restated declaratively: it receives the date ``Column`` and returns
    a mapping of attribute name -> ``Column`` appended to the output —
    e.g. ``lambda d: {"quarter": F.quarter(d), "is_weekend":
    F.dayofweek(d).isin(1, 7)}``. Staying a Column expression keeps the
    whole dimension inside one codegen'd project, with no per-row
    Python at any scale.

    Spark-first: a single ``sequence() -> explode`` expression — the span
    is generated distributed, never as a driver loop, so a 200-year
    calendar at 100 TB scale is still a single cheap task.
    """
    if isinstance(fromdate, str):
        fromdate = datetime.date.fromisoformat(fromdate)
    if isinstance(todate, str):
        todate = datetime.date.fromisoformat(todate)
    if not fromdateincl:
        fromdate = fromdate + datetime.timedelta(days=1)
    if not todateincl:
        todate = todate - datetime.timedelta(days=1)

    if strings is None:
        strings = {"date": "yyyy-MM-dd", "monthname": "MMMM", "weekday": "EEEE"}
    if ints is None:
        ints = {"year": "year", "month": "month", "day": "day"}

    df = spark.range(1).select(
        F.explode(F.sequence(F.lit(fromdate), F.lit(todate))).alias("_d")
    )
    cols = [F.date_format("_d", "yyyyMMdd").cast("int").alias(key)]
    for att, fmt in strings.items():
        cols.append(F.date_format("_d", fmt).alias(att))
    int_fns = {"year": F.year, "month": F.month, "day": F.dayofmonth}
    for att, which in ints.items():
        cols.append(int_fns[which]("_d").cast("int").alias(att))
    if expander is not None:
        for att, col in expander(F.col("_d")).items():
            cols.append(col.alias(att))
    return df.select(*cols)
