"""JVM-local sidecar relations.

``spark.createDataFrame(list_of_rows)`` parallelizes PICKLED rows into a
Python-RDD-backed relation: every downstream action re-launches Python
workers just to deserialize the sidecar, and broadcasting it first needs
a collect job over that Python RDD. Driver-computed sidecars (kmeans
centroids, connected-component labels, key lists) sit inside plans that
are otherwise pure JVM — the Python scan is the only reason those plans
ever touch a Python worker (guide §4: eliminate the boundary, not just
batch it).

:func:`local_relation` builds the same rows as a ``VALUES``-literal
``LocalRelation`` instead: one SQL parse on the driver, every action
JVM-only, and a broadcast of it needs no job at all. Literal text is
exact for the supported types (integers as decimal text, doubles via
``repr`` — shortest round-trip, so the parsed double is bit-identical —
strings escaped, arrays element-wise), so values are unchanged vs the
pickled path. For sidecars beyond ``max_values_rows``, or any type the
literal writer does not support, the pickled path is kept: a VALUES
tree that size would stress the analyzer, and a relation that big
should not be driver-side in the first place.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

__all__ = ["local_relation"]

# Above this, fall back to spark.createDataFrame: the sidecar is no
# longer "small", and a million-expression VALUES tree costs more to
# analyze than the Python scan it removes.
_MAX_VALUES_ROWS = 20_000


class _Unsupported(ValueError):
    pass


def _lit(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    t = typ.strip().lower()
    if t.startswith("array<"):
        inner = t[6:-1]
        return "array(" + ", ".join(_lit(x, inner) for x in v) + ")"
    if t in ("double", "float"):
        f = float(v)
        if math.isnan(f):
            return f"CAST('NaN' AS {typ})"
        if math.isinf(f):
            s = "Infinity" if f > 0 else "-Infinity"
            return f"CAST('{s}' AS {typ})"
        # repr is the shortest string that round-trips the exact value;
        # CAST from string fixes the SQL type (a bare decimal literal
        # would parse as DECIMAL).
        return f"CAST('{f!r}' AS {typ})"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return f"CAST({int(v)} AS {typ})"
    if t in ("boolean", "bool"):
        return "true" if v else "false"
    if t == "string":
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    raise _Unsupported(f"local_relation: unsupported literal type {typ!r}")


def local_relation(
    spark: SparkSession,
    rows,
    schema: str,
    *,
    max_values_rows: int = _MAX_VALUES_ROWS,
) -> DataFrame:
    """DataFrame over driver-side ``rows`` as a JVM ``LocalRelation``.

    ``schema`` is a simple DDL string (``"_id bigint, _label bigint"``).
    ``rows`` is an iterable of tuples/lists in schema order. Falls back
    to ``spark.createDataFrame`` for empty input (zero work either way),
    for more than ``max_values_rows`` rows, and for literal types the
    VALUES writer does not support — the fallback is always
    value-identical, just Python-RDD-backed.
    """
    fields = []
    for part in _split_top(schema):
        name, typ = part.strip().split(None, 1)
        fields.append((name, typ))
    rows = list(rows)
    if not rows or len(rows) > max_values_rows:
        return spark.createDataFrame(rows, schema=schema)
    try:
        tuples = ", ".join(
            "(" + ", ".join(_lit(v, typ) for v, (_, typ) in zip(r, fields)) + ")"
            for r in rows
        )
    except _Unsupported:
        return spark.createDataFrame(rows, schema=schema)
    cols = ", ".join(
        f"CAST(`{name}` AS {typ}) AS `{name}`" for name, typ in fields
    )
    names = ", ".join(f"`{name}`" for name, _ in fields)
    return spark.sql(f"SELECT {cols} FROM VALUES {tuples} AS t({names})")


def _split_top(schema: str) -> "list[str]":
    """Split a simple DDL string on top-level commas (array<..> safe)."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
