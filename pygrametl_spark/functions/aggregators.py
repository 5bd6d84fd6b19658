"""Aggregation facade (reference ``pygrametl/aggregators.py`` parity).

The reference implements incremental hash-aggregators (Sum/Count/
CountDistinct/Max/Min/Avg, ``aggregators.py:68-128``) that a driver feeds
row by row. In Spark every one of them is a built-in hash aggregate with
map-side partial aggregation — we only provide the facade so user code
reads the same, plus ``finish``-style defaulting via ``coalesce``.

Crosstab (reference ``CrossTabbingSource``, ``datasources.py:609-665``)
maps to ``groupBy().pivot().agg()`` — pivot values should be supplied
when known: that skips the extra distinct-collection job Spark otherwise
runs, which matters when the pivot column is scanned from 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Sum", "Count", "CountDistinct", "Max", "Min", "Avg",
    "PandasAggregator", "crosstab", "Aggregator", "SimpleAggregator",
]


class _Aggregator:
    """Facade matching the reference's Aggregator protocol
    (``aggregators.py:49-65``): ``process`` accumulates, ``finish``
    finalizes with a default for empty groups. Batch restatement: the
    instance is a Column factory usable inside ``groupBy().agg()``."""

    _fn = None

    def __init__(self, column, default=None):
        self._column = column
        self._default = default

    def column(self, alias: str | None = None) -> Column:
        c = type(self)._fn(self._column)
        if self._default is not None:
            c = F.coalesce(c, F.lit(self._default))
        return c.alias(alias) if alias else c


class Sum(_Aggregator):
    _fn = staticmethod(F.sum)


class Count(_Aggregator):
    _fn = staticmethod(F.count)


class CountDistinct(_Aggregator):
    # Exact distinct (the reference keeps a per-group set,
    # aggregators.py:93-104). At 100 TB prefer approx_count_distinct.
    _fn = staticmethod(F.countDistinct)


class Max(_Aggregator):
    _fn = staticmethod(F.max)


class Min(_Aggregator):
    _fn = staticmethod(F.min)


class Avg(_Aggregator):
    _fn = staticmethod(F.avg)


class PandasAggregator(_Aggregator):
    """User-defined aggregation — the extension point for *subclass
    Aggregator* in the reference (``aggregators.py:49-54``).

    ``fn`` takes a ``pandas.Series`` of the group's values and returns a
    scalar; it runs as an Arrow-batched GROUPED_AGG pandas UDF, the
    vectorized UDAF path (one Python call per group per partition with
    map-side partial *transfer* — not per row). Built-ins beat this by
    10-100x when they exist; reach for it only for aggregations Spark
    genuinely lacks.

    >>> med = PandasAggregator("price", lambda s: s.median())
    >>> df.groupBy("k").agg(med.column("median_price"))
    """

    def __init__(self, column, fn, returntype: str = "double", default=None):
        super().__init__(column, default)
        import pandas as pd

        # the Series->scalar type hints are what make Spark treat this
        # as a GROUPED_AGG (UDAF) rather than a scalar UDF; set as real
        # objects because this module has postponed (string) annotations
        def _grouped(s):
            return fn(s)

        _grouped.__annotations__ = {"s": pd.Series, "return": float}
        self._udf = F.pandas_udf(_grouped, returntype)

    def column(self, alias: str | None = None) -> Column:
        c = self._udf(self._column)
        if self._default is not None:
            c = F.coalesce(c, F.lit(self._default))
        return c.alias(alias) if alias else c


def crosstab(
    df: DataFrame,
    rowvaluesatt: str,
    colvaluesatt: str,
    values: str,
    aggregator: Column | None = None,
    *,
    colvalues: list | None = None,
    nonevalue=0,
    sortrows: bool = False,
) -> DataFrame:
    """Pivot/crosstab (ref ``CrossTabbingSource`` datasources.py:609-665).

    rows = distinct values of ``rowvaluesatt``; columns = distinct values
    of ``colvaluesatt`` (pass ``colvalues`` to avoid the distinct-scan
    job); cells = aggregate of ``values`` (default Sum); empty cells get
    ``nonevalue``; ``sortrows`` mirrors the reference's sorted() output.
    """
    agg = aggregator if aggregator is not None else F.sum(values)
    g = df.groupBy(rowvaluesatt)
    p = g.pivot(colvaluesatt, colvalues) if colvalues else g.pivot(colvaluesatt)
    out = p.agg(agg)
    if nonevalue is not None:
        out = out.fillna(nonevalue)
    if sortrows:
        out = out.orderBy(rowvaluesatt)
    return out


# Reference API aliases (ref aggregators.py:49-65): users subclass
# Aggregator/SimpleAggregator with process/finish; the batch restatement
# is the Column-factory protocol of _Aggregator (or PandasAggregator for
# arbitrary Python finalization over Arrow batches).
Aggregator = _Aggregator
SimpleAggregator = _Aggregator
