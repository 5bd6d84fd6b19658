"""Drop-in module facade for ``pygrametl.aggregators``.

The reference's row-at-a-time aggregator hierarchy (ref aggregators.py)
maps to Spark aggregate expressions; ``Aggregator`` subclasses with a
custom ``process`` run as Arrow-batched GROUPED_AGG pandas UDAFs.
"""

from pygrametl_spark.functions.aggregators import (  # noqa: F401
    Aggregator,
    Avg,
    Count,
    CountDistinct,
    Max,
    Min,
    PandasAggregator,
    SimpleAggregator,
    Sum,
    crosstab,
)

__all__ = [
    "Aggregator", "Avg", "Count", "CountDistinct", "Max", "Min",
    "PandasAggregator", "SimpleAggregator", "Sum", "crosstab",
]
