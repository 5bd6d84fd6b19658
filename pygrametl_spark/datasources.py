"""Drop-in module facade for ``pygrametl.datasources``.

Every public name of the reference module (ref datasources.py) resolves
here to its Spark-native implementation; ``SQLSource`` additionally has
the partition-parallel ``PEP249Source`` variant, and ``CSVSource`` is
the engine's reader for the reference's csv.DictReader idiom.
"""

from pygrametl_spark.sources.sources import (  # noqa: F401
    CSVSource,
    CrossTabbingSource,
    DynamicForEachSource,
    FilteringSource,
    HashJoiningSource,
    JSONLSource,
    JoiningSource,
    MappingSource,
    MergeJoiningSource,
    PandasSource,
    PEP249Source,
    ProcessSource,
    RoundRobinSource,
    SQLSource,
    SQLTransformingSource,
    TransformingSource,
    TypedCSVSource,
    UnionSource,
)

__all__ = [
    "CSVSource", "CrossTabbingSource", "DynamicForEachSource",
    "FilteringSource", "HashJoiningSource", "JSONLSource", "JoiningSource",
    "MappingSource", "MergeJoiningSource", "PEP249Source", "PandasSource",
    "ProcessSource", "RoundRobinSource", "SQLSource",
    "SQLTransformingSource", "TransformingSource", "TypedCSVSource",
    "UnionSource",
]
