"""Drop-in module facade for ``pygrametl.tables``.

Every public name of the reference module (ref tables.py) resolves here
to its Spark-native implementation, so reference call sites can switch
``from pygrametl.tables import X`` to
``from pygrametl_spark.tables import X`` unchanged.
"""

from pygrametl_spark.operators.dimension import (  # noqa: F401
    BulkDimension,
    CachedBulkDimension,
    CachedDimension,
    DecoupledDimension,
    Dimension,
)
from pygrametl_spark.operators.facttable import (  # noqa: F401
    AccumulatingSnapshotFactTable,
    BatchFactTable,
    BulkFactTable,
    DecoupledFactTable,
    FactTable,
    SubprocessFactTable,
)
from pygrametl_spark.operators.scd import (  # noqa: F401
    SlowlyChangingDimension,
    TypeOneSlowlyChangingDimension,
)
from pygrametl_spark.operators.snowflake import SnowflakedDimension  # noqa: F401
from pygrametl_spark.plans.joins import (  # noqa: F401
    BasePartitioner,
    DimensionPartitioner,
    FactTablePartitioner,
)
from pygrametl_spark.sinks import definequote  # noqa: F401

__all__ = [
    "AccumulatingSnapshotFactTable", "BasePartitioner", "BatchFactTable",
    "BulkDimension", "BulkFactTable", "CachedBulkDimension",
    "CachedDimension", "DecoupledDimension", "DecoupledFactTable",
    "Dimension", "DimensionPartitioner", "FactTable",
    "FactTablePartitioner", "SlowlyChangingDimension",
    "SnowflakedDimension", "SubprocessFactTable",
    "TypeOneSlowlyChangingDimension", "definequote",
]
