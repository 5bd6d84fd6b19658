from pygrametl_spark.operators.dimension import Dimension, CachedDimension, BulkDimension  # noqa: F401
from pygrametl_spark.operators.facttable import (  # noqa: F401
    AccumulatingSnapshotFactTable,
    BatchFactTable,
    BulkFactTable,
    FactTable,
)
from pygrametl_spark.operators.scd import SlowlyChangingDimension, TypeOneSlowlyChangingDimension  # noqa: F401
from pygrametl_spark.operators.snowflake import SnowflakedDimension  # noqa: F401
