"""pygrametl_spark — a PySpark-native dimensional ETL / analytics engine.

A from-scratch engine with the query and data-processing capabilities of
pygrametl (chrthomsen/pygrametl, studied read-only at /root/reference),
re-expressed set-at-a-time on Spark DataFrames: sources, row transforms,
dimension lookup/ensure with deterministic surrogate keys, slowly
changing dimensions (type 1 + 2) with as-of lookup, snowflake schemas,
fact loading, crosstab aggregation — plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns)
a 100 TB pipeline needs.
"""

__version__ = "0.1.0"

from pygrametl_spark.session import get_spark  # noqa: F401
from pygrametl_spark.catalog import Catalog, load_catalog  # noqa: F401
from pygrametl_spark.operators import (  # noqa: F401
    AccumulatingSnapshotFactTable,
    BatchFactTable,
    BulkDimension,
    BulkFactTable,
    CachedDimension,
    Dimension,
    FactTable,
    SlowlyChangingDimension,
    SnowflakedDimension,
    TypeOneSlowlyChangingDimension,
)
from pygrametl_spark.operators.scd import scd2_from_history  # noqa: F401
from pygrametl_spark.functions import helpers  # noqa: F401
from pygrametl_spark.functions.helpers import datespan, project  # noqa: F401
