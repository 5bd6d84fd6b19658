"""Column-level function library.

Parity targets the scalar/row helpers of the reference's
``pygrametl/__init__.py`` (casts, date parsing, projection/rename) plus
the aggregation facade of ``pygrametl/aggregators.py``. Everything here
returns/works on :class:`pyspark.sql.Column` so expressions stay inside
whole-stage codegen (no Python in the hot path).
"""

from pygrametl_spark.functions.helpers import (  # noqa: F401
    copy,
    datespan,
    getbool,
    getdate,
    getfloat,
    getint,
    getstr,
    getstrippedstr,
    gettimestamp,
    getvalue,
    getvalueor,
    keepasis,
    project,
    rename,
    renamefromto,
    renametofrom,
    setdefaults,
    tolower,
    toupper,
    ymdhmsparser,
    ymdparser,
)
from pygrametl_spark.functions.aggregators import (  # noqa: F401
    Avg,
    Count,
    CountDistinct,
    Max,
    Min,
    Sum,
    crosstab,
)
