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

# Module-level helper parity: every public function of the reference's
# pygrametl/__init__.py resolves at pygrametl_spark top level, so
# ``import pygrametl_spark as pygrametl`` keeps reference code running.
from pygrametl_spark.functions.helpers import (  # noqa: F401
    copy,
    datereader,
    datespan,
    datetimereader,
    getbool,
    getdate,
    getdbfriendlystr,
    getfloat,
    getint,
    getsqlfriendlystr,
    getstr,
    getstrippedstr,
    getstrornullvalue,
    gettimestamp,
    getvalue,
    getvalueor,
    keepasis,
    now,
    project,
    rename,
    renamefromto,
    renametofrom,
    rowfactory,
    setdefaults,
    today,
    tolower,
    toupper,
    ymdhmsparser,
    ymdparser,
)
from pygrametl_spark.connectionwrapper import (  # noqa: F401
    BackgroundConnectionWrapper,
    ConnectionWrapper,
    Error,
    InterfaceError,
    getdefaulttargetconnection,
)

#: Engines registered for the module-level :func:`endload` facade.
_engines: list = []


def set_default_engine(engine) -> None:
    """Register an :class:`pygrametl_spark.engine.Engine` so the
    module-level :func:`endload` (reference ``pygrametl.endload``,
    ref __init__.py:442-448) can finalize its tables."""
    if engine not in _engines:
        _engines.append(engine)


def endload(**kwargs) -> None:
    """Finalize all registered engines (ref endload semantics: signal
    every table that loading is done). No-op when nothing is registered."""
    for engine in _engines:
        engine.endload(**kwargs)
