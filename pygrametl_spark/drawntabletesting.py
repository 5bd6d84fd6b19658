"""Drop-in module facade for ``pygrametl.drawntabletesting``.

Reference public surface (ref drawntabletesting/__init__.py): ``Table``,
``Variable``, ``connectionwrapper``. The Spark implementation lives in
``pygrametl_spark.dtt``; assertions compare against DataFrames or a live
PEP 249 test database.
"""

from pygrametl_spark.dtt import (  # noqa: F401
    Table,
    Variable,
    assertDisjoint,
    assertEqual,
    assertSubset,
    connectionwrapper,
)

__all__ = [
    "Table", "Variable", "assertDisjoint", "assertEqual", "assertSubset",
    "connectionwrapper",
]
