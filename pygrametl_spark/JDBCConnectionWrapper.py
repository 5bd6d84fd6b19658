"""Import-parity module for the reference's Jython-only JDBC wrappers
(reference ``pygrametl/JDBCConnectionWrapper.py:50-310``).

The reference classes wrap a ``java.sql.Connection`` and only exist
under Jython; on CPython/Spark the same deliverables are covered by:

* :class:`pygrametl_spark.connectionwrapper.ConnectionWrapper` — the
  paramstyle-translating PEP 249 wrapper the table API talks through
  (the reference class's actual role);
* :func:`pygrametl_spark.sinks.jdbc_sink` — the distributed JDBC *load*
  path (Spark's own JVM writes over JDBC from every executor, which is
  what a JDBC bulk load should be on a cluster).

So this module keeps reference call sites importable:
``JDBCConnectionWrapper``/``BackgroundJDBCConnectionWrapper`` accept a
PEP 249 connection (there is no java.sql.Connection on CPython) and
delegate to :class:`ConnectionWrapper`, which implements the same
cursor-free execute/fetch/commit surface. ``Background*`` is a plain
alias: the reference's background thread serialized all work through
one queue anyway, and the wrapper here is already single-threaded
driver-side glue — parallel loading belongs to ``jdbc_sink``.
"""

from __future__ import annotations

from .connectionwrapper import ConnectionWrapper
from .sinks import jdbc_sink  # noqa: F401 — re-exported: the bulk load path

__all__ = [
    "JDBCConnectionWrapper", "BackgroundJDBCConnectionWrapper", "jdbc_sink",
]


class JDBCConnectionWrapper(ConnectionWrapper):
    """PEP 249-backed stand-in for the Jython JDBC wrapper (reference
    JDBCConnectionWrapper.py:50-88): same public surface (execute/
    executemany/fetch*/rowfactory/commit/close/setasdefault), with the
    reference's default statement-cache size."""

    def __init__(self, jdbcconn, stmtcachesize: int = 20, **kwargs):
        super().__init__(jdbcconn, stmtcachesize=stmtcachesize, **kwargs)


class BackgroundJDBCConnectionWrapper(JDBCConnectionWrapper):
    """Reference JDBCConnectionWrapper.py:311-540 — identical surface,
    work serialized through a background thread there; plain synchronous
    delegation here (driver-side glue is not the distributed load path;
    use :func:`jdbc_sink` for parallel writes)."""
