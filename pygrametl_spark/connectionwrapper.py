"""PEP 249 connection facade (drop-in for pygrametl.ConnectionWrapper).

The reference's central abstraction is a wrapper that lets ETL code talk
to any PEP 249 database using 'pyformat' parameters, translating naively
to the driver's actual paramstyle (ref __init__.py:654-1000). In this
engine the warehouse itself is Spark DataFrames, so the wrapper is NOT
on the hot path — it exists for the external-RDBMS edges: DTT database
state management (dtt.py), PEP249Source prefetch, and PEP249Sink loads,
plus source compatibility for reference call sites.

Re-implemented from the documented behavior; translations are the same
"simple and naive" contract the reference documents — ``%%(name)s``
escapes are not considered.
"""

from __future__ import annotations

import importlib
import re

from pygrametl_spark.FIFODict import FIFODict

__all__ = [
    "ConnectionWrapper",
    "BackgroundConnectionWrapper",
    "Error",
    "InterfaceError",
    "getdefaulttargetconnection",
]


class Error(Exception):
    """Generic error for the connection facade (parity: ref __init__.py Error)."""


class InterfaceError(Error):
    """Raised for unsupported paramstyles or misuse of the facade."""


_defaulttargetconnection = None

_PYFORMAT_RE = re.compile(r"%\(([A-Za-z0-9_]+)\)s")


def getdefaulttargetconnection():
    """Return the first-created (or last ``setasdefault``'ed) wrapper."""
    return _defaulttargetconnection


class ConnectionWrapper:
    """Uniform facade over a PEP 249 connection.

    ETL code writes 'pyformat' SQL (``%(name)s``); the wrapper translates
    it to the driver's paramstyle ('qmark', 'format', 'numeric', 'named',
    or 'pyformat') with a FIFO cache of translated statements, and returns
    result rows as dicts.
    """

    def __init__(self, connection, stmtcachesize=1000, paramstyle=None,
                 copyintonew=False):
        self._connection = connection
        self._cursor = connection.cursor()
        self.nametranslator = lambda s: s
        self._module = None
        self.getunderlyingmodule()
        if paramstyle is None:
            paramstyle = getattr(self._module, "paramstyle", "qmark") \
                if self._module is not None else "qmark"
        if paramstyle not in ("pyformat", "qmark", "format", "numeric", "named"):
            raise InterfaceError(f"The paramstyle '{paramstyle}' is not supported")
        self._paramstyle = paramstyle
        self._copyintonew = copyintonew
        self._translations = FIFODict(max(stmtcachesize, 1))

        global _defaulttargetconnection
        if _defaulttargetconnection is None:
            _defaulttargetconnection = self

    # -- statement translation -------------------------------------------
    def _translated(self, stmt):
        """(translated_stmt, ordered_names | None). None = dict params."""
        cached = self._translations.get(stmt)
        if cached is not None:
            return cached
        names = _PYFORMAT_RE.findall(stmt)
        style = self._paramstyle
        if style == "pyformat":
            out = (stmt, names if self._copyintonew else None)
        elif style == "named":
            out = (_PYFORMAT_RE.sub(r":\1", stmt), None)
        elif style == "qmark":
            out = (_PYFORMAT_RE.sub("?", stmt), names)
        elif style == "format":
            out = (_PYFORMAT_RE.sub("%s", stmt), names)
        else:  # numeric
            n = [0]

            def _num(_m):
                n[0] += 1
                return f":{n[0]}"

            out = (_PYFORMAT_RE.sub(_num, stmt), names)
        self._translations[stmt] = out
        return out

    def _args_for(self, stmt, arguments, namemapping):
        translated, names = self._translated(stmt)
        if arguments is None:
            return translated, None
        if namemapping:
            arguments = {
                n: arguments[namemapping.get(n, n)]
                for n in set(_PYFORMAT_RE.findall(stmt))
            }
        if names is None:
            return translated, arguments
        if self._paramstyle in ("pyformat", "named"):
            return translated, {n: arguments[n] for n in names}
        return translated, [arguments[n] for n in names]

    # -- execution -------------------------------------------------------
    def execute(self, stmt, arguments=None, namemapping=None, translate=True):
        """Execute one statement; pyformat params translated unless
        ``translate=False``."""
        if not translate:
            self._cursor.execute(stmt) if arguments is None \
                else self._cursor.execute(stmt, arguments)
            return
        translated, args = self._args_for(stmt, arguments, namemapping)
        if args is None:
            self._cursor.execute(translated)
        else:
            self._cursor.execute(translated, args)

    def executemany(self, stmt, params, translate=True):
        """Execute the statement once per parameter set."""
        if not translate:
            self._cursor.executemany(stmt, params)
            return
        rows = [self._args_for(stmt, p, None)[1] for p in params]
        translated, _ = self._translated(stmt)
        self._cursor.executemany(translated, rows)

    # -- results ---------------------------------------------------------
    def resultnames(self):
        if self._cursor.description is None:
            return None
        return tuple(self.nametranslator(d[0]) for d in self._cursor.description)

    def rowfactory(self, names=None):
        """Generator of result rows as dicts."""
        names = names or self.resultnames()
        while True:
            row = self._cursor.fetchone()
            if row is None:
                return
            yield dict(zip(names, row))

    def fetchone(self, names=None):
        names = names or self.resultnames()
        row = self._cursor.fetchone()
        if row is None:
            # parity: reference returns an all-None dict at exhaustion
            return dict.fromkeys(names) if names else None
        return dict(zip(names, row))

    def fetchonetuple(self):
        row = self._cursor.fetchone()
        if row is None and self._cursor.description is not None:
            return (None,) * len(self._cursor.description)
        return row

    def fetchmany(self, cnt, names=None):
        names = names or self.resultnames()
        return [dict(zip(names, r)) for r in self._cursor.fetchmany(cnt)]

    def fetchmanytuples(self, cnt):
        return self._cursor.fetchmany(cnt)

    def fetchall(self, names=None):
        names = names or self.resultnames()
        return [dict(zip(names, r)) for r in self._cursor.fetchall()]

    def fetchalltuples(self):
        return self._cursor.fetchall()

    def rowcount(self):
        return self._cursor.rowcount

    # -- lifecycle -------------------------------------------------------
    def getunderlyingmodule(self):
        """The PEP 249 module of the wrapped connection (best effort)."""
        if self._module is None:
            mod = type(self._connection).__module__
            for name in (mod, mod.split(".")[0]):
                try:
                    cand = importlib.import_module(name)
                except Exception:  # noqa: BLE001
                    continue
                if hasattr(cand, "paramstyle"):
                    self._module = cand
                    break
        return self._module

    def commit(self):
        self._connection.commit()

    def rollback(self):
        self._connection.rollback()

    def close(self):
        global _defaulttargetconnection
        if _defaulttargetconnection is self:
            _defaulttargetconnection = None
        self._connection.close()

    def setasdefault(self):
        global _defaulttargetconnection
        _defaulttargetconnection = self

    def cursor(self):
        return self._connection.cursor()


# The reference's BackgroundConnectionWrapper runs statements in a helper
# thread/process purely for pipeline overlap (ref __init__.py:1031-1280 —
# documented as NOT recommended). Execution overlap is Spark's job here,
# so the facade preserves the API with synchronous semantics.
BackgroundConnectionWrapper = ConnectionWrapper
