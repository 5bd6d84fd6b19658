"""Drop-in API parity: every public name of every reference module
resolves in the matching pygrametl_spark module, and the facade
implementations behave (ref pygrametl/__init__.py, tables.py,
datasources.py, steps.py, aggregators.py, parallel.py, FIFODict.py,
drawntabletesting/__init__.py public surfaces)."""

from __future__ import annotations

import importlib
import queue
import sqlite3

import pytest

REF_PUBLIC = {
    "": [  # top-level pygrametl.__init__
        "BackgroundConnectionWrapper", "ConnectionWrapper", "Error",
        "InterfaceError", "copy", "datereader", "datespan", "datetimereader",
        "endload", "getbool", "getdate", "getdbfriendlystr",
        "getdefaulttargetconnection", "getfloat", "getint",
        "getsqlfriendlystr", "getstr", "getstrippedstr", "getstrornullvalue",
        "gettimestamp", "getvalue", "getvalueor", "keepasis", "now",
        "project", "renamefromto", "renametofrom", "rowfactory",
        "setdefaults", "today", "tolower", "toupper", "ymdhmsparser",
        "ymdparser",
    ],
    "tables": [
        "AccumulatingSnapshotFactTable", "BasePartitioner", "BatchFactTable",
        "BulkDimension", "BulkFactTable", "CachedBulkDimension",
        "CachedDimension", "DecoupledDimension", "DecoupledFactTable",
        "Dimension", "DimensionPartitioner", "FactTable",
        "FactTablePartitioner", "SlowlyChangingDimension",
        "SnowflakedDimension", "SubprocessFactTable",
        "TypeOneSlowlyChangingDimension", "definequote",
    ],
    "datasources": [
        "CrossTabbingSource", "DynamicForEachSource", "FilteringSource",
        "HashJoiningSource", "MappingSource", "MergeJoiningSource",
        "PandasSource", "ProcessSource", "RoundRobinSource", "SQLSource",
        "SQLTransformingSource", "TransformingSource", "TypedCSVSource",
        "UnionSource",
    ],
    "steps": [
        "AggregatedRow", "AggregatingStep", "AvgAggregator",
        "ConditionalStep", "CopyStep", "DimensionStep", "GarbageStep",
        "MappingStep", "MaxAggregator", "MinAggregator", "PrintStep",
        "RenamingFromToStep", "RenamingToFromStep", "SCDimensionStep",
        "SourceStep", "Step", "SumAggregator", "ValueMappingStep",
        "connectsteps",
    ],
    "aggregators": [
        "Aggregator", "Avg", "Count", "CountDistinct", "Max", "Min",
        "SimpleAggregator", "Sum",
    ],
    "parallel": [
        "Decoupled", "Flow", "FutureResult", "SharedConnectionWrapperClient",
        "SharedConnectionWrapperServer", "createflow", "endsplits",
        "getsharedsequencefactory", "shareconnectionwrapper", "splitpoint",
    ],
    "FIFODict": ["FIFODict", "FIFODictDeque", "FIFODictOrderedDict"],
    "drawntabletesting": ["Table", "Variable", "connectionwrapper"],
    "JDBCConnectionWrapper": [
        "JDBCConnectionWrapper", "BackgroundJDBCConnectionWrapper",
    ],
    "dttr": ["run", "main"],
    "formattable": ["reformat_file", "main"],
}


@pytest.mark.parametrize("mod,names", REF_PUBLIC.items(), ids=lambda x: str(x)[:30])
def test_every_reference_public_name_resolves(mod, names):
    target = "pygrametl_spark" + (f".{mod}" if mod else "")
    m = importlib.import_module(target)
    missing = [n for n in names if not hasattr(m, n)]
    assert not missing, f"{target} missing {missing}"


# -- ConnectionWrapper ----------------------------------------------------

def test_connectionwrapper_qmark_roundtrip_and_namemapping():
    from pygrametl_spark import ConnectionWrapper

    cw = ConnectionWrapper(sqlite3.connect(":memory:"))  # sqlite3 = qmark
    cw.execute("CREATE TABLE t(a INT, b TEXT)")
    cw.execute("INSERT INTO t VALUES(%(a)s, %(b)s)", {"a": 1, "b": "x"})
    # namemapping: SQL name -> row key (ref execute namemapping contract)
    cw.execute(
        "INSERT INTO t VALUES(%(a)s, %(b)s)",
        {"alpha": 2, "beta": "y"},
        namemapping={"a": "alpha", "b": "beta"},
    )
    cw.executemany(
        "INSERT INTO t VALUES(%(a)s, %(b)s)",
        [{"a": 3, "b": "z"}, {"a": 4, "b": "w"}],
    )
    cw.commit()
    cw.execute("SELECT a, b FROM t ORDER BY a")
    assert cw.resultnames() == ("a", "b")
    rows = cw.fetchall()
    assert rows == [
        {"a": 1, "b": "x"}, {"a": 2, "b": "y"},
        {"a": 3, "b": "z"}, {"a": 4, "b": "w"},
    ]
    # rowfactory drains; fetchone at exhaustion gives the all-None row
    cw.execute("SELECT a, b FROM t WHERE a = 1")
    assert list(cw.fetchone().values()) == [1, "x"]
    assert cw.fetchone() == {"a": None, "b": None}
    cw.close()


def test_connectionwrapper_numeric_and_named_translation():
    from pygrametl_spark.connectionwrapper import ConnectionWrapper

    cw = ConnectionWrapper(sqlite3.connect(":memory:"), paramstyle="numeric")
    stmt, names = cw._translated("SELECT %(x)s, %(y)s, %(x)s")
    assert stmt == "SELECT :1, :2, :3" and names == ["x", "y", "x"]

    cw2 = ConnectionWrapper(sqlite3.connect(":memory:"), paramstyle="named")
    stmt2, names2 = cw2._translated("UPDATE t SET a=%(a)s WHERE b=%(b)s")
    assert stmt2 == "UPDATE t SET a=:a WHERE b=:b" and names2 is None


def test_connectionwrapper_rejects_unknown_paramstyle():
    from pygrametl_spark.connectionwrapper import ConnectionWrapper, InterfaceError

    with pytest.raises(InterfaceError):
        ConnectionWrapper(sqlite3.connect(":memory:"), paramstyle="weird")


def test_connectionwrapper_default_registration():
    import pygrametl_spark.connectionwrapper as cwm

    old = cwm._defaulttargetconnection
    cwm._defaulttargetconnection = None
    try:
        first = cwm.ConnectionWrapper(sqlite3.connect(":memory:"))
        second = cwm.ConnectionWrapper(sqlite3.connect(":memory:"))
        assert cwm.getdefaulttargetconnection() is first
        second.setasdefault()
        assert cwm.getdefaulttargetconnection() is second
    finally:
        cwm._defaulttargetconnection = old


# -- FIFODict -------------------------------------------------------------

@pytest.mark.parametrize("clsname", ["FIFODictDeque", "FIFODictOrderedDict"])
def test_fifodict_eviction_order_and_finalizer(clsname):
    import pygrametl_spark.FIFODict as fm

    evicted = []
    d = getattr(fm, clsname)(2, finalizer=lambda k, v: evicted.append((k, v)))
    d["a"], d["b"] = 1, 2
    d["a"] = 10  # overwrite: no eviction
    d["c"] = 3  # evicts "a" (oldest INSERTED)
    assert evicted == [("a", 10)]
    assert ("a" not in d) and d["b"] == 2 and d["c"] == 3 and len(d) == 2
    del d["b"]
    assert evicted == [("a", 10)]  # explicit delete never finalizes
    d.clear()
    assert len(d) == 0 and evicted == [("a", 10)]


def test_fifodict_validates_arguments():
    from pygrametl_spark.FIFODict import FIFODict

    with pytest.raises(ValueError):
        FIFODict(0)
    with pytest.raises(TypeError):
        FIFODict("ten")
    with pytest.raises(TypeError):
        FIFODict(5, finalizer="not-callable")


# -- parallel facades -----------------------------------------------------

def test_splitpoint_forms_and_output_queue():
    from pygrametl_spark.parallel import endsplits, splitpoint

    q = queue.Queue()

    @splitpoint(output=q)
    def double(x):
        return 2 * x

    @splitpoint
    def bare(x):
        return x

    @splitpoint()
    def parens(x):
        return x

    assert double(21) is None and q.get() == 42  # results go to output only
    assert bare(1) is None and parens(1) is None
    endsplits()  # no-op barrier


def test_createflow_runs_stages_in_order_with_side_effects():
    from pygrametl_spark.parallel import createflow

    seen = []
    flow = createflow(
        lambda r: r.__setitem__("a", r["a"] + 1),
        (lambda r: r.__setitem__("b", r["a"] * 2), lambda r: seen.append(dict(r))),
    )
    flow({"a": 1})
    flow.process({"a": 10})
    flow.close()
    assert seen == [{"a": 2, "b": 4}, {"a": 11, "b": 22}]
    assert flow.getall() == [{"a": 2, "b": 4}, {"a": 11, "b": 22}]
    with pytest.raises(RuntimeError):
        flow({"a": 0})
    with pytest.raises(ValueError):
        createflow(42)


def test_shared_sequence_factory_is_shared_and_dense():
    from pygrametl_spark.parallel import getsharedsequencefactory

    factory = getsharedsequencefactory(1000)
    s1, s2 = factory(), factory()
    assert [s1(), s2(), s1(), s2()] == [1000, 1001, 1002, 1003]


def test_shareconnectionwrapper_copy_and_userfuncs():
    from pygrametl_spark.parallel import shareconnectionwrapper

    class FakeCW:
        def commit(self):
            return "committed"

    def myfunc():
        return 7

    shared = shareconnectionwrapper(FakeCW(), userfuncs=(myfunc,))
    assert shared.copy() is shared
    assert shared.commit() == "committed" and shared.myfunc() == 7


# -- dtt Variable ---------------------------------------------------------

def test_dtt_variable_stringifies_to_drawing_token():
    from pygrametl_spark.drawntabletesting import Variable

    assert str(Variable("key")) == "$key"
    assert str(Variable("_")) == "$_" and str(Variable("_!")) == "$_!"
    assert Variable("x") == Variable("x") and Variable("x") != Variable("y")
    with pytest.raises(ValueError):
        Variable("bad name")


def test_module_endload_facade_delegates(tmp_path):
    import pygrametl_spark as ps

    calls = []

    class FakeEngine:
        def endload(self, **kw):
            calls.append(kw)

    e = FakeEngine()
    old = list(ps._engines)
    ps._engines.clear()
    try:
        ps.endload()  # no engines: no-op
        ps.set_default_engine(e)
        ps.set_default_engine(e)  # idempotent
        ps.endload(mode="overwrite")
        assert calls == [{"mode": "overwrite"}] and len(ps._engines) == 1
    finally:
        ps._engines[:] = old


def test_jdbcconnectionwrapper_pep249_delegation():
    """The CPython stand-in for the Jython JDBC wrapper drives a PEP 249
    connection through the same execute/fetch surface."""
    from pygrametl_spark.JDBCConnectionWrapper import (
        BackgroundJDBCConnectionWrapper, JDBCConnectionWrapper,
    )

    for cls in (JDBCConnectionWrapper, BackgroundJDBCConnectionWrapper):
        cw = cls(sqlite3.connect(":memory:"))
        cw.execute("CREATE TABLE t(a INT)")
        cw.executemany("INSERT INTO t VALUES(%(a)s)", [{"a": 1}, {"a": 2}])
        cw.commit()
        cw.execute("SELECT a FROM t ORDER BY a")
        assert cw.fetchalltuples() == [(1,), (2,)]
        cw.close()


def test_formattable_reformats_in_place(tmp_path):
    """Misaligned drawing -> canonical aligned pipes, indentation and
    surrounding lines preserved (ref drawntabletesting/formattable.py)."""
    from pygrametl_spark.formattable import reformat_file

    path = tmp_path / "doc.dtt"
    path.write_text(
        "book\n"
        "  | bid:int (pk) | title:text |\n"
        "  | --- | --- |\n"
        "  | 1 | Dune |\n"
        "  | 25 | The Hobbit |\n"
        "\n"
        "after\n"
    )
    reformat_file(str(path), 3)
    assert path.read_text() == (
        "book\n"
        "  | bid:int (pk) | title:text |\n"
        "  | ------------ | ---------- |\n"
        "  | 1            | Dune       |\n"
        "  | 25           | The Hobbit |\n"
        "\n"
        "after\n"
    )
    # round-trip: reformatting a canonical table is a no-op
    before = path.read_text()
    reformat_file(str(path), 2)
    assert path.read_text() == before
