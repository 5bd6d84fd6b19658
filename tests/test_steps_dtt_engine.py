"""Steps pipeline, Drawn Table Testing, and Engine endload tests."""

import os

import pytest
from pyspark.sql import functions as F

from pygrametl_spark import dtt
from pygrametl_spark.engine import Engine
from pygrametl_spark.operators.dimension import Dimension
from pygrametl_spark.operators.facttable import FactTable
from pygrametl_spark.steps import (
    AggregatingStep,
    ConditionalStep,
    MappingStep,
    RenamingFromToStep,
    SourceStep,
    Step,
    ValueMappingStep,
    connectsteps,
)
from tests.conftest import assert_df_set_equal


def test_step_chain(spark):
    df = spark.createDataFrame([("dk", 1), ("se", 2)], ["country", "n"])
    chain = connectsteps(
        MappingStep({"country": F.upper}),
        ValueMappingStep("name", "country", {"DK": "Denmark", "SE": "Sweden"}, "Other"),
        RenamingFromToStep({"n": "cnt"}),
    )
    out = chain(df)
    assert_df_set_equal(
        out.select("country", "name", "cnt"), [("DK", "Denmark", 1), ("SE", "Sweden", 2)]
    )


def test_conditional_step_branches(spark):
    df = spark.createDataFrame([(1,), (10,)], ["x"])
    tag = lambda v: Step(lambda d: d.withColumn("branch", F.lit(v)))  # noqa: E731
    out = ConditionalStep(F.col("x") > 5, tag("big"), tag("small"))(df)
    assert_df_set_equal(out, [(1, "small"), (10, "big")])


def test_conditional_step_drops_without_false_branch(spark):
    df = spark.createDataFrame([(1,), (10,)], ["x"])
    out = ConditionalStep(F.col("x") > 5, None)(df)
    assert_df_set_equal(out, [(10,)])


def test_source_and_aggregating_step(spark):
    src = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], ["k", "v"])
    chain = connectsteps(
        SourceStep(src), AggregatingStep(["k"], [F.sum("v").alias("s")])
    )
    out = chain(spark.range(0))
    assert_df_set_equal(out, [("a", 3), ("b", 3)])


def test_dtt_parse_and_assert_equal(spark):
    t = dtt.Table(
        "book",
        """
        | id:int (pk) | title:text | price:double |
        | ----------- | ---------- | ------------ |
        | 1           | Unknown    | NULL         |
        | 2           | Dune       | 9.5          |
        """,
    )
    df = t.df(spark)
    assert df.count() == 2
    t.assertEqual(df)  # self-equality
    t.assertSubset(df)


def test_dtt_plus_rows_and_mismatch(spark):
    t = dtt.Table("x", "| id:int | v:text |\n| 1 | a |")
    t2 = t + "| 2 | b |"
    df2 = t2.df(spark)
    t2.assertEqual(df2)
    with pytest.raises(AssertionError, match="expected 2 rows"):
        t2.assertEqual(t.df(spark))


def test_dtt_variables(spark):
    actual = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None)], "id int, v string, w string"
    )
    exp = dtt.Table(
        "x",
        """
        | id:int | v:text | w:text |
        | 1      | $1     | $_!    |
        | 2      | $2     | $_     |
        """,
    )
    exp.assertEqual(actual)
    # $name must bind consistently: same variable for two different values fails
    bad = dtt.Table(
        "x",
        """
        | id:int | v:text | w:text |
        | 1      | $1     | $_     |
        | 2      | $1     | $_     |
        """,
    )
    with pytest.raises(AssertionError):
        bad.assertEqual(actual)


def test_dtt_disjoint(spark):
    actual = spark.createDataFrame([(1, "a")], "id int, v string")
    dtt.Table("x", "| id:int | v:text |\n| 9 | z |").assertDisjoint(actual)
    with pytest.raises(AssertionError):
        dtt.Table("x", "| id:int | v:text |\n| 1 | a |").assertDisjoint(actual)


def test_engine_endload_fk_order(spark, tmp_path):
    dim = Dimension(
        "dim", "id", ["name"],
        df=spark.createDataFrame([(1, "a")], "id long, name string"),
    )
    fact = FactTable(
        "fact", ["id"], ["m"], df=spark.createDataFrame([(1, 10)], "id long, m long")
    )
    eng = Engine(spark, str(tmp_path))
    eng.register(fact, dependson=[dim])
    eng.register(dim)
    written = eng.endload()
    assert written == ["dim", "fact"]  # referenced before referencing
    assert os.path.exists(str(tmp_path / "dim")) and os.path.exists(str(tmp_path / "fact"))
    assert spark.read.parquet(str(tmp_path / "fact")).count() == 1


def test_engine_cycle_detection(spark, tmp_path):
    a = Dimension("a", "id", ["x"], df=spark.createDataFrame([(1, "v")], "id long, x string"))
    b = Dimension("b", "id", ["x"], df=spark.createDataFrame([(1, "v")], "id long, x string"))
    eng = Engine(spark, str(tmp_path))
    eng.register(a, dependson=["b"])
    eng.register(b, dependson=["a"])
    with pytest.raises(ValueError, match="cycle"):
        eng.endload()


def test_custom_idfinder(spark):
    dim = Dimension(
        "d", "id", ["name"],
        idfinder=lambda df, offset: df.withColumn(
            "id", F.lit(offset) + F.length("name").cast("long")
        ),
        df=spark.createDataFrame([(100, "a")], "id long, name string"),
    )
    batch = spark.createDataFrame([("xyz",)], ["name"])
    dim.ensure(batch)
    assert dim.df.filter("name = 'xyz'").first()["id"] == 103


def test_engine_bucketed_endload_colocated_join(spark, tmp_path):
    """Tables bucketed on the join key at endload join with ZERO
    exchanges: the shuffle is paid once at write, not per query."""
    from pygrametl_spark.operators.facttable import FactTable
    from pygrametl_spark.plans.explain import plan_stats

    dim = Dimension(
        "bdim", "id", ["name"],
        df=spark.createDataFrame([(i, f"n{i}") for i in range(50)], "id long, name string"),
    )
    fact = FactTable(
        "bfact", ["id"], ["amount"],
        df=spark.createDataFrame([(i % 50, float(i)) for i in range(500)], "id long, amount double"),
    )
    eng = Engine(spark, str(tmp_path))
    eng.register(dim, bucket_cols=["id"], n_buckets=4)
    eng.register(fact, dependson=["bdim"], bucket_cols=["id"], n_buckets=4)
    try:
        assert eng.endload() == ["bdim", "bfact"]
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bfact").join(spark.table("bdim"), "id")
            stats = plan_stats(joined)
            assert stats["exchanges"] == 0 and stats["broadcast_exchanges"] == 0
            assert joined.count() == 500
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bdim")
        spark.sql("DROP TABLE IF EXISTS bfact")


def test_engine_partitioned_endload_prunes(spark, tmp_path):
    """A fact persisted with partition_cols is read back with partition
    pruning: a filter on the partition column touches only its files."""
    from pygrametl_spark.operators.facttable import FactTable
    from pygrametl_spark.plans.explain import formatted_plan

    fact = FactTable(
        "pfact", ["k", "region"], ["amount"],
        df=spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(400)], "k long, region int, amount double"
        ),
    )
    eng = Engine(spark, str(tmp_path))
    eng.register(fact, partition_cols=["region"])
    eng.endload()
    back = spark.read.parquet(str(tmp_path / "pfact"))
    pruned = back.filter("region = 2")
    assert pruned.count() == 100
    plan = formatted_plan(pruned)
    # the region predicate lands in PartitionFilters (directory pruning),
    # not in the row-group DataFilters
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "region" in pf[1][:120]


def test_partition_for_routes_by_table_key(spark):
    """partition_for repartitions a batch on the table's natural key
    (lookupatts for dimensions, keyrefs for facts), so downstream
    per-key work reuses one exchange."""
    from pygrametl_spark.operators.facttable import FactTable
    from pygrametl_spark.plans.joins import partition_for

    dim = Dimension(
        "rdim", "id", ["name"],
        df=spark.createDataFrame([(1, "a")], "id long, name string"),
    )
    batch = spark.createDataFrame([("a",), ("b",)], ["name"])
    plan = partition_for(dim, batch)._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression [name" in plan
    fact = FactTable(
        "rfact", ["k1", "k2"], ["m"],
        df=spark.createDataFrame([(1, 2, 0.5)], "k1 long, k2 long, m double"),
    )
    fplan = partition_for(fact, fact.df, 8)._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression [k1" in fplan and ", 8" in fplan


# ---------------------------------------------------------------------------
# External-DB sinks (ref ConnectionWrapper / bulkloader parity)
# ---------------------------------------------------------------------------


def test_ddl_for_maps_types_and_rejects_arrays(spark):
    from pygrametl_spark.sinks import ddl_for

    df = spark.createDataFrame(
        [(1, "a", 0.5, True)], "id long, name string, x double, f boolean"
    )
    ddl = ddl_for(df, "t")
    assert ddl == (
        "CREATE TABLE t (id BIGINT, name VARCHAR, x DOUBLE PRECISION, f BOOLEAN)"
    )
    arr = spark.createDataFrame([(1, [1.0])], "id long, v array<double>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-relational"):
        ddl_for(arr, "t")


def test_jsonl_sink_roundtrips_through_jsonl_source(spark, tmp_path):
    """jsonl_sink -> JSONLSource round-trips exactly, honoring the
    partition layout and the per-file record cap."""
    import glob

    from pygrametl_spark.sinks import jsonl_sink
    from pygrametl_spark.sources.sources import JSONLSource

    df = spark.createDataFrame(
        [(i, f"line1\nline2-{i}", "train" if i % 2 else "test") for i in range(20)],
        "doc_id long, text string, split string",
    )
    out = str(tmp_path / "jl")
    jsonl_sink(df, out, partition_by=["split"], max_records_per_file=4)
    back = JSONLSource(spark, out, schema="doc_id long, text string, split string")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    assert len(glob.glob(f"{out}/split=train/*.json")) >= 3  # 10 rows / cap 4


def test_pep249_sink_sqlite_roundtrip(spark, tmp_path):
    import sqlite3

    from pygrametl_spark.sinks import PEP249Sink

    db = str(tmp_path / "wh.sqlite3")
    df = spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) / 4 AS x")
    n = PEP249Sink(df, lambda: sqlite3.connect(db), "nums", batch_size=7)
    assert n == 100
    con = sqlite3.connect(db)
    rows = con.execute("SELECT COUNT(*), SUM(x) FROM nums").fetchone()
    con.close()
    assert rows[0] == 100 and abs(rows[1] - sum(i / 4 for i in range(100))) < 1e-9
    # overwrite semantics: second load replaces, not appends
    n2 = PEP249Sink(df, lambda: sqlite3.connect(db), "nums")
    assert n2 == 100
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM nums").fetchone()[0] == 100
    con.close()


def test_pep249_sink_parallel_partition_path(spark, tmp_path):
    """foreachPartition path (one connection per partition task); a
    single partition keeps the single-writer sqlite file uncontended
    while still exercising the executor-side code."""
    import sqlite3

    from pygrametl_spark.sinks import PEP249Sink

    db = str(tmp_path / "par.sqlite3")
    df = spark.range(50).selectExpr("id", "CAST(id % 5 AS STRING) AS tag").coalesce(1)
    n = PEP249Sink(df, lambda: sqlite3.connect(db), "tags", parallel=True, batch_size=9)
    assert n == 50
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(DISTINCT tag) FROM tags").fetchone()[0] == 5
    con.close()


def test_pep249_sink_parallel_default_by_paramstyle(spark, tmp_path):
    """parallel=None routes by paramstyle: server styles go distributed,
    qmark stays on the single-writer driver stream (observable as
    exactly 2 driver connects: create + stream)."""
    import sqlite3

    from pygrametl_spark.sinks import PEP249Sink, _insert_sql

    assert _insert_sql("t", ["a", "b"], "pyformat").count("%s") == 2

    db = str(tmp_path / "auto.sqlite3")
    connects = []

    def connect():
        connects.append(1)
        return sqlite3.connect(db)

    df = spark.range(20).selectExpr("id").repartition(4)
    n = PEP249Sink(df, connect, "nums")  # qmark default -> driver path
    assert n == 20 and len(connects) == 2


def test_pep249_sink_unpicklable_factory_routing(spark, tmp_path):
    """The parallel=None auto-route must never trade a previously-
    working driver-side load for a serialization crash: a server-style
    paramstyle with a connect factory that can't cloudpickle (here: it
    closes over an open sqlite3 connection) quietly falls back to the
    driver stream. Explicit parallel=True raises up front with a
    pointer at parallel=False instead of a deep executor pickling
    error."""
    import sqlite3

    import pytest

    from pygrametl_spark.sinks import PEP249Sink

    db = str(tmp_path / "unpick.sqlite3")
    held = sqlite3.connect(db)  # unpicklable closure state

    class PyformatShim:
        """sqlite3 speaks qmark; translate the %s template so the
        driver-side path can actually execute (stands in for psycopg2)."""

        def __init__(self, con):
            self._con = con

        def cursor(self):
            shim = self

            class Cur:
                def execute(self, sql, params=()):
                    return shim._con.execute(sql.replace("%s", "?"), params)

                def executemany(self, sql, seq):
                    return shim._con.executemany(sql.replace("%s", "?"), seq)

            return Cur()

        def commit(self):
            self._con.commit()

        def close(self):
            pass  # shared held connection stays open across calls

    def connect():
        return PyformatShim(held)  # closes over `held` -> not picklable

    df = spark.range(30).selectExpr("id").repartition(3)
    n = PEP249Sink(df, connect, "nums", paramstyle="pyformat")  # auto route
    assert n == 30
    assert held.execute("SELECT COUNT(*) FROM nums").fetchone()[0] == 30

    with pytest.raises(ValueError, match="parallel=False"):
        PEP249Sink(df, connect, "nums", paramstyle="pyformat", parallel=True)
    held.close()


def test_pep249_sink_parallel_multiwriter_integration(spark, tmp_path):
    """True multi-writer integration (VERDICT r2 item 8): 8 partitions
    write the SAME table through per-partition executor-side
    connections. WAL + busy_timeout make sqlite a legitimate concurrent
    multi-writer target; each connect() logs itself, so the test proves
    one connection per partition task actually opened, and the loaded
    state equals the DataFrame exactly."""
    import sqlite3

    from pygrametl_spark.sinks import PEP249Sink

    db = str(tmp_path / "multi.sqlite3")
    # _writers accounting table exists before the parallel load starts
    boot = sqlite3.connect(db)
    boot.execute("PRAGMA journal_mode=WAL")
    boot.execute("CREATE TABLE _writers (tag TEXT)")
    boot.commit()
    boot.close()

    def connect():
        import uuid

        con = sqlite3.connect(db, timeout=60)
        con.execute("PRAGMA busy_timeout=60000")
        con.execute("INSERT INTO _writers VALUES (?)", (uuid.uuid4().hex,))
        con.commit()
        return con

    df = spark.range(400).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS tag"
    ).repartition(8)
    n = PEP249Sink(df, connect, "tags", parallel=True, batch_size=13)
    assert n == 400
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM tags").fetchone()[0] == 400
    assert {r[0] for r in con.execute("SELECT DISTINCT id % 7 FROM tags")} == set(range(7))
    assert con.execute(
        "SELECT COUNT(DISTINCT id) FROM tags"
    ).fetchone()[0] == 400  # no partition wrote twice, none was lost
    # per-partition connections: 8 partition writers + create + count
    n_writers = con.execute("SELECT COUNT(*) FROM _writers").fetchone()[0]
    con.close()
    assert n_writers == 10, f"expected 8 partition + 2 driver connects, got {n_writers}"


def test_endload_target_loads_fk_order(spark, tmp_path):
    import duckdb

    from pygrametl_spark.engine import Engine
    from pygrametl_spark.operators.facttable import FactTable
    from pygrametl_spark.sinks import PEP249Target

    db = str(tmp_path / "wh.duckdb")
    dim = Dimension(
        "d_ext", "id", ["name"],
        df=spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"),
    )
    fact = FactTable(
        "f_ext", ["id"], ["m"],
        df=spark.createDataFrame([(1, 0.5), (2, 1.5)], "id long, m double"),
    )
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.register(fact, dependson=[dim])  # registered BEFORE its dependency
    eng.register(dim)
    written = eng.endload(target=PEP249Target(lambda: duckdb.connect(db)), parquet=False)
    assert written == ["d_ext", "f_ext"]  # dependson order, not registration
    con = duckdb.connect(db)
    got = con.execute(
        "SELECT name, m FROM f_ext JOIN d_ext USING (id) ORDER BY name"
    ).fetchall()
    con.close()
    assert got == [("a", 0.5), ("b", 1.5)]


# ---------------------------------------------------------------------------
# DTT database-state management (ref drawntabletesting/__init__.py:299-407)
# ---------------------------------------------------------------------------


def _book_table(con):
    from pygrametl_spark.dtt import Table

    return Table(
        "book",
        """
        | id:int (pk) | title:text |
        | ----------- | ---------- |
        | 1           | Unknown    |
        | 2           | Nineteen   |
        """,
        testconnection=con,
    )


def test_dtt_ensure_creates_then_verifies(tmp_path):
    import sqlite3

    from pygrametl_spark.dtt import Table

    con = sqlite3.connect(str(tmp_path / "dtt.sqlite3"))
    t = _book_table(con)
    t.ensure()  # absent -> create + fill
    assert con.execute("SELECT COUNT(*) FROM book").fetchone()[0] == 2
    t.ensure()  # present + matching -> no-op
    t.assertEqual()  # assert against the live DB, no DataFrame
    con.execute("INSERT INTO book VALUES (3, 'Extra')")
    con.commit()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="contains other rows"):
        t.ensure()  # present + mismatching -> refuses to override
    t.reset()  # forceful recreate restores the drawing
    assert con.execute("SELECT COUNT(*) FROM book").fetchone()[0] == 2
    t.drop()
    with _pytest.raises(ValueError, match="not created by a Table"):
        t.drop()
    Table.clear()
    con.close()


def test_dtt_update_and_additions(tmp_path):
    import sqlite3

    con = sqlite3.connect(str(tmp_path / "dtt2.sqlite3"))
    t = _book_table(con)
    post = t.update(1, "|   | Rewritten |") + "| 3 | Third |"
    assert post.rows[1] == (2, "Rewritten")  # empty cell kept the pk
    adds = post.additions(withKey=True)
    assert adds == [{"id": 2, "title": "Rewritten"}, {"id": 3, "title": "Third"}]
    assert post.additions() == [{"title": "Rewritten"}, {"title": "Third"}]
    # the original drawing is unchanged (update copies)
    assert t.rows[1] == (2, "Nineteen") and t.additions() == []
    post.ensure()
    assert con.execute("SELECT title FROM book WHERE id = 2").fetchone()[0] == "Rewritten"
    from pygrametl_spark.dtt import Table

    Table.clear()
    assert con.execute(
        "SELECT COUNT(*) FROM sqlite_master WHERE type='table' AND name='book'"
    ).fetchone()[0] == 0
    con.close()


def test_dimension_step_decorates_with_keys(spark):
    from pygrametl_spark.plans.keys import assign_dense_keys
    from pygrametl_spark.steps import DimensionStep, connectsteps, RenamingFromToStep

    seed = spark.createDataFrame([("a",), ("b",)], ["name"])
    dim = Dimension("sd", "id", ["name"], df=assign_dense_keys(seed, ["name"], "id", 0))
    pipeline = connectsteps(
        RenamingFromToStep({"n": "name"}),
        DimensionStep(dim),
    )
    out = pipeline(spark.createDataFrame([("a",), ("c",)], ["n"]))
    got = {r["name"]: r["id"] for r in out.collect()}
    assert got["a"] == 1 and got["c"] == 3  # existing key kept, new key assigned
    assert dim.df.count() == 3


def test_partitioner_facade_delegates(spark):
    from pygrametl_spark.plans.joins import DimensionPartitioner

    dim = Dimension(
        "pd", "id", ["name"],
        df=spark.createDataFrame([(1, "a")], "id long, name string"),
    )
    p = DimensionPartitioner(dim)
    assert p.getpart() is dim
    out = p.lookup(spark.createDataFrame([("a",)], ["name"]))  # delegated
    assert out.first()["id"] == 1
    plan = p.partition(dim.df)._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression [name" in plan


def test_definequote_quotes_generated_sql(spark):
    from pygrametl_spark import sinks

    df = spark.createDataFrame([(1,)], "id long")
    try:
        sinks.definequote('"')
        assert sinks.ddl_for(df, "t") == 'CREATE TABLE "t" ("id" BIGINT)'
        assert sinks._insert_sql("t", ["id"], "qmark") == 'INSERT INTO "t" ("id") VALUES (?)'
    finally:
        sinks.definequote(None)
    assert sinks.ddl_for(df, "t") == "CREATE TABLE t (id BIGINT)"


def test_scdimension_step_ensures_and_decorates(spark):
    from pygrametl_spark.operators.scd import SlowlyChangingDimension
    from pygrametl_spark.steps import SCDimensionStep

    empty = spark.createDataFrame(
        [], "id long, name string, state string, version long, "
        "fromdate timestamp, todate timestamp"
    )
    scd = SlowlyChangingDimension(
        "s_step", "id", ["name", "state", "version", "fromdate", "todate"],
        ["name"], versionatt="version", fromatt="fromdate", toatt="todate",
        srcdateatt="ts", df=empty,
    )
    step = SCDimensionStep(scd)
    b1 = spark.createDataFrame(
        [("a", "s1", "2024-01-01 00:00:00")], ["name", "state", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out1 = step(b1)
    assert out1.first()["id"] is not None
    b2 = b1.withColumn("state", F.lit("s2")).withColumn(
        "ts", F.lit("2024-02-01 00:00:00").cast("timestamp")
    )
    out2 = step(b2)
    # decorated with the NEWEST version's key after the change
    assert scd.df.count() == 2
    newest = scd.current_versions().first()
    assert out2.first()["id"] == newest["id"] and newest["version"] == 2


def test_engine_range_sorted_endload_skips_files(spark, tmp_path):
    """sort_cols range layout: every output file covers a disjoint
    interval of the sort column (parquet min/max stats verified via
    pyarrow), so selective scans skip whole files/row groups."""
    import glob

    import pyarrow.parquet as pq

    from pygrametl_spark.operators.facttable import FactTable

    fact = FactTable(
        "rfact", ["k"], ["amount"],
        df=spark.createDataFrame(
            [(i, float(i)) for i in range(1000)], "k long, amount double"
        ),
    )
    eng = Engine(spark, str(tmp_path))
    eng.register(fact, sort_cols=["k"], n_ranges=4)
    eng.endload()

    files = sorted(glob.glob(str(tmp_path / "rfact" / "*.parquet")))
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        stats = [
            md.row_group(i).column(0).statistics for i in range(md.num_row_groups)
        ]
        assert md.schema.column(0).name == "k"
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    # disjoint, totally ordered intervals -> a filter like k = X can
    # only match one file's [min, max]
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # round-trips intact
    assert spark.read.parquet(str(tmp_path / "rfact")).count() == 1000


def test_engine_sort_and_bucket_are_exclusive(spark, tmp_path):
    from pygrametl_spark.operators.facttable import FactTable

    fact = FactTable(
        "xfact", ["k"], ["m"],
        df=spark.createDataFrame([(1, 2)], "k long, m long"),
    )
    eng = Engine(spark, str(tmp_path))
    with pytest.raises(ValueError):
        eng.register(fact, sort_cols=["k"], bucket_cols=["k"], n_buckets=4)


def test_engine_sql_sees_live_operator_state(spark, tmp_path):
    """Engine.sql exposes each registered table's CURRENT DataFrame:
    a member ensure()'d after registration is visible to the next
    sql() call (views are rebuilt per call, not load-time snapshots),
    and filters push through the view boundary into the table scan."""
    from pygrametl_spark.operators.dimension import Dimension
    from pygrametl_spark.operators.facttable import FactTable

    dim = Dimension(
        "d_sql", "id", ["name"], lookupatts=["name"],
        df=spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"),
    )
    fact = FactTable(
        "f_sql", ["id"], ["m"],
        df=spark.createDataFrame([(1, 10.0), (2, 20.0), (2, 5.0)], "id long, m double"),
    )
    eng = Engine(spark, str(tmp_path))
    eng.register(dim)
    eng.register(fact, dependson=[dim])

    out = eng.sql(
        "SELECT name, SUM(m) AS total FROM f_sql JOIN d_sql USING (id) "
        "GROUP BY name ORDER BY name"
    )
    assert [tuple(r) for r in out.collect()] == [("a", 10.0), ("b", 25.0)]

    # mutate the dimension AFTER the first sql() call; the next call
    # must see the new member (live state, not a snapshot)
    dim.ensure(spark.createDataFrame([("c",)], "name string"))
    names = eng.sql("SELECT name FROM d_sql ORDER BY name").collect()
    assert [r["name"] for r in names] == ["a", "b", "c"]

    # predicate through the view boundary: no barrier, plan contains the
    # pushed filter at/below the scan side of the join
    plan = eng.sql(
        "SELECT name FROM d_sql WHERE id = 1"
    )._jdf.queryExecution().executedPlan().toString()
    assert "id#" in plan  # filter survived into the physical plan


def test_engine_endload_two_session_race(spark, tmp_path):
    """VERDICT r8 #5: two sessions endloading ONE warehouse dir must
    resolve deterministically — one winner, one loud error, never a
    torn (interleaved) warehouse. The single-endloader lock also
    recovers from a crashed session (dead-pid lock broken), and a
    complete endload stamps _ENDLOAD_COMMITTED with its table set."""
    import json
    import socket

    dim = Dimension(
        "dim", "id", ["name"],
        df=spark.createDataFrame([(1, "a")], "id long, name string"),
    )
    fact = FactTable(
        "fact", ["id"], ["m"],
        df=spark.createDataFrame([(1, 10)], "id long, m long"),
    )
    wh = str(tmp_path / "wh")
    eng1 = Engine(spark, wh)
    eng1.register(fact, dependson=[dim])
    eng1.register(dim)
    eng2 = Engine(spark, wh)
    eng2.register(dim)

    # session 1 is mid-endload (holds the lock); session 2 fails LOUDLY
    eng1._acquire_endload_lock(3600.0)
    with pytest.raises(RuntimeError, match="endloaded by another session"):
        eng2.endload()
    # ...and wrote nothing: the loser never touched the warehouse
    assert not os.path.exists(os.path.join(wh, "dim"))

    # session 1 finishes: lock released, marker records ITS table set
    os.remove(os.path.join(wh, "_endload.lock"))
    assert eng1.endload() == ["dim", "fact"]
    assert not os.path.exists(os.path.join(wh, "_endload.lock"))
    with open(os.path.join(wh, "_ENDLOAD_COMMITTED")) as fh:
        assert json.load(fh)["tables"] == ["dim", "fact"]

    # now session 2 can run — sequential endloads are fine
    assert eng2.endload() == ["dim"]
    with open(os.path.join(wh, "_ENDLOAD_COMMITTED")) as fh:
        assert json.load(fh)["tables"] == ["dim"]

    # a CRASHED session's lock (dead pid, this host) is broken and the
    # endload proceeds — no operator intervention needed
    with open(os.path.join(wh, "_endload.lock"), "w") as fh:
        json.dump({"pid": 2**22 + 54321, "host": socket.gethostname()}, fh)
    assert eng1.endload() == ["dim", "fact"]

    # a live CROSS-HOST holder (fresh heartbeat, locally-meaningless
    # pid) blocks until its heartbeat goes stale
    with open(os.path.join(wh, "_endload.lock"), "w") as fh:
        json.dump({"pid": 2**22 + 99, "host": "some-other-host"}, fh)
    with pytest.raises(RuntimeError, match="endloaded by another session"):
        eng1.endload()
    os.utime(
        os.path.join(wh, "_endload.lock"), (1_700_000_000, 1_700_000_000)
    )
    assert eng1.endload(lock_ttl=60.0) == ["dim", "fact"]


def test_engine_endload_pointer_protocol(spark, tmp_path):
    """Object-store endload lock (r9, the endload twin of the IVF-PQ
    pointer-lease port): single endloader enforced through the
    append-only lease log (create-exclusive PUTs only), completeness
    marker as an immutable checksummed commit record, crashed-holder
    recovery, and mixed-protocol mutual visibility in both directions."""
    import json
    import socket

    from pygrametl_spark.streaming.ann import (
        _put_lease_record, _read_lease_log,
    )

    dim = Dimension(
        "dim", "id", ["name"],
        df=spark.createDataFrame([(1, "a")], "id long, name string"),
    )
    fact = FactTable(
        "fact", ["id"], ["m"],
        df=spark.createDataFrame([(1, 10)], "id long, m long"),
    )
    wh = str(tmp_path / "wh")
    eng1 = Engine(spark, wh)
    eng1.register(fact, dependson=[dim])
    eng1.register(dim)
    eng2 = Engine(spark, wh)
    eng2.register(dim)

    # session 1 mid-endload (live pointer lease); session 2 fails LOUDLY
    # under the pointer protocol AND under the POSIX protocol (mutual
    # visibility), and writes nothing
    fence = eng1._acquire_endload_lock_pointer(3600.0)
    with pytest.raises(RuntimeError, match="endloaded by another session"):
        eng2.endload(lock_protocol="pointer")
    with pytest.raises(RuntimeError, match="pointer lock protocol"):
        eng2.endload()  # posix claim sees the live pointer holder
    assert not os.path.exists(os.path.join(wh, "dim"))
    from pygrametl_spark.streaming.ann import _release_lease_pointer_if_fence

    assert _release_lease_pointer_if_fence(wh, fence)

    # a full pointer-mode endload: tables land, an immutable commit
    # record is published, the lease head is a release record
    assert eng1.endload(lock_protocol="pointer") == ["dim", "fact"]
    assert Engine.last_committed_endload(wh) == ["dim", "fact"]
    head, _seq, _torn = _read_lease_log(wh)
    assert head["action"] == "release"

    # sequential endloads append NEW commit records; the reader returns
    # the latest
    assert eng2.endload(lock_protocol="pointer") == ["dim"]
    assert Engine.last_committed_endload(wh) == ["dim"]

    # crashed holder (dead same-host pid, live-looking ts is impossible
    # after a crash only for clock reasons — the pid probe breaks it)
    head, max_seq, _ = _read_lease_log(wh)
    assert _put_lease_record(wh, max_seq + 1, {
        "seq": max_seq + 1, "action": "acquire", "namespace": "crashed",
        "fence": "dead", "pid": 2**22 + 54321,
        "host": socket.gethostname(), "ts": 1_700_000_000.0,
    })
    assert eng1.endload(lock_protocol="pointer") == ["dim", "fact"]
    assert Engine.last_committed_endload(wh) == ["dim", "fact"]

    # reverse mixed visibility: a live POSIX holder blocks pointer mode
    with open(os.path.join(wh, "_endload.lock"), "w") as fh:
        json.dump({"pid": os.getpid(), "host": socket.gethostname()}, fh)
    with pytest.raises(RuntimeError, match="POSIX lock protocol"):
        eng1.endload(lock_protocol="pointer")
    os.remove(os.path.join(wh, "_endload.lock"))

    # the POSIX marker still interops: a later posix endload wins the
    # protocol-agnostic reader
    assert eng1.endload() == ["dim", "fact"]
    assert Engine.last_committed_endload(wh) == ["dim", "fact"]


def test_endload_pointer_usurped_never_stamps_commit(spark, tmp_path, monkeypatch):
    """A pointer-mode endload stalled past lock_ttl whose lease was
    usurped mid-run must FAIL at the fence re-verify and never publish
    a completeness marker — the usurper's view of the warehouse is now
    authoritative and a late marker from the loser would stamp a mixed
    table set as complete."""
    import socket
    import time as _time

    from pygrametl_spark.streaming.ann import _put_lease_record, _read_lease_log

    dim = Dimension(
        "dim", "id", ["name"],
        df=spark.createDataFrame([(1, "a")], "id long, name string"),
    )
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.register(dim)

    real_body = Engine._endload_body

    def usurping_body(self, mode, target, parquet):
        out = real_body(self, mode, target, parquet)
        head, max_seq, _ = _read_lease_log(wh)
        assert _put_lease_record(wh, max_seq + 1, {
            "seq": max_seq + 1, "action": "acquire", "namespace": "usurper",
            "fence": "stolen", "pid": os.getpid(),
            "host": socket.gethostname(), "ts": _time.time(),
        })
        return out

    monkeypatch.setattr(Engine, "_endload_body", usurping_body)
    with pytest.raises(RuntimeError, match="lease .*was lost|was lost"):
        eng.endload(lock_protocol="pointer")
    # no completeness record was stamped, and the usurper's lease is
    # untouched (the loser's release is fence-guarded)
    assert Engine.last_committed_endload(wh) is None
    head, _seq, _ = _read_lease_log(wh)
    assert head["namespace"] == "usurper" and head["action"] == "acquire"
