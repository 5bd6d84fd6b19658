"""Fact table tests on the reference's `sales`/`facts` fixtures
(FIXTURES.md §4-§5; ref tests/tables/test_FactTable.py)."""

import pytest
from pyspark.sql import functions as F

from pygrametl_spark.operators.facttable import AccumulatingSnapshotFactTable, FactTable
from tests.conftest import assert_df_set_equal


@pytest.fixture()
def sales(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, 10, 100), (1, 2, 1, 20, 200)],
        "bib int, cid int, did int, count int, profit int",
    )
    return FactTable("sales", ["bib", "cid", "did"], ["count", "profit"], df=df)


def test_insert_projects_extra_atts(spark, sales):
    rows = spark.createDataFrame(
        [(2, 1, 1, 5, 50, "junk")], "bib int, cid int, did int, count int, profit int, extra string"
    )
    sales.insert(rows)
    assert sales.df.count() == 3
    assert "extra" not in sales.df.columns


def test_lookup(spark, sales):
    probe = spark.createDataFrame([(1, 2, 1), (9, 9, 9)], "bib int, cid int, did int")
    out = sales.lookup(probe)
    got = {(r["bib"], r["cid"], r["did"]): r["count"] for r in out.collect()}
    assert got[(1, 2, 1)] == 20
    assert got[(9, 9, 9)] is None


def test_ensure_skips_known_keyrefs(spark, sales):
    rows = spark.createDataFrame(
        [(1, 1, 1, 99, 999), (3, 3, 3, 1, 2)], "bib int, cid int, did int, count int, profit int"
    )
    sales.ensure(rows)
    assert sales.df.count() == 3
    assert sales.df.filter("bib=1 AND cid=1 AND did=1").first()["count"] == 10


def test_ensure_compare_raises_on_measure_mismatch(spark, sales):
    rows = spark.createDataFrame([(1, 1, 1, 99, 999)], "bib int, cid int, did int, count int, profit int")
    with pytest.raises(ValueError, match="different measures"):
        sales.ensure(rows, compare=True)


def test_ensure_compare_ok_when_equal(spark, sales):
    rows = spark.createDataFrame([(1, 1, 1, 10, 100)], "bib int, cid int, did int, count int, profit int")
    sales.ensure(rows, compare=True)  # no raise
    assert sales.df.count() == 2


def test_accumulating_snapshot_merge(spark):
    """FIXTURES.md §5: lag21 = ref2 - ref1 computed by factexpander after
    missing values are backfilled from the stored row."""

    def expander(df):
        return df.withColumn(
            "lag21",
            F.when(
                F.col("ref1").isNotNull() & F.col("ref2").isNotNull(),
                (F.col("ref2") - F.col("ref1")).cast("int"),
            ),
        )

    base = spark.createDataFrame(
        [(1, 1, 10, None, None, 5.0, None)],
        "id1 int, id2 int, ref1 int, ref2 int, ref3 int, meas double, lag21 int",
    )
    fact = AccumulatingSnapshotFactTable(
        "facts", ["id1", "id2"], ["ref1", "ref2", "ref3"], ["meas", "lag21"],
        factexpander=expander, df=base,
    )
    # ref2 arrives; ref1 missing in the batch -> kept from store (ignore-None)
    batch = spark.createDataFrame(
        [(1, 1, None, 30, None, None, None)],
        "id1 int, id2 int, ref1 int, ref2 int, ref3 int, meas double, lag21 int",
    )
    fact.ensure(batch)
    row = fact.df.first()
    assert row["ref1"] == 10 and row["ref2"] == 30 and row["meas"] == 5.0
    assert row["lag21"] == 20


def test_accumulating_snapshot_inserts_new_keys(spark):
    base = spark.createDataFrame([(1, 1, 10)], "id1 int, id2 int, ref1 int")
    fact = AccumulatingSnapshotFactTable("facts", ["id1", "id2"], ["ref1"], df=base)
    batch = spark.createDataFrame([(2, 2, 77)], "id1 int, id2 int, ref1 int")
    fact.ensure(batch)
    assert_df_set_equal(fact.df, [(1, 1, 10), (2, 2, 77)])


# -- property-based: accumulating snapshot merge == sequential replay ------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=4),          # key
                st.one_of(st.none(), st.integers(0, 9)),        # ref value
                st.one_of(st.none(), st.integers(0, 99)),       # measure value
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_accumulating_snapshot_matches_sequential_replay(spark, batches):
    """ignore-None merge over arbitrary batch sequences equals per-row
    replay of the reference's ensure/update (tables.py:2418-2505):
    non-NULL incoming values overwrite, NULLs keep the stored value,
    unknown keys insert."""
    from pygrametl_spark.operators.facttable import AccumulatingSnapshotFactTable

    base = spark.createDataFrame([], "k long, r long, m long")
    fact = AccumulatingSnapshotFactTable("acc", ["k"], ["r"], ["m"], df=base)
    state = {}
    for batch in batches:
        # the engine is batch-at-a-time: collapse same-key rows the way a
        # deterministic batch would (last-non-null per column, keys sorted
        # by arrival = list order); replay reference per row
        for k, r, m in batch:
            old = state.get(k, (None, None))
            state[k] = (r if r is not None else old[0], m if m is not None else old[1])
        collapsed = {}
        for k, r, m in batch:
            pr, pm = collapsed.get(k, (None, None))
            collapsed[k] = (r if r is not None else pr, m if m is not None else pm)
        bdf = spark.createDataFrame(
            [(k, r, m) for k, (r, m) in sorted(collapsed.items())], "k long, r long, m long"
        )
        fact.ensure(bdf)
    got = {r["k"]: (r["r"], r["m"]) for r in fact.df.collect()}
    assert got == state


def test_write_dynamic_partition_overwrite(spark, tmp_path):
    from pygrametl_spark.operators.facttable import FactTable

    path = str(tmp_path / "fact")
    full = spark.createDataFrame(
        [(1, 20240101, 10.0), (2, 20240101, 11.0), (3, 20240102, 12.0)],
        "k long, day int, m double",
    )
    FactTable("f", ["k", "day"], ["m"], df=full).write(
        path, partition_cols=["day"], dynamic_overwrite=True
    )
    # re-load ONLY day 20240102 with corrected measures
    fix = spark.createDataFrame([(3, 20240102, 99.0)], "k long, day int, m double")
    FactTable("f", ["k", "day"], ["m"], df=fix).write(
        path, partition_cols=["day"], dynamic_overwrite=True
    )
    got = {(r.k, r.day): r.m for r in spark.read.parquet(path).collect()}
    # day 01 untouched, day 02 replaced (not appended)
    assert got == {(1, 20240101): 10.0, (2, 20240101): 11.0, (3, 20240102): 99.0}

    with pytest.raises(ValueError):
        FactTable("f", ["k", "day"], ["m"], df=fix).write(path, dynamic_overwrite=True)
