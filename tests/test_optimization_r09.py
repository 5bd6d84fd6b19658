"""Focused tests for the r9 optimization-round internals.

Each test pins an equivalence the optimizations rely on:

- shared-intermediate merged builders produce EXACTLY the rows of the
  generic call-each-part construction (the oracle verifies this against
  DuckDB every round; this pins it Spark-side at test speed),
- parallel part construction cannot reorder or alter the union,
- ``lit_long_array`` is semantically identical to the per-element
  ``F.array(*[F.lit(...)...])`` it replaced,
- ``_worth_pinning`` pins shuffle-shaped plans and skips plain scans,
- the catalog-relation memo hands back the same plan handle for an
  unchanged table and refuses to serve a stale one after a rewrite.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(str(c) for c in r) for r in df.collect())


@pytest.mark.parametrize(
    "name",
    ["scd2_type1_overrides", "sampling_suite", "scd2_build_close"],
)
def test_shared_builder_matches_generic_union(spark, name):
    """The shared-intermediate builders must be row-identical to the
    generic per-part construction they replaced."""
    from pygrametl_spark.queries import ALL_QUERIES, ORACLES, QUERIES
    from pygrametl_spark.queries_merged import MERGES, _union_query

    schema, parts = MERGES[name]
    generic = _union_query(
        [(tag, ALL_QUERIES[p]) for tag, p in parts], schema
    )
    assert _rows(QUERIES[name](spark, SF)) == _rows(generic(spark, SF))
    # the registered oracle is the generic UNION ALL — presence pinned
    assert "UNION ALL" in ORACLES[name]


def test_parallel_union_matches_sequential(spark):
    """PARALLEL_BUILD construction = sequential construction, row for
    row and tag for tag (part order is preserved by the pool map)."""
    from pygrametl_spark.queries import ALL_QUERIES
    from pygrametl_spark.queries_merged import MERGES, PARALLEL_BUILD, _union_query

    name = "text_analysis"
    assert name in PARALLEL_BUILD
    schema, parts = MERGES[name]
    builders = [(tag, ALL_QUERIES[p]) for tag, p in parts]
    par = _union_query(builders, schema, parallel=True)(spark, SF)
    seq = _union_query(builders, schema, parallel=False)(spark, SF)
    assert par.columns == seq.columns
    assert _rows(par) == _rows(seq)


def test_lit_long_array_semantics(spark):
    from pygrametl_spark.functions.text import lit_long_array

    vals = [0, 1, -7, 2**40, 127]
    df = spark.range(1).select(
        lit_long_array(vals).alias("a"),
        F.array(*[F.lit(int(v)).cast("long") for v in vals]).alias("b"),
    )
    row = df.first()
    assert row["a"] == row["b"] == vals
    assert dict(df.dtypes)["a"] == dict(df.dtypes)["b"]
    empty = spark.range(1).select(lit_long_array([]).alias("a"))
    assert dict(empty.dtypes)["a"] == "array<bigint>"
    assert empty.first()["a"] == []


def test_worth_pinning_heuristic(spark):
    from pygrametl_spark.plans.keys import _worth_pinning

    plain = spark.read.parquet(f"{SF}/nation.parquet").select("n_name")
    assert not _worth_pinning(plain)
    assert _worth_pinning(plain.distinct())
    assert _worth_pinning(
        plain.join(spark.range(3).select(F.lit("x").alias("n_name")), "n_name")
    )


def test_catalog_memo_stable_and_mtime_invalidated(spark, tmp_path):
    from pygrametl_spark.catalog import _catalog_relation

    p = str(tmp_path / "t.parquet")
    spark.range(5).write.parquet(p)
    a = _catalog_relation(spark, p)
    b = _catalog_relation(spark, p)
    assert a is b  # same plan handle while the table is unchanged
    assert a.count() == 5
    # rewrite with a different mtime: the memo must not serve the old
    # file index (stale-read guard)
    os.utime(p, (os.path.getmtime(p) + 10, os.path.getmtime(p) + 10))
    spark.range(7).write.mode("overwrite").parquet(p)
    os.utime(p, (os.path.getmtime(p) + 20, os.path.getmtime(p) + 20))
    c = _catalog_relation(spark, p)
    assert c is not a
    assert c.count() == 7


def test_dense_keys_identical_with_and_without_pin(spark):
    """assign_dense_keys numbering is independent of the pin decision."""
    from pygrametl_spark.plans.keys import assign_dense_keys

    base = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_name")
        .distinct()  # -> _worth_pinning True on the default path
    )
    pinned = assign_dense_keys(base, ["c_name"], "k", 100)
    unpinned = assign_dense_keys(base, ["c_name"], "k", 100, approx_count=150)
    assert _rows(pinned) == _rows(unpinned)
