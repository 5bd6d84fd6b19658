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
    [
        "scd2_type1_overrides", "sampling_suite", "scd2_build_close",
        "dedup_ngram_jaccard",
    ],
)
def test_shared_builder_matches_generic_union(spark, name):
    """The shared-intermediate (and fully-fused) builders must be
    row-identical to the generic per-part construction they replaced."""
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


# ---------------------------------------------------------------------------
# Single-parse SQL-text twins (r9 continuation): every converted builder
# must stay value-identical to the python Column construction it
# replaced. These pin the dual-path functions (str fast path vs Column
# path) and the SQL-text helpers against their python equivalents on
# edge-case inputs, so the two implementations cannot silently diverge.
# ---------------------------------------------------------------------------


def test_tokens_sql_twin(spark):
    from pygrametl_spark.functions.text import _tokens_sql, tokens

    df = spark.createDataFrame(
        [(" a b   c ",), ("",), (None,), ("one\ttwo\nthree",)], ["text"]
    )
    a = df.select(tokens("text").alias("t")).collect()
    b = df.select(F.expr(_tokens_sql("text")).alias("t")).collect()
    assert a == b


def test_shingles_str_and_column_paths_identical(spark):
    from pygrametl_spark.functions.text import shingles_of_tokens, tokens

    df = spark.createDataFrame(
        [("a b c d e",), ("a b",), ("",), (None,), ("x y z",)], ["text"]
    ).select(tokens("text").alias("_toks"))
    a = df.select(shingles_of_tokens("_toks", 3).alias("s")).collect()
    b = df.select(shingles_of_tokens(F.col("_toks"), 3).alias("s")).collect()
    assert a == b


def test_hash32_spark_sql_twin(spark):
    from pygrametl_spark.functions.dedup import hash32, hash32_spark_sql

    df = spark.createDataFrame([("hello",), ("",), (None,), ("ünïcode",)], ["x"])
    a = df.select(hash32("x").alias("h")).collect()
    b = df.select(F.expr(hash32_spark_sql("x")).alias("h")).collect()
    assert a == b


def test_url_normalize_str_and_column_paths_identical(spark):
    from pygrametl_spark.functions import urls as ur

    cases = [
        "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
        "https://example.com:443/",
        "https://user:pw@sub.example.co.uk:8443/path/?fbclid=zz&z=9",
        "ftp://10.1.2.3/x",
        "http://[::1]:8080/q?a=",
        "https://example.com/a/b///?ref=1&Ref_src=2&c=",
        "",
        "no-scheme-here",
        None,
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    a = df.select(
        ur.url_normalize(F.col("url")).alias("n"),
        ur.registered_domain(ur.url_host(F.col("url"))).alias("d"),
    ).collect()
    b = df.select(
        ur.url_normalize("url").alias("n"),
        ur.registered_domain(ur._host_sql("url")).alias("d"),
    ).collect()
    assert a == b
    # options must route through the SQL path identically
    for kw in ({"strip_www": False}, {"strip_tracking": False}):
        x = df.select(ur.url_normalize(F.col("url"), **kw).alias("n")).collect()
        y = df.select(ur.url_normalize("url", **kw).alias("n")).collect()
        assert x == y


def test_local_relation_value_identity(spark):
    """local_relation must hand back EXACTLY the rows createDataFrame
    would, for every supported literal type — including bit-exact
    doubles (repr round-trip), NaN/Infinity, NULLs, arrays, quotes and
    backslashes in strings."""
    import math

    from pygrametl_spark.plans.local import local_relation

    rows = [
        (1, 0.1 + 0.2, "plain", [1.5, -0.0, 2.0 ** -45], True),
        (-(2 ** 62), float("nan"), "it's a \\ 'quote'", [], False),
        (None, float("inf"), None, None, None),
        (7, float("-inf"), "newline\nand\ttab", [math.pi, 1e-308], True),
    ]
    ddl = "a bigint, b double, c string, d array<double>, e boolean"
    lr = local_relation(spark, rows, ddl)
    cd = spark.createDataFrame(rows, schema=ddl)
    assert lr.schema == cd.schema

    def key(r):
        def f(v):
            if isinstance(v, float):
                return repr(v)  # distinguishes nan/inf, exact bits
            if isinstance(v, list):
                return tuple(repr(x) for x in v)
            return v
        return tuple(repr(f(v)) for v in r)

    assert sorted(map(key, lr.collect())) == sorted(map(key, cd.collect()))


def test_local_relation_is_jvm_only(spark):
    """The point of local_relation: the plan is a LocalTableScan with no
    Python-RDD scan, so downstream actions never spawn Python workers
    for the sidecar."""
    from pygrametl_spark.plans.local import local_relation

    lr = local_relation(spark, [(1, "x"), (2, "y")], "k bigint, v string")
    plan = lr._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan and "EvalPython" not in plan


def test_local_relation_fallbacks(spark):
    """Empty input, over-cap input, and unsupported literal types all
    fall back to createDataFrame with identical values."""
    from pygrametl_spark.plans.local import local_relation

    assert local_relation(spark, [], "a bigint").count() == 0
    big = [(i,) for i in range(50)]
    capped = local_relation(spark, big, "a bigint", max_values_rows=10)
    assert "ExistingRDD" in capped._jdf.queryExecution().executedPlan().toString()
    assert sorted(r.a for r in capped.collect()) == list(range(50))
    import datetime

    dates = [(datetime.date(2026, 1, 1),), (None,)]
    fb = local_relation(spark, dates, "d date")
    assert sorted(str(r.d) for r in fb.collect()) == ["2026-01-01", "None"]


def test_getbykey_list_uses_local_relation(spark):
    """Dimension.getbykey with a Python key list keeps left-join
    semantics and plans the key probe as a LocalTableScan."""
    from pygrametl_spark.operators.dimension import Dimension

    dim_df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    )
    dim = Dimension("d", "id", ["name"], df=dim_df)
    out = dim.getbykey([2, 99])
    rows = {r.id: r.name for r in out.collect()}
    assert rows == {2: "b", 99: None}


def test_banded_buckets_np_identity(spark):
    """The vectorized numpy banding must equal the interpreted-HOF
    expression twin element-for-element — including Spark's NaN-above-
    everything comparison semantics and the zip_with degenerate rows
    (NULL vector, NULL element, ragged length, empty array -> all-zero
    buckets)."""
    import pygrametl_spark.functions.similarity as sim

    dim, n_bands, ppb = 8, 4, 3
    planes = [
        [sim._plane_weight(p, i) for i in range(dim)]
        for p in range(n_bands * ppb)
    ]
    rows = [
        (1, [float(i) - 3.5 for i in range(dim)]),
        (2, [0.0] * dim),
        (3, [-1.0] * dim),
        (4, [float("nan")] + [1.0] * (dim - 1)),
        (5, [float("inf")] + [1.0] * (dim - 1)),
        (6, [float("-inf")] + [1.0] * (dim - 1)),
        (7, None),
        (8, [1.0, None] + [2.0] * (dim - 2)),
        (9, [1.0] * (dim - 2)),          # too short
        (10, [1.0] * (dim + 3)),         # too long
        (11, []),                        # empty
        (12, [0.25 * i for i in range(dim)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    expr_b = sim._banded_buckets_expr("embedding", planes, n_bands, ppb)
    np_b = sim._banded_buckets_np(planes, n_bands, ppb, dim)(F.col("embedding"))
    got = {
        r.vec_id: (list(r.e) if r.e is not None else None, list(r.n))
        for r in df.select(
            "vec_id", expr_b.alias("e"), np_b.alias("n")
        ).collect()
    }
    for vid, (e, n) in got.items():
        if vid == 8:
            # Arrow erases NULL-element-vs-NaN inside list columns, so
            # the np path scores a NULL ELEMENT like NaN (all-ones bits)
            # where the expression twin yields bit 0 — pinned here.
            assert e == [0] * n_bands
            assert n == got[4][1]  # same as the true-NaN row
            continue
        assert e == n, f"vec_id {vid}: expr {e} != np {n}"
    # degenerate rows are the all-zero bucket array in both paths
    for vid in (7, 9, 10, 11):
        assert got[vid][1] == [0] * n_bands


