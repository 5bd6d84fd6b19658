"""Query registry part 3: grouping sets, source formats, LSH near-dup,
and the SCD2 incremental-merge equivalence query.

``scd2_incremental_merge`` is the flagship semantics proof: seed the SCD
from pre-cutoff history, push the post-cutoff events through the class's
batch ``scdensure`` merge, and the result must equal rebuilding from the
*full* history (same versions, validity intervals, and two-phase
surrogate keys) — which is exactly what the oracle computes in SQL.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pygrametl_spark.catalog import load_catalog, read_parquet
from pygrametl_spark.functions import similarity as sim
from pygrametl_spark.operators.scd import SlowlyChangingDimension, scd2_from_history
from pygrametl_spark.queries_shared import TS_FMT_DUCK, _fmt_ts
from pygrametl_spark.sources.sources import JSONLSource, PandasSource, TypedCSVSource

# ---------------------------------------------------------------------------
# Grouping sets (net-new surface the reference lacks; free in Spark)
# ---------------------------------------------------------------------------

def q_rollup_agg(spark, sf_dir):
    orders = load_catalog(spark, sf_dir).orders
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.round(F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(27,6)")).cast("double"), 2).alias("total"), F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "total", "n",
        )
    )


ORACLE_ROLLUP = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(27,6))) AS DOUBLE), 2) AS total, COUNT(*) AS n
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_cube_agg(spark, sf_dir):
    orders = load_catalog(spark, sf_dir).orders
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.round(F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(27,6)")).cast("double"), 2).alias("total"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "total",
        )
    )


ORACLE_CUBE = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(27,6))) AS DOUBLE), 2) AS total
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# Source formats through the correctness gate
# ---------------------------------------------------------------------------

def q_csv_source_roundtrip(spark, sf_dir):
    """customer -> CSV file -> TypedCSVSource scan (ref CSVSource/
    TypedCSVSource datasources.py:72-132) -> same relation."""
    cust = load_catalog(spark, sf_dir).customer.select("c_custkey", "c_name", "c_mktsegment")
    path = os.path.join(
        tempfile.gettempdir(), f"pygrametl_csv_{abs(hash(sf_dir)) % 10**8}.csv"
    )
    cust.toPandas().to_csv(path, index=False)
    return TypedCSVSource(spark, path, {"c_custkey": "long"})


ORACLE_CSV = "SELECT c_custkey, c_name, c_mktsegment FROM customer"


def q_jsonl_source(spark, sf_dir):
    """documents -> JSONL file -> JSONLSource scan with a pinned schema
    (no inference pass) -> same relation, embedded newlines and all."""
    docs = load_catalog(spark, sf_dir).documents.select(
        "doc_id", "text", "lang", "source"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"pygrametl_jsonl_{abs(hash(sf_dir)) % 10**8}.jsonl"
    )
    if not os.path.exists(path):
        docs.toPandas().to_json(path, orient="records", lines=True, force_ascii=False)
    return JSONLSource(
        spark, path, schema="doc_id long, text string, lang string, source string"
    ).select("doc_id", "text", "lang", "source")


ORACLE_JSONL = "SELECT doc_id, text, lang, source FROM documents"


def q_pandas_source(spark, sf_dir):
    """Arrow-path pandas ingestion (ref PandasSource datasources.py:220-233)."""
    import pyarrow.parquet as pq

    pdf = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    return PandasSource(spark, pdf)


ORACLE_PANDAS = "SELECT * FROM region"


# ---------------------------------------------------------------------------
# LSH-bucketed near-dup (the scale path, oracle-checked end to end)
# ---------------------------------------------------------------------------

def q_ann_lsh_neardup(spark, sf_dir):
    emb = load_catalog(spark, sf_dir).embeddings
    # each vector's norm is computed ONCE on the bucketed relation, not
    # once per candidate pair (guide §1.2): sqrt of the same dot fold
    # gives the same double, so the oracle values are unchanged — the
    # per-pair work drops from three 64-dim folds to one
    b = sim.lsh_bucket(emb).withColumn(
        "_nrm",
        F.expr(
            "sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
        ),
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = a.join(
        c,
        on=[F.col("a.bucket") == F.col("b.bucket"), F.col("a.vec_id") < F.col("b.vec_id")],
    )
    cos = F.round(
        F.expr(
            "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        / (F.col("a._nrm") * F.col("b._nrm")),
        6,
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.3)
        .select(F.col("a.vec_id").alias("id_1"), F.col("b.vec_id").alias("id_2"), "cosine")
    )


def _lsh_neardup_oracle() -> str:
    planes = ", ".join(
        "[" + ", ".join(repr(sim._plane_weight(p, i)) for i in range(64)) + "]"
        for p in range(8)
    )
    proj = (
        "list_sum(list_transform(generate_series(1, 64), "
        "i -> CAST(embedding[i] AS DOUBLE) * w[{p}][i]))"
    )
    bucket = " + ".join(
        f"(CASE WHEN {proj.format(p=p + 1)} >= 0 THEN {2 ** p} ELSE 0 END)" for p in range(8)
    )
    dot = (
        "list_sum(list_transform(generate_series(1, len({a})), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    cos = (
        f"ROUND({dot.format(a='a.embedding', b='b.embedding')} / "
        f"(sqrt({dot.format(a='a.embedding', b='a.embedding')}) * "
        f"sqrt({dot.format(a='b.embedding', b='b.embedding')})), 6)"
    )
    return f"""
WITH pl AS (SELECT [{planes}] AS w),
bk AS (SELECT vec_id, embedding, ({bucket}) AS bucket FROM embeddings CROSS JOIN pl)
SELECT a.vec_id AS id_1, b.vec_id AS id_2, {cos} AS cosine
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= 0.3
"""


ORACLE_LSH_NEARDUP = _lsh_neardup_oracle()


# ---------------------------------------------------------------------------
# SCD2 incremental merge == full-history rebuild
# ---------------------------------------------------------------------------

_CUT = "2024-01-15 00:00:00"


def q_scd2_incremental_merge(spark, sf_dir):
    events = load_catalog(spark, sf_dir).events
    cut = F.lit(_CUT).cast("timestamp")
    hist = scd2_from_history(
        events.filter(F.col("ts") < cut), ["user_id"], ["event_type"], "ts",
        key="id", tiebreak=["event_id"],
    )
    scd = SlowlyChangingDimension(
        "user_scd", "id", ["user_id", "event_type", "version", "fromdate", "todate"],
        ["user_id"], versionatt="version", fromatt="fromdate", toatt="todate",
        srcdateatt="ts", df=hist,
    )
    batch = (
        read_parquet(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("ts") >= cut)
        .select("user_id", "event_type", "ts")
    )
    scd.scdensure(batch)
    return scd.df.select(
        "id", "user_id", "event_type", "version",
        _fmt_ts("fromdate").alias("fromdate"), _fmt_ts("todate").alias("todate"),
    )


ORACLE_SCD2_INCREMENTAL = f"""
WITH c AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), kept AS (
  SELECT user_id, event_type, ts, event_id FROM c WHERE prev IS NULL OR prev <> event_type
), v AS (
  SELECT user_id, event_type, ts AS fromdate,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS todate,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
  FROM kept
), p1 AS (
  SELECT * FROM v WHERE fromdate < TIMESTAMP '{_CUT}'
), p1k AS (
  SELECT CAST(row_number() OVER (ORDER BY user_id, version) AS BIGINT) AS id, *
  FROM p1
), p2 AS (
  SELECT * FROM v WHERE fromdate >= TIMESTAMP '{_CUT}'
), p2k AS (
  SELECT (SELECT COUNT(*) FROM p1) + CAST(row_number() OVER (ORDER BY user_id, version) AS BIGINT) AS id, *
  FROM p2
), allk AS (
  SELECT * FROM p1k UNION ALL SELECT * FROM p2k
)
SELECT id, user_id, event_type, version,
       strftime(fromdate, '{TS_FMT_DUCK}') AS fromdate,
       strftime(todate, '{TS_FMT_DUCK}') AS todate
FROM allk
"""


# ---------------------------------------------------------------------------
# Skew-salted join (plans/joins.py salted_join): the explicit tool for
# single-key skew AQE cannot split. Result must equal the plain
# equi-join exactly — which is what the oracle computes.
# ---------------------------------------------------------------------------

def q_salted_join(spark, sf_dir):
    from pygrametl_spark.plans.joins import salted_join

    cat = load_catalog(spark, sf_dir)
    li = cat.lineitem.select(
        F.col("l_partkey").alias("pk"), "l_orderkey", "l_linenumber", "l_quantity"
    )
    pt = cat.part.select(F.col("p_partkey").alias("pk"), F.col("p_brand").alias("brand"))
    return salted_join(li, pt, "pk", salt=8).select(
        "l_orderkey", "l_linenumber", "pk", "brand", "l_quantity"
    )


ORACLE_SALTED_JOIN = """
SELECT l_orderkey, l_linenumber, l_partkey AS pk, p_brand AS brand, l_quantity
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# ---------------------------------------------------------------------------
# SCD2 with version-on-datechange (exact reference srcdateatt semantics,
# ref tables.py:1340-1365): a differing event date ALONE creates a new
# version; only exact (attributes, ts) repeats are suppressed.
# ---------------------------------------------------------------------------

def q_scd2_datechange(spark, sf_dir):
    events = load_catalog(spark, sf_dir).events
    dim = scd2_from_history(
        events, ["user_id"], ["event_type"], "ts", key="id",
        tiebreak=["event_id"], version_on_datechange=True,
    )
    return dim.select(
        "id", "user_id", "event_type", "version",
        _fmt_ts("fromdate").alias("fromdate"), _fmt_ts("todate").alias("todate"),
    )


ORACLE_SCD2_DATECHANGE = """
WITH changes AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_t, lag(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), kept AS (
  SELECT user_id, event_type, ts, event_id FROM changes
  WHERE prev_t IS NULL OR prev_t <> event_type OR prev_ts <> ts
), v AS (
  SELECT user_id, event_type, ts AS fromdate,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS todate,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
  FROM kept
), dim AS (
  SELECT CAST(row_number() OVER (ORDER BY user_id, version) AS BIGINT) AS id, *
  FROM v
)
SELECT id, user_id, event_type, version,
       strftime(fromdate, '{f}') AS fromdate,
       strftime(todate, '{f}') AS todate
FROM dim
""".format(f=TS_FMT_DUCK)


EXTRA_QUERIES = {
    "rollup_agg": q_rollup_agg,
    "salted_join": q_salted_join,
    "scd2_datechange": q_scd2_datechange,
    "cube_agg": q_cube_agg,
    "csv_source_roundtrip": q_csv_source_roundtrip,
    "jsonl_source": q_jsonl_source,
    "pandas_source": q_pandas_source,
    "ann_lsh_neardup": q_ann_lsh_neardup,
    "scd2_incremental_merge": q_scd2_incremental_merge,
}

EXTRA_ORACLES = {
    "rollup_agg": ORACLE_ROLLUP,
    "salted_join": ORACLE_SALTED_JOIN,
    "scd2_datechange": ORACLE_SCD2_DATECHANGE,
    "cube_agg": ORACLE_CUBE,
    "csv_source_roundtrip": ORACLE_CSV,
    "jsonl_source": ORACLE_JSONL,
    "pandas_source": ORACLE_PANDAS,
    "ann_lsh_neardup": ORACLE_LSH_NEARDUP,
    "scd2_incremental_merge": ORACLE_SCD2_INCREMENTAL,
}
