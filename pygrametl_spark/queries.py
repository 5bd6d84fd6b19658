"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each query is ``(spark, sf_dir) -> DataFrame`` exercising one engine
operator over the driver's TPC-H-ish tables, paired with an ANSI-SQL
oracle (DuckDB) computing the same relation. Conventions for
hash-stable parity:

- every computed column is aliased identically on both sides;
- money/ratio aggregates are ``ROUND``-ed (sum order differs between
  engines at the last ulp);
- timestamps are emitted as formatted strings (microsecond precision)
  so engine-native representations never enter the hash;
- int-like computed columns are cast to BIGINT on both sides;
- all orderings used for keys/versions have a total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pygrametl_spark.catalog import load_catalog
from pygrametl_spark.functions.aggregators import Avg, Count, CountDistinct, Max, Min, Sum, crosstab
from pygrametl_spark.functions.helpers import datespan, getfloat, project, toupper
from pygrametl_spark.operators.dimension import Dimension
from pygrametl_spark.operators.facttable import AccumulatingSnapshotFactTable, FactTable
from pygrametl_spark.operators.scd import (
    SlowlyChangingDimension,
    TypeOneSlowlyChangingDimension,
    scd2_from_history,
)
from pygrametl_spark.operators.snowflake import SnowflakedDimension
from pygrametl_spark.plans.keys import assign_dense_keys
from pygrametl_spark.sources.sources import (
    FilteringSource,
    HashJoiningSource,
    MappingSource,
    MergeJoiningSource,
    SQLTransformingSource,
    UnionSource,
)

# Shared oracle-formatting helpers live in the leaf module
# queries_shared (re-exported here for existing callers) — defining
# them in THIS module made queries_extra/queries_more import back into
# the registry assembler, a latent import cycle.
from pygrametl_spark.queries_shared import (  # noqa: F401
    _SCD2_DUCK_DIM, TS_FMT_DUCK, TS_FMT_SPARK, _fmt_ts,
)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1 pricing summary (aggregator facade; SURVEY §2.6)
# ---------------------------------------------------------------------------

def _dsum(expr):
    """Order-independent sum of a double expression: each summand is
    ROUNDed to 6 (HALF_UP in both engines) and cast to DECIMAL(27,6),
    so the aggregation is EXACT integer arithmetic — a float SUM's
    result depends on accumulation order, and at 10x the gate scale
    that drift crosses a rounding boundary (one cent in 2.7e9 observed
    at sf0.1). TPC-H prices are decimals anyway."""
    return F.sum(F.round(expr, 6).cast("decimal(27,6)")).cast("double")


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(_dsum(F.col("l_quantity")), 2).alias("sum_qty"),
            F.round(_dsum(F.col("l_extendedprice")), 2).alias("sum_base_price"),
            F.round(_dsum(disc_price), 2).alias("sum_disc_price"),
            F.round(_dsum(charge), 2).alias("sum_charge"),
            F.round(_dsum(F.col("l_quantity")) / n, 4).alias("avg_qty"),
            F.round(_dsum(F.col("l_extendedprice")) / n, 4).alias("avg_price"),
            F.round(_dsum(F.col("l_discount")) / n, 6).alias("avg_disc"),
            Count("l_orderkey").column("count_order"),
            CountDistinct("l_orderkey").column("n_orders"),
            F.round(Min("l_extendedprice").column(), 2).alias("min_price"),
            F.round(Max("l_extendedprice").column(), 2).alias("max_price"),
        )
    )


def _dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(ROUND({expr}, 6) AS DECIMAL(27,6))) AS DOUBLE)"


ORACLE_Q01 = f"""
SELECT l_returnflag, l_linestatus,
       ROUND({_dsum_sql('l_quantity')}, 2) AS sum_qty,
       ROUND({_dsum_sql('l_extendedprice')}, 2) AS sum_base_price,
       ROUND({_dsum_sql('l_extendedprice * (1 - l_discount)')}, 2) AS sum_disc_price,
       ROUND({_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}, 2) AS sum_charge,
       ROUND({_dsum_sql('l_quantity')} / COUNT(*), 4) AS avg_qty,
       ROUND({_dsum_sql('l_extendedprice')} / COUNT(*), 4) AS avg_price,
       ROUND({_dsum_sql('l_discount')} / COUNT(*), 6) AS avg_disc,
       COUNT(l_orderkey) AS count_order,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Projections / filters / scalar transforms (SURVEY §2.3)
# ---------------------------------------------------------------------------

def q_project_rename(spark, sf_dir):
    cust = load_catalog(spark, sf_dir).customer
    return project(cust, ["name", "segment"], renaming={"name": "c_name", "segment": "c_mktsegment"})


ORACLE_PROJECT = "SELECT c_name AS name, c_mktsegment AS segment FROM customer"


def q_filtering_source(spark, sf_dir):
    orders = load_catalog(spark, sf_dir).orders
    return FilteringSource(
        orders, (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)
    ).select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))


ORACLE_FILTER = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000
"""


def q_mapping_source(spark, sf_dir):
    cust = load_catalog(spark, sf_dir).customer
    mapped = MappingSource(
        cust,
        {
            "c_name": toupper,
            "c_acctbal": lambda c: F.floor(c * 100).cast("long"),
        },
    )
    return mapped.select(
        "c_custkey", F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal_cents")
    )


ORACLE_MAPPING = """
SELECT c_custkey, UPPER(c_name) AS name, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer
"""


def q_valuemapping_step(spark, sf_dir):
    orders = load_catalog(spark, sf_dir).orders
    mapping = F.when(F.col("o_orderstatus") == "O", "Open").when(
        F.col("o_orderstatus") == "F", "Finished"
    ).when(F.col("o_orderstatus") == "P", "Pending").otherwise("Unknown")
    return orders.select("o_orderkey", mapping.alias("status_name"))


ORACLE_VALUEMAPPING = """
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
            WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS status_name
FROM orders
"""


def q_conditional_step(spark, sf_dir):
    """ConditionalStep (ref steps.py:390-422): route rows to two branches."""
    orders = load_catalog(spark, sf_dir).orders
    pred = F.col("o_totalprice") > 200000
    big = orders.filter(pred).withColumn("branch", F.lit("big"))
    small = orders.filter(~pred).withColumn("branch", F.lit("small"))
    return UnionSource(big, small).select("o_orderkey", "branch")


ORACLE_CONDITIONAL = """
SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS branch
FROM orders
"""


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# ---------------------------------------------------------------------------

def q_hash_joining_source(spark, sf_dir):
    cat = load_catalog(spark, sf_dir)
    joined = HashJoiningSource(cat.lineitem, "l_partkey", cat.part, "p_partkey")
    return joined.select(
        "l_orderkey", "l_linenumber", F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"), F.round("l_extendedprice", 2).alias("price"),
    )


ORACLE_HASH_JOIN = """
SELECT l_orderkey, l_linenumber, p_name AS part_name, p_brand AS brand,
       ROUND(l_extendedprice, 2) AS price
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_merge_joining_source(spark, sf_dir):
    cat = load_catalog(spark, sf_dir)
    joined = MergeJoiningSource(cat.orders, "o_custkey", cat.customer, "c_custkey")
    return joined.select("o_orderkey", F.col("c_name").alias("customer"),
                         F.round("o_totalprice", 2).alias("totalprice"))


ORACLE_MERGE_JOIN = """
SELECT o_orderkey, c_name AS customer, ROUND(o_totalprice, 2) AS totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_dim_lookup(spark, sf_dir):
    part = load_catalog(spark, sf_dir).part
    names = part.select(F.col("p_name").alias("name")).distinct()
    dim = Dimension(
        "pname_dim", "id", ["name"], defaultidvalue=-1,
        df=assign_dense_keys(names, ["name"], "id", 0),
    )
    known = part.filter("p_size < 10").select(F.col("p_name").alias("name")).distinct()
    unknown = part.filter("p_size > 45").select(
        F.concat(F.col("p_name"), F.lit("_zz")).alias("name")
    ).distinct()
    probe = UnionSource(known, unknown)
    return dim.lookup(probe, broadcast=True)


ORACLE_DIM_LOOKUP = """
WITH dim AS (
  SELECT CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id, name
  FROM (SELECT DISTINCT p_name AS name FROM part)
), probe AS (
  SELECT DISTINCT p_name AS name FROM part WHERE p_size < 10
  UNION
  SELECT DISTINCT p_name || '_zz' AS name FROM part WHERE p_size > 45
)
SELECT probe.name, COALESCE(dim.id, -1) AS id
FROM probe LEFT JOIN dim ON probe.name = dim.name
"""


def q_dim_getbyvals(spark, sf_dir):
    part = load_catalog(spark, sf_dir).part
    dim = Dimension(
        "part_dim", "p_partkey", ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
        lookupatts=["p_name"], df=part,
    )
    return dim.getbyvals({"p_brand": "Brand#13", "p_type": "MEDIUM"}).select(
        "p_partkey", "p_name", "p_size"
    )


ORACLE_GETBYVALS = """
SELECT p_partkey, p_name, p_size FROM part
WHERE p_brand = 'Brand#13' AND p_type = 'MEDIUM'
"""


# ---------------------------------------------------------------------------
# Ensure / key assignment (SURVEY §2.5)
# ---------------------------------------------------------------------------

def q_dim_ensure(spark, sf_dir):
    part = load_catalog(spark, sf_dir).part
    seed = part.filter("p_size <= 2").select(F.col("p_brand").alias("brand")).distinct()
    dim = Dimension("brand_dim", "id", ["brand"], df=assign_dense_keys(seed, ["brand"], "id", 0))
    dim.ensure(part, namemapping={"brand": "p_brand"})
    return dim.df


ORACLE_DIM_ENSURE = """
WITH seed AS (SELECT DISTINCT p_brand AS brand FROM part WHERE p_size <= 2),
seeded AS (SELECT CAST(row_number() OVER (ORDER BY brand) AS BIGINT) AS id, brand FROM seed),
newm AS (
  SELECT DISTINCT p_brand AS brand FROM part
  WHERE p_brand NOT IN (SELECT brand FROM seeded)
)
SELECT id, brand FROM seeded
UNION ALL
SELECT (SELECT COUNT(*) FROM seeded) + CAST(row_number() OVER (ORDER BY brand) AS BIGINT) AS id,
       brand
FROM newm
"""


def q_dim_update(spark, sf_dir):
    cust = load_catalog(spark, sf_dir).customer
    dim = Dimension(
        "customer_dim", "c_custkey", ["c_name", "c_acctbal", "c_mktsegment"],
        lookupatts=["c_name"], df=cust,
    )
    updates = cust.filter("c_acctbal > 9000").select(
        "c_custkey", F.lit("PREMIUM").alias("c_mktsegment")
    )
    dim.update(updates)
    return dim.df


ORACLE_DIM_UPDATE = """
SELECT c_custkey, c_name, c_acctbal,
       CASE WHEN c_acctbal > 9000 THEN 'PREMIUM' ELSE c_mktsegment END AS c_mktsegment
FROM customer
"""


# ---------------------------------------------------------------------------
# SCD type 1 / type 2 / as-of (SURVEY §2.5, §2.7)
# ---------------------------------------------------------------------------

def q_scd_typeone(spark, sf_dir):
    cat = load_catalog(spark, sf_dir)
    cust, orders = cat.customer, cat.orders
    dim = TypeOneSlowlyChangingDimension(
        "cust_t1", "c_custkey", ["c_name", "c_acctbal", "c_mktsegment"],
        ["c_name"], type1atts=["c_acctbal"], df=cust,
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
        .select("o_custkey", "o_totalprice")
    )
    batch = latest.join(
        cust.select("c_custkey", "c_name"), latest.o_custkey == F.col("c_custkey")
    ).select("c_name", F.col("o_totalprice").alias("c_acctbal"))
    dim.scdensure(batch)
    return dim.df


ORACLE_SCD_TYPEONE = """
WITH latest AS (
  SELECT o_custkey, o_totalprice FROM (
    SELECT o_custkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders) t WHERE rn = 1
)
SELECT c_custkey, c_name, COALESCE(l.o_totalprice, c_acctbal) AS c_acctbal, c_mktsegment
FROM customer c LEFT JOIN latest l ON c.c_custkey = l.o_custkey
"""


def q_scd2_build(spark, sf_dir, *, dim_df=None):
    """Replay the full event history through SCD2 semantics in one job."""
    if dim_df is None:
        events = load_catalog(spark, sf_dir).events
        dim_df = scd2_from_history(
            events, ["user_id"], ["event_type"], "ts", key="id", tiebreak=["event_id"]
        )
    return dim_df.select(
        "id", "user_id", "event_type", "version",
        _fmt_ts("fromdate").alias("fromdate"), _fmt_ts("todate").alias("todate"),
    )


ORACLE_SCD2_BUILD = _SCD2_DUCK_DIM + """
SELECT id, user_id, event_type, version,
       strftime(fromdate, '{f}') AS fromdate,
       strftime(todate, '{f}') AS todate
FROM dim
""".format(f=TS_FMT_DUCK)


def q_scd_lookupasof(spark, sf_dir):
    """As-of join: for each purchase event, the SCD2 version valid at its ts."""
    events = load_catalog(spark, sf_dir).events
    dim_df = scd2_from_history(
        events, ["user_id"], ["event_type"], "ts", key="id", tiebreak=["event_id"]
    )
    scd = SlowlyChangingDimension(
        "user_scd", "id", ["user_id", "event_type", "version", "fromdate", "todate"],
        ["user_id"], versionatt="version", fromatt="fromdate", toatt="todate", df=dim_df,
    )
    from pygrametl_spark.catalog import read_parquet

    probe = (
        read_parquet(spark, f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .select("event_id", "user_id", "ts")
    )
    return scd.lookupasof(probe, "ts").select("event_id", "id")


def q_asof_generic(spark, sf_dir):
    """General-purpose as-of join (plans/joins.asof_join, the brief's
    named custom operator): each click matched to the same user's most
    recent prior-or-simultaneous purchase. One shuffle on the key +
    union-tagged window carry — never a range-join candidate product.
    The right side is deduped per (user, ts) so the tie winner is
    engine-independent; DuckDB replays it with its native ASOF JOIN."""
    from pygrametl_spark.plans.joins import asof_join

    ev = load_catalog(spark, sf_dir).events
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    buys = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join(
        clicks, buys, "user_id", left_time="ts", right_time="ts",
        right_cols=["purchase_id"],
    ).select("click_id", "purchase_id")


ORACLE_ASOF_GENERIC = """
WITH c AS (
  SELECT event_id AS click_id, user_id, ts FROM events
  WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_id FROM events
  WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.click_id, p.purchase_id
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
"""


def q_range_join_events(spark, sf_dir):
    """Bucketized point-in-interval join (plans/joins.range_join): each
    click attributed to every same-user purchase window [ts, ts+1h).
    The range dimension is bucketized so the physical plan is a hash
    equi-join on (user_id, bucket) + exact filter — never the
    BroadcastNestedLoopJoin Spark plans for a raw p BETWEEN s AND e
    condition (quadratic per key; the plan guard pins this). The oracle
    is DuckDB's native interval join on the same epoch-micro bounds."""
    from pygrametl_spark.plans.joins import range_join

    HOUR_US = 3_600_000_000
    # ts is TIMESTAMP_NTZ: micros measured from a fixed naive anchor are
    # timezone-independent in both engines (unix_micros would depend on
    # the session timezone, which the driver does not pin)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)"
    )
    ev = load_catalog(spark, sf_dir).events
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", us.alias("p"),
    )
    buys = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id", us.alias("s"),
        (us + F.lit(HOUR_US)).alias("e"),
    )
    return range_join(
        clicks, buys, point="p", start="s", end="e", on="user_id",
        bucket_width=HOUR_US, open_ended=False,
    ).select("click_id", "purchase_id")


ORACLE_RANGE_JOIN = """
WITH c AS (
  SELECT event_id AS click_id, user_id,
         datediff('microseconds', TIMESTAMP '2024-01-01 00:00:00', ts) AS p
  FROM events WHERE event_type = 'click'
),
b AS (
  SELECT event_id AS purchase_id, user_id,
         datediff('microseconds', TIMESTAMP '2024-01-01 00:00:00', ts) AS s,
         datediff('microseconds', TIMESTAMP '2024-01-01 00:00:00', ts)
           + 3600000000 AS e
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, b.purchase_id
FROM c JOIN b ON c.user_id = b.user_id AND c.p >= b.s AND c.p < b.e
"""


ORACLE_SCD_ASOF = _SCD2_DUCK_DIM + """
SELECT e.event_id, d.id
FROM events e JOIN dim d
  ON e.user_id = d.user_id AND d.fromdate <= e.ts
 AND (d.todate IS NULL OR e.ts < d.todate)
WHERE e.event_type = 'purchase'
"""


def q_scd_closecurrent(spark, sf_dir, *, dim_df=None):
    """closecurrent: stamp the open version's todate (ref tables.py:1530-1553)."""
    if dim_df is None:
        events = load_catalog(spark, sf_dir).events
        dim_df = scd2_from_history(
            events, ["user_id"], ["event_type"], "ts", key="id", tiebreak=["event_id"]
        )
    scd = SlowlyChangingDimension(
        "user_scd", "id", ["user_id", "event_type", "version", "fromdate", "todate"],
        ["user_id"], versionatt="version", fromatt="fromdate", toatt="todate", df=dim_df,
    )
    import datetime

    scd.closecurrent(None, datetime.datetime(2030, 1, 1))
    return scd.df.select("id", "user_id", "version", _fmt_ts("todate").alias("todate"))


ORACLE_SCD_CLOSE = _SCD2_DUCK_DIM + """
SELECT id, user_id, version,
       strftime(COALESCE(todate, TIMESTAMP '2030-01-01 00:00:00'), '{f}') AS todate
FROM dim
""".format(f=TS_FMT_DUCK)


# ---------------------------------------------------------------------------
# Snowflaked dimension (SURVEY §2.4/§2.5)
# ---------------------------------------------------------------------------

def _snowflake(spark, sf_dir):
    cat = load_catalog(spark, sf_dir)
    region_dim = Dimension("region", "r_regionkey", ["r_name"], df=cat.region)
    nation_dim = Dimension(
        "nation", "n_nationkey", ["n_name", "r_regionkey"], lookupatts=["n_name"],
        df=cat.nation.withColumnRenamed("n_regionkey", "r_regionkey"),
    )
    cust_dim = Dimension(
        "customer", "c_custkey", ["c_name", "n_nationkey", "c_acctbal", "c_mktsegment"],
        lookupatts=["c_name"],
        df=cat.customer.withColumnRenamed("c_nationkey", "n_nationkey"),
    )
    return cat, SnowflakedDimension([(cust_dim, nation_dim), (nation_dim, region_dim)])


def q_snowflake_lookuprow(spark, sf_dir):
    cat, snow = _snowflake(spark, sf_dir)
    probe = cat.customer.filter("c_acctbal > 5000").select("c_name")
    out = snow.lookuprow(probe)
    return out.select(
        F.col("c_custkey"), F.col("c_name").alias("name"),
        F.col("n_name").alias("nation"), F.col("r_name").alias("region"),
    )


ORACLE_SNOWFLAKE_LOOKUP = """
SELECT c_custkey, c_name AS name, n_name AS nation, r_name AS region
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_acctbal > 5000
"""


def q_snowflake_ensure(spark, sf_dir):
    cat, snow = _snowflake(spark, sf_dir)
    batch = (
        cat.supplier.join(cat.nation, cat.supplier.s_nationkey == cat.nation.n_nationkey)
        .join(cat.region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("s_name").alias("c_name"), F.col("s_acctbal").alias("c_acctbal"),
            "n_name", "r_name",
        )
    )
    snow.ensure(batch)
    return snow.root.df.select("c_custkey", "c_name", "n_nationkey", "c_acctbal")


ORACLE_SNOWFLAKE_ENSURE = """
WITH batch AS (
  SELECT s_name AS c_name, s_acctbal AS c_acctbal, n_nationkey
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
), newm AS (
  SELECT c_name, c_acctbal, n_nationkey FROM batch
  WHERE c_name NOT IN (SELECT c_name FROM customer)
), mx AS (SELECT MAX(c_custkey) AS m FROM customer)
SELECT c_custkey, c_name, c_nationkey AS n_nationkey, c_acctbal FROM customer
UNION ALL
SELECT (SELECT m FROM mx) + CAST(row_number() OVER (ORDER BY c_name) AS BIGINT),
       c_name, n_nationkey, c_acctbal
FROM newm
"""


# ---------------------------------------------------------------------------
# Fact tables (SURVEY §2.2/§2.5)
# ---------------------------------------------------------------------------

def q_fact_ensure(spark, sf_dir):
    orders = load_catalog(spark, sf_dir).orders
    seed = orders.filter("o_orderdate < TIMESTAMP '1997-01-01 00:00:00'")
    fact = FactTable("orders_fact", ["o_orderkey", "o_custkey"], ["o_totalprice"], df=seed)
    fact.ensure(orders)
    return fact.df.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))


ORACLE_FACT_ENSURE = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice FROM orders
"""


def q_fact_lookup(spark, sf_dir):
    orders = load_catalog(spark, sf_dir).orders
    fact = FactTable("orders_fact", ["o_orderkey", "o_custkey"], ["o_totalprice"], df=orders)
    probe = orders.filter("o_orderstatus = 'P'").select("o_orderkey", "o_custkey")
    return fact.lookup(probe).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


ORACLE_FACT_LOOKUP = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderstatus = 'P'
"""


def q_accumulating_snapshot(spark, sf_dir):
    """Milestone-arrival merge over the events stream (ref tables.py:2359-2505)."""
    ev = load_catalog(spark, sf_dir).events

    def expander(df):
        have_both = F.col("click_ts").isNotNull() & F.col("purchase_ts").isNotNull()
        lag = (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).cast("long")
        return df.withColumn("click_to_purchase_s", F.when(have_both, lag))

    base = (
        ev.select("user_id").distinct()
        .withColumn("view_ts", F.lit(None).cast("timestamp"))
        .withColumn("click_ts", F.lit(None).cast("timestamp"))
        .withColumn("purchase_ts", F.lit(None).cast("timestamp"))
        .withColumn("click_to_purchase_s", F.lit(None).cast("long"))
    )
    fact = AccumulatingSnapshotFactTable(
        "user_snapshot", ["user_id"], ["view_ts", "click_ts", "purchase_ts"],
        ["click_to_purchase_s"], factexpander=expander, df=base,
    )
    for et, colname in [("view", "view_ts"), ("click", "click_ts"), ("purchase", "purchase_ts")]:
        batch = ev.filter(F.col("event_type") == et).groupBy("user_id").agg(
            F.min("ts").alias(colname)
        )
        fact.ensure(batch)
    return fact.df.select(
        "user_id", _fmt_ts("view_ts").alias("view_ts"), _fmt_ts("click_ts").alias("click_ts"),
        _fmt_ts("purchase_ts").alias("purchase_ts"), "click_to_purchase_s",
    )


ORACLE_ACC_SNAPSHOT = """
WITH agg AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS view_ts,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS click_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
  FROM events GROUP BY user_id
)
SELECT user_id,
       strftime(view_ts, '{f}') AS view_ts,
       strftime(click_ts, '{f}') AS click_ts,
       strftime(purchase_ts, '{f}') AS purchase_ts,
       CAST(CASE WHEN click_ts IS NOT NULL AND purchase_ts IS NOT NULL
            THEN epoch(date_trunc('second', purchase_ts)) - epoch(date_trunc('second', click_ts))
            END AS BIGINT) AS click_to_purchase_s
FROM agg
""".format(f=TS_FMT_DUCK)


# ---------------------------------------------------------------------------
# Aggregation / pivot / windows / set ops (SURVEY §2.6-§2.8)
# ---------------------------------------------------------------------------

def q_crosstab(spark, sf_dir):
    orders = load_catalog(spark, sf_dir).orders
    return crosstab(
        orders, "o_orderpriority", "o_orderstatus", "o_totalprice",
        aggregator=F.round(_dsum(F.col("o_totalprice")), 2),
        colvalues=["O", "F", "P"], nonevalue=0.0, sortrows=False,
    )


ORACLE_CROSSTAB = """
SELECT o_orderpriority,
       COALESCE(ROUND(CAST(SUM(CAST(ROUND(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END, 6) AS DECIMAL(27,6))) AS DOUBLE), 2), 0.0) AS "O",
       COALESCE(ROUND(CAST(SUM(CAST(ROUND(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 6) AS DECIMAL(27,6))) AS DOUBLE), 2), 0.0) AS "F",
       COALESCE(ROUND(CAST(SUM(CAST(ROUND(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END, 6) AS DECIMAL(27,6))) AS DOUBLE), 2), 0.0) AS "P"
FROM orders GROUP BY o_orderpriority
"""


def q_datespan(spark, sf_dir):  # noqa: ARG001
    return datespan(
        spark, "1995-01-01", "1995-12-31",
        expander=lambda d: {"quarter": F.quarter(d).cast("int")},
    )


ORACLE_DATESPAN = """
SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS dateid,
       strftime(d, '%Y-%m-%d') AS date,
       strftime(d, '%B') AS monthname,
       strftime(d, '%A') AS weekday,
       CAST(year(d) AS INT) AS year,
       CAST(month(d) AS INT) AS month,
       CAST(day(d) AS INT) AS day,
       CAST(quarter(d) AS INT) AS quarter
FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY))::DATE AS d) t
"""


def q_newest_version(spark, sf_dir):
    """Newest-version-per-member window (ref tables.py:1181-1202)."""
    orders = load_catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
        .select("o_custkey", "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
    )


ORACLE_NEWEST = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) t
WHERE rn = 1
"""


def q_topk(spark, sf_dir):
    orders = load_catalog(spark, sf_dir).orders
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10).select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


ORACLE_TOPK = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_topk_pergroup(spark, sf_dir):
    """Top-3 orders per priority — the windowed top-N-per-group staple.
    Shuffles once on the group key; the per-partition sort is bounded by
    the rank cutoff (Spark pushes the limit into the window sort), so no
    global ordering ever materializes — the shape that survives 100 TB.
    Deterministic under ties via the o_orderkey tiebreak."""
    orders = load_catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderpriority", "rk", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


ORACLE_TOPK_PERGROUP = """
SELECT o_orderpriority, rk, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_union_source(spark, sf_dir):
    cat = load_catalog(spark, sf_dir)
    c = cat.customer.select(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = cat.supplier.select(F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"))
    return UnionSource(c, s)


ORACLE_UNION = """
SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment FROM customer
UNION ALL BY NAME
SELECT s_name AS name, s_acctbal AS acctbal FROM supplier
"""


_Q5_SQL = """
SELECT n_name, ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(27,6))) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_sql_transforming(spark, sf_dir):
    """SQLTransformingSource: the engine's first-class SQL surface
    (ref datasources.py:451-606)."""
    cat = load_catalog(spark, sf_dir, views=True)
    return SQLTransformingSource(cat.lineitem, "lineitem", _Q5_SQL)


ORACLE_Q5 = _Q5_SQL


_ENGINE_SQL_WH: "str | None" = None


def _engine_sql_wh() -> str:
    """Per-process unique warehouse dir for q_engine_sql: a fixed /tmp
    path made two concurrent gate runs on one host collide (VERDICT r4
    "wrong" #4). One mkdtemp per process keeps repeat bench iterations
    idempotent (overwrite-in-place) without cross-process sharing."""
    import tempfile

    global _ENGINE_SQL_WH
    if _ENGINE_SQL_WH is None:
        _ENGINE_SQL_WH = tempfile.mkdtemp(prefix="pygrametl_spark_engine_sql_wh_")
    return _ENGINE_SQL_WH


def q_engine_sql(spark, sf_dir):
    """Engine.sql: ANSI SQL over the REGISTERED warehouse — every
    registered table becomes a queryable view reflecting its current
    (post-ensure) state, and Catalyst optimizes straight through the
    view boundary (the SQLTransformingSource germ generalized, ref
    datasources.py:250-311). The query joins a dimension the engine has
    just ensure()'d with a registered fact — so the result proves the
    SQL surface sees live operator state, not a load-time snapshot."""
    from pygrametl_spark.engine import Engine

    cat = load_catalog(spark, sf_dir)
    eng = Engine(spark, _engine_sql_wh())
    dim = Dimension(
        "nation_d", "n_nationkey", ["n_name", "n_regionkey"],
        lookupatts=["n_name"], df=cat.nation,
    )
    fact = FactTable(
        "supplier_f", ["s_suppkey", "s_nationkey"], ["s_acctbal"],
        df=cat.supplier.select("s_suppkey", "s_nationkey", "s_acctbal"),
    )
    eng.register(dim)
    eng.register(fact, dependson=[dim])
    return eng.sql("""
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               ROUND(CAST(SUM(CAST(ROUND(s_acctbal, 6) AS DECIMAL(27,6)))
                          AS DOUBLE), 2) AS total_acctbal
        FROM supplier_f JOIN nation_d ON s_nationkey = n_nationkey
        GROUP BY n_name
    """)


ORACLE_ENGINE_SQL = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(CAST(ROUND(s_acctbal, 6) AS DECIMAL(27,6)))
                  AS DOUBLE), 2) AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

from pygrametl_spark.queries_data import DATA_ORACLES, DATA_QUERIES  # noqa: E402
from pygrametl_spark.queries_extra import EXTRA_ORACLES, EXTRA_QUERIES  # noqa: E402
from pygrametl_spark.queries_merged import build_merged  # noqa: E402
from pygrametl_spark.queries_more import MORE_ORACLES, MORE_QUERIES  # noqa: E402

# Every individually-implemented query/oracle pair (74). These remain the
# unit of implementation and of local parity debugging; the driver-facing
# registry below folds related ones into tag-union queries (see
# queries_merged.py) so the whole surface fits the driver's ~50-query
# correctness budget with every operator still oracle-verified.
ALL_QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "project_rename": q_project_rename,
    "filtering_source": q_filtering_source,
    "mapping_source": q_mapping_source,
    "valuemapping_step": q_valuemapping_step,
    "conditional_step": q_conditional_step,
    "hash_joining_source": q_hash_joining_source,
    "merge_joining_source": q_merge_joining_source,
    "dim_lookup": q_dim_lookup,
    "dim_getbyvals": q_dim_getbyvals,
    "dim_ensure": q_dim_ensure,
    "dim_update": q_dim_update,
    "scd_typeone": q_scd_typeone,
    "scd2_build": q_scd2_build,
    "scd_lookupasof": q_scd_lookupasof,
    "asof_generic": q_asof_generic,
    "range_join_events": q_range_join_events,
    "scd_closecurrent": q_scd_closecurrent,
    "snowflake_lookuprow": q_snowflake_lookuprow,
    "snowflake_ensure": q_snowflake_ensure,
    "fact_ensure": q_fact_ensure,
    "fact_lookup": q_fact_lookup,
    "accumulating_snapshot": q_accumulating_snapshot,
    "crosstab": q_crosstab,
    "datespan": q_datespan,
    "newest_version": q_newest_version,
    "topk": q_topk,
    "topk_pergroup": q_topk_pergroup,
    "union_source": q_union_source,
    "sql_transforming": q_sql_transforming,
    "engine_sql": q_engine_sql,
    **DATA_QUERIES,
    **EXTRA_QUERIES,
    **MORE_QUERIES,
}

ALL_ORACLES = {
    "q01_pricing_summary": ORACLE_Q01,
    "project_rename": ORACLE_PROJECT,
    "filtering_source": ORACLE_FILTER,
    "mapping_source": ORACLE_MAPPING,
    "valuemapping_step": ORACLE_VALUEMAPPING,
    "conditional_step": ORACLE_CONDITIONAL,
    "hash_joining_source": ORACLE_HASH_JOIN,
    "merge_joining_source": ORACLE_MERGE_JOIN,
    "dim_lookup": ORACLE_DIM_LOOKUP,
    "dim_getbyvals": ORACLE_GETBYVALS,
    "dim_ensure": ORACLE_DIM_ENSURE,
    "dim_update": ORACLE_DIM_UPDATE,
    "scd_typeone": ORACLE_SCD_TYPEONE,
    "scd2_build": ORACLE_SCD2_BUILD,
    "scd_lookupasof": ORACLE_SCD_ASOF,
    "asof_generic": ORACLE_ASOF_GENERIC,
    "range_join_events": ORACLE_RANGE_JOIN,
    "scd_closecurrent": ORACLE_SCD_CLOSE,
    "snowflake_lookuprow": ORACLE_SNOWFLAKE_LOOKUP,
    "snowflake_ensure": ORACLE_SNOWFLAKE_ENSURE,
    "fact_ensure": ORACLE_FACT_ENSURE,
    "fact_lookup": ORACLE_FACT_LOOKUP,
    "accumulating_snapshot": ORACLE_ACC_SNAPSHOT,
    "crosstab": ORACLE_CROSSTAB,
    "datespan": ORACLE_DATESPAN,
    "newest_version": ORACLE_NEWEST,
    "topk": ORACLE_TOPK,
    "topk_pergroup": ORACLE_TOPK_PERGROUP,
    "union_source": ORACLE_UNION,
    "sql_transforming": ORACLE_Q5,
    "engine_sql": ORACLE_ENGINE_SQL,
    **DATA_ORACLES,
    **EXTRA_ORACLES,
    **MORE_ORACLES,
}

# Shared-intermediate merged builders (optimization r9): merges whose
# parts duplicate heavy subtrees compute them once; same tags, same
# rows, same oracle (queries_merged._shared_union_query).
from pygrametl_spark.queries_data import shared_sampling_suite  # noqa: E402
from pygrametl_spark.queries_more import shared_scd2_type1_overrides  # noqa: E402


def shared_scd2_build_close(spark, sf_dir):
    """Shared builder for scd2_build_close: the build and close parts
    derive from the IDENTICAL SCD2-from-history dimension — built
    generically, each replayed the events window chain + dense-key
    assignment. Build it once, pin it, and construct the datechange
    part (its own version-on-datechange base) concurrently."""
    from concurrent.futures import ThreadPoolExecutor

    from pygrametl_spark.queries_extra import q_scd2_datechange

    def _build_close(spark, sf_dir):
        events = load_catalog(spark, sf_dir).events
        hist = scd2_from_history(
            events, ["user_id"], ["event_type"], "ts", key="id", tiebreak=["event_id"]
        ).localCheckpoint(eager=False)
        return (
            q_scd2_build(spark, sf_dir, dim_df=hist),
            q_scd_closecurrent(spark, sf_dir, dim_df=hist),
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_bc = pool.submit(_build_close, spark, sf_dir)
        f_dc = pool.submit(q_scd2_datechange, spark, sf_dir)
        build, close = f_bc.result()
        datechange = f_dc.result()
    return [("build", build), ("close", close), ("datechange", datechange)]


_SHARED_BUILDERS = {
    "scd2_type1_overrides": shared_scd2_type1_overrides,
    "sampling_suite": shared_sampling_suite,
    "scd2_build_close": shared_scd2_build_close,
}

# Fully-fused merges (optimization r9): parts that are in-row score
# variants over ONE pair relation collapse into a single chain emitting
# every part's rows (queries_merged.build_merged full_builders).
from pygrametl_spark.queries_data import merged_dedup_ngram_jaccard  # noqa: E402

_FULL_BUILDERS = {
    "dedup_ngram_jaccard": merged_dedup_ngram_jaccard,
}

_MERGED_Q, _MERGED_O = build_merged(
    ALL_QUERIES, ALL_ORACLES, _SHARED_BUILDERS, _FULL_BUILDERS
)

# Driver-facing registry: <=50 entries, highest-value first, every
# SURVEY §2 operator gated by exactly one entry (directly or as a
# tag-union part — see queries_merged.MERGES for the part mapping).
_REGISTRY_ORDER = [
    # flagship + capstones
    "q01_pricing_summary", "etl_star_load", "corpus_curation", "sql_transforming",
    # sources / projections / steps / helpers
    "project_map_filter", "joining_sources", "sources_roundtrip", "pep249_source",
    "pep249_sink_roundtrip", "steps_suite", "helpers_suite",
    # dimensions
    "dim_lookup", "dim_getby", "dim_ensure", "dim_update", "dim_rowexpander",
    "snowflake_lookup_ensure", "snowflake_scdensure",
    # slowly changing dimensions
    "scd_typeone", "scd2_build_close", "scd2_type1_overrides",
    "scd2_incremental_merge", "scd_lookupasof", "asof_bounds_fullrow",
    "newest_version",
    # facts
    "fact_suite", "accumulating_snapshot",
    # aggregation / ordering
    "crosstab", "rollup_cube_agg", "advanced_aggs", "topk",
    # text analysis / corpus hygiene
    "text_analysis", "token_count", "curation_guard",
    # dedup
    "dedup_exact", "minhash_signatures", "dedup_minhash_lsh", "neardup_clusters",
    "simhash", "dedup_ngram_jaccard", "embedding_neardup",
    # similarity search
    "ann_topk", "ann_lsh_neardup", "ann_ivf_topk", "ann_ivf_index",
    # sampling / multimodal
    "sampling_suite", "multimodal_pipeline",
    # streaming
    "events_stream_windows", "events_sessionize", "scd2_streaming_maintain",
]

_COMBINED_Q = {**ALL_QUERIES, **_MERGED_Q}
_COMBINED_O = {**ALL_ORACLES, **_MERGED_O}

QUERIES = {name: _COMBINED_Q[name] for name in _REGISTRY_ORDER}
ORACLES = {name: _COMBINED_O[name] for name in _REGISTRY_ORDER}
