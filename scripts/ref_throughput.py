"""Measured single-node throughput: reference pygrametl vs this engine.

The brief's perf bar is "matches-or-beats the reference's single-node
throughput at the same data scale". The reference publishes no numbers
(BASELINE.md), so this script MEASURES it: it imports the reference
package read-only from /root/reference (runtime import for baseline
measurement only — no reference code is copied into the engine) and
runs the same two workloads both ways on the same parquet inputs:

1. ``star``  — the star-schema load every pygrametl tutorial ships
   (docs/quickstart.rst shape): ensure a product dimension + a date
   dimension, insert one fact row per lineitem.
   - reference: CachedDimension.ensure (unlimited cache) +
     BatchFactTable.insert (batchsize 10000) into an in-memory SQLite
     DB via ConnectionWrapper — its fastest published configuration
     (BASELINE.md knob table). The lineitem×part join is done FOR the
     reference beforehand (duckdb) and rows are pre-materialized as
     dicts, so the timed loop charges the reference only for
     dim-ensure + fact-insert work.
   - engine: the same load Spark-first — dense surrogate keys, one
     broadcast lookup join, fact written to parquet. The engine IS
     charged for the lineitem×part join and for writing the fact table
     to storage (the reference writes to :memory:).

2. ``scd2`` — type-2 history build over the events table: one
   scdensure per event (reference, row-at-a-time, unlimited cache,
   time-ordered stream) vs scd2_from_history (engine, one
   set-at-a-time window plan) with the fact written to parquet.

Usage: python scripts/ref_throughput.py [sf_dir] [star|scd2|all] [K]
K (default 1) replicates the lineitem input K times on BOTH sides of
the ``star`` workload — identical multisets, so the per-row work shape
is unchanged; it extends the throughput curve past the largest test SF
(the reference's rows/sec stays flat with volume while the engine's
grows until its fixed job overhead is amortized).
Prints one JSON line per (workload, side) with rows/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sqlite3
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, "/root/reference")  # read-only import of the reference package


def ref_star(sf_dir: str, k: int = 1) -> dict:
    import pygrametl as ref
    from pygrametl.tables import BatchFactTable, CachedDimension

    rows = duckdb.sql(
        f"""
        SELECT p_name AS name, p_brand AS brand,
               CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS fulldate,
               CAST(month(l_shipdate) AS INT) AS month,
               l_quantity AS qty, l_extendedprice AS price
        FROM '{sf_dir}/lineitem.parquet' JOIN '{sf_dir}/part.parquet'
          ON l_partkey = p_partkey
        """
    ).fetchall()
    cols = ("name", "brand", "fulldate", "month", "qty", "price")
    dicts = [dict(zip(cols, r)) for r in rows for _ in range(k)]

    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE prod_dim (pid INTEGER PRIMARY KEY, name TEXT, brand TEXT)")
    conn.execute("CREATE TABLE date_dim (dateid INTEGER PRIMARY KEY, fulldate INT, month INT)")
    conn.execute(
        "CREATE TABLE sales_fact (pid INT, dateid INT, qty REAL, price REAL)"
    )
    wrapper = ref.ConnectionWrapper(conn)

    t0 = time.perf_counter()
    proddim = CachedDimension(
        "prod_dim", "pid", ["name", "brand"], lookupatts=["name", "brand"], size=0
    )
    datedim = CachedDimension(
        "date_dim", "dateid", ["fulldate", "month"], lookupatts=["fulldate"], size=0
    )
    fact = BatchFactTable(
        "sales_fact", keyrefs=["pid", "dateid"], measures=["qty", "price"],
        batchsize=10000,
    )
    for row in dicts:
        row["pid"] = proddim.ensure(row)
        row["dateid"] = datedim.ensure(row)
        fact.insert(row)
    wrapper.commit()
    sec = time.perf_counter() - t0

    n_fact = conn.execute("SELECT COUNT(*) FROM sales_fact").fetchone()[0]
    n_dim = conn.execute("SELECT COUNT(*) FROM prod_dim").fetchone()[0]
    wrapper.close()
    ref._defaulttargetconnection = None
    assert n_fact == len(dicts)
    return {"workload": "star", "side": "reference", "rows": n_fact,
            "dim_rows": n_dim, "k": k, "sec": round(sec, 3),
            "rows_per_sec": round(n_fact / sec)}


def ref_scd2(sf_dir: str) -> dict:
    import pygrametl as ref
    from pygrametl.tables import SlowlyChangingDimension

    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts FROM '{sf_dir}/events.parquet' "
        f"ORDER BY ts, event_id"
    ).fetchall()
    dicts = [{"user_id": r[0], "event_type": r[1], "ts": r[2]} for r in rows]

    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE user_scd (id INTEGER PRIMARY KEY, user_id INT, "
        "event_type TEXT, version INT, fromdate TIMESTAMP, todate TIMESTAMP)"
    )
    wrapper = ref.ConnectionWrapper(conn)

    t0 = time.perf_counter()
    scd = SlowlyChangingDimension(
        "user_scd", "id",
        ["user_id", "event_type", "version", "fromdate", "todate"],
        ["user_id"], versionatt="version", fromatt="fromdate", toatt="todate",
        srcdateatt="ts", srcdateparser=lambda v: v, cachesize=-1,
    )
    for row in dicts:
        scd.scdensure(row)
    wrapper.commit()
    sec = time.perf_counter() - t0

    n_ver = conn.execute("SELECT COUNT(*) FROM user_scd").fetchone()[0]
    wrapper.close()
    ref._defaulttargetconnection = None
    return {"workload": "scd2", "side": "reference", "rows": len(dicts),
            "version_rows": n_ver, "sec": round(sec, 3),
            "rows_per_sec": round(len(dicts) / sec)}


def _spark_timed(fn, runs: int = 3):
    fn()  # warm-up: codegen/JIT, parquet footers
    times = []
    out = None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], out


def engine_star(spark, sf_dir: str, k: int = 1) -> dict:
    from pyspark.sql import functions as F

    from pygrametl_spark.operators.dimension import Dimension
    from pygrametl_spark.plans.keys import assign_dense_keys

    out_dir = tempfile.mkdtemp(prefix="ref_tp_star_")

    def run():
        part = spark.read.parquet(f"{sf_dir}/part.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        if k > 1:
            li = li.crossJoin(spark.range(k).select(F.lit(1).alias("__rep"))).drop("__rep")
        batch = li.join(part, li.l_partkey == part.p_partkey).select(
            F.col("p_name").alias("name"), F.col("p_brand").alias("brand"),
            F.date_format("l_shipdate", "yyyyMMdd").cast("int").alias("dateid"),
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
        )
        prod = batch.select("name", "brand").distinct()
        dim = Dimension(
            "prod_dim", "pid", ["name", "brand"], lookupatts=["name", "brand"],
            df=assign_dense_keys(prod, ["name", "brand"], "pid", 0),
        )
        fact = dim.lookup(batch, broadcast=True).select("pid", "dateid", "qty", "price")
        fact.write.mode("overwrite").parquet(f"{out_dir}/sales_fact")
        dim.df.write.mode("overwrite").parquet(f"{out_dir}/prod_dim")
        return spark.read.parquet(f"{out_dir}/sales_fact").count()

    sec, n = _spark_timed(run)
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"workload": "star", "side": "engine", "rows": n, "k": k,
            "sec": round(sec, 3), "rows_per_sec": round(n / sec)}


def engine_scd2(spark, sf_dir: str) -> dict:
    from pygrametl_spark.operators.scd import scd2_from_history

    out_dir = tempfile.mkdtemp(prefix="ref_tp_scd_")

    def run():
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_in = events.count()
        # version_on_datechange replicates the reference's srcdateatt
        # semantics exactly (a new date alone opens a version), so both
        # sides build the same number of version rows
        dim = scd2_from_history(
            events, ["user_id"], ["event_type"], "ts", key="id",
            tiebreak=["event_id"], version_on_datechange=True,
        )
        dim.write.mode("overwrite").parquet(f"{out_dir}/user_scd")
        return n_in

    sec, n = _spark_timed(run)
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"workload": "scd2", "side": "engine", "rows": n,
            "sec": round(sec, 3), "rows_per_sec": round(n / sec)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    results = []
    if which in ("star", "all"):
        results.append(ref_star(sf_dir, k))
        print(json.dumps(results[-1]), flush=True)
    if which in ("scd2", "all"):
        results.append(ref_scd2(sf_dir))
        print(json.dumps(results[-1]), flush=True)

    from pygrametl_spark.session import get_spark

    spark = get_spark("ref-throughput")
    spark.range(1).count()
    if which in ("star", "all"):
        results.append(engine_star(spark, sf_dir, k))
        print(json.dumps(results[-1]), flush=True)
    if which in ("scd2", "all"):
        results.append(engine_scd2(spark, sf_dir))
        print(json.dumps(results[-1]), flush=True)

    by = {(r["workload"], r["side"]): r for r in results}
    for wl in ("star", "scd2"):
        if (wl, "reference") in by and (wl, "engine") in by:
            speedup = by[(wl, "engine")]["rows_per_sec"] / by[(wl, "reference")]["rows_per_sec"]
            print(json.dumps({"workload": wl, "engine_vs_reference_speedup":
                              round(speedup, 2)}), flush=True)


if __name__ == "__main__":
    main()
