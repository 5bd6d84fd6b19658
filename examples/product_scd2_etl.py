"""The pygrametl SCD2 products example, ported 1:1 to this engine.

The reference's dimensions guide (ref docs/examples/dimensions.rst:391-470)
tracks product price history in a type-2 slowly changing dimension: each
price change closes the previous version (validto = the new version's
validfrom) and inserts a new one with an incremented version counter.
There, every product row passes through ``scdensure`` one dict at a
time against a live PostgreSQL connection; here the same history loads
as ONE batch through the set-at-a-time merge, and the warehouse is
flushed to a real RDBMS (DuckDB) at the end:

- the product rows become a DataFrame (the reference's list-of-dicts),
- ``SlowlyChangingDimension.scdensure`` applies the whole batch in one
  windowed plan — per-member event ordering, change suppression,
  version counters, and validity stamping happen set-at-a-time,
- ``Engine.endload(target=PEP249Target(...))`` is the reference's
  ``conn.commit()``.

Run: python examples/product_scd2_etl.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pygrametl_spark.engine import Engine
from pygrametl_spark.session import get_spark
from pygrametl_spark.sinks import PEP249Target
from pygrametl_spark.tables import SlowlyChangingDimension

# ref dimensions.rst:399-418 — the same products, price changes and all
PRODUCTS = [
    ("Calvin and Hobbes", "Comic", 20, "1990-10-01"),
    ("Calvin and Hobbes", "Comic", 10, "1990-12-10"),
    ("Calvin and Hobbes", "Comic", 20, "1991-02-01"),
    ("Cake and Me", "Cookbook", 15, "1990-05-01"),
    ("French Cooking", "Cookbook", 50, "1990-05-01"),
    ("Sushi", "Cookbook", 30, "1990-05-01"),
    ("Nineteen Eighty-Four", "Novel", 15, "1990-05-01"),
    ("The Lord of the Rings", "Novel", 60, "1990-05-01"),
]


def run_etl(spark, warehouse_connect):
    batch = spark.createDataFrame(
        PRODUCTS, "name string, category string, price int, date string"
    ).withColumn("date", F.col("date").cast("timestamp"))

    empty = spark.createDataFrame(
        [],
        "productid long, name string, category string, price int, "
        "validfrom timestamp, validto timestamp, version long",
    )
    # ref dimensions.rst:455-466 — same table shape; fromfinder=
    # datereader('date') becomes srcdateatt='date' (the batch column IS
    # the parsed date)
    product_dimension = SlowlyChangingDimension(
        name="product",
        key="productid",
        attributes=["name", "category", "price", "validfrom", "validto", "version"],
        lookupatts=["name"],
        fromatt="validfrom",
        toatt="validto",
        versionatt="version",
        srcdateatt="date",
        df=empty,
    )

    # the reference's per-row loop (dimensions.rst:468-470) is one call
    product_dimension.scdensure(batch)

    eng = Engine(spark, tempfile.mkdtemp(prefix="product_wh_"))
    eng.register(product_dimension)
    eng.endload(target=PEP249Target(warehouse_connect))
    return product_dimension


def main():
    import duckdb

    spark = get_spark("product-scd2-etl")
    wh_path = os.path.join(tempfile.mkdtemp(prefix="product_src_"), "wh.duckdb")
    run_etl(spark, lambda: duckdb.connect(wh_path))

    con = duckdb.connect(wh_path)
    print("price history of 'Calvin and Hobbes':")
    for row in con.execute(
        "SELECT version, price, validfrom, validto FROM product "
        "WHERE name = 'Calvin and Hobbes' ORDER BY version"
    ).fetchall():
        print(f"  v{row[0]}: {row[1]} ({row[2]} -> {row[3]})")
    con.close()


if __name__ == "__main__":
    main()
