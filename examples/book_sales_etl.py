"""The pygrametl beginner-guide ETL (book sales), ported 1:1 to this engine.

The reference's quickstart (ref docs/quickstart/beginner.rst:160-320)
loads a star schema — book/time/location dimensions + a sale fact —
from a sales database and a region CSV, row by row. This is the same
flow through the drop-in modules, set-at-a-time:

- sources:   SQLSource over the sales DB (here: PEP249Source on DuckDB),
             CSVSource for region.csv
- transform: split the date into day/month/year (column expressions
             replace the per-row ``split_date`` function)
- load:      CachedDimension.ensure decorates the batch with surrogate
             keys (one anti-join + dense-key job instead of a lookup
             per row); FactTable.insert appends the keyed facts
- finalize:  Engine.endload(target=PEP249Target(...)) writes the
             warehouse into a real RDBMS in FK order — the reference's
             commit-time flush

Run: python examples/book_sales_etl.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pygrametl_spark import ConnectionWrapper, get_spark
from pygrametl_spark.datasources import CSVSource, PEP249Source
from pygrametl_spark.engine import Engine
from pygrametl_spark.sinks import PEP249Target
from pygrametl_spark.tables import CachedDimension, FactTable

SALES = [
    ("Nineteen Eighty-Four", "Novel", "Aalborg", "2025-09-01", 3),
    ("Nineteen Eighty-Four", "Novel", "Odense", "2025-09-01", 2),
    ("Calvin and Hobbes", "Comic", "Aalborg", "2025-09-02", 5),
    ("Calvin and Hobbes", "Comic", "Aarhus", "2025-09-02", 1),
    ("The Silver Spoon", "Cookbook", "Odense", "2025-09-03", 4),
]

REGION_CSV = "city,region\nAalborg,North Denmark\nAarhus,Central Denmark\nOdense,Southern Denmark\n"


def build_inputs(workdir: str):
    """Create the quickstart's two inputs: a sales DB and region.csv."""
    import sqlite3

    db = os.path.join(workdir, "sale.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE sale (book TEXT, genre TEXT, store TEXT, date TEXT, sale INT)")
    con.executemany("INSERT INTO sale VALUES (?, ?, ?, ?, ?)", SALES)
    con.commit()
    con.close()

    csv_path = os.path.join(workdir, "region.csv")
    with open(csv_path, "w", encoding="utf-8") as fh:
        fh.write(REGION_CSV)
    return db, csv_path


def run_etl(spark, db: str, csv_path: str, warehouse_connect):
    # -- extract ----------------------------------------------------------
    # ref beginner.rst:172-176: SQLSource renames store -> city positionally
    name_mapping = ("book", "genre", "city", "date", "sale")
    sale_source = PEP249Source(
        spark,
        lambda: __import__("sqlite3").connect(db),
        "SELECT book, genre, store, date, sale FROM sale",
        names=name_mapping,
    )
    region_source = CSVSource(spark, csv_path, delimiter=",")

    # -- transform --------------------------------------------------------
    # ref beginner.rst:240-250 split_date: column expressions, not per-row
    sales = (
        sale_source.withColumn("date", F.to_date("date"))
        .withColumn("day", F.dayofmonth("date").cast("int"))
        .withColumn("month", F.month("date").cast("int"))
        .withColumn("year", F.year("date").cast("int"))
    )

    # -- dimensions / fact (ref beginner.rst:206-231) ---------------------
    book_dimension = CachedDimension(
        name="book", key="bookid", attributes=["book", "genre"],
        df=spark.createDataFrame([], "bookid long, book string, genre string"),
    )
    time_dimension = CachedDimension(
        name="time", key="timeid", attributes=["day", "month", "year"],
        df=spark.createDataFrame([], "timeid long, day int, month int, year int"),
    )
    location_dimension = CachedDimension(
        name="location", key="locationid", attributes=["city", "region"],
        lookupatts=["city"],
        df=spark.createDataFrame([], "locationid long, city string, region string"),
    )
    fact_table = FactTable(
        name="sale", keyrefs=["bookid", "locationid", "timeid"], measures=["sale"],
    )

    # -- load -------------------------------------------------------------
    # ref beginner.rst:289-307: the location dimension is filled from the
    # CSV first (so sales rows only look it up), the other two use ensure
    location_dimension.ensure(region_source)
    keyed = book_dimension.ensure(sales)
    keyed = time_dimension.ensure(keyed)
    keyed = location_dimension.lookup(keyed, broadcast=True)
    fact_table.insert(keyed)

    # -- finalize (ref: conn.commit() -> here Engine.endload) -------------
    eng = Engine(spark, tempfile.mkdtemp(prefix="book_wh_"))
    eng.register(book_dimension)
    eng.register(time_dimension)
    eng.register(location_dimension)
    eng.register(fact_table, dependson=[book_dimension, time_dimension, location_dimension])
    eng.endload(target=PEP249Target(warehouse_connect))
    return fact_table


def main():
    import duckdb

    spark = get_spark("book-sales-etl")
    workdir = tempfile.mkdtemp(prefix="book_src_")
    db, csv_path = build_inputs(workdir)

    wh_path = os.path.join(workdir, "warehouse.duckdb")
    run_etl(spark, db, csv_path, lambda: duckdb.connect(wh_path))

    # Read the finished warehouse back through ConnectionWrapper and show
    # sales per region — the quickstart's final sanity check.
    cw = ConnectionWrapper(duckdb.connect(wh_path), paramstyle="qmark")
    cw.execute(
        """
        SELECT l.region, SUM(s.sale) AS total
        FROM sale s JOIN location l ON s.locationid = l.locationid
        GROUP BY l.region ORDER BY l.region
        """
    )
    for row in cw.fetchall():
        print(f"{row['region']}: {row['total']}")
    cw.close()


if __name__ == "__main__":
    main()
