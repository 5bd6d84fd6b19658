"""Engine facade: table registry + FK-ordered finalization (endload).

Reference parity: every pygrametl table registers itself in
``pygrametl._alltables`` and ``ConnectionWrapper.commit`` runs
``endload()`` to flush them (reference ``pygrametl/__init__.py:442-448,
971-974``); bulk tables declare ``dependson`` so referenced dimensions
flush before referencing facts (``tables.py:2560-2563, 2651-2652``).

Spark restatement: "flush" is a Parquet write; the Engine topologically
orders the writes over the declared dependencies, so referential
integrity of the persisted warehouse holds without any row-level
machinery. Writes are the only actions — everything before is one lazy
plan per table.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

__all__ = ["Engine"]


@dataclass
class _Registration:
    table: object  # Dimension | FactTable
    path: str
    dependson: list = field(default_factory=list)
    partition_cols: list = field(default_factory=list)
    bucket_cols: list = field(default_factory=list)
    n_buckets: int = 0
    sort_cols: list = field(default_factory=list)
    n_ranges: int = 0


class Engine:
    """One engine = one SparkSession + one warehouse directory."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self._tables: dict[str, _Registration] = {}

    def register(self, table, *, dependson=(), path: str | None = None,
                 partition_cols=(), bucket_cols=(), n_buckets: int = 0,
                 sort_cols=(), n_ranges: int = 0) -> object:
        """Register a Dimension/FactTable for endload. ``dependson`` names
        tables that must persist first (FK targets).

        ``bucket_cols``/``n_buckets`` hash-bucket the persisted layout on
        the join key (surrogate key on the dimension, the matching keyref
        on facts): tables bucketed the same way join with NO exchange on
        either side — for a warehouse whose facts are joined to the same
        dimensions every load, the shuffle is paid once at write time
        instead of per query. Bucketed tables persist via
        ``saveAsTable`` (bucket metadata lives in the session catalog);
        read them back with ``spark.table(name)``.

        ``sort_cols`` range-partitions (``n_ranges`` output files via
        ``repartitionByRange``, default: session shuffle partitions) and
        sorts within each file on those columns before writing — the
        data-skipping layout: every file covers a disjoint ``sort_cols``
        interval, so parquet min/max statistics let selective scans skip
        whole files/row groups. For a fact table queried by time or key
        range, this is the read-amplification lever at 100 TB (and is
        the plain-parquet counterpart of table-format Z-ordering).
        Mutually exclusive with ``bucket_cols``."""
        if sort_cols and bucket_cols:
            raise ValueError("sort_cols and bucket_cols are mutually exclusive")
        name = table.name
        self._tables[name] = _Registration(
            table=table,
            path=path or os.path.join(self.warehouse_dir, name),
            dependson=[d.name if hasattr(d, "name") else d for d in dependson],
            partition_cols=list(partition_cols),
            bucket_cols=list(bucket_cols),
            n_buckets=n_buckets,
            sort_cols=list(sort_cols),
            n_ranges=n_ranges,
        )
        return table

    def _order(self) -> list[str]:
        """Topological order over dependson (referenced before referencing);
        ties resolve in registration order for determinism."""
        seen: dict[str, int] = {}
        order: list[str] = []

        def visit(name: str, stack: tuple = ()):
            if name in stack:
                raise ValueError(f"dependson cycle involving {name}")
            if seen.get(name):
                return
            for dep in self._tables[name].dependson:
                if dep in self._tables:
                    visit(dep, (*stack, name))
            seen[name] = 1
            order.append(name)

        for name in self._tables:
            visit(name)
        return order

    def endload(self, mode: str = "overwrite", *, target=None,
                parquet: bool = True) -> list[str]:
        """Persist every registered table, FK dependencies first
        (the reference's global endload + dependson ordering).

        ``target`` (a :class:`pygrametl_spark.sinks.PEP249Target`)
        additionally loads each table into an external RDBMS in the
        same FK order — the reference's commit-time database flush
        (ref ``__init__.py:442-448``, ``tables.py:2560-2563``).
        ``parquet=False`` skips the warehouse-directory write when the
        external database is the only destination."""
        written = []
        for name in self._order():
            reg = self._tables[name]
            if parquet:
                df = reg.table.df
                if reg.sort_cols:
                    # range layout: one disjoint sort_cols interval per
                    # output file + in-file sort => parquet min/max stats
                    # skip files/row groups on selective scans
                    n = reg.n_ranges or int(
                        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
                    )
                    df = df.repartitionByRange(n, *reg.sort_cols) \
                           .sortWithinPartitions(*reg.sort_cols)
                w = df.write.mode(mode)
                if reg.partition_cols:
                    w = w.partitionBy(*reg.partition_cols)
                if reg.bucket_cols:
                    # sortBy keeps bucket files sort-merge-ready: the
                    # co-located join needs no sort either
                    w = (
                        w.format("parquet")
                        .option("path", reg.path)
                        .bucketBy(reg.n_buckets, *reg.bucket_cols)
                        .sortBy(*reg.bucket_cols)
                    )
                    w.saveAsTable(name)
                else:
                    w.parquet(reg.path)
            if target is not None:
                target.load(reg.table.df, name)
            written.append(name)
        return written

    def table(self, name: str):
        return self._tables[name].table

    def sql(self, query: str):
        """Run ANSI SQL over the registered warehouse: every registered
        table's CURRENT DataFrame is exposed as a temp view named after
        its registration, then the query executes via ``spark.sql``.

        This is the reference's ``SQLTransformingSource`` germ (ref
        ``datasources.py:250-311`` — rows staged into a temp table, a
        user query transforms them) generalized to the whole warehouse:
        instead of one staged source, the full registry is queryable,
        and the result is a lazy DataFrame whose plan Catalyst optimizes
        END-TO-END through the view boundary (filters push through into
        each table's own plan — views are not materialization barriers).
        Views are created lazily per call so the query always sees each
        table's latest ensure/scdensure state, never a stale snapshot.
        """
        for name, reg in self._tables.items():
            reg.table.df.createOrReplaceTempView(name)
        return self.spark.sql(query)
