"""Fact table operators: insert / lookup / ensure / accumulating snapshot.

Reference: ``pygrametl/tables.py`` FactTable (:2136-2271), BatchFactTable
(:2278-2356), BulkFactTable (:2686-2774), AccumulatingSnapshotFactTable
(:2359-2505). Batch/Bulk collapse into the base class: Spark writes are
columnar and batched by construction, so the buffering/temp-file
machinery has no counterpart — ``df.write.parquet`` *is* the bulk path.

Scale notes: fact tables are the 100 TB side. Nothing here shuffles the
fact relation except ``ensure``'s anti-join on the composite key (which
is the semantics); appends are shuffle-free writes, ideally partitioned
by a date keyref (``partition_cols``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygrametl_spark.operators.dimension import apply_namemapping

__all__ = [
    "FactTable", "BatchFactTable", "BulkFactTable",
    "AccumulatingSnapshotFactTable", "SubprocessFactTable",
    "DecoupledFactTable",
]


def DecoupledFactTable(facttable, **_ignored):
    """Reference ``DecoupledFactTable`` (tables.py, §2.10) proxies a fact
    table to a worker process. Spark's lazy distributed execution IS the
    decoupling, so the facade returns the wrapped table unchanged."""
    return facttable


class FactTable:
    """Fact table = composite PK of dimension FKs (``keyrefs``) + measures
    (ref tables.py:2136-2155)."""

    def __init__(
        self,
        name: str,
        keyrefs: list[str],
        measures: list[str] | None = None,
        *,
        df: DataFrame | None = None,
    ):
        self.name = name
        self.keyrefs = list(keyrefs)
        self.measures = list(measures or [])
        self.all = [*self.keyrefs, *self.measures]
        self._df = df.select(*self.all) if df is not None else None

    @property
    def df(self) -> DataFrame:
        if self._df is None:
            raise ValueError(f"fact table {self.name} has no contents yet")
        return self._df

    def load(self, df: DataFrame) -> "FactTable":
        self._df = df.select(*self.all)
        return self

    # Pin mutated state (see Dimension._set_state): iterative ensure
    # chains otherwise replay the full merge lineage on every action.
    materialize_updates = True
    _persistence = None

    def durable(self, path: str, protocol: str = "rename") -> "FactTable":
        """Write-through state (production persistence — operators/state.py).
        ``protocol="pointer"`` for object stores without atomic rename."""
        from pygrametl_spark.operators.state import StatePersistence

        self._persistence = StatePersistence(path, protocol=protocol)
        if self._df is not None:
            self._df = self._persistence.write(self._df)
        return self

    def restore(self, spark, path: str | None = None) -> "FactTable":
        """Reload the latest durably-persisted state in a fresh session."""
        from pygrametl_spark.operators.state import StatePersistence

        if path is not None or self._persistence is None:
            if path is None:
                raise ValueError(f"fact table {self.name} has no persistence path")
            self._persistence = StatePersistence(path)
        self._df = self._persistence.read_latest(spark).select(*self.all)
        return self

    def _set_state(self, df: DataFrame) -> None:
        if self._persistence is not None:
            self._df = self._persistence.write(df)
        else:
            self._df = df.localCheckpoint(eager=False) if self.materialize_updates else df

    def insert(self, rows: DataFrame, namemapping=None) -> None:
        """Append keyrefs+measures (ref insert tables.py:2184-2197). Extra
        source columns are projected away, mirroring ``pygrametl.project``."""
        b = apply_namemapping(rows, namemapping).select(*self.all)
        self._set_state(b if self._df is None else self.df.unionByName(b))

    def lookup(self, keys: DataFrame, namemapping=None) -> DataFrame:
        """Composite-key point join: keyrefs -> measures (ref tables.py:2214-2230)."""
        b = apply_namemapping(keys, namemapping).select(*self.keyrefs).dropDuplicates()
        return b.join(self.df, on=self.keyrefs, how="left")

    def ensure(self, rows: DataFrame, namemapping=None, *, compare: bool = False) -> None:
        """Insert facts whose keyrefs are unknown; with ``compare=True``
        raise if an existing fact has different measures
        (ref ensure tables.py:2238-2271).
        """
        b = apply_namemapping(rows, namemapping).select(*self.all)
        if compare and self.measures:
            existing = self.df
            clash = b.alias("n").join(existing.alias("o"), on=self.keyrefs, how="inner").filter(
                " OR ".join(
                    f"NOT (n.{m} <=> o.{m})" for m in self.measures
                )
            )
            n_bad = clash.count()
            if n_bad:
                raise ValueError(
                    f"ensure: {n_bad} row(s) match keyrefs of {self.name} with different measures"
                )
        new = b.join(self.df.select(*self.keyrefs), on=self.keyrefs, how="left_anti")
        self._set_state(self.df.unionByName(new.dropDuplicates(self.keyrefs)))

    def write(
        self,
        path: str,
        mode: str = "append",
        partition_cols: list[str] | None = None,
        *,
        dynamic_overwrite: bool = False,
    ) -> None:
        """Persist the fact table.

        ``dynamic_overwrite=True`` (requires ``partition_cols``) makes
        the write an idempotent incremental load: only the partitions
        present in the current DataFrame are replaced, every other
        partition on disk is untouched. This is the daily-ingest
        pattern at scale — re-running one day's load replaces exactly
        that day's directory instead of rewriting (or duplicating into)
        a 100 TB table.
        """
        if dynamic_overwrite:
            if not partition_cols:
                raise ValueError("dynamic_overwrite requires partition_cols")
            w = self.df.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            )
        else:
            w = self.df.write.mode(mode)
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(path)


# Spark writes are inherently batched/bulk; aliases for API parity.
BatchFactTable = FactTable
BulkFactTable = FactTable


class AccumulatingSnapshotFactTable(FactTable):
    """Upsertable facts (ref tables.py:2359-2505): immutable ``keyrefs``,
    updatable ``otherrefs`` + ``measures`` that arrive over time.

    ``ensure`` merges a batch: for each incoming row matching an existing
    fact, non-NULL incoming otherrefs/measures overwrite stored values
    (``ignorenonerefs``/``ignorenonemeasures`` semantics,
    ref :2418-2453); then ``factexpander`` computes derived lag measures
    over the merged row (ref :2490-2505 — it sees the row *after*
    missing values were backfilled from the old row, :2450-2452).
    """

    def __init__(
        self,
        name: str,
        keyrefs: list[str],
        otherrefs: list[str],
        measures: list[str] | None = None,
        *,
        factexpander: Callable[[DataFrame], DataFrame] | None = None,
        ignorenonerefs: bool = True,
        ignorenonemeasures: bool = True,
        df: DataFrame | None = None,
    ):
        self.otherrefs = list(otherrefs)
        self.factexpander = factexpander
        self.ignorenonerefs = ignorenonerefs
        self.ignorenonemeasures = ignorenonemeasures
        super().__init__(name, keyrefs, [*otherrefs, *(measures or [])], df=df)
        self.measures = list(measures or [])
        self.all = [*self.keyrefs, *self.otherrefs, *self.measures]
        if df is not None:
            self._df = df.select(*self.all)

    def ensure(self, rows: DataFrame, namemapping=None, *, compare: bool = False) -> None:  # noqa: ARG002
        b = apply_namemapping(rows, namemapping)
        have = set(b.columns)
        # single-parse projections (guide §1.2 at the driver boundary):
        # the former per-column withColumn/_merge_col builders cost
        # ~1,300 py4j commands per 3-merge chain; each selectExpr below
        # parses the identical expressions in one call
        b = b.selectExpr(
            *[
                f"`{c}`" if c in have else f"NULL AS `{c}`"
                for c in self.all
            ]
        )
        incoming = b.selectExpr(
            *[f"`{k}`" for k in self.keyrefs],
            *[
                f"`{c}` AS `_in_{c}`"
                for c in [*self.otherrefs, *self.measures]
            ],
            "true AS _in",
        )
        merged = self.df.join(incoming, on=self.keyrefs, how="full")
        merged = merged.selectExpr(
            *[f"`{k}`" for k in self.keyrefs],
            *[self._merge_sql(c, self.ignorenonerefs) for c in self.otherrefs],
            *[self._merge_sql(c, self.ignorenonemeasures) for c in self.measures],
            "_in",
        )
        if self.factexpander is not None:
            # updated rows only, as the reference runs the expander on UPDATE
            merged = self.factexpander(merged)
        self._set_state(merged.select(*self.all))

    @staticmethod
    def _merge_sql(c: str, ignore_none: bool) -> str:
        if ignore_none:
            # incoming NULL means "not yet known" -> keep stored value
            return (
                f"CASE WHEN _in IS NOT NULL THEN coalesce(`_in_{c}`, `{c}`) "
                f"ELSE `{c}` END AS `{c}`"
            )
        return f"CASE WHEN _in IS NOT NULL THEN `_in_{c}` ELSE `{c}` END AS `{c}`"


class SubprocessFactTable:
    """Pipe delimited fact rows to a child process's stdin
    (ref tables.py:3222-3319: executable consumes fieldsep/rowsep rows,
    with optional init/end commands).

    Spark restatement: ``foreachPartition`` spawns one consumer process
    per partition on the executors — the load parallelizes with the data
    instead of funnelling through one driver-side pipe. The executable
    must therefore be safe to run concurrently (per-process temp files,
    appends to a queue, etc.).
    """

    def __init__(
        self,
        keyrefs: list[str],
        measures: list[str],
        executable: str,
        *,
        fieldsep: str = "\t",
        rowsep: str = "\n",
        nullsubst: str = "None",
        initcommand: str | None = None,
    ):
        self.keyrefs = list(keyrefs)
        self.measures = list(measures)
        self.all = [*self.keyrefs, *self.measures]
        self.executable = executable
        self.fieldsep, self.rowsep, self.nullsubst = fieldsep, rowsep, nullsubst
        self.initcommand = initcommand

    def insert(self, rows: DataFrame, namemapping=None) -> None:
        cols = self.all
        exe, fs, rs, ns, init = (
            self.executable, self.fieldsep, self.rowsep, self.nullsubst, self.initcommand,
        )
        b = apply_namemapping(rows, namemapping).select(*cols)

        def feed(partition):
            import subprocess

            proc = subprocess.Popen(exe, shell=True, stdin=subprocess.PIPE)
            try:
                if init is not None:
                    proc.stdin.write((init + rs).encode())
                for row in partition:
                    vals = [ns if row[c] is None else str(row[c]) for c in cols]
                    proc.stdin.write((fs.join(vals) + rs).encode())
            finally:
                proc.stdin.close()
                rc = proc.wait()
                if rc != 0:
                    raise RuntimeError(f"subprocess {exe!r} exited with {rc}")

        b.foreachPartition(feed)
