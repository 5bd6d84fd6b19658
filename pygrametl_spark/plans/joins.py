"""Skew-resistant join helpers.

AQE's skew-join splitting (on by default in ``session.get_spark``)
handles most hot keys by splitting oversized shuffle partitions. Salting
is the explicit tool for the cases AQE cannot fix: a single join key so
hot that *one key's* rows exceed an executor (AQE splits partitions, not
keys), stream-static joins (no AQE), or when the non-skewed side is too
big to broadcast. The reference has no analogue (its hash join is a
single in-memory dict, ``pygrametl/datasources.py:296-332``) — this is
net-new scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "partition_for"]


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: scatter each skewed row
    into one of ``salt`` sub-keys and replicate ``other`` across all of
    them, so one hot key spreads over ``salt`` shuffle partitions.

    The salt is ``pmod(hash(all columns), salt)`` of the skewed row —
    deterministic (re-runs and retries land identically, no
    ``rand()``-driven nondeterminism under task re-execution) while
    spreading near-uniformly. Cost: ``other`` shuffles ``salt``x — use
    when ``other`` is the smaller side yet above the broadcast
    threshold. Result equals ``skewed.join(other, on, how)`` exactly:
    each skewed row joins the single replica set bearing its salt.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt_cols = [F.col(c) for c in skewed.columns]
    s = skewed.withColumn("_salt", F.pmod(F.hash(*salt_cols), F.lit(salt)))
    r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return s.join(r, keys + ["_salt"], how).drop("_salt")


def partition_for(table, df: DataFrame, n: int | None = None) -> DataFrame:
    """Route rows to the partitions of a table's natural key — the batch
    analogue of the reference's partitioner family
    (``DimensionPartitioner``/``FactTablePartitioner``,
    ``pygrametl/tables.py:3503-3710``), which hash lookupatts/keyrefs to
    pick one of several table parts. In Spark that routing IS hash
    shuffle partitioning: ``repartition`` on the same columns, after
    which every downstream per-key operation (ensure dedup, SCD window,
    co-located join against a same-partitioned table) reuses the one
    exchange.
    """
    cols = list(getattr(table, "lookupatts", None) or getattr(table, "keyrefs"))
    return df.repartition(n, *cols) if n else df.repartition(*cols)


class BasePartitioner:
    """API facade over the reference's partitioner family
    (ref tables.py:3503-3710): there, N parallel table *instances* each
    own a hash slice of the keys and the partitioner routes per-row
    calls. In Spark the slices are shuffle partitions of ONE table, so
    the facade holds the single logical table, routes batches through
    :func:`partition_for`, and delegates the table API. ``parts``/
    ``getpart`` keep reference call sites working (every part IS the
    same distributed table)."""

    def __init__(self, *parts):
        if not parts:
            raise ValueError("at least one table part required")
        self.table = parts[0]
        self.parts = [self.table]

    def getpart(self, _row=None):
        return self.table

    def partition(self, df: DataFrame, n: int | None = None) -> DataFrame:
        return partition_for(self.table, df, n)

    def __getattr__(self, name):
        return getattr(self.table, name)


class DimensionPartitioner(BasePartitioner):
    """ref tables.py:3550-3628; delegates lookup/ensure/insert/... to the
    one distributed dimension."""


class FactTablePartitioner(BasePartitioner):
    """ref tables.py:3631-3710; delegates insert/lookup/ensure."""
