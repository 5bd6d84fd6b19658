"""Snowflaked dimension: one logical dimension over a tree of tables.

Reference: ``pygrametl/tables.py`` SnowflakedDimension (:1721-2133).
The reference walks the FK tree per row — recursive ``ensure`` bottom-up
through the levels (:2061-2103) and a ``NATURAL JOIN`` of all tables for
full-row reads (:1811-1821). Constraint kept from the reference: an FK
column has the same name as the referenced table's PK (:1743-1744).

Batch restatement:

- ``lookup``/``lookuprow`` — chain of left joins leaf->root; every level
  is usually small, so each join broadcasts (no shuffle of the probe).
- ``ensure`` — levels are ensured *root-first* (referenced side before
  referencing side, the same dependency order the reference enforces):
  each level's ensure decorates the batch with that level's surrogate
  key, which then participates in the child's attribute set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pygrametl_spark.operators.dimension import Dimension, apply_namemapping

__all__ = ["SnowflakedDimension"]


class SnowflakedDimension:
    """``references`` is a list of (referencing, referenced) Dimension
    pairs, exactly the reference's constructor shape (tables.py:1823-1828);
    the first referencing dimension is the root (finest grain)."""

    def __init__(self, references: list[tuple[Dimension, Dimension]]):
        self.references = list(references)
        self.root = references[0][0]
        # order levels so every referenced dim precedes its referencing dim
        self._levels: list[Dimension] = []
        for child, parent in reversed(self.references):
            if parent not in self._levels:
                self._levels.append(parent)
            if child not in self._levels:
                self._levels.append(child)
        self.key = self.root.key
        self.lookupatts = self.root.lookupatts

    def denormalized(self) -> DataFrame:
        """Full-row natural-join view of the whole tree (ref join SQL
        :1811-1821): root joined with each parent on the parent's key."""
        out = self.root.df
        for child, parent in self.references:
            out = out.join(parent.df, on=parent.key, how="left")
        return out

    def lookup(self, batch: DataFrame, namemapping=None, *, broadcast: bool = True) -> DataFrame:
        """Root-level business key -> root surrogate key (ref :1837-1865)."""
        return self.root.lookup(batch, namemapping, broadcast=broadcast)

    def lookuprow(self, batch: DataFrame, namemapping=None) -> DataFrame:
        b = apply_namemapping(batch, namemapping)
        return b.join(self.denormalized(), on=self.root.lookupatts, how="left")

    def ensure(self, batch: DataFrame, namemapping=None) -> DataFrame:
        """Recursive bottom-up ensure through FK levels (ref __ensure_helper
        :2061-2103): referenced levels first, so the child's rows carry the
        parent's surrogate key before the child is ensured."""
        b = apply_namemapping(batch, namemapping)
        for child, parent in reversed(self.references):
            b = parent.ensure(b)
        return self.root.ensure(b)

    def scdensure(self, batch: DataFrame, namemapping=None) -> None:
        """SCD2 on the root, plain ensure on the higher levels
        (ref :2105-2133). Root must be a SlowlyChangingDimension."""
        b = apply_namemapping(batch, namemapping)
        for child, parent in reversed(self.references):
            b = parent.ensure(b)
        self.root.scdensure(b)
