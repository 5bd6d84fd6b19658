"""Durable write-through state for mutable tables (Dimension/FactTable).

The default state pin after a mutation is a lazy ``localCheckpoint`` —
right for a sandbox/driver-session lifetime, but its blocks live in
*non-replicated executor storage*: on a real cluster, losing one
executor kills the truncated lineage and the computation cannot be
replayed. The production path is write-through: every mutation persists
the new state as parquet under a versioned directory and the in-memory
DataFrame re-reads from storage, so

- executor loss costs nothing (state is on the cluster FS / object
  store, exactly like the reference's tables, which *are* materialized
  in the RDBMS after every operation — ref ``tables.py:400-425``),
- a fresh session resumes from the latest version (`restore`),
- the mutation lineage is truncated the same way localCheckpoint
  truncates it (no unbounded plan growth across batches).

Versioned subdirectories (``v1``, ``v2`` …) avoid overwriting a path
that the next plan is still reading; old versions are pruned
best-effort, keeping the previous one as a rollback point.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["StatePersistence"]

_VERSION = re.compile(r"^v(\d+)$")


class StatePersistence:
    """Write-through parquet persistence with version rotation."""

    def __init__(self, path: str, keep: int = 2):
        self.path = path
        self.keep = keep
        self.version = self._latest() or 0

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            m = _VERSION.match(d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _latest(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def write(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` as the next version; return the re-read frame."""
        self.version += 1
        target = os.path.join(self.path, f"v{self.version}")
        df.write.mode("overwrite").parquet(target)
        for v in self._versions()[: -self.keep] if self.keep else []:
            shutil.rmtree(os.path.join(self.path, f"v{v}"), ignore_errors=True)
        return df.sparkSession.read.parquet(target)

    def read_latest(self, spark: SparkSession) -> DataFrame:
        """Latest persisted state — the fresh-session recovery path."""
        latest = self._latest()
        if latest is None:
            raise ValueError(f"no persisted state under {self.path}")
        self.version = latest
        return spark.read.parquet(os.path.join(self.path, f"v{latest}"))

    def read_version(self, spark: SparkSession, version: int) -> DataFrame:
        """A specific retained version (within the ``keep`` window)."""
        target = os.path.join(self.path, f"v{version}")
        if not os.path.isdir(target):
            raise ValueError(
                f"version v{version} not retained under {self.path} "
                f"(kept: {self._versions()})"
            )
        return spark.read.parquet(target)

    def diff(
        self,
        spark: SparkSession,
        v_old: int | None = None,
        v_new: int | None = None,
    ) -> DataFrame:
        """Load audit between two retained versions: one row per changed
        row, tagged ``change`` = 'added' (in new, not old) or 'removed'
        (in old, not new) with multiset semantics (``exceptAll`` both
        ways — an update shows as one removed + one added row). Defaults
        to the previous-vs-latest pair the rollback window retains.
        Distributed end to end; the diff is two anti-semijoins over the
        two parquet snapshots, nothing collects.
        """
        from pyspark.sql import functions as F

        vs = self._versions()
        if len(vs) < 2 and (v_old is None or v_new is None):
            raise ValueError(f"need two retained versions to diff (kept: {vs})")
        v_old = vs[-2] if v_old is None else v_old
        v_new = vs[-1] if v_new is None else v_new
        old = self.read_version(spark, v_old)
        new = self.read_version(spark, v_new)
        return (
            new.exceptAll(old).select(F.lit("added").alias("change"), "*")
            .unionByName(
                old.exceptAll(new).select(F.lit("removed").alias("change"), "*")
            )
        )
