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

Commit protocol (torn-write safe): each version is written to a hidden
staging directory first, a ``_COMMITTED`` manifest is fsynced inside
it, and the staging directory is atomically renamed to ``v{N}`` (POSIX
rename is atomic within a filesystem — the counterpart of the
reference's transactional materialization, where every table lands via
a ConnectionWrapper commit, ref ``pygrametl/__init__.py:971-974``). A
crash at ANY point before the rename leaves only staging debris, which
recovery ignores and the next writer sweeps; a version directory is
considered committed only if its manifest exists, so a torn directory
from a pre-protocol writer can never be restored as latest. On an
object store without atomic rename, swap this class for a table format
(Delta/Iceberg) — the call sites are unchanged.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["StatePersistence"]

_VERSION = re.compile(r"^v(\d+)$")
_STAGING = re.compile(r"^_staging_v\d+_")
_MANIFEST = "_COMMITTED"


class StatePersistence:
    """Write-through parquet persistence with version rotation and an
    atomic (staging + fsynced manifest + rename) commit per version."""

    def __init__(self, path: str, keep: int = 2):
        self.path = path
        self.keep = keep
        self._sweep_staging()
        self.version = self._latest() or 0

    def _sweep_staging(self) -> None:
        """Remove debris from writers that crashed before their rename —
        staging dirs are invisible to recovery, so this is pure hygiene."""
        if not os.path.isdir(self.path):
            return
        for d in os.listdir(self.path):
            if _STAGING.match(d):
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _committed(self, version: int) -> bool:
        return os.path.exists(
            os.path.join(self.path, f"v{version}", _MANIFEST)
        )

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            m = _VERSION.match(d)
            if m and self._committed(int(m.group(1))):
                out.append(int(m.group(1)))
        return sorted(out)

    def _latest(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def write(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` as the next version (atomic commit); return
        the re-read frame."""
        import uuid

        self.version += 1
        staging = os.path.join(
            self.path, f"_staging_v{self.version}_{uuid.uuid4().hex[:8]}"
        )
        target = os.path.join(self.path, f"v{self.version}")
        df.write.mode("overwrite").parquet(staging)
        manifest = os.path.join(staging, _MANIFEST)
        with open(manifest, "w") as f:
            json.dump(
                {"version": self.version, "schema": df.schema.jsonValue()}, f
            )
            f.flush()
            os.fsync(f.fileno())
        # a torn v{N} from a pre-protocol writer (no manifest) may squat
        # on the name; it was never committed, so clearing it is safe
        if os.path.isdir(target) and not self._committed(self.version):
            shutil.rmtree(target, ignore_errors=True)
        os.rename(staging, target)  # the commit point — atomic
        dfd = os.open(self.path, os.O_RDONLY)
        try:
            os.fsync(dfd)  # make the rename itself durable
        finally:
            os.close(dfd)
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
        if not (os.path.isdir(target) and self._committed(version)):
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
