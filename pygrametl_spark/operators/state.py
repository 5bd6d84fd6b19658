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

Commit protocols (both torn-write safe):

``protocol="rename"`` (default — the POSIX fast path): each version is
written to a hidden staging directory first, a ``_COMMITTED`` manifest
is fsynced inside it, and the staging directory is atomically renamed
to ``v{N}`` (POSIX rename is atomic within a filesystem — the
counterpart of the reference's transactional materialization, where
every table lands via a ConnectionWrapper commit, ref
``pygrametl/__init__.py:971-974``). A crash at ANY point before the
rename leaves only staging debris, which recovery ignores and the next
writer sweeps; a version directory is considered committed only if its
manifest exists, so a torn directory from a pre-protocol writer can
never be restored as latest.

``protocol="pointer"`` (object-store safe — NO rename anywhere): the
version's parquet lands under an immutable uniquely-named data
directory ``o{N}_{uuid}``, its ``_COMMITTED`` manifest is fsynced
(data-complete marker), and the COMMIT POINT is the one-shot creation
of an immutable checksummed pointer file ``p{N}.json`` naming the data
directory — the same metadata-versioning shape Iceberg uses for its
``v{N}.metadata.json`` and Delta for ``_delta_log/{N}.json``, where a
single-key PUT of a never-overwritten object is the only atomicity the
store must provide. Readers resolve latest = the highest pointer that
(a) parses with a matching content checksum and (b) names a data
directory whose manifest exists; a crash before the pointer write, or
mid-pointer-write (partial file -> checksum mismatch), leaves the
previous version as latest, and the next writer sweeps unreferenced
``o*`` debris. No rename, no overwrite, no directory-listing
consistency needed beyond list-after-write of immutable keys.

Both protocols can read a directory written by the other (the version
set is the union), so a store can migrate by constructing its next
handle with the other protocol. Single WRITER per path assumed, as in
the reference's one-connection load (concurrent writers race version
numbers; the pointer protocol's create-exclusive pointer write turns
that race into a clean failure on POSIX, the analogue of an
if-none-match conditional PUT — test-pinned: the loser raises, the
winner's commit stays the resolvable latest, and the loser's orphaned
data directory is unreferenced debris for the next sweep). Reader
handles are safe to construct at ANY time, including while a writer is
mid-commit: recovery resolves committed versions only and NEVER
deletes anything — debris from crashed writers is swept by the first
``write()`` of the next writer handle, not at construction, so a
reader can never rmtree a live writer's in-flight staging or
yet-unpointered data directory.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["StatePersistence"]

_VERSION = re.compile(r"^v(\d+)$")
_STAGING = re.compile(r"^_staging_v\d+_")
_OBJDIR = re.compile(r"^o(\d+)_[0-9a-f]+$")
_POINTER = re.compile(r"^p(\d+)\.json$")
_MANIFEST = "_COMMITTED"


def _fsync_dir(path: str) -> None:
    dfd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


class StatePersistence:
    """Write-through parquet persistence with version rotation and a
    torn-write-safe commit per version — ``protocol="rename"`` (POSIX
    atomic rename) or ``protocol="pointer"`` (rename-free immutable
    pointer log, object-store safe). See the module docstring."""

    def __init__(self, path: str, keep: int = 2, protocol: str = "rename"):
        if protocol not in ("rename", "pointer"):
            raise ValueError(f"unknown commit protocol {protocol!r}")
        self.path = path
        self.keep = keep
        self.protocol = protocol
        self._swept = False  # sweep runs at first write(), never on read
        self.version = self._latest() or 0

    def _sweep_debris(self) -> None:
        """Remove debris from writers that crashed before their commit
        point — staging dirs (rename protocol) and data dirs no valid
        pointer references (pointer protocol) are invisible to recovery,
        so this is pure hygiene. Called from ``write()`` only (writer
        intent): a read-only recovery handle constructed while the
        single writer is mid-commit must not rmtree the writer's
        in-flight staging / un-pointered data dir, and recovery does not
        need the sweep — ``_versions`` ignores debris by construction."""
        if not os.path.isdir(self.path):
            return
        valid = self._pointer_dirs()
        referenced = set(valid.values())
        for d in os.listdir(self.path):
            if _STAGING.match(d) or (
                _OBJDIR.match(d) and d not in referenced
            ):
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
            else:
                m = _POINTER.match(d)
                # a torn pointer (checksum/parse fail, or dangling target)
                # is by definition not a commit; left in place it would
                # block the next writer's create-exclusive pointer write
                if m and int(m.group(1)) not in valid:
                    try:
                        os.remove(os.path.join(self.path, d))
                    except OSError:
                        pass

    def _committed(self, version: int) -> bool:
        return os.path.exists(
            os.path.join(self.path, f"v{version}", _MANIFEST)
        )

    def _pointer_dirs(self) -> dict:
        """{version: data-dir basename} for every VALID pointer: the
        file parses, its content checksum matches, and the named data
        directory's manifest exists. A partial pointer from a mid-write
        crash fails the checksum and is simply not a commit."""
        out: dict = {}
        if not os.path.isdir(self.path):
            return out
        for f in os.listdir(self.path):
            m = _POINTER.match(f)
            if not m:
                continue
            try:
                with open(os.path.join(self.path, f)) as fh:
                    line, digest = fh.read().rsplit("\n", 1)
                if hashlib.sha256(line.encode()).hexdigest() != digest.strip():
                    continue
                meta = json.loads(line)
            except (ValueError, OSError):
                continue  # torn / partial pointer: not committed
            target = meta.get("dir", "")
            if (
                meta.get("version") == int(m.group(1))
                and _OBJDIR.match(target)
                and os.path.exists(
                    os.path.join(self.path, target, _MANIFEST)
                )
            ):
                out[int(m.group(1))] = target
        return out

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = set(self._pointer_dirs())
        for d in os.listdir(self.path):
            m = _VERSION.match(d)
            if m and self._committed(int(m.group(1))):
                out.add(int(m.group(1)))
        return sorted(out)

    def _latest(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _dir_for(self, version: int) -> str | None:
        """Absolute data directory of a committed version under either
        protocol (``v{N}`` wins if both exist), or None."""
        if self._committed(version):
            return os.path.join(self.path, f"v{version}")
        target = self._pointer_dirs().get(version)
        return os.path.join(self.path, target) if target else None

    def _write_manifest(self, dirname: str, df: DataFrame) -> None:
        with open(os.path.join(dirname, _MANIFEST), "w") as f:
            json.dump(
                {"version": self.version, "schema": df.schema.jsonValue()}, f
            )
            f.flush()
            os.fsync(f.fileno())

    def write(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` as the next version (atomic commit under the
        handle's protocol); return the re-read frame."""
        import uuid

        if not self._swept:  # writer intent established: safe to sweep
            self._sweep_debris()
            self._swept = True
        self.version += 1
        if self.protocol == "pointer":
            target = self._commit_pointer(df, uuid.uuid4().hex[:8])
        else:
            target = self._commit_rename(df, uuid.uuid4().hex[:8])
        self._prune()
        return df.sparkSession.read.parquet(target)

    def _commit_rename(self, df: DataFrame, nonce: str) -> str:
        staging = os.path.join(
            self.path, f"_staging_v{self.version}_{nonce}"
        )
        target = os.path.join(self.path, f"v{self.version}")
        df.write.mode("overwrite").parquet(staging)
        self._write_manifest(staging, df)
        # the manifest's and parquet files' DIRECTORY ENTRIES live in the
        # staging dir: without fsyncing it, a power loss after the rename
        # could surface v{N} with its manifest dirent missing — a
        # committed version recovery would then silently skip
        _fsync_dir(staging)
        # a torn v{N} from a pre-protocol writer (no manifest) may squat
        # on the name; it was never committed, so clearing it is safe
        if os.path.isdir(target) and not self._committed(self.version):
            shutil.rmtree(target, ignore_errors=True)
        os.rename(staging, target)  # the commit point — atomic
        _fsync_dir(self.path)  # make the rename itself durable
        return target

    def _commit_pointer(self, df: DataFrame, nonce: str) -> str:
        data = f"o{self.version}_{nonce}"
        target = os.path.join(self.path, data)
        df.write.mode("overwrite").parquet(target)
        self._write_manifest(target, df)
        # order matters: first the o-dir itself (the manifest's and
        # parquet files' dirents live THERE — fsyncing only the root
        # would leave a window where the pointer survives a power loss
        # but the manifest dirent is lost, silently rolling back an
        # acknowledged commit), then the root (the o-dir's own dirent)
        _fsync_dir(target)
        _fsync_dir(self.path)  # data dir + manifest durable first
        line = json.dumps(
            {"version": self.version, "dir": data}, sort_keys=True
        )
        content = line + "\n" + hashlib.sha256(line.encode()).hexdigest()
        ptr = os.path.join(self.path, f"p{self.version}.json")
        # create-exclusive: the pointer is written ONCE and never
        # overwritten — the POSIX analogue of an if-none-match PUT, so a
        # lost version-number race fails loudly instead of clobbering
        fd = os.open(ptr, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        try:
            os.write(fd, content.encode())
            os.fsync(fd)  # the commit point — pointer durable
        finally:
            os.close(fd)
        _fsync_dir(self.path)
        return target

    def _prune(self) -> None:
        if not self.keep:
            return
        pointers = self._pointer_dirs()
        for v in self._versions()[: -self.keep]:
            # pointer first: once it is gone the data dir is unreferenced
            # debris even if this prune dies between the two removals
            if v in pointers:
                try:
                    os.remove(os.path.join(self.path, f"p{v}.json"))
                except OSError:
                    pass
                shutil.rmtree(
                    os.path.join(self.path, pointers[v]), ignore_errors=True
                )
            shutil.rmtree(os.path.join(self.path, f"v{v}"), ignore_errors=True)

    def read_latest(self, spark: SparkSession) -> DataFrame:
        """Latest persisted state — the fresh-session recovery path."""
        latest = self._latest()
        if latest is None:
            raise ValueError(f"no persisted state under {self.path}")
        self.version = latest
        return spark.read.parquet(self._dir_for(latest))

    def read_version(self, spark: SparkSession, version: int) -> DataFrame:
        """A specific retained version (within the ``keep`` window)."""
        target = self._dir_for(version)
        if target is None:
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
