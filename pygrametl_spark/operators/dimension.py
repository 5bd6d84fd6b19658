"""Dimension operators: lookup / ensure / insert / update / getbykey / getbyvals.

Reference: ``pygrametl/tables.py`` class ``Dimension`` (:125-462) and its
cached/bulk variants (CachedDimension :464-686, BulkDimension
:2777-2984, CachedBulkDimension :2987-3219). All variants collapse into
this one batch implementation because their differences are *execution*
devices for row-at-a-time DB access (FIFO lookup caches, temp-file bulk
loads) that Spark subsumes: caching a dimension is ``df.cache()`` /
broadcast, and every write is already a bulk write.

Batch semantics (set-at-a-time restatement of the per-row loop):

- ``lookup``  — business key -> surrogate key for a whole batch at once:
  a left join against the dimension on ``lookupatts`` +
  ``coalesce(key, defaultidvalue)`` (ref lookup tables.py:245-264).
- ``ensure``  — "insert what lookup misses, then return keys": left-anti
  join to find new members, deterministic max+1-dense key assignment
  (ref _getnextid tables.py:460-462), optional ``rowexpander`` on the
  new members (ref tables.py:374-398), append, final lookup join.
- ``update``  — per-key overwrite of the provided attribute columns
  (ref tables.py:335-366) as a read-modify-write of the relation.

Scale notes: the dimension side of a lookup join is broadcast when small
(AQE decides at runtime; ``broadcast=True`` forces) so the 100 TB fact
scan never shuffles. ``ensure`` shuffles only the *deduplicated new
members*, not the input batch.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygrametl_spark.plans.keys import assign_dense_keys, max_key
from pygrametl_spark.plans.local import local_relation

__all__ = [
    "Dimension", "CachedDimension", "BulkDimension", "CachedBulkDimension",
    "DecoupledDimension",
]


def apply_namemapping(df: DataFrame, namemapping: Mapping[str, str] | None) -> DataFrame:
    """Rename source columns to dimension attribute names.

    Reference semantics: every method reads ``row[namemapping.get(att, att)]``
    (tables.py:8-19), i.e. namemapping maps *attribute* -> *source column*.
    Applied once per relation instead of per row.
    """
    if not namemapping:
        return df
    for att, src in namemapping.items():
        if src in df.columns and att != src:
            df = df.withColumnRenamed(src, att)
    return df


class Dimension:
    """A dimension table as a DataFrame + role metadata.

    :param name: table name (diagnostics / temp views).
    :param key: surrogate key column (single-attribute, ref tables.py:138).
    :param attributes: non-key columns.
    :param lookupatts: business-key subset of attributes (default: all).
    :param defaultidvalue: key returned for failed lookups (ref :155-157).
    :param rowexpander: ``DataFrame -> DataFrame`` applied to new members
        before insert (ref rowexpander :157-165) — column expressions, not
        per-row Python.
    :param idfinder: custom key-assignment strategy (ref idfinder
        :150-154): ``f(new_members_df, current_max_key) -> df_with_key``.
        Default is deterministic max+1-dense over the business key.
    :param df: initial contents (columns ``[key] + attributes``).
    """

    def __init__(
        self,
        name: str,
        key: str,
        attributes: list[str],
        lookupatts: list[str] | None = None,
        *,
        defaultidvalue=None,
        rowexpander: Callable[[DataFrame], Callable] | None = None,
        idfinder: Callable[[DataFrame, int], DataFrame] | None = None,
        df: DataFrame | None = None,
    ):
        self.name = name
        self.key = key
        self.attributes = list(attributes)
        self.lookupatts = list(lookupatts) if lookupatts else list(attributes)
        self.defaultidvalue = defaultidvalue
        self.rowexpander = rowexpander
        self.idfinder = idfinder
        # Pin mutated state so iterative ensure/update chains don't replay
        # the whole mutation lineage on every action (and the plan doesn't
        # grow unboundedly across batches). Lazy localCheckpoint: computed
        # once at first use. The reference's analogue is that its tables
        # ARE materialized state in the RDBMS after every operation.
        # localCheckpoint blocks are executor-local (non-replicated): right
        # for a single-session sandbox, lost on executor failure on a real
        # cluster — production loads call durable() for write-through
        # parquet state instead (operators/state.py).
        self.materialize_updates = True
        self._persistence = None
        self.all = [key, *self.attributes]
        self._df: DataFrame | None = df.select(*self.all) if df is not None else None

    # -- state ------------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        if self._df is None:
            raise ValueError(f"dimension {self.name} has no contents yet")
        return self._df

    def load(self, df: DataFrame) -> "Dimension":
        self._df = df.select(*self.all)
        return self

    def cache(self) -> "Dimension":
        """Reference CachedDimension/prefill (tables.py:549-593) analogue:
        pin the whole dimension in executor memory across batches."""
        self._df = self.df.cache()
        return self

    # -- reads ------------------------------------------------------------
    def lookup(self, batch: DataFrame, namemapping=None, *, broadcast: bool = False) -> DataFrame:
        """Batch of rows -> same rows + surrogate ``key`` column
        (ref lookup tables.py:245-264)."""
        b = apply_namemapping(batch, namemapping)
        dim = self.df.select(self.key, *self.lookupatts)
        if broadcast:
            dim = F.broadcast(dim)
        out = b.join(dim, on=self.lookupatts, how="left")
        if self.defaultidvalue is not None:
            out = out.withColumn(self.key, F.coalesce(F.col(self.key), F.lit(self.defaultidvalue)))
        return out

    def getbykey(self, keys: DataFrame | list) -> DataFrame:
        """Surrogate key(s) -> full rows; missing keys yield all-NULL
        attributes — exactly left-join semantics (ref tables.py:272-293)."""
        if isinstance(keys, DataFrame):
            kdf = keys.select(F.col(keys.columns[0]).alias(self.key)).dropDuplicates()
        else:
            spark = self.df.sparkSession
            simple = self.df.schema[self.key].dataType.simpleString()
            if simple in (
                "tinyint", "smallint", "int", "bigint",
                "string", "double", "float", "boolean",
            ):
                # Key lists are driver-side literals: a VALUES-backed
                # LocalRelation keeps the probe join JVM-only, where
                # createDataFrame would pay a Python-worker scan of the
                # pickled keys on every action (guide §4).
                kdf = local_relation(
                    spark, [(k,) for k in keys], f"{self.key} {simple}"
                )
            else:
                kdf = spark.createDataFrame([(k,) for k in keys], [self.key])
                kdf = kdf.withColumn(self.key, F.col(self.key).cast(self.df.schema[self.key].dataType))
        return kdf.join(self.df, on=self.key, how="left")

    def getbyvals(self, vals: Mapping[str, object], namemapping=None) -> DataFrame:
        """All rows matching the partial attribute dict (ref tables.py:295-333)."""
        nm = namemapping or {}
        out = self.df
        for att, v in vals.items():
            out = out.filter(F.col(nm.get(att, att)) == F.lit(v))
        return out

    def lookuprow(self, batch: DataFrame, namemapping=None) -> DataFrame:
        """lookup + getbykey composition (ref tables.py:433-458): batch
        decorated with the full dimension row."""
        b = apply_namemapping(batch, namemapping)
        return b.join(self.df, on=self.lookupatts, how="left")

    # -- writes -----------------------------------------------------------
    def _dedup_new(self, b: DataFrame) -> DataFrame:
        """Deduplicate a batch to one row per business key, deterministically.

        The reference keeps the *first* row seen per key (per-row loop).
        A DataFrame has no order, so we take the lexicographic minimum of
        the remaining attributes — deterministic under any partitioning.
        """
        dim_types = (
            {f.name: f.dataType for f in self.df.schema.fields} if self._df is not None else {}
        )
        b = b.select(*[c for c in b.columns if c in self.attributes])
        for a in self.attributes:
            if a not in b.columns:
                null = F.lit(None)
                if a in dim_types:
                    null = null.cast(dim_types[a])
                b = b.withColumn(a, null)
        others = [a for a in self.attributes if a not in self.lookupatts]
        if not others:
            return b.dropDuplicates(self.lookupatts)
        agg = b.groupBy(*self.lookupatts).agg(F.min(F.struct(*others)).alias("_s"))
        return agg.select(*self.lookupatts, *[F.col(f"_s.{o}").alias(o) for o in others])

    def insert(self, rows: DataFrame, namemapping=None) -> DataFrame:
        """Append rows; assign keys where the key column is absent
        (ref insert tables.py:400-425). Returns the inserted rows with keys."""
        b = apply_namemapping(rows, namemapping)
        if self.key in b.columns:
            keyed = b.select(*self.all)
        elif self._df is not None and self.idfinder is None:
            from pygrametl_spark.plans.keys import _worth_pinning, max_key_and_count

            new = self._dedup_new(b)
            if _worth_pinning(new):
                new = new.localCheckpoint(eager=False)
            offset, n = max_key_and_count(self.df, self.key, new)
            keyed = assign_dense_keys(
                new, self.lookupatts, self.key, offset, approx_count=n
            ).select(*self.all)
        else:
            offset = max_key(self.df, self.key) if self._df is not None else 0
            keyed = self._assign_keys(self._dedup_new(b), offset).select(*self.all)
        self._set_state(keyed if self._df is None else self.df.unionByName(keyed))
        return keyed

    def ensure(self, batch: DataFrame, namemapping=None, *, broadcast: bool = False) -> DataFrame:
        """Insert unknown members, then return the batch with keys
        (ref ensure tables.py:374-398). One deterministic Spark job chain:

        1. anti-join the deduped batch against the dimension (the implicit
           anti-join of "insert what lookup did not find"),
        2. optional rowexpander on new members only,
        3. dense max+1 keys over the business-key ordering,
        4. append; 5. final lookup join for the whole batch.
        """
        b = apply_namemapping(batch, namemapping)
        from pygrametl_spark.plans.keys import _worth_pinning

        if _worth_pinning(b):
            # the batch feeds the anti-join (via _dedup_new) AND the
            # final lookup join — pin derived batches so each consumer
            # reads one materialization instead of replaying the
            # caller's window/join chain (guide §1.2)
            b = b.localCheckpoint(eager=False)
        new = self._dedup_new(b).join(
            self.df.select(*self.lookupatts), on=self.lookupatts, how="left_anti"
        )
        if self.rowexpander is not None:
            new = self.rowexpander(new)
        if self.idfinder is None:
            # one action for both scalars (offset + plan-choosing count)
            # instead of two sequential jobs per ensure level (r9,
            # guide §2.6); pin first so the count materializes the pin
            # the numbering pass reuses
            from pygrametl_spark.plans.keys import max_key_and_count

            if _worth_pinning(new):
                new = new.localCheckpoint(eager=False)
            offset, n = max_key_and_count(self.df, self.key, new)
            keyed = assign_dense_keys(
                new, self.lookupatts, self.key, offset, approx_count=n
            ).select(*self.all)
        else:
            offset = max_key(self.df, self.key)
            keyed = self._assign_keys(new, offset).select(*self.all)
        self._set_state(self.df.unionByName(keyed))
        return self.lookup(b, broadcast=broadcast)

    def _assign_keys(self, new_members: DataFrame, offset: int) -> DataFrame:
        if self.idfinder is not None:
            return self.idfinder(new_members, offset)
        return assign_dense_keys(new_members, self.lookupatts, self.key, offset)

    def durable(self, path: str, protocol: str = "rename") -> "Dimension":
        """Write-through state (the production persistence path — see
        operators/state.py): every mutation persists to ``path`` and a
        fresh session resumes with :meth:`restore`. ``protocol="pointer"``
        commits via an immutable pointer log instead of rename — the
        object-store-safe path (S3-style stores have no atomic rename)."""
        from pygrametl_spark.operators.state import StatePersistence

        self._persistence = StatePersistence(path, protocol=protocol)
        if self._df is not None:
            self._df = self._persistence.write(self._df)
        return self

    def restore(self, spark, path: str | None = None) -> "Dimension":
        """Reload the latest durably-persisted state — the fresh-session /
        post-failure recovery twin of :meth:`durable`."""
        from pygrametl_spark.operators.state import StatePersistence

        if path is not None or self._persistence is None:
            if path is None:
                raise ValueError(f"dimension {self.name} has no persistence path")
            self._persistence = StatePersistence(path)
        self._df = self._persistence.read_latest(spark).select(*self.all)
        return self

    def _set_state(self, df: DataFrame) -> None:
        if self._persistence is not None:
            self._df = self._persistence.write(df)
        else:
            self._df = df.localCheckpoint(eager=False) if self.materialize_updates else df

    def update(self, updates: DataFrame, namemapping=None) -> None:
        """Overwrite provided attribute columns per key (ref tables.py:335-366).

        Columns present in ``updates`` (besides the key) replace the stored
        values for matching keys — including explicit NULLs, matching the
        reference's ``SET att = %(att)s`` semantics.
        """
        u = apply_namemapping(updates, namemapping)
        atts = [c for c in u.columns if c != self.key and c in self.attributes]
        u = u.select(self.key, *[F.col(a).alias(f"_new_{a}") for a in atts]).withColumn(
            "_matched", F.lit(True)
        )
        out = self.df.join(u, on=self.key, how="left")
        for a in atts:
            out = out.withColumn(
                a, F.when(F.col("_matched").isNotNull(), F.col(f"_new_{a}")).otherwise(F.col(a))
            )
        self._set_state(out.select(*self.all))

    # -- persistence ------------------------------------------------------
    def write(self, path: str, mode: str = "overwrite") -> None:
        """Parquet is the engine's bulk format — the reference's temp-file
        + COPY bulk protocol (tables.py:2508-2683) is subsumed by a
        columnar write."""
        self.df.write.mode(mode).parquet(path)


# The cached/bulk variants are the same operator in Spark; aliases keep
# user code from the reference API readable.
CachedDimension = Dimension
BulkDimension = Dimension
CachedBulkDimension = Dimension


def DecoupledDimension(dimension: Dimension, **_ignored) -> Dimension:
    """Reference ``DecoupledDimension`` (tables.py, §2.10) proxies a
    dimension to a worker process so callers don't block. Spark executes
    every table operation as distributed lazy plans already — the
    decoupling is the execution model — so the facade returns the wrapped
    dimension unchanged (consumer/returnvalues kwargs are accepted and
    ignored)."""
    return dimension
