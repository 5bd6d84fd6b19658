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

__all__ = ["salted_join", "partition_for", "asof_join", "range_join"]


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance=None,
    right_cols: list[str] | None = None,
    how: str = "left",
    tiebreak: str | None = None,
    suffix: str | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """General-purpose as-of join (pandas ``merge_asof`` semantics): for
    every left row, attach the single right row with the LATEST
    ``right_time`` <= ``left_time`` within the same ``on`` keys
    (``direction="backward"``; ``"forward"`` takes the EARLIEST
    ``right_time`` >= ``left_time``; ``"nearest"`` the smaller absolute
    gap of the two, backward winning exact ties — merge_asof's rule).
    ``allow_exact_matches=False`` makes the comparisons strict on both
    sides, again as in merge_asof. The time-series primitive Spark
    lacks natively (kdb ``aj``, TimescaleDB/DuckDB ``ASOF JOIN``, quote-
    to-trade matching, sensor alignment) — and the scalable formulation
    is NOT a range join: both sides are tagged and UNIONed, shuffled
    ONCE on the keys, sorted by event time, and the right row's payload
    is carried to following left rows with ``last(..., ignoreNulls)``
    over an unbounded-preceding window. No per-pair candidate set ever
    materializes, so cost is one shuffle + one sort regardless of how
    many right rows precede each left row (a range join degenerates to
    per-key cross products when events cluster).

    Ties (right_time == left_time) match, as in merge_asof. Among right
    rows with the SAME timestamp the winner is the row with the GREATEST
    ``tiebreak`` column value when one is given (NULLs lose) — making
    the result deterministic under any physical row order / partitioning
    — and otherwise whichever sorts last, mirroring merge_asof's silent
    tie behavior (nondeterministic unless (keys, right_time) is unique).
    ``tolerance`` (e.g. ``F.expr("INTERVAL 1 DAY")`` or a numeric delta)
    voids matches farther than that from the left time. ``how="left"``
    keeps unmatched left rows with NULL payload; ``"inner"`` drops them.

    When a right payload column shares its name with a left column the
    output would carry duplicate names (any later select-by-name throws
    AMBIGUOUS_REFERENCE), so collisions raise ``ValueError`` unless
    ``suffix`` is given, in which case colliding payload columns are
    renamed ``<name><suffix>`` (pandas merge_asof's suffixes behavior).

    Reference parity note: ``SlowlyChangingDimension.lookupasof`` (ref
    tables.py:1686-1711) is the dimension-table special case of this
    operator; this generalization joins ANY two event relations.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_time
    ]
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
    # Payload names colliding with left output names -> ambiguous result
    # columns; rename via suffix or refuse loudly.
    clash = [c for c in rcols if c in left.columns]
    out_names = dict(zip(rcols, rcols))
    if clash:
        if suffix is None:
            raise ValueError(
                f"right payload columns {clash} collide with left columns; "
                "pass right_cols to drop them or suffix to rename them"
            )
        out_names.update({c: c + suffix for c in clash})

    pay_fields = [F.col(c) for c in rcols] + [F.col(right_time).alias("_rt")]
    if tiebreak is not None and tiebreak not in rcols:
        pay_fields.append(F.col(tiebreak).alias("_tbv"))
    lt = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*pay_fields).alias("s")).schema["s"].dataType
        ).alias("_rpay"),
    )
    rt = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*pay_fields).alias("_rpay"),
    )
    both = lt.unionByName(rt)

    from pyspark.sql import Window

    # Ordering: with exact matches allowed, right rows sort BEFORE the
    # left row at equal times so ties match; strict mode sorts them
    # AFTER so the carry excludes them. With a tiebreak, equal-time
    # right rows sort ascending on it (NULLs first) so the greatest
    # value is carried last -> wins.
    tie = (
        F.col("_is_left").asc() if allow_exact_matches else F.col("_is_left").desc()
    )
    tb_order = []
    if tiebreak is not None:
        tb_field = tiebreak if tiebreak in rcols else "_tbv"
        tb_order = [F.col(f"_rpay.{tb_field}").asc_nulls_first()]

    def carry(time_desc: bool):
        o = [F.col("_t").desc() if time_desc else F.col("_t").asc(), tie, *tb_order]
        w = Window.partitionBy(*keys).orderBy(*o).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return F.last("_rpay", ignorenulls=True).over(w)

    if direction == "nearest":
        # both carries over ONE (keys) exchange — two sorts, no extra
        # shuffle; backward wins exact-distance ties (merge_asof rule)
        carried = (
            both.withColumn("_mb", carry(False))
            .withColumn("_mf", carry(True))
            .filter(F.col("_is_left") == 1)
        )
        gb = F.col("_t") - F.col("_mb._rt")
        gf = F.col("_mf._rt") - F.col("_t")
        if tolerance is not None:
            carried = carried.withColumn(
                "_mb", F.when(gb <= tolerance, F.col("_mb"))
            ).withColumn("_mf", F.when(gf <= tolerance, F.col("_mf")))
            gb = F.col("_t") - F.col("_mb._rt")
            gf = F.col("_mf._rt") - F.col("_t")
        pick_b = F.col("_mb").isNotNull() & (F.col("_mf").isNull() | (gb <= gf))
        carried = carried.withColumn(
            "_match", F.when(pick_b, F.col("_mb")).otherwise(F.col("_mf"))
        )
    else:
        carried = both.withColumn(
            "_match", carry(direction == "forward")
        ).filter(F.col("_is_left") == 1)
        if tolerance is not None:
            gap = (
                F.col("_t") - F.col("_match._rt")
                if direction == "backward"
                else F.col("_match._rt") - F.col("_t")
            )
            carried = carried.withColumn(
                "_match", F.when(gap <= tolerance, F.col("_match"))
            )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(out_names[c]) for c in rcols
    ]
    out = carried.select(*out_cols)
    if how == "inner":
        out = carried.filter(F.col("_match").isNotNull()).select(*out_cols)
    elif how != "left":
        raise ValueError("how must be 'left' or 'inner'")
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    on: str | list[str] | None = None,
    bucket_width: int,
    end_inclusive: bool = False,
    open_ended: bool = True,
) -> DataFrame:
    """Point-in-interval join without a nested-loop product: Spark plans
    a plain ``p >= s AND p < e`` join as BroadcastNestedLoopJoin (or a
    cartesian product), which is quadratic per key. This bucketizes the
    range dimension instead — each point lands in exactly ONE bucket of
    ``bucket_width`` (so no post-join dedup), each interval explodes
    into the buckets it overlaps, and the join is a plain hash equi-join
    on (keys, bucket) followed by the exact range filter.

    ``point``/``start``/``end`` must be numeric (cast timestamps with
    ``unix_micros`` first); NULL ``end`` means open-ended (the interval
    is exploded up to the points' maximum bucket — computed as one
    broadcast row, no driver action). Pass ``open_ended=False`` when the
    caller KNOWS every ``end`` is non-NULL: the max-bucket scan of the
    points side (and its one-row broadcast attach) is skipped entirely,
    leaving a pure hash equi-join plan. Choose ``bucket_width`` near the
    TYPICAL interval length: cost is O(intervals x overlapped_buckets +
    matched pairs), so width >> interval length degenerates toward
    per-bucket products and width << interval length explodes the
    interval side.
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    w = int(bucket_width)
    p = points.withColumn("_b", F.floor(F.col(point) / w).cast("long"))
    if open_ended:
        maxb = points.agg(
            F.floor(F.max(F.col(point)) / w).cast("long").alias("_maxb")
        )
        iv = intervals.crossJoin(F.broadcast(maxb)).withColumn(
            "_b1",
            F.least(
                F.coalesce(F.floor(F.col(end) / w).cast("long"), F.col("_maxb")),
                F.col("_maxb"),
            ),
        )
    else:
        iv = intervals.withColumn("_b1", F.floor(F.col(end) / w).cast("long"))
    iv = (
        iv.withColumn("_b0", F.floor(F.col(start) / w).cast("long"))
        .filter(F.col("_b1") >= F.col("_b0"))  # interval starts past all points -> no buckets
        .withColumn("_b", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))))
        .drop("_b0", "_b1", "_maxb")
    )
    upper = (
        F.col(point) <= F.col(end) if end_inclusive else F.col(point) < F.col(end)
    )
    cond = (F.col(point) >= F.col(start)) & (F.col(end).isNull() | upper)
    return p.join(iv, keys + ["_b"], "inner").filter(cond).drop("_b")
