"""Deterministic dense surrogate-key assignment.

The reference assigns surrogate keys as ``max(key)+1`` kept in a Python
counter (``pygrametl/tables.py:234-243, 460-462``) — serial by
construction. We must produce the *same dense, contiguous, deterministic*
numbering from a parallel engine (the DuckDB oracle recomputes it), so:

- keys are ``offset + row_number`` over a caller-supplied canonical
  ordering (the business key), never ``monotonically_increasing_id`` —
  that is partition-layout-dependent and non-contiguous.
- small inputs (the common case: *new* members per batch) use one global
  window — a single-partition sort of only the new members.
- large inputs (initial dimension loads) use a two-phase plan that keeps
  the sort distributed: range-repartition by the ordering columns, sort
  within partitions, then add per-partition cumulative offsets computed
  from a tiny partition-size collect. This is the standard scalable
  "dense rank without a global sort bottleneck" pattern and holds at
  1000 executors: the only driver-side data is one count per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_dense_keys", "max_key", "max_key_and_count"]

# Above this many rows, route to the distributed two-phase plan.
_WINDOW_THRESHOLD = 1_000_000


_EXPENSIVE_NODES = ("Join", "Aggregate", "Window", "Sort", "Generate", "Deduplicate")


def _worth_pinning(df: DataFrame) -> bool:
    """True when recomputing ``df`` means replaying shuffle/window work —
    i.e. its analyzed plan contains a wide or generating operator. A
    plain (filtered/projected) scan is cheaper to recompute than to
    checkpoint. The analyzed plan is already cached on the
    queryExecution, so this is a driver-side string scan, no job."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    except Exception:  # noqa: BLE001 — default to pinning on any doubt
        return True
    return any(node in plan for node in _EXPENSIVE_NODES)


def max_key(df: DataFrame, key: str, default: int = 0) -> int:
    """Current max surrogate key (ref ``SELECT MAX(key)`` tables.py:237-239)."""
    row = df.agg(F.max(F.col(key)).alias("m")).first()
    return default if row is None or row["m"] is None else int(row["m"])


def max_key_and_count(
    dim_df: DataFrame, key: str, new_df: DataFrame, default: int = 0
) -> tuple[int, int]:
    """``(max_key(dim_df), new_df.count())`` in ONE Spark action.

    Every ensure/scdensure level needs both scalars — the key offset
    from the dimension and the plan-choosing row count of the new
    members — and paying them as two sequential driver round-trips
    serializes two small jobs per level (guide §2.6: independent work
    should overlap). A union of the two single-row aggregates collects
    both in one action; the independent subtrees' stages schedule
    concurrently. Values are identical to the separate calls by
    construction. Callers should pin ``new_df`` first when it is
    derived (the count then materializes the pin the numbering pass
    reuses, exactly as :func:`assign_dense_keys` would)."""
    rows = (
        dim_df.agg(F.max(F.col(key)).cast("long").alias("v"))
        .select(F.lit("m").alias("k"), "v")
        .unionByName(
            new_df.agg(F.count(F.lit(1)).cast("long").alias("v"))
            .select(F.lit("n").alias("k"), "v")
        )
        .collect()
    )
    d = {r["k"]: r["v"] for r in rows}
    m = d.get("m")
    return (default if m is None else int(m)), int(d.get("n") or 0)


def assign_dense_keys(
    df: DataFrame,
    ordercols: list[str],
    key: str,
    offset: int = 0,
    *,
    approx_count: int | None = None,
) -> DataFrame:
    """Add ``key`` = offset + 1,2,3,... densely over ``ordercols`` order.

    ``ordercols`` must uniquely order the rows (for dimension loads the
    business key does) — otherwise numbering of ties is undefined.
    """
    if approx_count is None and _worth_pinning(df):
        # Pin the input before the plan-choosing count: the count is an
        # eager action, and without the pin its full upstream DAG (scan +
        # shuffle + window chains in the SCD merges) is recomputed a
        # second time by the numbering pass — and a third time by
        # whatever action consumes the result (guide §1.2: don't compute
        # things you throw away). The lazy localCheckpoint makes the
        # count's materialization the single computation every later
        # pass reuses, and truncates the lineage the same way the
        # mutation-chain `_set_state` pin already does (PERF.md "Mutable
        # state persistence"). Measured r9: scd2_type1_overrides build
        # phase 12.8 s/40 jobs -> see OPTIMIZATION_r09.md. Trivial
        # scan-only inputs (small dimension seeds) skip the pin — there
        # the recompute is cheaper than the checkpoint write.
        df = df.localCheckpoint(eager=False)
    n = approx_count if approx_count is not None else df.count()
    if n <= _WINDOW_THRESHOLD:
        w = Window.orderBy(*[F.col(c) for c in ordercols])
        return df.withColumn(key, (F.row_number().over(w) + F.lit(offset)).cast("long"))
    return _assign_dense_keys_distributed(df, ordercols, key, offset)


def _assign_dense_keys_distributed(df: DataFrame, ordercols, key, offset) -> DataFrame:
    nparts = max(df.rdd.getNumPartitions(), 32)
    parted = (
        df.repartitionByRange(nparts, *ordercols)
        .sortWithinPartitions(*ordercols)
        .withColumn("_pid", F.spark_partition_id())
    )
    parted = parted.localCheckpoint(eager=True)  # pin partitioning for both passes
    sizes = {r["_pid"]: r["c"] for r in parted.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    cum, running = {}, offset
    for pid in sorted(sizes):
        cum[pid] = running
        running += sizes[pid]
    mapping = F.create_map(*[F.lit(x) for kv in cum.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in ordercols])
    return (
        parted.withColumn(key, (F.row_number().over(w) + mapping[F.col("_pid")]).cast("long"))
        .drop("_pid")
    )
