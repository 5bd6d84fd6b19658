"""Deterministic sampling / dataset splitting for training pipelines.

Net-new surface beyond the reference. Everything here is *hash-based*
and therefore reproducible across runs, engines, and cluster sizes —
unlike ``df.sample``, whose output depends on partitioning. The hash is
the same md5-derived 32-bit value the dedup family uses, so a DuckDB
oracle replays the assignment bit-for-bit, and at 100 TB each operator
is a pure scan-stage projection/filter: ZERO shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pygrametl_spark.functions.dedup import hash32

__all__ = [
    "hash_bucket", "hash_split", "hash_sample", "stratified_hash_sample",
    "cluster_split", "pack_by_token_budget", "mixture_sample",
    "per_group_cap", "shuffle_shards", "write_shuffled_shards",
    "quantile_bucket",
]


def hash_bucket(col, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5-hash of a column."""
    c = F.col(col) if isinstance(col, str) else col
    return hash32(c.cast("string")) % buckets


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, tuple[int, int]] | None = None,
    *,
    buckets: int = 100,
    out: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket — the
    reproducible train/val/test partition of a corpus. ``splits`` maps
    name -> [lo, hi) bucket range; default 98/1/1."""
    splits = splits or {"train": (0, 98), "val": (98, 99), "test": (99, 100)}
    b = hash_bucket(id_col, buckets)
    expr = F.lit(None).cast("string")
    for name, (lo, hi) in reversed(list(splits.items())):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return df.withColumn(out, expr)


def cluster_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    clusters: DataFrame | None = None,
    splits: dict[str, tuple[int, int]] | None = None,
    buckets: int = 100,
    out: str = "split",
    threshold: float = 0.5,
) -> DataFrame:
    """Leakage-safe train/val/test split: hash the near-duplicate
    CLUSTER id, not the document id, so near-duplicates always land in
    the same split.

    A plain per-document :func:`hash_split` silently leaks evaluation
    data — two near-identical documents can straddle train and test, and
    the model is then scored on (a paraphrase of) its own training data.
    Splitting on the connected-component id of the duplicate graph
    (``dedup.neardup_clusters``) closes that hole: the whole cluster
    moves as one unit. Pass a precomputed ``clusters`` frame
    (id, cluster_id) to reuse pair generation across pipeline stages.
    Cost on top of clustering: one join against the (id, cluster_id)
    relation — tiny next to the corpus — and the same zero-shuffle hash
    projection.
    """
    if "cluster_id" in df.columns:
        labeled = df  # input already labeled (e.g. mid-pipeline after dedup)
    else:
        if clusters is None:
            from pygrametl_spark.functions.dedup import neardup_clusters

            clusters = neardup_clusters(df, id_col, text_col, threshold=threshold)
        labeled = df.join(clusters.select(id_col, "cluster_id"), id_col)
    b = hash_bucket(F.col("cluster_id"), buckets)
    splits = splits or {"train": (0, 98), "val": (98, 99), "test": (99, 100)}
    expr = F.lit(None).cast("string")
    for name, (lo, hi) in reversed(list(splits.items())):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return labeled.withColumn(out, expr)


def hash_sample(df: DataFrame, id_col: str, fraction: float, *, buckets: int = 10000) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash bucket falls
    below fraction*buckets. Same ids are kept in every run."""
    return df.filter(hash_bucket(id_col, buckets) < int(fraction * buckets))


def stratified_hash_sample(
    df: DataFrame, id_col: str, strata_col: str, fractions: dict[str, float], *, buckets: int = 10000
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample web text but
    keep all code). Strata missing from ``fractions`` are dropped —
    matching ``sampleBy`` semantics, but reproducibly."""
    b = hash_bucket(id_col, buckets)
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cond = cond | ((F.col(strata_col) == stratum) & (b < int(frac * buckets)))
    return df.filter(cond)


def pack_by_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    *,
    order_by,
    partition_by=None,
    out: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs for pretraining
    batch assembly: pack_id = floor(exclusive-prefix-sum(tokens) /
    budget) over a deterministic order. A document whose tokens straddle
    a boundary opens the next pack (prefix-chunking, the standard
    streaming approximation of greedy bin packing — exact greedy needs a
    sequential scan, which a relation cannot express).

    One window sort is the entire cost; with ``partition_by`` (e.g. a
    shard column) packing runs per shard and the sort never crosses
    shards — the 100 TB formulation.
    """
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.orderBy(*order) if partition_by is None else Window.partitionBy(
        *([partition_by] if isinstance(partition_by, str) else list(partition_by))
    ).orderBy(*order)
    prefix = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return df.withColumn(out, F.floor(prefix / budget).cast("long"))

def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    token_col: str,
    target_tokens: int,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Data-mixture subsetting: divide a global token budget across
    strata (sources/languages) by temperature weights
    ``w_s = floor(stratum_tokens ** alpha)`` — the default alpha=0.5
    (sqrt) rule upweights small sources relative to proportional
    sampling — then keep each stratum's documents in deterministic hash
    order until its budget fills (a document straddling the boundary is
    kept, matching :func:`pack_by_token_budget`'s prefix semantics).
    ``alpha=1.0`` is proportional; lower alpha flattens the mixture
    toward uniform.

    For the default alpha=0.5, weights and budgets stay in *integer*
    arithmetic (floor-sqrt, floor-division) so the allocation is
    bit-identical across engines — a float ``pow``/sum would make budget
    boundaries 1-ulp ambiguous; other alphas use ``floor(pow(...))``
    (libm double pow — reproducible within one engine; the oracle-gated
    query pins alpha=0.5). ``target_tokens * w_s`` must fit in int64
    (fine up to ~1e12 targets).

    Cost: one tiny groupBy for totals (broadcast back) + one window sort
    per stratum. At extreme per-stratum sizes the sort is the bottleneck;
    the constant-time degradation is hash_sample with fraction
    budget/total per stratum, which this operator deliberately does not
    silently substitute.
    """
    tot = df.groupBy(strata_col).agg(F.sum(token_col).alias("_tot"))
    if alpha == 0.5:
        wexpr = F.floor(F.sqrt("_tot"))
    elif alpha == 1.0:
        wexpr = F.col("_tot")
    else:
        wexpr = F.floor(F.pow(F.col("_tot").cast("double"), F.lit(float(alpha))))
    w = tot.withColumn("_w", wexpr.cast("long"))
    # The weight total is a 1-row aggregate attached by broadcast cross
    # join, not an unpartitioned window: the window form collapses the
    # strata relation to a single partition (WindowExec warns) and at
    # scale would serialize on one task; the long sum is exact either
    # way, so _wsum is bit-identical. The relation is bounded at one row
    # per stratum regardless.
    budget = (
        w.crossJoin(F.broadcast(w.agg(F.sum("_w").alias("_wsum"))))
        .withColumn("_num", F.lit(int(target_tokens)).cast("long") * F.col("_w"))
        # integer DIV, not `/`: long/long is double division in Spark, and
        # doubles lose exactness past 2^53 — the budget must be exact
        .withColumn("_budget", F.expr("_num DIV _wsum"))
        .select(strata_col, "_budget")
    )
    order = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(id_col).cast("string"), 1 << 30), F.col(id_col)
    )
    prefix = F.coalesce(
        F.sum(token_col).over(order.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        df.join(F.broadcast(budget), strata_col)
        .withColumn("_prefix", prefix)
        .filter(F.col("_prefix") < F.col("_budget"))
        .drop("_prefix", "_budget")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    *,
    seed: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic seeded GLOBAL SHUFFLE into ``n_shards`` shards —
    the last mile of a training-data pipeline: after curation, the
    corpus must be (a) shuffled so adjacent training batches are not
    correlated by crawl/source order, and (b) split into shards a data
    loader can stream independently. ``df.orderBy(rand())`` is neither
    reproducible (partitioning-dependent) nor restartable; this is both:

    - ``shard = hash(seed:id) % n_shards`` — changing ``seed`` is a
      fresh epoch-level reshuffle; the same seed replays bit-identically
      on any cluster size (md5-derived :func:`hash_bucket` hash, so a
      SQL oracle replays the assignment exactly).
    - ``pos`` = the document's 0-based position within its shard, in
      hash order (``id`` as tiebreak for hash collisions) — together
      ``(shard, pos)`` is a total, reproducible read order.

    Scale shape: ONE shuffle keyed by ``shard`` (n_shards partitions),
    then a partition-local sort per shard — no global sort ever happens;
    shards order themselves independently, which is exactly why sharded
    loaders exist. Pick ``n_shards`` so one shard's rows fit an
    executor's sort budget (corpus_bytes / ~512 MB is a good start); at
    100 TB that is thousands of shards, each a few-hundred-MB local
    sort.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = hash32(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    out = df.withColumn("_skey", key).withColumn(
        shard_col, (F.col("_skey") % n_shards).cast("long")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_skey"), F.col(id_col))
    return out.withColumn(
        pos_col, (F.row_number().over(w) - 1).cast("long")
    ).drop("_skey")


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    *,
    n_shards: int,
    seed: str = "",
    mode: str = "error",
) -> DataFrame:
    """Materialize :func:`shuffle_shards` as ``shard=K/`` parquet
    directories whose ROW ORDER is the shuffled read order, plus a
    manifest the loader sizes epochs from.

    Each shard value is routed to one task (``repartition(n_shards,
    shard)``) and sorted locally by ``(shard, pos)`` before the
    partitioned write, so every ``shard=K`` directory is written by
    exactly one task in final order — a re-run over the same input
    produces row-identical shards (parquet row order is preserved on
    read). Returns the manifest ``(shard, n_rows)``, computed from the
    written files so it counts what a loader will actually see.
    """
    assigned = shuffle_shards(df, id_col, n_shards, seed=seed)
    (
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )
    spark = df.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("shard")
    )


def per_group_cap(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    order_by: "list[Column] | None" = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the per-domain quota every
    web-scale corpus applies so one domain can't dominate the mixture
    (e.g. Dolma / RefinedWeb per-domain caps).

    Ranking is deterministic: ``order_by`` columns (default none) then
    ``id_col`` as the final tiebreak, via ``row_number`` over the group.
    One shuffle keyed by ``group_col``. A pathologically hot group is
    exactly what the operator exists to bound: its input rows all hash
    to one partition, but AQE skew-split handles the sort because
    ``row_number`` only needs partition-local ordering after the
    repartition; if a single group exceeds a partition's memory, cap it
    in two passes (hash_sample to ~10x cap, then this) — the composition
    is deterministic too.

    Returns ``(id_col, group_col, rk)`` for the kept rows.
    """
    order = list(order_by or []) + [F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= cap)
        .select(id_col, group_col, "rk")
    )


# above this row count, per-group NTILE switches from a window (whose
# largest group must fit one partition's sort) to the two-phase
# distributed rank (same machinery as plans/keys.py dense keys)
_QB_WINDOW_THRESHOLD = 1_000_000


def _ceil_div(a: Column, b: Column) -> Column:
    """ceil(a/b) for positive integer columns, in exact integer math."""
    return F.floor((a + b - F.lit(1)) / b).cast("long")


def quantile_bucket(
    df: DataFrame,
    id_col: str,
    score_col: str,
    k: int,
    *,
    by: "str | None" = None,
    out: str = "bucket",
) -> DataFrame:
    """Per-group quantile bucketing — standard ``NTILE(k)`` over
    ``(score_col, id_col)`` within each ``by`` group. The CCNet
    head/middle/tail split (Wenzek et al. 2020, arXiv:1911.00359)
    generalized: bucket web documents by a quality/perplexity score per
    language, then keep or re-weight buckets in the training mixture
    (``k=3`` with a perplexity score IS CCNet; compose with
    :func:`hash_sample` / ``lm_score`` for the full pipeline).

    Deterministic: ordering is total (``score_col`` then ``id_col``), so
    the assignment replays bit-for-bit across runs and engines, and the
    bucket arithmetic is standard NTILE (first ``n % k`` buckets get the
    extra row) — a DuckDB/ANSI ``NTILE(k) OVER (PARTITION BY .. ORDER
    BY score, id)`` produces the identical column.

    Scale shape: below 1M input rows this is a plain per-group window
    (largest group sorts in one partition). Above, a window would put a
    30 TB language on one executor, so it switches to the two-phase
    distributed rank from ``plans/keys.py``: range-repartition on
    ``(by, score, id)``, partition-local ``row_number`` plus a
    per-partition offset map (a bounded driver sidecar, one row per
    partition), then per-group ``(start, n)`` via an aggregate join —
    the group stats relation has one row per group and broadcasts under
    AQE. No global sort, no single-partition window, NTILE computed
    from the within-group rank in exact integer math.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gcols = [by] if by else []
    n_total = df.count()
    if n_total <= _QB_WINDOW_THRESHOLD:
        w = (
            Window.partitionBy(*gcols) if gcols else Window.partitionBy()
        ).orderBy(F.col(score_col), F.col(id_col))
        return df.withColumn(out, F.ntile(k).over(w))

    from pygrametl_spark.plans.keys import _assign_dense_keys_distributed

    ordercols = gcols + [score_col, id_col]
    pos = _assign_dense_keys_distributed(df, ordercols, "_qb_pos", 0)
    if gcols:
        grp = pos.groupBy(*gcols).agg(
            F.min("_qb_pos").alias("_qb_start"),
            F.count("*").alias("_qb_n"),
        )
        pos = pos.join(grp, gcols)
        rank = F.col("_qb_pos") - F.col("_qb_start") + 1
        n = F.col("_qb_n")
    else:
        rank = F.col("_qb_pos")
        n = F.lit(n_total).cast("long")
    kk = F.lit(k).cast("long")
    q = F.floor(n / kk).cast("long")
    r = n % kk
    cut = r * (q + 1)
    bucket = F.when(rank <= cut, _ceil_div(rank, q + 1)).otherwise(
        r + _ceil_div(rank - cut, F.greatest(q, F.lit(1)))
    )
    return pos.withColumn(out, bucket.cast("int")).drop(
        "_qb_pos", "_qb_start", "_qb_n"
    )
