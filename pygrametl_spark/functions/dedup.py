"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram jaccard.

Net-new surface for training-data pipelines (the reference has no dedup).
Design goals:

- **Scale**: every algorithm is join/agg-shaped, never O(n²) on the full
  corpus. Exact jaccard joins on shared shingles; MinHash-LSH joins on
  band buckets. At 100 TB the shuffles are by shingle/band key — the
  minimal partitioning the semantics allow — and skew (a shingle shared
  by everything) is bounded by AQE skew handling + the shingle
  frequency cap below.
- **Determinism**: the hash family is md5-derived 32-bit values with fixed
  affine permutations mod a prime, all expressible in ANSI SQL, so the
  DuckDB oracle replays the math bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygrametl_spark.functions.text import tokens, with_distinct_shingles
from pygrametl_spark.plans.local import local_relation

__all__ = [
    "MINHASH_P", "MINHASH_A", "MINHASH_B",
    "hash32", "exact_dedup", "dedup_against", "minhash_signatures",
    "minhash_signatures_long", "minhash_lsh_pairs", "minhash_band_rows",
    "minhash_lsh_pairs_between", "simhash32", "ngram_jaccard_pairs",
    "ngram_pair_intersections",
    "neardup_clusters", "cluster_survivors", "exact_substring_dedup",
    "exact_substring_dedup_against", "span_keys",
]

# Affine permutations h_i(x) = (a_i*x + b_i) mod P over the 32-bit hash
# universe. P is the smallest prime > 2^32; constants are fixed so the
# oracle can inline them.
MINHASH_P = 4294967311
MINHASH_K = 16
# a_i < 1.9e9 so a_i * h + b_i stays under 2^63 for h < 2^32 (no overflow
# in either engine's 64-bit arithmetic)
MINHASH_A = [
    754435761, 346822519, 1366489917, 668265263, 374761393, 1241592653,
    818281829, 1618033989, 1234567891, 987654323, 192837465, 1029384757,
    246813579, 1357924681, 864209753, 1111111121,
]
MINHASH_B = [
    1013904223, 1664525, 69069, 362437, 521288629, 88675123,
    2463534242, 123456789, 998244353, 754974721, 167772161, 469762049,
    1000000007, 1000000009, 715827883, 2147483647,
]


def hash32(col) -> F.Column:
    """Portable 32-bit hash: first 8 hex digits of md5, as a long.

    md5 is identical everywhere; DuckDB recomputes this as
    ``CAST(('0x' || substr(md5(x),1,8)) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    """The DuckDB-side twin of :func:`hash32` (used to build oracles)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def hash32_spark_sql(expr: str) -> str:
    """Spark-SQL text of :func:`hash32` — for embedding in single-parse
    ``F.expr`` strings (the python builder costs ~15 py4j round-trips
    per call site; hot build paths use this text form instead)."""
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def exact_dedup(df: DataFrame, id_col: str, on) -> DataFrame:
    """Exact dedup: keep the minimum id per duplicate group (hash-groupBy;
    one shuffle on the dedup key)."""
    cols = [on] if isinstance(on, str) else list(on)
    return df.groupBy(*cols).agg(F.min(id_col).alias(id_col)).select(id_col, *cols)


def dedup_against(
    new_df: DataFrame, corpus_df: DataFrame, id_col: str = "doc_id", on="text"
) -> DataFrame:
    """Incremental exact dedup: the batch shape of accepting a new crawl
    into an existing corpus. Keeps new rows that (a) are the minimum-id
    representative of their duplicate group WITHIN the batch and (b) do
    not exactly duplicate anything already accepted. One shuffle on the
    dedup key per side; the corpus contributes only its distinct keys to
    the anti-join (never its full rows)."""
    cols = [on] if isinstance(on, str) else list(on)
    survivors = exact_dedup(new_df, id_col, cols)
    return survivors.join(
        corpus_df.select(*cols).dropDuplicates(), cols, "left_anti"
    ).select(id_col, *cols)


def minhash_lsh_pairs_between(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-set near-duplicate pairs: each NEW document against the
    EXISTING corpus, never corpus x corpus.

    The incremental counterpart of :func:`minhash_lsh_pairs`: when a
    daily crawl lands next to a 100 TB accepted corpus, re-enumerating
    the corpus's internal pairs would dwarf the actual question ("is
    anything in the batch a near-dup of what we already have?"). Both
    sides go through the same banded-LSH bucketing with a side tag; the
    in-row pair enumeration then crosses ONLY new x old members of each
    bucket, so bucket work is |new_in_bucket| * |old_in_bucket| instead
    of the full quadratic bucket product. Returns
    (new_id, corpus_id, est_jaccard).
    """
    rows_per_band = MINHASH_K // bands

    def tagged(df: DataFrame, tag: int) -> DataFrame:
        wide = minhash_signatures(df, id_col, text_col)
        band_cols = [
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            ).alias(f"band{b}")
            for b in range(bands)
        ]
        sig = wide.select(id_col, *[F.col(f"mh{i}") for i in range(MINHASH_K)], *band_cols)
        return sig.select(
            F.col(id_col),
            F.lit(tag).alias("_side"),
            F.array(*[F.col(f"mh{i}") for i in range(MINHASH_K)]).alias("sig"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("bidx"), F.col(f"band{b}").alias("bhash"))
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(id_col, "_side", "sig", "bb.bidx", "bb.bhash")

    both = tagged(new_df, 1).unionByName(tagged(corpus_df, 0))
    grouped = (
        both.groupBy("bidx", "bhash")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col("_side").alias("t"), F.col("sig").alias("sig"))
            ).alias("ms")
        )
        .filter(F.size("ms") >= 2)
    )
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("ms") <= max_bucket_size)
    news = F.expr("filter(ms, m -> m.t = 1)")
    olds = F.expr("filter(ms, m -> m.t = 0)")
    pair_arr = F.expr(
        "flatten(transform(filter(ms, m -> m.t = 1), "
        "a -> transform(filter(ms, m -> m.t = 0), "
        "b -> struct(a AS a, b AS b))))"
    )
    pairs = (
        grouped.filter((F.size(news) >= 1) & (F.size(olds) >= 1))
        .select(F.explode(pair_arr).alias("p"))
        .select(
            F.col("p.a.id").alias("new_id"),
            F.col("p.b.id").alias("corpus_id"),
            F.col("p.a.sig").alias("sig_a"),
            F.col("p.b.sig").alias("sig_b"),
        )
    )
    eq = F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
    return (
        pairs.select(
            "new_id", "corpus_id",
            F.round(eq / F.lit(float(MINHASH_K)), 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["new_id", "corpus_id"])
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *, n: int = 3
) -> DataFrame:
    """Wide MinHash signature: (id, mh0..mh15) — computed entirely in-row.

    The shingle set is an in-row array, so each permutation's minimum is
    ``array_min(transform(hashes, h -> (a*h+b) % P))`` over a
    materialized per-row hash array: the whole signature is produced
    inside the scan stage with ZERO shuffle (the explode + groupBy
    formulation shuffled one row per doc and materialized one row per
    shingle first). Docs with no shingles (shorter than n tokens) are
    dropped, matching the explode-based semantics.

    The md5 per shingle is evaluated once into ``_harr`` — embedding it
    in the 16 permutation lambdas would re-run it 16x per shingle.
    """
    # Filter on token count BEFORE shingling. `filter(size(_sharr) >= 1)`
    # after the projection is pushed below it with the whole shingle
    # expression inlined into the predicate — every row then tokenizes
    # and shingles TWICE (measured 2x on the signature stage). The
    # token-count predicate is equivalent (>=1 shingle <=> >=n tokens)
    # and costs one split in the scan.
    from pygrametl_spark.functions.text import _tokens_sql

    sh = with_distinct_shingles(
        df.where(f"size({_tokens_sql(text_col)}) >= {n}"), id_col, text_col, n
    )
    hashed = sh.selectExpr(
        "*", f"transform(_sharr, s -> {hash32_spark_sql('s')}) AS _harr"
    )
    # Single-parse discipline (guide §1.2 at the driver boundary): the 16
    # permutation minima as ONE selectExpr instead of 16 Column builders.
    mins = [
        f"array_min(transform(_harr, h -> ({a} * h + {b}) % {MINHASH_P})) AS mh{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return hashed.selectExpr(id_col, *mins)


def minhash_signatures_long(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, perm, minhash) long form of the signature (16 rows per doc)."""
    wide = minhash_signatures(df, id_col, text_col)
    stack = ", ".join(f"'mh{i}', mh{i}" for i in range(MINHASH_K))
    return wide.select(
        id_col, F.expr(f"stack({MINHASH_K}, {stack}) AS (perm, minhash)")
    )


def minhash_band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    bands: int = 4,
) -> DataFrame:
    """(id, sig, bidx, bhash): one row per document per LSH band, with
    the full MinHash signature carried as an array — the relation both
    the batch pair enumeration and the streaming accepted-store build
    on. Fully in-row (signature + band hashes computed in the scan
    stage, one explode); the md5 band hash is the same formula the
    DuckDB oracle replays."""
    rows_per_band = MINHASH_K // bands
    wide = minhash_signatures(df, id_col, text_col)
    # Single-parse discipline: sig array + band-hash structs as two
    # selectExpr calls (the per-column builders cost ~0.3 s of driver
    # wall per call site; the parsed text yields the same expressions).
    band_structs = ", ".join(
        f"struct({b} AS bidx, md5(concat_ws(',', "
        + ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + ")) AS bhash)"
        for b in range(bands)
    )
    sig_arr = "array(" + ", ".join(f"mh{i}" for i in range(MINHASH_K)) + ")"
    return wide.selectExpr(
        id_col,
        f"{sig_arr} AS sig",
        f"explode(array({band_structs})) AS bb",
    ).selectExpr(id_col, "sig", "bb.bidx", "bb.bhash")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via banded LSH over the MinHash signature.

    Candidate generation groups documents by (band index, band hash) and
    enumerates the i<j pairs *inside* each bucket with in-row array
    expressions — docs only meet if they collide in some band, so the
    corpus cross-product never materializes and the signature pipeline
    runs exactly ONCE (a bucket self-join reads the relation twice:
    measured as two full shingle+signature computations, plus Catalyst
    broadcasting a corpus-sized bucket relation — both disqualifying at
    100 TB). Total shuffles: one groupBy on the bucket key + one
    pair-dedup; bucket state is bounded by bucket size, for which
    ``max_bucket_size`` is the standard web-scale skew guard (a bucket
    that big is a degenerate duplicate cluster; None keeps exact
    semantics). Returns (id_1, id_2, est_jaccard).
    """
    buckets = minhash_band_rows(df, id_col, text_col, bands=bands)
    grouped = (
        buckets.groupBy("bidx", "bhash")
        .agg(F.expr(f"collect_list(struct({id_col} AS id, sig AS sig)) AS ms"))
        .where("size(ms) >= 2")
    )
    if max_bucket_size is not None:
        grouped = grouped.where(f"size(ms) <= {int(max_bucket_size)}")
    # all i<j member pairs of the bucket, in-row (single-parse SQL text)
    pair_arr = (
        "flatten(transform(sequence(0, size(ms) - 2), "
        "i -> transform(sequence(i + 1, size(ms) - 1), "
        "j -> struct(element_at(ms, i + 1) AS a, element_at(ms, j + 1) AS b))))"
    )
    pairs = grouped.selectExpr(f"explode({pair_arr}) AS p").selectExpr(
        "least(p.a.id, p.b.id) AS id_1",
        "greatest(p.a.id, p.b.id) AS id_2",
        "p.a.sig AS sig_a",
        "p.b.sig AS sig_b",
    )
    return (
        pairs.selectExpr(
            "id_1",
            "id_2",
            # The divisor MUST be a double literal ("16.0D"): a bare "16.0"
            # parses as DECIMAL(3,1) in Spark SQL, turning est_jaccard into
            # DecimalType and diverging from the double-typed oracle.
            "round(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
            f" / {float(MINHASH_K)!r}D, 4) AS est_jaccard",
        )
        .dropDuplicates(["id_1", "id_2"])
        .where(f"est_jaccard >= {float(threshold)!r}")
    )


def simhash32(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over tokens (with multiplicity): bit j of the
    fingerprint is 1 iff the signed sum of token-hash bit j is positive.
    One explode + one groupBy — same shuffle shape as MinHash."""
    t = df.select(id_col, F.explode(tokens(text_col)).alias("_t"))
    h = t.select(id_col, hash32("_t").alias("hv"))
    aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright(hv, {j}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"s{j}")
        for j in range(32)
    ]
    agg = h.groupBy(id_col).agg(*aggs)
    sim_sql = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(32)
    )
    return agg.select(
        id_col, F.expr(f"CAST({sim_sql} AS BIGINT)").alias("simhash")
    )


def ngram_pair_intersections(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """The shared pair relation under every n-gram-set similarity metric:
    ``(id_1, id_2, n1, n2, inter)`` for each document pair sharing at
    least one ``n``-shingle — |A∩B| plus both set sizes, from which
    jaccard (|A∩B|/(n1+n2-|A∩B|)) and containment (|A∩B|/min(n1,n2))
    are single in-row expressions. Exposed so a caller needing SEVERAL
    metrics over the same corpus pays the tokenize+shingle pass, the
    bucket exchange and the pair groupBy ONCE (see
    :func:`ngram_jaccard_pairs` for the scale shape)."""
    arr = with_distinct_shingles(df, id_col, text_col, n)
    # The per-doc set size rides ALONG each exploded row (one extra long
    # per row) instead of being recomputed from the array and joined back
    # on (which cost a second full tokenize+shingle pass plus two joins
    # of the pair relation).
    sh = arr.select(
        id_col, F.size("_sharr").cast("long").alias("n_sh"), F.explode("_sharr").alias("s")
    )
    # Group by shingle and enumerate the i<j member pairs IN-ROW — the
    # same formulation as the LSH bucket stage. vs. the shingle
    # self-join this halves the pipeline (the exploded relation is read
    # once, not twice — AQE never reused the exchange across the two
    # join sides, so the self-join re-tokenized the whole corpus) and
    # singleton shingles (the vast majority of a real corpus) never
    # reach the pair stage at all. Members are array_sort-ed so pair
    # enumeration yields id_1 < id_2 deterministically regardless of
    # collect_list order.
    bucket = sh.groupBy("s").agg(
        F.array_sort(F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("n_sh").alias("n")))).alias("ms")
    ).filter(F.size("ms") >= 2)
    if max_shingle_freq is not None:
        # stop-shingle guard: a shingle shared by more docs than this is
        # a degenerate hub; dropping it changes the effective set sizes,
        # so recount per doc over the kept buckets
        bucket = bucket.filter(F.size("ms") <= max_shingle_freq)
        kept = bucket.select(F.explode("ms").alias("m")).select(
            F.col("m.id").alias(id_col)
        ).groupBy(id_col).agg(F.count("*").alias("_n2"))
        # rewrite each member's n with the recounted size
        bucket = (
            bucket.select("s", F.explode("ms").alias("m"))
            .join(kept, F.col("m.id") == F.col(id_col))
            .groupBy("s")
            .agg(F.array_sort(F.collect_list(F.struct(F.col("m.id").alias("id"), F.col("_n2").alias("n")))).alias("ms"))
        )
    pair_arr = F.expr(
        "flatten(transform(sequence(0, size(ms) - 2), "
        "i -> transform(sequence(i + 1, size(ms) - 1), "
        "j -> struct(element_at(ms, i + 1) AS a, element_at(ms, j + 1) AS b))))"
    )
    return (
        bucket.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.a.id").alias("id_1"), F.col("p.b.id").alias("id_2"),
            F.col("p.a.n").alias("n1"), F.col("p.b.n").alias("n2"),
        )
        .agg(F.count("*").alias("inter"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None = None,
    metric: str = "jaccard",
) -> DataFrame:
    """Exact n-gram-set similarity for all pairs above ``threshold``.

    Scalable formulation: join documents on *shared shingles* and count
    intersections — |A∩B| via groupBy(pair), |A∪B| = |A|+|B|-|A∩B|.
    Never builds the doc×doc cross product. ``max_shingle_freq`` drops
    shingles shared by more than N docs (stop-shingles), the standard
    guard against join blowup on a 100 TB corpus.

    ``metric="jaccard"`` scores |A∩B|/|A∪B|; ``metric="containment"``
    scores |A∩B|/min(|A|,|B|) — the asymmetric rule that catches a short
    document embedded in a long one (quotations, syndicated reposts),
    which symmetric jaccard dilutes toward 0 as the size gap grows.
    Both come free from the same pair relation (sizes already ride each
    pair); the score column is named after the metric.
    """
    inter = ngram_pair_intersections(
        df, id_col, text_col, n=n, max_shingle_freq=max_shingle_freq
    )
    if metric == "containment":
        score = F.round(F.col("inter") / F.least("n1", "n2"), 6)
    else:
        score = F.round(F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 6)
    return (
        inter.withColumn(metric, score)
        .filter(F.col(metric) >= threshold)
        .select("id_1", "id_2", metric)
    )


def _cc_star_labels(edges: DataFrame, max_iter: int) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., *Connected Components in MapReduce and
    Beyond*, SoCC'14). Input: undirected edge list ``(_a, _b)`` (any
    orientation, self-loops ignored). Output: ``(_id, _label)`` with
    ``_label`` = the component's minimum id, one row per node that
    appears in an edge.

    Each round halves the longest root-to-leaf distance, so convergence
    is O(log n) rounds even on an adversarial path graph — the upgrade
    over plain min-label propagation's O(diameter). Each round is two
    groupBys over the *edge* relation only (tiny next to the corpus);
    duplicate edges are tolerated between rounds because ``collect_set``
    re-deduplicates neighborhoods, so no extra dedup shuffle is paid
    inside the loop.

    - large-star: for each node u over its full neighborhood N(u),
      m = min(N(u) + u); emit (v, m) for v in N(u), v > u.
    - small-star: for each node u over its smaller neighbors
      S(u) = {v in N(u): v < u}, m = min(S(u)); emit (u, m) and
      (v, m) for v in S(u), v != m.

    Both emissions keep every edge oriented big->small, so the small-star
    grouping is simply a groupBy on the first column.
    """
    # canonical big->small orientation, self-loops dropped
    cur = (
        edges.filter(F.col("_a") != F.col("_b"))
        .select(
            F.greatest("_a", "_b").alias("_u"), F.least("_a", "_b").alias("_v")
        )
        .localCheckpoint(eager=False)
    )
    prev_sig = None
    for _ in range(max_iter):
        # large-star over the symmetric adjacency
        adj = cur.unionByName(
            cur.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        )
        ls = (
            adj.groupBy("_u")
            .agg(F.collect_set("_v").alias("_ns"))
            .select(
                "_u",
                F.least(F.array_min("_ns"), F.col("_u")).alias("_m"),
                F.expr("filter(_ns, v -> v > _u)").alias("_big"),
            )
            .select(F.explode("_big").alias("_u"), F.col("_m").alias("_v"))
            .filter(F.col("_u") != F.col("_v"))
        )
        # small-star over big->small edges
        ss = (
            ls.groupBy("_u")
            .agg(F.collect_set("_v").alias("_ns"))
            .select("_u", F.array_min("_ns").alias("_m"), "_ns")
            .select(
                F.explode(
                    F.array_union(F.array(F.col("_u")), F.col("_ns"))
                ).alias("_u"),
                F.col("_m").alias("_v"),
            )
            .filter(F.col("_u") != F.col("_v"))
        )
        cur = ss.dropDuplicates(["_u", "_v"]).localCheckpoint(eager=False)
        sig = cur.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("_u", "_v")), F.lit(0)).alias("h"),
        ).first()
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # at the fixpoint every non-root points straight at its component min
    roots = cur.select(F.col("_v").alias("_id")).subtract(
        cur.select(F.col("_u").alias("_id"))
    )
    return cur.select(F.col("_u").alias("_id"), F.col("_v").alias("_label")).unionByName(
        roots.select("_id", F.col("_id").alias("_label"))
    )


def _cc_driver_labels(edge_rows) -> "list[tuple]":
    """Exact union-find (union by min root + path compression) over a
    collected edge list. O(E α(E)) time, O(V) memory — the driver-side
    fast path of ``neardup_clusters(algorithm="auto")``. Returns
    (node, component-min) for every NON-ROOT node; roots label
    themselves downstream via the left-join coalesce."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min id becomes the root, so labels match the distributed path
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(x, find(x)) for x in parent]


# Edge sets below this collect to the driver for union-find; above it the
# distributed star contraction runs. Same philosophy as AQE's broadcast
# threshold: the LSH pair graph is orders of magnitude smaller than the
# corpus, and when it fits comfortably on the driver, one collect beats
# O(log n) rounds of two-shuffle jobs. 2M edges ≈ tens of MB collected.
_CC_DRIVER_EDGE_THRESHOLD = 2_000_000


def neardup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.5,
    pairs: DataFrame | None = None,
    max_iter: int = 50,
    algorithm: str = "auto",
    driver_edge_threshold: int = _CC_DRIVER_EDGE_THRESHOLD,
) -> DataFrame:
    """Near-duplicate CLUSTERS + canonical keep decision.

    The step a training-data pipeline actually runs after pair
    generation: duplicate pairs are transitive in practice (A~B, B~C =>
    keep one of {A,B,C}), so the dedup unit is the connected component
    of the pair graph, not the pair. Returns one row per input document:
    (id, cluster_id = min id of its component, keep = is the canonical
    representative). Documents in no pair are their own cluster.

    Implementation: ``algorithm="auto"`` (default) is adaptive, the way
    AQE picks join strategies at runtime: the pair graph is materialized
    once (it is needed in full either way), and if it has at most
    ``driver_edge_threshold`` edges — after LSH, the duplicate graph is
    orders of magnitude smaller than the corpus — the components come
    from one driver-side union-find over a single collect instead of
    O(log n) rounds of two-shuffle jobs. Bigger graphs fall through to
    ``"star"``: the alternating large-star/small-star contraction
    (:func:`_cc_star_labels`) — O(log n) rounds on any graph shape, the
    web-scale formulation. ``algorithm="propagation"`` keeps plain
    iterative min-label propagation — ``label(v) <- min(label(v), min
    label of v's neighbors)`` until a fixpoint, O(graph diameter)
    rounds; each round is one join + one groupBy on the (small) edge
    relation, with labels pinned via lazy localCheckpoint so lineage
    stays O(1) across rounds. All are exact; they must (and,
    property-tested, do) agree.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(df, id_col, text_col, threshold=threshold)
    edges = pairs.select(F.col("id_1").alias("_a"), F.col("id_2").alias("_b"))
    if algorithm == "auto":
        edges = edges.localCheckpoint(eager=False)
        # One action probes AND fetches: limit(N+1).collect() returning
        # <= N rows proves it exhausted the input, so those rows ARE the
        # complete edge set — the former separate count-probe plus full
        # collect paid the result stage twice (r9, guide §1.2). Union-
        # find is order-independent, so the collected order is
        # irrelevant.
        probe = edges.limit(driver_edge_threshold + 1).collect()
        if len(probe) <= driver_edge_threshold:
            spark = df.sparkSession
            lab = _cc_driver_labels([(r["_a"], r["_b"]) for r in probe])
            id_type = dict(df.dtypes)[id_col]
            # VALUES-literal LocalRelation, not createDataFrame: the
            # label sidecar broadcasts into an otherwise-JVM join, and a
            # Python-RDD-backed relation would respawn Python workers on
            # every downstream action just to rescan it (guide §4).
            labels = local_relation(
                spark, lab, f"_id {id_type}, _label {id_type}"
            )
            out = df.select(id_col).join(
                F.broadcast(labels.withColumnRenamed("_id", id_col)), id_col, "left"
            )
            cluster = F.coalesce(F.col("_label"), F.col(id_col))
            return out.select(
                id_col,
                cluster.alias("cluster_id"),
                (cluster == F.col(id_col)).alias("keep"),
            )
        algorithm = "star"
    if algorithm == "star":
        labels = _cc_star_labels(edges, max_iter)
        out = df.select(id_col).join(
            labels.select(F.col("_id").alias(id_col), "_label"), id_col, "left"
        )
        cluster = F.coalesce(F.col("_label"), F.col(id_col))
        return out.select(
            id_col,
            cluster.alias("cluster_id"),
            (cluster == F.col(id_col)).alias("keep"),
        )
    sym = edges.unionByName(
        edges.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
    ).localCheckpoint(eager=False)
    labels = sym.select(F.col("_a").alias("_id")).dropDuplicates().withColumn(
        "_label", F.col("_id")
    ).localCheckpoint(eager=False)
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["_b"] == labels["_id"])
            .groupBy("_a").agg(F.min("_label").alias("_nl"))
        )
        new = (
            labels.join(neigh, labels["_id"] == neigh["_a"], "left")
            .select(
                labels["_id"],
                F.least(labels["_label"], F.coalesce(F.col("_nl"), labels["_label"])).alias("_label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new.withColumnRenamed("_label", "_new")
            .join(labels, "_id")
            .filter(F.col("_new") != F.col("_label"))
        )
        labels = new
        if changed.isEmpty():
            break
    out = df.select(id_col).join(
        labels.select(F.col("_id").alias(id_col), "_label"), id_col, "left"
    )
    cluster = F.coalesce(F.col("_label"), F.col(id_col))
    return out.select(
        id_col,
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("keep"),
    )


def cluster_survivors(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    score,
    clusters: DataFrame | None = None,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Quality-ranked survivor selection per near-duplicate cluster.

    :func:`neardup_clusters`'s canonical keep (min id) is arbitrary:
    among near-duplicates, production pipelines keep the BEST copy — the
    longest, the cleanest, the highest-classifier-score one — because
    near-dup variants differ exactly in boilerplate, truncation, and
    OCR noise. This ranks every document within its cluster by
    ``score`` descending (``id_col`` ascending as the deterministic
    tiebreak) and returns ``(id, cluster_id, rk)``; the survivors are
    ``rk = 1``, but the full ranking is returned so a pipeline can also
    keep top-m per cluster or audit what it dropped.

    ``score`` is a Column (or column name) over ``df`` — e.g.
    ``F.round("quality_score", 6)``. Round float scores before ranking:
    a 1-ulp cross-engine drift flips ranks (see the ordering discipline
    in PERF.md). ``clusters`` is the ``(id, cluster_id)`` relation from
    :func:`neardup_clusters`; pass it in to reuse pair generation across
    pipeline stages (computed from ``df`` at ``threshold`` otherwise).

    Scale shape: one join against the cluster relation (tiny next to
    the corpus — only docs in some pair carry a label) and one
    window keyed by ``cluster_id``. Cluster sizes are duplicate
    multiplicities — bounded small in practice, and a pathological
    mega-cluster is itself bounded by ``max_bucket_size`` upstream —
    so the per-cluster sort never concentrates the corpus.
    """
    if clusters is None:
        clusters = neardup_clusters(df, id_col, text_col, threshold=threshold)
    s = F.col(score) if isinstance(score, str) else score
    labeled = df.select(F.col(id_col), s.alias("_score")).join(
        clusters.select(id_col, "cluster_id"), id_col
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_score").desc(), F.col(id_col)
    )
    return labeled.select(
        id_col,
        "cluster_id",
        F.row_number().over(w).cast("long").alias("rk"),
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    hashed: bool = True,
) -> DataFrame:
    """Duplicated-span removal (ExactSubstr, Lee et al. 2022,
    arXiv:2107.06499): any ``k``-token span that occurs ``min_count``-or-
    more times corpus-wide is removed everywhere except its first
    occurrence (ordered by ``(doc_id, pos)``), and the surviving tokens
    are re-joined per document.

    The reference has no counterpart (net-new training-data surface);
    semantics follow the paper's suffix-array dedup, re-expressed as a
    Spark aggregation instead of a suffix array:

    1. one row per span start — linear in corpus tokens, produced by
       ``transform(sequence(...))`` + ``explode`` inside the scan stage;
    2. ``groupBy(span)`` with map-side partial aggregation computes each
       span's occurrence count and first occurrence — the ONLY full
       shuffle, keyed as finely as the semantics allow. With
       ``hashed=True`` (default) the shuffle key is ``xxhash64(span)``
       (8 bytes instead of ~6x``k`` span text; 2^-64 collision odds);
    3. occurrences of duplicated spans join back (hash equi-join; a
       hyper-frequent span is an AQE skew-join case, not a plan change);
    4. per-doc interval union + residual text are in-row array ops.

    ``id_col`` must be orderable; the first-occurrence order key is the
    lexicographic ``struct(doc_id, pos)`` (MIN over structs), so any id
    range / document length is safe — no packed-int64 overflow class.

    Returns one row per input document: ``(id_col, n_tokens,
    n_dup_spans, n_removed, dup_bps, kept_fp)`` where ``n_dup_spans``
    counts removed span occurrences, ``n_removed`` counts removed tokens,
    ``dup_bps`` is basis points of the document removed (integer math:
    ``(10000*n_removed) div n_tokens`` — exact in every engine), and
    ``kept_fp = md5(' '-joined surviving tokens)``.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    spans = F.expr(
        f"transform(CASE WHEN _n >= {k} THEN sequence(0, _n - {k}) "
        "ELSE CAST(array() AS ARRAY<INT>) END, "
        f"i -> struct(i AS pos, concat_ws(' ', slice(_toks, i + 1, {k})) AS span))"
    )
    occ = base.select("_id", F.explode(spans).alias("_sp")).select(
        "_id", F.col("_sp.pos").alias("_pos"),
        (F.xxhash64("_sp.span") if hashed else F.col("_sp.span")).alias("_key"),
    )
    ordk = F.struct(F.col("_id"), F.col("_pos")).alias("_ord")
    occ = occ.select("_id", "_pos", "_key", ordk)
    dups = (
        occ.groupBy("_key")
        .agg(F.min("_ord").alias("_first"), F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_key", "_first")
    )
    rem = occ.join(dups, "_key").filter(F.col("_ord") != F.col("_first")).select(
        "_id", "_pos"
    )
    per_doc = rem.groupBy("_id").agg(
        F.sort_array(F.collect_list("_pos")).alias("_starts"),
        F.count("*").alias("n_dup_spans"),
    )
    out = base.join(per_doc, "_id", "left")
    covered = F.expr(
        f"array_distinct(flatten(transform(_starts, s -> sequence(s, s + {k - 1}))))"
    )
    kept_idx = F.expr(
        f"array_except(sequence(0, _n - 1), "
        f"array_distinct(flatten(transform(_starts, s -> sequence(s, s + {k - 1})))))"
    )
    kept_text = F.expr(
        f"concat_ws(' ', transform(array_except(sequence(0, _n - 1), "
        f"array_distinct(flatten(transform(_starts, s -> sequence(s, s + {k - 1}))))), "
        "i -> element_at(_toks, i + 1)))"
    )
    has = F.col("_starts").isNotNull()
    n_removed = F.when(has, F.size(covered)).otherwise(F.lit(0)).cast("long")
    return (
        out.withColumn("n_removed", n_removed)
        .withColumn(
            "kept_fp",
            F.md5(F.when(has, kept_text).otherwise(F.concat_ws(" ", "_toks"))),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.col("n_removed"),
            F.expr("(10000 * n_removed) div _n").cast("long").alias("dup_bps"),
            F.col("kept_fp"),
        )
    )


def exact_substring_dedup_against(
    new_df: DataFrame,
    corpus_df: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hashed: bool = True,
    corpus_spans: DataFrame | None = None,
) -> DataFrame:
    """Incremental ExactSubstr: scrub a NEW batch against an already-
    accepted corpus — the batch-vs-corpus member of the incremental
    dedup family (exact: :func:`dedup_against`; near-dup:
    :func:`minhash_lsh_pairs_between`).

    A batch span occurrence is removed iff its ``k``-token span occurs
    ANYWHERE in the corpus (the corpus was accepted first, so it always
    wins) OR earlier within the batch itself (the same first-occurrence
    rule as :func:`exact_substring_dedup`). Corpus documents are never
    modified.

    Scale shape: the corpus side reduces to its DISTINCT span-hash set
    (map-side-combined aggregate — 8 bytes per distinct span, the
    "fingerprints not text" store pattern); batch occurrences equi-join
    against it. Batch-internal duplication reuses the same aggregate
    formulation as the batch operator. Same output schema as
    :func:`exact_substring_dedup`, restricted to batch documents.

    Pass ``corpus_spans`` (a one-column ``_key`` relation of distinct
    span hashes) instead of ``corpus_df`` to probe a PERSISTED span
    store directly — the streaming ingest shape, where the store is
    appended batch by batch and the corpus text is never re-read.
    """
    if (corpus_df is None) == (corpus_spans is None):
        raise ValueError("pass exactly one of corpus_df / corpus_spans")

    def occ_of(df):
        toks = tokens(text_col)
        base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks")).withColumn(
            "_n", F.size("_toks")
        )
        spans = F.expr(
            f"transform(CASE WHEN _n >= {k} THEN sequence(0, _n - {k}) "
            "ELSE CAST(array() AS ARRAY<INT>) END, "
            f"i -> struct(i AS pos, concat_ws(' ', slice(_toks, i + 1, {k})) AS span))"
        )
        occ = base.select("_id", F.explode(spans).alias("_sp")).select(
            "_id", F.col("_sp.pos").alias("_pos"),
            (F.xxhash64("_sp.span") if hashed else F.col("_sp.span")).alias("_key"),
        )
        return base, occ.withColumn(
            "_ord", F.struct(F.col("_id"), F.col("_pos"))
        )

    base, occ = occ_of(new_df)
    if corpus_spans is None:
        corpus_spans = occ_of(corpus_df)[1].select("_key").distinct()
    else:
        corpus_spans = corpus_spans.select("_key").distinct()
    # batch-internal duplicated spans (first batch occurrence survives
    # unless the corpus also has the span)
    internal = (
        occ.groupBy("_key")
        .agg(F.min("_ord").alias("_first"), F.count("*").alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("_key", "_first")
    )
    vs_corpus = occ.join(corpus_spans, "_key").select("_id", "_pos")
    vs_batch = occ.join(internal, "_key").filter(
        F.col("_ord") != F.col("_first")
    ).select("_id", "_pos")
    rem = vs_corpus.unionByName(vs_batch).distinct()
    per_doc = rem.groupBy("_id").agg(
        F.sort_array(F.collect_list("_pos")).alias("_starts"),
        F.count("*").alias("n_dup_spans"),
    )
    out = base.join(per_doc, "_id", "left")
    covered = F.expr(
        f"array_distinct(flatten(transform(_starts, s -> sequence(s, s + {k - 1}))))"
    )
    kept_idx = F.expr(
        f"array_except(sequence(0, _n - 1), "
        f"array_distinct(flatten(transform(_starts, s -> sequence(s, s + {k - 1})))))"
    )
    kept_text = F.expr(
        f"concat_ws(' ', transform(array_except(sequence(0, _n - 1), "
        f"array_distinct(flatten(transform(_starts, s -> sequence(s, s + {k - 1}))))), "
        "i -> element_at(_toks, i + 1)))"
    )
    has = F.col("_starts").isNotNull()
    n_removed = F.when(has, F.size(covered)).otherwise(F.lit(0)).cast("long")
    return (
        out.withColumn("n_removed", n_removed)
        .withColumn(
            "kept_fp",
            F.md5(F.when(has, kept_text).otherwise(F.concat_ws(" ", "_toks"))),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.col("n_removed"),
            F.expr("(10000 * n_removed) div _n").cast("long").alias("dup_bps"),
            F.col("kept_fp"),
        )
    )


def span_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hashed: bool = True,
) -> DataFrame:
    """The distinct ``k``-token span keys of a document set, as the
    one-column ``_key`` relation :func:`exact_substring_dedup_against`
    probes — what a streaming ingest appends to its span store per
    batch (8 bytes per distinct span with ``hashed=True``)."""
    toks = tokens(text_col)
    base = df.select(toks.alias("_toks")).withColumn("_n", F.size("_toks"))
    spans = F.explode(
        F.expr(
            f"transform(CASE WHEN _n >= {k} THEN sequence(0, _n - {k}) "
            "ELSE CAST(array() AS ARRAY<INT>) END, "
            f"i -> concat_ws(' ', slice(_toks, i + 1, {k})))"
        )
    ).alias("_span")
    occ = base.select(spans)
    key = F.xxhash64("_span") if hashed else F.col("_span")
    return occ.select(key.alias("_key")).distinct()
