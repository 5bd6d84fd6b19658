"""Text analysis operators for large-scale training-data pipelines.

Net-new surface beyond the reference (which has no text analytics):
token counting, quality scoring, language-ID heuristics, document
fingerprinting, and shingling. Everything is built from JVM-side
``pyspark.sql.functions`` (regexp/md5/array lambdas) so the hot path
stays inside whole-stage codegen — no Python per row. All primitives
are deliberately *portable* (md5, regexp, arithmetic) so a DuckDB
oracle can recompute them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokens", "tokens_bpe", "BPE_SPLIT_REGEX",
    "shingles", "shingles_of_tokens", "with_shingle_rows",
    "token_stats", "quality_score", "lang_id",
    "fingerprint", "STOPWORDS", "LANG_MARKERS",
    "pii_stats", "decontaminate", "PII_PATTERNS",
    "repetition_stats", "REPETITION_THRESHOLDS",
    "char_entropy", "chunk_by_tokens", "remove_boilerplate_lines",
    "tfidf_topk", "winnow_fingerprints",
    "ngram_lm_train", "ngram_lm_score",
    "hashed_classifier_score", "bloom_decontaminate", "build_bloom_bitmap",
    "bpe_train", "bpe_apply", "bpe_apply_arrow",
    "gopher_rules", "GOPHER_REQUIRED_WORDS",
    "normalize_text", "line_dedup_across_docs", "vocab_coverage",
    "dsir_importance",
]

# Tiny deterministic marker lists (the heuristic, not a model).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "nicht"),
    "es": ("el", "los", "que", "por"),
    "fr": ("le", "les", "est", "pas"),
}


def tokens(text: str | Column = "text") -> Column:
    """Whitespace tokenization: ``split(trim(text), '\\s+')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def _tokens_sql(col: str) -> str:
    """SQL text of :func:`tokens` over a column name."""
    return f"split(trim({col}), '\\\\s+')"


def lit_long_array(values) -> Column:
    """BIGINT array literal built as ONE SQL expression.

    ``F.array(*[F.lit(int(v)).cast("long") for v in values])`` costs
    three py4j round-trips per element — measured 2.36 s of pure driver
    time for a 1024-entry weight array, paid on EVERY query build
    (guide §4 boundary-cost discipline applied to the driver side). The
    SQL parser handles the same array literal in one call, in
    milliseconds, and the resulting plan is identical after constant
    folding."""
    return F.expr(_long_array_sql(values))


def _long_array_sql(values) -> str:
    """SQL text of the BIGINT array literal (see :func:`lit_long_array`)."""
    vals = list(values)
    if not vals:
        return "CAST(array() AS ARRAY<BIGINT>)"
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


# GPT-2-style pre-tokenizer pattern: contractions, space-prefixed letter
# runs, digit runs, punctuation runs. Restricted to RE2-compatible syntax
# (no lookahead) so the DuckDB oracle replays the matches bit-for-bit;
# both engines' \p{L}/\p{N} classes are Unicode.
BPE_SPLIT_REGEX = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def tokens_bpe(text: str | Column = "text") -> Column:
    """BPE-ish pre-tokenization (the GPT-2 split rule): the token count
    that tracks what an LLM tokenizer would produce far better than
    whitespace words — punctuation and contractions count, long words
    still count once. In-row ``regexp_extract_all``: zero shuffle,
    computed inside the scan stage."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_REGEX), 0)


def shingles(text: str | Column = "text", n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (input to MinHash/jaccard).

    ``transform(sequence(...))`` keeps shingling a single distributed
    expression — a 100 TB corpus shingles inside the scan stage with no
    shuffle and no Python.

    NOTE: an expression embedded in a higher-order-function lambda is
    re-evaluated per array element, so the regex ``split`` here would run
    once per *shingle*, not per row (measured 7x slower). Hot paths
    should materialize the token array as a column first and call
    :func:`shingles_of_tokens` — see ``with_shingle_rows``.
    """
    return shingles_of_tokens(tokens(text), n)


def _shingles_sql(toks_sql: str, n: int) -> str:
    """SQL text of :func:`shingles_of_tokens` over a token-array SQL
    expression. Single-parse discipline: the python lambda builders for
    this transform cost ~60 py4j round-trips (~100 ms of driver wall
    per call site on this host, paid on EVERY query build); the parsed
    string costs ~3 (guide §1.2 applied to the driver boundary)."""
    cnt = f"size({toks_sql}) - {n - 1}"
    return (
        f"transform(CASE WHEN {cnt} >= 1 THEN sequence(1, {cnt}) "
        "ELSE CAST(array() AS ARRAY<INT>) END, "
        f"i -> concat_ws(' ', slice({toks_sql}, i, {n})))"
    )


def shingles_of_tokens(toks: Column | str, n: int = 3) -> Column:
    """Shingles over an already-computed token array column. Pass the
    COLUMN NAME (not a Column) on hot build paths — the string form
    parses as one SQL expression instead of per-node py4j calls."""
    if isinstance(toks, str):
        return F.expr(_shingles_sql(toks, n))
    cnt = F.size(toks) - (n - 1)
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def with_shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int, out: str = "_s") -> DataFrame:
    """(id, shingle) exploded rows, tokenizing each row exactly once: the
    token array is bound to a projected column so codegen evaluates the
    split once per row instead of once per lambda element."""
    return (
        df.withColumn("_toks", tokens(text_col))
        .select(id_col, F.explode(shingles_of_tokens("_toks", n)).alias(out))
    )


def with_distinct_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, _sharr) with the *distinct* shingle array per document.

    Deduplication happens inside the row (``array_distinct``), entirely
    within the scan stage — unlike ``dropDuplicates([id, shingle])`` on
    exploded rows, which costs a full shuffle of every (doc, shingle)
    pair. Per-doc set sizes are then ``size(_sharr)`` with zero shuffle.
    """
    return df.selectExpr(id_col, f"{_tokens_sql(text_col)} AS _toks").selectExpr(
        id_col, f"array_distinct({_shingles_sql('_toks', n)}) AS _sharr"
    )


def token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Adds n_tokens / n_punct / alpha_len columns."""
    toks = tokens(text)
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn(
            "n_punct", F.length(F.regexp_replace(F.col(text), r"[^.,!?;:]", "")).cast("long")
        )
        .withColumn(
            "alpha_len", F.length(F.regexp_replace(F.col(text), r"\s", "")).cast("long")
        )
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Deterministic heuristic quality features + combined score.

    stopword_ratio = stopword tokens / tokens; avg_token_len =
    non-space chars / tokens; score mixes both with a length prior.
    """
    toks = tokens(text)
    n = F.size(toks)
    stop_sql = "array(" + ",".join(f"'{s}'" for s in STOPWORDS) + ")"
    n_stop = F.expr(
        f"size(filter({_tokens_sql(text)}, t -> array_contains({stop_sql}, t)))"
    )
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    avg_len = F.when(
        n > 0, F.length(F.regexp_replace(F.col(text), r"\s", "")) / n
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_tokens", n.cast("long"))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("avg_token_len", F.round(avg_len, 6))
        .withColumn(
            "quality_score",
            F.round(stop_ratio * 0.5 + F.least(n, F.lit(200)) / 400.0, 6),
        )
    )


def lang_id(df: DataFrame, text: str = "text", out: str = "lang_pred") -> DataFrame:
    """N-gram/marker-word language heuristic: CJK chars -> zh, else the
    language whose marker words occur most (ties broken en>de>es>fr),
    else 'und'. A heuristic by design — the oracle replays the same rule."""
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr_sql = "array(" + ",".join(f"'{m}'" for m in markers) + ")"
        scores[lang] = F.expr(
            f"size(filter({_tokens_sql(text)}, t -> array_contains({arr_sql}, t)))"
        )
    best = F.greatest(*scores.values())
    pred = F.when(F.col(text).rlike(r"[一-鿿]"), F.lit("zh"))
    for lang in ("en", "de", "es", "fr"):  # priority order on ties
        pred = pred.when((best > 0) & (scores[lang] == best), F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    return df.withColumn(out, pred)


def fingerprint(df: DataFrame, text: str = "text", out: str = "fp") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lowercase,
    whitespace collapsed). Byte-identical across engines."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def winnow_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    out: str = "wfp",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    algorithm): rolling k-gram hashes with the minimum of each
    w-hash window selected, distinct per document. Robust local
    fingerprints — two documents sharing any sufficiently long run of
    tokens are guaranteed to share a fingerprint, which plain whole-doc
    hashing (:func:`fingerprint`) cannot promise — the standard
    primitive for partial-overlap / plagiarism-style detection.

    Entirely in-row: the token k-gram hash array, the window minima
    (``transform`` over window starts + ``array_min(slice(...))``), and
    the distinct-set collapse all run inside the scan stage; the only
    rows that leave are the (id, fingerprint) pairs after the explode.
    Documents shorter than k tokens produce no fingerprints.
    """
    from pygrametl_spark.functions.dedup import hash32_spark_sql

    # The hash array MUST be bound to a projected column before the
    # window transform: expressions referenced inside a HOF lambda are
    # re-evaluated per element (no loop-invariant hoisting), so an
    # inlined hash array would recompute every gram's md5 once per
    # window — measured 12.9 s vs 0.8 s at sf0.1. A multi-referenced
    # non-cheap column stops CollapseProject from inlining it.
    base = df.select(
        id_col,
        F.expr(
            f"transform({_shingles_sql(_tokens_sql(text_col), k)}, "
            f"g -> {hash32_spark_sql('g')})"
        ).alias("_harr"),
    )
    harr = F.col("_harr")
    n = F.size(harr)
    mins = F.when(
        n < w,
        F.when(n >= 1, F.array(F.array_min(harr))).otherwise(
            F.array().cast("array<bigint>")
        ),
    ).otherwise(
        F.expr(
            f"transform(sequence(0, size(_harr) - {w}), "
            f"i -> array_min(slice(_harr, i + 1, {w})))"
        )
    )
    return base.select(
        id_col, F.explode(F.array_distinct(mins)).alias(out)
    )


def chunk_by_tokens(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding token-window chunking — the splitting step every
    training/RAG pipeline runs before tokenization or embedding.

    Chunk *i* covers tokens ``[i*stride, i*stride + size)`` with
    ``stride = size - overlap``; the last chunk is the first whose end
    reaches the document's end (so coverage is total, consecutive
    chunks share ``overlap`` tokens, and no tail chunk is fully
    contained in its predecessor).

    Entirely in-row (``sequence`` -> ``transform`` -> ``explode``): a
    100 TB corpus chunks inside the scan stage with no shuffle and no
    Python. Emits ``chunk_fp`` (md5) instead of the chunk text so
    downstream exact-dedup of chunks needs only the 32-byte digest;
    callers needing the text can re-slice or drop the md5.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    # token array bound to a column first: referenced inside the chunk
    # lambda, the regex split would re-run once per chunk — quadratic in
    # document length for long documents (see winnow_fingerprints).
    base = df.select(id_col, tokens(text).alias("_toks"))
    chunks = F.expr(
        f"transform(sequence(0, CASE WHEN size(_toks) <= {size} THEN 0 "
        f"ELSE CEIL((size(_toks) - {size}) / {stride}) END), "
        f"i -> struct(CAST(i AS BIGINT) AS chunk_id, "
        f"CAST(least({size}, size(_toks) - i * {stride}) AS BIGINT) AS n_chunk_tokens, "
        f"md5(array_join(slice(_toks, i * {stride} + 1, {size}), ' ')) AS chunk_fp))"
    )
    return (
        base.select(id_col, F.explode(chunks).alias("_c"))
        .select(id_col, "_c.chunk_id", "_c.n_chunk_tokens", "_c.chunk_fp")
    )


# Gopher-style repetition thresholds (Rae et al. 2021, table A1,
# adapted): fraction of non-space characters covered by the single most
# frequent word n-gram, and the fraction of 5-gram instances whose
# 5-gram occurs more than once. Documents over ANY threshold are flagged
# `repetitive` — boilerplate / keyword-stuffed pages a training corpus
# should drop.
REPETITION_THRESHOLDS = {"top2": 0.20, "top3": 0.18, "top4": 0.16, "dup5": 0.15}


def _run_scan(sorted_arr_sql: str) -> Column:
    """One in-row fold over a SORTED string array returning
    ``struct(cnt, best, dup)``: the highest run length (= mode count),
    the mode itself (ties -> lexicographically smallest, which sorted
    order + strict ``>`` gives for free), and the number of elements
    belonging to runs longer than 1 (= duplicate instances).

    This is the zero-shuffle alternative to exploding n-grams into a
    ``groupBy(doc, ngram)``: per-document work is one ``array_sort`` +
    one linear ``aggregate`` pass inside the scan stage, so a 100 TB
    corpus computes repetition features without moving a single row.

    Takes the array's SQL text and emits ONE parsed expression — the
    former python struct-fold builders cost ~250 py4j round-trips per
    call (~1 s of driver wall across repetition_stats' four scans,
    measured r9). The repeated sub-expressions below mirror the repeated
    Column references of the python version exactly.
    """
    return F.expr(_run_scan_sql(sorted_arr_sql))


def _run_scan_sql(sorted_arr_sql: str) -> str:
    """SQL text of :func:`_run_scan` (for embedding in larger exprs)."""
    run = "CASE WHEN acc.prev <=> x THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END"
    dup = (
        "CASE WHEN (NOT (acc.prev <=> x)) AND (acc.run > 1) "
        "THEN acc.dup + acc.run ELSE acc.dup END"
    )
    better = f"({run}) > acc.cnt"
    return (
        f"aggregate({sorted_arr_sql}, "
        "struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS run, "
        "CAST(0 AS BIGINT) AS cnt, CAST(NULL AS STRING) AS best, "
        "CAST(0 AS BIGINT) AS dup), "
        "(acc, x) -> struct("
        "x AS prev, "
        f"{run} AS run, "
        f"CASE WHEN {better} THEN {run} ELSE acc.cnt END AS cnt, "
        f"CASE WHEN {better} THEN x ELSE acc.best END AS best, "
        f"{dup} AS dup), "
        "acc -> struct(acc.cnt AS cnt, acc.best AS best, "
        "CASE WHEN acc.run > 1 THEN acc.dup + acc.run ELSE acc.dup END AS dup))"
    )


def repetition_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition features (Gopher repetition rules).

    Per document: ``top{2,3,4}_frac`` = (occurrences of the most
    frequent word n-gram x its non-space character length) / non-space
    characters of the document; ``dup5_frac`` = fraction of 5-gram
    instances whose 5-gram appears more than once; ``repetitive`` =
    any fraction over its :data:`REPETITION_THRESHOLDS` entry.

    Everything is computed in-row (:func:`_run_scan`) — no explode, no
    shuffle; ties on the mode go to the lexicographically smallest
    n-gram so the DuckDB oracle can replay the choice exactly.
    """
    toks = tokens(text)
    base = df.select(
        id_col,
        F.col(text),
        toks.alias("_toks"),
        F.length(F.regexp_replace(F.col(text), r"\s", "")).cast("long").alias("_alpha"),
    )
    cols = [F.col(id_col)]
    flags = []
    for n in (2, 3, 4):
        sh = _shingles_sql("_toks", n)
        scan = f"({_run_scan_sql(f'array_sort({sh})')})"
        # a mode occurring once is not repetition (otherwise every short
        # document gets ngram_len/doc_len as a phantom fraction)
        frac = F.expr(
            f"CASE WHEN (_alpha > 0) AND ({scan}.cnt > 1) THEN "
            f"round({scan}.cnt * length(replace({scan}.best, ' ', '')) "
            "/ _alpha, 6) ELSE 0.0D END"
        )
        cols.append(frac.alias(f"top{n}_frac"))
        flags.append(F.col(f"top{n}_frac") > REPETITION_THRESHOLDS[f"top{n}"])
    five = _shingles_sql("_toks", 5)
    scan5 = f"({_run_scan_sql(f'array_sort({five})')})"
    dup5 = F.expr(
        f"CASE WHEN size({five}) > 0 THEN "
        f"round({scan5}.dup / size({five}), 6) ELSE 0.0D END"
    )
    cols.append(dup5.alias("dup5_frac"))
    flags.append(F.col("dup5_frac") > REPETITION_THRESHOLDS["dup5"])
    out = base.select(*cols)
    flag = flags[0]
    for f in flags[1:]:
        flag = flag | f
    return out.withColumn("repetitive", flag)


# PII surface patterns. Deliberately restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
# character classes, bounded repetition, \b, non-overlapping counting.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ip": r"\b(\d{1,3}\.)\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII surface counts (emails, URLs, IPv4 literals).

    Standard corpus-curation gate before training-data release. Pure
    ``regexp_count`` expressions — JVM-side, inside the scan stage, no
    shuffle and no Python at any scale; route docs with ``has_pii`` to a
    scrub/redact pass."""
    c = F.col(text)
    n_emails = F.regexp_count(c, F.lit(PII_PATTERNS["email"])).cast("long")
    n_urls = F.regexp_count(c, F.lit(PII_PATTERNS["url"])).cast("long")
    n_ips = F.regexp_count(c, F.lit(PII_PATTERNS["ip"])).cast("long")
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        n_ips.alias("n_ips"),
        ((n_emails + n_urls + n_ips) > 0).alias("has_pii"),
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    n-token shingle with a held-out evaluation set.

    The training-data hygiene step every large pretraining corpus needs
    (n-gram overlap against eval benchmarks). Scale shape: eval sets
    are small by nature, so their distinct shingles BROADCAST; the
    corpus is scanned once, shingled in-row, exploded, hash-joined
    against the broadcast set, and collapsed to one boolean per doc —
    the corpus is never shuffled by anything wider than its hit set.
    Returns (id, contaminated)."""
    bench = (
        with_shingle_rows(benchmark, id_col, text_col, n)
        .select("_s")
        .distinct()
    )
    hits = (
        with_shingle_rows(df, id_col, text_col, n)
        .join(F.broadcast(bench), "_s")
        .select(id_col)
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(id_col, F.coalesce("_hit", F.lit(False)).alias("contaminated"))
    )


def tfidf_topk(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` distinctive terms per document by TF-IDF
    (``tf * ln(N/df)``) — the classic corpus-analysis primitive for
    keyword extraction and topic labeling. Returns
    (id, rank, term, tfidf), ties broken by term.

    Scale shape: the exploded (doc, token) relation is collapsed by
    map-side partial aggregation BEFORE each exchange, so the shuffles
    carry distinct (doc, term) pairs, not token occurrences; document
    frequencies ride the same relation; N arrives as one broadcast row
    (no driver action). The per-doc top-k is an in-row
    ``slice(array_sort(...))`` inside the final groupBy — no extra
    window shuffle over the corpus.
    """
    from pyspark.sql import Window

    tok = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("_t"))
    tf = tok.groupBy(id_col, "_t").agg(F.count("*").alias("_tf"))
    # document frequency as an unordered window over the tf relation:
    # one exchange by term REPLACES the former groupBy(term) aggregate +
    # equi-join back (two exchanges of the distinct-pair relation and a
    # join build — measured r9: 4 Exchange -> 3, part count 1.63 s ->
    # see OPTIMIZATION_r09.md). Identical _df values by construction.
    n = df.agg(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.withColumn("_df", F.count("*").over(Window.partitionBy("_t")))
        .crossJoin(F.broadcast(n))
        .withColumn("_s", F.round(F.col("_tf") * F.log(F.col("_n") / F.col("_df")), 6))
    )
    topk = scored.groupBy(id_col).agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct((-F.col("_s")).alias("_neg"), F.col("_t"), F.col("_s")))),
            1, k,
        ).alias("_top")
    )
    return topk.select(
        id_col, F.posexplode("_top").alias("_i", "_e")
    ).select(
        id_col,
        (F.col("_i") + 1).cast("long").alias("rank"),
        F.col("_e._t").alias("term"),
        F.col("_e._s").alias("tfidf"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    out: str = "clean_text",
) -> DataFrame:
    """Corpus-frequency line filtering (the C4/RefinedWeb boilerplate
    rule): drop every line whose trimmed content occurs in at least
    ``min_docs`` DISTINCT documents — cookie banners, nav menus, license
    footers — and rebuild each document from its surviving lines in
    order. Blank lines are never counted as boilerplate (structure is
    preserved). Returns (id, n_lines, n_dropped, clean_text).

    Scale shape: two corpus-wide exchanges, both unavoidable for the
    semantics — the per-line distinct-document count (one row per
    non-blank line; map-side partial aggregation collapses within-doc
    repeats of a line before the shuffle), and the per-document
    reassembly groupBy. The boilerplate line set itself is tiny relative
    to the line vocabulary (only lines shared by >= min_docs documents),
    so AQE turns the anti-join into a broadcast at runtime; nothing
    corpus-sized is ever broadcast by construction.
    """
    lines = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line")
    )
    boiler = (
        lines.filter(F.length(F.trim("_line")) > 0)
        .groupBy(F.trim("_line").alias("_bt"))
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_bt")
    )
    kept = lines.join(boiler, F.trim(F.col("_line")) == F.col("_bt"), "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.expr(
                'transform(array_sort(collect_list(struct(_pos, _line))), s -> s._line)'
            ),
            "\n",
        ).alias("_clean"),
        F.count("*").alias("_kept"),
    )
    totals = df.select(
        id_col, F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines")
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        (F.col("n_lines") - F.coalesce("_kept", F.lit(0))).cast("long").alias("n_dropped"),
        F.coalesce("_clean", F.lit("")).alias(out),
    )


def char_entropy(
    df: DataFrame,
    text: str = "text",
    out: str = "char_entropy",
) -> DataFrame:
    """Shannon entropy of the character distribution, bits per char.

    A cheap perplexity proxy for corpus quality filtering: natural text
    sits around 4-4.5 bits/char; binary-ish noise saturates toward
    log2(alphabet), and "aaaa..." spam collapses toward 0 — both tails
    are what a pretraining filter drops.

    Entirely in-row (zero shuffle, computed inside the scan stage):
    characters are enumerated with a substring transform, the distinct
    set is SORTED so the floating-point accumulation order is
    deterministic across engines/partitions, and each character's count
    comes from a length-difference (`len(text) - len(replace(text, c))`)
    instead of an explode+groupBy that would shuffle one row per char.
    Alphabet sizes are small (<=256 for real text), so the in-row
    O(alphabet * len) scan beats a corpus-wide exchange by orders of
    magnitude at 100 TB. Empty text gets entropy 0.
    """
    frac = (
        f"(CAST(length({text}) - length(replace({text}, c)) AS DOUBLE) "
        f"/ CAST(length({text}) AS DOUBLE))"
    )
    ent = F.expr(
        f"aggregate(array_sort(array_distinct(transform(sequence(1, length({text})), "
        f"i -> substring({text}, i, 1)))), CAST(0.0 AS DOUBLE), "
        f"(acc, c) -> acc - {frac} * log2({frac}))"
    )
    # + 0.0 collapses IEEE -0.0 (a one-char doc yields -1*log2(1) = -0.0)
    # to 0.0 so value hashes agree across engines.
    return df.withColumn(
        out,
        F.round(F.when(F.length(text) > 0, ent).otherwise(F.lit(0.0)), 6) + F.lit(0.0),
    )


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair. The token array
    is bound to a column FIRST (HOF-lambda binding discipline: an
    inlined split would re-run per bigram), and pairs are built in-row
    before the explode, so the only shuffle-bound relation is the
    bigram rows themselves."""
    staged = df.select(id_col, tokens(text_col).alias("_toks"))
    # arrays_zip over two slices instead of a per-element transform
    # lambda: same pairs, but slice/arrays_zip are non-lambda
    # expressions Spark codegens, where the lambda is interpreted per
    # bigram (measured ~10% on the bigram scan stage; values identical)
    pairs = F.expr(
        "CASE WHEN size(_toks) >= 2 THEN "
        "arrays_zip(slice(_toks, 1, size(_toks) - 1), slice(_toks, 2, size(_toks) - 1)) "
        "ELSE CAST(array() AS ARRAY<STRUCT<`0`: STRING, `1`: STRING>>) END"
    )
    return staged.select(id_col, F.explode(pairs).alias("_bg")).select(
        id_col, F.col("_bg.0").alias("w1"), F.col("_bg.1").alias("w2")
    )


def ngram_lm_train(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus bigram language model: (w1, w2, c2, c1) where ``c2`` is
    the bigram count and ``c1`` the context count (bigrams starting with
    ``w1``), so ``c2/c1`` is a proper conditional P(w2|w1). Both counts
    collapse map-side before their exchange — the shuffles carry
    distinct n-grams, never token occurrences."""
    bi = _bigram_rows(df, id_col, text_col)
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return c2.join(c1, "w1")


def ngram_lm_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
    floor: float = 1e-6,
    broadcast_model: bool = False,
) -> DataFrame:
    """CCNet-style LM quality score (Wenzek et al. 2020,
    arXiv:1911.00359): per-document mean negative log-probability under
    a bigram model — the perplexity proxy used to rank web text by
    naturalness (low = fluent, high = gibberish/boilerplate-shredded).
    Returns (id, n_bigrams, lm_score); documents with <2 tokens score
    NULL.

    ``model=None`` self-trains on the corpus (every bigram is then
    in-vocabulary); pass :func:`ngram_lm_train` output from a reference
    corpus to score NEW text against it, with unseen bigrams backing
    off to ``floor``. ``broadcast_model=True`` broadcasts the model to
    turn the probability lookup into a map-side join — the right call
    when the reference model is vocabulary-bounded while the scored
    corpus is 100 TB (the default shuffle join is for self-training,
    where the model is corpus-sized; AQE's skew handling covers hot
    function-word bigrams). Per-bigram neg-log-probs are rounded to 6
    before the mean and the mean to 4, keeping the value replayable
    across engines (same discipline as tfidf/entropy).

    Plan shape: everything derives from ONE per-document term-frequency
    relation (doc, w1, w2, tf) — far smaller than raw bigram
    occurrences — and in self-train mode that relation is pinned with a
    lazy localCheckpoint so the corpus is scanned and exploded ONCE for
    both the model counts and the scoring join (verified: without the
    pin Spark plans two full scan+explode subtrees; no exchange reuse
    applies because the two aggregations shuffle on different keys)."""
    bi = _bigram_rows(df, id_col, text_col)
    tf = bi.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("_tf"))
    if model is not None:
        m = model
    else:
        tf = tf.localCheckpoint(eager=False)
        m = tf.groupBy("w1", "w2").agg(F.sum("_tf").alias("c2")).join(
            tf.groupBy("w1").agg(F.sum("_tf").alias("c1")), "w1"
        )
    m = m.select("w1", "w2", (F.col("c2") / F.col("c1")).alias("_p"))
    if broadcast_model:
        m = F.broadcast(m)
    # neg-log-prob in integer MICRO-nats: a double SUM's value depends
    # on accumulation order (observed flipping the 4th decimal for one
    # 677-bigram doc at sf0.1); integer sums are exact in any order, so
    # the score is bit-stable across engines, partitionings, and scales
    scored = tf.join(m, ["w1", "w2"], "left").withColumn(
        "_nlp_u",
        F.round(-F.log(F.coalesce(F.col("_p"), F.lit(float(floor)))) * 1e6, 0)
        .cast("bigint"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("_tf").alias("n_bigrams"),
            F.round(
                F.sum(F.col("_tf") * F.col("_nlp_u"))
                / (F.sum("_tf") * F.lit(1e6)),
                4,
            ).alias("lm_score"),
        )
        .join(df.select(id_col), id_col, "right")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_score",
        )
    )


def hashed_classifier_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    seed: str = "w",
    weights: "list[int] | None" = None,
) -> DataFrame:
    """fastText-style linear quality classifier over hashed bag-of-ngrams
    (Joulin et al. 2016, arXiv:1607.01759): each unigram + bigram hashes
    into one of ``dim`` buckets, the document score is the sum of the
    bucket weights, and the label is the score's sign.

    The model is the 100 TB-friendly quality-gate shape: a ``dim``-sized
    weight vector broadcast into the expression (an array literal when
    ``weights`` is given, a hash-derived pseudo-weight otherwise), with
    scoring fully in-row via ``aggregate`` over the feature array — zero
    shuffle, computed inside the scan stage, no Python on the hot path.

    Scoring is INTEGER-exact (weights are ints in [-1000, 1000], summed
    as BIGINT) so results are accumulation-order independent and
    bit-identical across engines — no float-rounding drift at any scale.

    ``weights=None`` derives weight ``(hash32(seed#bucket) % 2001) - 1000``
    per bucket — a deterministic stand-in for trained parameters with the
    exact production plan shape; pass the trained vector (``len == dim``)
    to deploy a real model.

    Returns ``(id_col, n_feats, score_units, label)``.
    """
    from pygrametl_spark.functions.dedup import hash32_spark_sql

    if weights is not None and len(weights) != dim:
        raise ValueError(f"weights must have len == dim ({dim}), got {len(weights)}")

    base = df.withColumn("_toks", tokens(text_col))
    feats = F.concat(
        F.col("_toks"), shingles_of_tokens("_toks", 2)
    ).alias("_feats")
    base = base.select(F.col(id_col), feats)

    bucket = f"pmod({hash32_spark_sql('f')}, {dim})"
    if weights is not None:
        w_of = (
            f"element_at({_long_array_sql(weights)}, "
            f"CAST({bucket} + 1 AS INT))"
        )
    else:
        h_in = f"concat('{seed}#', CAST({bucket} AS STRING))"
        w_of = f"pmod({hash32_spark_sql(h_in)}, 2001) - 1000"
    score = F.expr(
        f"aggregate(_feats, CAST(0 AS BIGINT), (acc, f) -> acc + ({w_of}))"
    )
    # bind the aggregate once: referencing `score` in two output columns
    # would evaluate the whole feature fold twice per row
    return base.select(
        F.col(id_col),
        F.size("_feats").cast("long").alias("n_feats"),
        score.alias("score_units"),
    ).withColumn("label", F.col("score_units") > 0)


# bitmap memo for repeated gating runs against the same eval set:
# keyed by the eval PLAN's semantic hash (Catalyst-normalized, stable
# across re-created identical DataFrames in a session) + the filter
# shape. Each entry is m/8 bytes (8 KB at the default m), so the cache
# is tiny; it lives on the driver only.
_BLOOM_CACHE: dict = {}


def build_bloom_bitmap(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    m: int = 65536,
    k_hashes: int = 3,
) -> list:
    """Build the ``m``-bit Bloom bitmap of the eval set's ``n``-token
    shingles as a list of ``m/64`` signed 64-bit words — the reusable
    artifact for repeated :func:`bloom_decontaminate` runs (pass it as
    ``bitmap=``). The collect is bounded by ``m`` distinct positions
    regardless of eval size."""
    if m % 64 != 0:
        raise ValueError("m must be a multiple of 64")
    from pygrametl_spark.functions.dedup import hash32

    ev = eval_df.withColumn("_toks", tokens(text_col)).select(
        F.explode(
            F.array_distinct(shingles_of_tokens("_toks", n))
        ).alias("_s")
    )
    pos_cols = [
        F.pmod(hash32(F.concat(F.col("_s"), F.lit(f"#{i}"))), F.lit(m))
        for i in range(k_hashes)
    ]
    positions = (
        ev.select(F.explode(F.array(*pos_cols)).alias("_p")).distinct().collect()
    )
    words = [0] * (m // 64)
    for r in positions:
        p = int(r["_p"])
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed 64-bit for the Spark long literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m: int = 65536,
    k_hashes: int = 3,
    bitmap: "list | None" = None,
    cache: bool = True,
) -> DataFrame:
    """Bloom-filter benchmark decontamination: flag corpus documents
    sharing any ``n``-token shingle with the eval set, probing an
    ``m``-bit Bloom filter (``k_hashes`` hash functions) instead of the
    exact shingle set.

    This is :func:`decontaminate`'s at-scale variant: broadcasting the
    raw eval shingle strings grows with the eval corpus, while the Bloom
    bitmap is a FIXED ``m/8`` bytes however large the eval set gets —
    the standard trade (a tunable false-positive rate, never a false
    negative). Both engines compute the same deterministic hash family,
    so the oracle reproduces the exact same false positives.

    Build: eval shingle -> ``k_hashes`` bit positions
    (``hash32(shingle + '#' + i) mod m``), DISTINCT, then collected —
    the collect is bounded by ``m`` positions regardless of eval size
    (the bitmap itself is the aggregate), so the driver step is
    scale-safe by construction. Probe: per-document distinct shingles
    test all their bits via in-row array lambdas over the broadcast
    bitmap literal — zero shuffle on the corpus side.

    Returns ``(id_col, n_flagged, contaminated)``.

    The eval-side bitmap build (a job + a bounded collect, ~0.4 s fixed
    cost) is amortized across repeated gating runs: pass a prebuilt
    ``bitmap`` (from :func:`build_bloom_bitmap`), or leave ``cache=True``
    and identical eval plans reuse the memoized bitmap (keyed by the
    eval DataFrame's Catalyst semantic hash — re-creating the same
    DataFrame from the same source still hits).
    """
    if m % 64 != 0:
        raise ValueError("m must be a multiple of 64")
    from pygrametl_spark.functions.dedup import hash32

    if bitmap is None:
        key = None
        if cache:
            try:
                key = (eval_df.semanticHash(), text_col, n, m, k_hashes)
            except Exception:  # noqa: BLE001 — hash unsupported: build fresh
                key = None
        if key is not None and key in _BLOOM_CACHE:
            bitmap = _BLOOM_CACHE[key]
        else:
            bitmap = build_bloom_bitmap(eval_df, text_col, n, m, k_hashes)
            if key is not None:
                _BLOOM_CACHE[key] = bitmap
    elif len(bitmap) != m // 64:
        raise ValueError(f"bitmap must have m/64 = {m // 64} words")
    words = bitmap
    from pygrametl_spark.functions.dedup import hash32_spark_sql

    # the bitmap literal is referenced INSIDE the lambda, never bound as
    # a projected column: a column binding would materialize m/8 bytes
    # into every corpus row's UnsafeRow (8 KB/row at the default m) —
    # as a bare literal, constant folding collapses it once per plan.
    probe = df.withColumn("_toks", tokens(text_col)).select(
        F.col(id_col),
        F.array_distinct(shingles_of_tokens("_toks", n)).alias("_sharr"),
    )

    h_in = "concat(s, '#', CAST(i AS STRING))"
    p = f"pmod({hash32_spark_sql(h_in)}, {m})"
    n_flagged = F.expr(
        f"CAST(size(filter(_sharr, s -> forall(sequence(0, {k_hashes - 1}), "
        f"i -> (shiftright(element_at({_long_array_sql(words)}, "
        f"CAST({p} / 64 AS INT) + 1), CAST({p} % 64 AS INT)) & 1) = 1))) AS BIGINT)"
    )
    return probe.select(
        F.col(id_col),
        n_flagged.alias("n_flagged"),
        (n_flagged > 0).alias("contaminated"),
    )


def _merge_pair_fold(syms, a: str, b: str):
    """Greedy left-to-right single-pass merge of adjacent (a, b) into
    a+b over a symbol array — the BPE merge step, as one in-row fold."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    end_of_word: str = "</w>",
    max_vocab_words: int | None = None,
) -> "list[tuple[str, str]]":
    """Byte-Pair-Encoding vocabulary induction (Sennrich et al. 2016,
    arXiv:1508.07909) — distributed tokenizer training.

    Spark-first shape: the corpus collapses to its WORD-FREQUENCY table
    first (one map-side-combined shuffle — at 100 TB the distinct-word
    table is ~10⁸ rows however large the corpus), and every merge
    iteration runs over that compact table only:

    1. pair counts: in-row adjacent-pair extraction weighted by word
       frequency, ``groupBy(pair)`` with partial aggregation;
    2. best pair: ``orderBy(count desc, pair)`` + ``limit(1)`` (planned
       as TakeOrderedAndProject — no global sort), a one-row collect
       (the algorithm's inherent sequential dependency: O(num_merges)
       driver round-trips of one row each);
    3. merge application: an in-row greedy left-to-right fold over each
       word's symbol array; ``localCheckpoint`` keeps the iteration
       lineage flat.

    Ties break deterministically (higher count, then lexicographically
    smaller pair), so the merge list is reproducible across runs,
    partitionings, and cluster sizes.

    ``max_vocab_words`` optionally trains on the top-N most frequent
    words only (standard practice; bounds iteration cost independently
    of tail size). Returns the ordered merge list.
    """
    words = df.select(F.explode(tokens(text_col)).alias("w")).filter(
        F.col("w") != ""
    ).groupBy("w").agg(F.count("*").alias("cnt"))
    if max_vocab_words is not None:
        words = words.orderBy(F.col("cnt").desc(), "w").limit(max_vocab_words)
    syms = F.concat(
        F.split(F.col("w"), ""), F.array(F.lit(end_of_word))
    )
    vocab = words.select(F.col("cnt"), syms.alias("syms")).localCheckpoint(
        eager=False
    )

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_idx = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "cnt", _merge_pair_fold(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=False)
    return merges


def bpe_apply(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    out: str = "bpe_toks",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenize with a trained BPE merge list: per word, start from
    characters + end-of-word marker and apply each merge in training
    order as an in-row fold over a ``transform`` of the word array —
    zero shuffle, scan-stage only, one output row per input row
    (empty/null text yields an empty token array, duplicate rows are
    preserved — matching :func:`bpe_apply_arrow` exactly).

    Expression depth grows with ``len(merges)``; fine for the tens of
    merges typical in tests/small vocabs. For production-sized merge
    tables (30k+), apply via an Arrow-batched pandas UDF instead — the
    semantics here are the spec.
    """

    def encode(w):
        syms = F.concat(F.split(w, ""), F.array(F.lit(end_of_word)))
        for a, b in merges:
            syms = _merge_pair_fold(syms, a, b)
        return syms

    words = F.filter(tokens(text_col), lambda t: t != "")
    empty = F.array().cast("array<string>")
    return df.withColumn(
        out, F.coalesce(F.flatten(F.transform(words, encode)), empty)
    )


def bpe_apply_arrow(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    out: str = "bpe_toks",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Production-scale BPE application: identical semantics to
    :func:`bpe_apply` (equivalence is test-pinned) but executed as an
    Arrow-batched ``mapInPandas`` with the merge table broadcast as
    rank map — the right shape once the merge list reaches real vocab
    sizes (30k+), where an expression chain per merge would not compile.

    Per word: repeatedly merge the present pair with the LOWEST training
    rank (the standard BPE inference rule, e.g. GPT-2's encoder), which
    reproduces training-order application exactly; a per-batch word
    cache collapses Zipf-repeated words so cost tracks DISTINCT words
    per batch, not tokens.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_fields = df.schema.fieldNames() + [out]
    schema_src = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out} array<string>"]
    )

    def encode_word(word: str, cache: dict) -> "list[str]":
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [end_of_word]
        while len(syms) >= 2:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            a, b = merges[best[0]]
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        cache[word] = syms
        return syms

    def run(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            toks = [
                [s for w in str(t).split() for s in encode_word(w, cache)]
                for t in pdf[text_col].fillna("")
            ]
            pdf = pdf.copy()
            pdf[out] = pd.Series(toks, index=pdf.index, dtype=object)
            yield pdf[out_fields]

    return df.mapInPandas(run, schema=schema_src)


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1)
# ---------------------------------------------------------------------------

# The paper's "required words" rule: a document must contain at least
# ``min_stopwords`` of these to pass (filters symbol soup / code dumps).
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_RE = r"^[-*•‣▪]"


def gopher_rules(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.80,
    max_bullet_ratio: float = 0.90,
    max_ellipsis_line_ratio: float = 0.30,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher rule-based quality filter (arXiv:2112.11446 Table A1):
    per-document features + one boolean per rule + combined
    ``gopher_pass``. Default thresholds are the paper's.

    Rules: word count in [min_words, max_words]; mean word length in
    [min, max]; (``#`` + ellipsis)-to-word ratio <= max_symbol_ratio;
    fraction of words with >= 1 alphabetic char >= min_alpha_word_ratio;
    fraction of lines starting with a bullet <= max_bullet_ratio;
    fraction of lines ending with an ellipsis <= max_ellipsis_line_ratio;
    >= min_stopwords distinct :data:`GOPHER_REQUIRED_WORDS` present.

    Scale shape: every feature is a built-in Column expression over the
    row's own text — a scan-stage projection with zero shuffle and zero
    Python, so at 100 TB this runs at parquet-scan speed inside
    whole-stage codegen. Ratios are ROUND(6) so a DuckDB oracle hashes
    bit-identically.
    """
    # every feature and flag is ONE parsed expression (the former python
    # builders cost ~900 py4j round-trips per build, measured r9)
    t = text_col
    toks_sql = f"filter({_tokens_sql(t)}, x -> x != '')"
    n = f"size({toks_sql})"
    nd = f"CASE WHEN {n} > 0 THEN CAST({n} AS DOUBLE) END"  # NULL-propagating
    mean_len = f"round(length(regexp_replace({t}, '\\\\s+', '')) / ({nd}), 6)"
    n_hash = f"(length({t}) - length(replace({t}, '#', '')))"
    n_uell = f"(length({t}) - length(replace({t}, '…', '')))"
    n_dots = f"(length({t}) - length(replace({t}, '...', '')))"
    # symbols = n_hash + n_uell + n_dots/3; computed as ONE division of
    # exact integers (3*symbols / 3*words) so the double — and therefore
    # the ROUND and any threshold comparison — is bit-identical in every
    # engine regardless of addition order.
    symbol_ratio = (
        f"round((3 * {n_hash} + 3 * {n_uell} + {n_dots}) / "
        f"(CASE WHEN {n} > 0 THEN CAST(3 * {n} AS DOUBLE) END), 6)"
    )
    alpha_ratio = (
        f"round(size(filter({toks_sql}, x -> x rlike '[a-zA-Z]')) / ({nd}), 6)"
    )
    lines_sql = f"split({t}, '\\n')"
    n_lines = f"CAST(size({lines_sql}) AS DOUBLE)"
    bullet_ratio = (
        f"round(size(filter({lines_sql}, l -> ltrim(l) rlike '{_BULLET_RE}')) "
        f"/ {n_lines}, 6)"
    )
    ell_line_ratio = (
        f"round(size(filter({lines_sql}, "
        "l -> endswith(rtrim(l), '...') OR endswith(rtrim(l), '…'))) "
        f"/ {n_lines}, 6)"
    )
    req_sql = "array(" + ",".join(f"'{w}'" for w in GOPHER_REQUIRED_WORDS) + ")"
    n_stops = f"size(filter({req_sql}, w -> array_contains({toks_sql}, w)))"

    feats = {
        "n_words": f"CAST({n} AS BIGINT)",
        "mean_word_len": mean_len,
        "symbol_ratio": symbol_ratio,
        "alpha_word_ratio": alpha_ratio,
        "bullet_line_ratio": bullet_ratio,
        "ellipsis_line_ratio": ell_line_ratio,
        "n_required_stops": f"CAST({n_stops} AS BIGINT)",
    }
    out = df
    for name, sql in feats.items():
        out = out.withColumn(name, F.expr(sql))

    def _d(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    flags = {
        "pass_word_count": f"(n_words >= {min_words}) AND (n_words <= {max_words})",
        "pass_mean_word_len": f"(mean_word_len >= {_d(min_mean_word_len)}) "
        f"AND (mean_word_len <= {_d(max_mean_word_len)})",
        "pass_symbol_ratio": f"symbol_ratio <= {_d(max_symbol_ratio)}",
        "pass_alpha_words": f"alpha_word_ratio >= {_d(min_alpha_word_ratio)}",
        "pass_bullets": f"bullet_line_ratio <= {_d(max_bullet_ratio)}",
        "pass_ellipsis_lines": f"ellipsis_line_ratio <= {_d(max_ellipsis_line_ratio)}",
        "pass_stopwords": f"n_required_stops >= {min_stopwords}",
    }
    for name, sql in flags.items():
        out = out.withColumn(name, F.expr(f"coalesce({sql}, false)"))
    gopher_pass = F.expr("true AND " + " AND ".join(flags))
    return out.withColumn("gopher_pass", gopher_pass)


# ---------------------------------------------------------------------------
# Unicode/text normalization (ftfy-style cleanup, scan-stage only)
# ---------------------------------------------------------------------------

# 1:1 character folds applied via translate (single JVM pass, no regex):
# curly quotes -> ASCII, dashes -> '-', exotic spaces -> ' '.
_FOLD_SRC = (
    "‘’‚‛"  # single quotes
    "“”„‟"  # double quotes
    "–—−―"  # en/em dash, minus, horizontal bar
    "   　"  # nbsp, narrow nbsp, thin space, ideographic
)
_FOLD_DST = "''''\"\"\"\"----    "

# Removed outright: zero-widths, BOM, soft hyphen, C0/C1 controls except
# tab (folded to space later) and newline.
_STRIP_RE = (
    "[​‌‍﻿­"
    "\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
)


def normalize_text(text: str | Column = "text") -> Column:
    """ftfy-style canonical text cleanup as ONE Column expression:
    curly quotes/dashes/exotic spaces folded to ASCII, ``…`` ->
    ``...``, zero-width + control chars stripped, horizontal whitespace
    runs collapsed to one space, spaces trimmed around newlines, >= 3
    consecutive newlines collapsed to 2, ends trimmed.

    Pure Catalyst (translate + regexp_replace chain): a scan-stage
    projection — zero shuffle, zero Python, idempotent by construction
    (unit-tested), so it can run defensively in front of every text
    operator at 100 TB for the cost of the scan.
    """
    c = F.col(text) if isinstance(text, str) else text
    c = F.translate(c, _FOLD_SRC, _FOLD_DST)
    c = F.replace(c, F.lit("…"), F.lit("..."))
    c = F.regexp_replace(c, _STRIP_RE, "")
    c = F.regexp_replace(c, "[ \t]+", " ")
    c = F.regexp_replace(c, "[ ]*\n[ ]*", "\n")
    c = F.regexp_replace(c, "\n{3,}", "\n\n")
    return F.trim(c)


# ---------------------------------------------------------------------------
# Inter-document line dedup (the C4 rule, line-level)
# ---------------------------------------------------------------------------


def line_dedup_across_docs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "dedup_text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line deduplication (the C4 repeated-span rule at line
    granularity, arXiv:1910.10683 §2.2): every distinct non-blank
    trimmed line is kept ONLY at its first occurrence — ordered by
    ``(id, position)`` — and dropped everywhere else, including later
    repeats inside the same document. Blank lines always survive
    (document structure is not content). Each document is rebuilt from
    its surviving lines in order; returns
    ``(id, n_lines, n_dropped, dedup_text)``.

    Contrast with :func:`remove_boilerplate_lines`, which drops a
    frequent line from EVERY document; this keeps exactly one copy.

    Scale shape: one row per line; the first-occurrence winner per line
    key is a ``groupBy(line).agg(min(struct(id, pos)))`` — map-side
    partial min collapses within-partition repeats before the shuffle,
    so the exchange carries at most one row per distinct line per input
    partition (a window/row_number formulation would instead sort every
    repeat of a hot line inside one reducer — the skew trap). The
    winner relation (one row per DISTINCT line) joins back on the line
    key; the per-document reassembly groupBy is the same exchange every
    rebuild op here pays.

    ``sep`` sets the unit: the default ``"\n"`` dedups lines;
    ``"\n\n"`` dedups paragraphs (closer to C4's three-sentence spans
    for prose corpora). The separator is treated as a literal.
    """
    import re as _re

    sep_re = _re.escape(sep)
    lines = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep_re)).alias("_pos", "_line")
    )
    nonblank = lines.filter(F.length(F.trim("_line")) > 0)
    firsts = (
        nonblank.groupBy(F.trim("_line").alias("_k"))
        .agg(
            F.min(
                F.struct(F.col(id_col).alias("_i"), F.col("_pos").alias("_p"))
            ).alias("_w")
        )
        .select("_k", F.col("_w._i").alias("_wi"), F.col("_w._p").alias("_wp"))
    )
    winners = (
        nonblank.join(firsts, F.trim(F.col("_line")) == F.col("_k"))
        .filter((F.col(id_col) == F.col("_wi")) & (F.col("_pos") == F.col("_wp")))
        .select(id_col, "_pos", "_line")
    )
    kept = winners.unionByName(
        lines.filter(F.length(F.trim("_line")) == 0).select(id_col, "_pos", "_line")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.expr(
                'transform(array_sort(collect_list(struct(_pos, _line))), s -> s._line)'
            ),
            sep,
        ).alias("_clean"),
        F.count("*").alias("_kept"),
    )
    totals = df.select(
        id_col, F.size(F.split(F.col(text_col), sep_re)).cast("long").alias("n_lines")
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        (F.col("n_lines") - F.coalesce("_kept", F.lit(0))).cast("long").alias("n_dropped"),
        F.coalesce("_clean", F.lit("")).alias(out),
    )


# ---------------------------------------------------------------------------
# Vocabulary / tokenizer coverage
# ---------------------------------------------------------------------------


def vocab_coverage(
    df: DataFrame,
    vocab,
    *,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Out-of-vocabulary rate per group — the pre-flight QA for a
    tokenizer or vocabulary swap: how much of each source's token mass
    a candidate vocab covers. Returns
    ``(group, total_tokens, n_oov, oov_rate)``.

    ``vocab`` as a sequence of strings rides into the expression as an
    in-row array literal (zero shuffle, scan-stage — right for the
    KB-scale vocabs of rule sets and stopword lists). ``vocab`` as a
    single-column DataFrame handles real tokenizer vocabularies
    (100k+ entries, too big for a literal): tokens explode to rows and
    the vocab broadcasts into a left-anti membership probe — the corpus
    itself still never shuffles; the only exchange is the final
    per-group partial-aggregated rollup.
    """
    if isinstance(vocab, DataFrame):
        vcol = vocab.columns[0]
        toks = df.select(
            group_col,
            F.explode(
                F.expr(f"filter({_tokens_sql(text_col)}, t -> t != '')")
            ).alias("_t"),
        )
        oov = (
            toks.join(
                F.broadcast(vocab.select(F.col(vcol).alias("_v")).distinct()),
                toks["_t"] == F.col("_v"),
                "left_anti",
            )
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_oov"))
        )
        # totals from the BASE relation (in-row size, no explode): a
        # group whose every document tokenizes empty must still appear
        totals = (
            df.select(
                group_col,
                F.expr(f"size(filter({_tokens_sql(text_col)}, t -> t != ''))").alias("_n"),
            )
            .groupBy(group_col)
            .agg(F.sum("_n").cast("long").alias("total_tokens"))
        )
        return (
            totals.join(oov, group_col, "left")
            .select(
                group_col,
                "total_tokens",
                F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
                F.round(
                    F.coalesce("n_oov", F.lit(0))
                    / F.when(F.col("total_tokens") > 0, F.col("total_tokens").cast("double")),
                    6,
                ).alias("oov_rate"),
            )
        )
    varr_sql = "array(" + ",".join("'" + str(w).replace("'", "\\'") + "'" for w in vocab) + ")"
    toks_sql = f"filter({_tokens_sql(text_col)}, t -> t != '')"
    n = F.expr(f"CAST(size({toks_sql}) AS BIGINT)")
    n_oov = F.expr(
        f"CAST(size(filter({toks_sql}, t -> NOT array_contains({varr_sql}, t))) AS BIGINT)"
    )
    return (
        df.select(group_col, n.alias("_n"), n_oov.alias("_o"))
        .groupBy(group_col)
        .agg(F.sum("_n").alias("total_tokens"), F.sum("_o").alias("n_oov"))
        .select(
            group_col,
            "total_tokens",
            "n_oov",
            F.round(
                F.col("n_oov")
                / F.when(F.col("total_tokens") > 0, F.col("total_tokens").cast("double")),
                6,
            ).alias("oov_rate"),
        )
    )


def dsir_importance(
    df: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169):
    importance weight of each raw-corpus document under hashed-n-gram
    bag models of a small high-quality ``target`` corpus vs the raw
    corpus itself — ``log p_target(doc) - log p_raw(doc)`` where both
    are add-``alpha``-smoothed unigram models over unigram+bigram
    features hashed into ``dim`` buckets (the same feature map as
    :func:`hashed_classifier_score`). Rank by the score and keep the
    top mass (or feed :func:`~pygrametl_spark.functions.sampling
    .quantile_bucket` for CCNet-style tiers) to select raw data that
    "looks like" the target distribution.

    Scale shape: two bucket-count aggregates (raw + target) each
    collapse map-side to at most ``dim`` rows; the per-bucket
    log-ratio weights are computed on that tiny relation and ride back
    into the scoring expression as a ``dim``-entry array literal — a
    bounded driver sidecar like the IVF centroids/Bloom bitmaps, NOT a
    corpus-sized model. Scoring is then fully in-row (``aggregate``
    over the feature array inside the scan stage): zero shuffle, no
    join, no Python on the hot path, however large the raw corpus.

    Determinism: weights are integer MICRO-log-units
    (``round(log_ratio * 1e6)`` as BIGINT, the ``ngram_lm_score``
    discipline) so per-doc sums are accumulation-order exact; the
    rounded mean is replayable bit-for-bit by a DuckDB oracle.

    Returns ``(id_col, n_feats, dsir_units, dsir_score)`` where
    ``dsir_units`` = sum of per-occurrence weight units and
    ``dsir_score`` = mean log-ratio in nats rounded to 4 (NULL for
    featureless docs).
    """
    from pygrametl_spark.functions.dedup import hash32

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")

    from pygrametl_spark.functions.dedup import hash32_spark_sql

    feats_sql = (
        f"concat({_tokens_sql(text_col)}, "
        f"{_shingles_sql(_tokens_sql(text_col), 2)})"
    )

    def feat_rows(frame: DataFrame, side: int) -> DataFrame:
        return frame.select(F.explode(F.expr(feats_sql)).alias("_f")).select(
            F.pmod(hash32(F.col("_f")), F.lit(dim)).alias("_b"),
            F.lit(side).alias("_side"),
        )

    # ONE job for models AND weights: the raw/target bucket counts are
    # independent aggregates computed by a tagged union (two parallel
    # stages of one action, guide §2.6), and the per-bucket weight —
    # which needs the model totals — rides the SAME action via
    # unpartitioned-window sums over the <= dim aggregated rows (the
    # former separate spark.range(dim) weight job was a second
    # sequential driver round-trip per build, ~0.3 s). Buckets absent
    # from both sides are restored by the range/left-join so their
    # (alpha-smoothed, nonzero) weight is kept. The ln stays the SAME
    # engine ln the oracle replays, evaluated on the same doubles as
    # the former buckets job — values identical.
    spark = df.sparkSession
    a, b_ = float(alpha), float(alpha) * dim
    agg = (
        feat_rows(df, 0)
        .unionAll(feat_rows(target, 1))
        .groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_side") == 0, 1).otherwise(0)).alias("_sc"),
            F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).alias("_tc"),
        )
    )
    wall = Window.partitionBy()
    w_rows = (
        spark.range(dim)
        .select(F.col("id").cast("int").alias("_b"))
        .join(agg, "_b", "left")
        .select(
            "_b",
            F.coalesce("_sc", F.lit(0)).cast("double").alias("_s"),
            F.coalesce("_tc", F.lit(0)).cast("double").alias("_t"),
        )
        .withColumn("_stot", F.sum("_s").over(wall))
        .withColumn("_ttot", F.sum("_t").over(wall))
        .select(
            "_b",
            F.round(
                (
                    F.log((F.col("_t") + a) / (F.col("_ttot") + b_))
                    - F.log((F.col("_s") + a) / (F.col("_stot") + b_))
                )
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("_w"),
        )
        .collect()
    )
    w_units = [0] * dim
    for r in w_rows:
        w_units[r["_b"]] = r["_w"]

    base = df.select(F.col(id_col), F.expr(feats_sql).alias("_feats"))
    units = F.expr(
        f"aggregate(_feats, CAST(0 AS BIGINT), (acc, f) -> acc + "
        f"element_at({_long_array_sql(w_units)}, "
        f"CAST(pmod({hash32_spark_sql('f')}, {dim}) + 1 AS INT)))"
    )
    return base.select(
        F.col(id_col),
        F.size("_feats").cast("long").alias("n_feats"),
        units.alias("dsir_units"),
    ).withColumn(
        "dsir_score",
        F.when(
            F.col("n_feats") > 0,
            F.round(F.col("dsir_units") / (F.col("n_feats") * F.lit(1e6)), 4),
        ),
    )
