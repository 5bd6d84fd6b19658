"""Benchmark harness: ALL registered queries at $SPARK_GRAFT_SF_DIR
(default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is executed to completion
with a count() action (aggregates) — results are small; the cost is the
scan/join/shuffle work, which is what we measure.

Since round 3 the bench times every entry of the driver-facing registry
(the exact callables the correctness gate runs, tag-union merges
included), so a perf regression in ANY gated operator is visible
round-over-round. Round 2 timed a 26-name subset, five of them as
individual parts instead of their registered merges — the r2->r3 delta
table in PERF.md flags those five as not directly comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prior_official_basket(repo_dir: str):
    """(round_n, basket) of the newest driver-recorded official bench
    (BENCH_r{N}.json) carrying a complete basket — the reference the
    degraded-window guard compares against. None if no prior round."""
    import glob
    import re

    best = None
    for f in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r0*(\d+)\.json$", f)
        if not m:
            continue
        try:
            with open(f) as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            continue
        parsed = d.get("parsed") or {}
        basket = parsed.get("basket")
        if basket and parsed.get("basket_complete", True):
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, float(basket), parsed.get("queries") or {})
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pygrametl_spark.queries import QUERIES
    from pygrametl_spark.session import get_spark

    headline = list(QUERIES)  # the full 50-entry registry, driver order
    # SPARK_GRAFT_BENCH_ONLY=name1,name2 — subset sweep for targeted
    # confirmation runs (e.g. 3 sweeps of one noisy entry). Subset runs
    # are diagnostics: they still print the compact line but their
    # basket is partial, so never record one as an official round bench.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    # SPARK_GRAFT_COLD_SWEEP=1 (r9, VERDICT r8 ask #2): the cold
    # streaming trajectory as a FIRST-CLASS official artifact. The
    # official bench measures the stream-gated entries through the
    # drained-result memo (replay-not-redrain — the warm-pipeline
    # behavior), which makes it structurally blind to regressions in the
    # cold drain itself. This mode times the four stream-gated entries
    # with SPARK_GRAFT_COLD_GATES=1 (every micro-batch re-paid,
    # median-of-5) PLUS the full 10-entry batch basket (timed, so the
    # artifact carries a complete host-speed stamp and the same
    # degraded-window flag as the official bench) and writes
    # BENCH_COLD_STREAMS.json.
    cold_sweep = os.environ.get("SPARK_GRAFT_COLD_SWEEP") == "1"
    if cold_sweep:
        os.environ["SPARK_GRAFT_COLD_GATES"] = "1"
    STREAM_GATED = [
        "dedup_exact", "events_stream_windows", "events_sessionize",
        "scd2_streaming_maintain",
    ]
    BASKET = [
        "scd2_type1_overrides", "text_analysis", "scd2_build_close",
        "snowflake_scdensure", "sources_roundtrip", "dedup_ngram_jaccard",
        "embedding_neardup", "corpus_curation", "scd2_incremental_merge",
        "neardup_clusters",
    ]
    if cold_sweep:
        # basket first (host stamp under the same conditions the
        # official bench stamps), then the cold-drained streaming entries
        headline = BASKET + STREAM_GATED
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        headline = [n for n in headline if n in names]
    # Randomized-order confirmation sweep (position-effect triage): with
    # SPARK_GRAFT_BENCH_ORDER=random, queries run in a seeded shuffle
    # (SPARK_GRAFT_BENCH_SEED, default 0) — a per-query median that moves
    # with execution order is position noise (codegen-cache / JIT state),
    # not a regression. The published bench keeps the registry order.
    if os.environ.get("SPARK_GRAFT_BENCH_ORDER") == "random":
        import random

        rng = random.Random(int(os.environ.get("SPARK_GRAFT_BENCH_SEED", "0")))
        rng.shuffle(headline)

    spark = get_spark("bench")
    spark.range(1).count()  # session spin-up outside any timing

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prior = _prior_official_basket(repo_dir)

    # Pre-sweep host gauge (r7, VERDICT r6 "what's wrong" #2): print a
    # machine-speed verdict BEFORE any timed work so a degraded window
    # (post-parity kcompactd churn, concurrent load) is visible up front
    # instead of as a footnote after 10 minutes of sweeping. The gauge is
    # median-of-3 of one mid-weight batch basket entry compared to the
    # prior official round's median for the same entry; advisory only —
    # the authoritative flag is the in-run basket comparison below.
    GAUGE = "sources_roundtrip"
    if not only and prior and prior[2].get(GAUGE):
        try:
            QUERIES[GAUGE](spark, sf_dir).count()  # warm-up
            g_runs = []
            for _ in range(3):
                t0 = time.time()
                QUERIES[GAUGE](spark, sf_dir).count()
                g_runs.append(time.time() - t0)
            g_med = sorted(g_runs)[1]
            g_ref = float(prior[2][GAUGE])
            ratio = g_med / g_ref if g_ref else float("nan")
            verdict = "OK" if ratio <= 1.25 else "DEGRADED HOST"
            print(
                f"# gauge {GAUGE}: {g_med:.2f}s vs r{prior[0]} official "
                f"{g_ref:.2f}s (ratio {ratio:.2f}) -> {verdict}",
                file=sys.stderr,
            )
            if ratio > 1.25:
                print(
                    "# gauge verdict: host looks degraded — an official "
                    "recording now would need basket normalization; "
                    "consider waiting out the churn (15-30 min)",
                    file=sys.stderr,
                )
        except Exception as exc:  # noqa: BLE001 — advisory only
            print(f"# gauge failed: {exc}", file=sys.stderr)

    # Sacrificial first-slot run: whatever query is measured FIRST in a
    # sweep absorbs a ~2x session-start penalty that its own two
    # warm-ups do not cover (measured r4: q01 0.55-1.03 s at slot 1 vs
    # 0.29 s mid-sweep in a randomized-order sweep; the randomized
    # sweep's own first entry, newest_version, was +42% — the penalty
    # follows the SLOT, not the query). One untimed full execution of
    # the first entry, plus hygiene, moves that cost off the record.
    try:
        QUERIES[headline[0]](spark, sf_dir).count()
    except Exception:  # noqa: BLE001 — the timed path reports real errors
        pass

    # Per-query warm-up (excluded from timings; JMH-style untimed
    # iterations of the exact workload, run immediately before each
    # query's timed run): first executions pay one-time costs unrelated
    # to query work — whole-stage-codegen Janino compilation, C2 JIT
    # tiering of interpreted higher-order-function eval paths, parquet
    # footer reads. Measured on the LSH query: run 1 ≈ 6 s, steady state
    # ≈ 0.1 s. Warm-up must be per-query and adjacent to its timed run:
    # a global warm-up sweep evicts earlier plans' generated classes
    # from the codegen cache (~100 entries), which made the timed runs
    # SLOWER than no warm-up at all (measured 12.6 s vs 6.1 s on LSH).
    def _session_hygiene() -> None:
        """Reset leaked session state between queries so each measurement
        starts clean: streaming drains register uuid-named memory-sink
        temp views that pin their results, the StreamingQueryManager
        keeps terminated-query metadata, and localCheckpoint blocks are
        only released when the driver GCs the Python references."""
        import gc

        try:
            for t in spark.catalog.listTables():
                if t.isTemporary:
                    spark.catalog.dropTempView(t.name)
            spark.streams.resetTerminated()
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 — hygiene must never fail the bench
            pass
        gc.collect()
        # Release executor-storage blocks BEFORE the next measurement:
        # lazy localCheckpoint blocks from mutation-chain queries are
        # reclaimed asynchronously by the ContextCleaner after their
        # Python refs die, and that cleanup landing mid-measurement is
        # measurable noise (events_stream_windows spread 2.8-14.6 s in a
        # full sweep vs 3.0-3.6 s isolated). A forced JVM GC drains the
        # cleaner's reference queue synchronously-enough here.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    # Machine basket (drift normalization, r5): the fixed 10-entry batch
    # subset (defined above, next to the cold-sweep entry list) whose
    # summed median is the host-speed index. BENCH_SWEEPS_r04 measured
    # identical code drifting 25.1->31.2 s on this basket across a 2.5 h
    # window (~23% whole-host slowdown) — so round-over-round per-query
    # deltas are only meaningful after dividing out the basket ratio.
    # Entries are batch-only (no streaming jitter), span the scan/join/
    # shuffle/window mix, and every one existed unchanged since r2.
    timings: dict[str, float] = {}
    spreads: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name in headline:
        _session_hygiene()
        fn = QUERIES[name]
        for _ in range(2):
            try:
                fn(spark, sf_dir).count()
            except Exception as exc:  # warm-up must never fail the bench
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
                break
        # one bad query must never zero the whole round's bench data —
        # record the error and keep the other measurements. Median of 3
        # timed iterations: single runs swing by seconds from JIT/codegen
        # cache state (measured 1.7 s vs 6.2 s for the identical query
        # across sweeps), which is measurement noise, not query cost.
        # Streaming-family entries drain real micro-batch streams whose
        # per-run cost carries Python-worker / checkpoint-IO jitter the
        # batch entries don't have; median-of-5 (vs 3) keeps their
        # round-over-round medians regression-readable (r4).
        streaming_family = name in STREAM_GATED
        base_iters = 5 if streaming_family else 3
        try:
            runs = []
            for _ in range(base_iters):
                # Streaming drains leave per-iteration debris (memory-sink
                # temp views pinning results, localCheckpoint blocks
                # reclaimed asynchronously mid-NEXT-iteration) — the r4
                # scd2_streaming_maintain within-run spread of [3.08,
                # 6.26] s was cleanup from iteration N landing inside
                # iteration N+1's timing. Hygiene BETWEEN iterations
                # (untimed) makes each drain start from the same state.
                if streaming_family:
                    _session_hygiene()
                t0 = time.time()
                df = fn(spark, sf_dir)
                n = df.count()
                runs.append(time.time() - t0)
            # adaptive sampling: queries whose runs spread >30% (C2
            # re-JIT of interpreted HOF paths lands mid-sweep at random)
            # get up to 3 extra iterations so the median converges.
            while (
                len(runs) < base_iters + 3
                and (max(runs) - min(runs)) > 0.3 * sorted(runs)[len(runs) // 2]
            ):
                if streaming_family:
                    _session_hygiene()
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                runs.append(time.time() - t0)
            med = sorted(runs)[len(runs) // 2]
            timings[name] = round(med, 3)
            spreads[name] = [round(min(runs), 3), round(max(runs), 3)]
            print(
                f"# {name}: {timings[name]:.3f}s median of "
                f"{[round(r, 3) for r in runs]} ({n} rows)",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # a partial basket sum recorded as the host-speed index would skew
    # the cross-round drift normalization it exists for — if ANY basket
    # entry failed (landed in errors) or was excluded by a subset run,
    # emit null plus an explicit basket_complete flag instead
    basket_missing = [b for b in BASKET if b not in timings]
    basket = (
        None if basket_missing
        else round(sum(timings[b] for b in BASKET), 3)
    )
    # Degraded-window flag (r7): an official (full-registry) run whose
    # in-run basket exceeds the newest prior official round's basket by
    # >5% is machine-readably marked so nobody reads its per-query
    # medians as plan regressions without normalizing first — r6's
    # footnote ("official window basket 30.79 vs r5 28.94, equal-basket
    # sweep 0.99x") becomes a field.
    degraded = bool(
        not only and prior and basket and basket > 1.05 * prior[1]
    )
    if not only and prior and basket:
        print(
            f"# basket verdict: in-run {basket:.2f} vs r{prior[0]} "
            f"official {prior[1]:.2f} -> "
            + ("DEGRADED (>+5%)" if degraded else "ok"),
            file=sys.stderr,
        )
    if cold_sweep:
        # the headline number of a cold sweep is the COLD STREAMING
        # total; the basket entries are the host stamp, reported but not
        # summed into the metric
        total = round(
            sum(timings[n] for n in STREAM_GATED if n in timings), 3
        )
    full = {
        "metric": (
            "cold_stream_queries_total" if cold_sweep
            else "headline_queries_total"
        ),
        "value": total,
        "unit": "sec",
        "queries": timings,
        # [min, max] of the timed iterations behind each median — a
        # round-over-round delta inside the recorded spread is noise,
        # outside it is a real move (regression detectability, r4)
        "spread": spreads,
        # host-speed index: summed median of the fixed 10-entry batch
        # basket. Compare rounds as (q_r5/q_r4)/(basket_r5/basket_r4) —
        # a move that survives basket normalization is a real plan/
        # workload change, not machine drift (r5; BENCH_SWEEPS_r04).
        "basket": basket,
        "basket_complete": not basket_missing,
        "basket_entries": BASKET,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # true iff this run's own basket exceeds the newest prior
        # official round's basket by >5% — read medians against the
        # basket ratio, not at face value
        "degraded": degraded,
    }
    if degraded:
        full["degraded_vs"] = {
            "round": prior[0],
            "basket": prior[1],
            "ratio": round(basket / prior[1], 3),
        }
    if errors:
        full["errors"] = errors
    # Full artifact -> repo file (the driver's tail capture truncated
    # BENCH_r04.json's single fat line to parsed:null once the 50-entry
    # spread dict pushed it past 2 kB). The stdout line stays COMPACT —
    # totals + basket + 2-dp per-query medians, no spreads — and is
    # printed LAST so a bounded tail always contains it whole.
    if cold_sweep:
        full["cold_gates"] = True
        full["cold_entries"] = STREAM_GATED
    artifact = (
        "BENCH_COLD_STREAMS.json" if cold_sweep
        else ("BENCH_SUBSET.json" if only else "BENCH_FULL.json")
    )
    with open(os.path.join(repo_dir, artifact), "w") as fh:
        json.dump(full, fh, indent=1)
    compact = {
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "basket": basket,
        "basket_complete": not basket_missing,
        "degraded": degraded,
        "sf": full["sf"],
        "full": artifact,
    }
    if errors:
        compact["errors"] = {k: v[:80] for k, v in errors.items()}
    line = json.dumps(compact, separators=(",", ":"))
    print(f"# compact line: {len(line)} bytes", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
