"""Hash-verified FULL-REGISTRY parity at K-fold replication (≈sf1 at
K=10 over the sf0.1 base) — the scale gate the driver can't run.

Round-3 lesson: two accumulation-order float bugs only appeared at
sf0.1, invisible at the sf0.01 gate. This harness replicates the
GROWTH-AXIS tables K times (facts, order headers, event history,
members, documents, embeddings — ids shifted so keys stay unique; the
small dims stay fixed, the shape real warehouse growth has), then runs
every ``__spark_entry__.queries()`` entry on Spark AND its
``oracle_sql()`` twin on DuckDB over the SAME replicated parquet,
comparing row count, column names, and order-insensitive values —
exactly the driver's correctness contract, one decade of scale up.

Usage: python scripts/parity_at_k.py [K] [query ...]
Writes PARITY_K{K}.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_parity import norm_cell, norm_rows  # noqa: E402  (sibling script)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = "/tmp/pygrametl_spark_parityk"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Growth axes: every id column shifts by i*1e8 per copy so FK pairs
# (orders<->lineitem) stay consistent and all keys stay unique. events
# keeps user_id so history depth per member grows Kx (the SCD2 stress);
# documents/embeddings replicate verbatim text/vectors — a dup-heavy
# corpus, exactly what a dedup pipeline sees. Natural/business keys
# (customer.c_name, the lookupatt of every name-keyed dimension query)
# must ALSO stay unique per copy — verbatim duplicates make name-keyed
# ensure/lookup tiebreaks engine-nondeterministic, a harness artifact
# rather than an engine bug.
REPL = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
UNIQUIFY_NAMES = {"customer": ["c_name"]}
SHIFT = 100_000_000


def _iterative_oracles():
    """Oracle families whose one-string SQL cannot scale to high K get a
    multi-statement DuckDB replay here — SAME values, feasible plan. The
    driver gate (sf0.01) keeps running the registered SQL; equality of
    the two oracle formulations is itself test-pinned at gate scale
    (tests/test_coverage_extra.py). Currently only neardup_clusters: the
    recursive-CTE closure is O(c³) on c-copy cliques and OOM-spilled
    DuckDB at K=100 (r6), while min-label propagation is linear per
    round (VERDICT r6 next-round #1)."""
    from pygrametl_spark.queries_data import neardup_clusters_oracle_iterative

    return {"neardup_clusters": neardup_clusters_oracle_iterative}


def build_full_sfdir(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from pygrametl_spark.catalog import read_parquet

    sf_dir = os.path.join(OUT_ROOT, f"full_sfx{k}")
    os.makedirs(sf_dir, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        if t in REPL and k > 1:
            df = read_parquet(spark, f"{BASE}/{t}.parquet")
            copies = []
            for i in range(k):
                c = df
                for col in REPL[t]:
                    c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
                if i > 0:
                    for col in UNIQUIFY_NAMES.get(t, []):
                        c = c.withColumn(
                            col, F.concat(F.col(col), F.lit(f"~r{i}"))
                        )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
            # single FILE (not a part-file directory) so the replicated
            # layout is byte-layout-identical to the base sf dirs — the
            # DB-API queries read_parquet('<path>') a concrete file, and
            # DuckDB views need no glob special-casing
            staging = dst + "._staging"
            out.coalesce(1).write.mode("overwrite").parquet(staging)
            part = next(
                f for f in os.listdir(staging) if f.endswith(".parquet")
            )
            os.replace(os.path.join(staging, part), dst)
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
        else:
            os.symlink(f"{BASE}/{t}.parquet", dst)
    return sf_dir


def _digest_rows(cols, row_iter):
    """Order-insensitive streaming value digest: per-row md5 of the
    column-name-sorted, norm_cell-normalized tuple, SUMMED mod 2^128
    (commutative, collision-negligible) plus the row count. Equality of
    (sorted cols, count, digest) is value-hash equality without ever
    materializing the result — the K=100 join families produce >100M
    rows, far past what the collect-and-sort comparator can hold
    (PARITY_K100_SUBSET note: the binding constraint was never the
    engine). Both sides normalize through the SAME python norm_cell, so
    no cross-engine float-format risk is introduced."""
    import hashlib

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    acc = 0
    n = 0
    for r in row_iter:
        t = tuple(norm_cell(r[i]) for i in idx)
        h = int.from_bytes(hashlib.md5(repr(t).encode()).digest(), "big")
        acc = (acc + h) % (1 << 128)
        n += 1
    return sorted(cols), n, acc


def _duck_chunks(res, size=200_000):
    while True:
        chunk = res.fetchmany(size)
        if not chunk:
            return
        yield from chunk


def main() -> None:
    args = sys.argv[1:]
    digest_mode = "--digest" in args
    args = [a for a in args if a != "--digest"]
    k = int(args[0]) if args else 10
    only = set(args[1:])

    import __spark_entry__ as entry
    from pygrametl_spark.session import get_spark

    spark = get_spark("parity-k")
    t_build = time.time()
    sf_dir = build_full_sfdir(spark, k)
    print(f"# replicated sf dir ready: {sf_dir} ({time.time()-t_build:.1f}s)")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark writes a directory of part files; the base tables are
        # single files — DuckDB needs the glob for the former.
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    iterative = _iterative_oracles()

    def run_oracle(name):
        if name in iterative:
            return iterative[name](con)
        return con.execute(oracles[name])

    report: dict[str, dict] = {}
    n_pass = n_fail = n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "secs": None}
        report[name] = rec
        if digest_mode and name in oracles:
            # streaming-digest compare for results too big to collect
            try:
                sdf = fn(spark, sf_dir)
                # toLocalIterator serves ONE partition per serialized
                # task result: a file-sink-read/union result can pack
                # >1.5 GB into a partition and blow
                # spark.driver.maxResultSize. The digest is
                # order-insensitive, so a round-robin repartition is
                # free semantically and bounds every task result.
                sdf = sdf.repartition(256)
                sc, sn, sd = _digest_rows(
                    sdf.columns, (tuple(r) for r in sdf.toLocalIterator())
                )
                rec["spark_rows"] = sn
            except Exception as e:  # noqa: BLE001
                rec["err"] = f"spark: {type(e).__name__}: {e}"
                rec["secs"] = round(time.time() - t0, 1)
                print(f"FAIL {name}: {rec['err'][:300]}")
                n_fail += 1
                continue
            try:
                res = run_oracle(name)
                dcols = [d[0] for d in res.description]
                dc, dn, dd = _digest_rows(dcols, _duck_chunks(res))
                rec["oracle_rows"] = dn
            except Exception as e:  # noqa: BLE001
                rec["err"] = f"duckdb: {type(e).__name__}: {e}"
                rec["secs"] = round(time.time() - t0, 1)
                print(f"FAIL {name}: {rec['err'][:300]}")
                n_fail += 1
                continue
            rec["mode"] = "digest"
            rec["schema_match"] = sc == dc
            rec["rows_match"] = sn == dn
            rec["hash_match"] = (
                rec["schema_match"] and rec["rows_match"] and sd == dd
            )
            rec["secs"] = round(time.time() - t0, 1)
            if rec["hash_match"]:
                print(f"PASS {name} (digest, {sn} rows, {rec['secs']}s)")
                n_pass += 1
            else:
                rec["err"] = (
                    f"digest: cols spark={sc} duck={dc}, "
                    f"rows {sn} vs {dn}, digests equal={sd == dd}"
                )
                print(f"FAIL {name}: {rec['err'][:300]}")
                n_fail += 1
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark: {type(e).__name__}: {e}"
            rec["secs"] = round(time.time() - t0, 1)
            print(f"FAIL {name}: {rec['err'][:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            rec["rows_match"] = len(srows) >= 0
            rec["secs"] = round(time.time() - t0, 1)
            print(f"SKIP {name}: no oracle ({len(srows)} rows, {rec['secs']}s)")
            n_skip += 1
            continue
        try:
            res = run_oracle(name)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"duckdb: {type(e).__name__}: {e}"
            rec["secs"] = round(time.time() - t0, 1)
            print(f"FAIL {name}: {rec['err'][:300]}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        rec["schema_match"] = sc == dc
        rec["rows_match"] = len(sr) == len(dr)
        rec["hash_match"] = rec["schema_match"] and rec["rows_match"] and sr == dr
        rec["secs"] = round(time.time() - t0, 1)
        if rec["hash_match"]:
            print(f"PASS {name} ({len(sr)} rows, {rec['secs']}s)")
            n_pass += 1
        else:
            if not rec["schema_match"]:
                detail = f"schema: spark={sc} duck={dc}"
            elif not rec["rows_match"]:
                detail = f"rowcount: spark={len(sr)} duck={len(dr)}"
            else:
                diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:2]
                detail = (
                    f"values ({sum(1 for a, b in zip(sr, dr) if a != b)} rows), "
                    f"e.g. {diffs}"
                )
            rec["err"] = detail
            print(f"FAIL {name}: {detail[:400]}")
            n_fail += 1

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"PARITY_K{k}.json",
    )
    # A filtered run (explicit query args) refreshes just those entries
    # inside the existing full report instead of clobbering it.
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("queries", {})
        prior.update(report)
        report = prior
        n_pass = sum(1 for r in report.values() if r.get("hash_match"))
        n_fail = sum(
            1 for r in report.values()
            if r.get("err") or r.get("hash_match") is False
        )
        n_skip = len(report) - n_pass - n_fail
    summary = {
        "k": k, "base": BASE, "passed": n_pass, "rows_only": n_skip,
        "failed": n_fail,
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1)
    print(f"\n{n_pass} passed, {n_skip} rows-only, {n_fail} failed -> {out_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
