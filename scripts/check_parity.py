"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (floats with tolerance).

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    # Type-strict: a Decimal must NEVER compare equal to a float. The driver's
    # content hash is rendering-strict (Decimal('0.5000') renders '0.5000',
    # float 0.5 renders '0.5'), but Python's == is numeric across the two
    # types — which is exactly how the r9 dedup_minhash_lsh DECIMAL bug
    # slipped past this gate. Tag decimals so cross-type equality is
    # impossible and same-type comparison is rendering-strict.
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def col_kinds(cols, rows):
    """Per-column set of non-null Python value type names, keyed by column.

    bool is kept distinct from int; int vs float vs Decimal are distinct.
    Used to assert Spark and DuckDB agree on each column's *type*, not just
    its numeric value (int 1 == float 1.0 == Decimal('1') in Python, but the
    driver hashes their renderings differently)."""
    kinds = {c: set() for c in cols}
    for r in rows:
        for c, v in zip(cols, r):
            if v is None:
                continue
            t = type(v).__name__
            kinds[c].add(t)
    return {c: frozenset(k) for c, k in kinds.items()}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pygrametl_spark.session import get_spark
    from pygrametl_spark.catalog import TPCH_TABLES

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        sk, dk = col_kinds(scols, srows), col_kinds(dcols, drows)
        kind_diffs = {
            c: (sorted(sk[c]), sorted(dk.get(c, frozenset())))
            for c in sk
            if c in dk and sk[c] != dk[c]
        }
        status = None
        if sc != dc:
            status = f"schema mismatch: spark={sc} duck={dc}"
        elif kind_diffs:
            status = f"dtype mismatch (spark vs duck value types): {kind_diffs}"
        elif len(sr) != len(dr):
            status = f"rowcount mismatch: spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            status = f"value mismatch ({sum(1 for a, b in zip(sr, dr) if a != b)} rows), e.g. {diffs}"
        if status:
            print(f"FAIL {name}: {status}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
