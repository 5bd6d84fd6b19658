"""Per-query job/stage profile: how many Spark jobs (eager actions) a
registered query triggers, and wall time per phase (build vs count).

Usage: python scripts/job_profile.py <sf_dir> [query ...]

Each extra Spark job inside a query function is an eager action that
recomputes its upstream DAG — the #1 suspect for entries whose wall
time is a multiple of their single-pass cost (guide §1.2: don't compute
things you throw away). This script runs each query twice (warm-up +
measured) and reports: jobs triggered during DataFrame *construction*
(eager actions inside the operator code), jobs triggered by the final
count, and the wall split.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _n_jobs(sc) -> int:
    t = sc.statusTracker()
    ids = t.getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    from pygrametl_spark.queries import QUERIES
    from pygrametl_spark.session import get_spark

    spark = get_spark("job_profile")
    sc = spark.sparkContext
    spark.range(1).count()

    sel = names or list(QUERIES)
    for name in sel:
        fn = QUERIES[name]
        # warm-up (codegen/JIT) — also isolates the memoized stream gates
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc}")
            continue
        sc.setJobDescription(f"profile:{name}:build")
        j0 = _n_jobs(sc)
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        j1 = _n_jobs(sc)
        sc.setJobDescription(f"profile:{name}:count")
        n = df.count()
        t2 = time.time()
        j2 = _n_jobs(sc)
        sc.setJobDescription(None)
        print(
            f"{name}: build {t1 - t0:6.2f}s/{j1 - j0:3d} jobs | "
            f"count {t2 - t1:6.2f}s/{j2 - j1:3d} jobs | rows {n}"
        )


if __name__ == "__main__":
    main()
