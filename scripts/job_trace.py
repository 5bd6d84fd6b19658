"""Per-job trace of one registered query's construction + count: job id,
duration, and the first line of the call-site/description — to attribute
WHICH eager actions a build phase pays for.

Usage: python scripts/job_trace.py <sf_dir> <query>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]

    from pygrametl_spark.queries import QUERIES
    from pygrametl_spark.session import get_spark

    spark = get_spark("job_trace")
    sc = spark.sparkContext
    spark.range(1).count()

    fn = QUERIES[name]
    fn(spark, sf_dir).count()  # warm-up

    store = sc._jsc.sc().statusStore()
    no_statuses = spark._jvm.java.util.ArrayList()
    base = [j.jobId() for j in _jobs(store, no_statuses)]
    t0 = time.time()
    df = fn(spark, sf_dir)
    t_build = time.time() - t0
    build_high = max([j.jobId() for j in _jobs(store, no_statuses)] + [-1])
    t0 = time.time()
    df.count()
    t_count = time.time() - t0
    print(f"== {name}: build {t_build:.2f}s, count {t_count:.2f}s ==")
    for j in sorted(_jobs(store, no_statuses), key=lambda j: j.jobId()):
        if j.jobId() in base:
            continue
        phase = "BUILD" if j.jobId() <= build_high else "COUNT"
        dur = (
            (j.completionTime().get().getTime() - j.submissionTime().get().getTime())
            / 1000.0
            if j.completionTime().isDefined()
            else -1.0
        )
        desc = (j.description().get() if j.description().isDefined() else j.name())
        print(f"{phase} job {j.jobId():4d} {dur:7.3f}s  {desc[:140]}")


def _jobs(store, no_statuses):
    it = store.jobsList(no_statuses).iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


if __name__ == "__main__":
    main()
