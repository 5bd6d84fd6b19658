"""Dump .explain("formatted") for registered queries to plans/r09/.

Usage: python scripts/dump_plans.py <suffix> <sf_dir> query [query ...]
Writes plans/r09/<query>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2]
    names = sys.argv[3:]

    from pygrametl_spark.plans.explain import formatted_plan
    from pygrametl_spark.queries import QUERIES
    from pygrametl_spark.session import get_spark

    spark = get_spark("dump_plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r09",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        p = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(p)
        print(f"wrote {path} ({len(p)} bytes)")


if __name__ == "__main__":
    main()
