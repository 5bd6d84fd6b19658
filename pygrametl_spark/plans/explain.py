"""Plan inspection helpers: the engine's `.explain` feedback loop.

Used during development to verify, per operator, that filters reach the
parquet scan (PushedFilters), projections prune columns (ReadSchema),
small sides broadcast, and shuffle counts match the semantics' minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["formatted_plan", "plan_stats"]


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_stats(df: DataFrame) -> dict:
    """Counts of plan features that matter at scale.

    Parses the detail headers of ``explain("formatted")`` — one
    ``(N) OpName`` line per operator — so each operator is counted
    exactly once (tree lines carry ``+-``/``:-`` prefixes and the name
    appears again in the detail section).
    """
    import re

    s = formatted_plan(df)
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", s, flags=re.M)

    def n(name: str) -> int:
        return sum(1 for o in ops if o == name)

    return {
        "exchanges": n("Exchange"),
        "broadcast_exchanges": n("BroadcastExchange"),
        "broadcast_joins": n("BroadcastHashJoin") + n("BroadcastNestedLoopJoin"),
        "sortmerge_joins": n("SortMergeJoin"),
        "shuffledhash_joins": n("ShuffledHashJoin"),
        "scans": n("Scan"),
        "pushed_filters": sum(
            1 for line in s.splitlines() if "PushedFilters: [" in line and "PushedFilters: []" not in line
        ),
        "codegen_ids": len(set(re.findall(r"\[codegen id : (\d+)\]", s))),
    }
