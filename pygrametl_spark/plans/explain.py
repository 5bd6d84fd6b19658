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
    """Counts of plan features that matter at scale."""
    s = formatted_plan(df)
    return {
        "exchanges": s.count("(Exchange") + sum(1 for line in s.splitlines() if line.strip().startswith("Exchange")),
        "broadcast_joins": s.count("BroadcastHashJoin"),
        "sortmerge_joins": s.count("SortMergeJoin"),
        "shuffledhash_joins": s.count("ShuffledHashJoin"),
        "pushed_filters": sum(
            1 for line in s.splitlines() if "PushedFilters: [" in line and "PushedFilters: []" not in line
        ),
        "codegen_stages": s.count("WholeStageCodegen"),
    }
