"""Physical-plan audit helpers.

The engine's performance contract is plan-shaped (SURVEY §4): broadcast
joins where a side is small, filters pushed to the parquet scan, pruned
read schemas, no row-at-a-time Python in hot paths. These helpers turn those
contracts into assertions so tests fail when a plan regresses — e.g. a
cross join silently becoming a shuffle join, or a filter lifting off the
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan is missing {missing}:\n{plan}")


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    """The small side must ship as a broadcast, not a shuffle."""
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join:\n{plan}")


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """A predicate must reach the parquet scan (PushedFilters: [...])."""
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    if not any(fragment in line for line in pushed):
        raise AssertionError(
            f"filter {fragment!r} not pushed to scan; PushedFilters lines: {pushed}\n{plan}"
        )
