"""Column-level table profiling — the ANALYZE/data-quality primitive a
pipeline runs on every new ingest: per-column row/null/distinct counts and
min/max, in long format so any table profiles into one fixed schema.

Scale shape: ONE aggregation job. count/min/max are plain map-side-
combinable aggregates; the exact per-column distinct counts make Spark
plan a single Expand (one duplicated stream per DISTINCT column) feeding
one shuffle — the plan Catalyst produces for multi-count-distinct. At
open-data scale swap ``exact_distinct=False`` to HLL++
(approx_count_distinct), which removes the Expand entirely; the exact
flavor is kept as the DEFAULT because it is what the SQL oracle can
replay value-for-value.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    min_s, max_s) with min/max rendered as strings so heterogeneous column
    types share one output schema (timestamps via date_format for
    cross-engine stability)."""
    from pyspark.sql import types as T

    cols = list(columns) if columns is not None else df.columns
    n_rows = F.count(F.lit(1))

    def str_of(c: str):
        dt = df.schema[c].dataType
        if isinstance(dt, T.TimestampType):
            return lambda x: F.date_format(x, "yyyy-MM-dd HH:mm:ss")
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return lambda x: x.cast("decimal(38,6)").cast("string")
        return lambda x: x.cast("string")

    aggs = [n_rows.alias("n_rows")]
    for c in cols:
        s = str_of(c)
        aggs.append((n_rows - F.count(F.col(c))).alias(f"{c}__nulls"))
        aggs.append(
            (
                F.countDistinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(F.col(c))
            ).alias(f"{c}__distinct")
        )
        aggs.append(s(F.min(F.col(c))).alias(f"{c}__min"))
        aggs.append(s(F.max(F.col(c))).alias(f"{c}__max"))
    wide = df.agg(*aggs)
    # wide (1 row) -> long via stack: constant-folded, no second pass
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_s, max_s)"
        ),
        "n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")


def sql_profile_table(
    table: str,
    columns: Sequence[str],
    types: dict[str, str] | None = None,
) -> str:
    """DuckDB replay of ``profile_table``: one UNION ALL branch per column
    (DuckDB aggregates each branch over the shared scan). ``types`` maps a
    column to 'ts' or 'float' for the same string rendering Spark uses."""
    types = types or {}

    def render(c: str, agg: str) -> str:
        kind = types.get(c)
        if kind == "ts":
            return f"strftime({agg}({c}), '%Y-%m-%d %H:%M:%S')"
        if kind == "float":
            return f"CAST(CAST({agg}({c}) AS DECIMAL(38,6)) AS VARCHAR)"
        return f"CAST({agg}({c}) AS VARCHAR)"

    branches = [
        f"""
    SELECT '{c}' AS "column", count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           {render(c, 'min')} AS min_s,
           {render(c, 'max')} AS max_s
    FROM {table}"""
        for c in columns
    ]
    return "\n    UNION ALL".join(branches)
