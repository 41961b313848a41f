"""Incremental aggregate maintenance: the materialized-cube pattern.

Not in the reference (static inputs) — the warehouse shape a 100 TB
events pipeline actually serves from: a pre-aggregated (type x day) cube
maintained by MERGING each new batch's partial states, never by
re-scanning history. The algebra that makes it correct:

- keep only MERGEABLE states in the stored cube (count, sum, min, max —
  commutative monoids; HLL/count-min sketches extend the same idea to
  distincts/frequencies, see operators/sketches.py);
- derive non-mergeable measures (avg = sum/count) at READ time from the
  merged states — storing avg and "merging" it is the classic wrong
  answer (weights lost);
- merging is a union + re-aggregate on the SAME keys, so maintenance
  cost is O(batch + touched cells), not O(history), and the operation is
  idempotent under re-grouping (compaction never changes answers).

The registry query proves the contract cross-engine: history cube +
late-batch delta, merged, hash-matches DuckDB's single-shot full
aggregate over all events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n", "sum_cents", "min_cents", "max_cents")


def aggregate_state(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Fold a (micro-)batch to per-(group, day) mergeable states. Values
    are held as exact integer cents so merge order can never perturb a
    float sum."""
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.to_date(ts_col).alias("day"),
            cents.alias("_c"),
        )
        .groupBy("grp", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_c").alias("sum_cents"),
            F.min("_c").alias("min_cents"),
            F.max("_c").alias("max_cents"),
        )
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial-state tables cell-wise: counts/sums
    add, mins/maxes fold. Associative + commutative + idempotent under
    re-grouping — the properties that let compaction, backfill, and
    late-data merges all reuse one code path."""
    it = iter(states)
    unioned = next(it)
    for s in it:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("grp", "day").agg(
        F.sum("n").alias("n"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("min_cents").alias("min_cents"),
        F.max("max_cents").alias("max_cents"),
    )


def finalize(cube: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Read-time derivation of the non-mergeable measures from merged
    states (avg = sum/n — computed HERE, never stored/merged)."""
    return cube.select(
        F.col("grp").alias(group_col),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.round(F.col("sum_cents") / F.col("n") / 100.0, 6).alias("avg_value"),
    )


def sql_full_recompute(
    table: str = "events",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """The oracle is the DEFINITION the incremental path must equal: one
    full aggregate over all events."""
    return f"""
    SELECT {group_col}, strftime(CAST({ts_col} AS DATE), '%Y-%m-%d') AS day,
        count(*) AS n,
        CAST(sum(CAST(round({value_col} * 100) AS BIGINT)) AS BIGINT)
            AS sum_cents,
        min(CAST(round({value_col} * 100) AS BIGINT)) AS min_cents,
        max(CAST(round({value_col} * 100) AS BIGINT)) AS max_cents,
        round(CAST(sum(CAST(round({value_col} * 100) AS BIGINT)) AS DOUBLE)
              / count(*) / 100.0, 6) AS avg_value
    FROM {table}
    GROUP BY 1, 2
    """
