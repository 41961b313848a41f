"""Mergeable distinct-count sketches: the pre-aggregated HLL rollup.

The profiling family already exposes the two endpoints of the
distinct-count spectrum — exact (operators/profile.py, the sf0.01 oracle
anchor) and one-shot ``approx_count_distinct`` (the benched scale flavor).
What neither gives a 100 TB warehouse is *reusability*: a dashboard that
needs distinct users per day AND per week AND overall must either rescan
the raw events for every granularity or store something mergeable.

This module is that third shape, built on Spark's Apache DataSketches
HLL functions (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``): aggregate the raw stream ONCE into per-day
binary sketches, then answer every coarser granularity by merging the
sketch column — no second pass over the data, unions cost bytes-per-day
not rows. This is the canonical pre-aggregation pattern for streaming +
batch distinct-count serving (the daily sketch table is what you persist
at ingest; rollups read only it).

Correctness posture: HLL estimates are algorithm-specific (DataSketches
HLL_4), so there is no DuckDB oracle — DuckDB's approx_count_distinct is
a different HLL implementation and cannot hash-match. The registry entry
is rows-only BY DESIGN (like viz_projection); the error contract is
enforced by tests instead: merged weekly/overall estimates must agree
with exact distinct counts within the published relative-error envelope
of lgConfigK=12 (~1.6% σ, tests assert 5%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_CONFIG_K = 12


def daily_user_sketches(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lg_config_k: int = LG_CONFIG_K,
) -> DataFrame:
    """The ingest-side table: (day, user sketch, n_events). One shuffle on
    day; the sketch column is the mergeable state every rollup reads."""
    return (
        events.select(F.to_date(ts_col).alias("day"), F.col(user_col))
        .groupBy("day")
        .agg(
            F.hll_sketch_agg(user_col, F.lit(lg_config_k)).alias("user_sketch"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def rollup_user_sketches(daily: DataFrame) -> DataFrame:
    """Merge the daily sketch table to weekly granularity plus an overall
    row — WITHOUT touching raw events. Returns
    (period, est_users, n_events) where period is the Monday of the week
    ('yyyy-MM-dd') or 'total'. Estimates are DataSketches HLL_4 unions:
    the weekly row is the union of its days, the total row the union of
    all days, so double-counting across days is impossible (the property
    a naive sum-of-daily-distincts gets wrong).
    """
    weekly = (
        daily.groupBy(
            F.date_format(F.date_trunc("week", "day"), "yyyy-MM-dd").alias("period")
        )
        .agg(
            F.hll_union_agg("user_sketch").alias("sk"),
            F.sum("n_events").alias("n_events"),
        )
    )
    total = daily.agg(
        F.lit("total").alias("period"),
        F.hll_union_agg("user_sketch").alias("sk"),
        F.sum("n_events").alias("n_events"),
    )
    return weekly.unionByName(total).select(
        "period",
        F.hll_sketch_estimate("sk").alias("est_users"),
        "n_events",
    )


def distinct_users_rollup(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lg_config_k: int = LG_CONFIG_K,
) -> DataFrame:
    """End-to-end convenience: raw events -> daily sketches -> weekly +
    total estimates. Production splits this at the daily table (persist it
    via sources/sinks.py:23 parquet sink — BINARY sketch column round-trips
    through parquet); the composed form is what the registry query runs.
    """
    return rollup_user_sketches(
        daily_user_sketches(events, user_col, ts_col, lg_config_k)
    )


def merge_daily_sketches(partials: DataFrame) -> DataFrame:
    """Compact an append-only PARTIAL sketch table (multiple rows per day,
    e.g. one per streaming micro-batch) back to one row per day. Sketch
    union is associative + idempotent-under-regrouping, so compaction
    changes layout, never answers; ``rollup_user_sketches`` gives the
    same result on partials or on the compacted table (tested)."""
    return partials.groupBy("day").agg(
        F.hll_union_agg("user_sketch").alias("user_sketch"),
        F.sum("n_events").alias("n_events"),
    )
