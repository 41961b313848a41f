"""Skew-mitigation patterns (engine brief: "skewed keys -> salting or AQE
skew-join").

AQE's skew-join splitting (on in ``session.py``) is the first line of
defense; these operators are the explicit fallbacks for the cases AQE does
not cover:

- ``salted_join`` — shuffle-join a fact table whose join key is heavily
  skewed against a small-but-not-broadcastable dim: the fact side is salted
  deterministically (hash of a designated distributor column), the dim side
  is replicated once per salt, so one hot key fans out over ``n_salts``
  reducers instead of one. Deterministic (no rand()): same input -> same
  partitioning -> reproducible plans.
- ``two_phase_distinct_count`` — COUNT(DISTINCT x) per skewed group as
  (group, x) pre-dedup then count: the first shuffle spreads a hot group
  over all its distinct values; the second aggregates counts only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    distributor: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key. ``distributor`` names a big-side column
    whose hash spreads rows of one key across salts (defaults to all
    big-side columns — stable but costlier to hash)."""
    dist_cols = [distributor] if distributor else big.columns
    salted_big = big.withColumn("_salt", F.pmod(F.hash(*dist_cols), F.lit(n_salts)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def two_phase_distinct_count(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """COUNT(DISTINCT value) per group in two shuffles that both spread hot
    groups: dedup on (group, value), then count per group."""
    deduped = df.select(*group_cols, value_col).dropDuplicates([*group_cols, value_col])
    return deduped.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(f"n_distinct_{value_col}")
    )


def key_skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Key-distribution diagnostics — the pre-flight measurement behind
    every skew decision this module's operators (and AQE) make: the top
    ``top_n`` keys with row count, share of all rows, and cumulative
    share, plus the global key count, per row.

    Returns (rank, key, n_rows, share, cum_share, n_keys) — a hot key
    with share 0.7 says "salt this join"; a flat cum_share says the
    default hash partitioning is fine.

    Scale shape: one map-side-combinable groupBy(key), a one-row global
    aggregate broadcast back, TakeOrdered for the top slice, and the
    cumulative window runs over top_n rows (bytes). Nothing data-sized
    crosses a single partition."""
    # NULL keys are a real (often the hottest) group: coalesce to a
    # sentinel so both engines rank them identically (Spark ties sort
    # NULLS FIRST, DuckDB NULLS LAST — a NULL key on a tie boundary
    # would diverge)
    counts = df.groupBy(
        F.coalesce(F.col(key_col).cast("string"), F.lit("<null>")).alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(
                (F.sum("n_rows").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ) / F.col("_total")),
                6,
            ).alias("cum_share"),
            "n_keys",
        )
    )


def sql_key_skew_report(table: str, key_col: str, top_n: int = 10) -> str:
    """DuckDB replay of ``key_skew_report``."""
    return f"""
    WITH counts AS (
        SELECT coalesce(CAST({key_col} AS VARCHAR), '<null>') AS key,
            count(*) AS n_rows
        FROM {table} GROUP BY 1
    ), totals AS (
        SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
            count(*) AS n_keys FROM counts
    ), top AS (
        SELECT key, n_rows,
            row_number() OVER (ORDER BY n_rows DESC, key) AS rank,
            CAST(sum(n_rows) OVER (ORDER BY n_rows DESC, key
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_rows
        FROM counts
    )
    SELECT rank, key, CAST(n_rows AS BIGINT) AS n_rows,
        round(n_rows / total, 6) AS share,
        round(cum_rows / total, 6) AS cum_share,
        CAST(n_keys AS BIGINT) AS n_keys
    FROM top, totals
    WHERE rank <= {top_n}
    """
