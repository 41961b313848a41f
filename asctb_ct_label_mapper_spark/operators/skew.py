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
