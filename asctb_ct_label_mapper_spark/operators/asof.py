"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key.

Not in the reference (no temporal joins there); a first-class
training-data-pipeline operator (feature lookups "as of" an event time,
config/state attachment to event streams). Spark has no native ASOF JOIN
(DuckDB does — which makes this operator fully oracle-checkable).

Engine design — the SCALABLE formulation, not a range join:

    union(right-tagged, left-tagged)
      -> window per key, ordered by (ts, side)
      -> last non-null right payload at or before each row
      -> keep left rows

One hash shuffle on the key (the window sort), zero row expansion. The
naive alternatives either explode (inequality theta-join -> O(L*R) pairs
per key before filtering) or need a per-key reduction that re-implements
exactly this window. At 100 TB: both inputs shuffle once on the key;
per-key data is sorted within partitions (Spark's window sort spills);
the payload struct is the only carried state. Skew: a single hot key
serializes into one task's sort — mitigate upstream by splitting the key
range in TIME (window the key by coarse time buckets and carry the last
payload across bucket boundaries), not by salting, which would break the
as-of continuity.

Semantics (matches DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND
l.ts >= r.ts`): backward-looking, inclusive; left rows with no prior
right row keep NULL payloads. Right rows must be unique per (key, ts) —
deduplicate first (the registry query aggregates) or the winner is
sort-order dependent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: Sequence[str] = (),
    ts_suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward inclusive as-of join.

    Returns every ``left`` row plus ``<right_ts><ts_suffix>`` (the matched
    right timestamp) and each of ``right_value_cols`` — all NULL when no
    right row at or before the left timestamp exists for the key.

    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)`` /
    kdb ``wj`` semantics): a match older than the tolerance is treated
    as NO match (NULL payload) — the staleness cap every market-data /
    telemetry join eventually needs. Implemented as a post-window
    null-out of the matched struct, so the plan shape (one union + one
    keyed window, no row expansion) is unchanged.
    """
    key_cols = list(key_cols)
    value_cols = list(right_value_cols)
    payload = F.struct(
        F.col(right_ts).alias(f"{right_ts}{ts_suffix}"),
        *[F.col(c) for c in value_cols],
    )
    # side=1 sorts BEFORE side=0 at equal ts (desc) -> inclusive match.
    ru = right.select(
        *key_cols,
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        payload.alias("_p"),
    )
    lu = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(0))
    # unionByName(allowMissingColumns) null-fills each side's missing
    # columns: left gets a typed NULL payload, right gets NULL left columns.
    u = lu.unionByName(ru, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        # round, don't truncate: int(8.2*1e6) is 8199999, which would
        # null an exactly-at-tolerance match (semantics are INCLUSIVE,
        # matching pandas merge_asof)
        tol_us = int(round(tolerance_seconds * 1_000_000))
        stale = (
            F.unix_micros(F.col("_t"))
            - F.unix_micros(F.col("_m").getField(f"{right_ts}{ts_suffix}"))
        ) > F.lit(tol_us)
        matched = matched.withColumn(
            "_m",
            F.when(stale, F.lit(None).cast(matched.schema["_m"].dataType))
            .otherwise(F.col("_m")),
        )
    out_cols = [*left.columns, f"_m.{right_ts}{ts_suffix}", *[f"_m.{c}" for c in value_cols]]
    return matched.filter(F.col("_side") == 0).select(*out_cols)
