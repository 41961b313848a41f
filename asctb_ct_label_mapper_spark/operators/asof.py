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
    direction: str = "backward",
) -> DataFrame:
    """Backward (default) or forward inclusive as-of join.

    ``direction='forward'`` matches the EARLIEST right row at or after
    the left timestamp (the "next quote after the order" flavor);
    implemented by running the identical union + keyed-window machinery
    on NEGATED microsecond timestamps — backward-on-(-t) IS
    forward-on-t, so both directions share one code path and the
    tolerance semantics transfer unchanged (staleness becomes
    "match no further than `tolerance` AHEAD").

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
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    key_cols = list(key_cols)
    if direction == "forward":
        # reflect event time: backward-as-of on -t IS forward-as-of on t
        l2 = left.withColumn("_negt", -F.unix_micros(F.col(left_ts)))
        r2 = right.select(
            *key_cols,
            F.col(right_ts).alias("_rts"),
            *right_value_cols,
        ).withColumn("_negt", -F.unix_micros(F.col("_rts")))
        out = asof_join(
            l2,
            r2,
            key_cols,
            left_ts="_negt",
            right_ts="_negt",
            right_value_cols=["_rts", *right_value_cols],
            ts_suffix=ts_suffix,
            tolerance_seconds=tolerance_seconds,
        )
        return out.drop(f"_negt{ts_suffix}", "_negt").withColumnRenamed(
            "_rts", f"{right_ts}{ts_suffix}"
        )
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
        # on the forward (reflected) path _t is ALREADY negated micros
        # (bigint); on the backward path it is the raw timestamp
        def _us(c):
            return c if dict(matched.dtypes)["_t"] == "bigint" else F.unix_micros(c)

        stale = (
            _us(F.col("_t"))
            - _us(F.col("_m").getField(f"{right_ts}{ts_suffix}"))
        ) > F.lit(tol_us)
        matched = matched.withColumn(
            "_m",
            F.when(stale, F.lit(None).cast(matched.schema["_m"].dataType))
            .otherwise(F.col("_m")),
        )
    out_cols = [*left.columns, f"_m.{right_ts}{ts_suffix}", *[f"_m.{c}" for c in value_cols]]
    return matched.filter(F.col("_side") == 0).select(*out_cols)
