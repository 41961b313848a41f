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
serializes into one task's sort — ``asof_join(bucket=...)`` splits the
key range in TIME (coarse time buckets + a carry of each bucket's last
payload), not by salting, which would break the as-of continuity.

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

# internal column names, prefixed so user columns can't collide silently
# (guarded by an explicit check below)
_NEGT = "__asof_negt"
_RTS = "__asof_rts"
_T = "__asof_t"
_SIDE = "__asof_side"
_P = "__asof_p"
_M = "__asof_m"
_BK = "__asof_bk"
_BL = "__asof_bl"
_CARRY = "__asof_carry"
_INTERNAL = (_NEGT, _RTS, _T, _SIDE, _P, _M, _BK, _BL, _CARRY)


def _check_no_internal_collision(*dfs: DataFrame) -> None:
    for df in dfs:
        hit = [c for c in df.columns if c in _INTERNAL]
        if hit:
            raise ValueError(
                f"asof_join reserves internal column names {hit}; rename them"
            )


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
    bucket: str | None = None,
    _t_is_neg_micros: bool = False,
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
    keyed window, no row expansion) is unchanged. Requires TIMESTAMP
    ts columns (numeric epoch columns would need a unit declaration —
    convert with ``to_timestamp`` first; the forward path's internal
    negated-micros representation is flagged explicitly via
    ``_t_is_neg_micros``, never sniffed from the column type).

    ``bucket`` (e.g. ``'month'``): the SKEW-SAFE path — the same
    segmented-carry decomposition the EWMA scan uses. Instead of one
    window per key (a hot key serializes into one task's sort), the
    match splits into (1) a per-(key, time-bucket) window — partitions
    bounded by the bucket granularity — and (2) a per-key carry over
    BUCKET SUMMARIES (one row per (key, bucket) with the bucket's last
    right payload; dimension-sized, not data-sized), coalescing each
    row's within-bucket match with the carry from earlier buckets.
    Result-identical to the plain window (payloads are carried structs,
    no arithmetic — proven by test); costs one extra bounded window +
    one (key, bucket) equi-join. Composes with ``direction='forward'``
    (buckets computed on the reflected axis) and ``tolerance_seconds``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    key_cols = list(key_cols)
    if not _t_is_neg_micros:  # the reflected recursion owns _NEGT/_RTS
        _check_no_internal_collision(left, right)
    if direction == "forward":
        # reflect event time: backward-as-of on -t IS forward-as-of on t
        l2 = left.withColumn(_NEGT, -F.unix_micros(F.col(left_ts)))
        r2 = right.select(
            *key_cols,
            F.col(right_ts).alias(_RTS),
            *right_value_cols,
        ).withColumn(_NEGT, -F.unix_micros(F.col(_RTS)))
        out = asof_join(
            l2,
            r2,
            key_cols,
            left_ts=_NEGT,
            right_ts=_NEGT,
            right_value_cols=[_RTS, *right_value_cols],
            ts_suffix=ts_suffix,
            tolerance_seconds=tolerance_seconds,
            bucket=bucket,
            _t_is_neg_micros=True,
        )
        return out.drop(f"{_NEGT}{ts_suffix}", _NEGT).withColumnRenamed(
            _RTS, f"{right_ts}{ts_suffix}"
        )
    value_cols = list(right_value_cols)
    payload = F.struct(
        F.col(right_ts).alias(f"{right_ts}{ts_suffix}"),
        *[F.col(c) for c in value_cols],
    )
    # side=1 sorts BEFORE side=0 at equal ts (desc) -> inclusive match.
    ru = right.select(
        *key_cols,
        F.col(right_ts).alias(_T),
        F.lit(1).alias(_SIDE),
        payload.alias(_P),
    )
    lu = left.withColumn(_T, F.col(left_ts)).withColumn(_SIDE, F.lit(0))
    # unionByName(allowMissingColumns) null-fills each side's missing
    # columns: left gets a typed NULL payload, right gets NULL left columns.
    u = lu.unionByName(ru, allowMissingColumns=True)
    if bucket is None:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(_T).asc(), F.col(_SIDE).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(_M, F.last(_P, ignorenulls=True).over(w))
    else:
        # segmented-carry: the bucket key must be constant within a
        # bucket and monotone with _t. On the reflected (forward) path
        # _t is negated micros — truncate the recovered timestamp, then
        # negate its micros so bucket order still ascends with _t.
        if _t_is_neg_micros:
            bkc = -F.unix_micros(
                F.date_trunc(bucket, F.timestamp_micros(-F.col(_T)))
            )
        else:
            bkc = F.date_trunc(bucket, F.col(_T))
        u = u.withColumn(_BK, bkc)
        w1 = (
            Window.partitionBy(*key_cols, _BK)
            .orderBy(F.col(_T).asc(), F.col(_SIDE).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        within = u.withColumn(_M, F.last(_P, ignorenulls=True).over(w1))
        # bucket summaries: each (key, bucket)'s LAST right payload
        # (right rows only — unique per (key, ts), so max(struct) picks
        # the latest); buckets with no right rows join in as NULL and
        # the ignorenulls carry skips them
        rsum = (
            u.filter(F.col(_SIDE) == 1)
            .groupBy(*key_cols, _BK)
            .agg(
                F.max(
                    F.struct(F.col(_T).alias("t"), F.col(_P).alias("p"))
                ).alias(_BL)
            )
        )
        allbk = u.select(*key_cols, _BK).distinct()
        wc = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(_BK).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            allbk.join(rsum, [*key_cols, _BK], "left")
            .withColumn(
                _CARRY,
                F.last(
                    F.col(_BL).getField("p"), ignorenulls=True
                ).over(wc),
            )
            .select(*key_cols, _BK, _CARRY)
        )
        matched = within.join(carry, [*key_cols, _BK], "left").withColumn(
            _M, F.coalesce(F.col(_M), F.col(_CARRY))
        )
    if tolerance_seconds is not None:
        # round, don't truncate: int(8.2*1e6) is 8199999, which would
        # null an exactly-at-tolerance match (semantics are INCLUSIVE,
        # matching pandas merge_asof)
        tol_us = int(round(tolerance_seconds * 1_000_000))
        # the forward (reflected) recursion flags its already-negated
        # bigint micros explicitly — no type sniffing, so a caller's raw
        # numeric epoch column on the backward path fails loudly in
        # unix_micros instead of being silently misscaled
        def _us(c):
            return c if _t_is_neg_micros else F.unix_micros(c)

        stale = (
            _us(F.col(_T))
            - _us(F.col(_M).getField(f"{right_ts}{ts_suffix}"))
        ) > F.lit(tol_us)
        matched = matched.withColumn(
            _M,
            F.when(stale, F.lit(None).cast(matched.schema[_M].dataType))
            .otherwise(F.col(_M)),
        )
    out_cols = [
        *left.columns,
        f"{_M}.{right_ts}{ts_suffix}",
        *[f"{_M}.{c}" for c in value_cols],
    ]
    return matched.filter(F.col(_SIDE) == 0).select(*out_cols)
