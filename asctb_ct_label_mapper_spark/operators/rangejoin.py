"""Range (interval-containment) join — match points to the intervals that
contain them, as an EQUI-join.

Not in the reference; a first-class training-pipeline operator (events
inside maintenance/error/session windows, readings inside validity
intervals). Spark executes a raw `start <= p AND p <= end` theta-join as
BroadcastNestedLoopJoin (or a cartesian product when neither side fits
broadcast) — O(L*R) comparisons per key. This operator bucketizes time so
Catalyst gets a plain hash equi-join:

    intervals: explode to every bucket the interval overlaps
    points:    bucket containing the point
    join on (keys..., bucket), then the EXACT containment filter

A point lies in exactly ONE bucket, so each (point, interval) pair meets
in at most one bucket — no post-join dedup. Row expansion is only on the
interval side: ceil(len/bucket)+1 rows per interval; pick the bucket near
the typical interval length to keep it ~2x.

At 100 TB: one hash shuffle per side on (keys, bucket); bucket ids are
time-uniform so no skew beyond genuine hot windows; the exact filter is
evaluated inside the join's codegen stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interval_micros(bucket: str):
    """Bucket width in MICROSECONDS from an interval string. NOT
    ``INTERVAL x``.cast('long') — that returns the count in the
    interval's own unit ('10 minutes' -> 10, '1 hour' -> 1; verified
    on Spark 4), which silently shrank buckets by the unit factor and
    exploded every interval to thousands of rows (r9 review finding).
    Epoch + interval, re-read as micros, is unit-correct and
    constant-folded."""
    return F.unix_micros(
        F.to_timestamp(F.lit("1970-01-01 00:00:00"))
        + F.expr(f"INTERVAL {bucket}")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "10 minutes",
) -> DataFrame:
    """Inner join of ``points`` to the ``intervals`` containing them
    (inclusive both ends), keyed by ``key_cols``. Returns all point
    columns plus all interval columns (minus duplicated keys)."""
    key_cols = list(key_cols)
    bucket_us = _interval_micros(bucket)

    def to_bucket(ts_col: str):
        # floor (not long-cast, which truncates toward zero) keeps
        # pre-epoch timestamps consistent between the two sides
        return F.floor(F.unix_micros(F.col(ts_col)) / bucket_us).cast("long")

    p = points.withColumn("_b", to_bucket(point_ts))
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(to_bucket(start_ts), to_bucket(end_ts)))
    )
    iv_cols = [c for c in intervals.columns if c not in key_cols]
    joined = p.join(iv, [*key_cols, "_b"]).filter(
        (F.col(start_ts) <= F.col(point_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.select(*points.columns, *iv_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: str = "10 minutes",
) -> DataFrame:
    """Inner join of overlapping INTERVAL pairs (inclusive ends:
    ``l.start <= r.end AND r.start <= l.end``), keyed by ``key_cols`` —
    the interval-x-interval generalization of ``range_join``, still a
    plain hash EQUI-join.

    Both sides explode to the buckets they cover, so an overlapping
    pair meets in EVERY shared bucket; instead of a post-join distinct,
    each pair is kept only in its canonical first shared bucket
    (``_b == greatest(bucket(l.start), bucket(r.start))`` — the overlap
    of two intervals starts at the later start, so that bucket is
    always shared). Zero dedup shuffle; expansion is ceil(len/bucket)+1
    per interval per side.

    Returns all left columns plus the right's non-key columns (caller
    aliases collisions first)."""
    key_cols = list(key_cols)
    overlap = [c for c in right.columns if c in left.columns and c not in key_cols]
    if overlap:
        raise ValueError(
            f"alias right columns colliding with left: {overlap}"
        )
    bucket_us = _interval_micros(bucket)

    def to_bucket(ts_col: str):
        return F.floor(F.unix_micros(F.col(ts_col)) / bucket_us).cast("long")

    lv = left.withColumn(
        "_b", F.explode(F.sequence(to_bucket(left_start), to_bucket(left_end)))
    )
    rv = right.withColumn(
        "_b",
        F.explode(F.sequence(to_bucket(right_start), to_bucket(right_end))),
    )
    r_cols = [c for c in right.columns if c not in key_cols]
    joined = lv.join(rv, [*key_cols, "_b"]).filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (
            F.col("_b")
            == F.greatest(to_bucket(left_start), to_bucket(right_start))
        )
    )
    return joined.select(*left.columns, *r_cols)
