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
    # day-time INTERVAL casts to its total seconds; floor (not long-cast,
    # which truncates toward zero) keeps pre-epoch timestamps consistent
    # between the point and interval sides
    bucket_us = F.expr(f"INTERVAL {bucket}").cast("long") * F.lit(1_000_000)

    def to_bucket(ts_col: str):
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
