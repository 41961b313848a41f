"""Round-13e: circular hour statistics, inter-event exponential fit,
Croston intermittent forecast — hand-computed fixtures."""

import math

from pyspark.sql import functions as F


def test_circular_mean_wraps_midnight(spark):
    """Events at 23:00 and 01:00: arithmetic mean says 12:00; the
    circular mean must say 00:00."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        circular_hour_stats,
    )

    ev = spark.createDataFrame(
        [
            (1, "view", "2024-01-01 23:00:00"),
            (2, "view", "2024-01-02 01:00:00"),
        ],
        "event_id long, event_type string, s string",
    ).select("event_id", "event_type", F.to_timestamp("s").alias("ts"))
    out = circular_hour_stats(ev).collect()[0]
    assert out["mean_hour"] < 0.01 or out["mean_hour"] > 23.99
    # both points 1h from mean: resultant = cos(2*pi/24)
    assert abs(out["resultant"] - math.cos(2 * math.pi / 24)) < 1e-6


def test_circular_spike_full_concentration(spark):
    from asctb_ct_label_mapper_spark.operators.behavior import (
        circular_hour_stats,
    )

    ev = spark.createDataFrame(
        [(i, "view", "2024-01-01 06:00:00") for i in range(5)],
        "event_id long, event_type string, s string",
    ).select("event_id", "event_type", F.to_timestamp("s").alias("ts"))
    out = circular_hour_stats(ev).collect()[0]
    assert abs(out["mean_hour"] - 6.0) < 1e-6
    assert abs(out["resultant"] - 1.0) < 1e-9
    assert out["p_value"] < 0.05  # n=5, z=5: clearly non-uniform


def test_interevent_exact_exponential_quantiles(spark):
    """Gaps drawn AT the exponential quantiles of their own mean give
    a small KS distance; a point mass gives a large one."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        interevent_exponential_fit,
    )

    # one user, constant 100 s gaps -> empirical CDF is a step at 100
    # while Exp(1/100) has F(100)=1-1/e ~= .632 -> D ~= .632
    rows = [(1, i, f"2024-01-01 00:{i:02d}:40") for i in range(10)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, s string"
    ).select(
        "user_id", "event_id", F.to_timestamp("s").alias("ts")
    )
    out = interevent_exponential_fit(ev).collect()[0]
    assert out["n_gaps"] == 9
    assert out["mean_gap_s"] == 60.0
    assert abs(out["ks_d"] - (1 - math.exp(-1))) < 1e-6
    assert bool(out["reject_05"]) is (
        out["ks_d"] > 1.36 / math.sqrt(9)
    )


def test_croston_hand_computed(spark):
    """Nonzero demands z = [2, 4] six days apart, alpha=0.5:
    z_hat = .5*2 + .5*4 -> weights: k=1 -> (1-a)^(K-1)=.5, k=2 -> a=.5
    -> z_hat = 3.0; intervals: single p=6 -> p_hat = 6;
    forecast = 0.5/day."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        croston_intermittent_daily,
    )

    rows = []
    eid = 0
    for d, c in [(0, 2), (6, 4)]:
        for _ in range(c):
            rows.append((eid, "error", d))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, day_idx int"
    ).select(
        "event_id",
        "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )
    out = croston_intermittent_daily(ev, alpha=0.5).collect()[0]
    assert out["n_days"] == 7 and out["n_nonzero"] == 2
    assert abs(out["z_hat"] - 3.0) < 1e-9
    assert abs(out["p_hat"] - 6.0) < 1e-9
    assert abs(out["forecast_per_day"] - 0.5) < 1e-9


def test_croston_single_spike_null_interval(spark):
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        croston_intermittent_daily,
    )

    ev = spark.createDataFrame(
        [(1, "error", 0)],
        "event_id long, event_type string, day_idx int",
    ).select(
        "event_id",
        "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )
    out = croston_intermittent_daily(ev).collect()[0]
    assert out["n_nonzero"] == 1
    assert out["p_hat"] is None and out["forecast_per_day"] is None
