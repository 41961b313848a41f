"""Round-13d: daily-series diagnostics — hand-computed fixtures."""

import math

from pyspark.sql import functions as F


def _daily(spark, counts, start="2024-01-01"):
    """Build an events frame whose daily counts equal ``counts``."""
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, d))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, day_idx int"
    ).select(
        "event_id",
        (
            F.to_timestamp(F.lit(f"{start} 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_pettitt_finds_level_shift(spark):
    """10 low days then 10 high days: the changepoint lands at the end
    of the low block and K is large."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        pettitt_changepoint_daily,
    )

    out = pettitt_changepoint_daily(
        _daily(spark, [2] * 10 + [9] * 10)
    ).collect()[0]
    assert out["n"] == 20
    assert out["change_day"] == "2024-01-10"  # day index 9 (last low)
    # U at the split = 2*sum(low ranks) - 10*21 = 2*55 - 210 = -100
    assert out["k_stat"] == 100.0
    assert out["p_value"] < 0.01


def test_buishand_constant_series_degenerates(spark):
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        buishand_range_daily,
    )

    out = buishand_range_daily(_daily(spark, [3] * 8)).collect()[0]
    # s = 0 -> try_divide NULL (never a crash)
    assert out["range_stat"] is None


def test_von_neumann_alternating_series(spark):
    """Strict alternation 1,5,1,5,...: VN ratio > 2 (negative serial
    correlation). n=8: num = 7*16, den = 8*4 -> VN = 3.5."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        von_neumann_ratio_daily,
    )

    out = von_neumann_ratio_daily(
        _daily(spark, [1, 5, 1, 5, 1, 5, 1, 5])
    ).collect()[0]
    assert abs(out["vn_ratio"] - 3.5) < 1e-6
    assert out["z"] > 0


def test_cox_stuart_monotone_increase(spark):
    """Strictly increasing 1..8: all 4 pairs increase, S+ = 4."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        cox_stuart_trend_daily,
    )

    out = cox_stuart_trend_daily(
        _daily(spark, [1, 2, 3, 4, 5, 6, 7, 8])
    ).collect()[0]
    assert out["n_pairs"] == 4
    assert out["s_plus"] == 4 and out["n_untied"] == 4
    # z = (|4-2| - .5)/sqrt(1) = 1.5
    assert abs(out["z"] - 1.5) < 1e-6


def test_cox_stuart_odd_drops_middle(spark):
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        cox_stuart_trend_daily,
    )

    out = cox_stuart_trend_daily(
        _daily(spark, [1, 2, 3, 4, 5, 6, 7])
    ).collect()[0]
    # n=7, half=4: pairs (0,4),(1,5),(2,6) -> 3 pairs, middle unused
    assert out["n_pairs"] == 3


def test_variance_ratio_iid_like_near_one(spark):
    """Alternating increments make q-sums cancel: VR well below 1
    (mean reversion) — sign check, not magnitude."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        variance_ratio_daily,
    )

    counts = [5, 1] * 15
    out = variance_ratio_daily(_daily(spark, counts), q=2).collect()[0]
    assert out["vr"] is not None and out["vr"] < 1.0
    assert out["z"] < 0


def test_durbin_watson_perfect_line_degenerates(spark):
    """Perfectly linear counts: residuals all ~0 -> DW NULL via
    try_divide (0/0), never a crash."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        durbin_watson_daily,
    )

    out = durbin_watson_daily(
        _daily(spark, [1, 2, 3, 4, 5, 6])
    ).collect()[0]
    assert abs(out["slope"] - 1.0) < 1e-9
    assert out["dw"] is None


def test_durbin_watson_alternating_high(spark):
    """Alternating residuals around a flat trend -> DW near 4."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        durbin_watson_daily,
    )

    out = durbin_watson_daily(
        _daily(spark, [1, 5, 1, 5, 1, 5, 1, 5])
    ).collect()[0]
    assert out["dw"] is not None and out["dw"] > 3.0
