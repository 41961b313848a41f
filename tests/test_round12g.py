"""Round-12 batch G: IV/Wald causal estimate, PACF (Durbin-Levinson),
Hurst rescaled-range exponent."""

import math

import pytest
from pyspark.sql import functions as F


def test_iv_wald_recovers_planted_effect(spark):
    """Construct compliance: arm 1 users get 2 extra views each, and
    every view causes exactly 3.0 of purchase value (plus a per-user
    confounder that hits both x and y — OLS would be biased, IV is
    not). beta_iv = ITT_y / first_stage = (2*3)/2 = 3."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        iv_wald_estimate,
    )

    rows = []
    for u in range(40):
        arm = u % 2
        conf = u % 5  # confounder: extra views AND extra spend
        views = 1 + conf + (2 if arm == 1 else 0)
        rows += [(u, "view", 0.0)] * views
        rows.append((u, "purchase", 3.0 * views + 10.0 * conf))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )
    r = iv_wald_estimate(ev).collect()[0]
    assert r["n0"] == 20 and r["n1"] == 20
    assert r["first_stage"] == pytest.approx(2.0, abs=1e-6)
    assert r["beta_iv"] == pytest.approx(3.0, abs=1e-4)


def test_iv_wald_null_first_stage_null_beta(spark):
    """Instrument moves nothing (same exposure in both arms): beta
    degrades to NULL via try_divide."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        iv_wald_estimate,
    )

    rows = []
    for u in range(10):
        rows.append((u, "view", 0.0))
        rows.append((u, "purchase", 5.0))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )
    r = iv_wald_estimate(ev).collect()[0]
    assert r["first_stage"] == pytest.approx(0.0)
    assert r["beta_iv"] is None


def _daily_events(spark, counts, t0="2024-01-01"):
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append((i * 1000 + j, i))
    df = spark.createDataFrame(rows, "event_id long, day_idx int")
    return df.select(
        "event_id",
        (
            F.to_timestamp(F.lit(t0 + " 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_pacf_ar1_cuts_off_after_lag1(spark):
    """For an AR(1)-like geometric-ACF series, pacf(1) = r1 while
    pacf(2) and pacf(3) are near zero (the defining cutoff).  Exact
    identity checked directly from the series' own autocovariances."""
    from asctb_ct_label_mapper_spark.operators.stats import pacf_daily

    # deterministic pseudo-AR(1): y_t = round(20 + 0.6*(y_{t-1}-20)+pulse)
    y = [20]
    pulses = [3, -2, 4, -1, 0, 2, -3, 1, 5, -4] * 3
    for t in range(1, 30):
        y.append(int(round(20 + 0.6 * (y[-1] - 20) + pulses[t % 30])))
    out = {r["lag"]: r["pacf"] for r in
           pacf_daily(_daily_events(spark, y)).collect()}
    # replicate the closed form in python for the same series
    import numpy as np

    arr = np.array(y, dtype=float)
    d = arr - arr.mean()
    c0 = float((d * d).sum())
    r = [float((d[k:] * d[:-k]).sum()) / c0 for k in (1, 2, 3)]
    p11 = r[0]
    p22 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
    p21 = r[0] * (1 - p22)
    p33 = (r[2] - p21 * r[1] - p22 * r[0]) / (1 - p21 * r[0] - p22 * r[1])
    assert out[1] == pytest.approx(p11, abs=1e-5)
    assert out[2] == pytest.approx(p22, abs=1e-5)
    assert out[3] == pytest.approx(p33, abs=1e-5)


def test_pacf_constant_series_null(spark):
    from asctb_ct_label_mapper_spark.operators.stats import pacf_daily

    out = pacf_daily(_daily_events(spark, [4] * 12)).collect()
    assert len(out) == 3
    assert all(r["pacf"] is None for r in out)


def test_hurst_monotone_trend_high(spark):
    """A strongly trending series is persistent: H well above 0.5; the
    per-size detail keeps complete blocks only."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        hurst_rs_daily,
    )

    counts = [2 + t for t in range(30)]
    out = hurst_rs_daily(_daily_events(spark, counts)).collect()
    by_m = {r["block_size"]: r for r in out}
    assert set(by_m) == {5, 10, 15}
    assert by_m[5]["n_blocks"] == 6
    assert by_m[10]["n_blocks"] == 3
    assert by_m[15]["n_blocks"] == 2
    h = out[0]["hurst"]
    assert all(r["hurst"] == h for r in out)
    assert h > 0.7


def test_hurst_alternating_series_low(spark):
    """A strictly alternating (mean-reverting) series has H well below
    0.5 — the R/S range stops growing with block size."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        hurst_rs_daily,
    )

    counts = [3 if t % 2 == 0 else 9 for t in range(30)]
    out = hurst_rs_daily(_daily_events(spark, counts)).collect()
    assert out[0]["hurst"] < 0.3
