"""Round-12 batch J: Friedman test, Cronbach's alpha, Ljung-Box
portmanteau, Wald-Wolfowitz runs test."""

import math

import pytest
from pyspark.sql import functions as F


def _daily_typed(spark, per_type_counts):
    rows = []
    eid = 0
    for t, counts in per_type_counts.items():
        for d, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, t, d)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, day_idx int"
    )
    return df.select(
        "event_id", "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def _daily_events(spark, counts):
    return _daily_typed(spark, {"view": counts})


def test_friedman_consistent_ordering_large_chi2(spark):
    """Type a always beats b always beats c within every day: mean
    ranks are (3, 2, 1) exactly and chi2 hits its maximum 12n(k-1)/
    (k(k+1)) * ... — just assert chi2 equals the closed form for
    perfectly consistent ranks: n * (k-1) ... computed directly."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        friedman_test_daily_types,
    )

    n_days = 10
    ev = _daily_typed(spark, {
        "a": [9 + d for d in range(n_days)],
        "b": [5 + d for d in range(n_days)],
        "c": [1 + d for d in range(n_days)],
    })
    r = friedman_test_daily_types(ev).collect()[0]
    assert r["k_types"] == 3 and r["n_days"] == n_days
    # mean ranks 1,2,3 -> ssq = (1-2)^2 + 0 + (3-2)^2 = 2
    want = 12.0 * n_days / (3 * 4) * 2.0
    assert r["chi2"] == pytest.approx(want, abs=1e-6)
    assert r["p_value"] < 0.05


def test_friedman_identical_series_zero(spark):
    """All types identical every day: every rank is the tied average,
    ssq = 0, chi2 = 0, p ~ 1."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        friedman_test_daily_types,
    )

    ev = _daily_typed(spark, {
        "a": [4, 7, 2, 9, 5, 6],
        "b": [4, 7, 2, 9, 5, 6],
        "c": [4, 7, 2, 9, 5, 6],
    })
    r = friedman_test_daily_types(ev).collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-6)


def test_cronbach_perfectly_correlated_items(spark):
    """k identical items: Σvar_i = k·v, var_total = k²·v, so
    α = k/(k−1)·(1 − 1/k) = 1 exactly."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        cronbach_alpha_daily_types,
    )

    base = [3, 8, 2, 9, 4, 7, 1, 6]
    ev = _daily_typed(spark, {"a": base, "b": base, "c": base})
    r = cronbach_alpha_daily_types(ev).collect()[0]
    assert r["k_types"] == 3
    assert r["alpha"] == pytest.approx(1.0, abs=1e-6)


def test_cronbach_replicates_python_formula(spark):
    """General case: replicate the population-variance formula in
    python on the same spine."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        cronbach_alpha_daily_types,
    )

    a = [3, 8, 2, 9, 4, 7, 1, 6]
    b = [5, 1, 7, 2, 8, 3, 9, 4]
    ev = _daily_typed(spark, {"a": a, "b": b})
    r = cronbach_alpha_daily_types(ev).collect()[0]

    def pvar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    tot = [x + y for x, y in zip(a, b)]
    want = 2.0 / 1.0 * (1.0 - (pvar(a) + pvar(b)) / pvar(tot))
    assert r["alpha"] == pytest.approx(want, abs=1e-5)


def test_ljung_box_replicates_python_formula(spark):
    """Q matches the textbook formula computed in python on the same
    series; a strongly autocorrelated series is significant."""
    from asctb_ct_label_mapper_spark.operators.stats import ljung_box_daily

    counts = [10, 12, 14, 16, 18, 20, 18, 16, 14, 12,
              10, 12, 14, 16, 18, 20, 18, 16, 14, 12]
    r = ljung_box_daily(_daily_events(spark, counts), max_lag=5).collect()[0]
    ys = [float(c) for c in counts]
    m = sum(ys) / len(ys)
    d = [y - m for y in ys]
    c0 = sum(x * x for x in d)
    n = len(ys)
    q = 0.0
    for k in range(1, 6):
        rk = sum(d[i] * d[i - k] for i in range(k, n)) / c0
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert r["n_days"] == n and r["max_lag"] == 5 and r["df"] == 5
    assert r["q_stat"] == pytest.approx(q, abs=1e-4)
    assert r["p_value"] < 0.05


def test_ljung_box_constant_series_null(spark):
    from asctb_ct_label_mapper_spark.operators.stats import ljung_box_daily

    r = ljung_box_daily(_daily_events(spark, [5] * 12)).collect()[0]
    assert r["q_stat"] is None and r["p_value"] is None


def test_runs_test_alternating_vs_clustered(spark):
    """Alternating above/below gives the maximum number of runs
    (z > 0); a clustered series (all lows then all highs) gives 2 runs
    (z < 0). Counts replicate the hand formula."""
    from asctb_ct_label_mapper_spark.operators.stats import runs_test_daily

    # a distinct middle value (5) IS the median and drops, leaving the
    # 2/9 alternation intact on both sides of it
    alt = [2, 9] * 8 + [5]
    r = runs_test_daily(_daily_events(spark, alt)).collect()[0]
    assert r["n_above"] == 8 and r["n_below"] == 8
    assert r["n_runs"] == 16
    assert r["expected_runs"] == pytest.approx(2 * 8 * 8 / 16 + 1)
    assert r["z"] > 2.0

    clu = [2] * 8 + [5] + [9] * 8
    r2 = runs_test_daily(_daily_events(spark, clu)).collect()[0]
    assert r2["n_runs"] == 2
    assert r2["z"] < -2.0


def test_runs_test_median_days_dropped(spark):
    """Days exactly at the (lower) median carry no sign and drop from
    the run sequence."""
    from asctb_ct_label_mapper_spark.operators.stats import runs_test_daily

    counts = [1, 5, 9, 5, 1, 9, 5, 1, 9]  # median 5 appears 3x
    r = runs_test_daily(_daily_events(spark, counts)).collect()[0]
    assert r["n_days"] == 6  # the three 5s dropped
    assert r["n_above"] == 3 and r["n_below"] == 3
