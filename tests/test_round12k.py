"""Round-12 batch K: Kruskal-Wallis H, Brown-Forsythe variance test."""

import pytest
from pyspark.sql import functions as F


def _typed_values(spark, per_type_values):
    rows = []
    eid = 0
    for t, vals in per_type_values.items():
        for v in vals:
            rows.append((eid, t, float(v))); eid += 1
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_kruskal_wallis_replicates_scipy_formula(spark):
    """H matches the textbook tie-corrected formula computed in
    python on the same data; well-separated groups are significant."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        kruskal_wallis_value_by_type,
    )

    data = {
        "a": [1, 2, 3, 4, 5, 2, 3],
        "b": [6, 7, 8, 9, 10, 7, 8],
        "c": [11, 12, 13, 14, 15, 12, 13],
    }
    r = kruskal_wallis_value_by_type(_typed_values(spark, data)).collect()[0]
    # python replica: avg ranks over the pooled multiset
    pooled = sorted(
        (v, g) for g, vs in data.items() for v in vs
    )
    vals = [v for v, _ in pooled]
    from collections import Counter

    cnt = Counter(vals)
    below = {}
    run = 0
    for v in sorted(cnt):
        below[v] = run
        run += cnt[v]
    rank = {v: below[v] + (cnt[v] + 1) / 2.0 for v in cnt}
    n = len(vals)
    srr = 0.0
    for g, vs in data.items():
        rg = sum(rank[v] for v in vs)
        srr += rg * rg / len(vs)
    h = 12.0 * srr / (n * (n + 1)) - 3.0 * (n + 1)
    tie = sum(t**3 - t for t in cnt.values())
    hc = h / (1.0 - tie / (n**3 - n))
    assert r["n_total"] == n and r["k_groups"] == 3
    assert r["h_stat"] == pytest.approx(h, abs=1e-4)
    assert r["h_corrected"] == pytest.approx(hc, abs=1e-4)
    assert r["p_value"] < 0.05


def test_kruskal_wallis_identical_groups_near_zero(spark):
    from asctb_ct_label_mapper_spark.operators.stats import (
        kruskal_wallis_value_by_type,
    )

    data = {"a": [1, 2, 3, 4] * 3, "b": [1, 2, 3, 4] * 3}
    r = kruskal_wallis_value_by_type(_typed_values(spark, data)).collect()[0]
    assert abs(r["h_corrected"]) < 0.5
    assert r["p_value"] > 0.2


def test_brown_forsythe_equal_spread_small_f(spark):
    """Two groups with identical spread around different centers: the
    deviations-from-median samples coincide, F ~ 0."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        brown_forsythe_value_by_type,
    )

    a = [10 + d for d in (-2, -1, 0, 1, 2)] * 3
    b = [100 + d for d in (-2, -1, 0, 1, 2)] * 3
    r = brown_forsythe_value_by_type(
        _typed_values(spark, {"a": a, "b": b})
    ).collect()[0]
    assert r["k_groups"] == 2
    assert r["f_stat"] == pytest.approx(0.0, abs=1e-6)


def test_brown_forsythe_detects_unequal_spread(spark):
    """One tight group vs one wide group: large F; dofs correct."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        brown_forsythe_value_by_type,
    )

    tight = [50 + d * 0.1 for d in (-2, -1, 0, 1, 2)] * 4
    wide = [50 + d * 10 for d in (-2, -1, 0, 1, 2)] * 4
    r = brown_forsythe_value_by_type(
        _typed_values(spark, {"t": tight, "w": wide})
    ).collect()[0]
    assert r["n_total"] == 40
    assert r["df1"] == 1 and r["df2"] == 38
    assert r["f_stat"] > 20.0
