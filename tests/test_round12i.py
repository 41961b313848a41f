"""Round-12 batch I: Heaps-law fit, weekly audience overlap,
index-of-dispersion test, journey edit-distance matrix."""

import math

import pytest
from pyspark.sql import functions as F


def test_heaps_fit_exact_power_law(spark):
    """A corpus engineered so the vocab-growth curve IS a power law
    recovers beta ~ the planted exponent with r2 ~ 1.  Planting: shard
    s contributes tokens so cumulative vocab = corpus^0.5 exactly is
    hard; instead verify the fit reproduces a python replica of the
    same curve points."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        heaps_fit,
        vocab_growth,
    )

    rows = []
    # 20 docs, growing vocabulary: doc i introduces words w{i}_0..w{i}_k
    for i in range(20):
        toks = [f"w{i}_{j}" for j in range(1 + i % 4)] + ["the"] * 3
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curve = [
        (r["corpus_grams"], r["vocab_size"])
        for r in vocab_growth(docs).collect()
        if r["vocab_size"] > 0 and r["corpus_grams"] > 0
    ]
    xs = [math.log(c) for c, v in curve]
    ys = [math.log(v) for c, v in curve]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / n)
    r = heaps_fit(docs).collect()[0]
    assert r["n_points"] == n
    assert r["beta"] == pytest.approx(beta, abs=1e-5)
    assert r["k_coef"] == pytest.approx(k, rel=1e-4)


def _week_events(spark, user_weeks):
    rows = []
    eid = 0
    for u, wks in user_weeks.items():
        for w in wks:
            rows.append((eid, u, "view", 7 * w)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, day_idx int"
    )
    return df.select(
        "event_id", "user_id", "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_audience_overlap_hand_counts(spark):
    """Weeks {0:{1,2,3}, 1:{2,3,4}, 2:{4}}: overlap(0,1) = 2/4,
    retained = 2/3; overlap(1,2) = 1/3 with retained 1/3."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        audience_overlap_weekly,
    )

    uw = {1: [0], 2: [0, 1], 3: [0, 1], 4: [1, 2]}
    out = {r["week_a"]: r for r in
           audience_overlap_weekly(_week_events(spark, uw)).collect()}
    r01 = out[0]
    assert (r01["n_a"], r01["n_b"], r01["n_common"]) == (3, 3, 2)
    assert r01["jaccard"] == pytest.approx(0.5)
    assert r01["retained_share"] == pytest.approx(2 / 3, abs=1e-6)
    r12 = out[1]
    assert (r12["n_a"], r12["n_b"], r12["n_common"]) == (3, 1, 1)
    assert r12["jaccard"] == pytest.approx(1 / 3, abs=1e-6)


def test_audience_overlap_disjoint_weeks(spark):
    from asctb_ct_label_mapper_spark.operators.behavior import (
        audience_overlap_weekly,
    )

    uw = {1: [0], 2: [1]}
    out = audience_overlap_weekly(_week_events(spark, uw)).collect()
    assert len(out) == 1
    assert out[0]["n_common"] == 0
    assert out[0]["jaccard"] == pytest.approx(0.0)


def _daily_typed(spark, per_type_counts):
    """per_type_counts: {type: [daily counts]}."""
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


def test_dispersion_constant_vs_bursty(spark):
    """A constant series has variance 0 -> dispersion 0 (maximal
    under-dispersion); a bursty all-or-nothing series has dispersion
    far above 1."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        dispersion_test_by_type,
    )

    ev = _daily_typed(spark, {
        "flat": [4] * 12,
        "bursty": [0, 0, 24, 0, 0, 24, 0, 0, 0, 0, 0, 0],
    })
    out = {r["event_type"]: r for r in
           dispersion_test_by_type(ev).collect()}
    assert out["flat"]["dispersion"] == pytest.approx(0.0)
    assert out["bursty"]["dispersion"] > 5.0
    assert out["bursty"]["mean"] == pytest.approx(4.0)
    # spine: both types share the same 12-day calendar
    assert out["flat"]["n_days"] == 12 and out["bursty"]["n_days"] == 12


def test_dispersion_spine_zero_fills_other_type(spark):
    """A type active only on day 0 still spans the full calendar (the
    other type's days are genuine zeros for it)."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        dispersion_test_by_type,
    )

    ev = _daily_typed(spark, {"a": [3, 3, 3, 3, 3], "b": [5]})
    out = {r["event_type"]: r for r in
           dispersion_test_by_type(ev).collect()}
    assert out["b"]["n_days"] == 5
    assert out["b"]["mean"] == pytest.approx(1.0)


def test_journey_distance_hand_paths(spark):
    """Two dominant paths 'vcp' (x3 users) and 'vp' (x2): lev = 1,
    similarity = 1 - 1/3."""
    from asctb_ct_label_mapper_spark.operators.funnel import (
        journey_distance_matrix,
    )

    rows = []
    eid = 0
    for u in range(3):   # view click purchase
        for j, t in enumerate(["view", "click", "purchase"]):
            rows.append((eid, u, t, j)); eid += 1
    for u in range(3, 5):  # view purchase
        for j, t in enumerate(["view", "purchase"]):
            rows.append((eid, u, t, j)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, minute int"
    ).select(
        "event_id", "user_id", "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("minute"))
        ).alias("ts"),
    )
    out = journey_distance_matrix(df).collect()
    assert len(out) == 1
    r = out[0]
    assert {r["path_a"], r["path_b"]} == {"vcp", "vp"}
    assert (r["n_a"], r["n_b"]) in ((3, 2), (2, 3))
    assert r["lev"] == 1
    assert r["similarity"] == pytest.approx(1 - 1 / 3, abs=1e-6)
