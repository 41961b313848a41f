"""Round-12 batch H: Granger causality, sBG retention projection,
Markov entropy rate."""

import math

import pytest
from pyspark.sql import functions as F


def _pair_events(spark, views, purchases, t0="2024-01-01"):
    """views/purchases: per-day counts for the two types."""
    rows = []
    eid = 0
    for d, (a, b) in enumerate(zip(views, purchases)):
        for _ in range(a):
            rows.append((eid, 1, "view", d)); eid += 1
        for _ in range(b):
            rows.append((eid, 1, "purchase", d)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, day_idx int"
    )
    return df.select(
        "event_id",
        "user_id",
        "event_type",
        (
            F.to_timestamp(F.lit(t0 + " 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_granger_planted_lead_relationship(spark):
    """purchases_t = views_{t-1} exactly: the unrestricted fit is
    near-perfect while purchase history alone is not -> large F and
    beta_cause ~ 1."""
    from asctb_ct_label_mapper_spark.operators.stats import granger_daily

    views = [3, 7, 2, 9, 4, 8, 1, 6, 5, 10, 3, 7, 2, 9]
    purchases = [0] + views[:-1]  # exact one-day lag
    ev = _pair_events(spark, views, purchases)
    r = granger_daily(ev, "view", "purchase").collect()[0]
    assert r["n"] == 13
    assert r["sse_u"] == pytest.approx(0.0, abs=1e-6)
    assert r["beta_cause"] == pytest.approx(1.0, abs=1e-5)
    assert r["sse_r"] > 1.0  # own history alone does not explain it


def test_granger_no_cross_signal(spark):
    """Cause series constant: its lag adds nothing, SSE_u == SSE_r and
    F ~ 0 (beta on a constant-after-demeaning regressor is absorbed by
    the intercept; det may degrade to NULL on exact collinearity)."""
    from asctb_ct_label_mapper_spark.operators.stats import granger_daily

    views = [5] * 14
    purchases = [3, 6, 2, 8, 4, 7, 1, 9, 5, 6, 2, 7, 3, 8]
    r = granger_daily(
        _pair_events(spark, views, purchases), "view", "purchase"
    ).collect()[0]
    # constant xl is collinear with the intercept -> singular det -> NULLs
    assert r["f_stat"] is None or r["f_stat"] == pytest.approx(
        0.0, abs=1e-4
    )


def _week_events(spark, user_weeks):
    """user_weeks: {user_id: [week indices active]}."""
    rows = []
    eid = 0
    for u, wks in user_weeks.items():
        for w in wks:
            rows.append((eid, u, "view", 7 * w)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, day_idx int"
    )
    return df.select(
        "event_id",
        "user_id",
        "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_sbg_exact_model_recovered(spark):
    """Plant survival shares that ARE an sBG curve (alpha=1, beta=2:
    S1=2/3, S2=1/2, S3=2/5): the closed-form solve recovers the
    params and the projection matches the model at every horizon."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        sbg_retention_projection,
    )

    # 30 users: 20 survive wk1 (2/3), 15 wk2 (1/2), 12 wk3 (2/5)
    uw = {}
    for u in range(30):
        wks = [0]
        if u < 20:
            wks.append(1)
        if u < 15:
            wks.append(2)
        if u < 12:
            wks.append(3)
        uw[u] = wks
    out = {r["week"]: r for r in
           sbg_retention_projection(_week_events(spark, uw)).collect()}
    assert out[0]["s_projected"] == pytest.approx(1.0)
    # alpha=1, beta=2: S(t) = prod (2+i-1)/(3+i-1) = 2/(t+2)
    for t in range(1, 7):
        assert out[t]["s_projected"] == pytest.approx(
            2.0 / (t + 2), abs=1e-4
        ), t
    assert out[1]["s_observed"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[4]["s_observed"] is None  # beyond the data window


def test_sbg_falling_retention_rate_degrades_null(spark):
    """Retention rate FALLING (S2/S1 < S1) is outside the sBG regime:
    projections (t>=1) degrade to NULL instead of extrapolating."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        sbg_retention_projection,
    )

    # S1 = 0.8, S2 = 0.4 -> v = 0.5 < u = 0.8
    uw = {}
    for u in range(10):
        wks = [0]
        if u < 8:
            wks.append(1)
        if u < 4:
            wks.append(2)
        uw[u] = wks
    out = {r["week"]: r for r in
           sbg_retention_projection(_week_events(spark, uw)).collect()}
    assert out[0]["s_projected"] == pytest.approx(1.0)
    for t in range(1, 7):
        assert out[t]["s_projected"] is None


def test_markov_entropy_deterministic_cycle_zero(spark):
    """A deterministic a->b->a cycle has entropy rate 0 and
    perplexity 1."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        markov_entropy_rate,
    )

    rows = [(i, 1, "a" if i % 2 == 0 else "b", i) for i in range(20)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, day_idx int"
    ).select(
        "event_id", "user_id", "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )
    r = markov_entropy_rate(df).collect()[0]
    assert r["n_states"] == 2
    assert r["entropy_nats"] == pytest.approx(0.0)
    assert r["perplexity"] == pytest.approx(1.0)


def test_markov_entropy_matches_empirical_chain(spark):
    """Entropy rate equals −Σ π_i p_ij ln p_ij computed directly from
    the walk's EMPIRICAL transition counts (replicated in python) and
    is bounded above by ln(n)."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        markov_entropy_rate,
    )

    seq = ["a", "a", "b", "b", "a", "b", "a", "a", "b", "b", "a", "b",
           "a"]
    rows = [(i, 1, t, i) for i, t in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, day_idx int"
    ).select(
        "event_id", "user_id", "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )
    r = markov_entropy_rate(df).collect()[0]
    # python replica: empirical P (6dp, the operator's matrix grain),
    # power-iterated pi, entropy fold
    from collections import Counter

    pairs = Counter(zip(seq, seq[1:]))
    froms = Counter(seq[:-1])
    P = {
        (a, b): round(c / froms[a], 6) for (a, b), c in pairs.items()
    }
    states = sorted(set(seq))
    pi = {s: 1 / len(states) for s in states}
    for _ in range(30):
        nxt = {s: 0.0 for s in states}
        for (a, b), p in P.items():
            nxt[b] += pi[a] * p
        tot = sum(nxt.values())
        pi = {s: v / tot for s, v in nxt.items()}
    want = -sum(pi[a] * p * math.log(p) for (a, b), p in P.items())
    assert r["entropy_nats"] == pytest.approx(want, abs=1e-5)
    assert r["entropy_nats"] < math.log(2)
    assert r["perplexity"] == pytest.approx(math.exp(want), abs=1e-4)
