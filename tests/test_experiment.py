"""Experimentation analytics — SRM chi-square against hand-computed
counts, Welch t against closed-form arithmetic, CUPED against an
independent numpy replay."""

from __future__ import annotations

from datetime import datetime

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


def d(day: int, hour: int = 0):
    return datetime(2024, 1, day, hour)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_srm_check_balanced_and_skewed(spark):
    from asctb_ct_label_mapper_spark.operators.experiment import srm_check

    # 2 even + 2 odd users -> chi2 = 0, no mismatch
    rows = [(i, d(1), u, "view", 1.0) for i, u in enumerate([1, 2, 3, 4])]
    [r] = srm_check(_ev(spark, rows)).collect()
    assert (r["n0"], r["n1"], r["chi2"], r["srm"]) == (2, 2, 0.0, False)

    # 10 even + 0 odd -> chi2 = (5^2 + 5^2)/5 = 10 > 3.841 -> SRM
    rows = [(i, d(1), 2 * i, "view", 1.0) for i in range(10)]
    [r] = srm_check(_ev(spark, rows)).collect()
    assert (r["n0"], r["n1"]) == (10, 0)
    assert abs(r["chi2"] - 10.0) < 1e-9 and r["srm"] is True


def test_ab_welch_ttest_closed_form(spark):
    """arm0 (even users 2,4): metrics 1, 3 -> mean 2, var 2.
    arm1 (odd users 1,3): metrics 2, 6 -> mean 4, var 8.
    t = 2/sqrt(1+4) = 0.894427; dof = 25/17 = 1.470588.
    User 6 (even) never purchases -> metric 0 joins arm0."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        ab_welch_ttest,
    )

    rows = [
        (1, d(1), 2, "purchase", 1.0),
        (2, d(1), 4, "purchase", 3.0),
        (3, d(1), 1, "purchase", 2.0),
        (4, d(1), 3, "purchase", 6.0),
    ]
    [r] = ab_welch_ttest(_ev(spark, rows)).collect()
    assert (r["n0"], r["n1"]) == (2, 2)
    assert (r["mean0"], r["mean1"]) == (2.0, 4.0)
    assert abs(r["t_stat"] - 0.894427) < 1e-6
    assert abs(r["dof"] - 1.470588) < 1e-6

    # zero-metric users stay in the denominator
    rows.append((5, d(1), 6, "view", 99.0))
    [r] = ab_welch_ttest(_ev(spark, rows)).collect()
    assert r["n0"] == 3 and abs(r["mean0"] - 4.0 / 3) < 1e-6


def test_cuped_adjustment_matches_numpy(spark):
    import numpy as np

    from asctb_ct_label_mapper_spark.operators.experiment import (
        cuped_adjustment,
    )

    # (user, pre, post): pre on Jan 5, post on Jan 20; split Jan 16
    spec = [(1, 2.0, 5.0), (2, 4.0, 9.0), (3, 1.0, 2.0), (4, 3.0, 8.0)]
    rows = []
    eid = 0
    for u, pre, post in spec:
        rows.append((eid, d(5), u, "purchase", pre)); eid += 1
        rows.append((eid, d(20), u, "purchase", post)); eid += 1
    got = {r["arm"]: r for r in
           cuped_adjustment(_ev(spark, rows), "2024-01-16").collect()}

    pre = np.array([s[1] for s in spec])
    post = np.array([s[2] for s in spec])
    arm = np.array([s[0] % 2 for s in spec])
    theta = np.cov(pre, post, ddof=1)[0, 1] / np.var(pre, ddof=1)
    adj = post - theta * (pre - pre.mean())
    for a in (0, 1):
        m = arm == a
        assert got[a]["n"] == int(m.sum())
        assert abs(got[a]["mean_post"] - round(post[m].mean(), 6)) < 1e-6
        assert abs(got[a]["mean_adj"] - round(adj[m].mean(), 6)) < 1e-6
        assert abs(
            got[a]["var_adj"] - round(np.var(adj[m], ddof=1), 6)
        ) < 1e-6
    # CUPED shrinks the pooled variance on this correlated fixture
    assert np.var(adj, ddof=1) < np.var(post, ddof=1)


def test_mann_whitney_closed_form(spark):
    """Metrics: arm0 users 2,4 -> [1, 3]; arm1 users 1,3 -> [2, 2].
    Sorted ranks: 1->1, {2,2}->2.5 avg, 3->4. R1 = 5, U1 = 5-3 = 2 =
    n0*n1/2, so z = 0 exactly; tie term = 2^3-2 = 6."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        mann_whitney_u,
    )

    rows = [
        (1, d(1), 2, "purchase", 1.0),
        (2, d(1), 4, "purchase", 3.0),
        (3, d(1), 1, "purchase", 2.0),
        (4, d(1), 3, "purchase", 2.0),
    ]
    [r] = mann_whitney_u(_ev(spark, rows)).collect()
    assert (r["n0"], r["n1"]) == (2, 2)
    assert r["u1"] == 2.0 and r["z"] == 0.0

    # all metrics tied: sigma degenerates -> z NULL, not a crash
    rows = [(i, d(1), u, "purchase", 5.0) for i, u in enumerate(range(4))]
    [r] = mann_whitney_u(_ev(spark, rows)).collect()
    assert r["z"] is None


def test_mann_whitney_bucketed_equals_exact(spark, sf_dir):
    """r10 verdict #4: the bucketed (value-grain, no-global-window)
    rank path reproduces the exact impl bit-for-bit — fixture corpus
    AND a crafted frame dense with ties."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        mann_whitney_u,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = mann_whitney_u(ev).collect()[0]
    buck = mann_whitney_u(ev, impl="bucketed", rank_buckets=8).collect()[0]
    assert tuple(exact) == tuple(buck)

    rows = [
        # (event_id, user_id, event_type, value) — heavy ties: every
        # metric lands on 0, 5 or 10
        (i, u, "purchase", float(5 * (u % 3)))
        for i, u in enumerate(range(1, 41))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    e2 = mann_whitney_u(df).collect()[0]
    b2 = mann_whitney_u(df, impl="bucketed", rank_buckets=4).collect()[0]
    assert tuple(e2) == tuple(b2)


def test_ks_disjoint_arms_d_is_one(spark):
    """Arm 0 metrics all below arm 1 metrics -> D = 1 exactly."""
    from asctb_ct_label_mapper_spark.operators.experiment import ks_test

    rows = []
    for u in range(1, 21):
        v = 1.0 if u % 2 == 0 else 100.0  # arm0 (even) low, arm1 high
        rows.append((u, u, "purchase", v))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    r = ks_test(df).collect()[0]
    assert r["n0"] == 10 and r["n1"] == 10
    assert r["d_stat"] == 1.0


def test_ks_identical_arms_d_is_zero(spark):
    from asctb_ct_label_mapper_spark.operators.experiment import ks_test

    rows = [(u, u, "purchase", 7.0) for u in range(1, 21)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    r = ks_test(df).collect()[0]
    assert r["d_stat"] == 0.0 and r["ks_z"] == 0.0


def test_fdr_bh_flags_the_planted_effect(spark):
    """One type with a big arm imbalance is significant; a balanced
    type is not; p_adj is monotone in rank."""
    from asctb_ct_label_mapper_spark.operators.experiment import fdr_bh

    rows = []
    eid = 0
    for u in range(1, 41):
        eid += 1
        rows.append((eid, u, "balanced"))  # one per user
        # 'effect': ~5-9 events for arm-1 users, 0-1 for arm 0 (the
        # within-arm spread keeps the Welch variance nonzero — a
        # constant metric degenerates to z = x/0 = NULL by design)
        n_eff = (5 + u % 5) if u % 2 == 1 else (1 if u % 4 == 0 else 0)
        for _ in range(n_eff):
            eid += 1
            rows.append((eid, u, "effect"))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    )
    out = {r["typ"]: r for r in fdr_bh(df, q=0.05).collect()}
    assert out["effect"]["significant"] is True
    assert out["balanced"]["significant"] is False
    by_rank = sorted(out.values(), key=lambda r: r["rank"])
    adj = [r["p_adj"] for r in by_rank]
    assert adj == sorted(adj)  # step-up min makes p_adj monotone


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark):
    from asctb_ct_label_mapper_spark.operators.experiment import (
        bootstrap_ci,
    )

    rows = [
        (u, u, "purchase", float(10 + (u % 7)))
        for u in range(1, 101)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    a = bootstrap_ci(df, n_resamples=100).collect()[0]
    b = bootstrap_ci(df, n_resamples=100).collect()[0]
    assert tuple(a) == tuple(b)  # md5 draw -> rerun-identical
    assert a["ci_lo"] <= a["point_mean"] <= a["ci_hi"]
    assert a["n_resamples"] == 100


def test_ks_one_arm_empty_degrades_to_null(spark):
    """All-even user ids -> arm 1 empty -> d_stat/ks_z NULL (try_divide),
    not an ANSI DIVIDE_BY_ZERO crash (review fix, r11)."""
    from asctb_ct_label_mapper_spark.operators.experiment import ks_test

    rows = [(u, 2 * u, "purchase", 5.0) for u in range(1, 6)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    r = ks_test(df).collect()[0]
    assert r["n1"] == 0
    assert r["d_stat"] is None and r["ks_z"] is None


def test_mwu_and_woe_reject_unknown_impl(spark):
    import pytest as _pytest

    from asctb_ct_label_mapper_spark.operators.experiment import (
        mann_whitney_u,
    )
    from asctb_ct_label_mapper_spark.operators.profile import (
        woe_iv_binning,
    )

    from pyspark.sql import functions as SF

    df = spark.createDataFrame(
        [(1, 1, "purchase", 1.0)],
        "event_id long, user_id long, event_type string, value double",
    )
    with _pytest.raises(ValueError, match="unknown impl"):
        mann_whitney_u(df, impl="buckted")
    with _pytest.raises(ValueError, match="unknown impl"):
        woe_iv_binning(df, "value", SF.lit(True), "event_id", impl="exact")
