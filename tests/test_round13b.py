"""Round-13b: survival comparisons (log-rank, RMST, competing-risk
CIF) and stratified/rate arm tests — hand-computed fixtures."""

import math

from pyspark.sql import functions as F


def _ev(spark, rows):
    """rows: (user_id, event_type, day_idx)."""
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, day_idx int"
    )
    return df.select(
        "user_id",
        "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_log_rank_identical_arms_chi2_zero(spark):
    """Two arms with mirror-image lifetimes: O1 == E1, chi2 == 0."""
    from asctb_ct_label_mapper_spark.operators.stats import log_rank_arms

    rows = []
    # users 1,3 (arm1) and 2,4 (arm0): each arm converts at t=2 and t=5
    for u, conv_day in [(1, 2), (3, 5), (2, 2), (4, 5)]:
        rows.append((u, "signup", 0))
        rows.append((u, "purchase", conv_day))
    out = log_rank_arms(_ev(spark, rows)).collect()[0]
    assert out["chi2"] == 0.0
    assert out["o1"] == 2 and abs(out["e1"] - 2.0) < 1e-9


def test_log_rank_hand_computed(spark):
    """3 users: arm1 converts at t=1; arm0 users convert at t=2 and
    censor.  Hand log-rank:
      t=1: d=1 (arm1), n=3, n1=1 -> E1 += 1/3, V += (1/3)(2/3)(2)/2
      t=2: d=1 (arm0), n=2, n1=0 -> E1 += 0,  V += 0
    O1=1, E1=1/3, V=2/9 -> chi2 = (2/3)^2 / (2/9) = 2.0."""
    from asctb_ct_label_mapper_spark.operators.stats import log_rank_arms

    rows = [
        (1, "signup", 0), (1, "purchase", 1),      # arm1
        (2, "signup", 0), (2, "purchase", 2),      # arm0
        (4, "signup", 0), (4, "view", 2),          # arm0, censored t=2
    ]
    out = log_rank_arms(_ev(spark, rows)).collect()[0]
    assert abs(out["e1"] - 1 / 3) < 1e-6
    assert abs(out["var1"] - 2 / 9) < 1e-6
    assert abs(out["chi2"] - 2.0) < 1e-5


def test_rmst_hand_computed(spark):
    """4 users sign up day 0; conversions at t=2 (one) and t=5 (one);
    two censored at corpus max t=10.  KM: S=0.75 after t=2, S=0.5
    after t=5.  RMST(8) = 1*2 + 0.75*3 + 0.5*3 = 5.75."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        rmst_restricted_mean,
    )

    rows = [
        (1, "signup", 0), (1, "purchase", 2),
        (2, "signup", 0), (2, "purchase", 5),
        (3, "signup", 0),
        (4, "signup", 0),
        (9, "view", 10),  # corpus max-date carrier
    ]
    out = rmst_restricted_mean(_ev(spark, rows), tau=8).collect()[0]
    assert out["n_keys"] == 4
    assert abs(out["rmst"] - 5.75) < 1e-6


def test_rmst_tau_before_first_event_is_tau(spark):
    from asctb_ct_label_mapper_spark.operators.stats import (
        rmst_restricted_mean,
    )

    rows = [
        (1, "signup", 0), (1, "purchase", 9),
        (9, "view", 10),
    ]
    out = rmst_restricted_mean(_ev(spark, rows), tau=5).collect()[0]
    assert out["rmst"] == 5.0  # S=1 through the whole horizon


def test_cif_competitor_not_censored(spark):
    """User 1: error at t=1 then purchase at t=3 — the error REMOVES
    them; the purchase must NOT count.  User 2 purchases at t=2.
      t=1: S(0-)=1, d_err=1, n=2 -> cif_b = 0.5
      t=2: S(1)=0.5, d_pur=1, n=1 -> cif_a = 0.5
    A naive per-cause KM would put user 1's purchase at risk-set 1 and
    overstate cif_a."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        cumulative_incidence_competing,
    )

    rows = [
        (1, "signup", 0), (1, "error", 1), (1, "purchase", 3),
        (2, "signup", 0), (2, "purchase", 2),
    ]
    out = {
        r["duration_days"]: r
        for r in cumulative_incidence_competing(_ev(spark, rows)).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["d_b"] == 1 and out[1]["cif_b"] == 0.5
    assert out[2]["d_a"] == 1 and out[2]["cif_a"] == 0.5
    # incidences sum to <= 1 and never double-count
    assert out[2]["cif_a"] + out[2]["cif_b"] == 1.0


def test_cif_same_day_tie_lexicographic(spark):
    """error < purchase lexicographically, so a same-day tie goes to
    cause_b-when-cause_b-is-error... i.e. the smaller NAME."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        cumulative_incidence_competing,
    )

    rows = [
        (1, "signup", 0), (1, "purchase", 2), (1, "error", 2),
    ]
    out = cumulative_incidence_competing(_ev(spark, rows)).collect()
    [r] = out
    # cause_a='purchase', cause_b='error'; 'error' < 'purchase' -> b
    assert r["d_b"] == 1 and r["d_a"] == 0


def test_mh_or_pooled_between_stratum_ors(spark):
    """Per-stratum ORs bound the MH pool; with one stratum the MH OR
    equals the plain 2x2 OR = (a*d)/(b*c)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        mantel_haenszel_or,
    )

    rows = []
    # 8 users, one event each (all land in stratum 0):
    # arm1 (odd ids): 3 convert, 1 not; arm0: 1 converts, 3 not
    for u, t in [
        (1, "purchase"), (3, "purchase"), (5, "purchase"), (7, "view"),
        (2, "purchase"), (4, "view"), (6, "view"), (8, "view"),
    ]:
        rows.append((u, t, 0))
    out = mantel_haenszel_or(_ev(spark, rows)).collect()[0]
    assert out["n_strata"] == 1
    assert abs(out["or_mh"] - (3 * 3) / (1 * 1)) < 1e-6


def test_poisson_rate_hand_computed(spark):
    """arm1: 2 users, 6 purchases; arm0: 2 users, 2 purchases.
    N=8, p0=0.5 -> z = (6-4)/sqrt(8*.25) = sqrt(2); rr = 3."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        poisson_rate_test,
    )

    rows = []
    eid = 0
    for u, k in [(1, 4), (3, 2), (2, 1), (4, 1)]:
        for _ in range(k):
            rows.append((u, "purchase", eid % 5))
            eid += 1
        rows.append((u, "view", 0))
    out = poisson_rate_test(_ev(spark, rows)).collect()[0]
    assert out["x1"] == 6 and out["x0"] == 2
    assert abs(out["rate_ratio"] - 3.0) < 1e-6
    assert abs(out["z"] - math.sqrt(2.0)) < 1e-5
