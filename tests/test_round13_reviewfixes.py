"""Round-13 first review pass: regression tests for the verified
findings (log-rank arm sizes, MP ordering parity, shared KM helper)."""

from pyspark.sql import functions as F


def _ev(spark, rows):
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


def test_log_rank_counts_early_censored_keys_in_arm_sizes(spark):
    """A key censored BEFORE the first event duration must still count
    in its arm's reported size (the r13 review finding: max(n_at_risk)
    over event rows undercounted it)."""
    from asctb_ct_label_mapper_spark.operators.stats import log_rank_arms

    rows = [
        # arm0 key censored at t=1 (signs up day 8, corpus ends day 9)
        (2, "signup", 8),
        # the first (and only) event duration is t=3
        (1, "signup", 0), (1, "purchase", 3),
        (4, "signup", 0),                       # arm0, censored t=9
        (9, "view", 9),                         # corpus max carrier
    ]
    out = log_rank_arms(_ev(spark, rows)).collect()[0]
    assert out["n0"] == 2  # keys 2 AND 4, not just the one at risk at t=3
    assert out["n1"] == 1


def test_km_helper_shared_absorbing_zero(spark):
    """The shared km_survival_expr pins survival to exactly 0.0 at and
    after a d == n duration (all three consumers route through it)."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        kaplan_meier_survival,
        rmst_restricted_mean,
    )

    rows = [
        (1, "signup", 0), (1, "purchase", 2),
        (2, "signup", 0), (2, "purchase", 2),  # both convert at t=2: d=n
    ]
    km = kaplan_meier_survival(_ev(spark, rows)).collect()
    [r] = km
    assert r["survival"] == 0.0
    # RMST through the same helper: area = 1.0 * 2 + 0 beyond
    out = rmst_restricted_mean(_ev(spark, rows), tau=5).collect()[0]
    assert out["rmst"] == 2.0


def test_mp_sql_orders_on_raw_distance():
    """The oracle must ORDER BY the unrounded distance (DuckDB binds
    ORDER BY names to SELECT aliases — ordering by the rounded alias
    while Spark orders raw would flip near-tied top-N membership)."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        sql_matrix_profile_discords,
    )

    sql = sql_matrix_profile_discords("events")
    assert "ORDER BY mpd_raw DESC" in sql
