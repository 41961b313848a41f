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


def test_perm_test_rounds_extreme_comparands():
    from asctb_ct_label_mapper_spark.operators.experiment import (
        sql_permutation_test_mean,
    )

    sql = sql_permutation_test_mean("events")
    assert "round(abs(tb), 6) >= round(abs(obs.t_obs), 6)" in sql


def test_sql_cochran_q_guards_k():
    import pytest

    from asctb_ct_label_mapper_spark.operators.experiment import (
        sql_cochran_q_periods,
    )

    with pytest.raises(ValueError, match="k=3"):
        sql_cochran_q_periods(k=4)


def test_eccentricity_raises_past_hop_cap(spark):
    """A chain deeper than max_hops must RAISE (matching the oracle's
    recursive bound) instead of silently reporting a capped value."""
    import pytest

    from asctb_ct_label_mapper_spark.operators.graph import (
        graph_eccentricity,
    )
    from pyspark.sql import functions as F

    chain = spark.range(10).select(
        F.col("id").cast("string").alias("src"),
        (F.col("id") + 1).cast("string").alias("dst"),
    )
    with pytest.raises(ValueError, match="max_hops"):
        graph_eccentricity(chain, max_hops=5)
    # and succeeds when the cap covers the diameter
    out = graph_eccentricity(chain, max_hops=15).collect()
    assert max(r["eccentricity"] for r in out) == 10


def test_shared_tier_expression_single_definition():
    """The log2 activity tier has ONE Spark and ONE SQL definition."""
    import inspect

    from asctb_ct_label_mapper_spark.operators import experiment, stats

    src = inspect.getsource(experiment) + inspect.getsource(stats)
    # the tier formula must appear exactly once per engine: the helper
    # bodies (the docstring spells it without the CAST)
    assert src.count("F.floor(F.log2(F.count(F.lit(1))))") == 1
    assert src.count("least(CAST(floor(log2(count(*))) AS INT)") == 1
