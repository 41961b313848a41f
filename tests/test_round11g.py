"""Round-11g operators — Kendall's tau-b, Lorenz curve, periodic churn,
lexical diversity."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

EV = "event_id long, ts timestamp, event_type string"


def _series(day_counts):
    rows = []
    eid = 0
    for day, na, nb in day_counts:
        for _ in range(na):
            eid += 1
            rows.append((eid, datetime(2024, 1, day), "a"))
        for _ in range(nb):
            eid += 1
            rows.append((eid, datetime(2024, 1, day), "b"))
    return rows


def test_kendall_perfect_concordance(spark):
    """Strictly co-increasing series, no ties: tau_b = 1 with
    C-D = n(n-1)/2."""
    from asctb_ct_label_mapper_spark.operators.stats import kendall_tau_daily

    df = spark.createDataFrame(
        _series([(d, d, 2 * d) for d in range(1, 6)]), EV
    )
    out = kendall_tau_daily(df, "a", "b").collect()[0]
    assert out["n_days"] == 5
    assert out["c_minus_d"] == 10
    assert out["tau_b"] == 1.0


def test_kendall_discordant_with_ties(spark):
    """x ties collapse pairs: x=[1,1,2], y=[3,2,1] -> C-D = -2,
    n0=3, tx=1, ty=0 -> tau_b = -2/sqrt(2*3)."""
    from asctb_ct_label_mapper_spark.operators.stats import kendall_tau_daily

    df = spark.createDataFrame(
        _series([(1, 1, 3), (2, 1, 2), (3, 2, 1)]), EV
    )
    out = kendall_tau_daily(df, "a", "b").collect()[0]
    assert out["c_minus_d"] == -2
    assert out["tau_b"] == round(-2 / (2 * 3) ** 0.5, 6)


def test_lorenz_two_tiles(spark):
    """Keys with totals [1, 3]: 2 tiles -> shares .25/.75, cum .25/1."""
    from asctb_ct_label_mapper_spark.operators.stats import lorenz_curve

    df = spark.createDataFrame(
        [(1, 1.0), (2, 3.0)], "user_id long, value double"
    )
    out = {
        r["tile"]: r
        for r in lorenz_curve(df, "user_id", "value", n_tiles=2).collect()
    }
    assert out[1]["value_share"] == 0.25 and out[1]["cum_share"] == 0.25
    assert out[2]["value_share"] == 0.75 and out[2]["cum_share"] == 1.0


def test_churn_weekly_censoring(spark):
    """u1 active weeks 1+2, u2 active week 1 only -> week-1 churn 0.5;
    week 2 (the last observed) is censored out."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        churn_rate_periodic,
    )

    rows = [
        (1, datetime(2024, 1, 1), 1),   # week of Jan 1 (Mon)
        (2, datetime(2024, 1, 2), 2),
        (3, datetime(2024, 1, 8), 1),   # next week
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = churn_rate_periodic(df, period="week").collect()
    assert len(out) == 1
    r = out[0]
    assert str(r["month"]) == "2024-01-01"
    assert r["mau"] == 2 and r["churned"] == 1 and r["churn_rate"] == 0.5


def test_churn_rejects_unknown_period(spark):
    import pytest

    from asctb_ct_label_mapper_spark.operators.behavior import (
        churn_rate_periodic,
    )

    df = spark.createDataFrame([], "event_id long, ts timestamp, user_id long")
    with pytest.raises(ValueError, match="unknown period"):
        churn_rate_periodic(df, period="day")


def test_lexical_diversity_hand_computed(spark):
    """'a a b c' -> 4 tokens, 3 types, 2 hapax (b, c): ttr .75,
    hapax share 2/3; empty tokens from double spaces drop."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        lexical_diversity_by_group,
    )

    df = spark.createDataFrame(
        [(1, "a a  b c", "s")], "doc_id long, text string, source string"
    )
    out = lexical_diversity_by_group(df).collect()[0]
    assert out["total_tokens"] == 4 and out["distinct_tokens"] == 3
    assert out["hapax"] == 2
    assert out["ttr"] == 0.75
    assert out["hapax_share"] == round(2 / 3, 6)


def test_lorenz_zero_total_degrades_null(spark):
    """Values netting to zero -> NULL shares, no ANSI crash."""
    from asctb_ct_label_mapper_spark.operators.stats import lorenz_curve

    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.0)], "user_id long, value double"
    )
    out = lorenz_curve(df, "user_id", "value", n_tiles=2).collect()
    assert len(out) == 2
    assert all(r["value_share"] is None and r["cum_share"] is None for r in out)


def test_anova_single_group_degrades_null(spark):
    """k=1 -> no between-group dof: NULL F, no ANSI crash."""
    from asctb_ct_label_mapper_spark.operators.stats import anova_oneway

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    out = anova_oneway(df, "g", "v").collect()[0]
    assert out["k"] == 1 and out["f_stat"] is None


def test_eb_identical_rates_hits_floor(spark):
    """All keys the same rate -> zero rate variance: the MoM ratio is
    NULL and greatest() falls to the floor M=1 on both engines."""
    from asctb_ct_label_mapper_spark.operators.stats import eb_rate_shrinkage

    rows = []
    for u in (1, 2, 3):
        rows += [(10 * u, u, "purchase"), (10 * u + 1, u, "view")]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    out = eb_rate_shrinkage(
        df, "user_id", (F.col("event_type") == "purchase").cast("int")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["alpha"] == 0.5 and r["beta"] == 0.5  # m=.5, M=1
    assert r["avg_abs_shift"] == 0.0


def test_assortativity_regular_graph_degrades_null(spark):
    """A 3-cycle is degree-regular (zero degree variance): NULL
    assortativity, no ANSI crash."""
    from asctb_ct_label_mapper_spark.operators.graph import (
        degree_assortativity,
    )

    df = spark.createDataFrame(
        [("A", "B", 1.0), ("B", "C", 1.0), ("C", "A", 1.0)],
        "src string, dst string, w double",
    )
    out = degree_assortativity(df).collect()[0]
    assert out["assortativity"] is None


def test_sql_churn_rejects_unknown_period():
    import pytest

    from asctb_ct_label_mapper_spark.operators.behavior import (
        sql_churn_rate_periodic,
    )

    with pytest.raises(ValueError, match="unknown period"):
        sql_churn_rate_periodic("events", period="day")
