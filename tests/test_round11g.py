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
