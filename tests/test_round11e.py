"""Round-11e operators — growth accounting, stickiness, power-user
curve, week-over-week report, p-chart control limits, OOV coverage."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

EV = "event_id long, ts timestamp, user_id long"


def _ev(rows):
    out = []
    for i, (day, user) in enumerate(rows):
        out.append((i, datetime(2024, 1, day), user))
    return out


def test_new_vs_returning_split(spark):
    """u1 active d1+d2, u2 active d2 only: d1 = 1 new, d2 = 1 new +
    1 returning; duplicate same-day events collapse."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        new_vs_returning_daily,
    )

    df = spark.createDataFrame(
        _ev([(1, 1), (1, 1), (2, 1), (2, 2)]), EV
    )
    out = {str(r["d"]): r for r in new_vs_returning_daily(df).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert d1["active_users"] == 1 and d1["new_users"] == 1
    assert d1["returning_users"] == 0
    assert d2["active_users"] == 2 and d2["new_users"] == 1
    assert d2["returning_users"] == 1


def test_stickiness_hand_computed(spark):
    """January: u1 on 2 days, u2 on 1 day -> MAU 2; DAU over active
    days = (1+2)/2 = 1.5; stickiness 0.75."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        stickiness_monthly,
    )

    df = spark.createDataFrame(_ev([(1, 1), (2, 1), (2, 2)]), EV)
    out = stickiness_monthly(df).collect()
    assert len(out) == 1
    r = out[0]
    assert str(r["month"]) == "2024-01-01"
    assert r["mau"] == 2 and r["avg_dau"] == 1.5
    assert r["stickiness"] == 0.75


def test_power_user_curve_buckets(spark):
    """u1 active 1 day, u2 active 4 days -> buckets '1' and '4-7'."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        power_user_curve,
    )

    df = spark.createDataFrame(
        _ev([(1, 1)] + [(d, 2) for d in (2, 3, 4, 5)]), EV
    )
    out = {
        r["days_bucket"]: r["users"] for r in power_user_curve(df).collect()
    }
    assert out == {"1": 1, "4-7": 1}


def test_weekly_growth_wow(spark):
    """Mon Jan 1 week: 2 events, next week 3 -> WoW +50%; first week
    NULL; 4-week trailing avg tracks."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        period_over_period_weekly,
    )

    rows = _ev([(1, 1), (2, 1), (8, 1), (9, 1), (10, 1)])
    df = spark.createDataFrame(rows, EV)
    out = sorted(
        period_over_period_weekly(df).collect(), key=lambda r: r["week"]
    )
    assert [r["n"] for r in out] == [2, 3]
    assert out[0]["wow_pct"] is None
    assert out[1]["wow_pct"] == 50.0
    assert out[1]["avg_4w"] == 2.5


def test_p_chart_flags_shift(spark):
    """9 days at 10/100 successes plus one day at 90/100: the shifted
    day breaks the 3-sigma band, routine days do not."""
    from asctb_ct_label_mapper_spark.operators.timeseries import p_chart_daily

    rows = []
    eid = 0
    for day in range(1, 11):
        k = 90 if day == 10 else 10
        for i in range(100):
            eid += 1
            rows.append((eid, datetime(2024, 1, day), 1 if i < k else 0))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, ok int")
    out = {r["d"].day: r for r in p_chart_daily(df, F.col("ok")).collect()}
    pbar = (9 * 10 + 90) / 1000.0
    half = 3.0 * math.sqrt(pbar * (1 - pbar) / 100)
    assert out[10]["flag"] == 1 and out[1]["flag"] == 0
    assert abs(out[1]["ucl"] - round(pbar + half, 6)) < 1e-9
    assert out[1]["rate"] == 0.1 and out[10]["rate"] == 0.9


def test_oov_rate_left_join_census(spark):
    """ref vocab {a,b}; group g has tokens [a, c, c] -> 2/3 OOV; the
    reference group itself is excluded from the readout."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        oov_rate_by_group,
    )

    df = spark.createDataFrame(
        [(1, "a b a", "ref"), (2, "a c c", "g")],
        "doc_id long, text string, source string",
    )
    out = oov_rate_by_group(df, "ref").collect()
    assert len(out) == 1
    r = out[0]
    assert r["source"] == "g"
    assert r["total_tokens"] == 3 and r["oov_tokens"] == 2
    assert r["oov_rate"] == round(2 / 3, 6)
