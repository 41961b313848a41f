"""Round-11h operators — power-sum moments, extreme studentized
deviate, linear calendar interpolation."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def test_moments_symmetric_and_degenerate(spark):
    """[-1,0,1]: mean 0, skew 0, M2=2/3, M4=2/3 -> g2 = 1.5-3 = -1.5,
    CV NULL (zero mean); a constant group degrades skew/kurtosis to
    NULL."""
    from asctb_ct_label_mapper_spark.operators.stats import moments_by_group

    rows = [("a", -1.0), ("a", 0.0), ("a", 1.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in moments_by_group(df, "g", "v").collect()}
    a = out["a"]
    assert a["mean"] == 0.0 and a["skewness"] == 0.0
    assert a["ex_kurtosis"] == -1.5
    assert a["cv"] is None  # zero mean
    b = out["b"]
    assert b["stddev_pop"] == 0.0
    assert b["skewness"] is None and b["ex_kurtosis"] is None
    assert b["cv"] == 0.0  # 0 / 5


def test_esd_flags_spike_day(spark):
    """Nine 10-count days and one 100-count day: the spike is the
    argmax with z > 2."""
    from asctb_ct_label_mapper_spark.operators.stats import esd_max_daily

    rows = []
    eid = 0
    for day in range(1, 11):
        n = 100 if day == 5 else 10
        for _ in range(n):
            eid += 1
            rows.append((eid, datetime(2024, 1, day)))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = esd_max_daily(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["d"].day == 5 and r["c"] == 100 and r["n_days"] == 10
    assert r["z"] > 2.0


def test_interpolate_fills_gap_linearly(spark):
    """Observed 10 on Jan 1 and 40 on Jan 4: Jan 2/3 interpolate to
    20/30; observed days keep their value with flag 0."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        interpolate_daily,
    )

    rows = [
        (1, datetime(2024, 1, 1), 10.0),
        (2, datetime(2024, 1, 4), 40.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["d"].day: r for r in interpolate_daily(df).collect()}
    assert [out[d]["value"] for d in (1, 2, 3, 4)] == [10.0, 20.0, 30.0, 40.0]
    assert [out[d]["interpolated"] for d in (1, 2, 3, 4)] == [0, 1, 1, 0]


def test_interpolate_averages_multiple_observations(spark):
    """Two observations on one day average before interpolation."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        interpolate_daily,
    )

    rows = [
        (1, datetime(2024, 1, 1), 10.0),
        (2, datetime(2024, 1, 1), 20.0),
        (3, datetime(2024, 1, 3), 30.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["d"].day: r["value"] for r in interpolate_daily(df).collect()}
    assert out[1] == 15.0 and out[2] == 22.5 and out[3] == 30.0
