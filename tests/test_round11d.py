"""Round-11d operators — rolling/lagged correlation, Simpson's-paradox
slope check, readability scoring, and the ORC sink round-trip."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

PATTERN = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]


def _events(day_counts):
    """(day, n_a, n_b) -> event rows (event_id, ts, event_type)."""
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


def test_rolling_corr_identical_series_is_one(spark):
    """ca == cb every day -> every full window correlates exactly 1;
    the series head (windows shorter than `window`) is suppressed."""
    from asctb_ct_label_mapper_spark.operators.stats import rolling_corr_daily

    rows = _events([(d, PATTERN[(d - 1) % 10], PATTERN[(d - 1) % 10]) for d in range(1, 17)])
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = rolling_corr_daily(df, "a", "b", window=14).collect()
    assert len(out) == 3  # days 14..16
    assert all(r["corr"] == 1.0 for r in out)


def test_rolling_corr_constant_series_is_null(spark):
    """A constant cb has zero variance in every window -> NULL corr
    (try_divide parity with the oracle's NULLIF)."""
    from asctb_ct_label_mapper_spark.operators.stats import rolling_corr_daily

    rows = _events([(d, PATTERN[(d - 1) % 10], 2) for d in range(1, 16)])
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = rolling_corr_daily(df, "a", "b", window=14).collect()
    assert len(out) == 2 and all(r["corr"] is None for r in out)


def test_xcorr_detects_exact_lag(spark):
    """b is a copy of a shifted 2 days later -> lag-2 correlation is
    exactly 1 over the 10 overlapping days."""
    from asctb_ct_label_mapper_spark.operators.stats import xcorr_daily

    counts = []
    for d in range(1, 13):
        na = PATTERN[d - 1] if d <= 10 else 0
        nb = PATTERN[d - 3] if 3 <= d <= 12 else 0
        counts.append((d, na, nb))
    df = spark.createDataFrame(
        _events(counts), "event_id long, ts timestamp, event_type string"
    )
    out = {r["lag"]: r for r in xcorr_daily(df, "a", "b", max_lag=3).collect()}
    assert out[2]["corr"] == 1.0
    assert out[2]["n_days"] == 10
    assert out[0]["corr"] != 1.0


def test_simpson_slope_flip(spark):
    """Two groups each trending DOWN (slope -1) placed so the pooled
    line trends UP: both groups flagged opposite."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        simpson_slope_check,
    )

    rows = [
        ("g1", 0.0, 0.0),
        ("g1", 1.0, -1.0),
        ("g2", 10.0, 20.0),
        ("g2", 11.0, 19.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = simpson_slope_check(df, "g", "x", "y").collect()[0]
    assert out["pooled_slope"] > 0
    assert out["n_groups"] == 2
    assert out["n_opposite"] == 2
    assert out["min_group_slope"] == -1.0 and out["max_group_slope"] == -1.0


def test_simpson_zero_variance_group_excluded(spark):
    """A group whose x never varies has no slope: counted out of
    n_groups and the flip census, but still feeds the pooled line."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        simpson_slope_check,
    )

    rows = [
        ("g1", 0.0, 0.0),
        ("g1", 1.0, 1.0),
        ("g2", 5.0, 7.0),
        ("g2", 5.0, 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = simpson_slope_check(df, "g", "x", "y").collect()[0]
    assert out["n_groups"] == 1 and out["n_opposite"] == 0


def test_readability_hand_computed(spark):
    """'go go go. stop!' -> 4 words, 2 sentence runs, 4 vowel groups:
    flesch = 206.835 - 1.015*2 - 84.6*1 = 120.205."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        readability_by_lang,
    )

    df = spark.createDataFrame(
        [(1, "go go go. stop!", "en"), (2, "", "en"), (3, None, "fr")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in readability_by_lang(df).collect()}
    assert set(out) == {"en"}  # empty (0 words) and NULL excluded
    en = out["en"]
    assert en["n_docs"] == 1
    assert en["avg_words"] == 4.0 and en["avg_wps"] == 2.0
    assert en["avg_flesch"] == 120.205


def test_orc_roundtrip_preserves_types(spark, tmp_path):
    """ORC write -> read preserves longs, doubles, strings, dates and
    row contents exactly."""
    from asctb_ct_label_mapper_spark.sources.sinks import write_orc

    df = spark.createDataFrame(
        [(1, 1.5, "x", datetime(2024, 1, 2).date())],
        "a long, b double, c string, d date",
    )
    path = str(tmp_path / "orc_rt")
    write_orc(df, path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert back.collect() == df.collect()
