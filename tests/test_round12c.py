"""Round-12 batch C: split-conformal forecast intervals, Page-Hinkley
drift, quantile treatment effects, quality-threshold sweep."""

from pyspark.sql import functions as F


def _daily_events(spark, counts, t0="2024-01-01"):
    """One event row per unit count on consecutive days."""
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append((i * 1000 + j, f"day{i}",))
    df = spark.createDataFrame(rows, "event_id long, tag string")
    day_idx = F.substring("tag", 4, 10).cast("int")
    return df.select(
        F.col("event_id"),
        (
            F.to_timestamp(F.lit(t0 + " 00:00:00"))
            + F.make_interval(days=day_idx)
        ).alias("ts"),
    )


def test_conformal_constant_series_zero_width(spark):
    """A perfectly seasonal series (period 7 repeated) has zero
    nonconformity -> q = 0, every test interval is [yhat, yhat] and
    covered; the first 7 days are not forecastable and drop."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        conformal_daily_forecast,
    )

    counts = [3, 5, 2, 4, 6, 1, 7] * 4  # 28 days, exact weekly season
    ev = _daily_events(spark, counts)
    out = conformal_daily_forecast(ev).orderBy("day").collect()
    assert len(out) > 0
    # 21 forecastable days; calib = floor(0.7*21) = 14 -> 7 test days
    assert len(out) == 7
    for r in out:
        assert r["lo"] == r["yhat"] == r["hi"] == r["y"]
        assert r["covered"] == 1


def test_conformal_coverage_on_noisy_series(spark):
    """A series with one-off spikes still yields >= (1 - alpha) nominal
    behavior mechanics: lo <= hi always, covered = (lo <= y <= hi)."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        conformal_daily_forecast,
    )

    counts = ([3, 5, 2, 4, 6, 1, 7] * 4)[:]
    counts[20] += 9  # a spike in the calibration region widens q
    ev = _daily_events(spark, counts)
    for r in conformal_daily_forecast(ev).collect():
        assert r["lo"] <= r["hi"]
        assert r["covered"] == int(r["lo"] <= r["y"] <= r["hi"])


def test_page_hinkley_constant_vs_step(spark):
    """Constant series: PH stays 0, no drift.  A large upward step
    drives PH over the threshold and drift stays latched after it."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        page_hinkley_daily,
    )

    flat = page_hinkley_daily(
        _daily_events(spark, [5] * 10), lam=1.0
    ).collect()
    assert all(r["ph"] == 0.0 and r["drift"] == 0 for r in flat)

    stepped = page_hinkley_daily(
        _daily_events(spark, [2] * 8 + [40] * 6), lam=10.0
    ).orderBy("day").collect()
    assert stepped[-1]["drift"] == 1
    assert all(r["drift"] == 0 for r in stepped[:8])


def test_qte_shifted_arm(spark):
    """Arm 1 purchase values uniformly 10 higher -> qte ~ 10 at every
    interior decile; symmetric arms -> qte = 0."""
    from asctb_ct_label_mapper_spark.operators.experiment import qte_metric

    rows = []
    for u in range(200):
        base = float((u // 2) % 50)  # same base for the (2k, 2k+1) pair
        v = base + (10.0 if u % 2 == 1 else 0.0)
        rows.append((u, "2024-01-01 00:00:00", "purchase", v))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    )
    out = {r["q"]: r for r in qte_metric(df).collect()}
    assert len(out) == 9
    for q, r in out.items():
        assert abs(r["qte"] - 10.0) < 1e-6, (q, r)
        assert r["n0"] == 100 and r["n1"] == 100

    sym = spark.createDataFrame(
        [(u, "2024-01-01 00:00:00", "purchase", float((u // 2) % 50))
         for u in range(200)],
        "user_id long, ts string, event_type string, value double",
    )
    for r in qte_metric(sym).collect():
        assert r["qte"] == 0.0


def test_quality_sweep_monotone(spark, sf_dir):
    """n_docs / n_words are non-increasing in the threshold; threshold 0
    retains everything (doc_frac = word_frac = 1.0)."""
    from asctb_ct_label_mapper_spark.operators.curation import (
        quality_threshold_sweep,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = sorted(
        quality_threshold_sweep(docs).collect(),
        key=lambda r: r["min_rules_passed"],
    )
    assert rows[0]["min_rules_passed"] == 0
    assert rows[0]["doc_frac"] == 1.0 and rows[0]["word_frac"] == 1.0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_docs"] <= prev["n_docs"]
        assert cur["n_words"] <= prev["n_words"]
