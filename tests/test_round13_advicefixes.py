"""Round-13 ADVICE regression tests: warehouse-sweep anchoring, the
post-stratified / Hurst sqrt clamps, the McNemar NULL-ts parity filter,
and the Theta calendar spine."""

import os

from pyspark.sql import functions as F


def test_sweep_requires_entry_anchor(tmp_path):
    """An unrelated directory whose name merely CONTAINS _p<deadpid>_
    must survive an anchored sweep; only template-matching entries are
    candidates (r13 ADVICE, medium)."""
    from asctb_ct_label_mapper_spark.sources.bucketing import (
        sweep_stale_pid_dirs,
    )

    dead = 999_999_959  # far above pid_max defaults -> ProcessLookupError
    innocent = tmp_path / f"customer_snapshot_p{dead}_v2"
    mine = tmp_path / f"bkt8_sf001_abc123_p{dead}_orders"
    innocent.mkdir()
    mine.mkdir()
    removed = sweep_stale_pid_dirs(
        str(tmp_path), r"_p(\d+)_", entry_re=r"bkt\d+_"
    )
    assert removed == 1
    assert innocent.is_dir()          # untouched: fails the anchor
    assert not mine.is_dir()          # swept: matches template, dead pid


def test_sweep_anchor_none_keeps_legacy_behavior(tmp_path):
    """entry_re=None keeps the fixture-dir call site working (its root
    is a dedicated directory, not a shared warehouse)."""
    from asctb_ct_label_mapper_spark.sources.bucketing import (
        sweep_stale_pid_dirs,
    )

    dead = 999_999_959
    d = tmp_path / f"orc_roundtrip_pid{dead}"
    d.mkdir()
    assert sweep_stale_pid_dirs(str(tmp_path), r"_pid(\d+)$") == 1
    assert not d.is_dir()


def test_post_stratified_se_non_negative_on_constant_values(spark):
    """Near-constant within-(stratum, arm) values: se_adj must come out
    0/NULL-free, never NaN (Spark) or a sqrt-domain crash (oracle) —
    the wv >= 0 clamp (r13 ADVICE)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        post_stratified_ab,
    )

    rows = [
        # every user: exactly one purchase of the SAME value -> the
        # within-stratum variance is an exact-cancellation candidate
        (uid, "purchase", 10.0)
        for uid in range(1, 9)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )
    out = post_stratified_ab(ev).collect()[0]
    assert out["se_adj"] is not None
    assert out["se_adj"] == 0.0


def test_hurst_block_std_clamped(spark):
    """A constant series makes every block stddev an exact-cancellation
    candidate: s must be 0.0 (rs NULL via try_divide), never NaN."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        hurst_rs_daily,
    )

    rows = []
    eid = 0
    for d in range(20):
        for _ in range(3):  # constant 3 events/day
            rows.append((eid, d))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, day_idx int").select(
        "event_id",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )
    out = hurst_rs_daily(ev).collect()
    assert out  # one row per block size
    for r in out:
        # constant series: R=0, S=0 -> rs NULL -> rs_mean NULL; the
        # point is no NaN anywhere (NaN != NaN would poison the fit)
        assert r["rs_mean"] is None or r["rs_mean"] == r["rs_mean"]


def test_mcnemar_null_ts_user_dropped_from_all_cells(spark):
    """A user whose only metric events carry NULL ts must vanish from
    EVERY cell (both engines), not fold to NULL p1/p2 on Spark while
    DuckDB counts them into n00 (r13 ADVICE)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        mcnemar_conversion_shift,
    )

    ev = spark.createDataFrame(
        [
            (1, "purchase", "2024-01-01 00:00:00"),
            (1, "view", "2024-01-09 00:00:00"),
            (2, "view", "2024-01-02 00:00:00"),
            (2, "purchase", "2024-01-08 00:00:00"),
            (3, "purchase", None),  # NULL-ts-only user: must disappear
        ],
        "user_id long, event_type string, ts_s string",
    ).select("user_id", "event_type", F.to_timestamp("ts_s").alias("ts"))
    out = mcnemar_conversion_shift(ev).collect()[0]
    assert out["n_users"] == 2
    assert (
        out["n11"] + out["n10"] + out["n01"] + out["n00"]
    ) == out["n_users"]


def test_theta_trend_uses_calendar_spine(spark):
    """With a missing calendar day, the Theta trend must be fit on the
    zero-filled spine: a perfectly linear 1,2,...  series with day 5
    absent is NOT linear on the spine (y=0 inserted), so the slope must
    differ from the observed-days-only fit AND n must count the gap."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        theta_forecast_daily,
    )

    rows = []
    eid = 0
    for d in range(10):
        if d == 5:
            continue  # calendar hole
        for _ in range(d + 1):
            rows.append((eid, d))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, day_idx int").select(
        "event_id",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )
    out = theta_forecast_daily(ev, alpha=0.2, horizon=2).collect()
    assert len(out) == 2
    # hand-fit OLS on the SPINE series (hole filled with y=0)
    ys = [1.0, 2.0, 3.0, 4.0, 5.0, 0.0, 7.0, 8.0, 9.0, 10.0]
    n = len(ys)
    ts = list(range(n))
    st, sy = sum(ts), sum(ys)
    stt = sum(t * t for t in ts)
    sty = sum(t * y for t, y in zip(ts, ys))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    h1 = next(r for r in out if r["h"] == 1)
    assert h1["trend"] is not None
    assert abs(h1["trend"] - (a + b * (n - 1 + 1))) < 1e-5
