"""Round-12 second review pass: regression tests for the verified
findings (mSPRT spine, conformal day-lag + empty calibration, QTE
single-arm padding, quality-sweep unreachable thresholds, bounded
single-job collects, stale pid-dir sweep)."""

import os

import pytest
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


def test_msprt_counts_conversion_on_non_entry_day(spark):
    """A conversion landing on a day that is nobody's entry day must
    appear in the cumulative c-counts (the r12 finding: it was dropped
    forever)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        msprt_conversion_daily,
    )

    rows = [
        (1, "view", 0),        # user 1 (arm 1) enters day 0
        (2, "view", 0),        # user 2 (arm 0) enters day 0
        (1, "purchase", 4),    # converts on day 4 — not an entry day
    ]
    out = {r["day"]: r for r in
           msprt_conversion_daily(_ev(spark, rows)).collect()}
    assert "2024-01-05" in out  # day_idx 4
    last = out["2024-01-05"]
    assert last["c1"] == 1  # user 1 is odd -> arm 1
    assert last["n0"] == 1 and last["n1"] == 1


def test_conformal_lag_is_days_not_rows(spark):
    """With a zero-event calendar gap, the seasonal-naive lag must
    still be 7 DAYS back: the spine zero-fills the gap, so yhat for a
    late day equals the count 7 calendar days earlier (0 for spine
    fills), never the 7-rows-back value."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        conformal_daily_forecast,
    )

    # 21 days of data, day 10 missing entirely (zero events)
    rows = []
    eid = 0
    for d in range(21):
        if d == 10:
            continue
        for _ in range(3 + (d % 7)):
            rows.append((eid, "view", d)); eid += 1
    out = conformal_daily_forecast(_ev(spark, rows)).collect()
    # forecastable days = 21 - 7 = 14; calib = floor(14*0.7) = 9 -> 5
    assert len(out) == 5
    for r in out:
        # day 17 predicts from day 10 = the ZERO-filled gap
        if r["day"] == "2024-01-18":
            assert r["yhat"] == 0


def test_conformal_empty_calibration_emits_null_bounds(spark):
    """n_cal = 0 (a single forecastable day): the test rows must
    survive with NULL lo/hi/covered — the oracle's scalar-subquery
    semantics — not vanish in an empty cross join."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        conformal_daily_forecast,
    )

    rows = []
    eid = 0
    for d in range(8):  # 8 days -> exactly 1 forecastable day
        for _ in range(2 + d):
            rows.append((eid, "view", d)); eid += 1
    out = conformal_daily_forecast(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["lo"] is None and r["hi"] is None and r["covered"] is None


def test_qte_single_arm_pads_all_quantiles(spark):
    """All users on one arm parity: 9 rows with the empty arm's n = 0
    and NULL quantiles — not an empty inner join."""
    from asctb_ct_label_mapper_spark.operators.experiment import qte_metric

    ev = spark.createDataFrame(
        [(2 * u, "purchase", float(u)) for u in range(10)],  # even -> arm 0
        "user_id long, event_type string, value double",
    )
    out = qte_metric(ev).collect()
    assert len(out) == 9
    for r in out:
        assert r["n0"] == 10 and r["n1"] == 0
        assert r["q1"] is None and r["qte"] is None
        assert r["q0"] is not None


def test_quality_sweep_emits_unreachable_thresholds(spark):
    """Thresholds no document reaches still emit rows with n_docs = 0
    (the planner's 'everything dies here' readout)."""
    from asctb_ct_label_mapper_spark.operators.curation import (
        quality_threshold_sweep,
    )

    # degenerate docs: one symbol-ish token — they fail most rules
    docs = spark.createDataFrame(
        [(i, "#### #### ####") for i in range(5)],
        "doc_id long, text string",
    )
    out = {r["min_rules_passed"]: r for r in
           quality_threshold_sweep(docs).collect()}
    assert set(out) == set(range(6))
    assert out[5]["n_docs"] == 0  # nobody passes all five rules
    assert out[0]["n_docs"] == 5


def test_guard_local_collect_single_job_and_bound(spark):
    """The bounded collect returns the rows (one job) and raises past
    the bound."""
    from asctb_ct_label_mapper_spark.operators.dq import GroupBoundExceeded
    from asctb_ct_label_mapper_spark.operators.graph import (
        _guard_local_collect,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0)],
        "src string, dst string, w double",
    )
    rows = _guard_local_collect(edges, 10, "t", ["src", "dst", "w"])
    assert {(r["src"], r["dst"]) for r in rows} == {("a", "b"), ("b", "c")}
    with pytest.raises(GroupBoundExceeded):
        _guard_local_collect(edges, 1, "t", ["src", "dst"])


def test_sweep_stale_pid_dirs(tmp_path):
    """Dead-pid dirs are removed; the live process's own dir and
    unsuffixed dirs survive."""
    from asctb_ct_label_mapper_spark.sources.bucketing import (
        sweep_stale_pid_dirs,
    )

    root = str(tmp_path)
    me = os.getpid()
    dead = 999_999_983  # far above pid_max defaults -> never alive
    for name in (
        f"bkt32_sf_abc_p{me}_orders",
        f"bkt32_sf_abc_p{dead}_orders",
        "minhash_signatures_shared",
    ):
        os.makedirs(os.path.join(root, name))
    removed = sweep_stale_pid_dirs(root, r"_p(\d+)_")
    left = set(os.listdir(root))
    assert removed == 1
    assert f"bkt32_sf_abc_p{me}_orders" in left
    assert "minhash_signatures_shared" in left
    assert f"bkt32_sf_abc_p{dead}_orders" not in left
