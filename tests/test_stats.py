"""Statistics / ML-lite operators (operators/stats.py) — hand-computable
fixtures pinning the closed forms and the engine-parity contracts
(cents quantization for medians, ordered float folds for entropy,
NULL-on-degenerate variances)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

EV_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def d(day: int, hour: int = 0):
    return datetime(2024, 1, day, hour)


def test_ols_trend_closed_form(spark):
    """y = 2x + 1 exactly -> slope 2, intercept 1, r2 1; a constant-x
    key (all same day) has zero x-variance -> NULL slope/intercept/r2;
    a key below min_n drops."""
    from asctb_ct_label_mapper_spark.operators.stats import ols_trend_by_key

    rows = (
        [(i, d(i + 1), 1, 2.0 * (19723 + i) + 1.0) for i in range(4)]
        # user 2: 3 points on ONE day (zero x-variance)
        + [(10 + i, d(5), 2, float(i)) for i in range(3)]
        + [(20, d(1), 3, 1.0)]  # below min_n
    )
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["key"]: r for r in ols_trend_by_key(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["slope"] == 2.0 and out[1]["intercept"] == 1.0
    assert out[1]["r2"] == 1.0 and out[1]["n"] == 4
    assert out[2]["slope"] is None and out[2]["r2"] is None


def test_autocorr_alternating_series(spark):
    """A strictly alternating daily count (5, 15, 5, 15, ...) has
    lag-1 ACF -1 and lag-2 ACF +1 (computed on each lag's own pair
    margins)."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        autocorr_daily_counts,
    )

    rows = []
    eid = 0
    for day in range(1, 9):
        n = 5 if day % 2 else 15
        for _ in range(n):
            eid += 1
            rows.append((eid, d(day), 1, 0.0))
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["lag"]: r for r in autocorr_daily_counts(df, max_lag=2).collect()}
    assert out[1]["acf"] == -1.0 and out[1]["n_pairs"] == 7
    assert out[2]["acf"] == 1.0 and out[2]["n_pairs"] == 6


def test_entropy_uniform_and_point_mass(spark):
    """4 equally likely categories -> 2 bits; a single category ->
    0 bits; counts and category counts reported."""
    from asctb_ct_label_mapper_spark.operators.stats import entropy_by_key

    rows = [(i, d(1), 1, f"t{i % 4}") for i in range(8)] + [
        (100 + i, d(1), 2, "only") for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["key"]: r for r in entropy_by_key(df).collect()}
    assert out[1]["entropy_bits"] == 2.0 and out[1]["n_cats"] == 4
    assert out[2]["entropy_bits"] == 0.0 and out[2]["n"] == 5


def test_gini_equal_and_concentrated(spark):
    """Perfect equality -> G = 0 exactly (closed form gives 0 for equal
    x); total concentration in one of n keys -> G = (n-1)/n."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        gini_concentration,
    )

    eq = spark.createDataFrame(
        [(i, d(1), i, 10.0) for i in range(1, 5)], EV_SCHEMA
    )
    [r] = gini_concentration(eq).collect()
    assert r["gini"] == 0.0 and r["n_keys"] == 4
    conc = spark.createDataFrame(
        [(1, d(1), 1, 100.0)]
        + [(i, d(1), i, 0.0) for i in range(2, 5)],
        EV_SCHEMA,
    )
    [r] = gini_concentration(conc).collect()
    assert r["gini"] == 0.75  # (n-1)/n with n=4


def test_mad_outliers_flags_only_true_outliers(spark):
    """Values 1..9 plus a 1000x spike: median 5.5-ish window, MAD stays
    small, exactly the spike flags (a z-score would inflate sigma)."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        mad_outliers_by_group,
    )

    rows = [(i, d(1), 1, float(i)) for i in range(1, 10)] + [
        (99, d(2), 1, 9000.0)
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, "a", v) for eid, ts, uid, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    [r] = mad_outliers_by_group(df).collect()
    assert r["n"] == 10 and r["n_outliers"] == 1
    assert r["median_value"] == 5.5  # interpolated between 5 and 6


def test_bollinger_partial_windows_null_and_breakout(spark):
    """Days without a full PRECEDING window carry NULL bands (the
    current day is excluded from its own band — included, a lone spike
    inflates its own sigma and can never breach k=2 at small windows);
    a flat stretch never breaks out; the spike day does."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        bollinger_bands_daily,
    )

    rows = []
    eid = 0
    for day in range(1, 11):
        n = 50 if day != 9 else 200  # spike on day 9
        for _ in range(n):
            eid += 1
            rows.append((eid, d(day), 1, 0.0))
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["day"]: r for r in bollinger_bands_daily(df, window_days=3).collect()}
    assert out["2024-01-01"]["ma"] is None
    assert out["2024-01-03"]["breakout"] is None  # only 2 preceding days
    assert out["2024-01-04"]["ma"] == 50.0  # first full preceding window
    assert out["2024-01-05"]["breakout"] is False  # flat stretch
    assert out["2024-01-09"]["breakout"] is True  # vs flat (50,50,50) band
    assert out["2024-01-10"]["breakout"] is False  # spike now inflates band


def test_theilsen_ignores_outlier_day(spark):
    """Counts 10,20,30,40 (+1000 on a 5th day) -> pairwise-slope median
    stays ~10/day; OLS would be dragged far above."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        theilsen_daily_trend,
    )

    rows = []
    eid = 0
    for day, n in ((1, 10), (2, 20), (3, 30), (4, 40), (5, 1000)):
        for _ in range(n):
            eid += 1
            rows.append((eid, d(day), 1, 0.0))
    df = spark.createDataFrame(rows, EV_SCHEMA)
    [r] = theilsen_daily_trend(df).collect()
    assert r["n_pairs"] == 10
    assert r["theilsen_slope"] == 10.0  # median pairwise slope


def test_rolling_median_exact_window(spark):
    """Trailing 3-row median over 1,100,2,3,4: the 100 spike never
    becomes the median once the window fills past it."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        rolling_median_by_key,
    )

    vals = [1.0, 100.0, 2.0, 3.0, 4.0]
    rows = [(i, d(i + 1), 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {
        r["id"]: r["rolling_median"]
        for r in rolling_median_by_key(df, window_rows=3).collect()
    }
    assert out[0] == 1.0  # singleton window
    assert out[1] == 50.5  # interpolated (1, 100)
    assert out[2] == 2.0
    assert out[3] == 3.0  # (100, 2, 3)
    assert out[4] == 3.0  # (2, 3, 4)


def test_kaplan_meier_textbook_curve(spark):
    """3 users convert at days 1, 2, 2; one never converts (censored at
    day 10): S(1) = 3/4, S(2) = 3/4 * 1/3 = 1/4. A user whose only
    purchase PRECEDES signup is censored, not negative-duration."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        kaplan_meier_survival,
    )

    rows = [
        (1, d(1), 1, "signup"), (2, d(2), 1, "purchase"),
        (3, d(1), 2, "signup"), (4, d(3), 2, "purchase"),
        (5, d(1), 3, "signup"), (6, d(3), 3, "purchase"),
        (7, d(1), 4, "signup"), (8, d(10), 4, "view"),  # censored
        (9, d(5), 5, "signup"), (10, d(2), 5, "purchase"),  # pre-signup
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["duration_days"]: r for r in kaplan_meier_survival(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
    assert out[1]["survival"] == 0.8
    assert out[2]["n_risk"] == 4 and out[2]["n_events"] == 2
    assert out[2]["survival"] == 0.4  # 4/5 * 2/4


def test_kaplan_meier_absorbing_zero(spark):
    """When every remaining at-risk key converts at the last duration,
    survival is EXACTLY 0.0 (no ln(0) on either engine)."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        kaplan_meier_survival,
    )

    rows = [
        (1, d(1), 1, "signup"), (2, d(2), 1, "purchase"),
        (3, d(1), 2, "signup"), (4, d(2), 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    [r] = kaplan_meier_survival(df).collect()
    assert r["duration_days"] == 1 and r["survival"] == 0.0


def test_jaccard_category_overlap_counts(spark):
    """Types a={1,2,3}, b={2,3}, c={9}: J(a,b)=2/3, J(a,c)=0 has no row
    (no shared key -> pair absent, stated join semantics)."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        jaccard_category_overlap,
    )

    rows = (
        [(i, d(1), u, "a") for i, u in ((1, 1), (2, 2), (3, 3))]
        + [(i, d(1), u, "b") for i, u in ((4, 2), (5, 3), (6, 2))]
        + [(7, d(1), 9, "c")]
    )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {(r["cat_a"], r["cat_b"]): r
           for r in jaccard_category_overlap(df).collect()}
    assert set(out) == {("a", "b")}
    assert out[("a", "b")]["n_both"] == 2
    assert out[("a", "b")]["jaccard"] == round(2 / 3, 6)


def test_spearman_daily_monotone(spark):
    """Perfectly co-monotone daily counts -> rho = 1; constant series
    -> NULL (try_divide on zero stddev)."""
    from datetime import datetime

    from asctb_ct_label_mapper_spark.operators.stats import spearman_daily

    rows = []
    eid = 0
    for day, (nv, np_) in enumerate([(1, 2), (2, 4), (3, 6)], start=1):
        for _ in range(nv):
            rows.append((eid, datetime(2024, 1, day), 1, "view", 1.0)); eid += 1
        for _ in range(np_):
            rows.append((eid, datetime(2024, 1, day), 1, "purchase", 1.0)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    [r] = spearman_daily(df, "view", "purchase").collect()
    assert r["n_days"] == 3 and r["rho"] == 1.0

    const = df.filter(F.col("event_type") == "view")
    [r] = spearman_daily(const, "view", "purchase").collect()
    # purchase series constant 0 -> zero variance -> NULL rho
    assert r["rho"] is None


def test_trimmed_means_matches_numpy(spark):
    import numpy as np

    from asctb_ct_label_mapper_spark.operators.stats import (
        trimmed_means_by_group,
    )

    vals = list(range(1, 10)) + [1000]
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "grp string, v double"
    )
    [r] = trimmed_means_by_group(df, "grp", "v").collect()
    arr = np.array(vals, dtype=float)
    p_lo, p_hi = np.percentile(arr, [5, 95])  # linear interpolation
    inside = arr[(arr >= p_lo) & (arr <= p_hi)]
    assert abs(r["p_lo"] - round(p_lo, 6)) < 1e-9
    assert abs(r["p_hi"] - round(p_hi, 6)) < 1e-9
    assert abs(r["mean_trimmed"] - round(inside.mean(), 6)) < 1e-9
    assert r["n"] == 10


def test_spearman_daily_calendar_spine(spark):
    """A zero-activity day inside the span is a genuine (0, 0) pair —
    the shared-spine contract: days 1 and 3 active, day 2 silent ->
    n_days = 3, and the tied (0,0) day enters the ranks."""
    from datetime import datetime

    from asctb_ct_label_mapper_spark.operators.stats import spearman_daily

    rows = [
        (1, datetime(2024, 1, 1), 1, "view", 1.0),
        (2, datetime(2024, 1, 1), 1, "purchase", 1.0),
        (3, datetime(2024, 1, 3), 1, "view", 1.0),
        (4, datetime(2024, 1, 3), 1, "view", 1.0),
        (5, datetime(2024, 1, 3), 1, "purchase", 1.0),
        (6, datetime(2024, 1, 3), 1, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    [r] = spearman_daily(df, "view", "purchase").collect()
    assert r["n_days"] == 3  # includes the silent Jan 2
    assert r["rho"] == 1.0   # series co-monotone incl. the (0,0) day
