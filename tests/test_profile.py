"""Column profiling operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5, "2024-01-01 10:00:00"),
            (2, "b", None, "2024-01-02 10:00:00"),
            (2, None, 2.5, None),
        ],
        "id long, s string, x double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_counts_nulls_distincts(sample):
    rows = {r["column"]: r for r in profile_table(sample).collect()}
    assert rows["id"]["n_rows"] == 3
    assert rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 2
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["n_distinct"] == 2
    assert rows["x"]["n_nulls"] == 1


def test_min_max_rendering(sample):
    rows = {r["column"]: r for r in profile_table(sample).collect()}
    assert rows["id"]["min_s"] == "1" and rows["id"]["max_s"] == "2"
    assert rows["x"]["min_s"] == "1.500000"  # decimal(38,6) rendering
    assert rows["ts"]["min_s"] == "2024-01-01 10:00:00"


def test_approx_flavor_has_same_schema(sample):
    exact = profile_table(sample)
    approx = profile_table(sample, exact_distinct=False)
    assert exact.columns == approx.columns
    # HLL++ is exact at these cardinalities
    e = {r["column"]: r["n_distinct"] for r in exact.collect()}
    a = {r["column"]: r["n_distinct"] for r in approx.collect()}
    assert e == a


def test_no_expand_in_either_flavor(sample):
    """r7: the exact path computes distincts via the long-format single
    countDistinct, so NEITHER flavor plans the multi-count-distinct
    Expand (the data x n_cols shuffle that cost 14.4s at sf0.1)."""
    for exact in (True, False):
        plan = (
            profile_table(sample, exact_distinct=exact)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" not in plan


def test_all_null_and_empty_columns(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, dead string"
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["dead"]["n_distinct"] == 0
    assert rows["dead"]["n_nulls"] == 2
    empty = df.filter("id < 0")
    rows = {r["column"]: r for r in profile_table(empty).collect()}
    assert rows["id"]["n_rows"] == 0 and rows["id"]["n_distinct"] == 0


def test_column_subset(sample):
    out = profile_table(sample, columns=["id", "x"])
    assert [r["column"] for r in out.collect()] == ["id", "x"]


def test_group_quantiles_nearest_rank(spark):
    from asctb_ct_label_mapper_spark.operators.profile import group_quantiles

    # group 'a': values 1..10 -> p50 = ceil(0.5*10)=5th smallest = 5
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 7.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in group_quantiles(df, "v", "g", qs=(0.5, 0.9)).collect()}
    assert out["a"]["n"] == 10
    assert out["a"]["q_50"] == 5.0 and out["a"]["q_90"] == 9.0
    # null excluded; single-value group: every quantile is that value
    assert out["b"]["n"] == 1 and out["b"]["q_50"] == 7.0 and out["b"]["q_90"] == 7.0


def test_negative_zero_counts_as_one_distinct(spark):
    """r7 review: -0.0 and 0.0 are EQUAL values — the string-encoded
    distinct path must not split them (countDistinct and DuckDB don't)."""
    df = spark.createDataFrame([(1, 0.0), (2, -0.0), (3, 1.5)], "id long, x double")
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["x"]["n_distinct"] == 2


def test_iqr_outliers_flag_planted_extremes(spark):
    from asctb_ct_label_mapper_spark.operators.profile import flag_outliers_iqr

    rows = [("en", i, 100 + i) for i in range(20)]  # tight band
    rows += [("en", 100, 10_000), ("en", 101, 1)]   # planted extremes
    rows += [("de", 200, 5_000)]                    # lone group: its own fence, no IQR
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_chars long")
    got = {r["doc_id"]: r["side"] for r in
           flag_outliers_iqr(df, "n_chars", "lang").collect()}
    assert got.get(100) == "high" and got.get(101) == "low"
    assert 200 not in got  # single-value group has zero IQR around itself
    assert all(d in (100, 101) for d in got)


def test_winsorize_clips_to_group_cuts(spark):
    from asctb_ct_label_mapper_spark.operators.profile import winsorize

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 100])] + [
        (10, "b", 5.0),
        (11, "b", 6.0),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n double")
    # group a, n=5: p5 cut = ceil(.05*5)=1st smallest = 1; p95 = ceil(4.75)=5th = 100
    got = {
        r.doc_id: r.n_w
        for r in winsorize(
            df.selectExpr("doc_id", "source", "CAST(n AS DOUBLE) AS n"),
            "n", "source", "doc_id",
        ).collect()
    }
    assert got[4] == 100.0  # p95 of a 5-row group IS the max (nearest-rank)
    # tighter quantiles actually clip
    got2 = {
        r.doc_id: r.n_w
        for r in winsorize(
            df.selectExpr("doc_id", "source", "CAST(n AS DOUBLE) AS n"),
            "n", "source", "doc_id", lo_q=0.25, hi_q=0.75,
        ).collect()
    }
    # group a p25 = ceil(1.25)=2nd=2, p75 = ceil(3.75)=4th=4
    assert got2[0] == 2.0 and got2[4] == 4.0 and got2[2] == 3.0
    # group b (n=2): p25=1st=5, p75=ceil(1.5)=2nd=6 -> untouched
    assert got2[10] == 5.0 and got2[11] == 6.0


def test_winsorize_rejects_bad_quantiles(spark):
    from asctb_ct_label_mapper_spark.operators.profile import winsorize

    df = spark.createDataFrame([(1, "a", 1.0)], "i bigint, g string, v double")
    import pytest

    with pytest.raises(ValueError):
        winsorize(df, "v", "g", "i", lo_q=0.9, hi_q=0.1)


def test_winsorize_rejects_colliding_percent_tags(spark):
    from asctb_ct_label_mapper_spark.operators.profile import (
        sql_winsorize,
        winsorize,
    )

    df = spark.createDataFrame([(1, "a", 1.0)], "i bigint, g string, v double")
    import pytest

    with pytest.raises(ValueError, match="same percent tag"):
        winsorize(df, "v", "g", "i", lo_q=0.051, hi_q=0.054)
    with pytest.raises(ValueError, match="same percent tag"):
        sql_winsorize("t", "v", "g", "i", lo_q=0.051, hi_q=0.054)


# --- MAD anomaly ------------------------------------------------------------


def test_mad_anomaly_flags_spike_not_noise(spark):
    from datetime import datetime

    from asctb_ct_label_mapper_spark.operators.profile import mad_anomaly_days

    rows = []
    eid = 0
    # type 'a': 10 days of 5 events, one day of 50 (spike)
    for day in range(1, 11):
        n = 50 if day == 6 else 5
        for _ in range(n):
            rows.append((eid, datetime(2024, 1, day, 12), 1, "a", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["day"]: r for r in mad_anomaly_days(df).collect()}
    assert out["2024-01-06"]["is_anomaly"] == 1
    assert sum(r["is_anomaly"] for r in out.values()) == 1
    assert out["2024-01-06"]["med"] == 5.0 and out["2024-01-06"]["mad"] == 0.0


def test_mad_anomaly_zero_mad_convention(spark):
    from datetime import datetime

    from asctb_ct_label_mapper_spark.operators.profile import mad_anomaly_days

    # constant series -> mad 0 -> only deviations flag
    rows = [
        (i, datetime(2024, 1, 1 + i % 5, 12), 1, "t", 0.0, "{}")
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = mad_anomaly_days(df).collect()
    assert all(r["is_anomaly"] == 0 for r in out)


def test_priority_sample_merge_equals_whole(spark):
    """Per-shard priority samples union + re-cut == the whole-data sample
    (exact set algebra — the property that lets shards keep their own
    quantile state)."""
    from asctb_ct_label_mapper_spark.operators.profile import priority_sample

    df = spark.createDataFrame(
        [(i, float(i % 97)) for i in range(2000)], "id long, v double"
    )
    k = 64
    whole = sorted(
        (r["pr"], r["v"]) for r in priority_sample(df, "id", "v", k).collect()
    )
    a = priority_sample(df.filter("id % 2 = 0"), "id", "v", k)
    b = priority_sample(df.filter("id % 2 = 1"), "id", "v", k)
    merged = sorted(
        (r["pr"], r["v"])
        for r in a.unionAll(b).orderBy("pr").limit(k).collect()
    )
    assert merged == whole


def test_sample_quantiles_exact_on_full_coverage(spark):
    """When k >= n the sample IS the data, so the interpolated quantiles
    are the exact population quantiles."""
    from asctb_ct_label_mapper_spark.operators.profile import (
        priority_sample,
        sample_quantiles,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(101)], "id long, v double"
    )
    got = {
        r["q"]: r["est"]
        for r in sample_quantiles(
            priority_sample(df, "id", "v", k=200), qs=(0.5, 0.9)
        ).collect()
    }
    assert got[0.5] == 50.0 and got[0.9] == 90.0


def test_sample_quantiles_empty_sample_yields_null_estimates(spark):
    """An empty-matching sample must produce (q, 0, NULL) rows, not an
    ANSI element_at(_a, 0) crash — DuckDB's a[0] returns NULL, so the
    engine must degrade identically (r8 ADVICE item)."""
    from asctb_ct_label_mapper_spark.operators.profile import (
        priority_sample,
        sample_quantiles,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"
    ).filter("v > 1e9")
    rows = sample_quantiles(
        priority_sample(df, "id", "v", k=8), qs=(0.5, 0.9)
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_sample"] == 0 and r["est"] is None


def test_equi_width_histogram_bins_and_overflow(spark):
    from asctb_ct_label_mapper_spark.operators.profile import (
        equi_width_histogram,
    )

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.99,), (10.0,), (99.9,), (100.0,), (250.0,),
         (None,)],
        "v double",
    )
    got = {
        r["bucket"]: (r["bin_lo"], r["bin_hi"], r["n_rows"])
        for r in equi_width_histogram(df, "v", 0.0, 100.0, n_bins=10).collect()
    }
    assert got[0][2] == 1          # -5 underflows
    assert got[1] == (0.0, 10.0, 2)   # 0.0 and 9.99
    assert got[2][2] == 1          # 10.0 lands in [10, 20)
    assert got[10][2] == 1         # 99.9 in the last interior bin
    assert got[11][2] == 2         # 100.0 and 250.0 overflow; NULL excluded
    assert sum(v[2] for v in got.values()) == 7


def test_psi_drift_zero_on_identical_and_positive_on_shift(spark):
    from asctb_ct_label_mapper_spark.operators.profile import psi_drift

    a = spark.createDataFrame([(float(i % 50),) for i in range(500)], "v double")
    same = {r["bucket"]: r["psi_term"] for r in
            psi_drift(a, a, "v", 0.0, 100.0, n_bins=10).collect()}
    assert same[-1] == 0.0  # identical distributions -> PSI 0
    shifted = spark.createDataFrame(
        [(float(i % 50) + 40.0,) for i in range(500)], "v double"
    )
    tot = {r["bucket"]: r["psi_term"] for r in
           psi_drift(a, shifted, "v", 0.0, 100.0, n_bins=10).collect()}
    assert tot[-1] > 0.25  # hard shift crosses the action threshold


def test_categorical_association_independent_vs_dependent(spark):
    from asctb_ct_label_mapper_spark.operators.profile import (
        categorical_association,
    )

    # independent: every (a, b) combination equally frequent
    indep = spark.createDataFrame(
        [(str(i % 4), str((i // 4) % 2)) for i in range(400)],
        "a string, b string",
    )
    [r] = categorical_association(indep, "a", "b").collect()
    assert abs(r["mi_nats"]) < 1e-6 and abs(r["chi2"]) < 1e-6
    # deterministic dependence: b = a
    dep = spark.createDataFrame(
        [(str(i % 4), str(i % 4)) for i in range(400)], "a string, b string"
    )
    [r2] = categorical_association(dep, "a", "b").collect()
    import math

    assert abs(r2["mi_nats"] - math.log(4)) < 1e-6  # H(a) = ln 4
    assert r2["n_cells"] == 4


def test_k_anonymity_report_flags_small_groups(spark):
    from asctb_ct_label_mapper_spark.operators.profile import (
        k_anonymity_report,
    )

    rows = (
        [("en", "s1") for _ in range(10)]
        + [("en", "s2") for _ in range(3)]
        + [("fr", "s1")]
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    [r] = k_anonymity_report(df, ["lang", "source"], k=5).collect()
    assert r["n_groups"] == 3
    assert r["violating_groups"] == 2
    assert r["rows_at_risk"] == 4
    assert r["min_group_size"] == 1
    assert r["k_anonymous"] is False
    [ok] = k_anonymity_report(df, ["lang", "source"], k=1).collect()
    assert ok["k_anonymous"] is True and ok["rows_at_risk"] == 0


def test_benford_audit_digits_and_chi2(spark):
    """Leading digits from exact integer rendering; zero and null
    excluded; shares sum to 1; a perfectly Benford-weighted sample
    yields chi2 ~ 0."""
    import math

    from asctb_ct_label_mapper_spark.operators.profile import benford_audit

    rows = []
    i = 0
    for d in range(1, 10):
        n = round(1000 * math.log10(1 + 1 / d))
        for _ in range(n):
            rows.append((i, float(d * 10 + (i % 10))))
            i += 1
    rows += [(i + 1, 0.0), (i + 2, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-5
    # counts were drawn FROM benford, so the statistic is tiny
    assert out[1]["chi2_total"] < 1.0
    assert abs(out[1]["benford_share"] - round(math.log10(2), 6)) < 1e-9


def test_benford_audit_rounds_raw_doubles_like_oracle(spark):
    """r10 contract enforcement: a raw double column is ROUNDED before
    the BIGINT cast on both engines (Spark cast truncates, DuckDB CAST
    rounds — the repo's documented trap). 9.7 must count as digit 1
    (rounds to 10), not digit 9; 0.4 rounds to 0 and drops."""
    import duckdb

    from asctb_ct_label_mapper_spark.operators.profile import (
        benford_audit,
        sql_benford_audit,
    )

    vals = [9.7, 1.2, 18.9, 0.4, 25.2, 94.6]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["digit"]: r["n"] for r in benford_audit(df, "v").collect()}
    assert got == {1: 3, 2: 1, 9: 1}  # 9.7->10, 18.9->19, 94.6->95
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({v})" for v in vals)
        + ") AS x(v)"
    )
    ora = {
        int(d): int(n)
        for d, n, *_ in con.execute(
            sql_benford_audit("t", "v")
        ).fetchall()
    }
    assert ora == got


def test_woe_iv_binning_signs_and_degenerate_bins(spark):
    """A feature that perfectly separates: low bin all-bad, high bin
    all-good -> both WOE NULL (degenerate), IV 0 from those bins; a
    mixed middle contributes finite WOE. Tie-broken ntile is
    deterministic."""
    from asctb_ct_label_mapper_spark.operators.profile import woe_iv_binning
    from pyspark.sql import functions as F

    rows = (
        [(i, float(i), 0) for i in range(10)]          # low, bad
        + [(100 + i, 100.0 + i, i % 2) for i in range(10)]  # mixed
        + [(200 + i, 200.0 + i, 1) for i in range(10)]  # high, good
    )
    df = spark.createDataFrame(rows, "id long, v double, g int")
    out = {r["bin"]: r for r in
           woe_iv_binning(df, "v", F.col("g") == 1, "id", n_bins=3).collect()}
    assert out[1]["n_good"] == 0 and out[1]["woe"] is None
    assert out[3]["n_bad"] == 0 and out[3]["woe"] is None
    import math

    # middle bin: 5 good of 15 total good, 5 bad of 15 total bad -> WOE 0
    assert out[2]["woe"] == 0.0
    assert out[2]["iv_total"] == 0.0  # only the middle contributes, 0
    assert all(out[b]["iv_total"] == out[1]["iv_total"] for b in out)


def test_l_diversity_report(spark):
    """Group (en): sources {a, b} -> l=2 ok; group (fr): all rows one
    source -> violating; min_l = 1."""
    from asctb_ct_label_mapper_spark.operators.profile import (
        l_diversity_report,
    )

    rows = [
        ("en", "a"), ("en", "b"), ("en", "a"),
        ("fr", "a"), ("fr", "a"),
    ]
    df = spark.createDataFrame(rows, "lang string, source string")
    [r] = l_diversity_report(df, ["lang"], "source", l=2).collect()
    assert r["n_groups"] == 2 and r["violating_groups"] == 1
    assert r["min_l"] == 1 and r["l_diverse"] is False


def test_l_diversity_null_sensitive_excluded(spark):
    """NULL sensitive values are missing data, not disclosed values:
    they must not count toward l (r10 review — a group of one real
    value plus NULLs is NOT diverse), and an all-NULL group vanishes."""
    from asctb_ct_label_mapper_spark.operators.profile import (
        l_diversity_report,
    )

    rows = [
        ("en", "a"), ("en", None),       # one real value -> violating
        ("fr", None), ("fr", None),      # nothing disclosed -> absent
        ("de", "a"), ("de", "b"),        # genuinely diverse
    ]
    df = spark.createDataFrame(rows, "lang string, source string")
    [r] = l_diversity_report(df, ["lang"], "source", l=2).collect()
    assert r["n_groups"] == 2  # fr dropped entirely
    assert r["violating_groups"] == 1 and r["min_l"] == 1


def test_l_diversity_all_null_vacuous_verdict(spark):
    """Zero audited groups (every sensitive value NULL) returns the
    vacuous verdict, not NULLs: (0 groups, 0 violating, NULL min_l,
    l_diverse TRUE) — the gate must never emit a NULL verdict."""
    from asctb_ct_label_mapper_spark.operators.profile import (
        l_diversity_report,
    )

    df = spark.createDataFrame(
        [("en", None), ("fr", None)], "lang string, source string"
    )
    [r] = l_diversity_report(df, ["lang"], "source", l=2).collect()
    assert (r["n_groups"], r["violating_groups"]) == (0, 0)
    assert r["min_l"] is None and r["l_diverse"] is True


def test_woe_iv_bucketed_equals_ntile(spark, sf_dir):
    """r10 verdict #3: the bucketed-global-rank binning reproduces SQL
    ntile bin-for-bin — fixture corpus plus the two ntile edge shapes
    (N not divisible by n_bins; N < n_bins)."""
    from pyspark.sql import functions as F

    from asctb_ct_label_mapper_spark.operators.profile import (
        woe_iv_binning,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = F.col("lang") == "en"
    a = sorted(
        map(tuple, woe_iv_binning(docs, "n_chars", tgt, "doc_id").collect())
    )
    b = sorted(
        map(
            tuple,
            woe_iv_binning(
                docs, "n_chars", tgt, "doc_id",
                impl="bucketed", rank_buckets=8,
            ).collect(),
        )
    )
    assert a == b

    # N = 23, n_bins = 10 -> first 3 bins take 3 rows; N = 4 < n_bins
    # -> one row per bin (q = 0 branch)
    for n_rows in (23, 4):
        df = spark.createDataFrame(
            [(i, float(i % 7), i % 2 == 0) for i in range(n_rows)],
            "doc_id long, v double, t boolean",
        )
        x = sorted(
            map(
                tuple,
                woe_iv_binning(df, "v", F.col("t"), "doc_id").collect(),
            )
        )
        y = sorted(
            map(
                tuple,
                woe_iv_binning(
                    df, "v", F.col("t"), "doc_id",
                    impl="bucketed", rank_buckets=4,
                ).collect(),
            )
        )
        assert x == y, n_rows
