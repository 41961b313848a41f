"""Round-12 batch E: Monroe weighted log-odds, pairwise EMD between
length distributions, periodogram seasonality strength."""

import math

import pytest
from pyspark.sql import functions as F


def test_monroe_logodds_flags_planted_token(spark):
    """A token massively over-represented in one source tops that
    source's z ranking; z is positive for over-use."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        monroe_logodds,
    )

    rows = []
    for i in range(20):
        rows.append((i, "srcA", "zebra zebra zebra common common"))
    for i in range(20, 40):
        rows.append((i, "srcB", "apple banana common common other"))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = monroe_logodds(docs, top_k=1).collect()
    by_src = {r["source"]: r for r in out}
    assert by_src["srcA"]["token"] == "zebra"
    assert by_src["srcA"]["z"] > 0
    assert by_src["srcB"]["token"] in ("apple", "banana", "other")
    assert by_src["srcB"]["z"] > 0


def test_monroe_logodds_topk_and_determinism(spark):
    """top_k rows per group, ordered z desc then token asc (stable on
    exact ties — symmetric counts give equal z)."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        monroe_logodds,
    )

    docs = spark.createDataFrame(
        [(1, "s1", "aa bb"), (2, "s2", "cc dd")],
        "doc_id long, source string, text string",
    )
    out = monroe_logodds(docs, top_k=2).collect()
    assert len(out) == 4
    for src, toks in (("s1", ["aa", "bb"]), ("s2", ["cc", "dd"])):
        got = [r["token"] for r in out if r["source"] == src]
        assert got == toks  # equal z -> token asc


def test_emd_identical_distributions_zero(spark):
    """Two groups with identical length multisets have EMD exactly 0;
    a group shifted by +10 chars against a point mass has EMD 10."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        emd_length_matrix,
    )

    rows = (
        [(i, "a", 100) for i in range(5)]
        + [(100 + i, "b", 100) for i in range(5)]
        + [(200 + i, "c", 110) for i in range(5)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    out = {
        (r["group_a"], r["group_b"]): r["emd"]
        for r in emd_length_matrix(docs).collect()
    }
    assert out[("a", "b")] == pytest.approx(0.0)
    assert out[("a", "c")] == pytest.approx(10.0)
    assert out[("b", "c")] == pytest.approx(10.0)
    assert len(out) == 3  # unordered pairs only


def test_emd_half_mass_shift(spark):
    """Group d = half at 100, half at 110 vs point mass at 100:
    |F| = 0.5 over a gap of 10 -> EMD 5."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        emd_length_matrix,
    )

    rows = [(i, "a", 100) for i in range(4)] + [
        (10, "d", 100), (11, "d", 100), (12, "d", 110), (13, "d", 110),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    out = emd_length_matrix(docs).collect()
    assert len(out) == 1
    assert out[0]["emd"] == pytest.approx(5.0)


def _daily_events(spark, counts, t0="2024-01-01"):
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append((i * 1000 + j, i))
    df = spark.createDataFrame(rows, "event_id long, day_idx int")
    return df.select(
        "event_id",
        (
            F.to_timestamp(F.lit(t0 + " 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_seasonality_pure_sinusoid_peaks_at_period(spark):
    """A clean period-7 cosine (plus offset to keep counts positive)
    puts (near) all variance at period 7: r2(7) ~ 1 and dominates every
    other candidate."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        seasonality_strength_daily,
    )

    n = 28  # whole number of cycles -> exact orthogonality
    counts = [
        int(round(10 + 5 * math.cos(2 * math.pi * t / 7))) for t in range(n)
    ]
    out = {
        r["period"]: r["r2"]
        for r in seasonality_strength_daily(
            _daily_events(spark, counts)
        ).collect()
    }
    assert set(out) == set(range(2, 15))
    assert out[7] > 0.95
    for p, r2 in out.items():
        if p != 7:
            assert r2 < out[7]


def test_seasonality_constant_series_null(spark):
    """Zero variance -> every r2 degrades to NULL via try_divide."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        seasonality_strength_daily,
    )

    out = seasonality_strength_daily(
        _daily_events(spark, [5] * 14)
    ).collect()
    assert len(out) == 13
    assert all(r["r2"] is None for r in out)
