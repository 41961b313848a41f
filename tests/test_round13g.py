"""Round-13g: subsequence analytics fixtures."""

import math

from pyspark.sql import functions as F


def _daily(spark, counts):
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, d))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, day_idx int"
    ).select(
        "event_id",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_matrix_profile_finds_planted_discord(spark):
    """A repeating weekly pattern with ONE corrupted week: the top
    discord's window must overlap the corruption."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        matrix_profile_discords,
    )

    base = [2, 3, 5, 8, 5, 3, 2]
    counts = base * 6
    # corrupt week 3 (days 21..27) with an inverted shape
    for i, v in enumerate([9, 1, 9, 1, 9, 1, 9]):
        counts[21 + i] = v
    out = matrix_profile_discords(
        _daily(spark, counts), w=7, top=1
    ).collect()
    [r] = out
    day = int(r["start_day"][8:10])  # dd of 2024-01-dd
    # window must START within reach of the corrupted span (15..28)
    assert 15 <= day <= 28
    assert r["mp_dist"] > 1.0


def test_matrix_profile_excludes_trivial_matches(spark):
    """A pure periodic series: every window's nearest neighbor is one
    period away (>= w), never itself or an overlapping shift."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        matrix_profile_discords,
    )

    base = [2, 3, 5, 8, 5, 3, 2]
    out = matrix_profile_discords(
        _daily(spark, base * 5), w=7, top=3
    ).collect()
    for r in out:
        # exact periodic repeats -> discord distance 0 everywhere
        assert r["mp_dist"] == 0.0


def test_spectral_entropy_sine_low_noise_high(spark):
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        spectral_entropy_daily,
    )

    n = 32
    sine = [int(10 + 8 * math.sin(2 * math.pi * 4 * t / n)) for t in range(n)]
    h_sine = spectral_entropy_daily(_daily(spark, sine)).collect()[0]
    # deterministic 'noise': a multiplicative-hash scramble
    noise = [(t * 2654435761 % 97) % 17 + 1 for t in range(n)]
    h_noise = spectral_entropy_daily(_daily(spark, noise)).collect()[0]
    assert h_sine["spectral_entropy"] < 0.5
    # the hash scramble is not perfectly white; the ORDERING is the
    # contract: irregular >> sinusoid
    assert h_noise["spectral_entropy"] > 0.7
    assert h_noise["spectral_entropy"] > h_sine["spectral_entropy"]
    assert h_sine["n_freqs"] == (n - 1) // 2


def test_sample_entropy_periodic_low(spark):
    """A strict period-2 alternation: every m-template match extends
    to m+1, so A == B and SampEn == 0."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        sample_entropy_daily,
    )

    out = sample_entropy_daily(
        _daily(spark, [2, 9] * 10), m=2
    ).collect()[0]
    assert out["b_pairs"] > 0
    assert out["a_pairs"] == out["b_pairs"]
    assert out["sampen"] == 0.0


def test_sample_entropy_no_matches_null(spark):
    """Strictly increasing fast series with tiny tolerance: no
    template pairs within r -> NULL, not a crash."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        sample_entropy_daily,
    )

    out = sample_entropy_daily(
        _daily(spark, [1, 4, 9, 16, 25, 36, 49, 64]), m=2, r_frac=0.01
    ).collect()[0]
    assert out["b_pairs"] == 0
    assert out["sampen"] is None
