"""Round-13h: robust / permutation / paired-categorical arm tests."""

from pyspark.sql import functions as F


def _ev(spark, rows):
    """rows: (user_id, event_type, value)."""
    return spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )


def test_yuen_trim_kills_outlier(spark):
    """arm1 = {1,1,1,1,1000}: Welch would see mean 200.8; Yuen's 20%
    trim drops the 1000 and the trimmed mean is 1.0 — equal to arm0's,
    so t = 0."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        yuen_trimmed_t,
    )

    rows = []
    # arm1 users (odd): values 1,1,1,1,1000
    for u, v in [(1, 1.0), (3, 1.0), (5, 1.0), (7, 1.0), (9, 1000.0)]:
        rows.append((u, "purchase", v))
    # arm0 users (even): 1,1,1,1,1 (plus symmetric low outlier 0 -> g=1)
    for u, v in [(2, 1.0), (4, 1.0), (6, 1.0), (8, 1.0), (10, 0.0)]:
        rows.append((u, "purchase", v))
    out = yuen_trimmed_t(_ev(spark, rows), trim=0.2).collect()[0]
    assert out["n1"] == 5 and out["h1"] == 3
    assert out["tmean1"] == 1.0  # the 1000 trimmed away
    assert out["tmean0"] == 1.0  # the 0 trimmed away
    assert out["t_stat"] is None or abs(out["t_stat"]) < 1e-9


def test_yuen_partial_weight_at_tied_cut(spark):
    """8 identical values per arm: trim boundaries fall INSIDE the tie
    group; the partial-weight overlap must give h = n - 2g exactly."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        yuen_trimmed_t,
    )

    rows = [(u, "purchase", 5.0) for u in range(1, 17)]
    out = yuen_trimmed_t(_ev(spark, rows), trim=0.25).collect()[0]
    assert out["h0"] == 4 and out["h1"] == 4  # 8 - 2*2
    assert out["tmean0"] == 5.0 and out["tmean1"] == 5.0


def test_permutation_null_data_large_p(spark):
    """Symmetric arms (identical value multisets): the observed gap is
    0, every permutation is at least as extreme, p = 1."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        permutation_test_mean,
    )

    rows = []
    for u in range(1, 21):
        rows.append((u, "purchase", float(u % 5)))  # u%5 indep of parity-ish
    out = permutation_test_mean(_ev(spark, rows), n_perms=50).collect()[0]
    assert out["n_users"] == 20
    assert 0.0 < out["p_value"] <= 1.0
    # determinism: rerun gives the identical count
    out2 = permutation_test_mean(_ev(spark, rows), n_perms=50).collect()[0]
    assert out["n_extreme"] == out2["n_extreme"]


def test_cochran_q_no_shift_zero(spark):
    """Every user converts in every period: all R_i = k, denominator
    k*SR - SR2 = 0 -> Q NULL (degenerate, no discordance)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        cochran_q_periods,
    )

    rows = []
    df_rows = []
    for u in (1, 2):
        for d in (0, 10, 20):
            df_rows.append((u, "purchase", d))
    ev = spark.createDataFrame(
        df_rows, "user_id long, event_type string, day_idx int"
    ).select(
        "user_id", "event_type",
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(days=F.col("day_idx"))).alias("ts"),
    )
    out = cochran_q_periods(ev).collect()[0]
    assert out["c1"] == 2 and out["c2"] == 2 and out["c3"] == 2
    assert out["q_stat"] is None


def test_cochran_q_concentrated_shift(spark):
    """4 users convert ONLY in period 3: Q = k(k-1)*sum(Cj-Cbar)^2 /
    (k*SR - SR2) with R_i=1: SR=4, SR2=4 -> denom 8;
    C = (0,0,4), Cbar=4/3 -> num sum = (16+16+64)/9*... compute:
    (0-4/3)^2*2 + (4-4/3)^2 = 32/9 + 64/9 = 96/9; Q = 6*96/9/8 = 8."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        cochran_q_periods,
    )

    df_rows = []
    for u in (1, 2, 3, 4):
        df_rows.append((u, "view", 0))        # anchors window start
        df_rows.append((u, "purchase", 25))   # deep in period 3 of 0..29
    df_rows.append((9, "view", 29))
    ev = spark.createDataFrame(
        df_rows, "user_id long, event_type string, day_idx int"
    ).select(
        "user_id", "event_type",
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(days=F.col("day_idx"))).alias("ts"),
    )
    out = cochran_q_periods(ev).collect()[0]
    assert out["c1"] == 0 and out["c2"] == 0 and out["c3"] == 4
    assert abs(out["q_stat"] - 8.0) < 1e-6


def test_cochran_armitage_perfect_trend(spark):
    """Conversion strictly rising with tier: z must be positive and
    large; flat conversion gives T ~ 0."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        cochran_armitage_trend,
    )

    rows = []
    uid = 1
    # tier 0 users: 1 event, never convert; tier 2 users: 4-7 events
    # (floor(log2) = 2), always convert
    for _ in range(10):
        rows.append((uid, "view", 1.0))
        uid += 1
    for _ in range(10):
        for _ in range(3):
            rows.append((uid, "view", 1.0))
        rows.append((uid, "purchase", 1.0))
        uid += 1
    out = cochran_armitage_trend(_ev(spark, rows)).collect()[0]
    assert out["n_tiers"] == 2
    assert out["z"] > 3.0
    assert out["p_value"] < 0.01
