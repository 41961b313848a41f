"""Round-13j: distribution distances + feature ranking fixtures."""

import math

from pyspark.sql import functions as F


def _ev_days(spark, rows):
    """rows: (user_id, event_type, day_idx)."""
    return spark.createDataFrame(
        rows, "user_id long, event_type string, day_idx int"
    ).select(
        "user_id",
        "event_type",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.col("day_idx"))
        ).alias("ts"),
    )


def test_hellinger_identical_vs_disjoint(spark):
    """Same-dow types: H = 0, BC = 1.  Disjoint-dow types: H = 1,
    BC = 0.  (2024-01-01 is a Monday; +1 day = Tuesday.)"""
    from asctb_ct_label_mapper_spark.operators.stats import (
        hellinger_dow_pairs,
    )

    rows = [
        (1, "a", 0), (2, "a", 0),       # Mondays only
        (3, "b", 0), (4, "b", 0),       # Mondays only
        (5, "c", 1), (6, "c", 1),       # Tuesdays only
    ]
    out = {
        (r["type_a"], r["type_b"]): r
        for r in hellinger_dow_pairs(_ev_days(spark, rows)).collect()
    }
    assert out[("a", "b")]["hellinger"] == 0.0
    assert out[("a", "b")]["bhattacharyya"] == 1.0
    assert out[("a", "c")]["hellinger"] == 1.0
    assert out[("a", "c")]["bhattacharyya"] == 0.0


def test_mutual_info_independence_zero_and_determinism_full(spark):
    from asctb_ct_label_mapper_spark.operators.stats import (
        mutual_info_type_dow,
    )

    # independent: both types hit both days with equal counts
    indep = [
        (1, "a", 0), (2, "a", 1), (3, "b", 0), (4, "b", 1),
    ]
    out = mutual_info_type_dow(_ev_days(spark, indep)).collect()[0]
    assert abs(out["mi"]) < 1e-9 and abs(out["nmi"]) < 1e-9

    # deterministic: type fully decides the day -> MI = H = ln 2
    dep = [
        (1, "a", 0), (2, "a", 0), (3, "b", 1), (4, "b", 1),
    ]
    out = mutual_info_type_dow(_ev_days(spark, dep)).collect()[0]
    assert abs(out["mi"] - math.log(2)) < 1e-6
    assert abs(out["nmi"] - 1.0) < 1e-6


def test_info_gain_perfect_feature_tops(spark):
    """Conversion fully determined by activity tier: the tier feature
    must rank first with IG = H(conv)."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        info_gain_features,
    )

    rows = []
    uid = 1
    # tier-0 users (1 event) never convert; tier-1 users (2-3 events)
    # always convert — all on the same day (dow features uninformative)
    for _ in range(8):
        rows.append((uid, "view", 0))
        uid += 1
    for _ in range(8):
        rows.append((uid, "view", 0))
        rows.append((uid, "purchase", 0))
        uid += 1
    out = info_gain_features(_ev_days(spark, rows)).collect()
    assert out[0]["feature"] == "tier"
    assert abs(out[0]["info_gain"] - math.log(2)) < 1e-6
    by = {r["feature"]: r for r in out}
    assert abs(by["modal_dow"]["info_gain"]) < 1e-9
    # single-level features: H(f) = 0 -> gain_ratio NULL, not a crash
    assert by["modal_dow"]["gain_ratio"] is None
