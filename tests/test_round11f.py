"""Round-11f operators — two-proportion test with Wilson intervals and
required-n, difference-in-differences, seeded-centroid silhouette."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F


def test_two_prop_hand_computed(spark):
    """Arm0: 100 users, 10 convert; arm1: 100 users, 20 convert
    (odd ids < 41 are exactly the 20 odd numbers 1..39).
    z, Wilson bounds, and required n match the closed forms."""
    from asctb_ct_label_mapper_spark.operators.experiment import two_prop_test

    rows = []
    eid = 0
    # even user ids -> arm 0, odd -> arm 1
    for u in range(200):
        arm = u % 2
        conv = (u < 20 and arm == 0) or (u < 41 and arm == 1)
        eid += 1
        rows.append((eid, u, "purchase" if conv else "view"))
        eid += 1
        rows.append((eid, u, "view"))
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    out = two_prop_test(df).collect()[0]
    p0, p1 = out["p0"], out["p1"]
    assert out["n0"] == 100 and out["n1"] == 100
    assert p0 == 0.1 and p1 == 0.2
    pbar = (10 + 20) / 200.0
    z = (p1 - p0) / math.sqrt(pbar * (1 - pbar) * (2 / 100.0))
    assert abs(out["z_stat"] - round(z, 6)) < 1e-9
    za = 1.959964
    center = p0 + za * za / 200.0
    half = za * math.sqrt(p0 * 0.9 / 100.0 + za * za / 40000.0)
    assert abs(out["p0_lo"] - round((center - half) / (1 + za * za / 100.0), 6)) < 1e-9
    n_req = (
        za * math.sqrt(2 * pbar * (1 - pbar))
        + 0.841621 * math.sqrt(p0 * 0.9 + p1 * 0.8)
    ) ** 2 / (p1 - p0) ** 2
    assert out["n_required"] == math.ceil(n_req)


def test_did_hand_computed(spark):
    """Control flat 10->10, treatment 10->16 across the midpoint ->
    DiD exactly +6; midpoint of Jan 1..9 is Jan 5 (post = d > split)."""
    from asctb_ct_label_mapper_spark.operators.experiment import did_estimate

    rows = []
    eid = 0
    for day in (1, 3, 7, 9):
        post = day > 5
        # user 2 = control (even), user 1 = treatment (odd)
        eid += 1
        rows.append((eid, datetime(2024, 1, day), 2, "purchase", 10.0))
        eid += 1
        rows.append((eid, datetime(2024, 1, day), 1, "purchase", 16.0 if post else 10.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = did_estimate(df).collect()[0]
    assert str(out["split_date"]) == "2024-01-05"
    assert out["m_c_pre"] == 10.0 and out["m_c_post"] == 10.0
    assert out["m_t_pre"] == 10.0 and out["m_t_post"] == 16.0
    assert out["did"] == 6.0
    assert out["n_t_pre"] == 2 and out["n_t_post"] == 2


def test_silhouette_separated_clusters(spark):
    """Vectors sitting ON two distinct seeded centroids: a = 0 for
    each, so silhouette is 1 (perfect separation) per list."""
    from asctb_ct_label_mapper_spark.operators.similarity import (
        seeded_centroids,
        silhouette_seeded,
    )

    cents = seeded_centroids(8, 4, seed=11)
    rows = [
        (1, [float(x) for x in cents[0]]),
        (2, [float(x) for x in cents[0]]),
        (3, [float(x) for x in cents[2]]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["list_id"]: r for r in silhouette_seeded(df, dim=8, n_lists=4).collect()}
    assert out[0]["n"] == 2 and out[2]["n"] == 1
    assert all(r["avg_silhouette"] == 1.0 for r in out.values())


def test_two_prop_empty_arm_degrades_null(spark):
    """All users one parity -> arm 1 empty: NULL statistics, no
    ANSI DIVIDE_BY_ZERO (r11 second review finding)."""
    from asctb_ct_label_mapper_spark.operators.experiment import two_prop_test

    rows = [(i, 2 * i, "view") for i in range(5)]  # even users only
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    out = two_prop_test(df).collect()[0]
    assert out["n1"] == 0
    assert out["p1"] is None and out["z_stat"] is None
    assert out["p1_lo"] is None and out["n_required"] is None
