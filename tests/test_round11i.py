"""Round-11i operators — FK referential-integrity audit, daily-series
correlation matrix."""

from __future__ import annotations

from datetime import datetime


def test_fk_audit_counts_orphans_and_nulls(spark):
    """Child rows 4: one NULL key, one orphan (k=99 twice counts 2
    orphan rows but... here once), valid rows pass."""
    from asctb_ct_label_mapper_spark.operators.dq import fk_audit

    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = fk_audit(child, parent, "k", "pk", "c.k->p.pk").collect()[0]
    assert out["relation"] == "c.k->p.pk"
    assert out["child_rows"] == 4
    assert out["null_keys"] == 1
    assert out["orphan_rows"] == 1
    assert out["orphan_keys"] == 1


def test_fk_audit_duplicate_orphans(spark):
    """The same orphan key on two rows: orphan_rows 2, orphan_keys 1."""
    from asctb_ct_label_mapper_spark.operators.dq import fk_audit

    child = spark.createDataFrame([(99,), (99,), (1,)], "k long")
    parent = spark.createDataFrame([(1,)], "pk long")
    out = fk_audit(child, parent, "k", "pk", "r").collect()[0]
    assert out["orphan_rows"] == 2 and out["orphan_keys"] == 1


def test_corr_matrix_pairs(spark):
    """Types a and b co-move exactly (corr 1), c anti-moves vs both;
    pairs emitted once in (type_a < type_b) order."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        corr_matrix_daily_types,
    )

    rows = []
    eid = 0
    for day, (na, nb, nc) in enumerate([(1, 2, 3), (2, 4, 2), (3, 6, 1)], 1):
        for t, n in (("a", na), ("b", nb), ("c", nc)):
            for _ in range(n):
                eid += 1
                rows.append((eid, datetime(2024, 1, day), t))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {
        (r["type_a"], r["type_b"]): r["corr"]
        for r in corr_matrix_daily_types(df).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0


def test_ab_ratio_metric_hand_computed(spark):
    """Two users per arm with known (x, y): ratios and delta-method
    variances match the closed forms."""
    import math

    from asctb_ct_label_mapper_spark.operators.experiment import (
        ab_ratio_metric,
    )

    rows = []
    eid = 0

    def add(user, purchases, views):
        nonlocal eid
        for v in purchases:
            eid += 1
            rows.append((eid, user, "purchase", v))
        for _ in range(views):
            eid += 1
            rows.append((eid, user, "view", 0.0))

    # arm 0 (even users): (x=10, y=2), (x=20, y=2)
    add(2, [10.0], 2)
    add(4, [20.0], 2)
    # arm 1 (odd users): (x=30, y=2), (x=10, y=4)
    add(1, [30.0], 2)
    add(3, [10.0], 4)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    out = ab_ratio_metric(df).collect()[0]
    assert out["n0"] == 2 and out["n1"] == 2
    assert out["r0"] == 7.5  # 30 / 4
    assert out["r1"] == round(40 / 6, 6)

    def var(xs, ys):
        n = len(xs)
        r = sum(xs) / sum(ys)
        ybar = sum(ys) / n
        sxx = sum(x * x for x in xs) - sum(xs) ** 2 / n
        syy = sum(y * y for y in ys) - sum(ys) ** 2 / n
        sxy = sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys) / n
        return ((sxx + r * r * syy - 2 * r * sxy) / (n - 1)) / (
            n * ybar * ybar
        )

    v0 = var([10, 20], [2, 2])
    v1 = var([30, 10], [2, 4])
    assert abs(out["se0"] - round(math.sqrt(v0), 6)) < 1e-9
    assert abs(out["se1"] - round(math.sqrt(v1), 6)) < 1e-9
    z = (40 / 6 - 7.5) / math.sqrt(v0 + v1)
    assert abs(out["z_stat"] - round(z, 6)) < 1e-9
