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
