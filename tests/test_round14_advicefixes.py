"""Round-14 ADVICE regression tests: the variance-ratio SQL numerator
clamp, the Yuen / CvM degenerate-arm NULL degrades, and the
broadcast-budget guard on the driver-collecting similarity rungs."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F


def test_sql_variance_ratio_numerator_clamped():
    """The DuckDB mirror must clamp the q-sum variance numerator like
    the Spark twin's F.greatest(..., 0.0): an ulp-negative cancellation
    on a near-constant increment series yields vr = 0.0 on both engines
    (r14 ADVICE, low)."""
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        sql_variance_ratio_daily,
    )

    sql = sql_variance_ratio_daily()
    assert "greatest(sq2 / nq - (sq1 / nq) * (sq1 / nq), 0.0)" in sql


def test_yuen_single_user_arm_degrades_to_null(spark):
    """A single-user arm (n=1): the winsorized variance's (n-1) and
    h*(h-1) denominators are zero -> t_stat/p_value NULL, no ANSI
    DIVIDE_BY_ZERO (r14 ADVICE, low)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        yuen_trimmed_t,
    )

    rows = [
        (2, "purchase", 10.0),   # arm 0: exactly one user
        (1, "purchase", 5.0),    # arm 1: three users
        (3, "purchase", 7.0),
        (5, "purchase", 9.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )
    out = yuen_trimmed_t(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n0"] == 1 and r["n1"] == 3
    assert r["t_stat"] is None
    assert r["p_value"] is None


def test_cvm_empty_parity_arm_degrades_to_null(spark):
    """All users in one parity arm: the other arm's ECDF denominator is
    zero -> t_stat NULL, no ANSI DIVIDE_BY_ZERO (r14 ADVICE, low)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        cramer_von_mises_arms,
    )

    rows = [  # only odd user_ids -> arm 1 only, arm 0 empty
        (1, "purchase", 5.0),
        (3, "purchase", 7.0),
        (5, "purchase", 9.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )
    out = cramer_von_mises_arms(ev).collect()
    assert len(out) == 1
    assert out[0]["n0"] == 0
    assert out[0]["t_stat"] is None


def _vec_df(spark, n, dim, id_col):
    rows = [(i, [float(i + j) for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(
        rows, f"{id_col} long, embedding array<double>"
    )


def test_hnsw_topk_rejects_beyond_broadcast_reference(spark, monkeypatch):
    """hnsw_topk's docstring promises the broadcast-budget contract;
    the guard must enforce it with the IVF remediation named, BEFORE
    the driver collect (r14 ADVICE, low)."""
    from asctb_ct_label_mapper_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "REF_BROADCAST_BUDGET_BYTES", 100)
    q = _vec_df(spark, 3, 4, "qid")
    ref = _vec_df(spark, 10, 4, "rid")  # 10*4*8 = 320 B > 100 B budget
    with pytest.raises(ValueError, match="ivf"):
        sim.hnsw_topk(q, ref, k=2, query_id_cols=["qid"], ref_id_col="rid")


def test_blocked_topk_rejects_beyond_broadcast_reference(spark, monkeypatch):
    """The blocked rung collects the reference too — same contract,
    same guard (shared helper)."""
    from asctb_ct_label_mapper_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "REF_BROADCAST_BUDGET_BYTES", 100)
    q = _vec_df(spark, 3, 4, "qid")
    ref = _vec_df(spark, 10, 4, "rid")
    with pytest.raises(ValueError, match="ivf"):
        sim.top_k_similarity_blocked(
            q, ref, k=2, query_id_cols=["qid"], ref_id_col="rid"
        )


def test_blocked_topk_within_budget_still_works(spark):
    """The guard must be a no-op inside the budget: tiny reference ->
    normal results."""
    from asctb_ct_label_mapper_spark.operators.similarity import (
        top_k_similarity_blocked,
    )

    q = _vec_df(spark, 3, 4, "qid")
    ref = _vec_df(spark, 5, 4, "rid")
    out = top_k_similarity_blocked(
        q, ref, k=2, query_id_cols=["qid"], ref_id_col="rid"
    )
    assert out.count() == 6  # 3 queries x k=2
