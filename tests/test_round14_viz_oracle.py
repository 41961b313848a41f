"""Round-14 verdict #4: viz_projection's value gate — exact distance
spine + projection-invariant booleans."""

import math

import numpy as np
import pytest


def _ref(spark, vecs):
    rows = [
        (f"V{i}", f"vec {i}", None, "NaN", [float(x) for x in v])
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(
        rows,
        "CT_ID string, CT_NAME string, CT_LABEL string, "
        "definition string, embedding array<double>",
    )


def test_invariants_exact_spine_hand_checked(spark):
    """3 collinear points on one axis: 2-d PCA is lossless, so every
    boolean is TRUE and dist_sum matches the hand computation."""
    from asctb_ct_label_mapper_spark.operators.viz import (
        projection_invariants,
    )

    vecs = [[0.0, 0.0, 0.0], [1.0, 1.0, 0.0], [2.0, 2.0, 0.0]]
    out = {
        r["CT_ID"]: r
        for r in projection_invariants(_ref(spark, vecs)).collect()
    }
    s2 = math.sqrt(2.0)
    # V0: d(V0,V1)=sqrt(2), d(V0,V2)=2*sqrt(2)
    assert out["V0"]["dist_sum"] == pytest.approx(3 * s2, abs=1e-6)
    assert out["V1"]["dist_sum"] == pytest.approx(2 * s2, abs=1e-6)
    for r in out.values():
        assert r["rank_corr_ok"] is True   # lossless -> rho = 1
        assert r["centered_ok"] is True
        assert r["var_ordered_ok"] is True
        assert r["hover_text"] == r["CT_NAME"]  # 'NaN' def falls back


def test_invariants_empty_frame(spark):
    from asctb_ct_label_mapper_spark.operators.viz import (
        projection_invariants,
    )

    out = projection_invariants(_ref(spark, []))
    assert out.count() == 0
    assert "dist_sum" in out.columns


def test_rank_corr_bound_fails_on_shuffled_projection():
    """The invariant must have teeth: ordinal rank correlation between
    UNRELATED distance sets sits near 0, under the 0.1 bound."""
    from asctb_ct_label_mapper_spark.operators.viz import _ordinal_ranks

    rng = np.random.RandomState(7)
    a, b = rng.rand(1000), rng.rand(1000)
    rho = float(np.corrcoef(_ordinal_ranks(a), _ordinal_ranks(b))[0, 1])
    assert abs(rho) < 0.1
