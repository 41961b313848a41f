"""Round-14 verdict #3: the Hodges-Lehmann distinct-value pair grid
must be cardinality-guarded — quadratic censuses never launch silently
past the documented budget."""

import pytest
from pyspark.sql import functions as F


def _purchases(spark, values_by_user):
    rows = [
        (uid, "purchase", float(v)) for uid, v in values_by_user
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )


def test_hl_guard_raises_past_budget(spark, monkeypatch):
    """|V1| x |V0| over the (monkeypatched) budget -> ValueError naming
    the quantization fallback, BEFORE any cross join runs."""
    from asctb_ct_label_mapper_spark.operators import experiment as ex

    # 4 distinct values in arm 1 (odd uids), 3 in arm 0 -> grid 12
    ev = _purchases(
        spark,
        [(1, 1.01), (3, 2.02), (5, 3.03), (7, 4.04),
         (2, 1.50), (4, 2.50), (6, 3.50)],
    )
    monkeypatch.setattr(ex, "VALUE_PAIR_GRID_BUDGET", 11)
    with pytest.raises(ValueError, match="quantize"):
        ex.hodges_lehmann_shift(ev)


def test_hl_guard_boundary_exactly_at_budget_passes(spark, monkeypatch):
    """grid == budget is INSIDE the contract (strict >): the same frame
    with budget 12 runs to completion."""
    from asctb_ct_label_mapper_spark.operators import experiment as ex

    ev = _purchases(
        spark,
        [(1, 1.01), (3, 2.02), (5, 3.03), (7, 4.04),
         (2, 1.50), (4, 2.50), (6, 3.50)],
    )
    monkeypatch.setattr(ex, "VALUE_PAIR_GRID_BUDGET", 12)
    out = ex.hodges_lehmann_shift(ev).collect()
    assert len(out) == 1
    assert out[0]["n_pairs"] == 12  # 4 x 3 user pairs too (all distinct)


def test_hl_unchanged_result_inside_default_budget(spark):
    """The probe must not perturb the estimate: hand-checked shift on a
    small asymmetric frame (median of pairwise diffs)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        hodges_lehmann_shift,
    )

    # arm1 = {10, 20}, arm0 = {1} -> diffs {9, 19} -> HL = 14.0
    ev = _purchases(spark, [(1, 10.0), (3, 20.0), (2, 1.0)])
    r = hodges_lehmann_shift(ev).collect()[0]
    assert r["n0"] == 1 and r["n1"] == 2
    assert r["hl_shift"] == pytest.approx(14.0)
