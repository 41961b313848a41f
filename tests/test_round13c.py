"""Round-13c: distribution-shape arm comparisons + JB normality gate
— hand-computed fixtures."""

import math

from pyspark.sql import functions as F


def _ev(spark, rows):
    """rows: (user_id, event_type, value)."""
    return spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )


def test_cvm_identical_arms_zero(spark):
    from asctb_ct_label_mapper_spark.operators.experiment import (
        cramer_von_mises_arms,
    )

    rows = [
        (1, "purchase", 5.0), (3, "purchase", 9.0),
        (2, "purchase", 5.0), (4, "purchase", 9.0),
    ]
    out = cramer_von_mises_arms(_ev(spark, rows)).collect()[0]
    assert out["t_stat"] == 0.0
    assert not out["reject_05"]


def test_cvm_disjoint_arms_hand_computed(spark):
    """arm1 = {1, 2}, arm0 = {3, 4} (fully separated).
    Pooled points: 1,2,3,4 with gaps |F1-F0| = .5, 1, .5, 0
    -> sum of squares = .25+1+.25 = 1.5; T = (4/16)*1.5 = 0.375."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        cramer_von_mises_arms,
    )

    rows = [
        (1, "purchase", 1.0), (3, "purchase", 2.0),
        (2, "purchase", 3.0), (4, "purchase", 4.0),
    ]
    out = cramer_von_mises_arms(_ev(spark, rows)).collect()[0]
    assert abs(out["t_stat"] - 0.375) < 1e-6


def test_cliffs_delta_extremes(spark):
    """arm1 strictly above arm0 -> delta = 1 (large); identical values
    -> delta = 0 (negligible)."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        cliffs_delta_arms,
    )

    above = [
        (1, "purchase", 10.0), (3, "purchase", 11.0),
        (2, "purchase", 1.0), (4, "purchase", 2.0),
    ]
    out = cliffs_delta_arms(_ev(spark, above)).collect()[0]
    assert out["delta"] == 1.0 and out["magnitude"] == "large"

    tied = [
        (1, "purchase", 5.0), (2, "purchase", 5.0),
        (3, "purchase", 5.0), (4, "purchase", 5.0),
    ]
    out = cliffs_delta_arms(_ev(spark, tied)).collect()[0]
    assert out["delta"] == 0.0 and out["magnitude"] == "negligible"


def test_hodges_lehmann_hand_computed(spark):
    """arm1 = {10, 20}, arm0 = {1, 3}: diffs {7, 9, 17, 19},
    median = (9+17)/2 = 13."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        hodges_lehmann_shift,
    )

    rows = [
        (1, "purchase", 10.0), (3, "purchase", 20.0),
        (2, "purchase", 1.0), (4, "purchase", 3.0),
    ]
    out = hodges_lehmann_shift(_ev(spark, rows)).collect()[0]
    assert out["n_pairs"] == 4
    assert out["hl_shift"] == 13.0


def test_hodges_lehmann_odd_pairs(spark):
    """arm1 = {10}, arm0 = {1, 3, 6}: diffs {9, 7, 4}, median = 7."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        hodges_lehmann_shift,
    )

    rows = [
        (1, "purchase", 10.0),
        (2, "purchase", 1.0), (4, "purchase", 3.0), (6, "purchase", 6.0),
    ]
    out = hodges_lehmann_shift(_ev(spark, rows)).collect()[0]
    assert out["n_pairs"] == 3 and out["hl_shift"] == 7.0


def test_jarque_bera_symmetric_flat(spark):
    """Symmetric two-point mass {0, 10}^n: skew = 0, kurtosis of a
    Bernoulli(1/2) two-point is -2 -> JB = n/6 * (0 + 4/4) = n/6."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        jarque_bera_value,
    )

    rows = [(i, "purchase", 0.0 if i % 2 else 10.0) for i in range(12)]
    out = jarque_bera_value(
        _ev(spark, rows), where=F.col("event_type") == "purchase"
    ).collect()[0]
    assert out["skewness"] == 0.0
    assert abs(out["ex_kurtosis"] + 2.0) < 1e-9
    assert abs(out["jb"] - 12 / 6.0) < 1e-6
    assert abs(out["p_value"] - math.exp(-1.0)) < 1e-6


def test_jarque_bera_constant_degrades_null(spark):
    from asctb_ct_label_mapper_spark.operators.stats import (
        jarque_bera_value,
    )

    rows = [(i, "purchase", 5.0) for i in range(5)]
    out = jarque_bera_value(_ev(spark, rows)).collect()[0]
    assert out["skewness"] is None  # m2 = 0 -> try_divide NULL
