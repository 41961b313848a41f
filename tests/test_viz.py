"""F14-F16/S8: projection-input plan + deterministic PCA projection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.viz import (
    embedding_projection_2d,
    pca_2d,
    prepare_projection_input,
    save_scatter_png,
)


@pytest.fixture(scope="module")
def reference(spark):
    rows = [
        ("CL:1", "alpha", "lbl-a", "def-a", [1.0, 0.0, 0.0]),
        ("CL:2", "beta", None, "NaN", [0.0, 1.0, 0.0]),      # null label, NaN def
        ("CL:3", "gamma", "lbl-g", "def-g" * 100, [0.0, 0.0, 1.0]),  # long def
    ]
    return spark.createDataFrame(
        rows,
        "CT_ID string, CT_NAME string, CT_LABEL string, definition string,"
        " embedding array<float>",
    )


def test_prepare_projection_imputations(reference):
    rows = {r["CT_ID"]: r for r in prepare_projection_input(reference).collect()}
    assert rows["CL:2"]["CT_LABEL"] == "beta"  # null label -> CT_NAME
    assert rows["CL:2"]["hover_text"] == "beta"  # NaN def -> imputed label
    assert len(rows["CL:3"]["hover_text"]) == 150  # F16 truncation


def test_pca_2d_deterministic_shape():
    rng = np.random.RandomState(0)
    m = rng.standard_normal((20, 8))
    a, b = pca_2d(m), pca_2d(m)
    assert a.shape == (20, 2)
    assert np.array_equal(a, b)


def test_projection_dataframe(reference):
    out = embedding_projection_2d(reference)
    rows = out.collect()
    assert len(rows) == 3
    assert set(out.columns) == {"CT_ID", "CT_NAME", "CT_LABEL", "hover_text", "x", "y"}
    assert all(isinstance(r["x"], float) for r in rows)


def test_empty_projection(spark):
    empty = spark.createDataFrame(
        [],
        "CT_ID string, CT_NAME string, CT_LABEL string, definition string,"
        " embedding array<float>",
    )
    assert embedding_projection_2d(empty).count() == 0


def test_save_scatter_png_degrades_without_matplotlib(reference, tmp_path):
    out = embedding_projection_2d(reference)
    # container has no matplotlib: must return False, never raise
    assert save_scatter_png(out, str(tmp_path / "p.png")) in (True, False)


def test_umap_method_falls_back_to_pca_without_lib(spark, reference):
    """method='umap' must produce the PCA result when umap-learn is absent
    (this container) — same schema, same values as the default path."""
    from asctb_ct_label_mapper_spark.operators.viz import embedding_projection_2d, umap_2d
    import numpy as np

    try:
        import umap  # type: ignore  # noqa: F401
        has_umap = True
    except ImportError:
        has_umap = False

    default = embedding_projection_2d(reference).collect()
    via_umap = embedding_projection_2d(reference, method="umap").collect()
    assert [r["CT_ID"] for r in via_umap] == [r["CT_ID"] for r in default]
    if not has_umap:
        assert umap_2d(np.zeros((3, 4))) is None
        assert sorted(map(tuple, via_umap)) == sorted(map(tuple, default))


def test_random_projection_matches_numpy(spark):
    import numpy as np

    from asctb_ct_label_mapper_spark.operators.similarity import random_hyperplanes
    from asctb_ct_label_mapper_spark.operators.viz import random_projection_2d

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((10, 64))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: (r["x"], r["y"]) for r in random_projection_2d(df).collect()}
    planes = random_hyperplanes(64, 2, 13)
    for i, v in enumerate(vecs):
        assert out[i][0] == pytest.approx(round(float(v @ planes[0]), 6), abs=1e-6)
        assert out[i][1] == pytest.approx(round(float(v @ planes[1]), 6), abs=1e-6)


def test_random_projection_plan_is_native(spark):
    """The scale path must stay UDF-free and shuffle-free."""
    from asctb_ct_label_mapper_spark.operators.viz import random_projection_2d

    df = spark.createDataFrame([(1, [0.0] * 64)], "vec_id long, embedding array<double>")
    plan = random_projection_2d(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython
