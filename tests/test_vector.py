"""Vector expression parity vs numpy, and stub-encoder determinism."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.functions.vector import (
    _stub_encode_one,
    cosine_expr,
    dot_expr,
    norm_expr,
    stub_encode_udf,
)


def test_dot_norm_cosine_vs_numpy(spark):
    a = [1.0, 2.0, 3.0, -4.0]
    b = [0.5, -1.0, 2.0, 0.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        dot_expr(F.col("a"), F.col("b")).alias("dot"),
        norm_expr(F.col("a")).alias("norm_a"),
        cosine_expr(F.col("a"), F.col("b")).alias("cos"),
    ).first()
    na, nb = np.array(a), np.array(b)
    assert math.isclose(row["dot"], float(na @ nb), rel_tol=1e-12)
    assert math.isclose(row["norm_a"], float(np.linalg.norm(na)), rel_tol=1e-12)
    expected = float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb)))
    assert math.isclose(row["cos"], expected, rel_tol=1e-12)


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    assert df.select(cosine_expr(F.col("a"), F.col("b")).alias("c")).first()["c"] is None


def test_cosine_float32_inputs_match_double_math(spark):
    rng = np.random.RandomState(3)
    a = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist())], "a array<float>, b array<float>"
    )
    got = df.select(cosine_expr(F.col("a"), F.col("b")).alias("c")).first()["c"]
    ad, bd = a.astype(np.float64), b.astype(np.float64)
    expected = float(ad @ bd / (np.linalg.norm(ad) * np.linalg.norm(bd)))
    assert math.isclose(got, expected, rel_tol=1e-12)


def test_real_encoder_seam_errors_cleanly_without_lib(spark):
    from asctb_ct_label_mapper_spark.functions.vector import sentence_encoder_udf
    from pyspark.sql.utils import PythonException

    encoder = sentence_encoder_udf()
    df = spark.createDataFrame([("x",)], "t string").select(
        encoder(F.col("t")).alias("v")
    )
    # the container has no sentence_transformers: the worker must raise the
    # guiding ImportError (not a cryptic pickle/attr failure)
    import pytest as _pytest

    with _pytest.raises(PythonException, match="sentence_transformers is required"):
        df.collect()


def test_stub_encoder_deterministic_unit_vectors(spark):
    df = spark.createDataFrame([("basal cell",), ("basal cell",), ("tuft cell",)], "t string")
    rows = df.select(stub_encode_udf(F.col("t")).alias("v")).collect()
    v0, v1, v2 = (np.array(r["v"]) for r in rows)
    assert np.array_equal(v0, v1)  # same text -> same vector
    assert not np.array_equal(v0, v2)  # different text -> different vector
    assert math.isclose(float(np.linalg.norm(v0)), 1.0, rel_tol=1e-5)
    # matches the driver-side reference implementation exactly
    assert np.array_equal(v0, _stub_encode_one("basal cell", 16))


def test_stub_sql_oracle_parity():
    """The DuckDB replay of the stub encoder (hex-chained sha256 -> BE
    uint32 components -> float64 normalize -> float32 round) must be
    BIT-identical to the numpy implementation — this is what lets
    mapping_report carry a value oracle."""
    import duckdb

    from asctb_ct_label_mapper_spark.functions.vector import (
        _stub_encode_one,
        sql_stub_hex,
        sql_stub_raw,
        sql_stub_unit,
    )

    con = duckdb.connect()
    for text in ["basal cell", "kidney epithelial cell", "", "a b  c", "Don't"]:
        lit = "'" + text.replace("'", "''") + "'"
        sql = f"""
        WITH h AS (SELECT {sql_stub_hex(lit)} AS hx),
             r AS (SELECT {sql_stub_raw('hx')} AS raw FROM h)
        SELECT {sql_stub_unit('raw')} FROM r
        """
        got = np.array(con.execute(sql).fetchone()[0])
        want = _stub_encode_one(text, 16).astype(np.float64)
        assert np.array_equal(got, want), text
