"""Scalar (int8) embedding quantization: the 4x memory/shuffle lever for
similarity search at scale.

Not in the reference (it stores float CSV embeddings, main.py:57) — engine
brief territory: at 100 TB an ``array<float>`` embedding column dominates
scan and shuffle bytes, and symmetric int8 quantization cuts it 4x while
keeping cosine top-k nearly intact (error bounded by 0.5/scale per
component). The ANN candidate stages (LSH buckets / IVF lists) can run
entirely on int8 with exact float re-ranking only on the candidate set.

All native expressions (higher-order functions over the array), fully
codegen; the quantize-dequantize arithmetic is written identically in the
DuckDB oracle (same double promotion, same floor(x*scale + 0.5) rounding)
so errors hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(vec: Column, qmax: int) -> Column:
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.when(amax > 0, F.lit(float(qmax)) / amax).otherwise(F.lit(1.0))


def _hoist(df: DataFrame, vec_col: str, id_col: str, qmax: int) -> DataFrame:
    """Project the double-cast vector and its scale into their own
    projection BEFORE any lambda references them. Lambda-bearing HOFs
    evaluate interpreted per element, and an inlined ``scale``
    subexpression (itself an array_max over a transform) would be
    RECOMPUTED for every element — O(dim^2) interpreted evals per row
    (measured 2.4 s -> 0.25 s for 1800x64 at sf0.1). Same hoisting trick
    as the minhash shingle projection (dedup.py). CollapseProject keeps
    the boundary because ``scale`` is referenced more than once upstream.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    hoisted = df.select(F.col(id_col), v.alias("_v"))
    return hoisted.select(
        F.col(id_col), F.col("_v"), _scale_expr(F.col("_v"), qmax).alias("_scale")
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector quantization: q_i = floor(x_i * scale + 0.5)
    with scale = qmax / max|x| (qmax = 2^(bits-1) - 1, so int8 -> 127).

    floor(x + 0.5) instead of round(): both engines define floor
    identically on doubles, while round() half-way semantics differ across
    engines — determinism is the contract here.

    Returns (id_col, q: array<int>, scale: double); dequantize with
    q_i / scale.
    """
    qmax = 2 ** (bits - 1) - 1
    hoisted = _hoist(df, vec_col, id_col, qmax)
    q = F.transform(
        F.col("_v"), lambda x: F.floor(x * F.col("_scale") + 0.5).cast("int")
    )
    return hoisted.select(
        F.col(id_col), q.alias("q"), F.col("_scale").alias("scale")
    )


def quantize_error_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Per-vector reconstruction error of the quantize-dequantize roundtrip:
    dim, scale, max_abs_err, mean_abs_err, and the theoretical bound check
    (max_abs_err <= 0.5/scale holds by construction — surfaced as a column
    so the oracle verifies the invariant on every row, not just in a unit
    test)."""
    qmax = 2 ** (bits - 1) - 1
    hoisted = _hoist(df, vec_col, id_col, qmax)
    err = F.transform(
        F.col("_v"),
        lambda x: F.abs(x - F.floor(x * F.col("_scale") + 0.5) / F.col("_scale")),
    )
    # err hoisted one level further: max/mean/bound all reference it
    with_err = hoisted.select(
        F.col(id_col), F.col("_scale"), F.size("_v").alias("dim"), err.alias("_err")
    )
    max_err = F.array_max(F.col("_err"))
    mean_err = F.aggregate(
        F.col("_err"), F.lit(0.0), lambda acc, e: acc + e
    ) / F.greatest(F.col("dim"), F.lit(1))
    return with_err.select(
        F.col(id_col),
        F.col("dim"),
        F.round(F.col("_scale"), 6).alias("scale"),
        F.round(max_err, 8).alias("max_abs_err"),
        F.round(mean_err, 8).alias("mean_abs_err"),
        (max_err <= 0.5 / F.col("_scale") + 1e-12).alias("within_bound"),
    )


def sql_quantize_error_stats(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> str:
    """DuckDB replay of ``quantize_error_stats`` — identical double
    promotion and floor-based rounding, so values (not just shapes) match."""
    qmax = 2 ** (bits - 1) - 1
    return f"""
    WITH scaled AS (
        SELECT {id_col}, {vec_col} AS v,
            CASE WHEN amax > 0 THEN {qmax}.0 / amax ELSE 1.0 END AS scale
        FROM (
            SELECT {id_col}, {vec_col},
                list_max([abs(CAST(x AS DOUBLE)) for x in {vec_col}]) AS amax
            FROM {table}
        )
    ),
    errs AS (
        SELECT {id_col}, scale, len(v) AS dim,
            [abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale)
             for x in v] AS err
        FROM scaled
    )
    SELECT {id_col},
        dim,
        round(scale, 6) AS scale,
        round(list_max(err), 8) AS max_abs_err,
        round(list_sum(err) / greatest(dim, 1), 8) AS mean_abs_err,
        (list_max(err) <= 0.5 / scale + 1e-12) AS within_bound
    FROM errs
    """
