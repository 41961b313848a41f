"""Vector functions over ``array<float>`` columns (F12-F14 parity).

The reference stores 768-d numpy embeddings in an object column and scores
them with sklearn ``cosine_similarity`` (main.py:84-89). The engine keeps
embeddings as ``array<float>`` and expresses dot/norm/cosine as native
higher-order functions (``zip_with`` + ``aggregate``) so similarity scoring
stays JVM-side inside whole-stage codegen — no Python crossing in the hot
path (SURVEY §2.6 F13).

``stub_encode_udf`` is the deterministic hash-based encoder used by all
correctness tests in place of a downloaded SentenceTransformer
(SURVEY §5, FIXTURES.md preamble): same text -> same unit vector, always.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_STUB_DIM = 16


def dot_expr(a: Column, b: Column) -> Column:
    """Sum of elementwise products, accumulated in DOUBLE.

    Elements are cast to double before multiplying so float32 inputs are
    scored with the same precision as the DuckDB oracle (DOUBLE[] cast).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    """L2 norm in DOUBLE."""
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity, the reference's F13 (main.py:86-89) as a single
    native expression. Null/zero-norm safe: returns NULL on zero vectors
    (the reference would produce NaN; NULL is the relational equivalent).
    Mismatched dimensions also yield NULL (``zip_with`` pads with nulls) —
    callers joining differently-encoded columns see null scores, not wrong
    ones."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom != 0, dot_expr(a, b) / denom)


def sql_cosine(a_sql: str, b_sql: str) -> str:
    """DuckDB oracle equivalent of ``cosine_expr`` (DOUBLE precision)."""
    return (
        f"list_cosine_similarity(CAST({a_sql} AS DOUBLE[]), "
        f"CAST({b_sql} AS DOUBLE[]))"
    )


def _stub_encode_one(text: str, dim: int) -> np.ndarray:
    """Deterministic unit vector from sha256(text) — no model download.

    Each component is derived from an independent hash so nearby texts get
    uncorrelated vectors; the result is L2-normalized float32.
    """
    vals = np.empty(dim, dtype=np.float64)
    for i in range(dim):
        h = hashlib.sha256(f"{text}\x00{i}".encode("utf-8")).digest()
        # top 8 bytes as unsigned int -> [-1, 1)
        vals[i] = int.from_bytes(h[:8], "big") / 2**63 - 1.0
    n = np.linalg.norm(vals)
    if n == 0.0:
        vals[0] = 1.0
        n = 1.0
    return (vals / n).astype(np.float32)


def sentence_encoder_udf(
    model_name: str = "sentence-transformers/all-mpnet-base-v2",
    batch_size: int = 64,
):
    """F12 REAL-model seam: iterator pandas UDF loading a SentenceTransformer
    ONCE per Python worker and encoding in batches — the production
    replacement for ``stub_encode_udf`` (same signature: Column -> Column).
    The reference encodes row-at-a-time via ``df.apply`` (main.py:50-56);
    the iterator form amortizes the model load across the whole partition.

    ``sentence_transformers`` is not in this container: the returned UDF
    raises ImportError AT EXECUTION with a clear message, and tests pin
    that behavior. The Spark-side plumbing (schema, batching, plan shape)
    is identical to the stub path, which is what the correctness suite
    exercises.
    """
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise ImportError(
                "sentence_transformers is required for the real encoder; "
                "use stub_encode_udf for deterministic offline runs"
            ) from e
        model = SentenceTransformer(model_name)  # once per worker
        for series in batches:
            texts = series.fillna("").tolist()
            vecs = model.encode(texts, batch_size=batch_size)
            yield pd.Series([v.astype(np.float32) for v in vecs])

    def encoder(texts: Column) -> Column:
        return _encode(texts)

    return encoder


def stub_encode_udf(texts: Column, dim: int = DEFAULT_STUB_DIM) -> Column:
    """F12 stand-in: deterministic text -> array<float> encoder.

    Arrow-vectorized pandas UDF; encoding is embarrassingly parallel and
    needs no model state, so a plain scalar pandas UDF suffices (a real
    SentenceTransformer would use the iterator form to load the model once
    per worker — see operators/mapping.py docstring)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _encode(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None else _stub_encode_one(t, dim))

    return _encode(texts)
