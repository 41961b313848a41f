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


def _stub_digest(text: str, nbytes: int) -> bytes:
    """Hex-chained deterministic byte stream: block 0 = sha256(utf8(text)),
    block i = sha256(ascii(hex(block i-1))); the byte stream is the
    concatenated blocks' hex decoded. ceil(nbytes/32) hashes per text (2
    for the default 16-dim stub). Chaining on the HEX STRING rather than
    raw digest bytes keeps every step expressible in SQL engines whose
    sha256() accepts only VARCHAR (DuckDB) — which is what lets the
    flagship mapping_report be oracle-checked end-to-end
    (see ``sql_stub_hex`` / ``sql_stub_unit``)."""
    h = hashlib.sha256(text.encode("utf-8")).hexdigest()
    stream = h
    while len(stream) < nbytes * 2:
        h = hashlib.sha256(h.encode("ascii")).hexdigest()
        stream += h
    return bytes.fromhex(stream[: nbytes * 2])


def sql_stub_hex(text_sql: str, dim: int = 16) -> str:
    """DuckDB expression for the stub's hex stream over ``text_sql``:
    chained sha256 blocks concatenated (block i+1 re-derives block i by
    nesting — negligible at oracle scale)."""
    n_blocks = -(-dim * 4 // 32)
    blocks = [f"sha256({text_sql})"]
    for _ in range(1, n_blocks):
        blocks.append(f"sha256({blocks[-1]})")
    return " || ".join(blocks)


def sql_stub_raw(hex_col: str, dim: int = 16) -> str:
    """DuckDB expression: the un-normalized float64 components — each 8-hex
    big-endian uint32 mapped to [-1, 1) exactly as numpy's
    ``>u4 / 2**31 - 1`` does."""
    comps = ", ".join(
        f"CAST(('0x' || substr({hex_col}, {i * 8 + 1}, 8)) AS UBIGINT)"
        f" / 2147483648.0 - 1.0"
        for i in range(dim)
    )
    return f"[{comps}]"


def sql_stub_unit(raw_col: str) -> str:
    """DuckDB expression: L2-normalize in float64, round through REAL
    (float32) and back — bit-identical to the numpy
    ``(mat / norm).astype(float32)`` path (verified by
    test_stub_sql_oracle_parity)."""
    return (
        f"list_transform({raw_col}, x -> CAST(CAST(x / "
        f"sqrt(list_sum(list_transform({raw_col}, y -> y*y))) AS REAL) AS DOUBLE))"
    )


def _stub_encode_batch(texts: list, dim: int) -> list:
    """Vectorized batch encoding: per text only the hash chain runs in
    Python; byte->float conversion and L2 normalization are single numpy
    operations over the whole (n, dim) matrix."""
    nbytes = dim * 4
    idx = [i for i, t in enumerate(texts) if t is not None]
    if not idx:
        return [None] * len(texts)
    blob = b"".join(_stub_digest(texts[i], nbytes) for i in idx)
    mat = (
        np.frombuffer(blob, dtype=">u4").reshape(len(idx), dim).astype(np.float64)
        / 2**31
        - 1.0
    )
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    unit = (mat / norms).astype(np.float32)
    out: list = [None] * len(texts)
    for row, i in enumerate(idx):
        out[i] = unit[row]
    return out


def _stub_encode_one(text: str, dim: int) -> np.ndarray:
    """Single-text flavor of the deterministic stub (delegates to the batch
    path so both produce identical vectors)."""
    return _stub_encode_batch([text], dim)[0]


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
        return pd.Series(_stub_encode_batch(s.tolist(), dim), index=s.index)

    return _encode(texts)
