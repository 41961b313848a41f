"""Embedding-visualization support (F14-F16, S8) and the driver-side plot
edge.

Reference: ``visualize_embeddings`` (plotting.py:72-119) — pickle read, P6
imputations, np.vstack (F14), UMAP 2-d (F15), hover-text assembly (F16),
plotly scatter (S8); ``make_venn_diagram`` saves a matplotlib PNG (S8).

Engine split (SURVEY §3.3): everything up to the projection INPUT is a
DataFrame plan (imputations, truncation, column assembly); the projection
itself runs driver-side on the collected (small — reference scale is 83
rows) matrix. UMAP is not in this container, so the scalable stand-in is a
deterministic PCA via numpy SVD (SURVEY F15 names MLlib PCA / PCA fallback).
Plot rendering is import-guarded: with matplotlib/plotly absent the data
path still works and returns the plot-ready table.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hover_text_expr(definition, max_len: int = 150):
    """F16: first ``max_len`` chars of the definition (plotting.py:99)."""
    return F.substring(definition, 1, max_len)


def prepare_projection_input(
    reference: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """P6 imputations + F16 assembly as one plan (plotting.py:89-103):
    CT_LABEL falls back to CT_NAME then 'Unknown CT-Label'; 'NaN'
    definitions fall back to CT_LABEL; hover text truncated."""
    ct_label = F.coalesce(F.col("CT_LABEL"), F.col("CT_NAME"), F.lit("Unknown CT-Label"))
    definition = F.when(F.col("definition") == "NaN", ct_label).otherwise(F.col("definition"))
    return reference.select(
        "CT_ID",
        F.col("CT_NAME"),
        ct_label.alias("CT_LABEL"),
        hover_text_expr(definition).alias("hover_text"),
        F.col(vec_col).alias("embedding"),
    )


def pca_2d(matrix: np.ndarray) -> np.ndarray:
    """Deterministic 2-component PCA via SVD (F15 stand-in for UMAP).
    Signs are fixed by forcing the largest-|loading| of each component
    positive so results are reproducible across BLAS builds."""
    centered = matrix - matrix.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    comps = vt[:2]
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return centered @ comps.T


def umap_2d(matrix: np.ndarray, seed: int = 42) -> np.ndarray | None:
    """F15 exact path (plotting.py:93-96): real UMAP when ``umap-learn``
    is importable (not in this container), else None so callers fall back
    to the deterministic PCA stand-in. Mirrors the matplotlib sink guard:
    the lib's absence degrades the fidelity of one driver-side step, never
    the data path."""
    try:
        from umap import UMAP  # type: ignore
    except ImportError:
        return None
    return np.asarray(
        UMAP(n_components=2, random_state=seed).fit_transform(matrix),
        dtype=np.float64,
    )


def embedding_projection_2d(
    reference: DataFrame, vec_col: str = "embedding", method: str = "pca"
) -> DataFrame:
    """F14+F15: collect the (small) prepared reference table, stack the
    embedding matrix, project to 2-d, and return a plot-ready DataFrame
    (x, y, CT_ID, CT_LABEL, hover_text). The collect is the deliberate
    driver boundary — projection inputs are reference-sized (10^2..10^4
    rows), never the fact table.

    ``method="umap"`` uses real UMAP when the lib exists and silently
    falls back to PCA when it doesn't; ``"pca"`` (default) stays the
    deterministic, container-independent test path."""
    prepared = prepare_projection_input(reference, vec_col)
    rows = prepared.collect()
    if not rows:
        return prepared.sparkSession.createDataFrame(
            [], "CT_ID string, CT_NAME string, CT_LABEL string, hover_text string, x double, y double"
        )
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xy = umap_2d(mat) if method == "umap" else None
    if xy is None:
        xy = pca_2d(mat)
    out = [
        (r["CT_ID"], r["CT_NAME"], r["CT_LABEL"], r["hover_text"], float(x), float(y))
        for r, (x, y) in zip(rows, xy)
    ]
    return prepared.sparkSession.createDataFrame(
        out, "CT_ID string, CT_NAME string, CT_LABEL string, hover_text string, x double, y double"
    )


def _ordinal_ranks(v: np.ndarray) -> np.ndarray:
    """Ordinal (stable-sort) ranks — ties broken by position, which is
    deterministic under kind='stable'; the rank-correlation bound below
    carries enough margin that ordinal-vs-average tie handling cannot
    flip it."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty_like(order)
    ranks[order] = np.arange(len(v))
    return ranks.astype(np.float64)


def projection_invariants(
    reference: DataFrame,
    vec_col: str = "embedding",
    min_rank_corr: float = 0.1,
) -> DataFrame:
    """Value-ORACLED readout of the PCA projection (r13 verdict #4 —
    graduating ``viz_projection`` off the rows-only whitelist): the SVD
    itself has no relational replay, so the gate splits into

    - an EXACT spine DuckDB replays bit-for-bit: per-point CT_ID /
      CT_NAME / hover_text plus ``dist_sum`` — the point's summed
      full-dimension Euclidean distance to every other point (the
      quadratic census is 200 points — driver-bounded by construction),
      proving the collected matrix IS the table's content; and
    - INVARIANT booleans the oracle pins TRUE: Spearman rank
      correlation between 2-d and full-dim pairwise distances >= the
      bound (measured ~0.22 across all SFs on the near-isotropic
      synthetic embeddings; a broken projection lands near 0),
      centering (PCA removes the mean exactly), and PC-variance
      ordering (var(x) >= var(y)).

    Rows are sorted by CT_ID before the fold so float summation order
    is deterministic across partitionings."""
    prepared = prepare_projection_input(reference, vec_col)
    rows = sorted(prepared.collect(), key=lambda r: r["CT_ID"])
    spark = prepared.sparkSession
    schema = (
        "CT_ID string, CT_NAME string, hover_text string, "
        "dist_sum double, rank_corr_ok boolean, centered_ok boolean, "
        "var_ordered_ok boolean"
    )
    if not rows:
        return spark.createDataFrame([], schema)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xy = pca_2d(mat)
    d_full = np.sqrt(((mat[:, None, :] - mat[None, :, :]) ** 2).sum(-1))
    d_2d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    iu = np.triu_indices(len(rows), 1)
    rho = float(
        np.corrcoef(_ordinal_ranks(d_full[iu]), _ordinal_ranks(d_2d[iu]))[0, 1]
    )
    scale = float(np.abs(xy).max()) or 1.0
    rank_ok = bool(rho >= min_rank_corr)
    centered_ok = bool(
        abs(float(xy[:, 0].mean())) < 1e-9 * scale
        and abs(float(xy[:, 1].mean())) < 1e-9 * scale
    )
    var_ordered_ok = bool(xy[:, 0].var() >= xy[:, 1].var() - 1e-12)
    dist_sums = d_full.sum(axis=1)
    out = [
        (
            r["CT_ID"],
            r["CT_NAME"],
            r["hover_text"],
            round(float(s), 6),
            rank_ok,
            centered_ok,
            var_ordered_ok,
        )
        for r, s in zip(rows, dist_sums)
    ]
    return spark.createDataFrame(out, schema)


def random_projection_2d(
    df: DataFrame,
    vec_col: str = "embedding",
    id_cols: tuple[str, ...] = ("vec_id",),
    dim: int = 64,
    seed: int = 13,
) -> DataFrame:
    """F15 SCALE path: seeded Gaussian random projection to 2-d as a pure
    native plan — no driver collect, no UDF, no shuffle.

    ``embedding_projection_2d`` (PCA/UMAP) is the fidelity path for
    reference-sized inputs and deliberately collects; this is the shape
    that projects BILLIONS of points (Johnson–Lindenstrauss: random
    Gaussian directions preserve pairwise structure in expectation). The
    two projection directions come from the same ``random_hyperplanes``
    family the LSH operators use, so a SQL oracle can replay them as
    literals — the viz family's only value-unverifiable step (SVD) is
    bypassed entirely.

    Reference parity: plotting.py:93-96 projects embeddings to 2-d for a
    scatter; the projection METHOD there (UMAP) is a fidelity choice, not
    a semantic contract — any structure-preserving 2-d map feeds the same
    downstream scatter/hover assembly.
    """
    from asctb_ct_label_mapper_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, 2, seed)

    def dot_lit(plane):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        return F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return df.select(
        *id_cols,
        F.round(dot_lit(planes[0]), 6).alias("x"),
        F.round(dot_lit(planes[1]), 6).alias("y"),
    )


def sql_random_projection_2d(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_cols: tuple[str, ...] = ("vec_id",),
    dim: int = 64,
    seed: int = 13,
) -> str:
    """DuckDB replay of ``random_projection_2d``: the same seeded planes
    as float literals (same technique as ``_lsh_topk_oracle``)."""
    from asctb_ct_label_mapper_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, 2, seed)
    lits = ["[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes]
    ids = ", ".join(id_cols)
    return f"""
    SELECT {ids},
           round(list_dot_product(CAST({vec_col} AS DOUBLE[]), {lits[0]}), 6) AS x,
           round(list_dot_product(CAST({vec_col} AS DOUBLE[]), {lits[1]}), 6) AS y
    FROM {table}
    """


def save_scatter_png(projection: DataFrame, path: str) -> bool:
    """S8 scatter sink. Returns False (no-op) when matplotlib is absent —
    the projection table itself is the tested artifact."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    rows = projection.collect()
    fig, ax = plt.subplots(figsize=(7, 7))
    ax.scatter([r["x"] for r in rows], [r["y"] for r in rows], s=12)
    fig.savefig(path)
    plt.close(fig)
    return True


def save_venn_png(regions: DataFrame, path: str, labels=("A", "B", "C")) -> bool:
    """S8 venn sink over ``operators.setops.venn_regions`` output. No-op
    False without matplotlib_venn (not in this container)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib_venn import venn2, venn3  # type: ignore
    except ImportError:
        return False
    counts = {r["region"]: r["n_labels"] for r in regions.collect()}
    fig, ax = plt.subplots(figsize=(7, 7))
    if any(len(k) == 3 for k in counts):
        venn3(subsets=counts, set_labels=labels, ax=ax)
    else:
        venn2(subsets=counts, set_labels=labels[:2], ax=ax)
    fig.savefig(path)
    plt.close(fig)
    return True
