"""Round-13 verdict #6: the driver-built HNSW rung."""

import numpy as np
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.similarity import (
    _hnsw_search,
    hnsw_build_index,
    hnsw_topk,
    top_k_similarity_join,
)


def _unit(n, d, seed):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_build_is_deterministic():
    u = _unit(60, 16, 3)
    a = hnsw_build_index(u, m=4, ef_construction=16, seed=7)
    b = hnsw_build_index(u, m=4, ef_construction=16, seed=7)
    assert a["entry"] == b["entry"]
    assert len(a["layers"]) == len(b["layers"])
    for la, lb in zip(a["layers"], b["layers"]):
        for x, y in zip(la, lb):
            assert (x is None) == (y is None)
            if x is not None:
                assert list(x) == list(y)


def test_layer0_contains_every_node():
    u = _unit(50, 8, 5)
    idx = hnsw_build_index(u, m=4, seed=7)
    assert all(a is not None for a in idx["layers"][0])


def test_search_exact_at_full_ef():
    """With ef_search >= n the beam covers the reachable graph, so the
    top-1 must be the true nearest neighbor for every probe."""
    u = _unit(80, 12, 11)
    idx = hnsw_build_index(u, m=6, ef_construction=40, seed=7)
    probes = _unit(20, 12, 13)
    for q in probes:
        found = _hnsw_search(idx, u, q, k=1, ef_search=80)
        true = int(np.argmax(u @ q))
        assert found[0] == true


def test_hnsw_topk_high_recall_on_clustered_data(spark):
    """Clustered vectors (HNSW's real regime): recall@3 vs the exact
    rung must clear the gate's 0.9 envelope comfortably."""
    rng = np.random.default_rng(17)
    centers = rng.standard_normal((6, 16)) * 4
    rows = []
    for i in range(240):
        v = centers[i % 6] + rng.standard_normal(16) * 0.3
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = emb.filter(F.col("vec_id") % 10 == 0)
    r = emb.filter(F.col("vec_id") % 10 != 0)
    a = set(
        map(
            tuple,
            hnsw_topk(q, r, 3, ["vec_id"], "vec_id")
            .select("vec_id", "ref_id")
            .collect(),
        )
    )
    e = set(
        map(
            tuple,
            top_k_similarity_join(q, r, 3, ["vec_id"], "vec_id")
            .select("vec_id", "ref_id")
            .collect(),
        )
    )
    assert len(a & e) / len(e) >= 0.9
