"""BM25 lexical retrieval: formula agreement with a pure-Python oracle,
determinism of the top-k cut, input validation, plan posture."""

from __future__ import annotations

import math

import pytest

from asctb_ct_label_mapper_spark.operators.retrieval import bm25_topk


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(v) / avgdl)
            )
        if any(t in v for t in terms):
            out[i] = round(s, 6)
    return out


FIXTURE = [
    (0, "spark join join fast table"),
    (1, "spark spark spark spark spark spark spark spark"),
    (2, "slow scan no match here at all in this one"),
    (3, "join"),
    (4, "vector spark join"),
    (5, "the quick brown fox"),
]


def test_bm25_matches_pure_python_oracle(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id bigint, text string")
    terms = ["spark", "join"]
    got = {r.doc_id: r.bm25 for r in bm25_topk(docs, terms, k=10).collect()}
    want = _py_bm25(FIXTURE, terms)
    assert set(got) == set(want)  # docs 2 and 5 excluded (no term hit)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=2e-6), i


def test_bm25_topk_cut_is_deterministic(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id bigint, text string")
    first = [(r.doc_id, r.bm25) for r in bm25_topk(docs, ["join"], k=2).collect()]
    again = [(r.doc_id, r.bm25) for r in bm25_topk(docs, ["join"], k=2).collect()]
    assert first == again
    assert len(first) == 2
    # ordered by (score desc, doc_id asc)
    assert first == sorted(first, key=lambda p: (-p[1], p[0]))


def test_bm25_term_frequency_saturates(spark):
    """k1 saturation: 8 repeats of 'spark' must not score 8x a single hit
    in a same-length doc (the property tf-idf lacks and BM25 adds)."""
    rows = [(0, "spark a b c d e f g"), (1, "spark spark spark spark spark spark spark spark")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["spark"], k=10).collect()}
    assert got[1] > got[0]
    assert got[1] < 3 * got[0]


def test_bm25_rejects_bad_terms(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id bigint, text string")
    for bad in ([], ["two words"], ["it's"], [""]):
        with pytest.raises(ValueError):
            bm25_topk(docs, bad)


def test_bm25_plan_has_no_explode_and_broadcasts_stats(spark):
    """The scale contract: per-doc tf is column-wise (no Generate/explode
    of the corpus) and corpus stats re-attach via broadcast."""
    docs = spark.createDataFrame(FIXTURE, "doc_id bigint, text string")
    plan = bm25_topk(docs, ["spark", "join"], k=3)._jdf.queryExecution().toString()
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ql_matches_pure_python_oracle(spark):
    from asctb_ct_label_mapper_spark.operators.retrieval import ql_topk

    docs = spark.createDataFrame(FIXTURE, "doc_id bigint, text string")
    terms = ["spark", "join"]
    got = {r.doc_id: r.ql for r in ql_topk(docs, terms, k=10, mu=300.0).collect()}
    toks = {i: t.split(" ") for i, t in FIXTURE}
    total = sum(len(v) for v in toks.values())
    cf = {t: sum(v.count(t) for v in toks.values()) for t in terms}
    for i, v in toks.items():
        if not any(t in v for t in terms):
            assert i not in got
            continue
        want = sum(
            math.log((v.count(t) + 300.0 * cf[t] / total) / (len(v) + 300.0))
            for t in terms
        )
        assert got[i] == pytest.approx(round(want, 6), abs=2e-6), i


def test_rrf_fusion_ranks_and_one_sided_docs(spark):
    from asctb_ct_label_mapper_spark.operators.retrieval import rrf_fuse

    run_a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id bigint, bm25 double"
    )
    run_b = spark.createDataFrame(
        [(2, 0.9), (4, 0.5)], "doc_id bigint, ql double"
    )
    got = {r.doc_id: r.rrf for r in rrf_fuse(run_a, run_b, k=10).collect()}
    # doc 2: rank 2 in A, rank 1 in B; docs 1/3 A-only; doc 4 B-only
    assert got[2] == pytest.approx(round(1 / 62 + 1 / 61, 6), abs=1e-6)
    assert got[1] == pytest.approx(round(1 / 61, 6), abs=1e-6)
    assert got[3] == pytest.approx(round(1 / 63, 6), abs=1e-6)
    assert got[4] == pytest.approx(round(1 / 62, 6), abs=1e-6)
    # fusion puts the doc found by BOTH channels first
    assert max(got, key=lambda d: (got[d], -d)) == 2


def test_rrf_tie_break_is_score_then_id(spark):
    from asctb_ct_label_mapper_spark.operators.retrieval import rrf_fuse

    # equal scores: rank assigned by doc_id ascending
    run_a = spark.createDataFrame(
        [(7, 1.0), (3, 1.0)], "doc_id bigint, bm25 double"
    )
    run_b = spark.createDataFrame([], "doc_id bigint, ql double")
    got = {r.doc_id: r.rrf for r in rrf_fuse(run_a, run_b, k=10).collect()}
    assert got[3] > got[7]


def test_ql_term_absent_from_corpus_contributes_zero(spark):
    """Review finding: a zero-cf term must contribute 0, not NULL-poison
    the Spark sum (log(0) -> NULL) while the oracle hard-errors."""
    from asctb_ct_label_mapper_spark.operators.retrieval import ql_topk

    docs = spark.createDataFrame(FIXTURE, "doc_id bigint, text string")
    with_ghost = {
        r.doc_id: r.ql
        for r in ql_topk(docs, ["spark", "zzzunseen"], k=10).collect()
    }
    alone = {r.doc_id: r.ql for r in ql_topk(docs, ["spark"], k=10).collect()}
    assert with_ghost == alone
    assert all(v is not None for v in with_ghost.values())


def test_sql_ql_zero_cf_term_does_not_error():
    import duckdb

    from asctb_ct_label_mapper_spark.operators.retrieval import sql_ql_topk

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    )
    rows = con.execute(
        sql_ql_topk("documents", terms=["spark", "zzzunseen"], k=5)
    ).fetchall()
    assert len(rows) == 5
    assert all(r[1] is not None for r in rows)
