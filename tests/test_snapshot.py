"""Corpus snapshot diff operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.snapshot import corpus_diff


def test_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_null_vs_empty_text_differ(spark):
    old = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "")], "doc_id long, text string")
    got = corpus_diff(old, new).collect()
    assert [(r["doc_id"], r["status"]) for r in got] == [(1, "changed")]


def test_multi_column_hash(spark):
    old = spark.createDataFrame([(1, "a", "en")], "doc_id long, text string, lang string")
    new = spark.createDataFrame([(1, "a", "de")], "doc_id long, text string, lang string")
    assert corpus_diff(old, new, content_cols=("text",)).count() == 0
    out = corpus_diff(old, new, content_cols=("text", "lang")).collect()
    assert out[0]["status"] == "changed"


def test_join_carries_hashes_not_text(spark):
    old = spark.createDataFrame([(1, "x" * 100)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "y" * 100)], "doc_id long, text string")
    plan = corpus_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    # the text attribute is consumed below the join projection: it must
    # not appear in the join output (churn payload is (id, status) only)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
