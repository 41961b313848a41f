"""Text-analysis operators: hand-computed fixtures."""

from __future__ import annotations

import pytest

from asctb_ct_label_mapper_spark.operators.textstats import (
    fingerprint,
    lang_id,
    text_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox"),        # 4 tokens, stopword 'the'
        (2, "der hund und die katze ist"), # german markers
        (3, "a a a a"),                    # repetition
        (4, "Hello, world!"),              # punctuation
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_text_stats_hand_computed(docs):
    rows = {r["doc_id"]: r for r in text_stats(docs).collect()}
    r1 = rows[1]
    assert r1["n_chars"] == len("the quick brown fox")
    assert r1["n_tokens"] == 4
    assert r1["n_distinct_tokens"] == 4
    assert r1["stopword_ratio"] == 0.25  # 'the'
    assert r1["punct_ratio"] == 0.0
    r3 = rows[3]
    assert r3["n_distinct_tokens"] == 1
    assert r3["stopword_ratio"] == 1.0  # 'a' is a stopword
    r4 = rows[4]
    assert r4["punct_ratio"] > 0  # ',' and '!'
    assert r4["n_regex_tokens"] == 4  # hello , world !
    for r in rows.values():
        assert 0.0 <= r["quality_score"] <= 1.0
    # diverse short text beats degenerate repetition
    assert rows[1]["quality_score"] > rows[3]["quality_score"]


def test_lang_id_markers(docs):
    rows = {r["doc_id"]: r for r in lang_id(docs).collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "de"
    assert rows[4]["lang_pred"] == "und"  # no markers


def test_lang_id_tie_breaks_lexicographically(spark):
    # 'le' is a french marker; 'the' english: craft a tie 1-1
    df = spark.createDataFrame([(1, "the le")], "doc_id long, text string")
    assert lang_id(df).first()["lang_pred"] == "en"  # en < fr


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha beta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fingerprint(df).collect()}
    assert rows[1]["fingerprint"] == rows[2]["fingerprint"]
    assert rows[1]["content_hash"] != rows[2]["content_hash"]


def test_winnowing_shares_fingerprints_on_common_substring(spark):
    from asctb_ct_label_mapper_spark.operators.textstats import winnowing_fingerprints

    common = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, f"intro words {common} closing remark one"),
            (2, f"other prefix {common} different ending here"),
            (3, "totally unrelated text with no shared phrases at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: set(r["fingerprints"]) for r in winnowing_fingerprints(df).collect()}
    assert fps[1] & fps[2], "docs sharing a long substring must share fingerprints"
    assert not (fps[1] & fps[3])


def test_winnowing_short_doc(spark):
    from asctb_ct_label_mapper_spark.operators.textstats import winnowing_fingerprints

    df = spark.createDataFrame([(1, "a b"), (2, "a b c d")], "doc_id long, text string")
    rows = {r["doc_id"]: r["fingerprints"] for r in winnowing_fingerprints(df).collect()}
    assert rows[1] == []  # shorter than one shingle
    assert len(rows[2]) == 1  # fewer hashes than window -> single min


def test_fingerprint_punctuation_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "Alpha! beta.")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in fingerprint(df).collect()}
    assert rows[1]["fingerprint"] == rows[2]["fingerprint"]
