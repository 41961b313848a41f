"""Word-level parity fixtures for the NLP pipeline (SURVEY §5 layer 1),
including the reference quirks: rstrip('s') after lemmatize
(nlp_preprocessing.py:36), raw-vs-cleaned stopword test (:96-97), and the
null-propagating text concat (asctb_data_wrangling.py:206)."""

from __future__ import annotations

from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.functions.nlp import (
    STOPWORDS,
    _FullPipeline,
    _num_to_words,
    clean_text_expr,
    clean_text_full_udf,
    embedding_text_expr,
)


def _clean_one(spark, expr_builder, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(expr_builder(F.col("t")).alias("out")).first()["out"]


def test_clean_text_native_subset(spark):
    # F1 (spaces), F3 (special chars), F5 (lowercase), F8 (word-wise join);
    # whitespace RUNS collapse: the reference's no-argument label.split()
    # (main.py:82,139) splits on any whitespace and drops empties, so
    # consecutive spaces / tabs / newlines yield single-space joins
    # (ADVICE r4: the old single-space splitter diverged here).
    assert (
        _clean_one(spark, clean_text_expr, "Adventitial  Fibroblasts!")
        == "adventitial fibroblasts"
    )
    assert _clean_one(spark, clean_text_expr, "AT-2 cell") == "at2 cell"
    assert _clean_one(spark, clean_text_expr, "CD8+ T cell") == "cd8 t cell"
    assert _clean_one(spark, clean_text_expr, "a\t b\n\nc") == "a b c"
    assert _clean_one(spark, clean_text_expr, "  edge  ") == "edge"


def test_clean_text_null_safe(spark):
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(clean_text_expr(F.col("t")).alias("o")).first()["o"] is None


def test_full_pipeline_word_fixtures():
    pipe = _FullPipeline.get()
    # F3 strips punctuation, F5 lowercases, F6 rstrip('s') quirk drops the
    # trailing plural 's' with or without a lemmatizer present
    assert pipe.clean_word("Fibroblasts!") == "fibroblast"
    assert not pipe.clean_word("cells").endswith("s")
    # F4 digit -> words (then F3 already ran, so '2' survives as a digit)
    assert pipe.clean_word("2") == "two"
    # F2 contraction expands BEFORE special-char strip -> 'donot'
    assert pipe.clean_word("don't") == "donot"


def test_num_to_words_fallback():
    assert _num_to_words(0) == "zero"
    assert _num_to_words(15) == "fifteen"
    assert _num_to_words(42) == "forty-two"
    assert _num_to_words(100) == "one hundred"
    assert _num_to_words(123) == "one hundred and twenty-three"
    assert _num_to_words(2001) == "two thousand one"


def test_full_udf_matches_pipeline(spark):
    texts = ["Type 2 Pneumocytes", "CD8+ T cells", "basal cell"]
    pipe = _FullPipeline.get()
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["o"] for r in df.select(clean_text_full_udf(F.col("t")).alias("o")).collect()]
    assert got == [pipe.clean_text(t) for t in texts]


def test_embedding_text_ordered_distinct(spark):
    # 'cell' appears twice -> kept once at first position; stopword 'the'
    # dropped on the RAW form (reference quirk: test raw, append cleaned)
    out = _clean_one(spark, embedding_text_expr, "the Cell basal cell Cell")
    assert out == "cell basal"


def test_embedding_text_raw_stopword_quirk(spark):
    # 'The!' cleans to 'the' but its RAW form is not in the stopword set,
    # so the reference KEEPS it (nlp_preprocessing.py:96) — parity check.
    out = _clean_one(spark, embedding_text_expr, "The! cell")
    assert out == "the cell"
    assert "the" in STOPWORDS


def test_embedding_text_truncates_at_150(spark):
    long_text = ("word" + "x" * 26 + " ") * 10  # 31-char words
    out = _clean_one(spark, embedding_text_expr, long_text)
    # only words inside the first 150 chars survive
    assert all(len(w) <= 30 for w in out.split())
    assert len(out.split()) <= 5


def test_full_pipeline_fallback_quirks(spark):
    """F2/F4/F6 deterministic fallback path (oracle-checked in
    nlp_clean_full): contraction expansion loses its space to F3 ('donot'),
    digits verbalize AFTER special-char strip, rstrip('s') strips ALL
    trailing s chars."""
    from asctb_ct_label_mapper_spark.functions.nlp import clean_text_full_udf

    cases = {
        "Don't": "donot",              # F2 then F3 strips the space
        "25": "twenty-five",           # F4 (after F3), hyphen survives
        "117": "one hundred and seventeen",
        "cells": "cell",               # F6 rstrip('s')
        "glass": "gla",                # rstrip strips ALL trailing s
        "2x": "2x",                    # not pure digits -> F4 skipped
    }
    df = spark.createDataFrame([(k,) for k in cases], "t string")
    out = {r["t"]: r["o"] for r in df.select("t", clean_text_full_udf(F.col("t")).alias("o")).collect()}
    assert out == cases


def test_sql_clean_text_full_matches_python(spark):
    """The DuckDB mirror of the fallback pipeline must agree with the UDF
    on a stress fixture (contractions, numbers, runs of whitespace)."""
    import duckdb

    from asctb_ct_label_mapper_spark.functions.nlp import (
        clean_text_full_udf,
        sql_clean_text_full,
    )

    texts = [
        "Don't  count 25 cells",
        "isn't\t999 glass beads",
        "it's 0 or 100 and 515",
        "plain label",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    spark_out = {
        r["t"]: r["o"]
        for r in df.select("t", clean_text_full_udf(F.col("t")).alias("o")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture(t VARCHAR)")
    con.executemany("INSERT INTO fixture VALUES (?)", [(t,) for t in texts])
    duck_out = dict(con.sql(f"SELECT t, {sql_clean_text_full('t')} FROM fixture").fetchall())
    assert spark_out == duck_out


class TestNormalizeText:
    def test_nfc_composes_and_controls_strip(self, spark):
        from asctb_ct_label_mapper_spark.functions.nlp import normalize_text

        rows = [
            (1, "café"),            # decomposed -> composed é
            (2, "a\x07b"),                # BEL deleted, words glued (control, not space)
            (3, "  a\t\tb\r\nc  "),       # whitespace family -> single spaces, trimmed
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["normalized"] for r in normalize_text(df).collect()}
        assert got[1] == "café"
        assert got[2] == "ab"
        assert got[3] == "a b c"
        assert got[4] is None

    def test_idempotent(self, spark):
        from asctb_ct_label_mapper_spark.functions.nlp import normalize_text

        df = spark.createDataFrame([(1, " x́  y\x01 ")], "doc_id long, text string")
        once = normalize_text(df).select("doc_id", F.col("normalized").alias("text"))
        twice = normalize_text(once).collect()[0]["normalized"]
        assert twice == normalize_text(df).collect()[0]["normalized"]
