"""Round-13f: stylometry + keyphrase extraction fixtures."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    """rows: (doc_id, text, source)."""
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_burrows_delta_identical_sources_zero(spark):
    from asctb_ct_label_mapper_spark.operators.textstats import (
        burrows_delta_sources,
    )

    rows = [
        (1, "alpha beta gamma", "s1"),
        (2, "alpha beta gamma", "s2"),
        (3, "alpha beta delta", "s3"),  # the variance carrier
    ]
    out = {
        (r["source_a"], r["source_b"]): r["delta"]
        for r in burrows_delta_sources(_docs(spark, rows), top_k=4).collect()
    }
    assert out[("s1", "s2")] == 0.0
    assert out[("s1", "s3")] > 0.0
    assert out[("s1", "s3")] == out[("s2", "s3")]


def test_burrows_missing_token_counts_as_zero(spark):
    """A source that never uses a top word must get f=0, not drop from
    the z-score pool (the dense-grid contract)."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        burrows_delta_sources,
    )

    rows = [
        (1, "the the the cat", "s1"),
        (2, "dog dog dog dog", "s2"),
    ]
    out = burrows_delta_sources(_docs(spark, rows), top_k=2).collect()
    [r] = out
    # both top words ('dog','the') have nonzero sd across the two
    # sources precisely because the absent side contributes f=0
    assert r["n_tokens_used"] == 2
    assert r["delta"] > 0


def test_yule_k_uniform_vs_repetitive(spark):
    """All-distinct tokens: K = 10^4 (N - N)/N^2 = 0; one token
    repeated N times: K = 10^4 (N^2 - N)/N^2 -> large."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        vocab_concentration_sources,
    )

    rows = [
        (1, "a b c d", "distinct"),
        (2, "x x x x", "repeat"),
    ]
    out = {
        r["source"]: r
        for r in vocab_concentration_sources(_docs(spark, rows)).collect()
    }
    assert out["distinct"]["yule_k"] == 0.0
    assert out["distinct"]["simpson_d"] == 0.0
    # repeat: m2 = 16, N = 4 -> K = 1e4 * 12/16 = 7500; D = 12/12 = 1
    assert out["repeat"]["yule_k"] == 7500.0
    assert out["repeat"]["simpson_d"] == 1.0


def test_rake_phrase_segmentation_and_scores(spark):
    """'deep learning' split from 'models' by the stopword 'of':
    candidate phrases {'deep learning', 'models'}; deg/freq gives the
    2-word phrase the higher score."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        rake_keyphrases,
    )

    rows = [
        (1, "deep learning of models", "s"),
        (2, "deep learning of models", "s"),
    ]
    out = {r["phrase"]: r for r in rake_keyphrases(
        _docs(spark, rows), k=10).collect()}
    assert set(out) == {"deep learning", "models"}
    # deep: freq 2, deg 4 -> 2; learning: same -> 2; phrase = 4
    assert out["deep learning"]["score"] == 4.0
    assert out["deep learning"]["n_words"] == 2
    assert out["deep learning"]["freq"] == 2
    # models: freq 2, deg 2 -> 1
    assert out["models"]["score"] == 1.0


def test_rake_max_phrase_len_guard(spark):
    from asctb_ct_label_mapper_spark.operators.textstats import (
        rake_keyphrases,
    )

    rows = [(1, "alpha beta gamma delta epsilon zeta", "s")]
    out = rake_keyphrases(_docs(spark, rows), k=10, max_phrase_len=4)
    assert out.count() == 0  # 6-word run dropped by the guard
