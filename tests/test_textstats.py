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


class TestCorpusDivergence:
    def test_identical_groups_zero_jsd(self, spark):
        from asctb_ct_label_mapper_spark.operators.textstats import corpus_divergence

        rows = [(1, "a b c", "s1"), (2, "a b c", "s2")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r["source"]: r for r in corpus_divergence(df).collect()}
        # Each group's distribution equals the rest's -> JSD 0.
        assert out["s1"]["jsd"] == pytest.approx(0.0, abs=1e-9)
        assert out["s2"]["jsd"] == pytest.approx(0.0, abs=1e-9)
        assert out["s1"]["n_tokens"] == 3

    def test_disjoint_vocab_ln2(self, spark):
        from asctb_ct_label_mapper_spark.operators.textstats import corpus_divergence
        import math

        rows = [(1, "a a a", "s1"), (2, "b b b", "s2")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r["source"]: r["jsd"] for r in corpus_divergence(df).collect()}
        # Disjoint supports -> maximal JSD = ln 2 (natural-log base).
        assert out["s1"] == pytest.approx(math.log(2), abs=1e-6)
        assert out["s2"] == pytest.approx(math.log(2), abs=1e-6)

    def test_hand_computed_mixture(self, spark):
        from asctb_ct_label_mapper_spark.operators.textstats import corpus_divergence
        import math

        # s1: {a: 1.0}; rest (s2): {a: 0.5, b: 0.5}
        rows = [(1, "a a", "s1"), (2, "a b", "s2")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r["source"]: r["jsd"] for r in corpus_divergence(df).collect()}
        p_a, q_a, q_b = 1.0, 0.5, 0.5
        m_a, m_b = (p_a + q_a) / 2, q_b / 2
        expect = (
            0.5 * p_a * math.log(p_a / m_a)
            + 0.5 * q_a * math.log(q_a / m_a)
            + 0.5 * q_b * math.log(q_b / m_b)
        )
        assert out["s1"] == pytest.approx(expect, abs=1e-6)

    def test_matches_sql_oracle(self, spark, sf_dir):
        import duckdb

        from asctb_ct_label_mapper_spark.operators.textstats import (
            corpus_divergence,
            sql_corpus_divergence,
        )
        from asctb_ct_label_mapper_spark.schemas import load_table

        got = {
            r["source"]: (r["n_tokens"], r["jsd"])
            for r in corpus_divergence(load_table(spark, sf_dir, "documents")).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        for src, n, jsd in con.execute(sql_corpus_divergence("documents")).fetchall():
            assert got[src][0] == n
            assert got[src][1] == pytest.approx(jsd, abs=1e-6)


class TestBpeInduction:
    def test_pair_counts_weighted_by_word_frequency(self, spark):
        from asctb_ct_label_mapper_spark.operators.textstats import bpe_pair_counts

        # "ab" x3 (two docs), "abc" x1 -> pair 'ab' count 4, 'bc' count 1
        df = spark.createDataFrame(
            [(1, "ab ab abc"), (2, "ab x")], "doc_id long, text string"
        )
        got = {r["pair"]: r["n"] for r in bpe_pair_counts(df, k=10).collect()}
        assert got["ab"] == 4 and got["bc"] == 1
        assert "x" not in got  # single-char words contribute no pairs

    def test_learn_merges_greedy_and_deterministic(self, spark):
        from asctb_ct_label_mapper_spark.operators.textstats import bpe_learn_merges

        df = spark.createDataFrame(
            [(1, "low low low lower lowest")], "doc_id long, text string"
        )
        merges = bpe_learn_merges(df, n_merges=3)
        assert len(merges) == 3
        # 'lo'+'w' dominates: first merge is the most frequent adjacent pair
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")
        # deterministic across runs
        assert merges == bpe_learn_merges(df, n_merges=3)

    def test_learn_merges_consumes_word_counts_once(self, spark):
        """Merged symbols become units: after ('l','o') and ('lo','w'),
        'low' is one symbol, so later merges attach suffixes to it."""
        from asctb_ct_label_mapper_spark.operators.textstats import bpe_learn_merges

        df = spark.createDataFrame(
            [(1, "lower lower lowest")], "doc_id long, text string"
        )
        merges = bpe_learn_merges(df, n_merges=4)
        assert ("l", "o") in merges and ("lo", "w") in merges
        joined = ["".join(p) for p in merges]
        assert "lowe" in joined or "er" in joined


def test_char_entropy_signal(spark):
    from asctb_ct_label_mapper_spark.operators.textstats import char_entropy

    import random
    import string

    rng = random.Random(3)
    b64ish = "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(400))
    rows = [
        (1, "aaaaaaaaaaaaaaaaaaaa"),                      # near-zero entropy
        (2, "the quick brown fox jumps over the lazy dog"),  # natural band
        (3, b64ish),                                       # junk: high entropy
        (4, ""),                                           # empty -> 0
        (5, None),                                         # null-safe
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["entropy_bits"] for r in char_entropy(df).collect()}
    assert got[1] == 0.0
    assert 3.0 < got[2] < 4.8
    assert got[3] > got[2] > got[1]
    assert got[4] == 0.0 and got[5] == 0.0


def test_zipf_fit_recovers_known_slope(spark):
    """A corpus built with freq(rank) = round(1000 * rank^-1) fits a
    slope near -1; a perfectly uniform corpus fits slope 0."""
    from asctb_ct_label_mapper_spark.operators.textstats import zipf_fit

    words = []
    for rank in range(1, 51):
        words += [f"w{rank:03d}"] * max(1, round(1000 / rank))
    docs = [
        (i, " ".join(words[j] for j in range(i, len(words), 97)))
        for i in range(97)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    [r] = zipf_fit(df, top_n=50).collect()
    assert r["n_ranks"] == 50
    assert -1.15 < r["slope"] < -0.85

    flat = spark.createDataFrame(
        [(i, " ".join(f"u{j}" for j in range(30))) for i in range(5)],
        "doc_id long, text string",
    )
    [rf] = zipf_fit(flat, top_n=30).collect()
    assert abs(rf["slope"]) < 1e-9


def test_zipf_fit_single_rank_yields_null_not_crash(spark):
    from asctb_ct_label_mapper_spark.operators.textstats import zipf_fit

    df = spark.createDataFrame(
        [(1, "same same same"), (2, "same")], "doc_id long, text string"
    )
    [r] = zipf_fit(df).collect()
    assert r["n_ranks"] == 1
    assert r["slope"] is None and r["intercept"] is None


def test_pmi_collocations_bound_pair_beats_free_pair(spark):
    """'new york' always co-occurs (PMI = log2(N_bi * N_uni^2 /
    (c_xy^-1 ...)) high); 'of the' occurs no more than chance. Pinned
    arithmetic on a tiny corpus: every bigram token also counts in the
    unigram margins."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        pmi_collocations,
    )

    import math

    docs = spark.createDataFrame(
        [("new york " * 5).strip(),
         ("of the of and the and " * 5).strip()],
        "string",
    ).toDF("text")
    out = {(r["w1"], r["w2"]): r
           for r in pmi_collocations(docs, min_count=5).collect()}
    ny = out[("new", "york")]
    # margins: c(new york)=5, N_bi=38, c(new)=5, c(york)=5, N_uni=40
    want = math.log2((5 / 38) / ((5 / 40) * (5 / 40)))
    assert abs(ny["pmi"] - round(want, 6)) < 1e-9 and ny["n"] == 5
    # 'the of' style pairs exist but score far lower than the bound pair
    assert all(
        v["pmi"] < ny["pmi"] for k, v in out.items() if k != ("new", "york")
    )


def test_pmi_single_token_docs_emit_nothing(spark):
    from asctb_ct_label_mapper_spark.operators.textstats import (
        pmi_collocations,
    )

    docs = spark.createDataFrame([("hello",), ("",)], "text string")
    assert pmi_collocations(docs, min_count=1).count() == 0


def test_vocab_growth_sketch_error_bound_two_scales(spark, sf_dir):
    """r10 verdict #5: the sketch Heaps curve tracks the exact one —
    relative error within the KMV envelope (~4/sqrt(k) ≈ 25% at k=256;
    observed ≤ 3% on the fixtures) at BOTH test scales, and the exact
    corpus token volume matches bit-for-bit."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        vocab_growth,
        vocab_growth_sketch,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        exact = {
            r["shard"]: r for r in vocab_growth(docs, n=2).collect()
        }
        approx = {
            r["shard"]: r
            for r in vocab_growth_sketch(docs, n=2, k=256).collect()
        }
        assert set(exact) == set(approx)
        for s in exact:
            rel = abs(
                approx[s]["vocab_estimate"] - exact[s]["vocab_size"]
            ) / max(exact[s]["vocab_size"], 1)
            assert rel < 0.25, (s, approx[s], exact[s])
            assert approx[s]["corpus_grams"] == exact[s]["corpus_grams"]


def test_vocab_growth_sketch_prefix_monotone(spark, sf_dir):
    """Prefix vocabulary estimates are non-decreasing in the shard
    order below the estimator switch-over and the kept-hash count never
    exceeds k (the bounded-state contract)."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        vocab_growth_sketch,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        vocab_growth_sketch(docs, n=2, k=64).collect(),
        key=lambda r: r["shard"],
    )
    assert all(r["n_kept"] <= 64 for r in rows)
    kept = [r["n_kept"] for r in rows]
    assert kept == sorted(kept)  # sketch fill level only ever grows


def test_textrank_hub_word_wins(spark):
    """A hub word adjacent to every other word out-ranks the leaves."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        textrank_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "hub alpha hub beta hub gamma"),
            (2, "hub alpha hub beta hub gamma"),
            (3, "alpha beta"),
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    out = textrank_keywords(docs, top_n=10, min_count=2).collect()
    assert out[0]["word"] == "hub"
    words = [r["word"] for r in out]
    assert set(words) >= {"hub", "alpha", "beta", "gamma"}


def test_textrank_empty_graph(spark):
    from asctb_ct_label_mapper_spark.operators.textstats import (
        textrank_keywords,
    )

    docs = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert textrank_keywords(docs, min_count=2).count() == 0


def test_script_profile_hand_fractions(spark):
    """'ab1 2' -> alpha 2/5, digit 2/5, space 1/5, other 0; an
    all-punct doc lands fully in frac_other; empty docs are excluded."""
    from asctb_ct_label_mapper_spark.operators.textstats import (
        script_profile,
    )

    df = spark.createDataFrame(
        [(1, "x", "ab1 2"), (2, "x", "!!!!"), (3, "x", "")],
        "doc_id long, lang string, text string",
    )
    r = script_profile(df).collect()[0]
    assert r["n_docs"] == 2
    assert r["frac_alpha"] == round((0.4 + 0.0) / 2, 6)
    assert r["frac_digit"] == round((0.4 + 0.0) / 2, 6)
    assert r["frac_space"] == round((0.2 + 0.0) / 2, 6)
    assert r["frac_other"] == 0.5
