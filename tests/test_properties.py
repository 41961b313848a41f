"""Property-based parity: the native clean expression and the Python model
of the reference pipeline agree on arbitrary inputs. One Spark job per
property (hypothesis generates the batch, Spark cleans it in one pass)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.functions.nlp import clean_text_expr

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")),
    min_size=0,
    max_size=60,
)


def python_model(text: str) -> str:
    """Reference semantics of the native subset: no-argument split()
    (whitespace runs, empties dropped — ADVICE r4 fidelity fix), per word
    strip non-alphanumerics (F1+F3) and lowercase (F5), rejoin.

    The engine's splitter class is ASCII whitespace (Java/RE2 ``\\s``);
    Python's str.split() additionally treats \\x1c-\\x1f, NEL, NBSP and
    Unicode Zs as whitespace — a documented divergence on exotic inputs
    (label data is ASCII), so the model splits on the engine's class.
    """
    words = [w for w in re.split(r"[ \t\n\x0b\x0c\r]+", text) if w]
    return " ".join(re.sub("[^a-zA-Z0-9]", "", w).lower() for w in words)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_clean_text_matches_python_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["o"] for r in df.select(clean_text_expr(F.col("t")).alias("o")).collect()]
    # Spark preserves row order within a single small partition collect;
    # compare as multisets to stay order-agnostic anyway
    assert sorted(got) == sorted(python_model(t) for t in texts)


# --- round-7 session-2 operator invariants ----------------------------------

IDS = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60,
    unique=True,
)


@settings(max_examples=15, deadline=None)
@given(
    IDS,
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=2, max_value=5),
)
def test_proportional_sample_invariants(spark, ids, total, n_groups):
    """Hamilton allocation: exact total (capped by N), per-stratum quota
    never exceeds the stratum, allocation independent of row order."""
    from asctb_ct_label_mapper_spark.operators.curation import (
        proportional_sample,
    )

    rows = [(i, f"g{i % n_groups}") for i in ids]
    total = min(total, len(rows))
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = proportional_sample(df, total=total).collect()
    assert len(out) == total
    sizes: dict[str, int] = {}
    for r in out:
        sizes[r["lang"]] = sizes.get(r["lang"], 0) + 1
    group_n = {f"g{g}": sum(1 for i in ids if i % n_groups == g)
               for g in range(n_groups)}
    for g, k in sizes.items():
        assert k <= group_n[g]
        # quota column matches realized size (quota never exceeds group)
    # order independence: reversed input allocates identically
    out2 = proportional_sample(
        spark.createDataFrame(rows[::-1], "doc_id long, lang string"),
        total=total,
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)


@settings(max_examples=15, deadline=None)
@given(IDS, st.integers(min_value=1, max_value=50))
def test_global_rank_is_a_permutation(spark, ids, bucket_width):
    from asctb_ct_label_mapper_spark.operators.curation import global_rank

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = global_rank(
        df,
        bucket=(F.col("doc_id") / bucket_width).cast("long"),
        order_cols=["doc_id"],
    ).collect()
    ranks = sorted(r["global_rank"] for r in out)
    assert ranks == list(range(1, len(ids) + 1))
    by_id = {r["doc_id"]: r["global_rank"] for r in out}
    assert [by_id[i] for i in sorted(ids)] == ranks  # rank follows order


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=12),
             min_size=1, max_size=30),
    st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=12),
             min_size=1, max_size=30),
)
def test_bloom_prefilter_never_false_negative(spark, corpus_texts, batch_texts):
    """The bloom contract: every batch text present in the corpus is
    flagged maybe=1 AND dup=1; no text absent from the corpus is ever
    dup=1 (false positives may set maybe=1 only)."""
    from asctb_ct_label_mapper_spark.operators.dedup import (
        bloom_prefilter_dedup,
    )

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    cset = set(corpus_texts)
    out = bloom_prefilter_dedup(corpus, batch).collect()
    assert len(out) == len(batch_texts)
    for r in out:
        t = batch_texts[r["doc_id"] - 1000]
        if t in cset:
            assert r["bloom_maybe"] == 1 and r["is_dup"] == 1
        else:
            assert r["is_dup"] == 0


@settings(max_examples=15, deadline=None)
@given(st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
                min_size=1, max_size=40))
def test_ewma_bounded_by_series_extremes(spark, values):
    """EWMA is a convex combination at every step: the final state lies
    in [min(values), max(values)]."""
    from datetime import datetime, timedelta

    from asctb_ct_label_mapper_spark.operators.timeseries import ewma_by_key

    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(minutes=i), 1, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    [r] = ewma_by_key(df).collect()
    assert min(values) - 1e-9 <= r["ewma"] <= max(values) + 1e-9
    assert r["n_obs"] == len(values)


@settings(max_examples=15, deadline=None)
@given(IDS)
def test_gap_ranges_partition_the_missing_ids(spark, ids):
    """Gap ranges exactly cover the integers between min and max that are
    absent, with no overlap and no observed id inside any range."""
    from asctb_ct_label_mapper_spark.operators.timeseries import id_gap_ranges

    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    out = id_gap_ranges(df, "event_id", bucket_size=7).collect()
    covered = set()
    for r in out:
        span = set(range(r["gap_start"], r["gap_end"] + 1))
        assert not (span & covered), "overlapping gap ranges"
        assert r["n_missing"] == len(span)
        covered |= span
    expect = set(range(min(ids), max(ids) + 1)) - set(ids)
    assert covered == expect


def _ewma_seq(values, alpha=0.5):
    s = values[0]
    for x in values[1:]:
        s = alpha * x + (1 - alpha) * s
    return s


def _ewma_segmented_math(values, splits, alpha):
    """Pure reference of the segmented scan: fold each segment to an
    affine (m, a) pair (first global element -> (0, x)), compose across
    segments. Used with Fraction inputs to prove the ALGEBRA exact."""
    pairs = []
    idx = 0
    for seg in splits:
        m, a = None, None
        for j in range(len(seg)):
            em = (0 * alpha) if idx == 0 else (1 - alpha)
            ea = seg[j] if idx == 0 else alpha * seg[j]
            if m is None:
                m, a = em, ea
            else:
                m, a = em * m, em * a + ea
            idx += 1
        pairs.append((m, a))
    M, A = pairs[0]
    for m, a in pairs[1:]:
        M, A = m * M, m * A + a
    return A


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.fractions(min_value=-100, max_value=100), min_size=1,
             max_size=30),
    st.data(),
)
def test_ewma_segmented_algebra_exact(values, data):
    """In exact rational arithmetic the segmented affine-map composition
    equals the sequential recurrence for EVERY split of the series — the
    decomposition is algebraically lossless; only IEEE rounding points
    differ (covered by the relative-error test below)."""
    from fractions import Fraction

    alpha = Fraction(1, 2)
    cuts = sorted(
        data.draw(st.sets(st.integers(1, len(values) - 1), max_size=5))
    ) if len(values) > 1 else []
    splits, prev = [], 0
    for c in cuts + [len(values)]:
        splits.append(values[prev:c])
        prev = c
    got = _ewma_segmented_math(values, [s for s in splits if s], alpha)
    want = Fraction(values[0])
    for x in values[1:]:
        want = alpha * x + (1 - alpha) * want
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=1, max_size=50))
def test_ewma_segmented_matches_single_fold(spark, values):
    """ewma_by_key (two-phase segmented scan) == ewma_by_key_fold (the
    whole-series ordered fold, the oracle anchor) on series that span
    MANY month buckets: n_obs identical, ewma equal to <=1e-9 relative
    (IEEE rounding points differ across bucket boundaries; the algebra
    is exact — see test_ewma_segmented_algebra_exact)."""
    from datetime import datetime, timedelta

    from asctb_ct_label_mapper_spark.operators.timeseries import (
        ewma_by_key,
        ewma_by_key_fold,
    )

    base = datetime(2024, 1, 1)
    # 17-day stride => a 50-element series crosses ~28 month buckets
    rows = [(i, base + timedelta(days=17 * i), i % 2, v)
            for i, v in enumerate(values)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    seg = {r["key"]: r for r in ewma_by_key(df).collect()}
    fold = {r["key"]: r for r in ewma_by_key_fold(df).collect()}
    assert set(seg) == set(fold)
    for k in seg:
        assert seg[k]["n_obs"] == fold[k]["n_obs"]
        scale = max(1.0, abs(fold[k]["ewma"]))
        assert abs(seg[k]["ewma"] - fold[k]["ewma"]) <= 1e-9 * scale


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=1, max_size=40))
def test_holt_segmented_matches_sequential(spark, values):
    """holt_by_key (2x2-matrix segmented scan) vs the sequential Holt
    recurrence in pure Python, on series spanning many month buckets:
    level/trend equal to <=1e-9 relative (rounding points differ across
    bucket boundaries; the matrix algebra is associative exactly)."""
    from datetime import datetime, timedelta

    from asctb_ct_label_mapper_spark.operators.timeseries import holt_by_key

    a, b = 0.5, 0.25
    lvl, tr = values[0], 0.0
    for x in values[1:]:
        new_l = a * x + (1 - a) * (lvl + tr)
        tr = b * (new_l - lvl) + (1 - b) * tr
        lvl = new_l

    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(days=17 * i), 1, v)
            for i, v in enumerate(values)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    [r] = holt_by_key(df).collect()
    assert r["n_obs"] == len(values)
    for got, want in ((r["level"], lvl), (r["trend"], tr)):
        scale = max(1.0, abs(want))
        assert abs(got - want) <= 1e-9 * scale
