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
