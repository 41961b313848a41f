"""Round-11c operators — hand-computable fixtures pinning the closed
forms: one-way ANOVA, contingency effect sizes, empirical-Bayes
shrinkage, burstiness, HITS, k-core, assortativity, neighbor-set
Jaccard, directed containment, hard-negative banding, and quantile
normalization."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F


def d(day: int, second: int = 0):
    return datetime(2024, 1, day, 0, second // 60, second % 60)


def test_anova_two_groups_closed_form(spark):
    """Groups [1,2,3] and [4,5,6]: SSB=13.5, SSW=4, F=13.5,
    eta2=13.5/17.5."""
    from asctb_ct_label_mapper_spark.operators.stats import anova_oneway

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = anova_oneway(df, "g", "v").collect()[0]
    assert out["k"] == 2 and out["n"] == 6
    assert out["ss_between"] == 13.5
    assert out["ss_within"] == 4.0
    assert out["f_stat"] == 13.5
    assert abs(out["eta_sq"] - round(13.5 / 17.5, 6)) < 1e-9


def test_contingency_effects_2x2(spark):
    """Table [[10,20],[20,10]]: all expected counts 15 -> chi2=20/3,
    dof=1, V=sqrt(chi2/60), G=2*sum(o*ln(o/e))."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        contingency_effects,
    )

    rows = (
        [("r1", "c1")] * 10
        + [("r1", "c2")] * 20
        + [("r2", "c1")] * 20
        + [("r2", "c2")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = contingency_effects(df, "a", "b").collect()[0]
    chi2 = 4 * (25.0 / 15.0)
    g = 2 * (
        10 * math.log(10 / 15)
        + 20 * math.log(20 / 15)
        + 20 * math.log(20 / 15)
        + 10 * math.log(10 / 15)
    )
    assert out["n"] == 60 and out["r"] == 2 and out["c"] == 2
    assert out["dof"] == 1
    assert abs(out["chi2"] - chi2) < 1e-6
    assert abs(out["g_stat"] - g) < 1e-6
    assert abs(out["cramers_v"] - math.sqrt(chi2 / 60)) < 1e-6


def test_contingency_null_level_is_sentinel(spark):
    """NULL categories are real levels (the categorical_association
    contract): a NULL b-level becomes its own column of the table."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        contingency_effects,
    )

    rows = [("r1", "c1"), ("r1", None), ("r2", "c1"), ("r2", None)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = contingency_effects(df, "a", "b").collect()[0]
    assert out["c"] == 2 and out["dof"] == 1
    assert out["chi2"] == 0.0  # perfectly independent


def test_eb_shrinkage_moment_floor(spark):
    """Rates [1,0,.5,.5] -> m=.5, s2=1/6, MoM alpha+beta = .5*.5*6-1
    = 0.5 < 1 so the floor M=1 engages: alpha=beta=.5; singleton
    users shrink to .75/.25, the n=10 users stay at .5."""
    from asctb_ct_label_mapper_spark.operators.stats import eb_rate_shrinkage

    rows = []
    eid = 0

    def add(user, n, k):
        nonlocal eid
        for i in range(n):
            eid += 1
            rows.append((eid, user, "purchase" if i < k else "view"))

    add(1, 1, 1)
    add(2, 1, 0)
    add(3, 10, 5)
    add(4, 10, 5)
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    out = {
        r["n_bucket"]: r
        for r in eb_rate_shrinkage(
            df, "user_id", (F.col("event_type") == "purchase").cast("int")
        ).collect()
    }
    assert set(out) == {"01_le2", "03_6_10"}
    low = out["01_le2"]
    assert low["keys"] == 2
    assert low["alpha"] == 0.5 and low["beta"] == 0.5
    assert low["avg_raw"] == 0.5 and low["avg_shrunk"] == 0.5
    assert low["avg_abs_shift"] == 0.25  # (|.75-1| + |.25-0|) / 2
    high = out["03_6_10"]
    assert high["avg_abs_shift"] == 0.0  # already at the prior mean


def test_burstiness_regular_and_bursty(spark):
    """Regular gaps -> B=-1 (bin -1.0); gaps [1,1,100] -> B~0.254
    (bin 0.25); a 2-event user (1 gap) is excluded."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        burstiness_histogram,
    )

    rows = []
    # user 1: ts 0,10,20,30 seconds -> gaps 10,10,10
    for i, s in enumerate([0, 10, 20, 30]):
        rows.append((i, 1, d(1, s)))
    # user 2: ts 0,1,2,102 -> gaps 1,1,100
    for i, s in enumerate([0, 1, 2, 102]):
        rows.append((10 + i, 2, d(1, s)))
    # user 3: 2 events only
    rows += [(20, 3, d(1, 0)), (21, 3, d(1, 5))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["bin_lo"]: r for r in burstiness_histogram(df, "user_id", "ts").collect()}
    assert out[-1.0]["n_keys"] == 1 and out[-1.0]["avg_b"] == -1.0
    mu, var = 34.0, ((33.0) ** 2 * 2 + 66.0**2) / 2
    b = (math.sqrt(var) - mu) / (math.sqrt(var) + mu)
    assert abs(out[0.25]["avg_b"] - round(b, 6)) < 1e-9
    assert sum(r["n_keys"] for r in out.values()) == 2


def test_hits_two_hubs_one_authority(spark):
    """A->C, B->C: hubs A=B=0.5, authority C=1 (L1 normalization)."""
    from asctb_ct_label_mapper_spark.operators.graph import hits_scores

    df = spark.createDataFrame(
        [("A", "C", 1.0), ("B", "C", 1.0)], "src string, dst string, w double"
    )
    out = {r["node"]: r for r in hits_scores(df, iters=4).collect()}
    assert out["A"]["hub"] == 0.5 and out["B"]["hub"] == 0.5
    assert out["C"]["hub"] == 0.0
    assert out["C"]["auth"] == 1.0
    assert out["A"]["auth"] == 0.0 and out["B"]["auth"] == 0.0


def test_k_core_peels_pendant(spark):
    """Triangle A-B-C plus pendant D-A: the 2-core is the triangle,
    each with core degree 2; self-loops are dropped."""
    from asctb_ct_label_mapper_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [
            ("A", "B", 1.0),
            ("B", "C", 1.0),
            ("C", "A", 1.0),
            ("D", "A", 1.0),
            ("D", "D", 9.0),
        ],
        "src string, dst string, w double",
    )
    out = {r["node"]: r["core_deg"] for r in k_core(df, k=2).collect()}
    assert out == {"A": 2, "B": 2, "C": 2}


def test_assortativity_star_is_minus_one(spark):
    """Star X-{a,b,c}: every edge pairs degree 3 with degree 1 ->
    assortativity exactly -1."""
    from asctb_ct_label_mapper_spark.operators.graph import (
        degree_assortativity,
    )

    df = spark.createDataFrame(
        [("X", "a", 1.0), ("X", "b", 1.0), ("X", "c", 1.0)],
        "src string, dst string, w double",
    )
    out = degree_assortativity(df).collect()[0]
    assert out["n_edges"] == 6
    assert out["assortativity"] == -1.0


def test_neighbor_jaccard_ranking(spark):
    """A->{x,y}, B->{x,y}, C->{x}: (A,B)=1.0 then (A,C)=(B,C)=0.5
    with the injective (jaccard DESC, a, b) order."""
    from asctb_ct_label_mapper_spark.operators.graph import (
        neighbor_jaccard_topk,
    )

    df = spark.createDataFrame(
        [
            ("A", "x", 1.0),
            ("A", "y", 1.0),
            ("B", "x", 1.0),
            ("B", "y", 1.0),
            ("C", "x", 1.0),
        ],
        "src string, dst string, w double",
    )
    out = [
        (r["node_a"], r["node_b"], r["jaccard"])
        for r in neighbor_jaccard_topk(df, topk=10).collect()
    ]
    assert out == [("A", "B", 1.0), ("A", "C", 0.5), ("B", "C", 0.5)]


def test_containment_directed_asymmetry(spark):
    """doc1's 4 shingles all inside doc2's 8 -> c(1->2)=1.0,
    c(2->1)=0.5; both pass a 0.5 threshold, an unrelated doc never
    pairs."""
    from asctb_ct_label_mapper_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "s"),
            (2, "a b c d e f g h i j", "s"),
            (3, "z y x w v u t", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["id_src"], r["id_dst"]): r["containment"]
        for r in containment_pairs(
            docs, "text", "doc_id", "source", threshold=0.5
        ).collect()
    }
    assert out == {(1, 2): 1.0, (2, 1): 0.5}


def test_hard_negatives_band(spark):
    """Exact dup (sim 1.0) is above the ceiling, orthogonal (0.0)
    below the floor; the two banded refs rank by score."""
    from asctb_ct_label_mapper_spark.operators.similarity import (
        hard_negatives_topk,
    )

    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),
            (11, [0.8, 0.6]),
            (12, [0.0, 1.0]),
            (13, [0.6, 0.8]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = [
        (row["ref_id"], row["score"], row["rank"])
        for row in hard_negatives_topk(
            q, r, k=3, query_id_cols=["vec_id"], ref_id_col="vec_id"
        ).collect()
    ]
    assert out == [(11, 0.8, 1), (13, 0.6, 2)]


def test_quantile_normalize_rank_mapping(spark):
    """g1=[1,2,3], g2=[10,20,30]: both map to pooled positions
    {1,3,6} = values {1,3,30} -> identical mean_after for both
    groups."""
    from asctb_ct_label_mapper_spark.operators.curation import (
        quantile_normalize,
    )

    df = spark.createDataFrame(
        [
            (1, "g1", 1),
            (2, "g1", 2),
            (3, "g1", 3),
            (4, "g2", 10),
            (5, "g2", 20),
            (6, "g2", 30),
        ],
        "doc_id long, source string, n_chars long",
    )
    out = {
        r["source"]: r
        for r in quantile_normalize(df, "source", "n_chars", "doc_id").collect()
    }
    after = round((1 + 3 + 30) / 3, 6)
    assert out["g1"]["mean_before"] == 2.0
    assert out["g2"]["mean_before"] == 20.0
    assert out["g1"]["mean_after"] == after
    assert out["g2"]["mean_after"] == after


def test_hits_empty_graph_returns_empty(spark):
    """Zero edges -> zero rows (the SQL oracle's shape), not a
    ZeroDivisionError (r11 review finding)."""
    from asctb_ct_label_mapper_spark.operators.graph import hits_scores

    df = spark.createDataFrame([], "src string, dst string, w double")
    out = hits_scores(df, iters=3)
    assert out.collect() == []
    assert out.columns == ["node", "hub", "auth"]


def test_containment_rejects_nonpositive_threshold(spark):
    """threshold <= 0 would silently diverge from the quadratic SQL
    mirror (zero-overlap pairs never enter the census) -> ValueError."""
    import pytest

    from asctb_ct_label_mapper_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d", "s")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="threshold > 0"):
        containment_pairs(docs, "text", "doc_id", "source", threshold=0.0)
