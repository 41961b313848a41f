"""Token-blocked fuzzy matching: verify the blocking contract (shared
token required), the distance cut, dedup of multi-token candidates, and
the skew cap."""

from __future__ import annotations

import pytest

from asctb_ct_label_mapper_spark.operators.linkage import fuzzy_name_pairs


def _pairs(df):
    return {(r.name_a, r.name_b, r.dist) for r in df.collect()}


def test_fuzzy_pairs_basic(spark):
    rows = [
        ("red widget",),
        ("red widget",),  # duplicate row: distinct() collapses it
        ("red widgets",),  # dist 1 from "red widget", shares both-ish tokens
        ("red gadget",),  # dist 2 from "red widget" via shared "red"
        ("blue bolt",),  # far from everything
    ]
    df = spark.createDataFrame(rows, "p_name string")
    got = _pairs(fuzzy_name_pairs(df, "p_name", max_dist=2))
    assert ("red widget", "red widgets", 1) in got
    assert ("red gadget", "red widget", 2) in got
    assert not any("blue bolt" in (a, b) for a, b, _ in got)
    # "red gadget" vs "red widgets" is dist 3 -> cut
    assert not any({a, b} == {"red gadget", "red widgets"} for a, b, _ in got)


def test_fuzzy_pairs_blocking_is_the_contract(spark):
    """A pair within the distance bound but sharing NO whitespace token is
    NOT emitted — blocking is part of the operator's semantics (and the
    oracle replays it), exactly like the LSH dedup family."""
    df = spark.createDataFrame([("ab cd",), ("ab ce",), ("xy cd",)], "p_name string")
    got = _pairs(fuzzy_name_pairs(df, "p_name", max_dist=2))
    assert ("ab cd", "ab ce", 1) in got  # share "ab"
    assert ("ab cd", "xy cd", 2) in got  # share "cd"
    # "ab ce" vs "xy cd" dist 3 -> out regardless
    df2 = spark.createDataFrame([("aa bb",), ("ba ab",)], "p_name string")
    # levenshtein("aa bb","ba ab") = 2, tokens {aa,bb} vs {ba,ab} disjoint
    got2 = _pairs(fuzzy_name_pairs(df2, "p_name", max_dist=2))
    assert got2 == set()


def test_fuzzy_pairs_null_and_identity(spark):
    df = spark.createDataFrame([("red widget",), (None,)], "p_name string")
    got = _pairs(fuzzy_name_pairs(df, "p_name", max_dist=2))
    assert got == set()  # no self-pairs, nulls dropped


def test_fuzzy_pairs_max_token_df_drops_hub_tokens(spark):
    """With the skew cap at 2, a token blocking 3 names stops generating
    candidates; pairs reachable only through it disappear."""
    rows = [("red a",), ("red b",), ("red c",)]
    df = spark.createDataFrame(rows, "p_name string")
    uncapped = _pairs(fuzzy_name_pairs(df, "p_name", max_dist=2))
    assert len(uncapped) == 3
    capped = _pairs(fuzzy_name_pairs(df, "p_name", max_dist=2, max_token_df=2))
    assert capped == set()


def test_fuzzy_pairs_rejects_negative_dist(spark):
    df = spark.createDataFrame([("x y",)], "p_name string")
    with pytest.raises(ValueError):
        fuzzy_name_pairs(df, "p_name", max_dist=-1)


def test_fuzzy_pairs_plan_is_equi_join_not_cartesian(spark):
    df = spark.createDataFrame([("red a",), ("red b",)], "p_name string")
    plan = (
        fuzzy_name_pairs(df, "p_name", max_dist=2)
        ._jdf.queryExecution()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_co_occurrence_pairs_counts_and_cap(spark):
    """Pairs are unordered (a1 < a2), counted once per shared group
    regardless of duplicate memberships; the degree cap drops the hot
    group entirely; min_shared filters."""
    from asctb_ct_label_mapper_spark.operators.linkage import (
        co_occurrence_pairs,
    )

    rows = [
        ("g1", 1), ("g1", 2), ("g1", 2),  # dup membership counts once
        ("g2", 1), ("g2", 2), ("g2", 3),
        ("hot", 1), ("hot", 2), ("hot", 3), ("hot", 4), ("hot", 5),
    ]
    df = spark.createDataFrame(rows, "g string, a long")
    got = {
        (r["a1"], r["a2"]): r["n_shared"]
        for r in co_occurrence_pairs(
            df, "g", "a", max_group_degree=4
        ).collect()
    }
    # hot (degree 5) dropped: pairs come from g1 and g2 only
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    high = {
        (r["a1"], r["a2"]): r["n_shared"]
        for r in co_occurrence_pairs(
            df, "g", "a", max_group_degree=4, min_shared=2
        ).collect()
    }
    assert high == {(1, 2): 2}


def test_cooccurrence_degree_cap_ignores_null_actors(spark):
    """r10 second review pass: the degree cap counts distinct NON-NULL
    actors on BOTH engines — a NULL membership must not push a group
    over the cap (Spark's size(collect_set) never saw it; the SQL
    mirror now filters it from the membership CTE)."""
    import duckdb

    from asctb_ct_label_mapper_spark.operators.linkage import (
        co_occurrence_pairs,
        sql_co_occurrence_pairs,
    )

    rows = [("g", "u1"), ("g", "u2"), ("g", None)]
    df = spark.createDataFrame(rows, "grp string, actor string")
    got = sorted(
        (r["a1"], r["a2"], r["n_shared"])
        for r in co_occurrence_pairs(
            df, "grp", "actor", max_group_degree=2
        ).collect()
    )
    assert got == [("u1", "u2", 1)]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES"
        " ('g','u1'), ('g','u2'), ('g',NULL)) v(grp, actor)"
    )
    oracle = sorted(
        tuple(r)
        for r in con.execute(
            sql_co_occurrence_pairs("t", "grp", "actor", max_group_degree=2)
        ).fetchall()
    )
    assert oracle == got
