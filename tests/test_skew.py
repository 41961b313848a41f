"""Salted-join / two-phase distinct equivalence with the plain operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.skew import (
    salted_join,
    two_phase_distinct_count,
)


def _skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [(1, f"v{i}") for i in range(90)] + [(k, f"v{k}") for k in range(2, 12)]
    big = spark.createDataFrame(rows, "k int, payload string")
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 12)], "k int, name string")
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed(spark)
    plain = sorted(tuple(r) for r in big.join(small, "k").select("k", "payload", "name").collect())
    salted = sorted(
        tuple(r)
        for r in salted_join(big, small, "k", n_salts=4).select("k", "payload", "name").collect()
    )
    assert salted == plain


def test_salted_join_left_keeps_unmatched(spark):
    big, small = _skewed(spark)
    big = big.union(spark.createDataFrame([(99, "orphan")], "k int, payload string"))
    out = salted_join(big, small, "k", n_salts=4, how="left")
    orphan = [r for r in out.collect() if r["k"] == 99]
    assert len(orphan) == 1 and orphan[0]["name"] is None


def test_two_phase_distinct_count(spark):
    big, _ = _skewed(spark)
    got = {
        r["k"]: r["n_distinct_payload"]
        for r in two_phase_distinct_count(big, ["k"], "payload").collect()
    }
    expected = {
        r["k"]: r["n"]
        for r in big.groupBy("k").agg(F.countDistinct("payload").alias("n")).collect()
    }
    assert got == expected


def test_key_skew_report_shares_and_ranks(spark):
    from asctb_ct_label_mapper_spark.operators.skew import key_skew_report

    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("c1",)] * 5 + [("c2",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, "k", top_n=3).collect()
    assert [r["key"] for r in out] == ["hot", "warm", "c1"]
    assert out[0]["share"] == 0.7 and out[0]["n_keys"] == 4
    assert out[1]["cum_share"] == 0.9
    # cumulative share is monotone and ends <= 1
    cums = [r["cum_share"] for r in out]
    assert cums == sorted(cums) and cums[-1] <= 1.0
