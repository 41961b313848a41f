"""Sketch operators — the scale path for exact distinct/percentile queries.

`a4_distinct_counts` and `text_len_quantiles` are exact (oracle-checkable);
at 100 TB both swap to one-pass sketches (HLL++ `approx_count_distinct`,
GK `approx_percentile`). These tests pin the error envelope of that swap so
the substitution is a measured trade, not a hope: Spark documents rsd=5%
default for HLL++ and accuracy=10000 (1/accuracy relative rank error) for
the percentile sketch.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from asctb_ct_label_mapper_spark.schemas import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),  # default rsd 5%
        F.approx_count_distinct("user_id", 0.01).alias("approx_tight"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.15  # 3x rsd
    assert abs(row["approx_tight"] - row["exact"]) / row["exact"] < 0.03
    # per-group flavor (the shape a4_distinct_counts would use at scale)
    per = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
        )
        .collect()
    )
    assert all(abs(r["approx"] - r["exact"]) / r["exact"] < 0.06 for r in per)


def test_approx_percentile_within_rank_error(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    row = docs.agg(
        F.percentile("n_chars", F.lit(0.5)).alias("exact_p50"),
        F.expr("approx_percentile(n_chars, 0.5, 10000)").alias("approx_p50"),
        F.percentile("n_chars", F.lit(0.9)).alias("exact_p90"),
        F.expr("approx_percentile(n_chars, 0.9, 10000)").alias("approx_p90"),
    ).first()
    # GK guarantee is on RANK error (<= n/accuracy rows off), not value
    # error; translate by checking the approx value's true rank.
    for q, approx in ((0.5, row["approx_p50"]), (0.9, row["approx_p90"])):
        rank = docs.filter(F.col("n_chars") <= approx).count()
        assert abs(rank - q * n) <= max(n / 10000, 1) + 1
