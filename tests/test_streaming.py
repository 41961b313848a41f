"""Structured Streaming slice: the same builders run as availableNow
streams over the events fixture and agree with their batch flavor."""

from __future__ import annotations

import pytest

from asctb_ct_label_mapper_spark.schemas import load_table
from asctb_ct_label_mapper_spark.streaming.events import (
    dedup_events,
    sessionize,
    stream_static_topk,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, events_batch, tmp_path_factory):
    # stream from a micros-normalized copy (the raw fixture's NANOS
    # timestamps are not stream-readable either); schema matches batch.
    path = str(tmp_path_factory.mktemp("events_stream"))
    events_batch.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(events_batch.schema).parquet(path)


def _run_stream(spark, sdf, name: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "dedup" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_stream_matches_batch(spark, events_batch, events_stream):
    batch = tumbling_counts(events_batch, "1 hour", streaming=False)
    stream = _run_stream(
        spark, tumbling_counts(events_stream, "1 hour", streaming=True), "tumbling"
    )
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in stream.collect())
    assert b == s


def test_dedup_events_stream(spark, events_batch, events_stream):
    n_batch = dedup_events(events_batch).count()
    out = _run_stream(spark, dedup_events(events_stream, streaming=True), "dedup")
    assert out.count() == n_batch  # fixture has unique event_ids


def test_batch_dedup_drops_planted_dupe(spark, events_batch):
    doubled = events_batch.unionByName(events_batch.limit(10))
    assert dedup_events(doubled).count() == events_batch.count()


def test_sessionize_stream_matches_batch(spark, events_batch, events_stream):
    batch = sessionize(events_batch, "30 minutes", streaming=False)
    stream = _run_stream(
        spark, sessionize(events_stream, "30 minutes", streaming=True), "sessions"
    )
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in stream.collect())
    assert b == s


def test_stateful_user_totals_matches_batch(spark, events_batch, events_stream):
    from asctb_ct_label_mapper_spark.streaming.events import stateful_user_totals

    batch = {r["user_id"]: r for r in stateful_user_totals(events_batch).collect()}
    q = (
        stateful_user_totals(events_stream, streaming=True)
        .writeStream.format("memory")
        .queryName("usertotals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode may emit a row per micro-batch per user; the LAST row per
    # user carries the final state
    stream_rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM usertotals"
    ).collect()
    final = {}
    for r in stream_rows:  # memory sink appends in batch order
        final[r["user_id"]] = r
    assert set(final) == set(batch)
    for uid, row in batch.items():
        assert final[uid]["n_events"] == row["n_events"]
        assert abs(final[uid]["total_value"] - row["total_value"]) < 1e-6


def test_stream_static_topk(spark, sf_dir):
    from asctb_ct_label_mapper_spark.functions.nlp import clean_text_expr
    from asctb_ct_label_mapper_spark.functions.vector import stub_encode_udf
    from pyspark.sql import functions as F

    part = spark.read.parquet(f"{sf_dir}/part.parquet").limit(50)
    reference = (
        part.select(
            F.col("p_partkey").cast("string").alias("CT_ID"),
            F.col("p_name").alias("CT_NAME"),
        )
        .withColumn("ct_name_cleaned", clean_text_expr(F.col("CT_NAME")))
        .withColumn("embedding", stub_encode_udf(F.col("CT_NAME")))
    )
    labels = spark.createDataFrame(
        [("s", "green widget"), ("s", "blue gear")], "source string, raw_input_label string"
    )
    # batch flavor of the stream-static plan: same builder, finite input
    best = stream_static_topk(labels, reference, k=1)
    rows = best.collect()
    assert len(rows) == 2
    assert all(r["best_ref_id"] is not None and r["best_score"] is not None for r in rows)
