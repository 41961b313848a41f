"""Incremental aggregate maintenance: merge algebra invariants."""

from __future__ import annotations

from datetime import datetime

from asctb_ct_label_mapper_spark.operators.incremental import (
    aggregate_state,
    finalize,
    merge_states,
)

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def rows():
    out = []
    for i in range(60):
        out.append(
            (i, datetime(2024, 1, 1 + i % 10, 8 + i % 12), i % 5,
             "ab"[i % 2], float(i) * 0.37, "{}")
        )
    return out


def test_merge_equals_full_recompute_any_split(spark):
    df = spark.createDataFrame(rows(), EV)
    full = {(r["event_type"], r["day"]): tuple(r)
            for r in finalize(aggregate_state(df)).collect()}
    for cut in (3, 7):
        a = df.filter(f"event_id % {cut} = 0")
        b = df.filter(f"event_id % {cut} != 0")
        merged = {(r["event_type"], r["day"]): tuple(r)
                  for r in finalize(
                      merge_states(aggregate_state(a), aggregate_state(b))
                  ).collect()}
        assert merged == full


def test_merge_is_regroup_idempotent(spark):
    """Compacting partials (merging a merge) changes nothing."""
    df = spark.createDataFrame(rows(), EV)
    parts = [df.filter(f"event_id % 4 = {i}") for i in range(4)]
    states = [aggregate_state(p) for p in parts]
    once = finalize(merge_states(*states)).collect()
    staged = finalize(
        merge_states(merge_states(states[0], states[1]),
                     merge_states(states[2], states[3]))
    ).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, staged))


def test_empty_batch_merge_is_identity(spark):
    df = spark.createDataFrame(rows(), EV)
    empty = spark.createDataFrame([], EV)
    base = finalize(aggregate_state(df)).collect()
    merged = finalize(
        merge_states(aggregate_state(df), aggregate_state(empty))
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, merged))
