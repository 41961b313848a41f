"""Round-13 verdict #2: pin the joinless `_time_to_event_grain` plan.

The r11/r12 shape planned the on-or-after conversion lookup as a
key-equality join (BroadcastHashJoin that built the FACT-side purchase
scan — a LeftOuter join can only build right, so the small |users| side
was not broadcastable).  The r13 rewrite folds it into ONE key-grain
aggregate (conditional min + collect_set of event days + array_min
filter), so the only join left in either survival query is the
1-row corpus-max-date broadcast."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize(
    "qname", ["kaplan_meier_retention", "nelson_aalen_retention"]
)
def test_survival_plan_is_joinless(spark, sf_dir, qname):
    import __spark_entry__ as entry

    from asctb_ct_label_mapper_spark.plans.audit import formatted_plan

    df = entry.queries()[qname](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan  # the old fact-side build
    # the sole join: the 1-row _maxd scalar crossed in (each node shows
    # once in the tree and once as a numbered detail header)
    import re

    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) == 1
    # the fold carries the day-set aggregate (ObjectHashAggregate is
    # the collect_set physical form) with map-side partials
    assert "collect_set" in plan


def test_grain_censors_key_with_only_preceding_conversions(spark):
    """The contract the join condition used to carry: a key whose only
    conversions PRECEDE t0 is CENSORED (held at corpus max date), never
    dropped — the array filter must empty to NULL, not lose the row."""
    from asctb_ct_label_mapper_spark.operators.stats import (
        _time_to_event_grain,
    )

    ev = spark.createDataFrame(
        [
            (1, "purchase", "2024-01-02"),  # precedes signup
            (1, "signup", "2024-01-05"),
            (2, "signup", "2024-01-01"),
            (2, "purchase", "2024-01-03"),  # observed, t=2
            (9, "view", "2024-01-09"),      # corpus max date carrier
        ],
        "user_id long, event_type string, ds string",
    ).select("user_id", "event_type", F.to_timestamp("ds").alias("ts"))
    rows = {
        r["t"]: r
        for r in _time_to_event_grain(
            ev, "ts", "user_id", "event_type", "signup", "purchase"
        ).collect()
    }
    # key 1: censored at 2024-01-09 -> t=4, n_events 0
    # key 2: observed at t=2
    assert set(rows) == {2, 4}
    assert rows[2]["n_events"] == 1 and rows[2]["n_risk"] == 2
    assert rows[4]["n_events"] == 0 and rows[4]["n_risk"] == 1
