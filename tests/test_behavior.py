"""Behavioral analytics operators (funnel, retention, SCD2) plus the
interval-overlap join and stratified sampler — hand-computable fixtures
with the boundary cases that matter (out-of-order funnel events,
multi-bucket overlap dedup, inclusive endpoints, per-stratum bounds)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def d(day: int, hour: int = 0):
    return datetime(2024, 1, day, hour)


def test_funnel_requires_strict_order(spark):
    """User 1 completes signup->view->purchase in order; user 2 viewed
    BEFORE signing up (view must not count) and never purchased; user 3
    only signed up. Conversion rates are vs step 1."""
    from asctb_ct_label_mapper_spark.operators.behavior import funnel_steps

    rows = [
        (1, d(1), 1, "signup"), (2, d(2), 1, "view"), (3, d(3), 1, "purchase"),
        (4, d(2), 2, "signup"), (5, d(1), 2, "view"),
        (6, d(1), 3, "signup"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["step"]: r for r in
           funnel_steps(df, ["signup", "view", "purchase"]).collect()}
    assert got[1]["users"] == 3 and got[1]["conv_rate"] == 1.0
    assert got[2]["users"] == 1 and abs(got[2]["conv_rate"] - 1 / 3) < 1e-6
    assert got[3]["users"] == 1
    assert got[2]["step_name"] == "view"


def test_funnel_strictly_after_not_equal(spark):
    """An event at EXACTLY the previous step's time does not advance the
    funnel (strictly-after semantics)."""
    from asctb_ct_label_mapper_spark.operators.behavior import funnel_steps

    rows = [(1, d(1), 1, "signup"), (2, d(1), 1, "view")]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["step"]: r["users"] for r in
           funnel_steps(df, ["signup", "view"]).collect()}
    assert got == {1: 1, 2: 0}


def test_retention_cohorts_day(spark):
    """u1 first active day 1, also active day 3 (offset 2); u2 first
    active day 3 only. Offset-0 rows count cohort sizes; duplicate
    activity in one period counts once."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        retention_cohorts,
    )

    rows = [
        (1, d(1, 1), 1, "x"), (2, d(1, 5), 1, "x"), (3, d(3), 1, "x"),
        (4, d(3), 2, "x"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {(str(r["cohort"]), r["offset_periods"]): r["n_users"]
           for r in retention_cohorts(df, granularity="day").collect()}
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-03", 0): 1,
    }


def test_scd2_history_runs_and_current_flag(spark):
    """Consecutive equal values collapse to one version; the last run is
    open-ended (valid_to NULL, is_current); versions are 1-based in
    (ts, id) order."""
    from asctb_ct_label_mapper_spark.operators.behavior import scd2_history

    rows = [
        (1, d(1), 1, "a"), (2, d(2), 1, "a"), (3, d(3), 1, "b"),
        (4, d(4), 1, "a"),
        (5, d(2), 2, "z"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {(r["key"], r["version"]): r for r in scd2_history(df).collect()}
    assert len(got) == 4
    r11 = got[(1, 1)]
    assert r11["attr"] == "a" and str(r11["valid_from"])[:10] == "2024-01-01"
    assert str(r11["valid_to"])[:10] == "2024-01-03" and not r11["is_current"]
    r13 = got[(1, 3)]
    assert r13["attr"] == "a" and r13["is_current"] and r13["valid_to"] is None
    assert got[(2, 1)]["is_current"]


def test_interval_overlap_join_dedups_and_includes_touching(spark):
    """A pair overlapping across MANY buckets appears once (canonical
    first-shared-bucket keep); intervals touching exactly at an endpoint
    match (inclusive); disjoint intervals and different keys don't."""
    from asctb_ct_label_mapper_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [
            (1, 10, d(1, 0), d(1, 9)),   # long: spans many 10-min buckets
            (1, 11, d(2, 0), d(2, 1)),
            (2, 12, d(1, 0), d(1, 1)),   # other key
        ],
        "user_id long, lid long, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 20, d(1, 5), d(1, 12)),  # overlaps lid=10 over 4 hours
            (1, 21, d(1, 9), d(1, 10)),  # touches lid=10 at 09:00 exactly
            (1, 22, d(3, 0), d(3, 1)),   # disjoint
        ],
        "user_id long, rid long, r_start timestamp, r_end timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, ["user_id"],
            "l_start", "l_end", "r_start", "r_end", bucket="10 minutes",
        ).collect()
    )
    assert got == [(10, 20), (10, 21)]


def test_stratified_topk_sample_bounds_and_partition_invariance(spark):
    from asctb_ct_label_mapper_spark.operators.curation import (
        stratified_topk_sample,
    )

    rows = [(i, d(1 + i % 28), i % 7, ["a", "b", "c"][i % 3])
            for i in range(300)]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = stratified_topk_sample(df, "event_type", 5, "event_id").collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r["stratum"], []).append((r["rk"], r["id"]))
    assert set(by_stratum) == {"a", "b", "c"}
    for s, picked in by_stratum.items():
        assert len(picked) == 5
        assert sorted(rk for rk, _ in picked) == [1, 2, 3, 4, 5]
    again = stratified_topk_sample(
        df.repartition(13), "event_type", 5, "event_id"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_event_path_ngrams_per_key_and_truncation(spark):
    """Paths never cross keys; tails shorter than n emit nothing; the
    n=2 flavor is the Markov transition count."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        event_path_ngrams,
    )

    rows = [
        (1, d(1), 1, "a"), (2, d(2), 1, "b"), (3, d(3), 1, "c"),
        (4, d(4), 1, "b"),
        (5, d(1), 2, "c"),  # singleton key: no trigrams, no bigrams
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    tri = {r["path"]: r["n_paths"] for r in event_path_ngrams(df, n=3).collect()}
    assert tri == {"a>b>c": 1, "b>c>b": 1}
    bi = {r["path"]: r["n_paths"] for r in event_path_ngrams(df, n=2).collect()}
    assert bi == {"a>b": 1, "b>c": 1, "c>b": 1}


def test_event_path_ngrams_null_type_breaks_window(spark):
    """r10 arity contract: a NULL event_type mid-window voids every
    n-gram that covers it — ('a', NULL, 'c') must NOT collide with a
    genuine 2-step 'a>c' path (concat_ws would silently skip the NULL).
    The NULL event still occupies its sequence position."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        event_path_ngrams,
    )

    rows = [
        (1, d(1), 1, "a"), (2, d(2), 1, None), (3, d(3), 1, "c"),
        (4, d(4), 1, "e"),
        (5, d(1), 2, "a"), (6, d(2), 2, "c"),  # the REAL a>c
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    tri = {r["path"]: r["n_paths"]
           for r in event_path_ngrams(df, n=3).collect()}
    assert tri == {}  # every key-1 trigram covers the NULL or a tail
    bi = {r["path"]: r["n_paths"]
          for r in event_path_ngrams(df, n=2).collect()}
    assert bi == {"c>e": 1, "a>c": 1}  # a>c counted ONCE (key 2 only)


def test_funnel_within_window(spark):
    """The conversion-window flavor: a step outside `within` of the
    previous reach time does not count (boundary is inclusive)."""
    from asctb_ct_label_mapper_spark.operators.behavior import funnel_steps

    rows = [
        (1, d(1), 1, "signup"), (2, d(8), 1, "view"),    # exactly 7d: in
        (3, d(1), 2, "signup"), (4, d(9), 2, "view"),    # 8d: out
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["step"]: r["users"] for r in
           funnel_steps(df, ["signup", "view"], within="7 days").collect()}
    assert got == {1: 2, 2: 1}


def test_funnel_fold_equals_joins(spark):
    """r10 one-pass fold == r9 join chain, row-for-row, on a fixture
    exercising every edge: out-of-order steps, exact-tie timestamps,
    repeated step types (view->view needs two DISTINCT view events),
    NULL-ts step-1-only users (count step 1, never later), within
    windows, and users with only later-step events (count nowhere)."""
    from asctb_ct_label_mapper_spark.operators.behavior import funnel_steps

    rows = [
        # u1: full ordered chain
        (1, d(1), 1, "signup"), (2, d(2), 1, "view"), (3, d(3), 1, "view"),
        (4, d(4), 1, "purchase"),
        # u2: view before signup, single view after -> can't do view,view
        (5, d(2), 2, "view"), (6, d(3), 2, "signup"), (7, d(4), 2, "view"),
        # u3: signup only, at the same ts as a view (tie: strictly-after)
        (8, d(5), 3, "signup"), (9, d(5), 3, "view"),
        # u4: NULL-ts signup only -> step-1 user, never later
        (10, None, 4, "signup"),
        # u5: purchases only -> counted nowhere
        (11, d(1), 5, "purchase"), (12, d(2), 5, "purchase"),
        # u6: chain that only fits without `within` (8-day gap)
        (13, d(1), 6, "signup"), (14, d(2), 6, "view"),
        (15, d(10), 6, "view"), (16, d(11), 6, "purchase"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    for steps in (
        ["signup", "view", "purchase"],
        ["signup", "view", "view", "purchase"],
        ["signup"],
    ):
        for within in (None, "7 days"):
            fold = sorted(
                map(tuple, funnel_steps(df, steps, within=within).collect())
            )
            joins = sorted(
                map(
                    tuple,
                    funnel_steps(
                        df, steps, within=within, impl="joins"
                    ).collect(),
                )
            )
            assert fold == joins, (steps, within, fold, joins)
    # EMPTY-INPUT parity (review finding): no funnel-step events at all
    # must give users=0 on both impls, not NULL sums from an empty agg
    none_df = spark.createDataFrame(
        [(1, d(1), 1, "unrelated")], EV_SCHEMA
    )
    fold0 = sorted(map(tuple, funnel_steps(
        none_df, ["signup", "view"]).collect()))
    joins0 = sorted(map(tuple, funnel_steps(
        none_df, ["signup", "view"], impl="joins").collect()))
    assert fold0 == joins0
    assert all(r[2] == 0 for r in fold0), fold0

    # spot-check the repeated-type chain: u1 has view@d2+view@d3 (ok),
    # u2's only post-signup view is single (not ok)
    got = {
        r["step"]: r["users"]
        for r in funnel_steps(
            df, ["signup", "view", "view", "purchase"]
        ).collect()
    }
    assert got == {1: 5, 2: 3, 3: 2, 4: 2}


def test_markov_transitions_row_stochastic(spark):
    """a->b twice and a->c once from one user: p(a->b)=2/3; paths never
    cross keys; each from-row's probabilities sum to 1."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        markov_transitions,
    )

    rows = [
        (1, d(1), 1, "a"), (2, d(2), 1, "b"), (3, d(3), 1, "a"),
        (4, d(4), 1, "b"), (5, d(5), 1, "a"), (6, d(6), 1, "c"),
        (7, d(1), 2, "c"),  # singleton: no transition
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {(r["from_type"], r["to_type"]): r
           for r in markov_transitions(df).collect()}
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "b")]["p"] == round(2 / 3, 6)
    assert out[("a", "c")]["p"] == round(1 / 3, 6)
    assert out[("b", "a")]["p"] == 1.0
    assert ("c", "a") not in out  # user-2 singleton emits nothing


def test_rfm_segments_deterministic_tiles(spark):
    """4 purchasing users with strictly ordered metrics land in 4
    distinct tiles per dimension; non-purchasers are absent."""
    from asctb_ct_label_mapper_spark.operators.behavior import rfm_segments

    rows = []
    eid = 0
    # user u purchases u times, value 10*u each, last purchase day u
    for u in range(1, 5):
        for i in range(u):
            eid += 1
            rows.append((eid, d(u), u, "purchase", 10.0 * u))
    rows.append((99, d(9), 9, "view", 5.0))  # never purchases
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = rfm_segments(df).collect()
    assert sum(r["n_users"] for r in out) == 4
    segs = {(r["r"], r["f"], r["m"]) for r in out}
    # user 4: most recent (r=1), most frequent (f=1), biggest spend (m=1)
    assert (1, 1, 1) in segs
    # user 1: oldest, least frequent, least spend -> (4, 4, 4)
    assert (4, 4, 4) in segs


def test_rfm_null_ts_purchaser_tiles_worst_recency(spark):
    """r10 advice pinned: a purchaser whose every purchase has NULL ts
    has NULL _recency; the window order is asc_nulls_last (matching the
    oracle's NULLS LAST), so they tile WORST recency on both engines —
    and their freq/spend tiles are unaffected."""
    from asctb_ct_label_mapper_spark.operators.behavior import rfm_segments

    rows = []
    eid = 0
    for u in range(1, 4):  # three dated purchasers, recency order 3<2<1
        eid += 1
        rows.append((eid, d(u), u, "purchase", 10.0 * u))
    # user 9: undated, but most frequent and biggest spend
    for i in range(5):
        eid += 1
        rows.append((eid, None, 9, "purchase", 100.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    segs = {
        (r["r"], r["f"], r["m"])
        for r in rfm_segments(df, n_tiles=4).collect()
    }
    # NULL recency -> last r tile; best freq/spend -> first f/m tiles
    assert (4, 1, 1) in segs


def test_activity_gaps_span_and_coverage(spark):
    """Active days 1, 2, 5 -> span 5, active 3, missing 2, coverage
    0.6; duplicate events per day count once."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        activity_gaps_by_key,
    )

    rows = [
        (1, d(1), 1, "a"), (2, d(1, 5), 1, "b"), (3, d(2), 1, "a"),
        (4, d(5), 1, "a"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    [r] = activity_gaps_by_key(df).collect()
    assert r["span_days"] == 5 and r["active_days"] == 3
    assert r["missing_days"] == 2 and r["coverage"] == 0.6
    assert r["first_day"] == "2024-01-01" and r["last_day"] == "2024-01-05"


def test_null_ts_guards_across_sequence_ops(spark):
    """r10 second review pass: ts is the window ORDER key in four
    sequence operators, and Spark places NULLs FIRST where DuckDB
    places them LAST — each op must neutralize NULL-ts rows the same
    way on both engines. Markov/n-grams/TWA exclude them; debounce
    orders them LAST so the interval predicate drops them."""
    from asctb_ct_label_mapper_spark.operators.behavior import (
        event_path_ngrams,
    )
    from asctb_ct_label_mapper_spark.operators.dedup import dedup_debounce
    from asctb_ct_label_mapper_spark.operators.funnel import (
        markov_transitions,
    )
    from asctb_ct_label_mapper_spark.operators.timeseries import (
        time_weighted_avg,
    )

    rows = [
        (1, d(1), 1, "a"), (2, d(2), 1, "b"), (3, d(3), 1, "c"),
        (4, None, 1, "x"),  # NULL ts: must not join or break the a>b>c chain
        (5, d(1), 2, "a"), (6, None, 2, "b"),  # key 2: one timed, one not
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)

    # markov: pairs come only from the timed sequence a->b->c
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for r in markov_transitions(df).collect()}
    assert got == {("a", "b"): 1, ("b", "c"): 1}

    # n-grams: the NULL-ts row neither extends nor splits the path
    bi = {r["path"]: r["n_paths"]
          for r in event_path_ngrams(df, n=2).collect()}
    assert bi == {"a>b": 1, "b>c": 1}

    # TWA: NULL-ts observations are excluded from n_obs and the chain
    vdf = df.withColumn("value", F.col("event_id").cast("double"))
    twa = {r["key"]: r["n_obs"]
           for r in time_weighted_avg(vdf).collect()}
    assert twa == {1: 3, 2: 1}

    # debounce (2h delay): key 1 keeps d(1) and d(3) (d(2) within 2h?
    # no - days apart, all kept), NULL-ts rows are dropped whenever the
    # key has timed rows (NULLS LAST -> real lag -> NULL predicate)
    kept = dedup_debounce(df, delay="2 hours").collect()
    kept_ids = sorted(r["event_id"] for r in kept)
    assert kept_ids == [1, 2, 3, 5]

    # all-NULL-ts key: nothing to debounce against, rows pass through
    only_null = spark.createDataFrame([(7, None, 3, "a")], EV_SCHEMA)
    assert [r["event_id"] for r in dedup_debounce(only_null).collect()] == [7]


def test_funnel_one_pass_plan_two_exchanges(spark, sf_dir):
    """The r10 one-pass funnel contract pinned as a plan assertion:
    <= 2 Exchanges (one user-keyed shuffle + the final single-partition
    aggregate) and the type-IN filter pushed to the parquet scan."""
    from asctb_ct_label_mapper_spark.operators.behavior import funnel_steps
    from asctb_ct_label_mapper_spark.plans.audit import formatted_plan

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = formatted_plan(
        funnel_steps(ev, ["signup", "view", "purchase"], within="7 days")
    )
    import re

    n_exchange_ops = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange_ops <= 2, plan
    assert "PushedFilters" in plan and "In(event_type" in plan, plan


def test_order_streaks_longest_island(spark):
    """Months 2024-01..03 + 2024-05 -> longest streak 3; a single-month
    key -> 1; duplicate orders in a month count once."""
    from asctb_ct_label_mapper_spark.operators.behavior import order_streaks

    rows = [
        (1, "2024-01-15"), (1, "2024-02-01"), (1, "2024-02-20"),
        (1, "2024-03-31"), (1, "2024-05-05"),
        (2, "2024-07-07"),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string"
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    out = {r["streak_months"]: r["n_keys"] for r in order_streaks(df).collect()}
    assert out == {3: 1, 1: 1}
