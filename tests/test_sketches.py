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


def test_hll_rollup_estimates_within_error(spark, sf_dir):
    from asctb_ct_label_mapper_spark.operators.sketches import distinct_users_rollup
    from asctb_ct_label_mapper_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    out = {r.period: r for r in distinct_users_rollup(ev).collect()}
    assert "total" in out
    exact_total = ev.select("user_id").distinct().count()
    assert abs(out["total"].est_users - exact_total) <= max(1, 0.05 * exact_total)
    # weekly estimates each within 5% of the exact weekly distinct count
    weekly_exact = {
        r.period: r.exact
        for r in ev.select(
            F.date_format(F.date_trunc("week", F.to_date("ts")), "yyyy-MM-dd").alias(
                "period"
            ),
            "user_id",
        )
        .groupBy("period")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for period, exact in weekly_exact.items():
        est = out[period].est_users
        assert abs(est - exact) <= max(1, 0.05 * exact), (period, est, exact)
    # n_events conserved: weekly rows partition the stream, total sums it
    n_total = ev.count()
    assert out["total"].n_events == n_total
    assert sum(r.n_events for p, r in out.items() if p != "total") == n_total


def test_hll_sketch_column_roundtrips_through_parquet(spark, sf_dir, tmp_path):
    """The persist-at-ingest claim: the daily sketch table survives a
    parquet round-trip and rollups over the reread table still merge."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        daily_user_sketches,
        rollup_user_sketches,
    )
    from asctb_ct_label_mapper_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = daily_user_sketches(ev)
    path = str(tmp_path / "daily_sketches")
    daily.write.parquet(path)
    reread = spark.read.parquet(path)
    direct = {
        (r.period, r.est_users, r.n_events)
        for r in rollup_user_sketches(daily).collect()
    }
    via_parquet = {
        (r.period, r.est_users, r.n_events)
        for r in rollup_user_sketches(reread).collect()
    }
    assert direct == via_parquet


def test_hll_union_never_double_counts(spark):
    """Two days sharing the same users: union estimate tracks the true
    distinct count, not the sum of dailies (the bug naive rollups have)."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        daily_user_sketches,
        rollup_user_sketches,
    )

    rows = [
        ("2024-01-01 00:00:00", uid) for uid in range(200)
    ] + [("2024-01-02 00:00:00", uid) for uid in range(200)]
    ev = spark.createDataFrame(rows, "ts string, user_id bigint").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )
    out = {r.period: r.est_users for r in
           rollup_user_sketches(daily_user_sketches(ev)).collect()}
    assert abs(out["total"] - 200) <= 10  # not ~400


def test_partial_sketch_compaction_preserves_rollup(spark, sf_dir):
    """merge-on-read contract: rollups over an append-only partial table
    (duplicate day rows) equal rollups over the compacted table."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        daily_user_sketches,
        merge_daily_sketches,
        rollup_user_sketches,
    )
    from asctb_ct_label_mapper_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    partials = daily_user_sketches(half_a).unionByName(
        daily_user_sketches(half_b)
    )
    assert partials.count() > merge_daily_sketches(partials).count()
    on_partials = {
        (r.period, r.est_users, r.n_events)
        for r in rollup_user_sketches(partials).collect()
    }
    on_compacted = {
        (r.period, r.est_users, r.n_events)
        for r in rollup_user_sketches(merge_daily_sketches(partials)).collect()
    }
    whole = {
        (r.period, r.est_users, r.n_events)
        for r in rollup_user_sketches(daily_user_sketches(ev)).collect()
    }
    assert on_partials == on_compacted == whole


def test_streaming_sketch_loop(spark, sf_dir, tmp_path):
    """The ingest loop: events land as JSON micro-batches, the stream
    appends per-day partial sketches, the rollup over the table matches
    the batch answer; a second delivery of the SAME users leaves the
    distinct estimates unchanged (HLL idempotence on identical values)."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        daily_user_sketches,
        rollup_user_sketches,
    )
    from asctb_ct_label_mapper_spark.schemas import load_table
    from asctb_ct_label_mapper_spark.streaming.sketches import start_sketch_stream

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    landing = str(tmp_path / "landing")
    ev.write.json(landing)
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .json(landing)
    )
    sketch_p = str(tmp_path / "sketches")
    q = start_sketch_stream(
        stream, sketch_p, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(300)

    got = {
        r.period: (r.est_users, r.n_events)
        for r in rollup_user_sketches(spark.read.parquet(sketch_p)).collect()
    }
    want = {
        r.period: (r.est_users, r.n_events)
        for r in rollup_user_sketches(daily_user_sketches(ev)).collect()
    }
    assert got == want

    # re-delivery (fresh checkpoint, same rows): estimates stable,
    # n_events double-counts — the documented honest gap
    stream2 = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .json(landing)
    )
    q2 = start_sketch_stream(
        stream2, sketch_p, str(tmp_path / "ckpt2"), available_now=True
    )
    q2.awaitTermination(300)
    redelivered = {
        r.period: (r.est_users, r.n_events)
        for r in rollup_user_sketches(spark.read.parquet(sketch_p)).collect()
    }
    assert {p: v[0] for p, v in redelivered.items()} == {
        p: v[0] for p, v in want.items()
    }
    assert all(redelivered[p][1] == 2 * want[p][1] for p in want)


# --- count-min sketch -------------------------------------------------------


def test_countmin_estimates_are_one_sided(spark):
    from asctb_ct_label_mapper_spark.operators.sketches import (
        countmin_estimate_topk,
    )

    rows = [(t,) for t in ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(200)]]
    df = spark.createDataFrame(rows, "token string")
    got = {r["token"]: r for r in countmin_estimate_topk(df, k=5).collect()}
    assert got["a"]["true_cnt"] == 50 and got["b"]["true_cnt"] == 30
    for r in got.values():
        assert r["overestimate"] >= 0          # CM never underestimates
        assert r["cm_est"] == r["true_cnt"] + r["overestimate"]


def test_countmin_counter_mass_per_row_equals_stream(spark):
    from asctb_ct_label_mapper_spark.operators.sketches import countmin_counters

    df = spark.createDataFrame([(f"t{i % 7}",) for i in range(100)], "token string")
    per_row = {
        r["row_i"]: r["mass"]
        for r in countmin_counters(df, depth=4)
        .groupBy("row_i")
        .agg(F.sum("c").alias("mass"))
        .collect()
    }
    assert per_row == {0: 100, 1: 100, 2: 100, 3: 100}


def test_countmin_narrow_width_forces_collisions(spark):
    from asctb_ct_label_mapper_spark.operators.sketches import (
        countmin_estimate_topk,
    )

    df = spark.createDataFrame(
        [(f"w{i}",) for i in range(64) for _ in range(3)], "token string"
    )
    out = countmin_estimate_topk(df, k=64, depth=2, width=8).collect()
    # 64 items in 8 columns: pigeonhole guarantees overestimates appear
    assert any(r["overestimate"] > 0 for r in out)
    assert all(r["cm_est"] >= r["true_cnt"] for r in out)


def test_streaming_countmin_loop_matches_batch(spark, sf_dir, tmp_path):
    """Micro-batched token stream -> appended counter partials; merged
    counters equal the one-shot batch counters EXACTLY (sum algebra),
    so estimates off the merged table equal batch estimates."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        countmin_counters,
        countmin_estimate,
    )
    from asctb_ct_label_mapper_spark.schemas import load_table
    from asctb_ct_label_mapper_spark.streaming.sketches import (
        merge_countmin_counters,
        start_countmin_stream,
    )

    toks = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("explode(split(text, ' ')) AS token")
    )
    landing = str(tmp_path / "landing")
    toks.write.json(landing)
    stream = spark.readStream.schema("token string").option(
        "maxFilesPerTrigger", "2"
    ).json(landing)
    counter_p = str(tmp_path / "counters")
    q = start_countmin_stream(
        stream, counter_p, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(300)

    merged = {
        (r["row_i"], r["pos"]): r["c"]
        for r in merge_countmin_counters(
            spark.read.parquet(counter_p)
        ).collect()
    }
    batch = {
        (r["row_i"], r["pos"]): r["c"]
        for r in countmin_counters(toks).collect()
    }
    assert merged == batch

    # estimates off the merged streaming table == estimates off batch
    from pyspark.sql import functions as F

    # deterministic tie-break on token (repo convention): without it the
    # two lazy recomputations of cand could pick different rank-5 ties
    cand = (
        toks.groupBy("token")
        .count()
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(5)
        .select("token")
    )
    est_stream = {
        r["token"]: r["cm_est"]
        for r in countmin_estimate(
            merge_countmin_counters(spark.read.parquet(counter_p)), cand
        ).collect()
    }
    est_batch = {
        r["token"]: r["cm_est"]
        for r in countmin_estimate(countmin_counters(toks), cand).collect()
    }
    assert est_stream == est_batch


def test_countmin_unseen_candidate_estimates_zero(spark):
    """A never-ingested candidate must return cm_est=0 (its empty cells
    enter the min as zeros), never vanish or report a colliding subset."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        countmin_counters,
        countmin_estimate,
    )

    counters = countmin_counters(
        spark.createDataFrame([("seen",)] * 9, "token string")
    )
    cand = spark.createDataFrame(
        [("seen",), ("never_ingested_token",)], "token string"
    )
    got = {r["token"]: r["cm_est"]
           for r in countmin_estimate(counters, cand).collect()}
    assert got["never_ingested_token"] == 0
    assert got["seen"] == 9


def test_countmin_estimate_rejects_mismatched_table(spark):
    import pytest

    from asctb_ct_label_mapper_spark.operators.sketches import (
        countmin_counters,
        countmin_estimate,
    )

    wide = countmin_counters(
        spark.createDataFrame([("t",)] * 3, "token string"), width=4096
    )
    cand = spark.createDataFrame([("t",)], "token string")
    with pytest.raises(ValueError, match="different parameters"):
        # width-4096 table read back with the default width=1024
        countmin_estimate(wide, cand).collect()


def test_countmin_estimate_rejects_undersized_table(spark):
    import pytest

    from asctb_ct_label_mapper_spark.operators.sketches import (
        countmin_counters,
        countmin_estimate,
    )

    shallow = countmin_counters(
        spark.createDataFrame([("t",)] * 3, "token string"), depth=2
    )
    cand = spark.createDataFrame([("t",)], "token string")
    # depth-2 table read back with the default depth=4: max row_i fits
    # the bound, but rows 2..3 are missing -> would silently
    # UNDERestimate via the LEFT join's coalesce(0)
    with pytest.raises(ValueError, match="covers only 2 of 4 rows"):
        countmin_estimate(shallow, cand).collect()


def test_kmv_merge_equals_single_pass_sketch(spark):
    """Mergeability is EXACT set algebra: bottom-k of a union == bottom-k
    of the slices' bottom-ks — merged partials answer identically to a
    full rescan."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    df = spark.createDataFrame([(f"u{i % 700}",) for i in range(3000)], "u string")
    a = df.limit(1000)
    b = df.subtract(a.limit(0)).filter(F.length("u") >= 0)  # full set
    k = 32
    whole = [r["h"] for r in kmv_sketch(df, "u", k).collect()]
    parts = kmv_sketch(a, "u", k).unionAll(kmv_sketch(b, "u", k))
    merged = [r["h"] for r in kmv_merge(parts, k).collect()]
    assert sorted(merged) == sorted(whole)


def test_kmv_exact_below_k_and_estimate_above_k(spark):
    from asctb_ct_label_mapper_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    small = spark.createDataFrame([(f"v{i}",) for i in range(20)], "v string")
    [r] = kmv_estimate(kmv_sketch(small, "v", k=64), k=64).collect()
    assert r["n_kept"] == 20 and r["distinct_estimate"] == 20.0

    big = spark.createDataFrame(
        [(f"item-{i % 5000}",) for i in range(8000)], "v string"
    )
    [r] = kmv_estimate(kmv_sketch(big, "v", k=256), k=256).collect()
    assert r["n_kept"] == 256
    # KMV sigma ~ 1/sqrt(k-2) ~ 6.3%; assert a loose 4-sigma envelope
    assert abs(r["distinct_estimate"] - 5000) / 5000 < 0.25


def test_kmv_and_priority_sample_exclude_nulls(spark):
    """NULL items/ids are excluded on both engines (Spark sorts NULL
    hashes FIRST, DuckDB LAST — a kept NULL would waste a slot on one
    engine only and desync the estimate)."""
    from asctb_ct_label_mapper_spark.operators.profile import priority_sample
    from asctb_ct_label_mapper_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), (None,)], "v string"
    )
    sk = kmv_sketch(df, "v", k=8)
    assert sk.count() == 2
    [r] = kmv_estimate(sk, k=8).collect()
    assert r["n_kept"] == 2 and r["distinct_estimate"] == 2.0

    rows = spark.createDataFrame(
        [(1, 5.0), (None, 9.0), (2, None), (3, 7.0)], "id long, v double"
    )
    got = priority_sample(rows, "id", "v", k=8).collect()
    assert len(got) == 2 and all(r["v"] is not None for r in got)


def test_kmv_sketch_by_per_group_state_and_exact_small_groups(spark):
    from asctb_ct_label_mapper_spark.operators.sketches import (
        kmv_estimate_by,
        kmv_sketch_by,
    )

    rows = [("a", f"u{i}") for i in range(10)] + [
        ("b", f"v{i % 3}") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, u string")
    sk = kmv_sketch_by(df, ["g"], "u", k=8)
    per = {r["g"]: r for r in kmv_estimate_by(sk, ["g"], k=8).collect()}
    # group b has only 3 distinct -> exact path
    assert per["b"]["n_kept"] == 3 and per["b"]["distinct_estimate"] == 3.0
    # group a has 10 distinct > k=8 -> estimator path, sane range
    assert per["a"]["n_kept"] == 8
    assert 2 < per["a"]["distinct_estimate"] < 60


def test_kmv_set_ops_exact_when_under_k(spark):
    """Below k everything is exact: union/intersection estimates equal
    the true set sizes and Jaccard is the true ratio."""
    from asctb_ct_label_mapper_spark.operators.sketches import kmv_set_ops

    a = spark.createDataFrame([(f"x{i}",) for i in range(40)], "item string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(20, 70)], "item string")
    [r] = kmv_set_ops(a, b, "item", k=256).collect()
    assert r["n_union_kept"] == 70 and r["shared"] == 20
    assert r["union_est"] == 70.0
    assert abs(r["jaccard_est"] - 20 / 70) < 1e-6
    assert abs(r["intersection_est"] - 20.0) < 1e-6


def test_kmv_set_ops_estimates_within_tolerance(spark):
    """Above k the estimates track the true cardinalities (k=128 over
    3000-element sets with a known 1000-element overlap)."""
    from asctb_ct_label_mapper_spark.operators.sketches import kmv_set_ops

    a = spark.createDataFrame([(f"v{i}",) for i in range(3000)], "item string")
    b = spark.createDataFrame(
        [(f"v{i}",) for i in range(2000, 5000)], "item string"
    )
    [r] = kmv_set_ops(a, b, "item", k=128).collect()
    assert r["n_union_kept"] == 128
    assert abs(r["union_est"] - 5000) / 5000 < 0.25
    assert abs(r["intersection_est"] - 1000) / 1000 < 0.45


def test_cm_join_size_estimate_one_sided(spark):
    """The inner-product estimate never underestimates the true join
    size, and is exact when the sketch has no collisions (tiny key
    space against a wide table)."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        cm_join_size_estimate,
    )

    a = spark.createDataFrame(
        [(f"k{i % 5}",) for i in range(50)], "item string"
    )  # fA = 10 each over 5 keys
    b = spark.createDataFrame(
        [(f"k{i % 10}",) for i in range(30)], "item string"
    )  # fB = 3 each over 10 keys (5 shared)
    [r] = cm_join_size_estimate(a, b, "item", with_exact=True).collect()
    assert r["exact_join_size"] == 5 * 10 * 3
    assert r["join_size_est"] >= r["exact_join_size"]
    assert r["overestimate"] == r["join_size_est"] - r["exact_join_size"]
    # 15 distinct keys in a 4x1024 sketch: collisions are absent, so the
    # estimate is exact
    assert r["join_size_est"] == r["exact_join_size"]


def test_cm_join_size_disjoint_inputs_estimate_zero(spark):
    """Disjoint key sets must estimate 0, not NULL — zero-product sketch
    rows enter the min (r9 review finding)."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        cm_join_size_estimate,
    )

    a = spark.createDataFrame([("only_in_a",)], "item string")
    b = spark.createDataFrame([("only_in_b",)], "item string")
    [r] = cm_join_size_estimate(a, b, "item", with_exact=True).collect()
    assert r["exact_join_size"] == 0
    assert r["join_size_est"] == 0 and r["overestimate"] == 0


def test_kmv_sketch_by_two_phase_equals_single_rank(spark):
    """The r9 sharded two-phase per-group rank returns EXACTLY the
    single-window bottom-k (merge property), per group."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from asctb_ct_label_mapper_spark.operators.sketches import (
        kmv_hash60,
        kmv_sketch_by,
    )

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"item{i}") for i in range(500)], "g string, it string"
    )
    got = sorted(
        (r["g"], r["h"]) for r in kmv_sketch_by(df, ["g"], "it", k=16).collect()
    )
    hashes = (
        df.select("g", kmv_hash60(F.col("it")).alias("h")).distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    ref = sorted(
        (r["g"], r["h"])
        for r in hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 16)
        .drop("_rn")
        .collect()
    )
    assert got == ref and len(got) == 48


def test_kmv_sketch_by_prefilter_equals_unfiltered(spark):
    """The threshold-prefiltered per-group sketch is EXACTLY the
    unfiltered bottom-k; an absurdly small safety raises the loud
    guard instead of silently returning a short sketch."""
    import pytest

    from asctb_ct_label_mapper_spark.operators.sketches import kmv_sketch_by

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"item{i}") for i in range(3000)],
        "g string, it string",
    )
    got = sorted(
        (r["g"], r["h"])
        for r in kmv_sketch_by(df, ["g"], "it", k=16).collect()
    )
    ref = sorted(
        (r["g"], r["h"])
        for r in kmv_sketch_by(df, ["g"], "it", k=16, safety=None).collect()
    )
    assert got == ref and len(got) == 48
    with pytest.raises(ValueError, match="raise safety"):
        kmv_sketch_by(
            df, ["g"], "it", k=16, safety=0.002, prefilter_min_pairs=0
        ).collect()


def test_kmv_sketch_by_adaptive_gate_skips_prefilter(spark):
    """r10 adaptive gate: when every group's estimated cardinality is
    <= safety*k the threshold would be DOMAIN everywhere, so the
    broadcast prefilter join and the eager guard are skipped entirely —
    the returned plan has NO join — and the result still equals the
    explicit safety=None formulation."""
    from asctb_ct_label_mapper_spark.operators.sketches import kmv_sketch_by

    # 3 groups x 40 distinct items each, k=16, safety=8 -> 40 <= 128
    df = spark.createDataFrame(
        [(f"g{i % 3}", f"item{i % 120}") for i in range(600)],
        "g string, it string",
    )
    gated = kmv_sketch_by(df, ["g"], "it", k=16, safety=8.0)
    plan = gated._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan
    got = sorted((r["g"], r["h"]) for r in gated.collect())
    ref = sorted(
        (r["g"], r["h"])
        for r in kmv_sketch_by(df, ["g"], "it", k=16, safety=None).collect()
    )
    assert got == ref and len(got) == 48

    # and the engaged branch still filters (cardinality >> safety*k):
    # single group key -> the r12 LITERAL-MAP threshold (codegen filter,
    # no join at all — measured 2x over the null-safe broadcast join);
    # the guard against regression is the map lookup in the plan
    big = spark.createDataFrame(
        [(f"g{i % 3}", f"item{i}") for i in range(3000)],
        "g string, it string",
    )
    engaged = kmv_sketch_by(
        big, ["g"], "it", k=16, safety=8.0, prefilter_min_pairs=0
    )
    eplan = engaged._jdf.queryExecution().optimizedPlan().toString()
    assert "map(keys:" in eplan and "Join" not in eplan, eplan

    # multi-column groups keep the null-safe broadcast-join path
    big2 = big.withColumn("g2", F.lit("x"))
    engaged2 = kmv_sketch_by(
        big2, ["g", "g2"], "it", k=16, safety=8.0, prefilter_min_pairs=0
    )
    eplan2 = engaged2._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in eplan2, eplan2


def test_kmv_sketch_by_null_group_survives_prefilter(spark):
    """A NULL group key is a real group: the prefilter's null-safe join
    must keep it (plain equality would drop every NULL-group hash and
    either lose the group or trip the guard)."""
    from asctb_ct_label_mapper_spark.operators.sketches import kmv_sketch_by

    rows = [("g1", f"a{i}") for i in range(50)] + [
        (None, f"b{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, it string")
    def canon(rows):
        return sorted(
            ((r["g"], r["h"]) for r in rows),
            key=lambda t: (t[0] is not None, t[0] or "", t[1]),
        )

    got = kmv_sketch_by(
        df, ["g"], "it", k=8, prefilter_min_pairs=0
    ).collect()
    ref = kmv_sketch_by(df, ["g"], "it", k=8, safety=None).collect()
    assert canon(got) == canon(ref)
    assert sum(1 for r in got if r["g"] is None) == 8


def test_heavy_hitters_exact_counts(spark):
    """Stream: 'a' x 50, 'b' x 30, 20 singletons (n = 100). phi = 0.2
    -> exactly {a, b}, with EXACT counts even though per-partition
    Misra-Gries (k = 5) runs decrement rounds along the way."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    data = ["a"] * 50 + ["b"] * 30 + [f"s{i}" for i in range(20)]
    df = spark.createDataFrame([(x,) for x in data], "item string")
    got = {r["item"]: (r["cnt"], r["share"])
           for r in heavy_hitters_exact(df, "item", phi=0.2).collect()}
    assert got == {"a": (50, 0.5), "b": (30, 0.3)}

    # threshold is strict: an item at exactly phi*n stays out
    got2 = {r["item"]
            for r in heavy_hitters_exact(df, "item", phi=0.5).collect()}
    assert got2 == set()  # 'a' = 0.5 exactly, not > 0.5


def test_heavy_hitters_null_items_and_k_clamp(spark):
    """NULL items are not rankable on either engine (the semi-join is
    null-unsafe — both filter them); an under-provisioned k_counters
    is clamped up to ceil(1/phi) so the superset guarantee holds."""
    import duckdb

    from asctb_ct_label_mapper_spark.operators.sketches import (
        heavy_hitters_exact,
        sql_heavy_hitters_exact,
    )

    data = [("a",)] * 3 + [(None,)] * 3 + [("b",)] * 1
    df = spark.createDataFrame(data, "item string")
    # k_counters=1 would lose 'a' without the clamp (phi=0.4 -> k>=3)
    got = {(r["item"], r["cnt"], r["share"])
           for r in heavy_hitters_exact(
               df, "item", phi=0.4, k_counters=1).collect()}
    assert got == {("a", 3, 0.75)}  # share over NON-NULL n=4

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('a'),('a'),('a'),"
        "(NULL),(NULL),(NULL),('b')) v(x)"
    )
    oracle = set(
        tuple(r) for r in con.execute(
            sql_heavy_hitters_exact("t", "x", phi=0.4)).fetchall()
    )
    assert oracle == got


def test_heavy_hitters_float_nan_parity(spark):
    """Float item columns: NaN is excluded on BOTH engines (pandas
    value_counts would silently drop it from candidates while n_total
    counted it — the superset guarantee requires the shared filter)."""
    import duckdb

    from asctb_ct_label_mapper_spark.operators.sketches import (
        heavy_hitters_exact,
        sql_heavy_hitters_exact,
    )

    data = [(1.0,)] * 3 + [(float("nan"),)] * 4 + [(2.0,)]
    df = spark.createDataFrame(data, "item double")
    got = {(r["item"], r["cnt"], r["share"])
           for r in heavy_hitters_exact(df, "item", phi=0.5).collect()}
    assert got == {(1.0, 3, 0.75)}  # n = 4 non-NaN items

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1.0::DOUBLE),(1.0),"
        "(1.0),('nan'::DOUBLE),('nan'::DOUBLE),('nan'::DOUBLE),"
        "('nan'::DOUBLE),(2.0)) v(x)"
    )
    oracle = set(tuple(r) for r in con.execute(
        sql_heavy_hitters_exact("t", "x", phi=0.5, float_items=True)
    ).fetchall())
    assert oracle == got
