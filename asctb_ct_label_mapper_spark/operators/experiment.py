"""Experimentation (A/B testing) analytics: sample-ratio-mismatch
check, Welch's t-test, and CUPED variance reduction.

Not in the reference; the standard online-experiment readout stack.
Scale posture is shared: ONE user-grain aggregate over the event log
(one keyed shuffle), then arm-level statistics as a 2-row conditional
aggregate — nothing downstream of the first shuffle exceeds the arm
count. Assignment here is the deterministic ``user_id % 2`` hash-split
(arm 0 / arm 1), the usual bucketing stand-in; any integer arm
expression slots in.

Float discipline (the repo's standing traps): every scalar division is
``try_divide`` (ANSI sessions raise DIVIDE_BY_ZERO where DuckDB
returns NULL); variances are ``var_samp``/``covar_samp`` on BOTH
engines (NULL at n<2 on both); outputs round 6dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _arm(user_col: str) -> Column:
    return (F.col(user_col) % 2).cast("int")


def srm_check(
    events: DataFrame,
    user_col: str = "user_id",
    alpha_chi2: float = 3.841459,
) -> DataFrame:
    """Sample-ratio mismatch: distinct USERS per arm (assignment
    counts, not event counts) against the expected 50/50 split, as the
    1-dof chi-square statistic. One row: (n0, n1, chi2, srm) with
    srm = chi2 > ``alpha_chi2`` (3.841 ≈ p<0.05) — the gate every
    experiment readout runs first."""
    users = events.select(user_col).distinct().select(
        _arm(user_col).alias("arm")
    )
    counts = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
    )
    exp = (F.col("n0") + F.col("n1")).cast("double") / F.lit(2.0)
    chi2 = F.try_divide(
        (F.col("n0") - exp) * (F.col("n0") - exp)
        + (F.col("n1") - exp) * (F.col("n1") - exp),
        exp,
    )
    return counts.select(
        "n0",
        "n1",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(alpha_chi2)).alias("srm"),
    )


def sql_srm_check(
    table: str = "events",
    user_col: str = "user_id",
    alpha_chi2: float = 3.841459,
) -> str:
    """DuckDB replay of ``srm_check``."""
    return f"""
    WITH u AS (
        SELECT DISTINCT {user_col} FROM {table}
    ), c AS (
        SELECT
            CAST(sum(CASE WHEN {user_col} % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n0,
            CAST(sum(CASE WHEN {user_col} % 2 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1
        FROM u
    )
    SELECT n0, n1,
        round(((n0 - ex) * (n0 - ex) + (n1 - ex) * (n1 - ex)) / ex, 6)
            AS chi2,
        ((n0 - ex) * (n0 - ex) + (n1 - ex) * (n1 - ex)) / ex
            > CAST({alpha_chi2!r} AS DOUBLE) AS srm
    FROM (SELECT n0, n1, CAST(n0 + n1 AS DOUBLE) / 2.0 AS ex FROM c)
    """


def _user_metric(
    events: DataFrame,
    user_col: str,
    value_col: str,
    metric_filter: Column,
) -> DataFrame:
    """Per-user metric frame (user, arm, m): every assigned user (any
    event) appears; the metric is the filtered value sum, 0 when the
    user has no qualifying events — the standard 'all randomized units
    stay in the denominator' rule. ONE user-keyed aggregate."""
    return events.groupBy(F.col(user_col).alias("user")).agg(
        F.coalesce(
            F.sum(F.when(metric_filter, F.col(value_col))), F.lit(0.0)
        ).alias("m")
    ).select("user", _arm("user").alias("arm"), "m")


def ab_welch_ttest(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """Welch's unequal-variance t-test on the per-user metric (sum of
    ``metric_type`` values; non-converting users count as 0). One row:
    (n0, n1, mean0, mean1, t_stat, dof) — t = (m1−m0)/√(v0/n0+v1/n1),
    Welch–Satterthwaite dof. The readout is the statistic, not the
    p-value (no t CDF in either engine — threshold on |t| as usual)."""
    um = _user_metric(
        events, user_col, value_col, F.col(type_col) == metric_type
    )
    per_arm = um.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.avg(F.when(F.col("arm") == 0, F.col("m"))).alias("mean0"),
        F.avg(F.when(F.col("arm") == 1, F.col("m"))).alias("mean1"),
        F.var_samp(F.when(F.col("arm") == 0, F.col("m"))).alias("v0"),
        F.var_samp(F.when(F.col("arm") == 1, F.col("m"))).alias("v1"),
    )
    se0 = F.try_divide(F.col("v0"), F.col("n0").cast("double"))
    se1 = F.try_divide(F.col("v1"), F.col("n1").cast("double"))
    sev = se0 + se1
    t = F.try_divide(F.col("mean1") - F.col("mean0"), F.sqrt(sev))
    dof = F.try_divide(
        sev * sev,
        F.try_divide(se0 * se0, (F.col("n0") - 1).cast("double"))
        + F.try_divide(se1 * se1, (F.col("n1") - 1).cast("double")),
    )
    return per_arm.select(
        "n0",
        "n1",
        F.round("mean0", 6).alias("mean0"),
        F.round("mean1", 6).alias("mean1"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
    )


def sql_ab_welch_ttest(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of ``ab_welch_ttest`` (same per-user metric, same
    Welch arithmetic)."""
    return f"""
    WITH um AS (
        SELECT {user_col} AS u, {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY 1, 2
    ), s AS (
        SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n0,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
            avg(CASE WHEN arm = 0 THEN m END) AS mean0,
            avg(CASE WHEN arm = 1 THEN m END) AS mean1,
            var_samp(CASE WHEN arm = 0 THEN m END) AS v0,
            var_samp(CASE WHEN arm = 1 THEN m END) AS v1
        FROM um
    )
    SELECT n0, n1, round(mean0, 6) AS mean0, round(mean1, 6) AS mean1,
        round((mean1 - mean0) / sqrt(v0 / n0 + v1 / n1), 6) AS t_stat,
        round(
            (v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
            / ((v0 / n0) * (v0 / n0) / (n0 - 1)
               + (v1 / n1) * (v1 / n1) / (n1 - 1)),
            6) AS dof
    FROM s
    """


def cuped_adjustment(
    events: DataFrame,
    split_date: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """CUPED (Deng et al., WSDM 2013): shrink the experiment metric's
    variance with the pre-period covariate. Per user, pre = metric sum
    before ``split_date``, post = metric sum from it on (0 when
    absent); θ = cov(pre, post)/var(pre) pooled over ALL users;
    adjusted = post − θ·(pre − mean(pre)). Two rows, one per arm:
    (arm, n, mean_post, mean_adj, var_post, var_adj) rounded 6dp — the
    variance columns are the before/after of the whole exercise.

    Plan: one user-grain conditional aggregate (the only fact-table
    pass), a 1-row θ aggregate broadcast back, then the 2-row arm
    aggregate."""
    pre_f = (F.col(type_col) == metric_type) & (
        F.col(ts_col) < F.lit(split_date).cast("timestamp")
    )
    post_f = (F.col(type_col) == metric_type) & (
        F.col(ts_col) >= F.lit(split_date).cast("timestamp")
    )
    um = events.groupBy(F.col(user_col).alias("user")).agg(
        F.coalesce(F.sum(F.when(pre_f, F.col(value_col))), F.lit(0.0))
        .alias("pre"),
        F.coalesce(F.sum(F.when(post_f, F.col(value_col))), F.lit(0.0))
        .alias("post"),
    ).select("user", _arm("user").alias("arm"), "pre", "post")
    theta = um.agg(
        F.try_divide(
            F.covar_samp("pre", "post"), F.var_samp("pre")
        ).alias("theta"),
        F.avg("pre").alias("pre_mean"),
    )
    adj = um.crossJoin(F.broadcast(theta)).select(
        "arm",
        "post",
        (
            F.col("post")
            - F.col("theta") * (F.col("pre") - F.col("pre_mean"))
        ).alias("adj"),
    )
    return (
        adj.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("post"), 6).alias("mean_post"),
            F.round(F.avg("adj"), 6).alias("mean_adj"),
            F.round(F.var_samp("post"), 6).alias("var_post"),
            F.round(F.var_samp("adj"), 6).alias("var_adj"),
        )
    )


def sql_cuped_adjustment(
    table: str = "events",
    split_date: str = "2024-01-16",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of ``cuped_adjustment`` (same pooled θ, same
    adjustment)."""
    return f"""
    WITH um AS (
        SELECT {user_col} AS u, {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                AND {ts_col} < TIMESTAMP '{split_date}'
                THEN {value_col} END), 0.0) AS pre,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                AND {ts_col} >= TIMESTAMP '{split_date}'
                THEN {value_col} END), 0.0) AS post
        FROM {table} GROUP BY 1, 2
    ), th AS (
        SELECT covar_samp(pre, post) / var_samp(pre) AS theta,
            avg(pre) AS pre_mean
        FROM um
    )
    SELECT CAST(arm AS INT) AS arm, count(*) AS n,
        round(avg(post), 6) AS mean_post,
        round(avg(post - theta * (pre - pre_mean)), 6) AS mean_adj,
        round(var_samp(post), 6) AS var_post,
        round(var_samp(post - theta * (pre - pre_mean)), 6) AS var_adj
    FROM um, th GROUP BY arm
    """


def mann_whitney_u(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    impl: str = "exact",
    rank_buckets: int = 32,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) on the per-user metric —
    the non-parametric sibling of :func:`ab_welch_ttest` for skewed
    metrics (revenue-per-user famously violates Welch's normality).
    Average ranks for ties; the normal approximation's z uses the
    standard tie correction. One row:
    (n0, n1, u1, z) with u1 = R1 − n1(n1+1)/2 for arm 1 and
    z = (u1 − n0·n1/2) / σ_tie, NULL when σ degenerates (all values
    tied — try_divide).

    Plan: the user-grain aggregate (the only fact pass), then ranking
    over the USER-METRIC frame.

    ``impl='exact'`` ranks with one global window — fine while the
    user-metric frame is aggregate-grain. ``impl='bucketed'`` (r10
    verdict #4 — the `curriculum_rank_docs` precedent shipped into the
    rank statistics) never opens a single-partition window: the frame
    collapses to VALUE grain (t rows per distinct metric), buckets come
    from an approxQuantile sample of the values
    (``curation.rank_buckets_from_sample`` — boundaries only steer
    parallelism, never results), per-bucket cumulative tie counts plus
    a broadcast bucket-offset join reproduce every average rank
    EXACTLY, and the U/z arithmetic is shared verbatim — the two impls
    are hash-equality-tested against each other."""
    from pyspark.sql import Window

    from asctb_ct_label_mapper_spark.operators.stats import avg_rank

    um = _user_metric(
        events, user_col, value_col, F.col(type_col) == metric_type
    )
    if impl == "bucketed":
        from asctb_ct_label_mapper_spark.operators.curation import (
            rank_buckets_from_sample,
        )

        # value-grain collapse: every rank statistic below depends on
        # the metric VALUE only (t = tie size, t1 = arm-1 rows at the
        # value), so the ranked frame shrinks to |distinct metrics|
        val = um.groupBy("m").agg(
            F.count(F.lit(1)).alias("_t"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("_t1"),
        )
        work = val.withColumn(
            "_bk", rank_buckets_from_sample(val, "m", rank_buckets)
        )
        per_bucket = work.groupBy("_bk").agg(F.sum("_t").alias("_n"))
        w_bk = Window.orderBy("_bk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = per_bucket.select(
            F.col("_bk").alias("_bk_o"),
            F.coalesce(F.sum("_n").over(w_bk), F.lit(0)).alias("_off"),
        )
        w_in = Window.partitionBy("_bk").orderBy("m").rowsBetween(
            Window.unboundedPreceding, -1
        )
        # rows strictly below the value, globally = bucket offset +
        # in-bucket weighted cumsum; avg rank = below + (t+1)/2
        ranked = (
            work.withColumn(
                "_below_in",
                F.coalesce(F.sum("_t").over(w_in), F.lit(0)),
            )
            .join(
                F.broadcast(offsets),
                F.col("_bk").eqNullSafe(F.col("_bk_o")),
            )
            .select(
                "_t",
                "_t1",
                (
                    (F.col("_off") + F.col("_below_in")).cast("double")
                    + (F.col("_t").cast("double") + F.lit(1.0))
                    / F.lit(2.0)
                ).alias("avg_rank"),
            )
        )
        agg = ranked.agg(
            F.sum(F.col("_t") - F.col("_t1")).alias("n0"),
            F.sum("_t1").alias("n1"),
            F.sum(F.col("_t1").cast("double") * F.col("avg_rank")).alias(
                "r1"
            ),
            F.sum(
                F.col("_t").cast("double") * F.col("_t") * F.col("_t")
                - F.col("_t")
            ).alias("tie_term"),
        )
    else:
        w_tie = Window.partitionBy("m")
        ranked = um.select(
            "arm",
            "m",
            avg_rank("m").alias("avg_rank"),
            F.count(F.lit(1)).over(w_tie).alias("_t"),
        )
        agg = ranked.agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("arm") == 1, F.col("avg_rank"))).alias(
                "r1"
            ),
            # Σ(t³−t) over distinct tied values: each group of size t
            # contributes t rows, so divide the per-row contribution
            # by t
            F.sum(
                (
                    F.col("_t").cast("double") * F.col("_t") * F.col("_t")
                    - F.col("_t")
                )
                / F.col("_t")
            ).alias("tie_term"),
        )
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    nn = n0 + n1
    u1 = F.col("r1") - n1 * (n1 + F.lit(1.0)) / F.lit(2.0)
    # greatest(·, 0): when EVERY metric ties, (N+1) − Σ(t³−t)/(N(N−1))
    # is exactly 0 analytically but lands fractionally NEGATIVE once
    # N³ > 2^53 (verified −1e-6 at N=1e6) — Spark sqrt(neg) is NaN and
    # DuckDB sqrt(neg) RAISES, so both engines clamp; a zero σ then
    # degrades to NULL z through the division guard on both.
    bracket = F.greatest(
        (nn + F.lit(1.0))
        - F.try_divide(F.col("tie_term"), nn * (nn - F.lit(1.0))),
        F.lit(0.0),
    )
    sigma = F.sqrt(n0 * n1 / F.lit(12.0) * bracket)
    # try_divide alone guards sigma = 0 (zero divisor -> NULL); the
    # DuckDB mirror needs its explicit nullif because plain '/' is used
    z = F.try_divide(u1 - n0 * n1 / F.lit(2.0), sigma)
    return agg.select(
        "n0",
        "n1",
        F.round(u1, 6).alias("u1"),
        F.round(z, 6).alias("z"),
    )


def sql_mann_whitney_u(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of ``mann_whitney_u`` (same average ranks via
    :func:`stats.sql_avg_rank`, same clamped tie-corrected normal
    approximation)."""
    from asctb_ct_label_mapper_spark.operators.stats import sql_avg_rank

    return f"""
    WITH um AS (
        SELECT {user_col} AS u, {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY 1, 2
    ), ranked AS (
        SELECT arm, m,
            {sql_avg_rank('m')} AS avg_rank,
            count(*) OVER (PARTITION BY m) AS t
        FROM um
    ), s AS (
        SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n0,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
            sum(CASE WHEN arm = 1 THEN avg_rank END) AS r1,
            sum((CAST(t AS DOUBLE) * t * t - t) / t) AS tie_term
        FROM ranked
    )
    SELECT n0, n1,
        round(r1 - n1 * (n1 + 1.0) / 2.0, 6) AS u1,
        round(
            (r1 - n1 * (n1 + 1.0) / 2.0 - CAST(n0 AS DOUBLE) * n1 / 2.0)
            / nullif(sqrt(CAST(n0 AS DOUBLE) * n1 / 12.0
                   * greatest((n0 + n1 + 1.0)
                      - tie_term / (CAST(n0 + n1 AS DOUBLE)
                                    * (n0 + n1 - 1.0)), 0.0)), 0.0),
            6) AS z
    FROM s
    """
