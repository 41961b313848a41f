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

from pyspark.sql import Column, DataFrame, Window
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


def user_activity_tier(max_stratum: int = 5):
    """AGG-context expression for the log2 activity tier
    ``least(floor(log2(count(*))), max_stratum)`` — ONE definition for
    every stratified operator (post-stratification, Mantel-Haenszel,
    Cochran-Armitage, info-gain features; r13 second review: the rule
    was inlined four times per engine).  Deterministic and
    engine-exact: log2 of a positive long is integral only at exact
    powers of two, where IEEE log2 is exact."""
    return F.least(
        F.floor(F.log2(F.count(F.lit(1)))).cast("int"),
        F.lit(max_stratum),
    )


def sql_user_activity_tier(max_stratum: int = 5) -> str:
    """DuckDB twin of :func:`user_activity_tier` (same clamp)."""
    return (
        f"least(CAST(floor(log2(count(*))) AS INT), {max_stratum})"
    )


def _arm_stats(um: DataFrame) -> DataFrame:
    """ONE-row per-arm statistics off the zero-filled user-metric frame
    — the shared aggregate behind ab_welch_ttest AND ab_mde (r11
    second review: the 'same as the Welch readout' claim is now
    structural, not duplicated): (n0, n1, mean0, mean1, v0, v1)."""
    return um.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.avg(F.when(F.col("arm") == 0, F.col("m"))).alias("mean0"),
        F.avg(F.when(F.col("arm") == 1, F.col("m"))).alias("mean1"),
        F.var_samp(F.when(F.col("arm") == 0, F.col("m"))).alias("v0"),
        F.var_samp(F.when(F.col("arm") == 1, F.col("m"))).alias("v1"),
    )


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
    per_arm = _arm_stats(um)
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

    if impl not in ("exact", "bucketed"):
        raise ValueError(f"unknown impl {impl!r}")
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
        from asctb_ct_label_mapper_spark.plans.cache import (
            pooled_persist,
        )

        # three consumers of the um->val subtree: the eager
        # approxQuantile sample, the broadcast offsets build (its own
        # job), and the ranked pass — persist or pay three fact passes
        val = pooled_persist(
            um.groupBy("m").agg(
                F.count(F.lit(1)).alias("_t"),
                F.sum(
                    F.when(F.col("arm") == 1, 1).otherwise(0)
                ).alias("_t1"),
            )
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


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov
# ---------------------------------------------------------------------------

def ks_test(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov on the per-user metric by arm —
    the distribution-level companion of Welch (means) and Mann-Whitney
    (ranks): D = sup_v |F0(v) − F1(v)| over the two arms' empirical
    CDFs, plus the scaled statistic z = D·√(n0·n1/(n0+n1)) the
    Kolmogorov distribution is evaluated at. One row
    (n0, n1, d_stat, ks_z).

    Plan: the user-grain aggregate (the only fact pass), then a
    VALUE-grain collapse (t0/t1 per distinct metric) — the CDF
    difference needs one cumulative window over the value-dimension
    frame (aggregate grain, the `gini` contract; the bucketed
    cumulative rewrite of mann_whitney_u(impl='bucketed') applies
    verbatim if the metric is near-continuous at billion-user
    scale)."""
    from pyspark.sql import Window

    um = _user_metric(
        events, user_col, value_col, F.col(type_col) == metric_type
    )
    val = um.groupBy("m").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c1"),
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    val = pooled_persist(val)  # feeds the cumulative pass AND the totals
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    cum = val.select(
        F.sum("c0").over(w).alias("f0"),
        F.sum("c1").over(w).alias("f1"),
    )
    tot = val.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    stat = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        # try_divide: a one-arm-empty input degrades to NULL like the
        # oracle's /0 (ANSI sessions raise on plain /) — module contract
        F.max(
            F.abs(
                F.try_divide(
                    F.col("f0").cast("double"), F.col("n0").cast("double")
                )
                - F.try_divide(
                    F.col("f1").cast("double"), F.col("n1").cast("double")
                )
            )
        ).alias("_d"),
    )
    return stat.select(
        "n0",
        "n1",
        F.round("_d", 6).alias("d_stat"),
        F.round(
            F.col("_d")
            * F.sqrt(
                F.try_divide(
                    F.col("n0").cast("double") * F.col("n1"),
                    (F.col("n0") + F.col("n1")).cast("double"),
                )
            ),
            6,
        ).alias("ks_z"),
    )


def sql_ks_test(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of ``ks_test`` (same per-user metric, same
    value-grain cumulative CDF difference)."""
    return f"""
    WITH um AS (
        SELECT {user_col} AS u, {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY 1, 2
    ), val AS (
        SELECT m,
            sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
        FROM um GROUP BY m
    ), cum AS (
        SELECT
            sum(c0) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS f0,
            sum(c1) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS f1
        FROM val
    ), tot AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n0,
               CAST(sum(c1) AS BIGINT) AS n1 FROM val
    ), s AS (
        SELECT max(n0) AS n0, max(n1) AS n1,
            max(abs(CAST(f0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                    - CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS d
        FROM cum, tot
    )
    SELECT n0, n1, round(d, 6) AS d_stat,
        round(d * sqrt(CAST(n0 AS DOUBLE) * n1
                       / CAST(n0 + n1 AS DOUBLE)), 6) AS ks_z
    FROM s
    """


# ---------------------------------------------------------------------------
# multiple-testing control: Benjamini-Hochberg over per-metric Welch z
# ---------------------------------------------------------------------------

# Abramowitz & Stegun 26.2.17 normal-CDF polynomial — |err| < 7.5e-8,
# and BOTH engines replay the SAME literals, so parity is exact (there
# is no native erf in Spark SQL)
_PHI_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_PHI_T = 0.2316419
_INV_SQRT_2PI = 0.3989422804014327

# Cap on |V1|*|V0| distinct-value pair grids (hodges_lehmann_shift):
# ~1e8 weighted pairs shuffle comfortably at 32 partitions; past that
# the caller must quantize coarser — raising beats silently launching
# a quadratic census (r13 verdict #3).
VALUE_PAIR_GRID_BUDGET: int = 100_000_000


def _phi_upper_sql(x: str) -> str:
    """SQL text for the upper-tail normal probability P(Z > x), x >= 0
    (A&S 26.2.17) — shared verbatim by the Spark side via F.expr."""
    t = f"(1.0 / (1.0 + {_PHI_T!r} * {x}))"
    poly = (
        f"({_PHI_B[0]!r} * {t} + {_PHI_B[1]!r} * {t} * {t}"
        f" + {_PHI_B[2]!r} * {t} * {t} * {t}"
        f" + {_PHI_B[3]!r} * {t} * {t} * {t} * {t}"
        f" + {_PHI_B[4]!r} * {t} * {t} * {t} * {t} * {t})"
    )
    return f"({_INV_SQRT_2PI!r} * exp(-0.5 * {x} * {x}) * {poly})"


def fdr_bh(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    q: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg FDR control across one Welch z-test PER EVENT
    TYPE (metric: the user's event count of that type; every assigned
    user is in every metric's denominator with 0 when inactive — the
    all-randomized-units rule, WITHOUT materializing the user x type
    grid: zeros enter the moments through the arm totals, so the only
    fact pass is the (user, type) count aggregate).

    Readout per type: z, the two-sided normal p (A&S 26.2.17
    polynomial — identical literals on both engines), BH rank, the
    step-up significance verdict (largest k with p_(k) <= k·q/m gates
    every rank <= k), and the monotone adjusted p
    (p_adj_(i) = min_{j>=i} p_(j)·m/j, capped at 1).

    Scale: everything past the (user, type) aggregate is
    TYPE-dimension-sized — the BH windows order a frame with one row
    per metric."""
    from pyspark.sql import Window

    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    # pooled: the (user, type) aggregate feeds BOTH the per-type
    # moments and the arm-total census below — the ONE fact pass
    per_ut = pooled_persist(
        events.groupBy(
            F.col(user_col).alias("user"), F.col(type_col).alias("typ")
        ).agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per_ut.select(
        "typ", "c", _arm("user").alias("arm")
    ).groupBy("typ").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("c"))).alias("s0"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("c") * F.col("c"))
        ).alias("ss0"),
        F.sum(F.when(F.col("arm") == 1, F.col("c"))).alias("s1"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("c") * F.col("c"))
        ).alias("ss1"),
    )
    # the user universe is exactly per_ut's distinct user column (any
    # user with any event has >= 1 (user, type) row) — no second
    # events scan
    arm_n = per_ut.select("user").distinct().agg(
        F.sum(F.when(_arm("user") == 0, 1).otherwise(0)).alias("N0"),
        F.sum(F.when(_arm("user") == 1, 1).otherwise(0)).alias("N1"),
    )
    j = stats.crossJoin(F.broadcast(arm_n))
    n0 = F.col("N0").cast("double")
    n1 = F.col("N1").cast("double")
    s0 = F.coalesce(F.col("s0"), F.lit(0)).cast("double")
    s1 = F.coalesce(F.col("s1"), F.lit(0)).cast("double")
    ss0 = F.coalesce(F.col("ss0"), F.lit(0)).cast("double")
    ss1 = F.coalesce(F.col("ss1"), F.lit(0)).cast("double")
    # sample variance including the zero rows: (ss - s^2/N) / (N - 1)
    v0 = F.try_divide(ss0 - s0 * s0 / n0, n0 - F.lit(1.0))
    v1 = F.try_divide(ss1 - s1 * s1 / n1, n1 - F.lit(1.0))
    z = F.try_divide(
        s1 / n1 - s0 / n0,
        F.sqrt(F.try_divide(v0, n0) + F.try_divide(v1, n1)),
    )
    scored = j.select(
        "typ",
        F.round(z, 6).alias("z"),
        F.abs(z).alias("_az"),
    ).withColumn(
        "p",
        F.expr("2.0 * " + _phi_upper_sql("_az")),
    )
    # NULL p (degenerate z) must rank LAST on both engines: Spark's
    # default ASC is NULLS FIRST, DuckDB's is NULLS LAST
    w_rank = Window.orderBy(F.col("p").asc_nulls_last(), F.col("typ"))
    m = Window.partitionBy()
    ranked = scored.select(
        "typ",
        "z",
        "p",
        F.row_number().over(w_rank).alias("rank"),
        F.count(F.lit(1)).over(m).alias("_m"),
    )
    thresh = (
        F.col("rank").cast("double")
        * F.lit(float(q))
        / F.col("_m").cast("double")
    )
    w_rev = Window.orderBy(F.desc("rank")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = ranked.select(
        "typ",
        "z",
        "p",
        "rank",
        F.max(F.when(F.col("p") <= thresh, F.col("rank"))).over(m).alias(
            "_kmax"
        ),
        F.min(
            F.col("p") * F.col("_m").cast("double")
            / F.col("rank").cast("double")
        )
        .over(w_rev)
        .alias("_padj"),
    )
    return out.select(
        "typ",
        "z",
        F.round("p", 6).alias("p"),
        "rank",
        F.coalesce(
            F.col("rank") <= F.col("_kmax"), F.lit(False)
        ).alias("significant"),
        F.round(F.least(F.col("_padj"), F.lit(1.0)), 6).alias("p_adj"),
    )


def sql_fdr_bh(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    q: float = 0.05,
) -> str:
    """DuckDB replay of ``fdr_bh`` (same moment arithmetic, same
    polynomial normal CDF, same step-up rule)."""
    return f"""
    WITH per_ut AS (
        SELECT {type_col} AS typ, {user_col} % 2 AS arm,
            count(*) AS c
        FROM {table} GROUP BY {type_col}, {user_col}
    ), stats AS (
        SELECT typ,
            sum(CASE WHEN arm = 0 THEN c END) AS s0,
            sum(CASE WHEN arm = 0 THEN c * c END) AS ss0,
            sum(CASE WHEN arm = 1 THEN c END) AS s1,
            sum(CASE WHEN arm = 1 THEN c * c END) AS ss1
        FROM per_ut GROUP BY typ
    ), arm_n AS (
        SELECT
            CAST(sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS N0,
            CAST(sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS N1
        FROM (SELECT DISTINCT {user_col} AS u FROM {table})
    ), zs AS (
        SELECT typ,
            (coalesce(s1, 0) / CAST(N1 AS DOUBLE)
             - coalesce(s0, 0) / CAST(N0 AS DOUBLE))
            / nullif(sqrt(
                ((coalesce(ss0, 0) - coalesce(s0, 0) * coalesce(s0, 0)
                  / CAST(N0 AS DOUBLE)) / (N0 - 1.0)) / N0
                + ((coalesce(ss1, 0) - coalesce(s1, 0) * coalesce(s1, 0)
                    / CAST(N1 AS DOUBLE)) / (N1 - 1.0)) / N1), 0.0)
                AS z
        FROM stats, arm_n
    ), scored AS (
        SELECT typ, z, 2.0 * {_phi_upper_sql('abs(z)')} AS p FROM zs
    ), ranked AS (
        SELECT typ, z, p,
            row_number() OVER (ORDER BY p, typ) AS rank,
            count(*) OVER () AS m
        FROM scored
    ), marked AS (
        SELECT typ, z, p, rank, m,
            max(CASE WHEN p <= rank * CAST({q!r} AS DOUBLE) / m
                     THEN rank END) OVER () AS kmax,
            min(p * m / rank) OVER (ORDER BY rank DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS padj
        FROM ranked
    )
    SELECT typ, round(z, 6) AS z, round(p, 6) AS p,
        CAST(rank AS INT) AS rank,
        coalesce(rank <= kmax, FALSE) AS significant,
        round(least(padj, 1.0), 6) AS p_adj
    FROM marked
    """


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF cutoffs P(X <= k), k = 0..8 (weights cap at 9;
# P(X > 8) ~ 1.1e-6). Literal constants shared verbatim by both engines.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
)


def bootstrap_ci(
    events: DataFrame,
    n_resamples: int = 200,
    lo: float = 0.025,
    hi: float = 0.975,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """Poisson-bootstrap percentile CI for the mean per-user metric —
    THE distributed bootstrap (resampling n of n rows needs a global
    coordinated draw; giving every (unit, resample) an independent
    Poisson(1) weight needs none — the classic trick for CIs over
    cluster-sized data). Deterministic: the weight for (user, b) is the
    Poisson(1) inverse CDF at u = md5-hash60(user || '#' || b)/2^60 —
    the repo's shared uniform-hash idiom, replayed bit-for-bit by the
    oracle; no rand(), reruns agree.

    Plan: ONE user-grain aggregate (the only fact pass), a bounded
    ``n_resamples``-way in-row explode of that aggregate (the method's
    stated cost — fan-out B on the USER-grain frame, never the raw
    log), one combinable (b)-keyed aggregate to B rows, then order
    statistics on the B-row frame. Returns one row
    (n_resamples, point_mean, ci_lo, ci_hi), 6dp.

    Percentile convention: k-th smallest resample mean with
    k = ceil(q · B) (the inverse-ECDF / type-1 estimator), pinned by
    explicit row_number selection on both engines."""
    from pyspark.sql import Window

    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    # um feeds the B-way explode AND the broadcast point-mean build
    # (its own job) — persist or the fact aggregate runs twice
    um = pooled_persist(
        _user_metric(
            events, user_col, value_col, F.col(type_col) == metric_type
        )
    )
    b = F.explode(
        F.sequence(F.lit(1), F.lit(int(n_resamples)))
    ).alias("b")
    drawn = um.select("user", "m", b)
    # F.concat, NOT concat_ws: a NULL user key must propagate NULL
    # through the hash (concat_ws silently drops NULL parts, hashing
    # just the resample index) so the weight CASE falls through to the
    # cap on BOTH engines — the oracle's || operator is NULL-strict
    # (r11 second review pass)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user").cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(float(1 << 60))
    )
    wexpr = F.lit(len(_POIS1_CDF))
    for i in range(len(_POIS1_CDF) - 1, -1, -1):
        wexpr = F.when(u < F.lit(_POIS1_CDF[i]), F.lit(i)).otherwise(wexpr)
    means = (
        drawn.select("b", "m", wexpr.alias("w"))
        .groupBy("b")
        .agg(
            F.try_divide(
                F.sum(F.col("w").cast("double") * F.col("m")),
                F.sum("w").cast("double"),
            ).alias("mean_b")
        )
    )
    import math

    k_lo = max(1, math.ceil(lo * n_resamples))
    k_hi = max(1, math.ceil(hi * n_resamples))
    w_ord = Window.orderBy(
        F.col("mean_b").asc_nulls_last(), F.col("b")
    )
    ranked = means.select(
        "mean_b", F.row_number().over(w_ord).alias("rn")
    )
    point = um.agg(F.avg("m").alias("point_mean"))
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n_resamples"),
            F.max(F.when(F.col("rn") == k_lo, F.col("mean_b"))).alias(
                "_lo"
            ),
            F.max(F.when(F.col("rn") == k_hi, F.col("mean_b"))).alias(
                "_hi"
            ),
        )
        .crossJoin(F.broadcast(point))
        .select(
            "n_resamples",
            F.round("point_mean", 6).alias("point_mean"),
            F.round("_lo", 6).alias("ci_lo"),
            F.round("_hi", 6).alias("ci_hi"),
        )
    )


def sql_bootstrap_ci(
    table: str = "events",
    n_resamples: int = 200,
    lo: float = 0.025,
    hi: float = 0.975,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of ``bootstrap_ci`` (same md5 uniform, same
    Poisson(1) cutoffs, same type-1 percentile selection)."""
    import math

    k_lo = max(1, math.ceil(lo * n_resamples))
    k_hi = max(1, math.ceil(hi * n_resamples))
    wcase = f"{len(_POIS1_CDF)}"
    for i in range(len(_POIS1_CDF) - 1, -1, -1):
        wcase = f"CASE WHEN u < {_POIS1_CDF[i]!r} THEN {i} ELSE {wcase} END"
    return f"""
    WITH um AS (
        SELECT {user_col} AS u_id,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY 1
    ), drawn AS (
        SELECT u_id, m, b,
            CAST(('0x' || substr(md5(CAST(u_id AS VARCHAR) || '#'
                 || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT)
                / CAST({float(1 << 60)!r} AS DOUBLE) AS u
        FROM um, unnest(generate_series(1, {int(n_resamples)})) AS g(b)
    ), means AS (
        SELECT b,
            sum(({wcase}) * m) / nullif(sum({wcase}), 0) AS mean_b
        FROM drawn GROUP BY b
    ), ranked AS (
        SELECT mean_b,
            row_number() OVER (ORDER BY mean_b NULLS LAST, b) AS rn
        FROM means
    )
    SELECT CAST(count(*) AS BIGINT) AS n_resamples,
        round((SELECT avg(m) FROM um), 6) AS point_mean,
        round(max(CASE WHEN rn = {k_lo} THEN mean_b END), 6) AS ci_lo,
        round(max(CASE WHEN rn = {k_hi} THEN mean_b END), 6) AS ci_hi
    FROM ranked
    """


def agreement_kappa(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Cohen's kappa between two categorical labelers — the
    inter-annotator (or model-vs-declared-metadata) agreement gate a
    labeling pipeline ships through: observed agreement corrected for
    the agreement two independent raters with these marginals would
    reach by chance,

        kappa = (po - pe) / (1 - pe),
        po = sum_i n_ii / N,   pe = sum_i (row_i * col_i) / N^2.

    Rows where either label is NULL are excluded (no judgment was
    made). Returns one row (n, po, pe, kappa) rounded 6dp; kappa is
    NULL when pe = 1 (both raters constant — agreement is undefined,
    not perfect).

    Scale shape: ONE combinable (a, b) contingency fold; the marginals
    re-derive from the cells exactly like categorical_association's
    (pooled, no second scan), and the readout is a one-row aggregate
    over the label-domain-sized cell frame."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    cells = pooled_persist(
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(a_col, b_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    row_m = cells.groupBy(a_col).agg(F.sum("_n").alias("_ra"))
    col_m = cells.groupBy(b_col).agg(F.sum("_n").alias("_cb"))
    # chance agreement: label-domain-sized equi-join of the marginals
    pe_f = (
        row_m.join(
            col_m, F.col(a_col) == F.col(b_col)
        ).agg(F.sum(F.col("_ra").cast("double") * F.col("_cb")).alias("_pe_num"))
    )
    base = cells.agg(
        F.sum("_n").alias("n"),
        F.sum(
            F.when(F.col(a_col) == F.col(b_col), F.col("_n")).otherwise(
                F.lit(0)
            )
        ).alias("_agree"),
    )
    j = base.crossJoin(F.broadcast(pe_f))
    po = F.col("_agree").cast("double") / F.col("n")
    pe = F.coalesce(F.col("_pe_num"), F.lit(0.0)) / (
        F.col("n").cast("double") * F.col("n")
    )
    return j.select(
        F.col("n"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), 6).alias(
            "kappa"
        ),
    )


def sql_agreement_kappa(table: str, a_col: str, b_col: str) -> str:
    """DuckDB replay of ``agreement_kappa`` (same cell fold, same pooled
    marginals, same nullif guard)."""
    return f"""
    WITH cells AS (
        SELECT {a_col} AS a, {b_col} AS b, count(*) AS _n
        FROM {table}
        WHERE {a_col} IS NOT NULL AND {b_col} IS NOT NULL
        GROUP BY 1, 2
    ),
    row_m AS (SELECT a, sum(_n) AS _ra FROM cells GROUP BY a),
    col_m AS (SELECT b, sum(_n) AS _cb FROM cells GROUP BY b),
    pe_f AS (
        SELECT sum(CAST(_ra AS DOUBLE) * _cb) AS _pe_num
        FROM row_m JOIN col_m ON a = b
    ),
    base AS (
        SELECT sum(_n) AS n,
            sum(CASE WHEN a = b THEN _n ELSE 0 END) AS _agree
        FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n,
        round(CAST(_agree AS DOUBLE) / n, 6) AS po,
        round(coalesce(_pe_num, 0.0) / (CAST(n AS DOUBLE) * n), 6) AS pe,
        round((CAST(_agree AS DOUBLE) / n
               - coalesce(_pe_num, 0.0) / (CAST(n AS DOUBLE) * n))
              / nullif(1.0 - coalesce(_pe_num, 0.0)
                       / (CAST(n AS DOUBLE) * n), 0.0), 6) AS kappa
    FROM base CROSS JOIN pe_f
    """


def calibration_report(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Probability-calibration readout — the reliability-diagram table
    plus the two scalar gates (Brier score, expected calibration
    error) a probabilistic scorer ships through: rows where a model
    says 0.8 should be positive ~80% of the time. ``prob_col`` must be
    in [0, 1] (values clamp into the edge bins); ``label_col`` is a
    boolean/0-1 outcome; NULL prob or label rows are excluded.

    Per equi-width bin: (bin, n, mean_prob, frac_pos); every row also
    carries brier = avg((p - y)^2) and ece = sum_b (n_b/N) *
    |frac_pos_b - mean_prob_b| so the output stays one flat table
    (the benford_audit chi2_total convention). All floats rounded 6dp.

    Scale shape: ONE combinable bin fold (sum p, sum y, count per
    bin <= n_bins rows), the scalar gates re-attached by a one-row
    broadcast cross join derived from the SAME cells — the corpus is
    scanned exactly once."""
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("double")
    bin_id = F.least(
        F.greatest(F.floor(p * n_bins).cast("int"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    cells = (
        df.filter(p.isNotNull() & y.isNotNull())
        .select(
            bin_id.alias("bin"),
            p.alias("_p"),
            y.alias("_y"),
            ((p - y) * (p - y)).alias("_sq"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_p").alias("_sp"),
            F.sum("_y").alias("_sy"),
            F.sum("_sq").alias("_ssq"),
        )
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    cells = pooled_persist(cells)
    mean_p = F.col("_sp") / F.col("n")
    frac_pos = F.col("_sy") / F.col("n")
    gates = cells.agg(
        F.sum("n").alias("_N"),
        F.sum("_ssq").alias("_ssq_t"),
        F.sum(F.abs(F.col("_sy") - F.col("_sp"))).alias("_ece_num"),
    )
    out = cells.crossJoin(F.broadcast(gates))
    return out.select(
        "bin",
        "n",
        F.round(mean_p, 6).alias("mean_prob"),
        F.round(frac_pos, 6).alias("frac_pos"),
        F.round(F.col("_ssq_t") / F.col("_N"), 6).alias("brier"),
        F.round(F.col("_ece_num") / F.col("_N"), 6).alias("ece"),
    )


def sql_calibration_report(
    table: str,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``calibration_report`` (same clamped binning,
    same |sum_y - sum_p| ECE numerator, same rounding)."""
    return f"""
    WITH src AS (
        SELECT CAST({prob_col} AS DOUBLE) AS _p,
               CAST({label_col} AS DOUBLE) AS _y
        FROM {table}
        WHERE ({where}) AND {prob_col} IS NOT NULL
              AND {label_col} IS NOT NULL
    ),
    cells AS (
        SELECT least(greatest(CAST(floor(_p * {n_bins}) AS INT), 0),
                     {n_bins - 1}) AS bin,
            count(*) AS n, sum(_p) AS _sp, sum(_y) AS _sy,
            sum((_p - _y) * (_p - _y)) AS _ssq
        FROM src GROUP BY 1
    ),
    gates AS (
        SELECT sum(n) AS _N, sum(_ssq) AS _ssq_t,
            sum(abs(_sy - _sp)) AS _ece_num
        FROM cells
    )
    SELECT bin, CAST(n AS BIGINT) AS n,
        round(_sp / n, 6) AS mean_prob,
        round(_sy / n, 6) AS frac_pos,
        round(_ssq_t / _N, 6) AS brier,
        round(_ece_num / _N, 6) AS ece
    FROM cells CROSS JOIN gates
    """


Z_ALPHA_05_TWO_SIDED = 1.959963984540054  # Phi^-1(0.975)
Z_POWER_80 = 0.8416212335729143  # Phi^-1(0.80)


def ab_mde(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    z_alpha: float = Z_ALPHA_05_TWO_SIDED,
    z_power: float = Z_POWER_80,
) -> DataFrame:
    """Minimum detectable effect at the CURRENT sample — the power
    readout every experiment plan pairs with ab_welch_ttest's verdict:
    with these arm sizes and metric variances, the smallest true lift
    the test would detect at significance z_alpha (default two-sided
    5%) with power z_power (default 80%) is

        mde_abs = (z_alpha + z_power) * sqrt(v0/n0 + v1/n1)

    and mde_rel = mde_abs / mean0 (relative to control; NULL when the
    control mean is 0). The z constants are fixed quantiles of the
    normal — neither engine has an inverse CDF, and the two standard
    operating points cover the convention.

    Same scale shape as the Welch readout it complements: ONE
    user-grain aggregate (zero-filled non-converters — randomized
    units stay in the denominator), then one-row arithmetic. Returns
    (n0, n1, mean0, se_diff, mde_abs, mde_rel) rounded 6dp."""
    um = _user_metric(
        events, user_col, value_col, F.col(type_col) == metric_type
    )
    per_arm = _arm_stats(um)
    se = F.sqrt(
        F.try_divide(F.col("v0"), F.col("n0").cast("double"))
        + F.try_divide(F.col("v1"), F.col("n1").cast("double"))
    )
    mde = F.lit(z_alpha + z_power) * se
    return per_arm.select(
        "n0",
        "n1",
        F.round("mean0", 6).alias("mean0"),
        F.round(se, 6).alias("se_diff"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(
            F.try_divide(mde, F.nullif(F.col("mean0"), F.lit(0.0))), 6
        ).alias("mde_rel"),
    )


def sql_ab_mde(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    z_alpha: float = Z_ALPHA_05_TWO_SIDED,
    z_power: float = Z_POWER_80,
) -> str:
    """DuckDB replay of ``ab_mde`` (same zero-filled user metric, same
    z operating points, same NULL guards)."""
    zsum = z_alpha + z_power
    return f"""
    WITH um AS (
        SELECT {user_col} AS u, {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                         THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY {user_col}
    ),
    pa AS (
        SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            avg(CASE WHEN arm = 0 THEN m END) AS mean0,
            var_samp(CASE WHEN arm = 0 THEN m END) AS v0,
            var_samp(CASE WHEN arm = 1 THEN m END) AS v1
        FROM um
    )
    SELECT n0, n1, round(mean0, 6) AS mean0,
        round(se, 6) AS se_diff,
        round({zsum!r} * se, 6) AS mde_abs,
        round({zsum!r} * se / nullif(mean0, 0.0), 6) AS mde_rel
    FROM (SELECT n0, n1, mean0,
          sqrt(v0 / n0 + v1 / n1) AS se FROM pa)
    """


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Decile lift / cumulative-gains table — the targeting readout
    next to calibration_report (calibration asks "are the
    probabilities honest?"; lift asks "if I act on the top k%, what
    do I capture?"): rank rows by score descending, cut into
    ``n_tiles`` equal tiles, and per tile report size, positives,
    positive rate, cumulative capture share, and lift vs the base
    rate. NULL score or label rows are excluded; ties break on
    ``id_col`` so both engines tile identically.

    Returns (tile, n, n_pos, pos_rate, cum_capture, lift) rounded
    6dp; cum_capture/lift are NULL when there are no positives at all
    (nothing to capture — NULL, not div-by-zero noise).

    Scale note: the ntile window is GLOBAL over the scored frame —
    fine at the aggregate/user grain this readout runs at; the
    billion-row path is the id-bucketed global_rank precedent
    (curation.py global_rank) feeding the same tile arithmetic."""
    p = F.col(score_col)
    y = F.col(label_col).cast("double")
    base = df.filter(p.isNotNull() & y.isNotNull())
    tiled = base.select(
        y.alias("_y"),
        F.ntile(n_tiles)
        .over(Window.orderBy(p.desc(), F.col(id_col)))
        .alias("tile"),
    )
    cells = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    cells = pooled_persist(cells)
    tot = cells.agg(
        F.sum("n").alias("_N"), F.sum("n_pos").alias("_P")
    )
    w = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = cells.select(
        "tile",
        "n",
        "n_pos",
        F.sum("n_pos").over(w).alias("_cum_pos"),
    ).crossJoin(F.broadcast(tot))
    pos_rate = F.col("n_pos").cast("double") / F.col("n")
    overall = F.col("_P").cast("double") / F.col("_N")
    return out.select(
        "tile",
        "n",
        "n_pos",
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(
            F.col("_cum_pos").cast("double")
            / F.nullif(F.col("_P").cast("double"), F.lit(0.0)),
            6,
        ).alias("cum_capture"),
        F.round(
            F.try_divide(pos_rate, F.nullif(overall, F.lit(0.0))), 6
        ).alias("lift"),
    )


def sql_lift_table(
    table: str,
    score_col: str,
    label_col: str,
    id_col: str,
    n_tiles: int = 10,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``lift_table`` (same DESC+id tiling, same
    NULL-when-no-positives convention)."""
    return f"""
    WITH base AS (
        SELECT CAST({label_col} AS DOUBLE) AS _y,
            ntile({n_tiles}) OVER (
                ORDER BY {score_col} DESC, {id_col}
            ) AS tile
        FROM {table}
        WHERE ({where}) AND {score_col} IS NOT NULL
              AND {label_col} IS NOT NULL
    ),
    cells AS (
        SELECT tile, count(*) AS n, CAST(sum(_y) AS BIGINT) AS n_pos
        FROM base GROUP BY tile
    ),
    tot AS (SELECT sum(n) AS _N, sum(n_pos) AS _P FROM cells),
    cum AS (
        SELECT tile, n, n_pos,
            sum(n_pos) OVER (ORDER BY tile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS _cum_pos
        FROM cells
    )
    SELECT c.tile, c.n, c.n_pos,
        round(CAST(c.n_pos AS DOUBLE) / c.n, 6) AS pos_rate,
        round(CAST(c._cum_pos AS DOUBLE)
              / nullif(CAST(t._P AS DOUBLE), 0.0), 6) AS cum_capture,
        round((CAST(c.n_pos AS DOUBLE) / c.n)
              / nullif(CAST(t._P AS DOUBLE) / t._N, 0.0), 6) AS lift
    FROM cum c CROSS JOIN tot t
    """


def segment_uplift_scan(
    df: DataFrame,
    dims: list[str],
    label_col: str,
    min_n: int = 30,
    k: int = 20,
) -> DataFrame:
    """Segment-discovery stump scan — the "where does the metric
    differ?" insight miner run before any targeted experiment: for
    every value of every candidate dimension, compare the segment's
    positive rate to the overall rate and rank segments by the 1-dof
    proportion chi-square. Segments under ``min_n`` rows are dropped
    (noise floor), top ``k`` returned by (chi2 DESC, dim, value).

    Returns (dim, value, n, pos_rate, lift, chi2) rounded 6dp; lift is
    NULL when the overall rate is 0.

    Scale shape: ONE table scan — the candidate dimensions unpivot via
    ``stack`` into a (dim, value, y) long stream (k_dims x rows, the
    same shape profile_table uses), then one combinable (dim, value)
    fold; overall totals re-derive from ONE dimension's marginals
    (pooled — no second scan), attach by 1-row broadcast. The top-k is
    a TakeOrderedAndProject over the segment-dimension-sized frame."""
    if not dims:
        raise ValueError("segment_uplift_scan needs at least one dim")
    y = F.col(label_col).cast("double")
    stack_args = ", ".join(
        f"'{d}', CAST({d} AS STRING)" for d in dims
    )
    longf = df.filter(y.isNotNull()).select(
        F.expr(f"stack({len(dims)}, {stack_args}) AS (dim, value)"),
        y.alias("_y"),
    )
    cells = longf.groupBy("dim", "value").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("_pos"),
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    cells = pooled_persist(cells)
    tot = cells.filter(F.col("dim") == dims[0]).agg(
        F.sum("n").alias("_N"), F.sum("_pos").alias("_P")
    )
    j = cells.filter(F.col("n") >= min_n).crossJoin(F.broadcast(tot))
    rate = F.col("_pos") / F.col("n")
    overall = F.col("_P") / F.col("_N")
    var = overall * (1.0 - overall)
    chi2 = F.try_divide(
        (F.col("_pos") - F.col("n") * overall)
        * (F.col("_pos") - F.col("n") * overall),
        F.col("n") * var,
    )
    return (
        j.select(
            "dim",
            "value",
            "n",
            F.round(rate, 6).alias("pos_rate"),
            F.round(
                F.try_divide(rate, F.nullif(overall, F.lit(0.0))), 6
            ).alias("lift"),
            F.round(chi2, 6).alias("chi2"),
        )
        .orderBy(
            F.desc("chi2"),
            "dim",
            # NULL segment values sort LAST on both engines (Spark ASC
            # defaults NULLS FIRST, DuckDB NULLS LAST — the repo's
            # standing ordering trap; r11 second review)
            F.col("value").asc_nulls_last(),
        )
        .limit(k)
    )


def sql_segment_uplift_scan(
    table: str,
    dims: list[str],
    label_col: str,
    min_n: int = 30,
    k: int = 20,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``segment_uplift_scan`` (union-of-selects
    unpivot, same marginal-derived totals, same tie-break)."""
    branches = " UNION ALL ".join(
        f"SELECT '{d}' AS dim, CAST({d} AS VARCHAR) AS value,"
        f" CAST({label_col} AS DOUBLE) AS _y"
        f" FROM {table} WHERE ({where}) AND {label_col} IS NOT NULL"
        for d in dims
    )
    return f"""
    WITH longf AS ({branches}),
    cells AS (
        SELECT dim, value, count(*) AS n, sum(_y) AS _pos
        FROM longf GROUP BY dim, value
    ),
    tot AS (
        SELECT sum(n) AS _N, sum(_pos) AS _P
        FROM cells WHERE dim = '{dims[0]}'
    )
    SELECT dim, value, CAST(n AS BIGINT) AS n,
        round(_pos / n, 6) AS pos_rate,
        round((_pos / n) / nullif(_P / _N, 0.0), 6) AS lift,
        round((_pos - n * (_P / _N)) * (_pos - n * (_P / _N))
              / nullif(n * (_P / _N) * (1.0 - _P / _N), 0.0), 6) AS chi2
    FROM cells CROSS JOIN tot
    WHERE n >= {min_n}
    ORDER BY chi2 DESC NULLS LAST, dim, value ASC NULLS LAST
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# r11f: two-proportion test + sample-size readout, difference-in-differences
# ---------------------------------------------------------------------------

def two_prop_test(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    z_alpha: float = 1.959964,
    z_beta: float = 0.841621,
) -> DataFrame:
    """Two-proportion z-test on per-user CONVERSION (did the user have
    ≥1 ``metric_type`` event) with Wilson 95% intervals per arm and the
    required-n-per-arm readout at 80% power for the OBSERVED delta —
    the binary-metric sibling of ab_welch_ttest, and the "how much
    longer must this run" answer in the same row.

        z  = (p1−p0) / √(p̄(1−p̄)(1/n0+1/n1))        (pooled)
        Wilson: (p + z²/2n ± z·√(p(1−p)/n + z²/4n²)) / (1 + z²/n)
        n_req = (z_α·√(2p̄(1−p̄)) + z_β·√(p0(1−p0)+p1(1−p1)))² / δ²

    Plan: one user-grain conversion fold (the only fact shuffle), then
    a 2-arm conditional aggregate and one-row arithmetic — the
    _user_metric/_arm_stats shape specialized to a binary metric.
    Returns one row (n0, n1, p0, p1, z_stat, p0_lo, p0_hi, p1_lo,
    p1_hi, n_required), 6dp; degenerate (zero-variance / zero-delta)
    terms degrade to NULL via try_divide."""
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.max((F.col(type_col) == metric_type).cast("int")).alias("conv")
    ).select(_arm("user").alias("arm"), "conv")
    folded = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias(
            "k0"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias(
            "k1"
        ),
    )
    # every division by an arm size goes through try_divide: an empty
    # arm (all user ids one parity) is n=0, which under the session's
    # ANSI mode crashes a plain `/` where the DuckDB oracle degrades to
    # NULL (r11 second review finding — reproduced as DIVIDE_BY_ZERO)
    p0 = F.try_divide(F.col("k0").cast("double"), F.col("n0"))
    p1 = F.try_divide(F.col("k1").cast("double"), F.col("n1"))
    pbar = F.try_divide(
        (F.col("k0") + F.col("k1")).cast("double"),
        F.col("n0") + F.col("n1"),
    )
    inv0 = F.try_divide(F.lit(1.0), F.col("n0"))
    inv1 = F.try_divide(F.lit(1.0), F.col("n1"))
    z = F.try_divide(
        p1 - p0,
        F.sqrt(pbar * (1.0 - pbar) * (inv0 + inv1)),
    )

    def wilson(p, inv, lo: bool):
        za2 = z_alpha * z_alpha
        center = p + F.lit(za2) * inv / 2.0
        half = F.lit(z_alpha) * F.sqrt(
            p * (1.0 - p) * inv + F.lit(za2) * inv * inv / 4.0
        )
        denom = 1.0 + F.lit(za2) * inv
        return F.try_divide(
            (center - half) if lo else (center + half), denom
        )

    delta = p1 - p0
    n_req = F.try_divide(
        F.pow(
            F.lit(z_alpha) * F.sqrt(2.0 * pbar * (1.0 - pbar))
            + F.lit(z_beta)
            * F.sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1)),
            F.lit(2.0),
        ),
        delta * delta,
    )
    return folded.select(
        "n0",
        "n1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(z, 6).alias("z_stat"),
        F.round(wilson(p0, inv0, True), 6).alias("p0_lo"),
        F.round(wilson(p0, inv0, False), 6).alias("p0_hi"),
        F.round(wilson(p1, inv1, True), 6).alias("p1_lo"),
        F.round(wilson(p1, inv1, False), 6).alias("p1_hi"),
        F.ceil(n_req).cast("long").alias("n_required"),
    )


def sql_two_prop_test(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    z_alpha: float = 1.959964,
    z_beta: float = 0.841621,
) -> str:
    """DuckDB replay of :func:`two_prop_test` — same fold, same Wilson
    arithmetic, same ceil."""
    za2 = z_alpha * z_alpha
    return f"""
    WITH per_user AS (
        SELECT CAST({user_col} % 2 AS INT) AS arm,
            max(CASE WHEN {type_col} = '{metric_type}' THEN 1 ELSE 0 END)
                AS conv
        FROM {table} GROUP BY {user_col}
    ), folded AS (
        SELECT
            sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
            sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS k0,
            sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS k1
        FROM per_user
    ), terms AS (
        SELECT n0, n1,
            CAST(k0 AS DOUBLE) / n0 AS p0,
            CAST(k1 AS DOUBLE) / n1 AS p1,
            CAST(k0 + k1 AS DOUBLE) / (n0 + n1) AS pbar
        FROM folded
    )
    SELECT n0, n1, round(p0, 6) AS p0, round(p1, 6) AS p1,
        round((p1 - p0) / NULLIF(sqrt(pbar * (1.0 - pbar)
              * (1.0 / n0 + 1.0 / n1)), 0.0), 6) AS z_stat,
        round((p0 + {za2!r} / (2.0 * n0)
               - {z_alpha!r} * sqrt(p0 * (1.0 - p0) / n0
                                    + {za2!r} / (4.0 * n0 * n0)))
              / (1.0 + {za2!r} / n0), 6) AS p0_lo,
        round((p0 + {za2!r} / (2.0 * n0)
               + {z_alpha!r} * sqrt(p0 * (1.0 - p0) / n0
                                    + {za2!r} / (4.0 * n0 * n0)))
              / (1.0 + {za2!r} / n0), 6) AS p0_hi,
        round((p1 + {za2!r} / (2.0 * n1)
               - {z_alpha!r} * sqrt(p1 * (1.0 - p1) / n1
                                    + {za2!r} / (4.0 * n1 * n1)))
              / (1.0 + {za2!r} / n1), 6) AS p1_lo,
        round((p1 + {za2!r} / (2.0 * n1)
               + {z_alpha!r} * sqrt(p1 * (1.0 - p1) / n1
                                    + {za2!r} / (4.0 * n1 * n1)))
              / (1.0 + {za2!r} / n1), 6) AS p1_hi,
        CAST(ceil(pow({z_alpha!r} * sqrt(2.0 * pbar * (1.0 - pbar))
                      + {z_beta!r} * sqrt(p0 * (1.0 - p0)
                                          + p1 * (1.0 - p1)), 2.0)
                  / NULLIF((p1 - p0) * (p1 - p0), 0.0)) AS BIGINT)
            AS n_required
    FROM terms
    """


def did_estimate(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    ts_col: str = "ts",
) -> DataFrame:
    """Difference-in-differences on the event-level metric: treatment =
    the standing arm hash, period = pre/post the MIDPOINT of the
    observed date range (deterministic on both engines: min + half the
    day span), estimate = (treat_post − treat_pre) − (ctrl_post −
    ctrl_pre) — the parallel-trends causal readout when a feature
    launches mid-window for one arm.

    Plan: one narrow metric projection persisted; a one-row min/max
    date fold broadcast back as the split; then ONE 2×2 conditional
    aggregate. Returns one row (split_date, 4 cell means, 4 cell
    counts, did), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    base = pooled_persist(
        events.filter(
            (F.col(type_col) == metric_type)
            & F.col(value_col).isNotNull()
            & F.col(ts_col).isNotNull()
        ).select(
            _arm(user_col).alias("treat"),
            F.to_date(ts_col).alias("d"),
            F.col(value_col).cast("double").alias("v"),
        )
    )
    split = base.agg(
        F.date_add(
            F.min("d"),
            (F.datediff(F.max("d"), F.min("d")) / 2).cast("int"),
        ).alias("split_d")
    )
    cells = base.crossJoin(F.broadcast(split)).withColumn(
        "post", (F.col("d") > F.col("split_d")).cast("int")
    )

    def cell(t: int, p: int, agg):
        cond = (F.col("treat") == t) & (F.col("post") == p)
        return agg(F.when(cond, F.col("v")))

    folded = cells.agg(
        F.first("split_d").alias("split_date"),
        cell(0, 0, F.avg).alias("m_c_pre"),
        cell(0, 1, F.avg).alias("m_c_post"),
        cell(1, 0, F.avg).alias("m_t_pre"),
        cell(1, 1, F.avg).alias("m_t_post"),
        cell(0, 0, F.count).alias("n_c_pre"),
        cell(0, 1, F.count).alias("n_c_post"),
        cell(1, 0, F.count).alias("n_t_pre"),
        cell(1, 1, F.count).alias("n_t_post"),
    )
    did = (F.col("m_t_post") - F.col("m_t_pre")) - (
        F.col("m_c_post") - F.col("m_c_pre")
    )
    return folded.select(
        "split_date",
        F.round("m_c_pre", 6).alias("m_c_pre"),
        F.round("m_c_post", 6).alias("m_c_post"),
        F.round("m_t_pre", 6).alias("m_t_pre"),
        F.round("m_t_post", 6).alias("m_t_post"),
        "n_c_pre",
        "n_c_post",
        "n_t_pre",
        "n_t_post",
        F.round(did, 6).alias("did"),
    )


def sql_did_estimate(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    ts_col: str = "ts",
) -> str:
    """DuckDB replay of :func:`did_estimate` — same midpoint split
    (integer half-span day offset), same 2×2 conditional fold."""
    return f"""
    WITH base AS (
        SELECT CAST({user_col} % 2 AS INT) AS treat,
            CAST({ts_col} AS DATE) AS d,
            CAST({value_col} AS DOUBLE) AS v
        FROM {table}
        WHERE {type_col} = '{metric_type}'
          AND {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
    ), split AS (
        -- ::DATE: DuckDB's date + INTERVAL promotes to TIMESTAMP while
        -- Spark's date_add stays DATE (hash parity)
        SELECT (min(d) + to_days(CAST(floor(
                   date_diff('day', min(d), max(d)) / 2.0) AS INT)))::DATE
               AS split_d
        FROM base
    ), cells AS (
        SELECT treat, CASE WHEN d > split_d THEN 1 ELSE 0 END AS post, v
        FROM base CROSS JOIN split
    )
    SELECT first((SELECT split_d FROM split)) AS split_date,
        round(avg(CASE WHEN treat = 0 AND post = 0 THEN v END), 6)
            AS m_c_pre,
        round(avg(CASE WHEN treat = 0 AND post = 1 THEN v END), 6)
            AS m_c_post,
        round(avg(CASE WHEN treat = 1 AND post = 0 THEN v END), 6)
            AS m_t_pre,
        round(avg(CASE WHEN treat = 1 AND post = 1 THEN v END), 6)
            AS m_t_post,
        count(CASE WHEN treat = 0 AND post = 0 THEN v END) AS n_c_pre,
        count(CASE WHEN treat = 0 AND post = 1 THEN v END) AS n_c_post,
        count(CASE WHEN treat = 1 AND post = 0 THEN v END) AS n_t_pre,
        count(CASE WHEN treat = 1 AND post = 1 THEN v END) AS n_t_post,
        round((avg(CASE WHEN treat = 1 AND post = 1 THEN v END)
               - avg(CASE WHEN treat = 1 AND post = 0 THEN v END))
              - (avg(CASE WHEN treat = 0 AND post = 1 THEN v END)
                 - avg(CASE WHEN treat = 0 AND post = 0 THEN v END)),
              6) AS did
    FROM cells
    """


def ab_ratio_metric(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    num_type: str = "purchase",
    den_type: str = "view",
) -> DataFrame:
    """Ratio-of-sums metric per arm with DELTA-METHOD standard errors —
    the revenue-per-view / CTR-class readout. The naive per-user-ratio
    average is biased (users with tiny denominators dominate) and the
    pooled ratio's variance is NOT a mean's variance because numerator
    and denominator are correlated within user; the delta method is the
    standard fix (Deng et al., KDD 2018):

        R = Σx / Σy,   Var(R) ≈ (s_x² + R²·s_y² − 2R·s_xy) / (n·ȳ²)

    with x = per-user numerator sum, y = per-user denominator sum
    (both zero-filled — every randomized user stays in), and s_· the
    per-user sample (co)variances within the arm.

    Plan: ONE user-grain fold (the only fact shuffle), a 2-row
    conditional arm aggregate of the sufficient statistics, then
    closed-form arithmetic — the _arm_stats shape extended to the
    bivariate case. Returns one row (n0, n1, r0, r1, se0, se1,
    z_stat), 6dp; degenerate arms degrade to NULL via try_divide."""
    per = events.groupBy(F.col(user_col).alias("user")).agg(
        F.coalesce(
            F.sum(
                F.when(F.col(type_col) == num_type, F.col(value_col))
            ),
            F.lit(0.0),
        ).alias("x"),
        F.sum((F.col(type_col) == den_type).cast("long"))
        .cast("double")
        .alias("y"),
    ).select(_arm("user").alias("arm"), "x", "y")

    def arm_agg(a: int, name):
        cond = F.col("arm") == a
        return [
            F.sum(cond.cast("long")).alias(f"n{a}"),
            F.sum(F.when(cond, F.col("x"))).alias(f"sx{a}"),
            F.sum(F.when(cond, F.col("y"))).alias(f"sy{a}"),
            F.sum(F.when(cond, F.col("x") * F.col("x"))).alias(f"sxx{a}"),
            F.sum(F.when(cond, F.col("y") * F.col("y"))).alias(f"syy{a}"),
            F.sum(F.when(cond, F.col("x") * F.col("y"))).alias(f"sxy{a}"),
        ]

    folded = per.agg(*(arm_agg(0, None) + arm_agg(1, None)))

    def ratio_and_var(a: int):
        # association order matches the SQL mirror EXACTLY (sum the raw
        # centered moments first, divide by (n-1) once, then by n*ybar^2)
        # so both engines round the same double at 6dp
        n = F.col(f"n{a}").cast("double")
        r = F.try_divide(F.col(f"sx{a}"), F.col(f"sy{a}"))
        ybar = F.try_divide(F.col(f"sy{a}"), n)
        raw_x = F.col(f"sxx{a}") - F.col(f"sx{a}") * F.col(f"sx{a}") / n
        raw_y = F.col(f"syy{a}") - F.col(f"sy{a}") * F.col(f"sy{a}") / n
        raw_xy = F.col(f"sxy{a}") - F.col(f"sx{a}") * F.col(f"sy{a}") / n
        var_r = F.try_divide(
            F.try_divide(
                raw_x + r * r * raw_y - 2.0 * r * raw_xy, n - 1
            ),
            n * ybar * ybar,
        )
        return r, var_r

    r0, v0 = ratio_and_var(0)
    r1, v1 = ratio_and_var(1)
    z = F.try_divide(r1 - r0, F.sqrt(v0 + v1))
    return folded.select(
        "n0",
        "n1",
        F.round(r0, 6).alias("r0"),
        F.round(r1, 6).alias("r1"),
        F.round(F.sqrt(v0), 6).alias("se0"),
        F.round(F.sqrt(v1), 6).alias("se1"),
        F.round(z, 6).alias("z_stat"),
    )


def sql_ab_ratio_metric(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    num_type: str = "purchase",
    den_type: str = "view",
) -> str:
    """DuckDB replay of :func:`ab_ratio_metric` — same bivariate
    sufficient statistics, same delta-method algebra, NULLIF
    degradation."""
    return f"""
    WITH per AS (
        SELECT CAST({user_col} % 2 AS INT) AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{num_type}'
                              THEN {value_col} END), 0.0) AS x,
            CAST(sum(CASE WHEN {type_col} = '{den_type}'
                          THEN 1 ELSE 0 END) AS DOUBLE) AS y
        FROM {table} GROUP BY {user_col}
    ), folded AS (
        SELECT
            sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
            sum(CASE WHEN arm = 0 THEN x END) AS sx0,
            sum(CASE WHEN arm = 0 THEN y END) AS sy0,
            sum(CASE WHEN arm = 0 THEN x * x END) AS sxx0,
            sum(CASE WHEN arm = 0 THEN y * y END) AS syy0,
            sum(CASE WHEN arm = 0 THEN x * y END) AS sxy0,
            sum(CASE WHEN arm = 1 THEN x END) AS sx1,
            sum(CASE WHEN arm = 1 THEN y END) AS sy1,
            sum(CASE WHEN arm = 1 THEN x * x END) AS sxx1,
            sum(CASE WHEN arm = 1 THEN y * y END) AS syy1,
            sum(CASE WHEN arm = 1 THEN x * y END) AS sxy1
        FROM per
    ), terms AS (
        SELECT n0, n1,
            sx0 / NULLIF(sy0, 0.0) AS r0,
            sx1 / NULLIF(sy1, 0.0) AS r1,
            ((sxx0 - sx0 * sx0 / n0)
             + (sx0 / NULLIF(sy0, 0.0)) * (sx0 / NULLIF(sy0, 0.0))
               * (syy0 - sy0 * sy0 / n0)
             - 2.0 * (sx0 / NULLIF(sy0, 0.0))
               * (sxy0 - sx0 * sy0 / n0))
            / NULLIF(n0 - 1, 0)
            / NULLIF(n0 * (sy0 / n0) * (sy0 / n0), 0.0) AS v0,
            ((sxx1 - sx1 * sx1 / n1)
             + (sx1 / NULLIF(sy1, 0.0)) * (sx1 / NULLIF(sy1, 0.0))
               * (syy1 - sy1 * sy1 / n1)
             - 2.0 * (sx1 / NULLIF(sy1, 0.0))
               * (sxy1 - sx1 * sy1 / n1))
            / NULLIF(n1 - 1, 0)
            / NULLIF(n1 * (sy1 / n1) * (sy1 / n1), 0.0) AS v1
        FROM folded
    )
    SELECT n0, n1,
        round(r0, 6) AS r0, round(r1, 6) AS r1,
        round(sqrt(v0), 6) AS se0, round(sqrt(v1), 6) AS se1,
        round((r1 - r0) / NULLIF(sqrt(v0 + v1), 0.0), 6) AS z_stat
    FROM terms
    """


# ---------------------------------------------------------------------------
# r12: Bayesian A/B (beta-binomial) + always-valid sequential test (mSPRT)
# ---------------------------------------------------------------------------

def bayes_ab_conversion(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    prior_alpha: float = 1.0,
    prior_beta: float = 1.0,
) -> DataFrame:
    """Bayesian A/B on the per-user conversion flag (any ``metric_type``
    event) under independent Beta(``prior_alpha``, ``prior_beta``)
    priors: the posterior-summary readout product teams actually ship
    next to the frequentist Welch/two-prop pair — "what is the
    probability B beats A, and by how much" — with no peeking penalty.

    Posterior per arm a: Beta(α + cₐ, β + nₐ − cₐ); P(B > A) via the
    normal approximation of the posterior difference —
    Φ((μ₁ − μ₀) / √(v₀ + v₁)) with the Beta mean/variance in closed
    form — computed with the SAME A&S 26.2.17 polynomial literals on
    both engines (`_phi_upper_sql`), so parity is exact.  The normal
    approximation is the industry default at experiment scale (n in the
    thousands; the exact integral needs special functions neither
    engine has natively).

    Scale: one (user, converted) aggregate is the only fact pass; the
    readout is a 1-row closed-form fold.  Output:
    (n0, conv0, n1, conv1, post_mean0, post_mean1, lift,
    prob_b_beats_a), 6dp."""
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.max(
            (F.col(type_col) == metric_type).cast("int")
        ).alias("conv")
    )
    agg = per_user.agg(
        F.sum(F.when(_arm("u") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(_arm("u") == 0, F.col("conv"))).alias("conv0"),
        F.sum(F.when(_arm("u") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(_arm("u") == 1, F.col("conv"))).alias("conv1"),
    )
    pa, pb = float(prior_alpha), float(prior_beta)
    a0 = F.lit(pa) + F.coalesce(F.col("conv0"), F.lit(0)).cast("double")
    b0 = F.lit(pb) + (F.col("n0") - F.coalesce(F.col("conv0"), F.lit(0))).cast("double")
    a1 = F.lit(pa) + F.coalesce(F.col("conv1"), F.lit(0)).cast("double")
    b1 = F.lit(pb) + (F.col("n1") - F.coalesce(F.col("conv1"), F.lit(0))).cast("double")
    m0, m1 = a0 / (a0 + b0), a1 / (a1 + b1)
    v0 = a0 * b0 / ((a0 + b0) * (a0 + b0) * (a0 + b0 + F.lit(1.0)))
    v1 = a1 * b1 / ((a1 + b1) * (a1 + b1) * (a1 + b1 + F.lit(1.0)))
    scored = agg.select(
        "n0",
        F.coalesce(F.col("conv0"), F.lit(0)).alias("conv0"),
        "n1",
        F.coalesce(F.col("conv1"), F.lit(0)).alias("conv1"),
        F.round(m0, 6).alias("post_mean0"),
        F.round(m1, 6).alias("post_mean1"),
        F.round(m1 - m0, 6).alias("lift"),
        F.try_divide(m1 - m0, F.sqrt(v0 + v1)).alias("_z"),
    )
    prob = (
        "CASE WHEN _z IS NULL THEN NULL"
        " WHEN _z >= 0.0 THEN 1.0 - " + _phi_upper_sql("_z") +
        " ELSE " + _phi_upper_sql("(-_z)") + " END"
    )
    return scored.select(
        "n0", "conv0", "n1", "conv1", "post_mean0", "post_mean1", "lift",
        F.round(F.expr(prob), 6).alias("prob_b_beats_a"),
    )


def sql_bayes_ab_conversion(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    prior_alpha: float = 1.0,
    prior_beta: float = 1.0,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``bayes_ab_conversion`` (same Beta-posterior
    closed forms, same A&S polynomial literals, same op order)."""
    pa, pb = float(prior_alpha), float(prior_beta)
    return f"""
    WITH per_user AS (
        SELECT {user_col} AS u,
            max(CASE WHEN {type_col} = '{metric_type}' THEN 1 ELSE 0 END)
                AS conv
        FROM {table} WHERE ({where})
        GROUP BY 1
    ), agg AS (
        SELECT
            sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS n0,
            coalesce(sum(CASE WHEN u % 2 = 0 THEN conv END), 0) AS conv0,
            sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS n1,
            coalesce(sum(CASE WHEN u % 2 = 1 THEN conv END), 0) AS conv1
        FROM per_user
    ), post AS (
        SELECT n0, conv0, n1, conv1,
            {pa!r} + CAST(conv0 AS DOUBLE) AS a0,
            {pb!r} + CAST(n0 - conv0 AS DOUBLE) AS b0,
            {pa!r} + CAST(conv1 AS DOUBLE) AS a1,
            {pb!r} + CAST(n1 - conv1 AS DOUBLE) AS b1
        FROM agg
    ), moments AS (
        SELECT n0, conv0, n1, conv1,
            a0 / (a0 + b0) AS m0, a1 / (a1 + b1) AS m1,
            a0 * b0 / ((a0 + b0) * (a0 + b0) * (a0 + b0 + 1.0)) AS v0,
            a1 * b1 / ((a1 + b1) * (a1 + b1) * (a1 + b1 + 1.0)) AS v1
        FROM post
    ), z AS (
        SELECT n0, conv0, n1, conv1,
            round(m0, 6) AS post_mean0, round(m1, 6) AS post_mean1,
            round(m1 - m0, 6) AS lift,
            (m1 - m0) / NULLIF(sqrt(v0 + v1), 0.0) AS _z
        FROM moments
    )
    SELECT n0, conv0, n1, conv1, post_mean0, post_mean1, lift,
        round(CASE WHEN _z IS NULL THEN NULL
                   WHEN _z >= 0.0 THEN 1.0 - {_phi_upper_sql("_z")}
                   ELSE {_phi_upper_sql("(-_z)")} END, 6)
            AS prob_b_beats_a
    FROM z
    """


def msprt_conversion_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    tau: float = 0.01,
) -> DataFrame:
    """Always-valid sequential test (mixture SPRT, normal mixture with
    mixing variance ``tau``²) on the daily cumulative conversion-rate
    difference — the anytime-peeking counterpart of the fixed-horizon
    two-prop z: the experimenter may stop the FIRST day the always-
    valid p crosses α without inflating the false-positive rate.

        Λ_t = √(V_t / (V_t + τ²)) · exp(θ̂_t² · τ² / (2 V_t (V_t + τ²)))
        p_t = min(1, 1 / max_{s≤t} Λ_s)      (monotone by construction)

    with θ̂_t = p̂₁ − p̂₀ over users ENTERED by day t (first event day)
    and converted by day t (first metric event day), and V_t the pooled
    binomial variance p̄(1−p̄)(1/n₀+1/n₁).  Entry/conversion censoring
    makes each day's snapshot exactly what the experimenter saw that
    evening.

    Scale: one (user → arm, entry day, conversion day) aggregate is the
    only fact pass; both cumulative series are running sums on the
    DAY-grain spine, and the Λ/p folds are day-grain window arithmetic
    (≤ observation-span rows).  Output one row per day:
    (day, n0, c0, n1, c1, theta, lam, p_always_valid), 6dp."""
    from pyspark.sql import Window

    per_user = events.filter(F.col(ts_col).isNotNull()).groupBy(
        F.col(user_col).alias("u")
    ).agg(
        F.min(F.to_date(ts_col)).alias("entry_d"),
        F.min(
            F.when(
                F.col(type_col) == metric_type, F.to_date(ts_col)
            )
        ).alias("conv_d"),
    )
    # spine = every day anything CHANGES: entry days ∪ conversion days.
    # Entry days alone silently dropped conversions landing on a
    # non-entry day from the cumulative counts forever (r12 review
    # finding — the oracle shared the bug, so parity stayed green while
    # the statistic was wrong); between-change days carry no new
    # information, so the snapshot grain is still exactly "what the
    # experimenter saw that evening".
    spine = (
        per_user.select(F.col("entry_d").alias("day"))
        .union(
            per_user.filter(F.col("conv_d").isNotNull()).select(
                F.col("conv_d").alias("day")
            )
        )
        .distinct()
    )
    entries = per_user.groupBy(F.col("entry_d").alias("day")).agg(
        F.sum(F.when(_arm("u") == 0, 1).otherwise(0)).alias("_e0"),
        F.sum(F.when(_arm("u") == 1, 1).otherwise(0)).alias("_e1"),
    )
    convs = (
        per_user.filter(F.col("conv_d").isNotNull())
        .groupBy(F.col("conv_d").alias("day"))
        .agg(
            F.sum(F.when(_arm("u") == 0, 1).otherwise(0)).alias("_c0"),
            F.sum(F.when(_arm("u") == 1, 1).otherwise(0)).alias("_c1"),
        )
    )
    daily = (
        spine.join(entries, "day", "left")
        .join(convs, "day", "left")
        .select(
            "day",
            F.coalesce("_e0", F.lit(0)).alias("_e0"),
            F.coalesce("_e1", F.lit(0)).alias("_e1"),
            F.coalesce("_c0", F.lit(0)).alias("_c0"),
            F.coalesce("_c1", F.lit(0)).alias("_c1"),
        )
    )
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("_e0").over(w_run).alias("n0"),
        F.sum("_c0").over(w_run).alias("c0"),
        F.sum("_e1").over(w_run).alias("n1"),
        F.sum("_c1").over(w_run).alias("c1"),
    )
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    theta = F.try_divide(F.col("c1").cast("double"), n1d) - F.try_divide(
        F.col("c0").cast("double"), n0d
    )
    pbar = F.try_divide(
        (F.col("c0") + F.col("c1")).cast("double"), n0d + n1d
    )
    v = (
        pbar
        * (F.lit(1.0) - pbar)
        * (F.try_divide(F.lit(1.0), n0d) + F.try_divide(F.lit(1.0), n1d))
    )
    t2 = float(tau) * float(tau)
    lam = F.when(
        v.isNotNull() & (v > 0),
        F.sqrt(v / (v + F.lit(t2)))
        * F.exp(
            theta * theta * F.lit(t2)
            / (F.lit(2.0) * v * (v + F.lit(t2)))
        ),
    )
    scored = cum.select(
        "day", "n0", "c0", "n1", "c1",
        F.round(theta, 6).alias("theta"),
        lam.alias("_lam"),
    )
    w_max = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run_max = F.max("_lam").over(w_max)
    return scored.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n0", "c0", "n1", "c1", "theta",
        F.round(F.coalesce(F.col("_lam"), F.lit(1.0)), 6).alias("lam"),
        F.round(
            F.least(
                F.lit(1.0),
                F.try_divide(F.lit(1.0), F.coalesce(run_max, F.lit(1.0))),
            ),
            6,
        ).alias("p_always_valid"),
    )


def sql_msprt_conversion_daily(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    tau: float = 0.01,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``msprt_conversion_daily`` (same entry/
    conversion censoring, same pooled-variance mixture-LR arithmetic,
    same running-max monotonization)."""
    t2 = float(tau) * float(tau)
    return f"""
    WITH per_user AS (
        SELECT {user_col} AS u,
            min(CAST({ts_col} AS DATE)) AS entry_d,
            min(CASE WHEN {type_col} = '{metric_type}'
                     THEN CAST({ts_col} AS DATE) END) AS conv_d
        FROM {table} WHERE ({where}) AND {ts_col} IS NOT NULL
        GROUP BY 1
    ), spine AS (
        -- entry days UNION conversion days (r12 review finding)
        SELECT DISTINCT day FROM (
            SELECT entry_d AS day FROM per_user
            UNION ALL
            SELECT conv_d FROM per_user WHERE conv_d IS NOT NULL
        )
    ), entries AS (
        SELECT entry_d AS day,
            sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS e0,
            sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS e1
        FROM per_user GROUP BY 1
    ), convs AS (
        SELECT conv_d AS day,
            sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS cc0,
            sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS cc1
        FROM per_user WHERE conv_d IS NOT NULL GROUP BY 1
    ), daily AS (
        SELECT s.day,
            coalesce(e.e0, 0) AS e0, coalesce(e.e1, 0) AS e1,
            coalesce(c.cc0, 0) AS cc0, coalesce(c.cc1, 0) AS cc1
        FROM spine s
        LEFT JOIN entries e ON s.day = e.day
        LEFT JOIN convs c ON s.day = c.day
    ), cum AS (
        SELECT day,
            sum(e0) OVER w AS n0, sum(cc0) OVER w AS c0,
            sum(e1) OVER w AS n1, sum(cc1) OVER w AS c1
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), terms AS (
        SELECT day, n0, c0, n1, c1,
            CAST(c1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0.0)
            - CAST(c0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0.0)
                AS theta,
            (CAST(c0 + c1 AS DOUBLE) / NULLIF(CAST(n0 + n1 AS DOUBLE), 0.0))
            * (1.0 - CAST(c0 + c1 AS DOUBLE)
               / NULLIF(CAST(n0 + n1 AS DOUBLE), 0.0))
            * (1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0)
               + 1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0)) AS v
        FROM cum
    ), lr AS (
        -- theta stays RAW here: DuckDB's lateral alias reuse would
        -- otherwise feed the 6dp-rounded theta into lam while the
        -- Spark twin folds the unrounded value
        SELECT day, n0, c0, n1, c1, theta,
            CASE WHEN v IS NOT NULL AND v > 0 THEN
                sqrt(v / (v + {t2!r}))
                * exp(theta * theta * {t2!r} / (2.0 * v * (v + {t2!r})))
            END AS lam
        FROM terms
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n0, c0, n1, c1,
        round(theta, 6) AS theta,
        round(coalesce(lam, 1.0), 6) AS lam,
        round(least(1.0, 1.0 / coalesce(
            max(lam) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW), 1.0)), 6) AS p_always_valid
    FROM lr
    """


# ---------------------------------------------------------------------------
# r12: quantile treatment effects
# ---------------------------------------------------------------------------

_QTE_QS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


def qte_metric(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    qs: tuple = _QTE_QS,
) -> DataFrame:
    """Quantile treatment effects: Δ(q) = Q₁(q) − Q₀(q) of the per-user
    metric at each decile — WHERE in the outcome distribution the
    treatment moves users, which a mean-difference (Welch) readout
    averages away (a treatment that lifts the top decile and hurts the
    median shows Δ(0.9) > 0 > Δ(0.5) here and ≈0 there).  The metric is
    the zero-filled per-user value sum (all-randomized-units rule, the
    ``_user_metric`` contract).

    Parity discipline: values are quantized to CENTS (bigint) before
    the quantile, because exact linear-interpolation quantiles on raw
    doubles differ across engines at the last ulp (the rolling_median
    precedent); Spark's exact ``percentile(col, array(...))`` and
    DuckDB's ``quantile_cont`` share the same interpolation definition
    on the quantized integers.

    Plan: ONE user-grain fact fold, then a 2-row exact-percentile
    aggregate (one sort per arm inside the aggregate) and a
    parameter-sized unpivot.  Output one row per q:
    (q, n0, n1, q0, q1, qte), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    um = pooled_persist(
        _user_metric(
            events,
            user_col,
            value_col,
            F.col(type_col) == metric_type,
        ).select(
            "arm", F.round(F.col("m") * 100).cast("bigint").alias("_cents")
        )
    )
    q_arr = "array(" + ", ".join(repr(float(q)) for q in qs) + ")"
    per_arm = um.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"percentile(_cents, {q_arr})").alias("_qv"),
    )
    qs_df = per_arm.select(
        "arm",
        "n",
        F.posexplode(
            F.arrays_zip(
                F.array(*[F.lit(float(q)) for q in qs]).alias("q"),
                F.col("_qv").alias("v"),
            )
        ).alias("_pos", "_z"),
    ).select(
        "arm",
        "n",
        F.col("_z.q").alias("q"),
        (F.col("_z.v") / F.lit(100.0)).alias("_val"),
    )
    a0 = qs_df.filter(F.col("arm") == 0).select(
        "q", F.col("n").alias("n0"), F.col("_val").alias("_v0")
    )
    a1 = qs_df.filter(F.col("arm") == 1).select(
        "q", F.col("n").alias("n1"), F.col("_val").alias("_v1")
    )
    # LEFT joins off the literal q grid (r12 review finding): an empty
    # arm must yield all |qs| rows with n=0 and NULL quantiles — the
    # oracle's conditional-sum shape — not an empty inner join.
    grid = events.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    return (
        grid.join(a0, "q", "left")
        .join(a1, "q", "left")
        .select(
            F.round("q", 2).alias("q"),
            F.coalesce("n0", F.lit(0)).alias("n0"),
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.round("_v0", 6).alias("q0"),
            F.round("_v1", 6).alias("q1"),
            F.round(F.col("_v1") - F.col("_v0"), 6).alias("qte"),
        )
    )


def sql_qte_metric(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    qs: tuple = _QTE_QS,
) -> str:
    """DuckDB replay of ``qte_metric`` (same cents quantization, same
    linear-interpolation quantile definition, same unpivot)."""
    per_q = "\n        UNION ALL\n".join(
        f"""        SELECT {float(q)!r} AS q,
            quantile_cont(CASE WHEN arm = 0 THEN _cents END, {float(q)!r})
                / 100.0 AS v0,
            quantile_cont(CASE WHEN arm = 1 THEN _cents END, {float(q)!r})
                / 100.0 AS v1
        FROM um"""
        for q in qs
    )
    return f"""
    WITH um AS (
        SELECT {user_col} % 2 AS arm,
            CAST(round(coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                THEN {value_col} END), 0.0) * 100) AS BIGINT) AS _cents
        FROM {table}
        GROUP BY {user_col}
    ), counts AS (
        SELECT
            sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1
        FROM um
    ), per_q AS (
{per_q}
    )
    SELECT round(q, 2) AS q, counts.n0, counts.n1,
        round(v0, 6) AS q0, round(v1, 6) AS q1,
        round(v1 - v0, 6) AS qte
    FROM per_q CROSS JOIN counts
    """


# ---------------------------------------------------------------------------
# r12d: McNemar's paired-proportion test — within-user period flips
# ---------------------------------------------------------------------------


def mcnemar_conversion_shift(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """McNemar's test on PAIRED per-user conversion across the two
    halves of the observation window: did the population's propensity
    to convert SHIFT between periods, using each user as their own
    control — the paired sibling of :func:`two_prop_test` (which
    compares independent arms, not the same users twice).

    The window splits at the midpoint between the global min and max
    timestamp (one 2-value broadcast aggregate). Per user:
    p1 = converted in the first half, p2 = in the second. The test
    reads only the DISCORDANT cells b = |p1 ∧ ¬p2|, c = |¬p1 ∧ p2|:

        chi2 = (|b − c| − 1)² / (b + c)        (continuity-corrected)

    with the 1-dof chi-square p replayed as 2·Φ̄(√chi2) via the shared
    A&S 26.2.17 polynomial (`_phi_upper_sql`) — identical literals on
    both engines. b + c = 0 (no discordant users) degrades chi2 and p
    to NULL via try_divide, matching the oracle's NULLIF.

    Plan: one fact pass → user-grain fold keyed (user, half-flags) via
    two conditional max's (the only fact shuffle), then a one-row cell
    aggregate. Scale posture: user-grain is the natural shuffle key; no
    user×period grid is materialized. Returns one row
    (n_users, n11, n10, n01, n00, chi2, p_value), 6dp."""
    # floor-division midpoint on epoch MICROS (both engines integer-//:
    # a double `/2` then cast would TRUNCATE on Spark but ROUND on
    # DuckDB — a 1-µs boundary divergence)
    mid = events.agg(
        F.timestamp_micros(
            F.floor(
                (
                    F.unix_micros(F.min(ts_col))
                    + F.unix_micros(F.max(ts_col))
                )
                / F.lit(2)
            ).cast("long")
        ).alias("_mid")
    )
    conv = F.col(type_col) == metric_type
    per_user = (
        # NULL-ts events carry no period information: without the filter
        # a user whose ONLY metric events have NULL ts folds to p1/p2
        # NULL on Spark (max of all-NULL booleans) but 0 on DuckDB (CASE
        # ELSE 0) — r13 ADVICE parity gap. Filtered on BOTH engines, so
        # such users drop from every cell including n_users.
        events.filter(F.col(ts_col).isNotNull())
        .crossJoin(F.broadcast(mid))
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.max(
                (conv & (F.col(ts_col) < F.col("_mid"))).cast("int")
            ).alias("p1"),
            F.max(
                (conv & (F.col(ts_col) >= F.col("_mid"))).cast("int")
            ).alias("p2"),
        )
    )
    cells = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("p1") * F.col("p2")).alias("n11"),
        F.sum(F.col("p1") * (1 - F.col("p2"))).alias("n10"),
        F.sum((1 - F.col("p1")) * F.col("p2")).alias("n01"),
        F.sum((1 - F.col("p1")) * (1 - F.col("p2"))).alias("n00"),
    )
    b = F.col("n10").cast("double")
    c = F.col("n01").cast("double")
    num = F.abs(b - c) - 1.0
    chi2 = F.try_divide(num * num, b + c)
    out = cells.withColumn("_z", F.sqrt(chi2))
    return out.select(
        "n_users",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.expr("2.0 * " + _phi_upper_sql("_z")), 6
        ).alias("p_value"),
    )


def sql_mcnemar_conversion_shift(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of :func:`mcnemar_conversion_shift` — same epoch-
    microsecond midpoint split, same discordant-cell arithmetic, same
    A&S polynomial."""
    return f"""
    WITH mid AS (
        SELECT make_timestamp((epoch_us(min({ts_col}))
                               + epoch_us(max({ts_col}))) // 2) AS _mid
        FROM {table}
    ), per_user AS (
        SELECT {user_col} AS usr,
            max(CASE WHEN {type_col} = '{metric_type}'
                     AND {ts_col} < mid._mid THEN 1 ELSE 0 END) AS p1,
            max(CASE WHEN {type_col} = '{metric_type}'
                     AND {ts_col} >= mid._mid THEN 1 ELSE 0 END) AS p2
        FROM {table} CROSS JOIN mid
        WHERE {ts_col} IS NOT NULL
        GROUP BY 1
    ), cells AS (
        -- CAST: DuckDB sum(INT) is HUGEINT (pandas float64); Spark's
        -- is LONG — the driver's dtype-strict hash needs BIGINT
        SELECT count(*) AS n_users,
            CAST(sum(p1 * p2) AS BIGINT) AS n11,
            CAST(sum(p1 * (1 - p2)) AS BIGINT) AS n10,
            CAST(sum((1 - p1) * p2) AS BIGINT) AS n01,
            CAST(sum((1 - p1) * (1 - p2)) AS BIGINT) AS n00
        FROM per_user
    ), stat AS (
        SELECT *,
            (abs(CAST(n10 AS DOUBLE) - n01) - 1.0)
            * (abs(CAST(n10 AS DOUBLE) - n01) - 1.0)
            / nullif(CAST(n10 AS DOUBLE) + n01, 0.0) AS chi2
        FROM cells
    )
    SELECT n_users, n11, n10, n01, n00, round(chi2, 6) AS chi2,
        round(2.0 * {_phi_upper_sql('sqrt(chi2)')}, 6) AS p_value
    FROM stat
    """


# ---------------------------------------------------------------------------
# r12d: post-stratification — variance-reduced A/B estimate
# ---------------------------------------------------------------------------


def post_stratified_ab(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    metric_type: str = "purchase",
    max_stratum: int = 5,
) -> DataFrame:
    """Post-stratified treatment-effect estimate on per-user metric
    value: re-weight within-stratum arm differences by stratum size —
    the design-free cousin of :func:`cuped_adjusted` (CUPED needs a
    pre-period covariate; post-stratification only needs a discrete
    stratum label), removing the between-stratum component of the
    outcome variance.

        d_adj = Σ_s w_s·(ȳ1s − ȳ0s),  w_s = n_s/N
        se²   = Σ_s w_s²·(v0s/n0s + v1s/n1s)

    Strata: the user's activity tier ``least(floor(log2(n_events)),
    max_stratum)`` — deterministic, engine-exact (log2 of a long is
    integral only at exact powers of two, where IEEE log2 is exact).
    NOTE the textbook caveat applies: activity is measured over the
    experiment window, so this demonstrates the MECHANISM; a production
    readout would stratify on a pre-assignment attribute.

    Plan: one fact pass → user-grain fold (the only fact shuffle) →
    ≤ (max_stratum+1)-row strata aggregate → one-row combine (the
    strata frame cross-joins its own one-row total; nothing collects).
    Degenerate strata (an arm with n<2) contribute NULL variance via
    try_divide and degrade se/z/p to NULL, matching the oracle's
    NULLIF. Returns one row (n_users, n_strata, diff_unadj, diff_adj,
    se_adj, z, p_value), 6dp."""
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.sum(
            F.when(F.col(type_col) == metric_type, F.col(value_col))
            .otherwise(0.0)
        ).alias("y"),
        F.count(F.lit(1)).alias("n_ev"),
    ).select(
        _arm("user").alias("arm"),
        "y",
        F.least(
            F.floor(F.log2("n_ev")), F.lit(max_stratum)
        ).cast("int").alias("stratum"),
    )
    strata = per_user.groupBy("stratum").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0.0)).alias(
            "s0"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0.0)).alias(
            "s1"
        ),
        F.sum(
            F.when(F.col("arm") == 0, F.col("y") * F.col("y")).otherwise(0.0)
        ).alias("ss0"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("y") * F.col("y")).otherwise(0.0)
        ).alias("ss1"),
    )
    m0 = F.try_divide(F.col("s0"), F.col("n0"))
    m1 = F.try_divide(F.col("s1"), F.col("n1"))
    v0 = F.try_divide(
        F.col("ss0") - F.try_divide(F.col("s0") * F.col("s0"), F.col("n0")),
        F.col("n0") - 1,
    )
    v1 = F.try_divide(
        F.col("ss1") - F.try_divide(F.col("s1") * F.col("s1"), F.col("n1")),
        F.col("n1") - 1,
    )
    ns = (F.col("n0") + F.col("n1")).cast("double")
    per_s = strata.select(
        "n0",
        "n1",
        "s0",
        "s1",
        ns.alias("ns"),
        (m1 - m0).alias("d"),
        (
            F.try_divide(v0, F.col("n0"))
            + F.try_divide(v1, F.col("n1"))
        ).alias("vsum"),
    )
    comb = per_s.agg(
        F.sum("ns").alias("n_users"),
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("n0").alias("tn0"),
        F.sum("n1").alias("tn1"),
        F.sum("s0").alias("ts0"),
        F.sum("s1").alias("ts1"),
        F.sum(F.col("ns") * F.col("d")).alias("wd"),
        F.sum(F.col("ns") * F.col("ns") * F.col("vsum")).alias("wv"),
    )
    nu = F.col("n_users")
    diff_unadj = F.try_divide(F.col("ts1"), F.col("tn1")) - F.try_divide(
        F.col("ts0"), F.col("tn0")
    )
    diff_adj = F.col("wd") / nu
    # clamp: wv can cancel a few ulps negative when within-(stratum, arm)
    # values are near-constant (r13 ADVICE — DuckDB sqrt raises where
    # Spark would degrade to NaN).  NULL-PRESERVING form: greatest()
    # swallows NULL on both engines, and a NULL wv (single-user arms,
    # sample variance undefined) must stay NULL, not become se=0
    # (r13 full-suite regression catch).
    wv_c = F.when(F.col("wv") < 0, F.lit(0.0)).otherwise(F.col("wv"))
    se = F.sqrt(wv_c) / nu
    z = F.try_divide(diff_adj, se)
    out = comb.withColumn("_az", F.abs(z))
    return out.select(
        nu.cast("long").alias("n_users"),
        "n_strata",
        F.round(diff_unadj, 6).alias("diff_unadj"),
        F.round(diff_adj, 6).alias("diff_adj"),
        F.round(se, 6).alias("se_adj"),
        F.round(z, 6).alias("z"),
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_post_stratified_ab(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    metric_type: str = "purchase",
    max_stratum: int = 5,
) -> str:
    """DuckDB replay of :func:`post_stratified_ab` — same log2 strata,
    same sufficient-statistic combine, NULLIF degeneracy."""
    return f"""
    WITH per_user AS (
        SELECT {user_col} % 2 AS arm,
            sum(CASE WHEN {type_col} = '{metric_type}'
                     THEN {value_col} ELSE 0.0 END) AS y,
            {sql_user_activity_tier(max_stratum)} AS stratum
        FROM {table} GROUP BY {user_col}
    ), strata AS (
        SELECT stratum,
            sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
            sum(CASE WHEN arm = 0 THEN y ELSE 0.0 END) AS s0,
            sum(CASE WHEN arm = 1 THEN y ELSE 0.0 END) AS s1,
            sum(CASE WHEN arm = 0 THEN y * y ELSE 0.0 END) AS ss0,
            sum(CASE WHEN arm = 1 THEN y * y ELSE 0.0 END) AS ss1
        FROM per_user GROUP BY 1
    ), per_s AS (
        SELECT n0, n1, s0, s1, CAST(n0 + n1 AS DOUBLE) AS ns,
            s1 / nullif(n1, 0) - s0 / nullif(n0, 0) AS d,
            (ss0 - s0 * s0 / nullif(n0, 0)) / nullif(n0 - 1, 0)
                / nullif(n0, 0)
            + (ss1 - s1 * s1 / nullif(n1, 0)) / nullif(n1 - 1, 0)
                / nullif(n1, 0) AS vsum
        FROM strata
    ), comb AS (
        SELECT sum(ns) AS n_users, count(*) AS n_strata,
            sum(n0) AS tn0, sum(n1) AS tn1,
            sum(s0) AS ts0, sum(s1) AS ts1,
            sum(ns * d) AS wd, sum(ns * ns * vsum) AS wv
        FROM per_s
    ), stat AS (
        SELECT CAST(n_users AS BIGINT) AS n_users, n_strata,
            ts1 / nullif(tn1, 0) - ts0 / nullif(tn0, 0) AS diff_unadj,
            wd / n_users AS diff_adj,
            sqrt(CASE WHEN wv < 0 THEN 0.0 ELSE wv END) / n_users
                AS se_adj,
            wd / n_users
                / nullif(sqrt(CASE WHEN wv < 0 THEN 0.0 ELSE wv END)
                         / n_users, 0.0) AS z
        FROM comb
    )
    SELECT n_users, n_strata, round(diff_unadj, 6) AS diff_unadj,
        round(diff_adj, 6) AS diff_adj, round(se_adj, 6) AS se_adj,
        round(z, 6) AS z,
        round(2.0 * {_phi_upper_sql('abs(z)')}, 6) AS p_value
    FROM stat
    """


# ---------------------------------------------------------------------------
# r12g: instrumental-variable (Wald) estimate — causal dose effect
# ---------------------------------------------------------------------------


def iv_wald_estimate(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    exposure_type: str = "view",
    outcome_type: str = "purchase",
) -> DataFrame:
    """Instrumental-variable (Wald / just-identified 2SLS) estimate of
    the causal effect of EXPOSURE on OUTCOME, using the randomized arm
    as the instrument: naive OLS of purchase value on view count is
    confounded (engaged users view more AND buy more); the arm is
    random, so scaling the intent-to-treat effect by how much the arm
    actually moved exposure recovers the exposure effect for
    instrument-compliers (the LATE):

        β_IV = cov(z, y) / cov(z, x)
             = (ȳ₁ − ȳ₀) / (x̄₁ − x̄₀)        (binary instrument)

    Reads next to :func:`ab_welch_ttest` (the ITT this rescales) and
    :func:`post_stratified_ab`. The readout keeps both reduced-form
    pieces: itt_y (the ITT), first_stage (x̄₁ − x̄₀ — a weak instrument
    means β_IV explodes; judge it before believing β), and beta_iv.
    A null first stage degrades β to NULL via try_divide.

    Plan: one fact pass → user-grain conditional fold (the only fact
    shuffle) → 2-arm aggregate → one-row arithmetic. Returns one row
    (n0, n1, x0, x1, y0, y1, first_stage, itt_y, beta_iv), 6dp."""
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.sum((F.col(type_col) == exposure_type).cast("int"))
        .cast("double")
        .alias("x"),
        F.sum(
            F.when(F.col(type_col) == outcome_type, F.col(value_col))
            .otherwise(0.0)
        ).alias("y"),
    ).select(_arm("user").alias("arm"), "x", "y")
    folded = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0.0)).alias(
            "sx0"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0.0)).alias(
            "sx1"
        ),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0.0)).alias(
            "sy0"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0.0)).alias(
            "sy1"
        ),
    )
    x0 = F.try_divide(F.col("sx0"), F.col("n0"))
    x1 = F.try_divide(F.col("sx1"), F.col("n1"))
    y0 = F.try_divide(F.col("sy0"), F.col("n0"))
    y1 = F.try_divide(F.col("sy1"), F.col("n1"))
    fs = x1 - x0
    itt = y1 - y0
    return folded.select(
        "n0",
        "n1",
        F.round(x0, 6).alias("x0"),
        F.round(x1, 6).alias("x1"),
        F.round(y0, 6).alias("y0"),
        F.round(y1, 6).alias("y1"),
        F.round(fs, 6).alias("first_stage"),
        F.round(itt, 6).alias("itt_y"),
        F.round(F.try_divide(itt, fs), 6).alias("beta_iv"),
    )


def sql_iv_wald_estimate(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    exposure_type: str = "view",
    outcome_type: str = "purchase",
) -> str:
    """DuckDB replay of :func:`iv_wald_estimate` — same fold, same
    Wald ratio, NULLIF degeneracy."""
    return f"""
    WITH per_user AS (
        SELECT {user_col} % 2 AS arm,
            CAST(sum(CASE WHEN {type_col} = '{exposure_type}'
                          THEN 1 ELSE 0 END) AS DOUBLE) AS x,
            sum(CASE WHEN {type_col} = '{outcome_type}'
                     THEN {value_col} ELSE 0.0 END) AS y
        FROM {table} GROUP BY {user_col}
    ), folded AS (
        SELECT
            sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
            sum(CASE WHEN arm = 0 THEN x ELSE 0.0 END) AS sx0,
            sum(CASE WHEN arm = 1 THEN x ELSE 0.0 END) AS sx1,
            sum(CASE WHEN arm = 0 THEN y ELSE 0.0 END) AS sy0,
            sum(CASE WHEN arm = 1 THEN y ELSE 0.0 END) AS sy1
        FROM per_user
    ), means AS (
        SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
            sx0 / nullif(n0, 0) AS x0, sx1 / nullif(n1, 0) AS x1,
            sy0 / nullif(n0, 0) AS y0, sy1 / nullif(n1, 0) AS y1
        FROM folded
    )
    SELECT n0, n1, round(x0, 6) AS x0, round(x1, 6) AS x1,
        round(y0, 6) AS y0, round(y1, 6) AS y1,
        round(x1 - x0, 6) AS first_stage,
        round(y1 - y0, 6) AS itt_y,
        round((y1 - y0) / nullif(x1 - x0, 0.0), 6) AS beta_iv
    FROM means
    """


# ---------------------------------------------------------------------------
# r13b: stratified and rate-based arm comparisons
# ---------------------------------------------------------------------------


def mantel_haenszel_or(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    max_stratum: int = 5,
) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio + test across activity strata:
    the 2x2 (arm x converted) table PER STRATUM (the same log2
    activity-tier strata as :func:`post_stratified_ab`), pooled without
    assuming a common baseline rate — the classic guard against
    Simpson's paradox that a single collapsed 2x2 walks straight into.

        OR_MH = sum_s(a_s d_s / n_s) / sum_s(b_s c_s / n_s)
        chi2  = (|sum a_s - sum E_s| - 0.5)^2 / sum V_s     (CC'd, 1 dof)
        E_s   = r1_s c1_s / n_s
        V_s   = r1_s r0_s c1_s c0_s / (n_s^2 (n_s - 1))

    (a = arm1 converted, b = arm1 not, c = arm0 converted, d = arm0
    not; r = row totals, c = column totals.)  Plan: ONE user-grain fold
    (arm, stratum, converted), a stratum-grain pivot, a one-row
    combine.  Returns (n_users, n_strata, or_mh, chi2, p_value),
    6dp."""
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        (F.col("u") % 2 == 1).alias("_arm1"),
        user_activity_tier(max_stratum).alias("_stratum"),
        F.max(
            (F.col(type_col) == metric_type).cast("int")
        ).alias("_conv"),
    )
    strata = per_user.groupBy("_stratum").agg(
        F.sum(
            F.when(F.col("_arm1") & (F.col("_conv") == 1), 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when(F.col("_arm1") & (F.col("_conv") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when(~F.col("_arm1") & (F.col("_conv") == 1), 1).otherwise(
                0
            )
        ).alias("c"),
        F.sum(
            F.when(~F.col("_arm1") & (F.col("_conv") == 0), 1).otherwise(
                0
            )
        ).alias("d"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    r1 = (F.col("a") + F.col("b")).cast("double")
    r0 = (F.col("c") + F.col("d")).cast("double")
    c1 = (F.col("a") + F.col("c")).cast("double")
    c0 = (F.col("b") + F.col("d")).cast("double")
    comb = strata.agg(
        F.sum(n).cast("long").alias("n_users"),
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.try_divide(F.col("a") * F.col("d"), n)).alias("_num"),
        F.sum(F.try_divide(F.col("b") * F.col("c"), n)).alias("_den"),
        F.sum("a").alias("_sa"),
        F.sum(F.try_divide(r1 * c1, n)).alias("_se"),
        F.sum(
            F.try_divide(r1 * r0 * c1 * c0, n * n * (n - 1.0))
        ).alias("_sv"),
    )
    or_mh = F.try_divide(F.col("_num"), F.col("_den"))
    num = F.abs(F.col("_sa") - F.col("_se")) - 0.5
    chi2 = F.try_divide(
        F.greatest(num, F.lit(0.0)) * F.greatest(num, F.lit(0.0)),
        F.col("_sv"),
    )
    out = comb.withColumn("_z", F.sqrt(chi2))
    return out.select(
        "n_users",
        "n_strata",
        F.round(or_mh, 6).alias("or_mh"),
        F.round(chi2, 6).alias("chi2"),
        F.round(F.expr("2.0 * " + _phi_upper_sql("_z")), 6).alias(
            "p_value"
        ),
    )


def sql_mantel_haenszel_or(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    max_stratum: int = 5,
) -> str:
    """DuckDB replay of :func:`mantel_haenszel_or` — same strata, same
    pooled sums, same continuity correction."""
    return f"""
    WITH per_user AS (
        SELECT {user_col} % 2 = 1 AS arm1,
            {sql_user_activity_tier(max_stratum)} AS stratum,
            max(CASE WHEN {type_col} = '{metric_type}'
                     THEN 1 ELSE 0 END) AS conv
        FROM {table} GROUP BY {user_col}
    ), strata AS (
        SELECT stratum,
            sum(CASE WHEN arm1 AND conv = 1 THEN 1 ELSE 0 END) AS a,
            sum(CASE WHEN arm1 AND conv = 0 THEN 1 ELSE 0 END) AS b,
            sum(CASE WHEN NOT arm1 AND conv = 1 THEN 1 ELSE 0 END) AS c,
            sum(CASE WHEN NOT arm1 AND conv = 0 THEN 1 ELSE 0 END) AS d
        FROM per_user GROUP BY 1
    ), comb AS (
        SELECT CAST(sum(a + b + c + d) AS BIGINT) AS n_users,
            count(*) AS n_strata,
            sum(a * d / nullif(CAST(a + b + c + d AS DOUBLE), 0.0))
                AS num,
            sum(b * c / nullif(CAST(a + b + c + d AS DOUBLE), 0.0))
                AS den,
            sum(a) AS sa,
            sum((a + b) * (a + c)
                / nullif(CAST(a + b + c + d AS DOUBLE), 0.0)) AS se,
            sum(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
                / nullif(CAST(a + b + c + d AS DOUBLE)
                         * (a + b + c + d)
                         * (a + b + c + d - 1.0), 0.0)) AS sv
        FROM strata
    ), stat AS (
        SELECT n_users, n_strata,
            num / nullif(den, 0.0) AS or_mh,
            greatest(abs(sa - se) - 0.5, 0.0)
                * greatest(abs(sa - se) - 0.5, 0.0)
                / nullif(sv, 0.0) AS chi2
        FROM comb
    )
    SELECT n_users, n_strata, round(or_mh, 6) AS or_mh,
        round(chi2, 6) AS chi2,
        round(2.0 * {_phi_upper_sql('sqrt(chi2)')}, 6) AS p_value
    FROM stat
    """


def poisson_rate_test(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """Two-sample Poisson rate test on per-arm event COUNTS (not
    per-user conversion flags — the un-collapsed sibling of
    :func:`two_prop_test`): arm i produces X_i metric events over an
    exposure of n_i users; under H0 (equal per-user rates) the arm-1
    count conditioned on the total is Binomial(X0+X1, n1/(n0+n1)):

        z = (X1 - N p0) / sqrt(N p0 (1 - p0)),  N = X0 + X1

    the standard conditional test (exact-Poisson's normal form).  Plan:
    one user-grain fold (distinct users per arm need the same shuffle
    the counts do), one-row combine.  Returns (n0, n1, x0, x1,
    rate_ratio, z, p_value), 6dp."""
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        (F.col("u") % 2 == 1).alias("_arm1"),
        F.sum(
            (F.col(type_col) == metric_type).cast("long")
        ).alias("_x"),
    )
    comb = per_user.agg(
        F.sum(F.when(~F.col("_arm1"), 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("_arm1"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("_arm1"), F.col("_x")).otherwise(0)).alias(
            "x0"
        ),
        F.sum(F.when(F.col("_arm1"), F.col("_x")).otherwise(0)).alias(
            "x1"
        ),
    )
    nn = (F.col("x0") + F.col("x1")).cast("double")
    p0 = F.try_divide(
        F.col("n1").cast("double"), (F.col("n0") + F.col("n1")).cast("double")
    )
    z = F.try_divide(
        F.col("x1") - nn * p0,
        F.sqrt(F.greatest(nn * p0 * (1.0 - p0), F.lit(0.0))),
    )
    rr = F.try_divide(
        F.try_divide(F.col("x1").cast("double"), F.col("n1")),
        F.try_divide(F.col("x0").cast("double"), F.col("n0")),
    )
    out = comb.withColumn("_az", F.abs(z))
    return out.select(
        "n0",
        "n1",
        "x0",
        "x1",
        F.round(rr, 6).alias("rate_ratio"),
        F.round(z, 6).alias("z"),
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_poisson_rate_test(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of :func:`poisson_rate_test` — same user-grain
    fold, same conditional-binomial z."""
    return f"""
    WITH per_user AS (
        SELECT {user_col} % 2 = 1 AS arm1,
            sum(CASE WHEN {type_col} = '{metric_type}'
                     THEN 1 ELSE 0 END) AS x
        FROM {table} GROUP BY {user_col}
    ), comb AS (
        SELECT
            CAST(sum(CASE WHEN NOT arm1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n0,
            CAST(sum(CASE WHEN arm1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN NOT arm1 THEN x ELSE 0 END) AS BIGINT)
                AS x0,
            CAST(sum(CASE WHEN arm1 THEN x ELSE 0 END) AS BIGINT) AS x1
        FROM per_user
    ), stat AS (
        SELECT *,
            (x1 - (x0 + x1) * (n1 / CAST(n0 + n1 AS DOUBLE)))
            / nullif(sqrt(greatest(
                (x0 + x1) * (n1 / CAST(n0 + n1 AS DOUBLE))
                * (1.0 - n1 / CAST(n0 + n1 AS DOUBLE)), 0.0)), 0.0) AS z,
            (x1 / CAST(n1 AS DOUBLE))
                / nullif(x0 / CAST(n0 AS DOUBLE), 0.0) AS rate_ratio
        FROM comb
    )
    SELECT n0, n1, x0, x1, round(rate_ratio, 6) AS rate_ratio,
        round(z, 6) AS z,
        round(2.0 * {_phi_upper_sql('abs(z)')}, 6) AS p_value
    FROM stat
    """


# ---------------------------------------------------------------------------
# r13c: distribution-shape arm comparisons on the value grain
# ---------------------------------------------------------------------------


def cramer_von_mises_arms(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """Two-sample Cramér-von Mises test on the per-user metric between
    the parity arms: T integrates the SQUARED ECDF gap over the pooled
    sample, so it sees distribution differences the KS sup-norm
    under-weights (spread across many small gaps) and Mann-Whitney
    misses entirely (location-free shape shifts):

        T = (n0·n1 / (n0+n1)^2) · Σ_pooled (F0(x) − F1(x))^2

    computed tie-exactly on the VALUE GRAIN (one row per distinct
    metric, cumulative counts per arm — the mann_whitney bucketed
    precedent's grain without needing its bucketing: the frame is
    |distinct metrics| rows).  Decision flags use the limiting-
    distribution critical values 0.461 / 0.743 (alpha = .10 / .05).
    Returns one row (n0, n1, t_stat, reject_10, reject_05), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    um = _user_metric(
        events, user_col, value_col, F.col(type_col) == metric_type
    )
    val = um.groupBy("m").agg(
        F.count(F.lit(1)).alias("_t"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("_t1"),
    )
    w_cum = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # cum feeds BOTH the tot fold and the gap aggregate: persist the
    # value-grain frame or pay the fact scan twice (r13 review)
    cum = pooled_persist(val.select(
        "_t",
        F.sum("_t1").over(w_cum).alias("_c1"),
        F.sum(F.col("_t") - F.col("_t1")).over(w_cum).alias("_c0"),
    ))
    tot = cum.agg(
        F.max("_c0").alias("n0"),
        F.max("_c1").alias("n1"),
    )
    joined = cum.crossJoin(F.broadcast(tot))
    # try_divide: an empty parity arm (n0 or n1 = 0) must degrade to
    # NULL like the DuckDB twin (x/0 -> NULL), not raise ANSI
    # DIVIDE_BY_ZERO (r13 ADVICE)
    gap = (
        F.try_divide(F.col("_c0"), F.col("n0"))
        - F.try_divide(F.col("_c1"), F.col("n1"))
    )
    comb = joined.agg(
        F.first("n0").alias("n0"),
        F.first("n1").alias("n1"),
        F.sum(gap * gap * F.col("_t")).alias("_sum"),
    )
    nn = (F.col("n0") + F.col("n1")).cast("double")
    t_stat = (
        F.col("n0").cast("double") * F.col("n1") / (nn * nn)
    ) * F.col("_sum")
    return comb.select(
        "n0",
        "n1",
        F.round(t_stat, 6).alias("t_stat"),
        (t_stat > 0.461).alias("reject_10"),
        (t_stat > 0.743).alias("reject_05"),
    )


def sql_cramer_von_mises_arms(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of :func:`cramer_von_mises_arms` — same value
    grain, same ECDF-gap integral and critical values."""
    return f"""
    WITH um AS (
        SELECT {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY {user_col}
    ), val AS (
        SELECT m, count(*) AS t,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS t1
        FROM um GROUP BY 1
    ), cum AS (
        SELECT t,
            sum(t1) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS c1,
            sum(t - t1) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS c0
        FROM val
    ), tot AS (
        SELECT CAST(max(c0) AS BIGINT) AS n0,
            CAST(max(c1) AS BIGINT) AS n1
        FROM cum
    ), comb AS (
        SELECT tot.n0, tot.n1,
            sum((c0 / CAST(tot.n0 AS DOUBLE)
                 - c1 / CAST(tot.n1 AS DOUBLE))
                * (c0 / CAST(tot.n0 AS DOUBLE)
                   - c1 / CAST(tot.n1 AS DOUBLE)) * t) AS s
        FROM cum CROSS JOIN tot GROUP BY 1, 2
    ), stat AS (
        SELECT n0, n1,
            (n0 * CAST(n1 AS DOUBLE)
             / ((n0 + n1) * CAST(n0 + n1 AS DOUBLE))) * s AS t_stat
        FROM comb
    )
    SELECT n0, n1, round(t_stat, 6) AS t_stat,
        t_stat > 0.461 AS reject_10, t_stat > 0.743 AS reject_05
    FROM stat
    """


def cliffs_delta_arms(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """Cliff's delta effect size between the parity arms on the
    per-user metric: the probability-of-superiority difference

        delta = (#(x1 > x0) − #(x1 < x0)) / (n1·n0)

    — the EFFECT SIZE the Mann-Whitney p-value needs next to it (a
    tiny delta can be 'significant' at scale; delta says whether it
    matters).  Pair counts come off the value grain: for each distinct
    metric v, arm-1 rows there beat exactly (arm-0 rows strictly
    below v) — one cumulative window, never an n1×n0 pair join.
    Magnitude labels at the conventional |d| cuts .147/.33/.474.
    Returns one row (n0, n1, delta, magnitude), 6dp."""
    um = _user_metric(
        events, user_col, value_col, F.col(type_col) == metric_type
    )
    val = um.groupBy("m").agg(
        F.count(F.lit(1)).alias("_t"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("_t1"),
    ).withColumn("_t0", F.col("_t") - F.col("_t1"))
    w_below = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = val.select(
        "_t1",
        "_t0",
        F.coalesce(F.sum("_t0").over(w_below), F.lit(0)).alias("_c0b"),
        F.coalesce(F.sum("_t1").over(w_below), F.lit(0)).alias("_c1b"),
    )
    comb = cum.agg(
        F.sum("_t0").alias("n0"),
        F.sum("_t1").alias("n1"),
        F.sum(F.col("_t1") * F.col("_c0b")).alias("_gt"),
        F.sum(F.col("_t0") * F.col("_c1b")).alias("_lt"),
    )
    delta = F.try_divide(
        (F.col("_gt") - F.col("_lt")).cast("double"),
        F.col("n0").cast("double") * F.col("n1"),
    )
    mag = (
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
    )
    return comb.select(
        "n0",
        "n1",
        F.round(delta, 6).alias("delta"),
        mag.alias("magnitude"),
    )


def sql_cliffs_delta_arms(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of :func:`cliffs_delta_arms` — same value-grain
    cumulative pair counts and magnitude cuts."""
    return f"""
    WITH um AS (
        SELECT {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY {user_col}
    ), val AS (
        SELECT m, count(*) AS t,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS t1,
            count(*) - sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS t0
        FROM um GROUP BY 1
    ), cum AS (
        SELECT t1, t0,
            coalesce(sum(t0) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) AS c0b,
            coalesce(sum(t1) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) AS c1b
        FROM val
    ), comb AS (
        SELECT CAST(sum(t0) AS BIGINT) AS n0,
            CAST(sum(t1) AS BIGINT) AS n1,
            sum(t1 * c0b) AS gt, sum(t0 * c1b) AS lt
        FROM cum
    ), stat AS (
        SELECT n0, n1,
            (gt - lt) / nullif(CAST(n0 AS DOUBLE) * n1, 0.0) AS delta
        FROM comb
    )
    SELECT n0, n1, round(delta, 6) AS delta,
        CASE WHEN abs(delta) < 0.147 THEN 'negligible'
             WHEN abs(delta) < 0.33 THEN 'small'
             WHEN abs(delta) < 0.474 THEN 'medium'
             ELSE 'large' END AS magnitude
    FROM stat
    """


def hodges_lehmann_shift(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> DataFrame:
    """Hodges-Lehmann location shift between the parity arms: the
    MEDIAN of all n1×n0 pairwise differences m1 − m0 — the robust
    'how much more does arm 1 spend' estimate that pairs with the
    Mann-Whitney test (it inverts it) where the difference of means is
    outlier-hostage and the difference of medians wastes information.

    Never materializes n1×n0 pairs at USER grain: both arms collapse
    to cents-quantized VALUE grain (exact on both engines, the
    rolling-median precedent) and the cross join runs over
    |V1|×|V0| distinct-value pairs with multiplicity weights c1·c0 —
    the weighted median then reads two order statistics off one
    cumulative window (even/odd exact, lower+upper averaged).

    The grid is quadratic at DISTINCT-VALUE grain: safe while values
    are cents-rounded purchase amounts (|V| ~ thousands), hostile if a
    caller feeds a high-cardinality double column.  A cheap probe over
    the persisted user-grain frame enforces
    ``VALUE_PAIR_GRID_BUDGET`` before the cross join and names the
    coarser-quantization fallback in the error (r13 verdict #3, the
    ``containment_pairs`` validate-don't-diverge precedent).
    Returns one row (n0, n1, n_pairs, hl_shift), 2dp (cents)."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    # um feeds v1, v0 AND the n0/n1 counts fold: one user-grain
    # aggregate, persisted, instead of three fact scans (r13 review)
    um = pooled_persist(_user_metric(
        events, user_col, value_col, F.col(type_col) == metric_type
    ))
    cents = F.round(F.col("m") * 100).cast("long")
    card = um.agg(
        F.countDistinct(
            F.when(F.col("arm") == 1, cents)
        ).alias("_k1"),
        F.countDistinct(
            F.when(F.col("arm") == 0, cents)
        ).alias("_k0"),
    ).first()
    grid = int(card["_k1"]) * int(card["_k0"])
    if grid > VALUE_PAIR_GRID_BUDGET:
        raise ValueError(
            "hodges_lehmann_shift: distinct-value pair grid "
            f"{card['_k1']} x {card['_k0']} = {grid} exceeds "
            f"VALUE_PAIR_GRID_BUDGET ({VALUE_PAIR_GRID_BUDGET}). "
            "The pairwise-difference census is quadratic at distinct-"
            "value grain: quantize the metric to a coarser grain "
            "first (e.g. round to whole units or bin into quantile "
            "buckets) so |V1|*|V0| fits the budget."
        )
    v1 = (
        um.filter(F.col("arm") == 1)
        .groupBy(cents.alias("_v1"))
        .agg(F.count(F.lit(1)).alias("_c1"))
    )
    v0 = (
        um.filter(F.col("arm") == 0)
        .groupBy(cents.alias("_v0"))
        .agg(F.count(F.lit(1)).alias("_c0"))
    )
    pairs = (
        v1.crossJoin(v0)
        .groupBy((F.col("_v1") - F.col("_v0")).alias("_d"))
        .agg(F.sum(F.col("_c1") * F.col("_c0")).alias("_w"))
    )
    w_cum = Window.orderBy("_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pooled_persist(pairs.select(
        "_d", F.sum("_w").over(w_cum).alias("_cw")
    ))
    tot = cum.agg(F.max("_cw").alias("_tw"))
    both = cum.crossJoin(F.broadcast(tot))
    lo_rank = F.floor((F.col("_tw") + 1) / 2)
    hi_rank = F.floor(F.col("_tw") / 2) + 1
    picks = both.agg(
        F.min(F.when(F.col("_cw") >= lo_rank, F.col("_d"))).alias("_lo"),
        F.min(F.when(F.col("_cw") >= hi_rank, F.col("_d"))).alias("_hi"),
        F.first("_tw").alias("n_pairs"),
    )
    counts = um.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
    )
    return picks.crossJoin(F.broadcast(counts)).select(
        "n0",
        "n1",
        "n_pairs",
        F.round(
            (F.col("_lo") + F.col("_hi")) / 2.0 / 100.0, 2
        ).alias("hl_shift"),
    )


def sql_hodges_lehmann_shift(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
) -> str:
    """DuckDB replay of :func:`hodges_lehmann_shift` — same cents
    grain, same weighted two-order-statistic median."""
    return f"""
    WITH um AS (
        SELECT {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY {user_col}
    ), v1 AS (
        SELECT CAST(round(m * 100) AS BIGINT) AS v, count(*) AS c
        FROM um WHERE arm = 1 GROUP BY 1
    ), v0 AS (
        SELECT CAST(round(m * 100) AS BIGINT) AS v, count(*) AS c
        FROM um WHERE arm = 0 GROUP BY 1
    ), pairs AS (
        SELECT v1.v - v0.v AS d, sum(v1.c * v0.c) AS w
        FROM v1 CROSS JOIN v0 GROUP BY 1
    ), cum AS (
        SELECT d, sum(w) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS cw
        FROM pairs
    ), tot AS (SELECT max(cw) AS tw FROM cum), picks AS (
        SELECT min(CASE WHEN cw >= floor((tot.tw + 1) / 2)
                        THEN d END) AS lo,
            min(CASE WHEN cw >= floor(tot.tw / 2) + 1
                     THEN d END) AS hi,
            first(tot.tw) AS n_pairs
        FROM cum CROSS JOIN tot
    ), counts AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1
        FROM um
    )
    SELECT n0, n1, CAST(n_pairs AS BIGINT) AS n_pairs,
        round((lo + hi) / 2.0 / 100.0, 2) AS hl_shift
    FROM picks CROSS JOIN counts
    """


# ---------------------------------------------------------------------------
# r13h: robust / exactish / paired-categorical arm tests
# ---------------------------------------------------------------------------


def yuen_trimmed_t(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    trim: float = 0.2,
) -> DataFrame:
    """Yuen's trimmed-mean t-test between the parity arms: Welch on
    20%-trimmed means with winsorized variances — the robust middle
    ground between Welch (outlier-hostage) and Mann-Whitney (ignores
    magnitudes):

        t  = (x̄t1 − x̄t0) / sqrt(d0 + d1)
        dᵢ = s²wᵢ·(nᵢ−1) / (hᵢ·(hᵢ−1)),  hᵢ = nᵢ − 2gᵢ, gᵢ = ⌊trim·nᵢ⌋

    Both the trimmed mean (partial weights where a tied value straddles
    the cut) and the winsorized moments (values clamped to the g+1-th /
    n−g-th order statistics) come EXACTLY off the per-arm value grain
    with cumulative counts — no per-user sort, no approximation.  The
    normal tail approximates the t reference (the repo's Welch
    convention).  Returns one row (n0, n1, h0, h1, tmean0, tmean1,
    t_stat, p_value), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    um = _user_metric(
        events, user_col, value_col, F.col(type_col) == metric_type
    )
    val = pooled_persist(
        um.groupBy("arm", "m").agg(F.count(F.lit(1)).alias("_t"))
    )
    w_cum = (
        Window.partitionBy("arm")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = val.select(
        "arm",
        "m",
        "_t",
        F.sum("_t").over(w_cum).alias("_chi"),
        (F.sum("_t").over(w_cum) - F.col("_t")).alias("_clo"),
    )
    sizes = val.groupBy("arm").agg(F.sum("_t").alias("_n"))
    g = F.floor(F.lit(trim) * F.col("_n")).cast("long")
    both = cum.join(F.broadcast(sizes), "arm").withColumn("_g", g)
    lo_pos = F.col("_g") + 1
    hi_pos = F.col("_n") - F.col("_g")
    # winsor bounds: the value at order-statistic positions g+1 / n-g
    bounds = both.groupBy("arm").agg(
        F.min(
            F.when(F.col("_chi") >= lo_pos, F.col("m"))
        ).alias("_L"),
        F.min(
            F.when(F.col("_chi") >= hi_pos, F.col("m"))
        ).alias("_U"),
    )
    withb = both.join(F.broadcast(bounds), "arm")
    # trimmed mean: positions strictly inside (g, n-g]
    overlap = F.greatest(
        F.least(F.col("_chi"), hi_pos)
        - F.greatest(F.col("_clo"), F.col("_g")),
        F.lit(0),
    ).cast("double")
    wins_val = F.least(
        F.greatest(F.col("m"), F.col("_L")), F.col("_U")
    )
    per_arm = withb.groupBy("arm").agg(
        F.first("_n").alias("n"),
        F.first("_g").alias("g"),
        F.sum(overlap * F.col("m")).alias("_ts"),
        F.sum(F.col("_t") * wins_val).alias("_ws"),
        F.sum(F.col("_t") * wins_val * wins_val).alias("_wss"),
    )
    h = (F.col("n") - 2 * F.col("g")).cast("double")
    nn = F.col("n").cast("double")
    tmean = F.col("_ts") / h
    wmean = F.col("_ws") / nn
    # try_divide: a single-user arm (n = 1) must degrade like the
    # DuckDB twin (x/0 -> NULL, greatest(NULL,0) -> 0, then the
    # h*(h-1) denominator restores NULL), not raise ANSI
    # DIVIDE_BY_ZERO (r13 ADVICE)
    swv = F.greatest(
        F.try_divide(F.col("_wss") - nn * wmean * wmean, nn - 1.0),
        F.lit(0.0),
    )
    d = F.try_divide(swv * (nn - 1.0), h * (h - 1.0))
    arms = per_arm.select(
        "arm",
        F.col("n"),
        h.cast("long").alias("h"),
        tmean.alias("_tm"),
        d.alias("_d"),
    )
    a0 = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("h").alias("h0"),
        F.col("_tm").alias("tm0"), F.col("_d").alias("d0"),
    )
    a1 = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("h").alias("h1"),
        F.col("_tm").alias("tm1"), F.col("_d").alias("d1"),
    )
    comb = a0.crossJoin(a1)
    t_stat = F.try_divide(
        F.col("tm1") - F.col("tm0"),
        F.sqrt(F.col("d0") + F.col("d1")),
    )
    out = comb.withColumn("_az", F.abs(t_stat))
    return out.select(
        "n0",
        "n1",
        "h0",
        "h1",
        F.round("tm0", 6).alias("tmean0"),
        F.round("tm1", 6).alias("tmean1"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_yuen_trimmed_t(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    trim: float = 0.2,
) -> str:
    """DuckDB replay of :func:`yuen_trimmed_t` — same value grain,
    order-statistic bounds, partial-weight trim and winsorized
    moments."""
    return f"""
    WITH um AS (
        SELECT {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY {user_col}
    ), val AS (
        SELECT arm, m, count(*) AS t FROM um GROUP BY 1, 2
    ), cum AS (
        SELECT arm, m, t,
            sum(t) OVER (PARTITION BY arm ORDER BY m ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) AS chi,
            sum(t) OVER (PARTITION BY arm ORDER BY m ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) - t AS clo
        FROM val
    ), sizes AS (
        SELECT arm, sum(t) AS n,
            CAST(floor({trim!r} * sum(t)) AS BIGINT) AS g
        FROM val GROUP BY 1
    ), bounds AS (
        SELECT c.arm,
            min(CASE WHEN c.chi >= s.g + 1 THEN c.m END) AS L,
            min(CASE WHEN c.chi >= s.n - s.g THEN c.m END) AS U
        FROM cum c JOIN sizes s ON c.arm = s.arm
        GROUP BY 1
    ), per_arm AS (
        SELECT c.arm, first(s.n) AS n, first(s.g) AS g,
            sum(greatest(least(c.chi, s.n - s.g)
                - greatest(c.clo, s.g), 0) * c.m) AS ts,
            sum(c.t * least(greatest(c.m, b.L), b.U)) AS ws,
            sum(c.t * least(greatest(c.m, b.L), b.U)
                    * least(greatest(c.m, b.L), b.U)) AS wss
        FROM cum c
        JOIN sizes s ON c.arm = s.arm
        JOIN bounds b ON c.arm = b.arm
        GROUP BY 1
    ), arms AS (
        SELECT arm, n, n - 2 * g AS h,
            ts / CAST(n - 2 * g AS DOUBLE) AS tm,
            greatest((wss - n * (ws / CAST(n AS DOUBLE))
                             * (ws / CAST(n AS DOUBLE)))
                     / (n - 1.0), 0.0)
                * (n - 1.0)
                / nullif(CAST(n - 2 * g AS DOUBLE)
                         * (n - 2 * g - 1.0), 0.0) AS d
        FROM per_arm
    ), comb AS (
        SELECT
            CAST(a0.n AS BIGINT) AS n0, CAST(a1.n AS BIGINT) AS n1,
            CAST(a0.h AS BIGINT) AS h0, CAST(a1.h AS BIGINT) AS h1,
            a0.tm AS tm0, a1.tm AS tm1,
            (a1.tm - a0.tm) / nullif(sqrt(a0.d + a1.d), 0.0) AS t_stat
        FROM (SELECT * FROM arms WHERE arm = 0) a0
        CROSS JOIN (SELECT * FROM arms WHERE arm = 1) a1
    )
    SELECT n0, n1, h0, h1, round(tm0, 6) AS tmean0,
        round(tm1, 6) AS tmean1, round(t_stat, 6) AS t_stat,
        round(2.0 * {_phi_upper_sql('abs(t_stat)')}, 6) AS p_value
    FROM comb
    """


def permutation_test_mean(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    n_perms: int = 200,
) -> DataFrame:
    """Seeded permutation test of the arm mean difference: re-assign
    every user to a pseudo-arm by the parity of md5(user || '_' || b)
    for b = 1..``n_perms`` (the SAME hex arithmetic on both engines —
    fully deterministic, no RNG state), recompute the mean gap per
    permutation, and report

        p = (1 + #{|T_b| >= |T_obs|}) / (B + 1)

    — the assumption-free significance readout that stays valid when
    neither normality (Welch) nor pure rank information (MW) is the
    right model.  Plan: ONE user-grain fold, then a (users × B)
    broadcast-grid aggregate with map-side partials (B bounded;
    sufficient statistics per permutation are 4 doubles).  Returns one
    row (n_users, t_obs, n_extreme, p_value), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    um = pooled_persist(
        _user_metric(
            events, user_col, value_col, F.col(type_col) == metric_type
        )
    )
    obs = um.agg(
        F.count(F.lit(1)).alias("n_users"),
        (
            F.avg(F.when(F.col("arm") == 1, F.col("m")))
            - F.avg(F.when(F.col("arm") == 0, F.col("m")))
        ).alias("t_obs"),
    )
    spark = events.sparkSession
    grid = spark.range(1, n_perms + 1).select(
        F.col("id").cast("int").alias("b")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("user").cast("string"), F.lit("_"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    perms = (
        um.crossJoin(F.broadcast(grid))
        .select("b", "m", (h % 2 == 1).alias("_p1"))
        .groupBy("b")
        .agg(
            (
                F.avg(F.when(F.col("_p1"), F.col("m")))
                - F.avg(F.when(~F.col("_p1"), F.col("m")))
            ).alias("_tb")
        )
    )
    folded = perms.crossJoin(F.broadcast(obs)).agg(
        F.first("n_users").alias("n_users"),
        F.round(F.first("t_obs"), 6).alias("t_obs"),
        F.sum(
            # 6dp-rounded comparands: raw-double gaps differ across
            # engines/partition orders at the last ulp, and an exact
            # rational tie (cents-lattice metric sums) would flip the
            # >= on one engine only (r13 second review; the
            # _trade_edges_filtered banding convention)
            F.when(
                F.round(F.abs(F.col("_tb")), 6)
                >= F.round(F.abs(F.col("t_obs")), 6),
                1,
            ).otherwise(0)
        ).alias("n_extreme"),
    )
    return folded.select(
        "n_users",
        "t_obs",
        "n_extreme",
        F.round(
            (F.col("n_extreme") + 1.0) / (n_perms + 1.0), 6
        ).alias("p_value"),
    )


def sql_permutation_test_mean(
    table: str = "events",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    n_perms: int = 200,
) -> str:
    """DuckDB replay of :func:`permutation_test_mean` — same md5
    pseudo-arms, same extreme-count estimator."""
    return f"""
    WITH um AS (
        SELECT {user_col} AS u, {user_col} % 2 AS arm,
            coalesce(sum(CASE WHEN {type_col} = '{metric_type}'
                              THEN {value_col} END), 0.0) AS m
        FROM {table} GROUP BY 1, 2
    ), obs AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
            avg(CASE WHEN arm = 1 THEN m END)
            - avg(CASE WHEN arm = 0 THEN m END) AS t_obs
        FROM um
    ), perms AS (
        SELECT b.b,
            avg(CASE WHEN CAST(('0x' || substr(md5(u || '_' || b.b), 1, 8))
                          AS UBIGINT) % 2 = 1 THEN m END)
            - avg(CASE WHEN CAST(('0x' || substr(md5(u || '_' || b.b), 1, 8))
                            AS UBIGINT) % 2 = 0 THEN m END) AS tb
        FROM um CROSS JOIN (
            SELECT unnest(generate_series(1, {n_perms})) AS b) b
        GROUP BY 1
    ), folded AS (
        SELECT first(obs.n_users) AS n_users,
            round(first(obs.t_obs), 6) AS t_obs,
            CAST(sum(CASE WHEN round(abs(tb), 6) >= round(abs(obs.t_obs), 6)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        FROM perms CROSS JOIN obs
    )
    SELECT n_users, t_obs, n_extreme,
        round((n_extreme + 1.0) / ({n_perms} + 1.0), 6) AS p_value
    FROM folded
    """


def cochran_q_periods(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    k: int = 3,
) -> DataFrame:
    """Cochran's Q on PAIRED per-user conversion across ``k`` equal
    time slices of the observation window — the k-period extension of
    :func:`mcnemar_conversion_shift` (did the population's propensity
    move ANYWHERE across the periods, each user their own control):

        Q = k(k−1)·Σ_j (C_j − C̄)² / (k·ΣR_i − ΣR_i²)

    (C_j = period column totals, R_i = per-user row totals; users with
    R_i = 0 or k drop out of the denominator naturally).  For k = 3
    the chi-square(2) tail is CLOSED-FORM: p = exp(−Q/2).  Plan: one
    fact pass to (user, period) flags via integer slice arithmetic on
    epoch micros, a user-grain fold, a one-row combine.  NULL-ts rows
    are filtered on both engines (the McNemar r13 parity rule).
    Returns one row (n_users, c1..ck as a joined string, q_stat,
    p_value), 6dp."""
    if k != 3:
        raise ValueError("closed-form chi2 tail shipped for k=3 only")
    span = events.filter(F.col(ts_col).isNotNull()).agg(
        F.min(F.unix_micros(ts_col)).alias("_lo"),
        (F.max(F.unix_micros(ts_col)) + 1).alias("_hi"),
    )
    base = events.filter(F.col(ts_col).isNotNull()).crossJoin(
        F.broadcast(span)
    )
    slice_i = F.least(
        F.floor(
            (F.unix_micros(F.col(ts_col)) - F.col("_lo"))
            * k
            / (F.col("_hi") - F.col("_lo"))
        ).cast("int"),
        F.lit(k - 1),
    )
    conv = F.col(type_col) == metric_type
    per_user = base.groupBy(F.col(user_col).alias("u")).agg(
        *[
            F.max(
                F.when(conv & (slice_i == j), 1).otherwise(0)
            ).alias(f"_x{j}")
            for j in range(k)
        ]
    )
    r = sum(F.col(f"_x{j}") for j in range(k))
    comb = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        *[F.sum(f"_x{j}").alias(f"c{j + 1}") for j in range(k)],
        F.sum(r).alias("_sr"),
        F.sum(r * r).alias("_sr2"),
    )
    cbar = F.col("_sr").cast("double") / k
    num = sum(
        (F.col(f"c{j + 1}") - cbar) * (F.col(f"c{j + 1}") - cbar)
        for j in range(k)
    )
    q = F.try_divide(
        F.lit(float(k * (k - 1))) * num,
        (k * F.col("_sr") - F.col("_sr2")).cast("double"),
    )
    return comb.select(
        "n_users",
        *[f"c{j + 1}" for j in range(k)],
        F.round(q, 6).alias("q_stat"),
        F.round(F.exp(-q / 2.0), 6).alias("p_value"),
    )


def sql_cochran_q_periods(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    k: int = 3,
) -> str:
    """DuckDB replay of :func:`cochran_q_periods` — same integer slice
    arithmetic, same closed-form chi2(2) tail."""
    if k != 3:  # the Spark twin raises too: exp(-q/2) is the df=2 tail
        raise ValueError("closed-form chi2 tail shipped for k=3 only")
    xs = ", ".join(
        f"max(CASE WHEN {type_col} = '{metric_type}' AND "
        f"least(CAST(floor((epoch_us({ts_col}) - sp.lo) * {k}"
        f" / CAST(sp.hi - sp.lo AS DOUBLE)) AS INT), {k - 1}) = {j}"
        f" THEN 1 ELSE 0 END) AS x{j}"
        for j in range(k)
    )
    cs = ", ".join(
        f"CAST(sum(x{j}) AS BIGINT) AS c{j + 1}" for j in range(k)
    )
    r = " + ".join(f"x{j}" for j in range(k))
    num = " + ".join(
        f"(c{j + 1} - sr / {float(k)!r}) * (c{j + 1} - sr / {float(k)!r})"
        for j in range(k)
    )
    c_cols = ", ".join(f"c{j + 1}" for j in range(k))
    return f"""
    WITH sp AS (
        SELECT min(epoch_us({ts_col})) AS lo,
            max(epoch_us({ts_col})) + 1 AS hi
        FROM {table} WHERE {ts_col} IS NOT NULL
    ), per_user AS (
        SELECT {user_col} AS u, {xs}
        FROM {table} CROSS JOIN sp
        WHERE {ts_col} IS NOT NULL
        GROUP BY 1
    ), comb AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users, {cs},
            sum({r}) AS sr,
            sum(({r}) * ({r})) AS sr2
        FROM per_user
    ), stat AS (
        SELECT n_users, {c_cols},
            {float(k * (k - 1))!r} * ({num})
                / nullif(CAST({k} * sr - sr2 AS DOUBLE), 0.0) AS q
        FROM comb
    )
    SELECT n_users, {c_cols}, round(q, 6) AS q_stat,
        round(exp(-q / 2.0), 6) AS p_value
    FROM stat
    """


def cochran_armitage_trend(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    max_stratum: int = 5,
) -> DataFrame:
    """Cochran-Armitage trend test: does per-user conversion rise (or
    fall) MONOTONICALLY with the ordered activity tier (the log2
    stratum) — the dose-response question a plain r×2 chi-square
    wastes power on by ignoring the ordering:

        T = Σ s_i·(a_i − n_i·p̄),   s_i = tier score (0..max)
        z = T / sqrt(p̄(1−p̄)·(Σ s_i²n_i − (Σ s_i n_i)²/n))

    Plan: one user-grain fold (tier, converted), a tier-grain pivot,
    a one-row combine.  Returns one row (n_users, n_tiers, t_stat, z,
    p_value), 6dp."""
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        user_activity_tier(max_stratum).alias("_s"),
        F.max(
            (F.col(type_col) == metric_type).cast("int")
        ).alias("_conv"),
    )
    tiers = per_user.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_conv").alias("_a")
    )
    s = F.col("_s").cast("double")
    comb = tiers.agg(
        F.sum("_n").alias("n_users"),
        F.count(F.lit(1)).alias("n_tiers"),
        F.sum("_a").alias("_A"),
        F.sum(s * F.col("_a")).alias("_sa"),
        F.sum(s * F.col("_n")).alias("_sn"),
        F.sum(s * s * F.col("_n")).alias("_ssn"),
    )
    n = F.col("n_users").cast("double")
    p = F.col("_A") / n
    t = F.col("_sa") - p * F.col("_sn")
    var = p * (1.0 - p) * (
        F.col("_ssn") - F.col("_sn") * F.col("_sn") / n
    )
    z = F.try_divide(t, F.sqrt(F.greatest(var, F.lit(0.0))))
    out = comb.withColumn("_az", F.abs(z))
    return out.select(
        "n_users",
        "n_tiers",
        F.round(t, 6).alias("t_stat"),
        F.round(z, 6).alias("z"),
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_cochran_armitage_trend(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    max_stratum: int = 5,
) -> str:
    """DuckDB replay of :func:`cochran_armitage_trend`."""
    return f"""
    WITH per_user AS (
        SELECT {sql_user_activity_tier(max_stratum)} AS s,
            max(CASE WHEN {type_col} = '{metric_type}'
                     THEN 1 ELSE 0 END) AS conv
        FROM {table} GROUP BY {user_col}
    ), tiers AS (
        SELECT s, count(*) AS n, sum(conv) AS a
        FROM per_user GROUP BY 1
    ), comb AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_users,
            count(*) AS n_tiers,
            sum(a) AS A, sum(s * a) AS sa, sum(s * n) AS sn,
            sum(CAST(s AS DOUBLE) * s * n) AS ssn
        FROM tiers
    ), stat AS (
        SELECT n_users, n_tiers,
            sa - (A / CAST(n_users AS DOUBLE)) * sn AS t,
            (sa - (A / CAST(n_users AS DOUBLE)) * sn)
            / nullif(sqrt(greatest(
                (A / CAST(n_users AS DOUBLE))
                * (1.0 - A / CAST(n_users AS DOUBLE))
                * (ssn - sn * CAST(sn AS DOUBLE) / n_users), 0.0)),
                0.0) AS z
        FROM comb
    )
    SELECT n_users, n_tiers, round(t, 6) AS t_stat, round(z, 6) AS z,
        round(2.0 * {_phi_upper_sql('abs(z)')}, 6) AS p_value
    FROM stat
    """
