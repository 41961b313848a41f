"""Statistical / ML-lite operators over the event and document tables:
closed-form OLS trends, autocorrelation, entropy, concentration (Gini),
robust outliers (MAD), volatility bands, robust slopes (Theil-Sen), and
rolling medians.

Not in the reference (no statistics surface there); first-class for a
training-data engine — drift trends, inequality-of-contribution audits,
robust anomaly gates. Every operator is oracle-paired: closed-form
sufficient-statistic formulations (sums, counts) so both engines compute
the same arithmetic from exact integer/float folds, divisions last,
rounded at 6dp.

100 TB posture: every operator here is one or two grouped aggregates
over narrow columns — sufficient statistics (n, Σx, Σy, Σxx, Σxy, Σyy)
are map-side combinable, so the shuffle carries one row per group. The
deliberately global shapes (Gini's rank, Theil-Sen's pairwise slopes)
operate on GROUP-SIZED frames (per-user totals, daily counts) and say so
in their docstrings; their raw-stream variants would need the binned /
sampled formulations noted there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def _calendar_fill(counts: DataFrame, fill_cols: list[str]) -> DataFrame:
    """THE calendar spine (single definition — r10 second review pass
    factored it out of its second inline copy): given a per-date frame
    (d, *fill_cols), fill every day in [min(d), max(d)] with the
    ``fill_cols`` coalesced to 0 — missing days are genuine zero
    observations. The per-date ``counts`` frame feeds BOTH the bounds
    aggregate and the spine join, so it is pooled-persisted here: the
    upstream fact aggregate runs once, not per branch."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    counts = pooled_persist(counts)
    bounds = counts.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    return cal.join(counts, "d", "left").select(
        "d", *[F.coalesce(c, F.lit(0)).alias(c) for c in fill_cols]
    )


def _daily_series(df: DataFrame, ts_col: str) -> DataFrame:
    """Shared calendar-spined daily-count series (d, c): one date
    aggregate off the raw stream, then the single spine definition
    (:func:`_calendar_fill`) — missing days are genuine zero
    observations (the seasonal_decompose contract). Single definition
    for every daily-series operator so spine semantics cannot drift."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _calendar_fill(daily, ["c"])


def _sql_calendar_fill(src: str, out: str, fill_cols: list[str]) -> str:
    """DuckDB twin of :func:`_calendar_fill` — emits the ``cal`` +
    ``{out}`` CTE bodies over a per-date CTE ``src`` (d, *fill_cols);
    single spine definition on the SQL side too."""
    filled = ", ".join(
        f"coalesce({src}.{c}, 0) AS {c}" for c in fill_cols
    )
    return f"""cal AS (
        SELECT unnest(generate_series(min(d), max(d),
                                      INTERVAL 1 DAY))::DATE AS d
        FROM {src}
    ), {out} AS (
        SELECT cal.d, {filled}
        FROM cal LEFT JOIN {src} ON cal.d = {src}.d
    )"""


def _sql_daily_series(table: str, ts_col: str, where: str) -> str:
    """The DuckDB CTE replay of :func:`_daily_series` — emits the
    ``daily``/``cal``/``series`` CTE bodies (caller wraps in WITH)."""
    return f"""daily AS (
        SELECT CAST({ts_col} AS DATE) AS d, count(*) AS c
        FROM {table} WHERE ({where}) AND {ts_col} IS NOT NULL GROUP BY 1
    ), {_sql_calendar_fill('daily', 'series', ['c'])}"""


def ols_trend_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    min_n: int = 3,
) -> DataFrame:
    """Per-key ordinary-least-squares trend of ``value`` against event
    DAY (days since epoch): slope, intercept, r2, n. Closed form from
    the six sufficient statistics — one grouped aggregate, map-side
    combinable, one shuffle row per key; no per-key sort.

    slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), intercept = (Σy − b·Σx)/n,
    r² = (n·Σxy − Σx·Σy)² / ((n·Σxx − Σx²)(n·Σyy − Σy²)); degenerate
    denominators (constant x or y) yield NULL via nullif — the same
    contract the covar/nullif corr pattern uses (ANSI corr divides
    internally). Keys with fewer than ``min_n`` points are dropped."""
    x = F.datediff(F.to_date(ts_col), F.lit(_EPOCH)).cast("double")
    y = F.col(value_col)
    agg = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("_sx"),
            F.sum(y).alias("_sy"),
            F.sum(x * x).alias("_sxx"),
            F.sum(x * y).alias("_sxy"),
            F.sum(y * y).alias("_syy"),
        )
        .filter(F.col("n") >= min_n)
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx_n = nd * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary_n = nd * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = cov_n / F.nullif(varx_n, F.lit(0.0))
    intercept = (F.col("_sy") - slope * F.col("_sx")) / nd
    r2 = (cov_n * cov_n) / F.nullif(varx_n * vary_n, F.lit(0.0))
    return agg.select(
        "key",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def sql_ols_trend_by_key(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    min_n: int = 3,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``ols_trend_by_key`` (same sufficient-statistic
    arithmetic, same nullif degeneracy contract)."""
    return f"""
    WITH s AS (
        SELECT {key_col} AS key,
            count(*) AS n,
            sum(x) AS sx, sum(y) AS sy,
            sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM (
            SELECT {key_col},
                CAST(datediff('day', DATE '{_EPOCH}', CAST({ts_col} AS DATE))
                     AS DOUBLE) AS x,
                {value_col} AS y
            FROM {table}
            WHERE ({where}) AND {value_col} IS NOT NULL
                AND {ts_col} IS NOT NULL
        ) GROUP BY 1 HAVING count(*) >= {min_n}
    )
    SELECT key, n,
        round((CAST(n AS DOUBLE) * sxy - sx * sy)
              / nullif(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0), 6) AS slope,
        round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                    / nullif(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0) * sx)
              / CAST(n AS DOUBLE), 6) AS intercept,
        round(((CAST(n AS DOUBLE) * sxy - sx * sy)
               * (CAST(n AS DOUBLE) * sxy - sx * sy))
              / nullif((CAST(n AS DOUBLE) * sxx - sx * sx)
                       * (CAST(n AS DOUBLE) * syy - sy * sy), 0.0), 6) AS r2
    FROM s
    """


def autocorr_daily_counts(
    df: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 3,
) -> DataFrame:
    """Autocorrelation of the DAILY event-count series at lags
    1..``max_lag`` — the seasonality probe (a weekly cycle shows as a
    lag-7 peak). The series is integer counts on a calendar spine
    (missing days are genuine zeros, the seasonal_decompose contract),
    so the sufficient statistics are EXACT integers; divisions happen
    once at the end.

    acf_k = (n·Σ x_t·x_{{t-k}} − Σx_t·Σx_{{t-k}})
            / sqrt((n·Σx_t² − (Σx_t)²) · (n·Σx_{{t-k}}² − (Σx_{{t-k}})²))
    over the n = N−k aligned pairs (the statistics are computed on each
    window's own margin, the textbook sample-ACF-of-pairs form).

    Scale: the daily series is calendar-sized regardless of event count
    — one date aggregate off the raw stream, then lag arithmetic on the
    tiny spine."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    # the calendar-sized series feeds ALL max_lag legs of the union —
    # persisted so the raw-stream date aggregate runs once, not per leg
    series = pooled_persist(_daily_series(df, ts_col))
    w = Window.orderBy("d")
    out = None
    for k in range(1, max_lag + 1):
        lagged = series.select(
            "c", F.lag("c", k).over(w).alias("p")
        ).filter(F.col("p").isNotNull())
        nd = F.count(F.lit(1)).cast("double")
        sx = F.sum("c").cast("double")
        sp = F.sum("p").cast("double")
        sxx = F.sum(F.col("c") * F.col("c")).cast("double")
        spp = F.sum(F.col("p") * F.col("p")).cast("double")
        sxp = F.sum(F.col("c") * F.col("p")).cast("double")
        acf = (nd * sxp - sx * sp) / F.sqrt(
            (nd * sxx - sx * sx) * (nd * spp - sp * sp)
        )
        row = lagged.agg(
            F.lit(k).alias("lag"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(acf, 6).alias("acf"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def sql_autocorr_daily_counts(
    table: str = "events",
    ts_col: str = "ts",
    max_lag: int = 3,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``autocorr_daily_counts`` (same calendar spine,
    same per-lag pair statistics; window sums are integer-exact on both
    engines — counts are BIGINT, no HUGEINT drift because the division
    casts to DOUBLE explicitly)."""
    legs = []
    for k in range(1, max_lag + 1):
        legs.append(f"""
        SELECT {k} AS lag, count(*) AS n_pairs,
            round((CAST(count(*) AS DOUBLE) * sum(c * p)
                   - CAST(sum(c) AS DOUBLE) * sum(p))
                  / sqrt((CAST(count(*) AS DOUBLE) * sum(c * c)
                          - CAST(sum(c) AS DOUBLE) * sum(c))
                         * (CAST(count(*) AS DOUBLE) * sum(p * p)
                            - CAST(sum(p) AS DOUBLE) * sum(p))), 6) AS acf
        FROM (
            SELECT c, lag(c, {k}) OVER (ORDER BY d) AS p FROM series
        ) WHERE p IS NOT NULL""")
    union = "\n        UNION ALL\n".join(legs)
    return f"""
    WITH {_sql_daily_series(table, ts_col, where)}
    {union}
    """


def entropy_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    cat_col: str = "event_type",
) -> DataFrame:
    """Shannon entropy (bits) of each key's categorical distribution —
    the behavioral-diversity / feature-informativeness probe. Two
    grouped integer aggregates (key×category counts, then the per-key
    fold); p·log2(p) terms are summed per key in category order
    (deterministic ascending category) so both engines add the same
    doubles in the same order."""
    counts = (
        df.filter(F.col(cat_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"), F.col(cat_col).alias("cat"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = Window.partitionBy("key")
    p = F.col("c").cast("double") / F.sum("c").over(tot).cast("double")
    terms = counts.select(
        "key",
        "cat",
        (-p * F.log2(p)).alias("_term"),
        F.col("c"),
    )
    # ordered fold: sort_array over (cat, term) structs fixes the
    # float-addition order identically on both engines
    return (
        terms.groupBy("key")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_cats"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("cat", "_term"))
                        ),
                        lambda s: s["_term"],
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ),
                6,
            ).alias("entropy_bits"),
        )
    )


def sql_entropy_by_key(
    table: str = "events",
    key_col: str = "user_id",
    cat_col: str = "event_type",
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``entropy_by_key``: same category-ordered float
    fold (list_sort by category, then left-to-right sum seeded 0.0 so
    the addition order matches Spark's aggregate HOF exactly;
    list_reduce would seed with the FIRST element — the documented
    trap)."""
    return f"""
    WITH counts AS (
        SELECT {key_col} AS key, {cat_col} AS cat, count(*) AS c
        FROM {table} WHERE ({where}) AND {cat_col} IS NOT NULL
        GROUP BY 1, 2
    ), terms AS (
        SELECT key, cat, c,
            -(CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY key)
                                       AS DOUBLE))
            * log2(CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY key)
                                            AS DOUBLE)) AS term
        FROM counts
    )
    SELECT key, CAST(sum(c) AS BIGINT) AS n,
        count(*) AS n_cats,
        round(list_reduce(
            list_prepend(0.0, list(term ORDER BY cat)),
            (acc, t) -> acc + t), 6) AS entropy_bits
    FROM terms GROUP BY key
    """


def gini_concentration(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gini coefficient of per-key value totals — the
    contribution-inequality audit (is 1% of users generating 90% of
    spend? is one source dominating the corpus?). One row out.

    G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n with x ascending (ties broken by
    key for a deterministic rank). The rank runs over the KEY-GRAIN
    totals table (one row per key), not the raw stream — fine up to
    ~10⁸ keys on a real cluster; past that, the binned (quantile-
    bucketed) estimator is the stated alternative."""
    totals = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.sum(value_col).alias("x"))
    )
    w = Window.orderBy(F.col("x"), F.col("key"))
    ranked = totals.select(
        "x", F.row_number().over(w).cast("double").alias("i")
    )
    nd = F.count(F.lit(1)).cast("double")
    g = (F.lit(2.0) * F.sum(F.col("i") * F.col("x"))) / (
        nd * F.sum("x")
    ) - (nd + F.lit(1.0)) / nd
    return ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.sum("x"), 4).alias("total_value"),
        F.round(g, 6).alias("gini"),
    )


def sql_gini_concentration(
    table: str = "events",
    key_col: str = "user_id",
    value_col: str = "value",
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``gini_concentration`` (same ascending
    (total, key) rank, same closed form)."""
    return f"""
    WITH totals AS (
        SELECT {key_col} AS key, sum({value_col}) AS x
        FROM {table} WHERE ({where}) AND {value_col} IS NOT NULL
        GROUP BY 1
    ), ranked AS (
        SELECT x, CAST(row_number() OVER (ORDER BY x, key) AS DOUBLE) AS i
        FROM totals
    )
    SELECT count(*) AS n_keys,
        round(sum(x), 4) AS total_value,
        round((2.0 * sum(i * x)) / (CAST(count(*) AS DOUBLE) * sum(x))
              - (CAST(count(*) AS DOUBLE) + 1.0)
                / CAST(count(*) AS DOUBLE), 6) AS gini
    FROM ranked
    """


def mad_outliers_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier audit per group: median, MAD (median absolute
    deviation), and the count of points outside
    median ± k·1.4826·MAD — the anomaly gate that, unlike z-scores,
    doesn't let the outliers inflate their own threshold.

    VALUES ARE CENTS-EXACT: medians interpolate between order
    statistics, and double interpolation arithmetic is not guaranteed
    bit-identical across engines — so the operator rounds values to
    integer cents first (the documented integer-rendering pattern) and
    divides back at the end. Two grouped exact-percentile aggregates
    (group-median, then deviation-median) + one count: three shuffles
    of the group column, each map-side combinable."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"), cents.alias("v")
    )
    med = base.groupBy("grp").agg(
        F.percentile("v", F.lit(0.5)).alias("_med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = (
        base.join(med, "grp")
        .select("grp", F.abs(F.col("v") - F.col("_med")).alias("_adev"))
        .groupBy("grp")
        .agg(F.percentile("_adev", F.lit(0.5)).alias("_mad"))
    )
    flagged = (
        base.join(med, "grp")
        .join(dev, "grp")
        .select(
            "grp",
            (
                F.abs(F.col("v") - F.col("_med"))
                > F.lit(float(k) * 1.4826) * F.col("_mad")
            ).alias("_out"),
        )
        .groupBy("grp")
        .agg(F.sum(F.when(F.col("_out"), 1).otherwise(0)).alias("n_outliers"))
    )
    return (
        med.join(dev, "grp")
        .join(flagged, "grp")
        .select(
            "grp",
            "n",
            F.round(F.col("_med") / 100.0, 6).alias("median_value"),
            F.round(F.col("_mad") / 100.0, 6).alias("mad_value"),
            "n_outliers",
        )
    )


def sql_mad_outliers_by_group(
    table: str = "events",
    group_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.0,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``mad_outliers_by_group`` (same cents
    quantization, same interpolated median — quantile_cont matches
    Spark's percentile on integer inputs because the interpolation is
    between exact integers)."""
    return f"""
    WITH base AS (
        SELECT {group_col} AS grp,
            CAST(round({value_col} * 100) AS BIGINT) AS v
        FROM {table} WHERE ({where}) AND {value_col} IS NOT NULL
    ), med AS (
        SELECT grp, quantile_cont(v, 0.5) AS m, count(*) AS n
        FROM base GROUP BY grp
    ), dev AS (
        SELECT base.grp, quantile_cont(abs(v - m), 0.5) AS mad
        FROM base JOIN med ON base.grp = med.grp GROUP BY base.grp
    ), flags AS (
        SELECT base.grp,
            sum(CASE WHEN abs(v - m) > {float(k) * 1.4826} * mad
                THEN 1 ELSE 0 END) AS n_outliers
        FROM base JOIN med ON base.grp = med.grp
        JOIN dev ON base.grp = dev.grp
        GROUP BY base.grp
    )
    SELECT med.grp, n,
        round(m / 100.0, 6) AS median_value,
        round(mad / 100.0, 6) AS mad_value,
        CAST(n_outliers AS BIGINT) AS n_outliers
    FROM med JOIN dev ON med.grp = dev.grp
    JOIN flags ON med.grp = flags.grp
    """


def bollinger_bands_daily(
    df: DataFrame,
    ts_col: str = "ts",
    window_days: int = 7,
    k: float = 2.0,
) -> DataFrame:
    """Volatility bands over the daily event-count series: mean ±
    k·stddev_samp of the ``window_days`` PRECEDING days (current day
    excluded), plus a breakout flag — the monitoring primitive for
    ingest-rate anomalies. The exclusion is load-bearing: with the
    current row inside its own window, a single spike inflates its own
    σ and can NEVER breach a k=2 band at small windows (for n=3 the
    spike's deviation is 2t/3 against a 1.15t threshold, at any
    magnitude) — the gate would be structurally blind to exactly the
    anomaly it exists for. Days without a full preceding window emit
    NULL bands (no partial-window false positives).

    Variance is computed from integer sums ((Σx², Σx, n) — EXACT — with
    the division last), not the engines' streaming stddev kernels,
    whose compensated accumulations differ in the last ulp."""
    series = _daily_series(df, ts_col)
    w = (
        Window.orderBy("d")
        .rowsBetween(-window_days, -1)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("c").over(w)
    sxx = F.sum(F.col("c") * F.col("c")).over(w)
    nd = n.cast("double")
    mean = sx.cast("double") / nd
    var = (nd * sxx.cast("double") - sx.cast("double") * sx.cast("double")) / (
        nd * (nd - F.lit(1.0))
    )
    sd = F.sqrt(var)
    full = n == window_days
    upper = mean + F.lit(float(k)) * sd
    lower = mean - F.lit(float(k)) * sd
    return series.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "c",
        F.when(full, F.round(mean, 6)).alias("ma"),
        F.when(full, F.round(upper, 6)).alias("upper"),
        F.when(full, F.round(lower, 6)).alias("lower"),
        F.when(
            full,
            (F.col("c").cast("double") > upper)
            | (F.col("c").cast("double") < lower),
        ).alias("breakout"),
    )


def sql_bollinger_bands_daily(
    table: str = "events",
    ts_col: str = "ts",
    window_days: int = 7,
    k: float = 2.0,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``bollinger_bands_daily`` (same calendar spine,
    same PRECEDING-days frame, same integer-sum variance — window sums
    of BIGINT go HUGEINT in
    DuckDB, so they are CAST BIGINT before the double arithmetic, the
    documented trap)."""
    wdef = (
        f"OVER (ORDER BY d ROWS BETWEEN {window_days} PRECEDING "
        "AND 1 PRECEDING)"
    )
    return f"""
    WITH {_sql_daily_series(table, ts_col, where)}, winagg AS (
        SELECT d, c,
            count(*) {wdef} AS n,
            CAST(sum(c) {wdef} AS BIGINT) AS sx,
            CAST(sum(c * c) {wdef} AS BIGINT) AS sxx
        FROM series
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, c,
        CASE WHEN n = {window_days}
             THEN round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
        END AS ma,
        CASE WHEN n = {window_days}
             THEN round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                  + {float(k)} * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
        END AS upper,
        CASE WHEN n = {window_days}
             THEN round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                  - {float(k)} * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
        END AS lower,
        CASE WHEN n = {window_days}
             THEN CAST(c AS DOUBLE) > CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                  + {float(k)} * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                  OR CAST(c AS DOUBLE) < CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                  - {float(k)} * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        END AS breakout
    FROM winagg
    """


def theilsen_daily_trend(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Theil-Sen robust slope of the daily event-count series: the
    MEDIAN of all pairwise slopes (cᵢ−cⱼ)/(dᵢ−dⱼ) — immune to the
    outlier days that wreck the OLS trend. One row out.

    The pairwise self-join runs on the CALENDAR-SIZED daily table
    (n days → n(n−1)/2 pairs — 30 days is 435 rows), never the raw
    stream; for multi-year spines the classic O(n log n) repeated-
    median refinement or a pair-sampled estimate is the stated scale
    path. Slopes are exact rationals (integer count deltas over integer
    day deltas); the median interpolates between them — computed at
    6dp on both engines."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    # both self-join sides read the same calendar-sized series —
    # persisted so the raw-stream date aggregate runs once, not twice
    # (the autocorr pooled_persist precedent, r10 second review pass)
    series = pooled_persist(
        _daily_series(df, ts_col).select(
            F.datediff("d", F.lit(_EPOCH)).alias("x"), "c"
        )
    )
    a = series.alias("a")
    b = series.alias("b")
    pairs = a.join(b, F.col("a.x") < F.col("b.x")).select(
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("s")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile("s", F.lit(0.5)), 6).alias("theilsen_slope"),
    )


def sql_theilsen_daily_trend(
    table: str = "events",
    ts_col: str = "ts",
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``theilsen_daily_trend`` (same pair set, same
    interpolated median over the exact pairwise slopes)."""
    return f"""
    WITH {_sql_daily_series(table, ts_col, where)}, xseries AS (
        SELECT datediff('day', DATE '{_EPOCH}', d) AS x, c FROM series
    ), pairs AS (
        SELECT (CAST(b.c AS DOUBLE) - CAST(a.c AS DOUBLE))
               / (CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) AS s
        FROM xseries a JOIN xseries b ON a.x < b.x
    )
    SELECT count(*) AS n_pairs,
        round(quantile_cont(s, 0.5), 6) AS theilsen_slope
    FROM pairs
    """


def rolling_median_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window_rows: int = 5,
) -> DataFrame:
    """Per-key trailing ``window_rows``-row EXACT rolling median of
    ``value`` — the robust smoother (a rolling mean chases every spike;
    the median doesn't). Values quantize to integer cents first (the
    MAD contract: interpolation between exact integers is engine-
    stable). One key-partitioned window, frame bounded by
    ``window_rows`` — per-row cost is the frame sort, keys parallelize,
    no global sort anywhere."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-(window_rows - 1), 0)
    )
    # ts must be non-null too: it is the window ORDER key, and Spark
    # sorts NULLs FIRST while DuckDB sorts them LAST — frames diverge
    return df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.round(F.percentile(cents, F.lit(0.5)).over(w) / 100.0, 6).alias(
            "rolling_median"
        ),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


def sql_rolling_median_by_key(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window_rows: int = 5,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``rolling_median_by_key`` (same cents
    quantization, same frame)."""
    return f"""
    SELECT {key_col} AS key, {id_col} AS id,
        round(quantile_cont(CAST(round({value_col} * 100) AS BIGINT), 0.5)
              OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
                    ROWS BETWEEN {window_rows - 1} PRECEDING
                    AND CURRENT ROW) / 100.0, 6) AS rolling_median,
        count(*) OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
                       ROWS BETWEEN {window_rows - 1} PRECEDING
                       AND CURRENT ROW) AS n_in_window
    FROM {table} WHERE ({where}) AND {value_col} IS NOT NULL
        AND {ts_col} IS NOT NULL
    """


def _time_to_event_lives(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
) -> DataFrame:
    """Key-grain survival lifetimes (key, t, churned) — the shared
    fold under the grain builder AND the r13 arm-comparison family
    (log-rank, RMST-by-arm): per key, t0 = first ``start_type`` day,
    t = days to the first ``event_type`` ON OR AFTER t0 (churned) or
    to the corpus max date (censored).  One key-grain aggregate with
    map-side partials; see :func:`_time_to_event_grain` for the full
    plan rationale."""
    dated = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("_y"),
        F.to_date(ts_col).alias("d"),
    )
    rel = dated.filter(F.col("_y").isin([start_type, event_type]))
    first_after = (
        rel.groupBy("key")
        .agg(
            F.min(
                F.when(F.col("_y") == start_type, F.col("d"))
            ).alias("_t0"),
            F.collect_set(
                F.when(F.col("_y") == event_type, F.col("d"))
            ).alias("_eds"),
        )
        .filter(F.col("_t0").isNotNull())
        .select(
            "key",
            "_t0",
            F.array_min(
                F.filter("_eds", lambda x: x >= F.col("_t0"))
            ).alias("_conv"),
        )
    )
    maxd = dated.agg(F.max("d").alias("_maxd"))
    return first_after.crossJoin(F.broadcast(maxd)).select(
        "key",
        # cast: Spark datediff is INT, DuckDB's is BIGINT — the driver's
        # pandas canonicalizer is dtype-visible even when the strings
        # agree (r13 driver-sim finding)
        F.when(
            F.col("_conv").isNotNull(), F.datediff("_conv", "_t0")
        )
        .otherwise(F.datediff("_maxd", "_t0"))
        .cast("long")
        .alias("t"),
        F.col("_conv").isNotNull().alias("churned"),
    )


def _sql_time_to_event_lives(
    table: str,
    ts_col: str,
    key_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
) -> str:
    """DuckDB CTE replay of :func:`_time_to_event_lives` — emits the
    ``dated``/``starts``/``first_after``/``lives`` CTE bodies (caller
    wraps in WITH; lives = (key, t, churned)).  Same first-on-or-after
    conversion and max-date censoring as the KM/NA oracles."""
    return f"""dated AS (
        SELECT {key_col} AS key, {type_col} AS y, CAST({ts_col} AS DATE) AS d
        FROM {table} WHERE {ts_col} IS NOT NULL
    ), starts AS (
        SELECT key, min(d) AS t0 FROM dated
        WHERE y = '{start_type}' GROUP BY 1
    ), first_after AS (
        SELECT s.key, s.t0, min(e.d) AS conv
        FROM starts s LEFT JOIN (
            SELECT key, d FROM dated WHERE y = '{event_type}'
        ) e ON s.key = e.key AND e.d >= s.t0
        GROUP BY 1, 2
    ), lives AS (
        SELECT key,
            CAST(CASE WHEN conv IS NOT NULL
                      THEN datediff('day', t0, conv)
                      ELSE datediff('day', t0, (SELECT max(d) FROM dated))
                 END AS BIGINT) AS t,
            conv IS NOT NULL AS churned
        FROM first_after
    )"""


def _time_to_event_grain(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
) -> DataFrame:
    """Shared duration-grain risk-set builder behind BOTH survival
    estimators (Kaplan-Meier product-limit and Nelson-Aalen cumulative
    hazard, r12): per key, t0 = first ``start_type`` day, event = first
    ``event_type`` ON OR AFTER t0, never-converters censored at the
    corpus max date; returns one row per observed duration
    (t, n_events, n_risk) with n_risk the suffix sum of all lifetimes
    >= t.

    Plan (r13 rewrite of the r11/r12 equi+range left join): ONE
    key-grain aggregate over the start/event rows — ``_t0`` as a
    conditional min and the candidate conversion days as a
    ``collect_set`` of event DAYS (bounded by the corpus day count per
    key, not by event volume — map-side partial aggregation dedupes
    before the shuffle), then the on-or-after first conversion is
    ``array_min(filter(days, >= _t0))`` in codegen.  The join
    formulation planned as a BroadcastHashJoin that broadcast the
    FACT-side purchase scan (wrong posture at 100 TB: the small side is
    |users|, but a LeftOuter join can only build right) and read the
    fact table three times; this shape shuffles each key once with
    partial aggregation, reads it twice (grain + corpus max date), and
    keeps a key whose only conversions PRECEDE t0 censored — the array
    filter empties and array_min degrades to NULL, never dropping the
    row (the same contract the join condition used to carry)."""
    lives = _time_to_event_lives(
        df, ts_col, key_col, type_col, start_type, event_type
    )
    grain = lives.groupBy("t").agg(
        F.count(F.lit(1)).alias("_n_all"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("n_events"),
    )
    w_suffix = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return grain.select(
        "t",
        "n_events",
        F.sum("_n_all").over(w_suffix).alias("n_risk"),
    )



def km_survival_expr(d_col, n_col, w_run):
    """The Kaplan-Meier running product S(t) = prod(1 - d/n) as a
    window expression, with the ABSORBING-ZERO guard shared by every
    consumer (KM curve, RMST, the competing-risks any-cause survival,
    r13 review dedup): at a duration where d == n, ln(1 - d/n) is
    undefined (DuckDB errors on ln(0), Spark NULLs it) — a hit-zero
    flag carried through the running window pins survival to exactly
    0.0 from that point on instead.  ``w_run`` must be the running
    (unbounded-preceding..current) window over the duration order."""
    d = d_col.cast("double")
    n = n_col.cast("double")
    ln_term = F.when(
        (d > 0) & (d < n), F.log(F.lit(1.0) - d / n)
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(F.when(d >= n, 1).otherwise(0)).over(w_run)
    return F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(ln_term).over(w_run))
    )


def sql_km_survival(d: str, n: str, order_col: str) -> str:
    """DuckDB twin of :func:`km_survival_expr` — the full CASE
    expression with inline running windows ordered by ``order_col``.
    ``d``/``n`` are SQL expressions (e.g. ``'d_a + d_b'``)."""
    run = (f"OVER (ORDER BY {order_col} ROWS BETWEEN UNBOUNDED "
           "PRECEDING AND CURRENT ROW)")
    return f"""CASE WHEN max(CASE WHEN ({d}) >= ({n}) THEN 1 ELSE 0 END)
                     {run} = 1
                 THEN 0.0
                 ELSE exp(sum(CASE WHEN ({d}) > 0 AND ({d}) < ({n})
                              THEN ln(1.0 - CAST(({d}) AS DOUBLE)
                                             / ({n}))
                              ELSE 0.0 END) {run})
            END"""


def kaplan_meier_survival(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
) -> DataFrame:
    """Kaplan-Meier time-to-event curve: per key, t₀ = first
    ``start_type`` day; the event is the first ``event_type`` ON OR
    AFTER t₀ (duration in days, observed); keys that never convert are
    CENSORED at the corpus max date. S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over
    observed durations tᵢ with nᵢ = keys whose duration ≥ tᵢ — the
    textbook estimator, and the conversion-velocity curve funnels can't
    give you (funnels count, KM says HOW FAST, correcting for users
    still in flight).

    The product is computed as exp(Σ ln(1 − d/n)) with the running sum
    ordered by duration — a window over the DURATION-GRAIN table
    (≤ observation-span rows), so the float op order is pinned on both
    engines. Keys without a start event drop. Output: one row per
    observed duration (duration_days, n_risk, n_events, survival).

    Scale: two filtered min-aggregates per key + one broadcast scalar +
    suffix/running windows on the tiny duration grain; the raw stream
    is scanned once per event class with the type filter pushed to the
    scan."""
    at_risk = _time_to_event_grain(
        df, ts_col, key_col, type_col, start_type, event_type
    )
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = at_risk.select(
        "t",
        "n_risk",
        "n_events",
        F.round(
            km_survival_expr(F.col("n_events"), F.col("n_risk"), w_run),
            6,
        ).alias("survival"),
    )
    return curve.filter(F.col("n_events") > 0).select(
        F.col("t").alias("duration_days"), "n_risk", "n_events", "survival"
    )


def sql_kaplan_meier_survival(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``kaplan_meier_survival`` (same first-on-or-
    after conversion, same censoring, same suffix-sum risk sets and
    exp-of-ln-sum product order)."""
    return f"""
    WITH dated AS (
        SELECT {key_col} AS key, {type_col} AS y, CAST({ts_col} AS DATE) AS d
        FROM {table} WHERE ({where}) AND {ts_col} IS NOT NULL
    ), starts AS (
        SELECT key, min(d) AS t0 FROM dated
        WHERE y = '{start_type}' GROUP BY 1
    ), first_after AS (
        SELECT s.key, s.t0, min(e.d) AS conv
        FROM starts s LEFT JOIN (
            SELECT key, d FROM dated WHERE y = '{event_type}'
        ) e ON s.key = e.key AND e.d >= s.t0
        GROUP BY 1, 2
    ), lives AS (
        SELECT CASE WHEN conv IS NOT NULL
                    THEN datediff('day', t0, conv)
                    ELSE datediff('day', t0, (SELECT max(d) FROM dated))
               END AS t,
            conv IS NOT NULL AS churned
        FROM first_after
    ), grain AS (
        SELECT t, count(*) AS n_all,
            sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_events
        FROM lives GROUP BY 1
    ), at_risk AS (
        SELECT t, n_events,
            CAST(sum(n_all) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        FROM grain
    ), curve AS (
        SELECT t, n_risk, n_events,
            round({sql_km_survival('n_events', 'n_risk', 't')}, 6)
                AS survival
        FROM at_risk
    )
    SELECT t AS duration_days, n_risk, CAST(n_events AS BIGINT) AS n_events,
        survival
    FROM curve WHERE n_events > 0
    """


def nelson_aalen_hazard(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over the
    SAME duration-grain risk sets as :func:`kaplan_meier_survival`
    (shared ``_time_to_event_grain`` builder, r12): the estimator of
    choice when the quantity of interest is the hazard itself — rate
    comparisons, proportional-hazards eyeballing, and the
    log-cumulative-hazard plot whose slope diagnoses Weibull shape —
    where KM's product form obscures the increments.  Also reported:
    the KM-equivalent survival exp(−H) (the Breslow/Fleming-Harrington
    estimator, always ≥ the KM step curve), making the pair directly
    comparable.

    Plain running sum of d/n — no ln(0) absorbing-zero special case
    (d = n contributes d/n = 1, perfectly finite), so the arithmetic
    replays on both engines without the KM mirror's hit-zero flag.

    Scale: identical to KM — per-key min-aggregates, then windows over
    the duration grain (≤ observation-span rows).

    Output: (duration_days, n_risk, n_events, cum_hazard, surv_fh),
    observed-event durations only, 6dp."""
    at_risk = _time_to_event_grain(
        df, ts_col, key_col, type_col, start_type, event_type
    )
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h = F.sum(
        F.col("n_events").cast("double") / F.col("n_risk").cast("double")
    ).over(w_run)
    return (
        at_risk.select(
            "t",
            "n_risk",
            "n_events",
            F.round(h, 6).alias("cum_hazard"),
            F.round(F.exp(-h), 6).alias("surv_fh"),
        )
        .filter(F.col("n_events") > 0)
        .select(
            F.col("t").alias("duration_days"),
            "n_risk",
            "n_events",
            "cum_hazard",
            "surv_fh",
        )
    )


def sql_nelson_aalen_hazard(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``nelson_aalen_hazard`` (same first-on-or-after
    conversion, same censoring, same suffix-sum risk sets, same running
    d/n accumulation order)."""
    return f"""
    WITH dated AS (
        SELECT {key_col} AS key, {type_col} AS y, CAST({ts_col} AS DATE) AS d
        FROM {table} WHERE ({where}) AND {ts_col} IS NOT NULL
    ), starts AS (
        SELECT key, min(d) AS t0 FROM dated
        WHERE y = '{start_type}' GROUP BY 1
    ), first_after AS (
        SELECT s.key, s.t0, min(e.d) AS conv
        FROM starts s LEFT JOIN (
            SELECT key, d FROM dated WHERE y = '{event_type}'
        ) e ON s.key = e.key AND e.d >= s.t0
        GROUP BY 1, 2
    ), lives AS (
        SELECT CASE WHEN conv IS NOT NULL
                    THEN datediff('day', t0, conv)
                    ELSE datediff('day', t0, (SELECT max(d) FROM dated))
               END AS t,
            conv IS NOT NULL AS churned
        FROM first_after
    ), grain AS (
        SELECT t, count(*) AS n_all,
            sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_events
        FROM lives GROUP BY 1
    ), at_risk AS (
        SELECT t, n_events,
            sum(n_all) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS n_risk
        FROM grain
    ), curve AS (
        SELECT t, n_risk, n_events,
            sum(CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS h
        FROM at_risk
    )
    SELECT t AS duration_days, CAST(n_risk AS BIGINT) AS n_risk,
        CAST(n_events AS BIGINT) AS n_events,
        round(h, 6) AS cum_hazard, round(exp(-h), 6) AS surv_fh
    FROM curve WHERE n_events > 0
    """



# ---------------------------------------------------------------------------
# r13b: survival comparison family — log-rank, RMST, competing risks
# ---------------------------------------------------------------------------


def log_rank_arms(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing the time-to-event curves of
    the two parity arms (key % 2) — THE standard answer to "are these
    two survival curves different", which eyeballing the two KM plots
    cannot give you.  At each observed event time t with d_t total
    events, n_t total at risk and n1_t at risk in arm 1:

        O1 = sum d1_t                      (observed arm-1 events)
        E1 = sum d_t * n1_t / n_t          (expected under H0)
        V  = sum d_t * (n1_t/n_t) * (1 - n1_t/n_t) * (n_t - d_t)/(n_t - 1)
        chi2 = (O1 - E1)^2 / V             (1 dof)

    Plan: the shared key-grain lives fold (ONE fact-pass aggregate, the
    r13 joinless shape), then a duration-grain pivot (conditional sums
    per arm) and two suffix windows for the at-risk counts — everything
    past the lives fold is bounded by the observation span.  Ties
    (multiple events on one duration) use the standard hypergeometric
    variance; single-key durations guard n_t - 1 = 0 via try_divide.
    Returns one row (n0, n1, o1, e1, var1, chi2, p_value), 6dp."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    lives = _time_to_event_lives(
        df, ts_col, key_col, type_col, start_type, event_type
    ).select(
        "t", "churned", (F.col("key") % 2 == 1).alias("_arm1")
    )
    grain = lives.groupBy("t").agg(
        F.sum(F.when(F.col("_arm1"), 1).otherwise(0)).alias("all1"),
        F.sum(F.when(~F.col("_arm1"), 1).otherwise(0)).alias("all0"),
        F.sum(
            F.when(F.col("churned") & F.col("_arm1"), 1).otherwise(0)
        ).alias("d1"),
        F.sum(
            F.when(F.col("churned") & ~F.col("_arm1"), 1).otherwise(0)
        ).alias("d0"),
    )
    w_suffix = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = grain.select(
        "t",
        "d0",
        "d1",
        F.sum("all0").over(w_suffix).alias("n0t"),
        F.sum("all1").over(w_suffix).alias("n1t"),
    ).filter((F.col("d0") + F.col("d1")) > 0)
    dt = (F.col("d0") + F.col("d1")).cast("double")
    nt = (F.col("n0t") + F.col("n1t")).cast("double")
    p1 = F.col("n1t") / nt
    # arm sizes come from the LIVES fold, not max(n_at_risk) over
    # event rows: a key censored before the first event duration is in
    # the arm but never in an event row's risk set (r13 review)
    sizes = grain.agg(
        F.sum("all0").alias("n0"), F.sum("all1").alias("n1")
    )
    comb = risk.agg(
        F.sum("d1").alias("o1"),
        F.sum(dt * p1).alias("e1"),
        F.sum(
            F.try_divide(dt * p1 * (1.0 - p1) * (nt - dt), nt - 1.0)
        ).alias("var1"),
    ).crossJoin(F.broadcast(sizes))
    chi2 = F.try_divide(
        (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1")),
        F.col("var1"),
    )
    out = comb.withColumn("_z", F.sqrt(chi2))
    return out.select(
        "n0",
        "n1",
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round("var1", 6).alias("var1"),
        F.round(chi2, 6).alias("chi2"),
        F.round(F.expr("2.0 * " + _phi_upper_sql("_z")), 6).alias(
            "p_value"
        ),
    )


def sql_log_rank_arms(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
) -> str:
    """DuckDB replay of :func:`log_rank_arms` — same lives, same
    duration-grain pivot + suffix risk sets, same hypergeometric
    variance and A&S tail polynomial."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    lives = _sql_time_to_event_lives(
        table, ts_col, key_col, type_col, start_type, event_type
    )
    return f"""
    WITH {lives}, armed AS (
        SELECT t, churned, key % 2 = 1 AS arm1 FROM lives
    ), grain AS (
        SELECT t,
            sum(CASE WHEN arm1 THEN 1 ELSE 0 END) AS all1,
            sum(CASE WHEN NOT arm1 THEN 1 ELSE 0 END) AS all0,
            sum(CASE WHEN churned AND arm1 THEN 1 ELSE 0 END) AS d1,
            sum(CASE WHEN churned AND NOT arm1 THEN 1 ELSE 0 END) AS d0
        FROM armed GROUP BY 1
    ), risk AS (
        SELECT t, d0, d1,
            sum(all0) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS n0t,
            sum(all1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS n1t
        FROM grain
    ), ev AS (SELECT * FROM risk WHERE d0 + d1 > 0), sizes AS (
        SELECT CAST(sum(all0) AS BIGINT) AS n0,
            CAST(sum(all1) AS BIGINT) AS n1
        FROM grain
    ), comb AS (
        SELECT CAST(sum(d1) AS BIGINT) AS o1,
            sum((d0 + d1) * n1t / CAST(n0t + n1t AS DOUBLE)) AS e1,
            sum((d0 + d1) * (n1t / CAST(n0t + n1t AS DOUBLE))
                * (1.0 - n1t / CAST(n0t + n1t AS DOUBLE))
                * (n0t + n1t - d0 - d1)
                / nullif(CAST(n0t + n1t AS DOUBLE) - 1.0, 0.0)) AS var1
        FROM ev
    ), stat AS (
        SELECT sizes.n0, sizes.n1, comb.o1, comb.e1, comb.var1,
            (o1 - e1) * (o1 - e1) / nullif(var1, 0.0) AS chi2
        FROM comb CROSS JOIN sizes
    )
    SELECT n0, n1, o1, round(e1, 6) AS e1, round(var1, 6) AS var1,
        round(chi2, 6) AS chi2,
        round(2.0 * {_phi_upper_sql('sqrt(chi2)')}, 6) AS p_value
    FROM stat
    """


def rmst_restricted_mean(
    df: DataFrame,
    tau: int = 14,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
) -> DataFrame:
    """Restricted mean survival time: the area under the KM curve up to
    horizon ``tau`` days — "expected event-free days in the first tau",
    the distribution-free effect size that stays defined when the
    median survival never crosses 0.5 (exactly the censoring-heavy
    regime retention data lives in).

        RMST(tau) = sum_i S(t_{i-1}) * (min(t_i, tau) - t_{i-1})
                    + S(t_last) * (tau - t_last)        (step integral)

    Plan: the shared duration grain, the KM running product (the
    absorbing-zero exp-ln guard of the KM operator), a lag window for
    the step widths, and a 2-row closed-form fold.  Returns one row
    (tau, n_keys, rmst), 6dp."""
    at_risk = _time_to_event_grain(
        df, ts_col, key_col, type_col, start_type, event_type
    )
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_lag = Window.orderBy("t")
    curve = (
        at_risk.withColumn(
            "s",
            km_survival_expr(F.col("n_events"), F.col("n_risk"), w_run),
        )
        .filter(F.col("n_events") > 0)
        .select(
            "t",
            "s",
            F.lag("t", 1, 0).over(w_lag).alias("_pt"),
            F.coalesce(F.lag("s", 1).over(w_lag), F.lit(1.0)).alias(
                "_ps"
            ),
        )
    )
    n_keys = at_risk.agg(F.max("n_risk").alias("nk"))
    capped = curve.filter(F.col("t") <= tau)
    folded = capped.agg(
        F.coalesce(
            F.sum(F.col("_ps") * (F.col("t") - F.col("_pt"))), F.lit(0.0)
        ).alias("_area"),
        F.coalesce(F.max("t"), F.lit(0)).alias("_lastt"),
        F.coalesce(F.max_by("s", "t"), F.lit(1.0)).alias("_lasts"),
    )
    return folded.crossJoin(F.broadcast(n_keys)).select(
        F.lit(tau).cast("long").alias("tau"),
        F.col("nk").alias("n_keys"),
        F.round(
            F.col("_area") + F.col("_lasts") * (tau - F.col("_lastt")),
            6,
        ).alias("rmst"),
    )


def sql_rmst_restricted_mean(
    table: str = "events",
    tau: int = 14,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
) -> str:
    """DuckDB replay of :func:`rmst_restricted_mean` — same KM product,
    same lagged step integral and tail extension."""
    lives = _sql_time_to_event_lives(
        table, ts_col, key_col, type_col, start_type, event_type
    )
    return f"""
    WITH {lives}, grain AS (
        SELECT t, count(*) AS n_all,
            sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_events
        FROM lives GROUP BY 1
    ), at_risk AS (
        SELECT t, n_events,
            sum(n_all) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS n_risk
        FROM grain
    ), curve0 AS (
        SELECT t, n_events, n_risk,
            {sql_km_survival('n_events', 'n_risk', 't')} AS s
        FROM at_risk
    ), curve AS (
        SELECT t, s,
            lag(t, 1, 0) OVER (ORDER BY t) AS pt,
            coalesce(lag(s, 1) OVER (ORDER BY t), 1.0) AS ps
        FROM curve0 WHERE n_events > 0
    ), nk AS (
        SELECT CAST(max(n_risk) AS BIGINT) AS n_keys FROM at_risk
    ), folded AS (
        SELECT coalesce(sum(ps * (t - pt)), 0.0) AS area,
            coalesce(max(t), 0) AS lastt,
            coalesce(arg_max(s, t), 1.0) AS lasts
        FROM curve WHERE t <= {tau}
    )
    SELECT CAST({tau} AS BIGINT) AS tau, nk.n_keys,
        round(area + lasts * ({tau} - lastt), 6) AS rmst
    FROM folded CROSS JOIN nk
    """


def cumulative_incidence_competing(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    cause_a: str = "purchase",
    cause_b: str = "error",
) -> DataFrame:
    """Aalen-Johansen cumulative incidence under two COMPETING risks:
    after the first ``start_type``, a key's first ``cause_a`` or
    ``cause_b`` event (whichever day comes first; same-day ties go to
    the lexicographically smaller cause name — deterministic on both
    engines) removes it from risk, so the naive per-cause KM OVERSTATES
    each incidence (it censors the competitor, double-counting keys).
    The CIF divides the event hazard by the ANY-cause survival:

        S(t)      = prod_{s<=t} (1 - d_s / n_s)        (d = both causes)
        CIF_j(t)  = sum_{s<=t} S(s-) * d_js / n_s

    Plan: one key-grain fold (conditional min per cause + least/tie
    pick), duration-grain windows; everything past the fold is
    span-bounded.  Returns (duration_days, n_risk, d_a, d_b, cif_a,
    cif_b) for durations with any event, 6dp."""
    dated = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("_y"),
        F.to_date(ts_col).alias("d"),
    )
    rel = dated.filter(
        F.col("_y").isin([start_type, cause_a, cause_b])
    )
    per_key = (
        rel.groupBy("key")
        .agg(
            F.min(
                F.when(F.col("_y") == start_type, F.col("d"))
            ).alias("_t0"),
            F.collect_set(
                F.when(F.col("_y") == cause_a, F.col("d"))
            ).alias("_eda"),
            F.collect_set(
                F.when(F.col("_y") == cause_b, F.col("d"))
            ).alias("_edb"),
        )
        .filter(F.col("_t0").isNotNull())
        .select(
            "_t0",
            F.array_min(
                F.filter("_eda", lambda x: x >= F.col("_t0"))
            ).alias("_ca"),
            F.array_min(
                F.filter("_edb", lambda x: x >= F.col("_t0"))
            ).alias("_cb"),
        )
    )
    maxd = dated.agg(F.max("d").alias("_maxd"))
    first_cause = F.when(
        F.col("_ca").isNotNull()
        & (F.col("_cb").isNull() | (F.col("_ca") < F.col("_cb"))),
        F.lit("a"),
    ).when(
        F.col("_cb").isNotNull()
        & (F.col("_ca").isNull() | (F.col("_cb") < F.col("_ca"))),
        F.lit("b"),
    ).when(
        F.col("_ca").isNotNull(),  # tie day: lexicographic cause name
        F.lit("a") if cause_a < cause_b else F.lit("b"),
    )
    first_day = F.least("_ca", "_cb")
    lives = per_key.crossJoin(F.broadcast(maxd)).select(
        F.when(
            first_day.isNotNull(), F.datediff(first_day, F.col("_t0"))
        )
        .otherwise(F.datediff("_maxd", "_t0"))
        .cast("long")
        .alias("t"),
        first_cause.alias("cause"),
    )
    grain = lives.groupBy("t").agg(
        F.count(F.lit(1)).alias("_n_all"),
        F.sum(F.when(F.col("cause") == "a", 1).otherwise(0)).alias("d_a"),
        F.sum(F.when(F.col("cause") == "b", 1).otherwise(0)).alias("d_b"),
    )
    w_suffix = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_lag = Window.orderBy("t")
    at_risk = grain.select(
        "t", "d_a", "d_b", F.sum("_n_all").over(w_suffix).alias("n_risk")
    )
    d_all = (F.col("d_a") + F.col("d_b")).cast("double")
    nr = F.col("n_risk").cast("double")
    curved = at_risk.withColumn(
        "_s",
        km_survival_expr(F.col("d_a") + F.col("d_b"), F.col("n_risk"), w_run),
    ).withColumn(
        "_s_prev", F.coalesce(F.lag("_s", 1).over(w_lag), F.lit(1.0))
    )
    out = curved.select(
        "t",
        "n_risk",
        "d_a",
        "d_b",
        F.sum(F.col("_s_prev") * F.col("d_a") / nr).over(w_run).alias(
            "_cif_a"
        ),
        F.sum(F.col("_s_prev") * F.col("d_b") / nr).over(w_run).alias(
            "_cif_b"
        ),
    )
    return out.filter((F.col("d_a") + F.col("d_b")) > 0).select(
        F.col("t").alias("duration_days"),
        "n_risk",
        "d_a",
        "d_b",
        F.round("_cif_a", 6).alias("cif_a"),
        F.round("_cif_b", 6).alias("cif_b"),
    )


def sql_cumulative_incidence_competing(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    cause_a: str = "purchase",
    cause_b: str = "error",
) -> str:
    """DuckDB replay of :func:`cumulative_incidence_competing` — same
    tie rule, same any-cause KM and lagged CIF accumulation."""
    tie = "'a'" if cause_a < cause_b else "'b'"
    return f"""
    WITH dated AS (
        SELECT {key_col} AS key, {type_col} AS y, CAST({ts_col} AS DATE) AS d
        FROM {table} WHERE {ts_col} IS NOT NULL
    ), starts AS (
        SELECT key, min(d) AS t0 FROM dated
        WHERE y = '{start_type}' GROUP BY 1
    ), fa AS (
        SELECT s.key, s.t0,
            min(CASE WHEN e.y = '{cause_a}' THEN e.d END) AS ca,
            min(CASE WHEN e.y = '{cause_b}' THEN e.d END) AS cb
        FROM starts s LEFT JOIN (
            SELECT key, y, d FROM dated
            WHERE y IN ('{cause_a}', '{cause_b}')
        ) e ON s.key = e.key AND e.d >= s.t0
        GROUP BY 1, 2
    ), lives AS (
        SELECT
            CAST(CASE WHEN least(ca, cb) IS NOT NULL
                      THEN datediff('day', t0, least(ca, cb))
                      ELSE datediff('day', t0, (SELECT max(d) FROM dated))
                 END AS BIGINT) AS t,
            CASE WHEN ca IS NOT NULL AND (cb IS NULL OR ca < cb) THEN 'a'
                 WHEN cb IS NOT NULL AND (ca IS NULL OR cb < ca) THEN 'b'
                 WHEN ca IS NOT NULL THEN {tie}
            END AS cause
        FROM fa
    ), grain AS (
        SELECT t, count(*) AS n_all,
            sum(CASE WHEN cause = 'a' THEN 1 ELSE 0 END) AS d_a,
            sum(CASE WHEN cause = 'b' THEN 1 ELSE 0 END) AS d_b
        FROM lives GROUP BY 1
    ), at_risk AS (
        SELECT t, d_a, d_b,
            sum(n_all) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS n_risk
        FROM grain
    ), curved AS (
        SELECT t, d_a, d_b, n_risk,
            {sql_km_survival('d_a + d_b', 'n_risk', 't')} AS s
        FROM at_risk
    ), lagged AS (
        SELECT *, coalesce(lag(s, 1) OVER (ORDER BY t), 1.0) AS s_prev
        FROM curved
    ), accum AS (
        SELECT t, n_risk, d_a, d_b,
            sum(s_prev * d_a / CAST(n_risk AS DOUBLE))
                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cif_a,
            sum(s_prev * d_b / CAST(n_risk AS DOUBLE))
                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cif_b
        FROM lagged
    )
    SELECT t AS duration_days, CAST(n_risk AS BIGINT) AS n_risk,
        CAST(d_a AS BIGINT) AS d_a, CAST(d_b AS BIGINT) AS d_b,
        round(cif_a, 6) AS cif_a, round(cif_b, 6) AS cif_b
    FROM accum WHERE d_a + d_b > 0
    """


def jaccard_category_overlap(
    df: DataFrame,
    key_col: str = "user_id",
    cat_col: str = "event_type",
) -> DataFrame:
    """Pairwise Jaccard similarity between categories over their KEY
    sets — "how much do the audiences of two event types overlap", the
    co-engagement matrix. |A∩B| from a self-join of the distinct
    (key, category) table on key with cat_a < cat_b; |A∪B| =
    |A|+|B|−|A∩B|. Output is |categories|² / 2 rows.

    Scale: the join runs on the (key, category)-distinct table — its
    per-key fan-out is bounded by the category-vocabulary size, so the
    pair stream is |keys|·|cats|² at worst, shuffled on key, never on
    the raw event stream."""
    kc = (
        df.filter(F.col(cat_col).isNotNull())
        .select(F.col(key_col).alias("key"), F.col(cat_col).alias("cat"))
        .distinct()
    )
    a = kc.select("key", F.col("cat").alias("cat_a"))
    b = kc.select("key", F.col("cat").alias("cat_b"))
    inter = (
        a.join(b, "key")
        .filter(F.col("cat_a") < F.col("cat_b"))
        .groupBy("cat_a", "cat_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = kc.groupBy("cat").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("cat").alias("cat_a"), F.col("n").alias("_na"))
    sb = sizes.select(F.col("cat").alias("cat_b"), F.col("n").alias("_nb"))
    return (
        inter.join(F.broadcast(sa), "cat_a")
        .join(F.broadcast(sb), "cat_b")
        .select(
            "cat_a",
            "cat_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (
                    F.col("_na") + F.col("_nb") - F.col("n_both")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def sql_jaccard_category_overlap(
    table: str = "events",
    key_col: str = "user_id",
    cat_col: str = "event_type",
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``jaccard_category_overlap`` (same distinct
    table, same ordered pair join)."""
    return f"""
    WITH kc AS (
        SELECT DISTINCT {key_col} AS key, {cat_col} AS cat
        FROM {table} WHERE ({where}) AND {cat_col} IS NOT NULL
    ), inter AS (
        SELECT a.cat AS cat_a, b.cat AS cat_b, count(*) AS n_both
        FROM kc a JOIN kc b ON a.key = b.key AND a.cat < b.cat
        GROUP BY 1, 2
    ), sizes AS (
        SELECT cat, count(*) AS n FROM kc GROUP BY 1
    )
    SELECT cat_a, cat_b, CAST(n_both AS BIGINT) AS n_both,
        round(CAST(n_both AS DOUBLE)
              / CAST(sa.n + sb.n - n_both AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.cat_a = sa.cat
    JOIN sizes sb ON inter.cat_b = sb.cat
    """


def avg_rank(col: str):
    """Average rank with ties (the Spearman/Mann-Whitney convention):
    rank() + (tie-group size − 1)/2. ONE definition shared by every
    rank-statistic operator (r10 review: the formula appeared four
    times) — the SQL twin is :func:`sql_avg_rank`."""
    return (
        F.rank().over(Window.orderBy(col)).cast("double")
        + (F.count(F.lit(1)).over(Window.partitionBy(col)) - F.lit(1))
        .cast("double")
        / F.lit(2.0)
    )


def sql_avg_rank(col: str) -> str:
    """DuckDB twin of :func:`avg_rank` (same rank()+ties/2 form)."""
    return (
        f"rank() OVER (ORDER BY {col})"
        f" + (count(*) OVER (PARTITION BY {col}) - 1) / 2.0"
    )


def spearman_daily(
    df: DataFrame,
    type_a: str,
    type_b: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Spearman rank correlation between two event types' daily count
    series — the monotone-association readout ("do error days track
    purchase days?") robust to the outliers that wreck Pearson.
    Average ranks for ties (the shared :func:`avg_rank`); ρ computed
    explicitly as covar_samp(rx, ry)/(σ_rx·σ_ry) on BOTH engines (the
    repo's standing ANSI-F.corr trap: its internal division raises
    where the oracle's degrades to NULL — try_divide keeps the
    degenerate constant-series case NULL on both). One row
    (n_days, rho).

    Calendar-spined like every daily operator in this module (r10
    review: the first cut grouped only ACTIVE days, silently dropping
    the (0, 0) tied pairs an outage week contributes — the exact drift
    the shared-spine contract forbids): days inside [min, max] with no
    qualifying events are genuine (0, 0) observations.

    Plan: one conditional date aggregate off the raw stream (the only
    fact pass), spine join, then ranks + moments on the
    CALENDAR-SIZED frame."""
    daily = _daily_pair(df, type_a, type_b, ts_col, type_col).select(
        "ca", "cb"
    )
    ranked = daily.select(
        avg_rank("ca").alias("ra"), avg_rank("cb").alias("rb")
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.try_divide(
                F.covar_samp("ra", "rb"),
                F.stddev_samp("ra") * F.stddev_samp("rb"),
            ),
            6,
        ).alias("rho"),
    )


def _sql_daily_pair(
    type_a: str,
    type_b: str,
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`_daily_pair` — emits the ``counts`` +
    ``daily`` CTE bodies. ONE definition shared by the spearman /
    rolling-corr / xcorr oracles (r11 review: three hand-kept copies of
    the same construction is the drift class the shared spine exists to
    prevent)."""
    return f"""counts AS (
        SELECT CAST({ts_col} AS DATE) AS d,
            CAST(sum(CASE WHEN {type_col} = '{type_a}' THEN 1 ELSE 0 END)
                 AS BIGINT) AS ca,
            CAST(sum(CASE WHEN {type_col} = '{type_b}' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
        FROM {table}
        WHERE {ts_col} IS NOT NULL
          AND {type_col} IN ('{type_a}', '{type_b}')
        GROUP BY 1
    ), {_sql_calendar_fill('counts', 'daily', ['ca', 'cb'])}"""


def sql_spearman_daily(
    type_a: str,
    type_b: str,
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of ``spearman_daily`` (same calendar spine, same
    average ranks via :func:`sql_avg_rank`, same explicit moment
    arithmetic)."""
    return f"""
    WITH {_sql_daily_pair(type_a, type_b, table, ts_col, type_col)}, ranked AS (
        SELECT
            {sql_avg_rank('ca')} AS ra,
            {sql_avg_rank('cb')} AS rb
        FROM daily
    )
    SELECT count(*) AS n_days,
        round(covar_samp(ra, rb)
              / (stddev_samp(ra) * stddev_samp(rb)), 6) AS rho
    FROM ranked
    """


def trimmed_means_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group trimmed mean: the mean of values INSIDE the
    [lo, hi] quantile band (interpolated cuts, boundary-inclusive) —
    the robust location estimate reported next to the raw mean. One
    row per group: (group, n, mean_raw, mean_trimmed, p_lo, p_hi),
    6dp.

    Plan: one grouped percentile aggregate (cuts), broadcast back,
    one conditional re-aggregate — two passes over the grouped rows,
    nothing wider than the group count in between."""
    cuts = df.groupBy(F.col(group_col).alias("g")).agg(
        F.percentile(value_col, F.lit(lo)).alias("p_lo"),
        F.percentile(value_col, F.lit(hi)).alias("p_hi"),
    )
    joined = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).join(F.broadcast(cuts), ["g"])
    inside = (F.col("v") >= F.col("p_lo")) & (F.col("v") <= F.col("p_hi"))
    return joined.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v"), 6).alias("mean_raw"),
        F.round(F.avg(F.when(inside, F.col("v"))), 6).alias(
            "mean_trimmed"
        ),
        F.round(F.first("p_lo"), 6).alias("p_lo"),
        F.round(F.first("p_hi"), 6).alias("p_hi"),
    )


def sql_trimmed_means_by_group(
    table: str,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``trimmed_means_by_group`` (quantile_cont
    mirrors Spark's interpolated percentile; same inclusive band)."""
    return f"""
    WITH cuts AS (
        SELECT {group_col} AS g,
            quantile_cont({value_col}, {lo!r}) AS p_lo,
            quantile_cont({value_col}, {hi!r}) AS p_hi
        FROM {table} WHERE {where} GROUP BY 1
    )
    SELECT t.{group_col} AS g, count(*) AS n,
        round(avg(t.{value_col}), 6) AS mean_raw,
        round(avg(CASE WHEN t.{value_col} >= c.p_lo
                        AND t.{value_col} <= c.p_hi
                       THEN t.{value_col} END), 6) AS mean_trimmed,
        round(first(c.p_lo), 6) AS p_lo,
        round(first(c.p_hi), 6) AS p_hi
    FROM {table} t JOIN cuts c ON t.{group_col} = c.g
    WHERE {where}
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# r11c: one-way ANOVA, contingency effect sizes, empirical-Bayes rates,
# burstiness
# ---------------------------------------------------------------------------

def anova_oneway(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way ANOVA decomposition of ``value_col`` across the levels of
    ``group_col``: F statistic, effect size (eta-squared), and the
    between/within sums of squares. The does-the-group-matter gate in
    front of segment-level curation decisions (is doc quality actually
    different across sources, or is the split noise?).

    Closed-form from per-group sufficient statistics (n, Σx, Σx²):
        SSB = Σ_g (Σx_g)²/n_g − (Σx)²/N
        SSW = Σ_g (Σx²_g − (Σx_g)²/n_g)
        F   = (SSB/(k−1)) / (SSW/(N−k)),  η² = SSB/(SSB+SSW)

    100 TB posture: ONE combinable grouped aggregate (the shuffle
    carries one row per group), then a k-row fold — the same
    sufficient-statistic shape as the OLS/Welch operators. NULL values
    are excluded (they carry no measurement).

    Returns one row (k, n, ss_between, ss_within, f_stat, eta_sq), 6dp.
    """
    per = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum(F.col(value_col).cast("double")).alias("s_g"),
            F.sum(
                F.col(value_col).cast("double")
                * F.col(value_col).cast("double")
            ).alias("ss_g"),
        )
    )
    folded = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("sb_raw"),
        F.sum(
            F.col("ss_g") - F.col("s_g") * F.col("s_g") / F.col("n_g")
        ).alias("ssw"),
    )
    ssb = F.col("sb_raw") - F.col("s") * F.col("s") / F.col("n")
    # try_divide throughout: k=1 (one group) or n=k (all singleton
    # groups) or zero total variance are ANSI plain-/ crashes where the
    # oracle degrades to NULL (r11 second review finding)
    f_stat = F.try_divide(
        F.try_divide(ssb, (F.col("k") - 1).cast("double")),
        F.try_divide(F.col("ssw"), (F.col("n") - F.col("k")).cast("double")),
    )
    return folded.select(
        "k",
        "n",
        F.round(ssb, 6).alias("ss_between"),
        F.round("ssw", 6).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(F.try_divide(ssb, ssb + F.col("ssw")), 6).alias("eta_sq"),
    )


def sql_anova_oneway(
    table: str, group_col: str, value_col: str
) -> str:
    """DuckDB replay of :func:`anova_oneway` — the same sufficient
    statistics, divisions last, 6dp."""
    return f"""
    WITH per AS (
        SELECT {group_col} AS g, count(*) AS n_g,
            sum(CAST({value_col} AS DOUBLE)) AS s_g,
            sum(CAST({value_col} AS DOUBLE)
                * CAST({value_col} AS DOUBLE)) AS ss_g
        FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1
    ), folded AS (
        SELECT count(*) AS k, sum(n_g) AS n, sum(s_g) AS s,
            sum(s_g * s_g / n_g) AS sb_raw,
            sum(ss_g - s_g * s_g / n_g) AS ssw
        FROM per
    )
    SELECT k, n,
        round(sb_raw - s * s / n, 6) AS ss_between,
        round(ssw, 6) AS ss_within,
        round(((sb_raw - s * s / n) / NULLIF(k - 1, 0))
              / NULLIF(ssw / NULLIF(n - k, 0), 0.0), 6) AS f_stat,
        round((sb_raw - s * s / n)
              / NULLIF((sb_raw - s * s / n) + ssw, 0.0), 6) AS eta_sq
    FROM folded
    """


def contingency_effects(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Effect sizes for a two-way contingency table: chi-square,
    G-statistic (likelihood-ratio), degrees of freedom, and Cramér's V —
    the bounded-[0,1] association strength that
    ``profile.categorical_association`` (chi2 + MI) deliberately leaves
    out. V is what you compare ACROSS tables of different shape when
    ranking candidate leakage features.

    Identities that avoid materializing empty cells:
        chi² = Σ_cells o²/e − N          (o=0 cells contribute 0 to Σo²/e)
        G    = 2·Σ_{{o>0}} o·ln(o/e)
        V    = sqrt(chi² / (N·(min(r,c)−1)))

    Plan: ONE combinable contingency aggregate; marginals re-derive
    from the persisted cells (cardinality-sized); everything downstream
    is cell-count-sized. NULL levels route through a sentinel, matching
    the categorical_association contract."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    a = F.coalesce(F.col(col_a).cast("string"), F.lit("<null>"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("<null>"))
    cells = pooled_persist(
        df.groupBy(a.alias("a"), b.alias("b")).agg(
            F.count(F.lit(1)).alias("o")
        )
    )
    ma = cells.groupBy("a").agg(F.sum("o").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("o").alias("n_b"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("a").alias("r"),
        F.count_distinct("b").alias("c"),
    )
    # doubles BEFORE the products: n_a*n_b (and o*o) as raw longs wrap
    # int64 around ~3e9-row marginals in non-ANSI Spark while the SQL
    # mirror already multiplies doubles (r11 review finding)
    e = F.col("n_a").cast("double") * F.col("n_b") / F.col("n")
    terms = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.first("n").alias("n"),
            F.first("r").alias("r"),
            F.first("c").alias("c"),
            F.sum(F.col("o").cast("double") * F.col("o") / e).alias("o2e"),
            F.sum(
                2.0 * F.col("o") * F.log(F.col("o") / e)
            ).alias("g_stat"),
        )
    )
    chi2 = F.col("o2e") - F.col("n")
    min_rc = F.least(F.col("r"), F.col("c"))
    return terms.select(
        "n",
        "r",
        "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round("g_stat", 6).alias("g_stat"),
        F.round(
            F.sqrt(
                F.try_divide(chi2, (F.col("n") * (min_rc - 1)).cast("double"))
            ),
            6,
        ).alias("cramers_v"),
    )


def sql_contingency_effects(
    table: str, col_a: str, col_b: str
) -> str:
    """DuckDB replay of :func:`contingency_effects` — same identities,
    same sentinel, divisions last, 6dp."""
    return f"""
    WITH cells AS (
        SELECT coalesce(CAST({col_a} AS VARCHAR), '<null>') AS a,
               coalesce(CAST({col_b} AS VARCHAR), '<null>') AS b,
               count(*) AS o
        FROM {table} GROUP BY 1, 2
    ), ma AS (SELECT a, sum(o) AS n_a FROM cells GROUP BY 1),
    mb AS (SELECT b, sum(o) AS n_b FROM cells GROUP BY 1),
    tot AS (
        SELECT sum(o) AS n, count(DISTINCT a) AS r,
               count(DISTINCT b) AS c
        FROM cells
    ), terms AS (
        SELECT first(tot.n) AS n, first(tot.r) AS r, first(tot.c) AS c,
            sum(CAST(o AS DOUBLE) * o / (CAST(n_a AS DOUBLE) * n_b / tot.n))
                AS o2e,
            sum(2.0 * o * ln(CAST(o AS DOUBLE)
                / (CAST(n_a AS DOUBLE) * n_b / tot.n))) AS g_stat
        FROM cells
        JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
    )
    SELECT n, r, c, (r - 1) * (c - 1) AS dof,
        round(o2e - n, 6) AS chi2,
        round(g_stat, 6) AS g_stat,
        round(sqrt((o2e - n) / NULLIF(n * (least(r, c) - 1), 0)), 6)
            AS cramers_v
    FROM terms
    """


def eb_rate_shrinkage(
    df: DataFrame,
    key_col: str,
    success_col,
    min_trials: int = 1,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-key success
    rates — the CTR-smoothing workhorse: keys with few trials get pulled
    toward the corpus prior, keys with many keep their raw rate. The
    prior (α, β) is fit by method of moments on the per-key raw rates:

        m  = mean(rate),  s² = var(rate)           (sample variance)
        M  = max(m(1−m)/s² − 1, 1)                 (α+β, floored: MoM is
                                                    undefined when the
                                                    rate variance exceeds
                                                    the binomial bound)
        α  = m·M,  β = (1−m)·M,  shrunk = (k+α)/(n+M)

    ``success_col`` is a 0/1 integer Column (e.g.
    ``(event_type == 'purchase').cast('int')``).

    Plan: one combinable per-key aggregate (n, k); moments fold to ONE
    broadcast row; shrunk rates are a scalar-join projection over the
    key-grain frame. Output is bucketed by trial count (fixed integer
    boundaries — deterministic across engines) so the readout is
    bucket-sized: (n_bucket, keys, avg_raw, avg_shrunk, avg_abs_shift,
    alpha, beta), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    per = pooled_persist(
        df.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(success_col).alias("k"),
        )
        .filter(F.col("n") >= min_trials)
    )
    rate = F.col("k").cast("double") / F.col("n")
    mom = per.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum(rate).alias("sr"),
        F.sum(rate * rate).alias("srr"),
    ).select(
        (F.col("sr") / F.col("g")).alias("m"),
        # try_divide: a single key (g=1) has no sample variance — ANSI
        # plain-/ crash where the oracle degrades (r11 second review)
        F.try_divide(
            F.col("srr") - F.col("sr") * F.col("sr") / F.col("g"),
            (F.col("g") - 1).cast("double"),
        ).alias("s2"),
    )
    # try_divide + greatest: s2=0 (all rates identical) must fall to
    # the floor M=1 on both engines (greatest skips NULL on both),
    # never crash
    big_m = F.greatest(
        F.try_divide(F.col("m") * (1.0 - F.col("m")), F.col("s2")) - 1.0,
        F.lit(1.0),
    )
    prior = mom.select(
        (F.col("m") * big_m).alias("alpha"),
        ((1.0 - F.col("m")) * big_m).alias("beta"),
        big_m.alias("mm"),
    )
    shrunk = per.crossJoin(F.broadcast(prior)).select(
        "n",
        rate.alias("raw"),
        (
            (F.col("k") + F.col("alpha")) / (F.col("n") + F.col("mm"))
        ).alias("shrunk"),
        "alpha",
        "beta",
    )
    bucket = (
        F.when(F.col("n") <= 2, "01_le2")
        .when(F.col("n") <= 5, "02_3_5")
        .when(F.col("n") <= 10, "03_6_10")
        .when(F.col("n") <= 20, "04_11_20")
        .otherwise("05_gt20")
    )
    return (
        shrunk.groupBy(bucket.alias("n_bucket"))
        .agg(
            F.count(F.lit(1)).alias("keys"),
            F.round(F.avg("raw"), 6).alias("avg_raw"),
            F.round(F.avg("shrunk"), 6).alias("avg_shrunk"),
            F.round(
                F.avg(F.abs(F.col("shrunk") - F.col("raw"))), 6
            ).alias("avg_abs_shift"),
            F.round(F.first("alpha"), 6).alias("alpha"),
            F.round(F.first("beta"), 6).alias("beta"),
        )
    )


def sql_eb_rate_shrinkage(
    table: str,
    key_col: str,
    success_expr: str,
    min_trials: int = 1,
) -> str:
    """DuckDB replay of :func:`eb_rate_shrinkage` — same moments, same
    floor, same fixed buckets, divisions last, 6dp."""
    return f"""
    WITH per AS (
        SELECT {key_col} AS key, count(*) AS n,
               sum({success_expr}) AS k
        FROM {table} GROUP BY 1 HAVING count(*) >= {min_trials}
    ), mom AS (
        SELECT sum(CAST(k AS DOUBLE) / n) / count(*) AS m,
            (sum((CAST(k AS DOUBLE) / n) * (CAST(k AS DOUBLE) / n))
             - sum(CAST(k AS DOUBLE) / n) * sum(CAST(k AS DOUBLE) / n)
               / count(*)) / (count(*) - 1) AS s2
        FROM per
    ), prior AS (
        SELECT m * greatest(m * (1.0 - m) / s2 - 1.0, 1.0) AS alpha,
            (1.0 - m) * greatest(m * (1.0 - m) / s2 - 1.0, 1.0) AS beta,
            greatest(m * (1.0 - m) / s2 - 1.0, 1.0) AS mm
        FROM mom
    ), shrunk AS (
        SELECT per.n, CAST(per.k AS DOUBLE) / per.n AS raw,
            (per.k + prior.alpha) / (per.n + prior.mm) AS shrunk,
            prior.alpha, prior.beta
        FROM per CROSS JOIN prior
    )
    SELECT CASE WHEN n <= 2 THEN '01_le2'
                WHEN n <= 5 THEN '02_3_5'
                WHEN n <= 10 THEN '03_6_10'
                WHEN n <= 20 THEN '04_11_20'
                ELSE '05_gt20' END AS n_bucket,
        count(*) AS keys,
        round(avg(raw), 6) AS avg_raw,
        round(avg(shrunk), 6) AS avg_shrunk,
        round(avg(abs(shrunk - raw)), 6) AS avg_abs_shift,
        round(first(alpha), 6) AS alpha,
        round(first(beta), 6) AS beta
    FROM shrunk
    GROUP BY 1
    """


def burstiness_histogram(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bin_width: float = 0.25,
) -> DataFrame:
    """Per-key burstiness of inter-arrival times, folded to a fixed-bin
    histogram. Burstiness (Goh & Barabási 2008):

        B = (σ − μ) / (σ + μ)   over a key's inter-arrival gaps

    B → −1 for a perfectly regular (periodic) stream, 0 for Poisson,
    → +1 for extreme bursts — the behavioural fingerprint that separates
    schedulers/bots (B≈−1) from humans (B>0) in event logs.

    Only keys with ≥3 events (≥2 gaps, so the sample σ exists)
    contribute. Gaps come from a per-key lag window ordered by the
    timestamp alone: ties contribute the same sorted-timestamp multiset
    (hence the same gap multiset) under any tiebreak, so the statistic
    is deterministic without an injective order.

    Plan: one keyed window (the only shuffle — by key), a per-key
    sufficient-statistic aggregate, then a bin-sized histogram fold.
    Output (bin_lo, n_keys, avg_b), 6dp; bins clamp to [−1, 1]."""
    gaps = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(ts_col).cast("timestamp").alias("ts"),
        )
        .withColumn(
            "gap",
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(
                Window.partitionBy("key").orderBy("ts")
            ),
        )
        .filter(F.col("gap").isNotNull())
    )
    per = (
        gaps.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum("gap").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).alias("sgg"),
        )
        .filter(F.col("ng") >= 2)
    )
    mu = F.col("sg") / F.col("ng")
    sigma = F.sqrt(
        (F.col("sgg") - F.col("sg") * F.col("sg") / F.col("ng"))
        / (F.col("ng") - 1)
    )
    b = F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu)).otherwise(
        F.lit(0.0)
    )
    binned = per.select(
        (
            F.least(
                F.greatest(
                    F.floor((b + 1.0) / bin_width), F.lit(0)
                ),
                F.lit(int(round(2.0 / bin_width)) - 1),
            )
            * bin_width
            - 1.0
        ).alias("bin_lo"),
        b.alias("b"),
    )
    return binned.groupBy("bin_lo").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.avg("b"), 6).alias("avg_b"),
    )


def sql_burstiness_histogram(
    table: str,
    key_col: str,
    ts_col: str,
    bin_width: float = 0.25,
) -> str:
    """DuckDB replay of :func:`burstiness_histogram` — same gaps
    (epoch-second doubles), same sufficient statistics, same clamped
    bins, 6dp."""
    n_bins = int(round(2.0 / bin_width))
    return f"""
    WITH gaps AS (
        SELECT {key_col} AS key,
            epoch({ts_col}) - lag(epoch({ts_col})) OVER (
                PARTITION BY {key_col} ORDER BY {ts_col}
            ) AS gap
        FROM {table} WHERE {ts_col} IS NOT NULL
    ), per AS (
        SELECT key, count(*) AS ng, sum(gap) AS sg,
               sum(gap * gap) AS sgg
        FROM gaps WHERE gap IS NOT NULL GROUP BY 1
        HAVING count(*) >= 2
    ), stats AS (
        SELECT
            sqrt((sgg - sg * sg / ng) / (ng - 1)) AS sigma,
            sg / ng AS mu
        FROM per
    ), bvals AS (
        SELECT CASE WHEN sigma + mu > 0
                    THEN (sigma - mu) / (sigma + mu)
                    ELSE 0.0 END AS b
        FROM stats
    )
    SELECT least(greatest(floor((b + 1.0) / {bin_width!r}), 0),
                 {n_bins - 1}) * {bin_width!r} - 1.0 AS bin_lo,
        count(*) AS n_keys,
        round(avg(b), 6) AS avg_b
    FROM bvals
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# r11d: rolling correlation, lag cross-correlation, Simpson's-paradox check
# ---------------------------------------------------------------------------

def _daily_pair(
    df: DataFrame,
    type_a: str,
    type_b: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Shared calendar-spined (d, ca, cb) daily pair series: one
    conditional date aggregate (the only fact pass), then the single
    spine definition. THE one construction behind spearman_daily,
    rolling_corr_daily, and xcorr_daily (r11 review pass consolidated
    spearman's inline copy onto it)."""
    counts = (
        df.filter(
            F.col(ts_col).isNotNull()
            & F.col(type_col).isin(type_a, type_b)
        )
        .groupBy(F.to_date(ts_col).alias("d"))
        .agg(
            F.sum((F.col(type_col) == type_a).cast("long")).alias("ca"),
            F.sum((F.col(type_col) == type_b).cast("long")).alias("cb"),
        )
    )
    return _calendar_fill(counts, ["ca", "cb"])


def rolling_corr_daily(
    df: DataFrame,
    type_a: str,
    type_b: str,
    window: int = 14,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Rolling Pearson correlation between two event types' daily count
    series over a trailing ``window``-day frame — the co-movement
    monitor ("are views still driving purchases this fortnight?") whose
    drops flag regime changes a single full-period corr averages away.

    Closed form from rolling sufficient statistics (Σx, Σy, Σxy, Σxx,
    Σyy, n over the frame), divisions last; windows shorter than
    ``window`` days (the series head) are suppressed, degenerate
    constant-series windows degrade to NULL via try_divide on both
    engines.

    Scale: the windows run on the CALENDAR-GRAIN frame (one row per
    day — years are thousands of rows), ordered by date without a
    partition key; the fact table is touched exactly once by the date
    aggregate. Returns (d, corr), 6dp."""
    daily = _daily_pair(df, type_a, type_b, ts_col, type_col)
    w = Window.orderBy("d").rowsBetween(-(window - 1), 0)
    x = F.col("ca").cast("double")
    y = F.col("cb").cast("double")
    rolled = daily.select(
        "d",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(x).over(w).alias("sx"),
        F.sum(y).over(w).alias("sy"),
        F.sum(x * y).over(w).alias("sxy"),
        F.sum(x * x).over(w).alias("sxx"),
        F.sum(y * y).over(w).alias("syy"),
    ).filter(F.col("n") == window)
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return rolled.select(
        "d",
        F.round(F.try_divide(cov, F.sqrt(vx * vy)), 6).alias("corr"),
    )


def sql_rolling_corr_daily(
    type_a: str,
    type_b: str,
    window: int = 14,
    table: str = "events",
) -> str:
    """DuckDB replay of :func:`rolling_corr_daily` — same frame, same
    sums, NULL on degenerate windows (NULLIF of a zero variance)."""
    frame = f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW"
    return f"""
    WITH {_sql_daily_pair(type_a, type_b, table)}, rolled AS (
        SELECT d,
            count(*) OVER w AS n,
            sum(CAST(ca AS DOUBLE)) OVER w AS sx,
            sum(CAST(cb AS DOUBLE)) OVER w AS sy,
            sum(CAST(ca AS DOUBLE) * cb) OVER w AS sxy,
            sum(CAST(ca AS DOUBLE) * ca) OVER w AS sxx,
            sum(CAST(cb AS DOUBLE) * cb) OVER w AS syy
        FROM daily
        WINDOW w AS (ORDER BY d {frame})
    )
    SELECT d,
        round((n * sxy - sx * sy)
              / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                       0.0), 6) AS corr
    FROM rolled WHERE n = {window}
    """


def xcorr_daily(
    df: DataFrame,
    type_a: str,
    type_b: str,
    max_lag: int = 7,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Lagged cross-correlation between two daily count series:
    Pearson corr of (a(t), b(t+lag)) for lag 0..``max_lag`` — does
    today's view volume predict purchases 0, 1, ... 7 days out, and
    which lag couples tightest? The lead-indicator probe in front of
    any forecasting feature.

    Each lag correlates over its own overlap (n shrinks by one day per
    lag); closed-form moment sums per lag, divisions last, NULL on
    degenerate overlap via try_divide.

    Plan: ONE fact pass (the date aggregate), calendar spine, then a
    lag-spine cross join and a self-join on shifted dates — everything
    past the aggregate is (calendar × lags)-sized. Returns
    (lag, n_days, corr), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    daily = pooled_persist(
        _daily_pair(df, type_a, type_b, ts_col, type_col)
    )
    lags = daily.sparkSession.range(0, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select("d", F.col("ca").cast("double").alias("x"))
    b = daily.select(
        F.col("d").alias("d2"), F.col("cb").cast("double").alias("y")
    )
    pairs = a.crossJoin(F.broadcast(lags)).join(
        b, F.date_add(F.col("d"), F.col("lag")) == F.col("d2")
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "lag",
        F.col("n").alias("n_days"),
        F.round(F.try_divide(cov, F.sqrt(vx * vy)), 6).alias("corr"),
    )


def sql_xcorr_daily(
    type_a: str,
    type_b: str,
    max_lag: int = 7,
    table: str = "events",
) -> str:
    """DuckDB replay of :func:`xcorr_daily` — same spine, same shifted
    self-join, same sums."""
    return f"""
    WITH {_sql_daily_pair(type_a, type_b, table)},
    lags AS (SELECT unnest(generate_series(0, {max_lag})) AS lag),
    pairs AS (
        SELECT lags.lag, CAST(a.ca AS DOUBLE) AS x, CAST(b.cb AS DOUBLE) AS y
        FROM daily a CROSS JOIN lags
        JOIN daily b ON b.d = a.d + to_days(lags.lag::INT)
    ), m AS (
        SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
            sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pairs GROUP BY 1
    )
    SELECT lag, n AS n_days,
        round((n * sxy - sx * sy)
              / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                       0.0), 6) AS corr
    FROM m
    """


def simpson_slope_check(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col: str,
) -> DataFrame:
    """Simpson's-paradox probe for a trend: the pooled OLS slope of
    y on x next to the per-group slopes — how many groups trend in the
    OPPOSITE direction of the pooled line? A nonzero count means the
    pooled trend is a composition artifact (the classic aggregation
    trap in any segment-blind dashboard).

    ONE grouped sufficient-statistic aggregate serves both grains: the
    pooled sums are the COLUMN SUMS of the per-group sums, so the fact
    table is scanned once and the fold is group-count-sized. Groups
    with zero x-variance have no slope and are excluded from the flip
    census (but still feed the pooled line). Returns one row
    (pooled_slope, n_groups, n_opposite, min_group_slope,
    max_group_slope), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    x = x_col if not isinstance(x_col, str) else F.col(x_col)
    x = x.cast("double")
    y = F.col(y_col).cast("double")
    per = pooled_persist(
        df.filter(y.isNotNull() & x.isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
        )
    )

    def slope(n, sx, sy, sxy, sxx):
        return F.try_divide(
            n * sxy - sx * sy, n * sxx - sx * sx
        )

    g_slope = slope(
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx")
    )
    slopes = per.select(g_slope.alias("b"))
    pooled = per.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
        F.sum("sxx").alias("sxx"),
    ).select(
        slope(
            F.col("n"), F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx")
        ).alias("pb")
    )
    return (
        slopes.crossJoin(F.broadcast(pooled))
        .agg(
            F.round(F.first("pb"), 6).alias("pooled_slope"),
            F.sum(F.col("b").isNotNull().cast("long")).alias("n_groups"),
            F.sum(
                (
                    F.col("b").isNotNull()
                    & (F.signum("b") == -F.signum("pb"))
                    & (F.signum("b") != 0)
                ).cast("long")
            ).alias("n_opposite"),
            F.round(F.min("b"), 6).alias("min_group_slope"),
            F.round(F.max("b"), 6).alias("max_group_slope"),
        )
    )


def sql_simpson_slope_check(
    table: str,
    group_col: str,
    x_expr: str,
    y_col: str,
) -> str:
    """DuckDB replay of :func:`simpson_slope_check` — same single
    aggregate, same column-sum pooling, same sign census."""
    return f"""
    WITH per AS (
        SELECT {group_col} AS g, count(*) AS n,
            sum(CAST({x_expr} AS DOUBLE)) AS sx,
            sum(CAST({y_col} AS DOUBLE)) AS sy,
            sum(CAST({x_expr} AS DOUBLE) * {y_col}) AS sxy,
            sum(CAST({x_expr} AS DOUBLE) * {x_expr}) AS sxx
        FROM {table}
        WHERE {y_col} IS NOT NULL AND {x_expr} IS NOT NULL
        GROUP BY 1
    ), slopes AS (
        SELECT (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0) AS b
        FROM per
    ), pooled AS (
        SELECT (sum(n) * sum(sxy) - sum(sx) * sum(sy))
               / NULLIF(sum(n) * sum(sxx) - sum(sx) * sum(sx), 0.0) AS pb
        FROM per
    )
    SELECT round(first(pb), 6) AS pooled_slope,
        sum(CASE WHEN b IS NOT NULL THEN 1 ELSE 0 END) AS n_groups,
        sum(CASE WHEN b IS NOT NULL AND sign(b) = -sign(pb)
                  AND sign(b) <> 0 THEN 1 ELSE 0 END) AS n_opposite,
        round(min(b), 6) AS min_group_slope,
        round(max(b), 6) AS max_group_slope
    FROM slopes CROSS JOIN pooled
    """


# ---------------------------------------------------------------------------
# r11g: Kendall's tau-b, Lorenz concentration curve
# ---------------------------------------------------------------------------

def kendall_tau_daily(
    df: DataFrame,
    type_a: str,
    type_b: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Kendall's tau-b between two event types' daily count series —
    the third rung of the correlation family (Pearson rolling_corr,
    Spearman rank, Kendall concordance): the most outlier-proof
    monotone-association readout, with the tie correction the count
    data needs.

        tau_b = (C − D) / √((n0 − t_x)(n0 − t_y)),  n0 = n(n−1)/2

    C − D folds sign((x_j−x_i))·sign((y_j−y_i)) over day pairs i<j;
    tie terms t = Σ c(c−1)/2 per tied value. All arithmetic is exact
    integers until the final division.

    Scale: the pair join is QUADRATIC in days by design — the operator
    contract is calendar-grain input (a decade is ~3.7k rows → 7M
    pairs, one broadcast self-join); the raw stream is touched once by
    the date aggregate. Returns one row (n_days, concordant_minus_
    discordant, tau_b), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    daily = pooled_persist(
        _daily_pair(df, type_a, type_b, ts_col, type_col)
    )
    a = daily.select(
        F.col("d").alias("d1"),
        F.col("ca").alias("x1"),
        F.col("cb").alias("y1"),
    )
    b = daily.select(
        F.col("d").alias("d2"),
        F.col("ca").alias("x2"),
        F.col("cb").alias("y2"),
    )
    pairs = a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
    cd = pairs.agg(
        F.sum(
            F.signum((F.col("x2") - F.col("x1")).cast("double"))
            * F.signum((F.col("y2") - F.col("y1")).cast("double"))
        ).cast("long").alias("cmd")
    )
    n = daily.agg(F.count(F.lit(1)).alias("n"))

    def tie_term(col: str):
        per = daily.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return per.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("t")
        )
    tx = tie_term("ca").select(F.col("t").alias("tx"))
    ty = tie_term("cb").select(F.col("t").alias("ty"))
    joined = (
        cd.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n0 = F.col("n") * (F.col("n") - 1) / 2
    return joined.select(
        F.col("n").alias("n_days"),
        F.col("cmd").alias("c_minus_d"),
        F.round(
            F.try_divide(
                F.col("cmd").cast("double"),
                F.sqrt((n0 - F.col("tx")) * (n0 - F.col("ty"))),
            ),
            6,
        ).alias("tau_b"),
    )


def sql_kendall_tau_daily(
    type_a: str,
    type_b: str,
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`kendall_tau_daily` — same pair fold,
    same tie terms, division last."""
    return f"""
    WITH {_sql_daily_pair(type_a, type_b, table, ts_col, type_col)},
    cd AS (
        SELECT CAST(sum(sign(CAST(b.ca - a.ca AS DOUBLE))
                        * sign(CAST(b.cb - a.cb AS DOUBLE))) AS BIGINT)
               AS cmd
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    nn AS (SELECT count(*) AS n FROM daily),
    tx AS (
        SELECT sum(c * (c - 1) / 2) AS t FROM (
            SELECT count(*) AS c FROM daily GROUP BY ca
        )
    ),
    ty AS (
        SELECT sum(c * (c - 1) / 2) AS t FROM (
            SELECT count(*) AS c FROM daily GROUP BY cb
        )
    )
    SELECT nn.n AS n_days, cd.cmd AS c_minus_d,
        round(CAST(cd.cmd AS DOUBLE)
              / NULLIF(sqrt((nn.n * (nn.n - 1) / 2 - tx.t)
                            * (nn.n * (nn.n - 1) / 2 - ty.t)), 0.0),
              6) AS tau_b
    FROM cd CROSS JOIN nn CROSS JOIN tx CROSS JOIN ty
    """


def lorenz_curve(
    df: DataFrame,
    key_col: str,
    value_col: str,
    value_filter=None,
    n_tiles: int = 10,
) -> DataFrame:
    """Lorenz concentration curve: per-key value totals cut into
    ``n_tiles`` ascending tiles, each tile's share and cumulative share
    of the grand total — the decile table behind the Gini number
    ("the top decile of users carries 62% of revenue"). The
    completeness complement to :func:`gini`.

    The ntile runs over the KEY-GRAIN aggregate with an injective
    (total, key) order (the RFM/ntile precedent: key-grain global sorts
    are the documented aggregate-grain exception; the id-bucketed
    global_rank is the named alternative at billion-key scale).

    Returns (tile, keys, value_share, cum_share), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    filtered = df if value_filter is None else df.filter(value_filter)
    per = pooled_persist(
        filtered.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.sum(F.col(value_col).cast("double")).alias("v"))
    )
    w = Window.orderBy("v", "key")
    tiled = per.select(
        F.ntile(n_tiles).over(w).alias("tile"), F.col("v")
    )
    cells = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("keys"), F.sum("v").alias("tv")
    )
    tot = cells.agg(F.sum("tv").alias("gt"))
    w_cum = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "tile",
            "keys",
            # try_divide: a zero grand total (values netting to 0) is a
            # plain-/ ANSI crash where the oracle degrades to NULL
            # (r11 second review finding)
            F.round(F.try_divide(F.col("tv"), F.col("gt")), 6).alias(
                "value_share"
            ),
            F.round(
                F.try_divide(F.sum("tv").over(w_cum), F.col("gt")), 6
            ).alias("cum_share"),
        )
    )


def sql_lorenz_curve(
    table: str,
    key_col: str,
    value_col: str,
    where: str = "1=1",
    n_tiles: int = 10,
) -> str:
    """DuckDB replay of :func:`lorenz_curve` — same injective ntile
    order, same cumulative frame."""
    return f"""
    WITH per AS (
        SELECT {key_col} AS key,
               sum(CAST({value_col} AS DOUBLE)) AS v
        FROM {table}
        WHERE ({where}) AND {value_col} IS NOT NULL
        GROUP BY 1
    ), tiled AS (
        SELECT ntile({n_tiles}) OVER (ORDER BY v, key) AS tile, v
        FROM per
    ), cells AS (
        SELECT tile, count(*) AS keys, sum(v) AS tv
        FROM tiled GROUP BY 1
    ), tot AS (SELECT sum(tv) AS gt FROM cells)
    SELECT tile, keys,
        round(tv / gt, 6) AS value_share,
        round(sum(tv) OVER (ORDER BY tile
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) / gt, 6) AS cum_share
    FROM cells CROSS JOIN tot
    """


# ---------------------------------------------------------------------------
# r11h: distribution moments, extreme studentized deviate
# ---------------------------------------------------------------------------

def moments_by_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group distribution shape from POWER SUMS: mean, population
    skewness g1 = M3/M2^1.5, population excess kurtosis g2 = M4/M2²−3,
    and the coefficient of variation — the shape profile that tells a
    curation gate whether a metric is near-normal (z-scores mean
    something) or heavy-tailed (switch to the MAD/quantile family).

    Built from Σx..Σx⁴ explicitly rather than the engines' built-in
    skewness/kurtosis, whose bias corrections differ between Spark and
    DuckDB — the power-sum formulation is the same arithmetic on both:

        M2 = Σx²/n − m²
        M3 = Σx³/n − 3m·Σx²/n + 2m³
        M4 = Σx⁴/n − 4m·Σx³/n + 6m²·Σx²/n − 3m⁴

    One combinable grouped aggregate; degenerate groups (zero variance,
    zero mean for CV) degrade to NULL via try_divide. Returns
    (group, n, mean, stddev_pop, skewness, ex_kurtosis, cv), 6dp."""
    x = F.col(value_col).cast("double")
    per = (
        df.filter(x.isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("s1"),
            F.sum(x * x).alias("s2"),
            F.sum(x * x * x).alias("s3"),
            F.sum(x * x * x * x).alias("s4"),
        )
    )
    n = F.col("n").cast("double")
    m = F.col("s1") / n
    m2 = F.col("s2") / n - m * m
    m3 = F.col("s3") / n - 3.0 * m * F.col("s2") / n + 2.0 * m * m * m
    m4 = (
        F.col("s4") / n
        - 4.0 * m * F.col("s3") / n
        + 6.0 * m * m * F.col("s2") / n
        - 3.0 * m * m * m * m
    )
    return per.select(
        F.col("g").alias(group_col),
        "n",
        F.round(m, 6).alias("mean"),
        F.round(F.sqrt(m2), 6).alias("stddev_pop"),
        F.round(F.try_divide(m3, F.pow(m2, F.lit(1.5))), 6).alias(
            "skewness"
        ),
        F.round(F.try_divide(m4, m2 * m2) - 3.0, 6).alias("ex_kurtosis"),
        F.round(F.try_divide(F.sqrt(m2), m), 6).alias("cv"),
    )


def sql_moments_by_group(
    table: str, group_col: str, value_col: str
) -> str:
    """DuckDB replay of :func:`moments_by_group` — same power sums,
    same central-moment algebra, NULLIF degradation."""
    return f"""
    WITH per AS (
        SELECT {group_col} AS g, count(*) AS n,
            sum(CAST({value_col} AS DOUBLE)) AS s1,
            sum(CAST({value_col} AS DOUBLE) * {value_col}) AS s2,
            sum(CAST({value_col} AS DOUBLE) * {value_col} * {value_col})
                AS s3,
            sum(CAST({value_col} AS DOUBLE) * {value_col} * {value_col}
                * {value_col}) AS s4
        FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1
    ), mom AS (
        SELECT g, n, s1 / n AS m,
            s2 / n - (s1 / n) * (s1 / n) AS m2,
            s3 / n - 3.0 * (s1 / n) * s2 / n
                + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
            s4 / n - 4.0 * (s1 / n) * s3 / n
                + 6.0 * (s1 / n) * (s1 / n) * s2 / n
                - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM per
    )
    SELECT g AS {group_col}, n,
        round(m, 6) AS mean,
        round(sqrt(m2), 6) AS stddev_pop,
        round(m3 / NULLIF(pow(m2, 1.5), 0.0), 6) AS skewness,
        round(m4 / NULLIF(m2 * m2, 0.0) - 3.0, 6) AS ex_kurtosis,
        round(sqrt(m2) / NULLIF(m, 0.0), 6) AS cv
    FROM mom
    """


def esd_max_daily(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Maximum studentized deviate of the daily event-count series —
    the one-shot extreme-value readout (the first round of a
    generalized-ESD test): which day sticks out most, and by how many
    sample standard deviations. Pairs with the MAD anomaly gate: ESD
    assumes near-normal counts, MAD survives heavy tails.

    Calendar-spined like every daily operator here (a silent outage
    day IS the anomaly). One date aggregate, a one-row moment
    broadcast, then a 1-row TakeOrdered (|z| DESC, d — injective).
    Returns one row (d, c, n_days, z), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    daily = pooled_persist(_daily_series(df, ts_col))
    mom = daily.agg(
        F.count(F.lit(1)).alias("nd"),
        F.avg("c").alias("m"),
        F.stddev_samp(F.col("c").cast("double")).alias("sd"),
    )
    z = F.try_divide(F.abs(F.col("c") - F.col("m")), F.col("sd"))
    return (
        daily.crossJoin(F.broadcast(mom))
        .select(
            "d",
            "c",
            F.col("nd").alias("n_days"),
            F.round(z, 6).alias("z"),
        )
        .orderBy(F.desc("z"), "d")
        .limit(1)
    )


def sql_esd_max_daily(table: str = "events", ts_col: str = "ts") -> str:
    """DuckDB replay of :func:`esd_max_daily` — same spine, same
    sample-stddev studentization, same injective order."""
    return f"""
    WITH counts AS (
        SELECT CAST({ts_col} AS DATE) AS d, count(*) AS c
        FROM {table} WHERE {ts_col} IS NOT NULL GROUP BY 1
    ), {_sql_calendar_fill('counts', 'daily', ['c'])}, mom AS (
        SELECT count(*) AS nd, avg(c) AS m,
               stddev_samp(CAST(c AS DOUBLE)) AS sd
        FROM daily
    )
    SELECT d, c, nd AS n_days,
        round(abs(c - m) / NULLIF(sd, 0.0), 6) AS z
    FROM daily CROSS JOIN mom
    -- order on the ROUNDED z (matching the Spark side): a raw-double
    -- tie-break could pick different argmax rows across engines
    ORDER BY round(abs(c - m) / NULLIF(sd, 0.0), 6) DESC NULLS LAST, d
    LIMIT 1
    """


def corr_matrix_daily_types(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Pairwise Pearson correlation matrix of EVERY event type's daily
    count series — the co-movement overview whose individual cells the
    rolling/lagged operators zoom into. One conditional date aggregate
    pivots the types to columns on the calendar spine; every pair's
    moments then fold from the same frame (type-count² pairs of
    calendar-grain sums — dimension-sized work).

    Pairs are emitted once (type_a < type_b), divisions last, NULL on
    constant series via try_divide. Returns
    (type_a, type_b, n_days, corr), 6dp.  Fewer than 2 distinct types
    means no pairs exist: an EMPTY frame with the same schema is
    returned (matching the SQL mirror's zero rows) rather than None."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    types = sorted(
        r["t"]
        for r in df.filter(F.col(type_col).isNotNull())
        .select(F.col(type_col).alias("t"))
        .distinct()
        .collect()
    )
    if len(types) < 2:
        return df.sparkSession.createDataFrame(
            [],
            "type_a string, type_b string, n_days bigint, corr double",
        )
    counts = (
        df.filter(F.col(ts_col).isNotNull() & F.col(type_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("d"))
        .agg(
            *[
                F.sum((F.col(type_col) == t).cast("long")).alias(f"c{i}")
                for i, t in enumerate(types)
            ]
        )
    )
    daily = pooled_persist(
        _calendar_fill(counts, [f"c{i}" for i in range(len(types))])
    )
    rows = None
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            x = F.col(f"c{i}").cast("double")
            y = F.col(f"c{j}").cast("double")
            m = daily.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(x).alias("sx"),
                F.sum(y).alias("sy"),
                F.sum(x * y).alias("sxy"),
                F.sum(x * x).alias("sxx"),
                F.sum(y * y).alias("syy"),
            )
            cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
            vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
            vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
            row = m.select(
                F.lit(types[i]).alias("type_a"),
                F.lit(types[j]).alias("type_b"),
                F.col("n").alias("n_days"),
                F.round(F.try_divide(cov, F.sqrt(vx * vy)), 6).alias(
                    "corr"
                ),
            )
            rows = row if rows is None else rows.unionAll(row)
    return rows


def sql_corr_matrix_daily_types(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`corr_matrix_daily_types` — the pivot and
    pair fold expressed dynamically over the type dimension (a
    type-grain correlated list; the calendar spine and the moment
    arithmetic match the Spark side exactly)."""
    return f"""
    WITH types AS (
        SELECT DISTINCT {type_col} AS t FROM {table}
        WHERE {type_col} IS NOT NULL
    ), counts AS (
        SELECT CAST({ts_col} AS DATE) AS d, {type_col} AS t,
               count(*) AS c
        FROM {table}
        WHERE {ts_col} IS NOT NULL AND {type_col} IS NOT NULL
        GROUP BY 1, 2
    ), cal AS (
        SELECT unnest(generate_series(min(d), max(d),
                                      INTERVAL 1 DAY))::DATE AS d
        FROM counts
    ), spine AS (
        SELECT cal.d, types.t,
               coalesce(counts.c, 0) AS c
        FROM cal CROSS JOIN types
        LEFT JOIN counts ON cal.d = counts.d AND types.t = counts.t
    ), pairs AS (
        SELECT a.t AS type_a, b.t AS type_b,
            count(*) AS n,
            sum(CAST(a.c AS DOUBLE)) AS sx,
            sum(CAST(b.c AS DOUBLE)) AS sy,
            sum(CAST(a.c AS DOUBLE) * b.c) AS sxy,
            sum(CAST(a.c AS DOUBLE) * a.c) AS sxx,
            sum(CAST(b.c AS DOUBLE) * b.c) AS syy
        FROM spine a JOIN spine b ON a.d = b.d AND a.t < b.t
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n AS n_days,
        round((n * sxy - sx * sy)
              / NULLIF(sqrt((n * sxx - sx * sx)
                            * (n * syy - sy * sy)), 0.0), 6) AS corr
    FROM pairs
    """


# ---------------------------------------------------------------------------
# r12d: Mann-Kendall trend test — the nonparametric monotone-trend gate
# ---------------------------------------------------------------------------


def mann_kendall_daily(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Mann-Kendall monotone-trend test on the calendar-spined daily
    count series: the rank-based (distribution-free) answer to "is
    this series trending at all", the significance gate in front of
    :func:`theilsen_daily_trend`'s magnitude estimate (Sen's slope is
    the canonical companion estimator).

        S = Σ_{i<j} sign(c_j − c_i)
        Var(S) = (n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)) / 18
        z = (S − sign(S)) / √Var(S)            (continuity-corrected)

    with the tie term over the groups of equal counts and the p-value
    from the shared A&S 26.2.17 polynomial — identical literals both
    engines. Plan: ONE fact pass to daily counts, then an O(days²)
    self-join on the DAY grain (365² ≈ 133k pairs for a year — theilsen
    already set this precedent) plus a count-grain tie aggregate; no
    second fact scan. Returns one row (n_days, s_stat, var_s, z,
    p_value, trend ∈ {'increasing','decreasing','no trend'} at p<0.05),
    6dp."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    series = pooled_persist(_daily_series(df, ts_col))
    a, bf = series.alias("a"), series.alias("b")
    s_fold = (
        a.join(bf, F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.signum(
                    F.col("b.c").cast("double") - F.col("a.c")
                ).cast("long")
            ).alias("s_stat")
        )
    )
    ties = (
        series.groupBy("c")
        .agg(F.count(F.lit(1)).cast("double").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum("t").alias("n"),
        )
    )
    j = s_fold.crossJoin(F.broadcast(ties))
    n = F.col("n")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / 18.0
    z = F.try_divide(
        F.col("s_stat") - F.signum(F.col("s_stat").cast("double")),
        F.sqrt(var_s),
    )
    out = j.select(
        n.cast("long").alias("n_days"),
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        z.alias("_z"),
    ).withColumn("_az", F.abs(F.col("_z")))
    p = F.expr("2.0 * " + _phi_upper_sql("_az"))
    return out.select(
        "n_days",
        "s_stat",
        "var_s",
        "z",
        F.round(p, 6).alias("p_value"),
        F.when(p >= 0.05, F.lit("no trend"))
        .when(F.col("_z") > 0, F.lit("increasing"))
        .when(F.col("_z") < 0, F.lit("decreasing"))
        .otherwise(F.lit("no trend"))
        .alias("trend"),
    )


def sql_mann_kendall_daily(
    table: str = "events", ts_col: str = "ts"
) -> str:
    """DuckDB replay of :func:`mann_kendall_daily` — same spine, same
    pair census, same tie correction and A&S polynomial."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    return f"""
    WITH {_sql_daily_series(table, ts_col, '1=1')}, s_fold AS (
        -- outer CAST: DuckDB sum(BIGINT) is HUGEINT (pandas float64);
        -- Spark's is LONG — dtype parity for the driver's hash
        SELECT CAST(sum(CAST(sign(CAST(b.c AS DOUBLE) - a.c) AS BIGINT))
                    AS BIGINT) AS s_stat
        FROM series a JOIN series b ON a.d < b.d
    ), ties AS (
        SELECT sum(t * (t - 1) * (2 * t + 5)) AS tie_term, sum(t) AS n
        FROM (SELECT CAST(count(*) AS DOUBLE) AS t
              FROM series GROUP BY c)
    ), stat AS (
        SELECT CAST(n AS BIGINT) AS n_days, s_stat,
            (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0 AS var_s,
            (s_stat - sign(CAST(s_stat AS DOUBLE)))
                / nullif(sqrt((n * (n - 1) * (2 * n + 5) - tie_term)
                              / 18.0), 0.0) AS z
        FROM s_fold CROSS JOIN ties
    ), withp AS (
        SELECT n_days, s_stat, round(var_s, 6) AS var_s,
            round(z, 6) AS z, z AS _z,
            2.0 * {_phi_upper_sql('abs(z)')} AS p
        FROM stat
    )
    SELECT n_days, s_stat, var_s, z, round(p, 6) AS p_value,
        CASE WHEN p >= 0.05 THEN 'no trend'
             WHEN _z > 0 THEN 'increasing'
             WHEN _z < 0 THEN 'decreasing'
             ELSE 'no trend' END AS trend
    FROM withp
    """


# ---------------------------------------------------------------------------
# r12d: Gumbel block maxima — extreme-value return levels
# ---------------------------------------------------------------------------


def gumbel_block_maxima(
    df: DataFrame,
    ts_col: str = "ts",
    block_days: int = 7,
    return_periods: tuple = (4, 12, 52),
) -> DataFrame:
    """Extreme-value analysis of the daily count series: weekly block
    maxima fitted to a Gumbel distribution by the method of moments —
    the capacity-planning readout ("what daily peak should we expect
    once a quarter / once a year") that a mean-based monitor
    structurally cannot give.

        β = s·√6/π,  μ = m − γ·β            (γ = Euler-Mascheroni)
        level(T) = μ − β·ln(−ln(1 − 1/T))

    over the block maxima's sample mean m and SAMPLE stddev s. Blocks
    are ``block_days``-wide windows of the calendar spine anchored at
    the first day (datediff // block_days — deterministic, both
    engines integer-divide the same nonnegative values). The last
    partial block is KEPT (documented bias toward lower maxima; the
    oracle replays it identically).

    Plan: one fact pass to daily counts, block-grain max aggregate,
    1-row moment fold, then a broadcast grid join over the
    ``return_periods`` literals. Returns one row per return period
    (t_blocks, mu, beta, n_blocks, return_level), 6dp; a single block
    (undefined stddev) degrades β and the levels to NULL via the
    sample-variance try_divide."""
    series = _daily_series(df, ts_col)
    bounds = series.agg(F.min("d").alias("_d0"))
    blocks = (
        series.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.floor(
                F.datediff(F.col("d"), F.col("_d0"))
                / F.lit(block_days)
            ).alias("blk")
        )
        .agg(F.max("c").cast("double").alias("mx"))
    )
    mom = blocks.agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.avg("mx").alias("m"),
        F.sum(F.col("mx") * F.col("mx")).alias("sxx"),
        F.sum("mx").alias("sx"),
    )
    nb = F.col("nb")
    var = F.try_divide(
        F.col("sxx") - F.try_divide(F.col("sx") * F.col("sx"), nb),
        nb - 1,
    )
    _EULER = 0.5772156649015329
    _SQRT6_PI = 0.7796968012336293  # sqrt(6)/pi
    beta = F.sqrt(var) * F.lit(_SQRT6_PI)
    mu = F.col("m") - F.lit(_EULER) * beta
    params = mom.select(
        nb.cast("long").alias("n_blocks"),
        F.round(mu, 6).alias("mu"),
        F.round(beta, 6).alias("beta"),
        mu.alias("_mu"),
        beta.alias("_beta"),
    )
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(int(t),) for t in return_periods], "t_blocks int"
    )
    level = F.col("_mu") - F.col("_beta") * F.log(
        -F.log(1.0 - F.try_divide(F.lit(1.0), F.col("t_blocks")))
    )
    return (
        grid.crossJoin(F.broadcast(params))
        .select(
            "t_blocks",
            "n_blocks",
            "mu",
            "beta",
            F.round(level, 6).alias("return_level"),
        )
        .orderBy("t_blocks")
    )


def sql_gumbel_block_maxima(
    table: str = "events",
    ts_col: str = "ts",
    block_days: int = 7,
    return_periods: tuple = (4, 12, 52),
) -> str:
    """DuckDB replay of :func:`gumbel_block_maxima` — same spine,
    block anchor, moment algebra, and Euler/√6/π literals."""
    periods = ", ".join(f"({int(t)})" for t in return_periods)
    return f"""
    WITH {_sql_daily_series(table, ts_col, '1=1')}, blocks AS (
        SELECT CAST(floor(datediff('day', d0._d0, series.d)
                          / {block_days}) AS BIGINT) AS blk,
            CAST(max(c) AS DOUBLE) AS mx
        FROM series CROSS JOIN
            (SELECT min(d) AS _d0 FROM series) d0
        GROUP BY 1
    ), mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS nb, avg(mx) AS m,
            sum(mx * mx) AS sxx, sum(mx) AS sx
        FROM blocks
    ), params AS (
        SELECT CAST(nb AS BIGINT) AS n_blocks,
            m - 0.5772156649015329 *
                (sqrt((sxx - sx * sx / nb) / nullif(nb - 1, 0.0))
                 * 0.7796968012336293) AS _mu,
            sqrt((sxx - sx * sx / nb) / nullif(nb - 1, 0.0))
                * 0.7796968012336293 AS _beta
        FROM mom
    )
    SELECT t.t_blocks, p.n_blocks, round(p._mu, 6) AS mu,
        round(p._beta, 6) AS beta,
        round(p._mu - p._beta
              * ln(-ln(1.0 - 1.0 / t.t_blocks)), 6) AS return_level
    FROM (VALUES {periods}) t(t_blocks) CROSS JOIN params p
    ORDER BY t.t_blocks
    """


# ---------------------------------------------------------------------------
# r12d: two-feature OLS via normal equations — closed-form regression
# ---------------------------------------------------------------------------


def ols_two_feature(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    y_type: str = "purchase",
    x1_type: str = "view",
    x2_type: str = "click",
) -> DataFrame:
    """Two-feature ordinary least squares with intercept, fit in CLOSED
    FORM from sufficient statistics: per-user purchase value regressed
    on per-user view and click counts — the multivariate sibling of
    :func:`ols_trend_by_key` (one regressor) that answers "which
    engagement signal predicts spend, holding the other fixed".

    The 3×3 normal equations X'X·b = X'y are solved by Cramer's rule —
    nine shared sums, four 3×3 determinants, zero iteration — so both
    engines replay the identical algebra and a singular design
    (collinear or constant features) degrades every coefficient to
    NULL via the det(X'X) try_divide, the nullif contract everywhere
    else in this module. R² = 1 − SSE/SST with SSE = Σy² − b·X'y
    (the standard quadratic-form identity; no residual pass).

    Plan: one fact pass → user-grain conditional fold (the only fact
    shuffle) → one 9-sum aggregate → one-row arithmetic. At 100 TB the
    user fold is the natural shuffle; everything after is one row.
    Returns one row (n_users, b0, b1, b2, r2), 6dp."""
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.sum(
            F.when(F.col(type_col) == y_type, F.col(value_col)).otherwise(
                0.0
            )
        ).alias("y"),
        F.sum((F.col(type_col) == x1_type).cast("int"))
        .cast("double")
        .alias("x1"),
        F.sum((F.col(type_col) == x2_type).cast("int"))
        .cast("double")
        .alias("x2"),
    )
    y, x1, x2 = F.col("y"), F.col("x1"), F.col("x2")
    s = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
        )

    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    b0 = F.try_divide(det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22), det)
    b1 = F.try_divide(det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22), det)
    b2 = F.try_divide(det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y), det)
    sse = F.col("syy") - (b0 * sy + b1 * s1y + b2 * s2y)
    sst = F.col("syy") - F.try_divide(sy * sy, n)
    r2 = 1.0 - F.try_divide(sse, sst)
    return s.select(
        n.cast("long").alias("n_users"),
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(r2, 6).alias("r2"),
    )


def sql_ols_two_feature(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    y_type: str = "purchase",
    x1_type: str = "view",
    x2_type: str = "click",
) -> str:
    """DuckDB replay of :func:`ols_two_feature` — same nine sums, same
    Cramer determinants, NULLIF on the singular design."""

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h})"
            f" - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    det = det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    b0 = det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
    b1 = det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
    b2 = det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")
    return f"""
    WITH per_user AS (
        SELECT
            sum(CASE WHEN {type_col} = '{y_type}'
                     THEN {value_col} ELSE 0.0 END) AS y,
            CAST(sum(CASE WHEN {type_col} = '{x1_type}'
                          THEN 1 ELSE 0 END) AS DOUBLE) AS x1,
            CAST(sum(CASE WHEN {type_col} = '{x2_type}'
                          THEN 1 ELSE 0 END) AS DOUBLE) AS x2
        FROM {table} GROUP BY {user_col}
    ), s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
            sum(x1) AS s1, sum(x2) AS s2,
            sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
            sum(x2 * x2) AS s22, sum(y) AS sy,
            sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
        FROM per_user
    ), coefs AS (
        SELECT n, sy, s1y, s2y, syy,
            {b0} / nullif({det}, 0.0) AS b0,
            {b1} / nullif({det}, 0.0) AS b1,
            {b2} / nullif({det}, 0.0) AS b2
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_users,
        round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
        round(1.0 - (syy - (b0 * sy + b1 * s1y + b2 * s2y))
                    / nullif(syy - sy * sy / n, 0.0), 6) AS r2
    FROM coefs
    """


# ---------------------------------------------------------------------------
# r12g: partial autocorrelation — the AR-order probe
# ---------------------------------------------------------------------------


def pacf_daily(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Partial autocorrelation of the daily count series at lags 1..3
    via the Durbin-Levinson recursion UNROLLED to closed form — the
    AR-order diagnostic next to :func:`autocorr_daily_counts` (ACF says
    "correlated at lag k"; PACF says "correlated at lag k AFTER
    controlling for the shorter lags", which is what picks p for an
    AR(p) model):

        φ₁₁ = r₁
        φ₂₂ = (r₂ − r₁²) / (1 − r₁²),   φ₂₁ = r₁·(1 − φ₂₂)
        φ₃₃ = (r₃ − φ₂₁·r₂ − φ₂₂·r₁) / (1 − φ₂₁·r₁ − φ₂₂·r₂)

    with r_k the global-mean autocovariance ratio
    Σ_{t≥k}(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)² (the standard stationary
    form — one shared denominator, unlike the ACF operator's
    per-window-margin pairs flavor; both are textbook, the contract
    here is D-L compatibility). Degenerate series (zero variance, or
    |r₁| = 1) degrade to NULL via try_divide.

    Plan: one fact pass to the spined series, one 1-row mean broadcast,
    THREE lag windows folded in ONE aggregate, one-row recursion
    algebra, 3-row unpivot. Returns (lag, pacf), 6dp."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    series = pooled_persist(_daily_series(df, ts_col))
    mean = series.agg(
        (F.sum("c") / F.count(F.lit(1))).alias("ybar")
    )
    w = Window.orderBy("d")
    dv = (
        series.crossJoin(F.broadcast(mean))
        .select((F.col("c") - F.col("ybar")).alias("y"), "d")
        .select(
            "y",
            F.lag("y", 1).over(w).alias("l1"),
            F.lag("y", 2).over(w).alias("l2"),
            F.lag("y", 3).over(w).alias("l3"),
        )
    )
    sums = dv.agg(
        F.sum(F.col("y") * F.col("y")).alias("c0"),
        F.sum(F.col("y") * F.col("l1")).alias("c1"),
        F.sum(F.col("y") * F.col("l2")).alias("c2"),
        F.sum(F.col("y") * F.col("l3")).alias("c3"),
    )
    r1 = F.try_divide(F.col("c1"), F.col("c0"))
    r2 = F.try_divide(F.col("c2"), F.col("c0"))
    r3 = F.try_divide(F.col("c3"), F.col("c0"))
    p11 = r1
    p22 = F.try_divide(r2 - r1 * r1, 1.0 - r1 * r1)
    p21 = r1 * (1.0 - p22)
    p33 = F.try_divide(
        r3 - p21 * r2 - p22 * r1, 1.0 - p21 * r1 - p22 * r2
    )
    return sums.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("lag"), F.round(p11, 6).alias("pacf")
                ),
                F.struct(
                    F.lit(2).alias("lag"), F.round(p22, 6).alias("pacf")
                ),
                F.struct(
                    F.lit(3).alias("lag"), F.round(p33, 6).alias("pacf")
                ),
            )
        ).alias("s")
    ).select("s.lag", "s.pacf")


def sql_pacf_daily(table: str = "events", ts_col: str = "ts") -> str:
    """DuckDB replay of :func:`pacf_daily` — same spine, global-mean
    autocovariances, and unrolled Durbin-Levinson algebra."""
    return f"""
    WITH {_sql_daily_series(table, ts_col, '1=1')}, mean AS (
        SELECT sum(c) / CAST(count(*) AS DOUBLE) AS ybar FROM series
    ), dv AS (
        SELECT y,
            lag(y, 1) OVER (ORDER BY d) AS l1,
            lag(y, 2) OVER (ORDER BY d) AS l2,
            lag(y, 3) OVER (ORDER BY d) AS l3
        FROM (SELECT series.d, series.c - mean.ybar AS y
              FROM series CROSS JOIN mean)
    ), sums AS (
        SELECT sum(y * y) AS c0, sum(y * l1) AS c1,
            sum(y * l2) AS c2, sum(y * l3) AS c3
        FROM dv
    ), rr AS (
        SELECT c1 / nullif(c0, 0.0) AS r1, c2 / nullif(c0, 0.0) AS r2,
            c3 / nullif(c0, 0.0) AS r3
        FROM sums
    ), dl AS (
        SELECT r1, r2, r3,
            (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0) AS p22
        FROM rr
    ), dl2 AS (
        SELECT r1, r2, r3, p22, r1 * (1.0 - p22) AS p21 FROM dl
    )
    SELECT lag, pacf FROM (
        SELECT 1 AS lag, round(r1, 6) AS pacf FROM dl2
        UNION ALL
        SELECT 2, round(p22, 6) FROM dl2
        UNION ALL
        SELECT 3, round((r3 - p21 * r2 - p22 * r1)
                        / nullif(1.0 - p21 * r1 - p22 * r2, 0.0), 6)
        FROM dl2
    )
    """


# ---------------------------------------------------------------------------
# r12h: Granger-style predictive-causality F-test
# ---------------------------------------------------------------------------


def granger_daily(
    df: DataFrame,
    cause_type: str = "view",
    effect_type: str = "purchase",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Granger(1) predictive-causality test on the daily pair series:
    does YESTERDAY's ``cause_type`` count improve today's
    ``effect_type`` forecast beyond what yesterday's effect count
    already gives —

        restricted:    y_t ~ 1 + y_{t−1}                (SSE_r)
        unrestricted:  y_t ~ 1 + y_{t−1} + x_{t−1}      (SSE_u)
        F = (SSE_r − SSE_u) / (SSE_u / (n − 3))

    the DIRECTIONAL upgrade of :func:`xcorr_daily` (correlation at a
    lag is symmetric; Granger asks whether x adds information GIVEN
    y's own history). Both regressions are closed-form: the restricted
    from the five 1-feature sums, the unrestricted from the nine
    2-feature sums via Cramer (the :func:`ols_two_feature` algebra) —
    identical arithmetic on both engines; a singular design (constant
    series) degrades to NULL via try_divide.

    Plan: ONE conditional date aggregate (the shared `_daily_pair`
    spine — the only fact pass), two lag windows, one 11-sum aggregate,
    one-row algebra. Returns one row (n, sse_r, sse_u, f_stat, df2,
    beta_cause), 6dp; beta_cause is the unrestricted x-lag coefficient
    (sign and size of the flow)."""
    from pyspark.sql import Window

    pair = _daily_pair(df, cause_type, effect_type, ts_col, type_col)
    w = Window.orderBy("d")
    rows = pair.select(
        F.col("cb").cast("double").alias("y"),
        F.lag("cb").over(w).cast("double").alias("yl"),
        F.lag("ca").over(w).cast("double").alias("xl"),
    ).filter(F.col("yl").isNotNull())
    s = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("yl").alias("s1"),
        F.sum("xl").alias("s2"),
        F.sum(F.col("yl") * F.col("yl")).alias("s11"),
        F.sum(F.col("yl") * F.col("xl")).alias("s12"),
        F.sum(F.col("xl") * F.col("xl")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("yl") * F.col("y")).alias("s1y"),
        F.sum(F.col("xl") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
        )

    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y, syy = (
        F.col("sy"), F.col("s1y"), F.col("s2y"), F.col("syy")
    )
    # restricted: y ~ 1 + yl
    b_r = F.try_divide(n * s1y - s1 * sy, n * s11 - s1 * s1)
    a_r = (sy - b_r * s1) / n
    sse_r = syy - a_r * sy - b_r * s1y
    # unrestricted: y ~ 1 + yl + xl (Cramer, the ols_two_feature algebra)
    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    b0 = F.try_divide(det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22), det)
    b1 = F.try_divide(det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22), det)
    b2 = F.try_divide(det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y), det)
    sse_u = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    f_stat = F.try_divide(
        sse_r - sse_u, F.try_divide(sse_u, n - 3.0)
    )
    return s.select(
        n.cast("long").alias("n"),
        F.round(sse_r, 6).alias("sse_r"),
        F.round(sse_u, 6).alias("sse_u"),
        F.round(f_stat, 6).alias("f_stat"),
        (n - 3.0).cast("long").alias("df2"),
        F.round(b2, 6).alias("beta_cause"),
    )


def sql_granger_daily(
    cause_type: str = "view",
    effect_type: str = "purchase",
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`granger_daily` — same spine, lags,
    sums, Cramer determinants, and F arithmetic."""

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h})"
            f" - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    det = det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    b0 = det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
    b1 = det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
    b2 = det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")
    return f"""
    WITH {_sql_daily_pair(cause_type, effect_type, table, ts_col,
                          type_col)}, lagged AS (
        SELECT CAST(cb AS DOUBLE) AS y,
            CAST(lag(cb) OVER (ORDER BY d) AS DOUBLE) AS yl,
            CAST(lag(ca) OVER (ORDER BY d) AS DOUBLE) AS xl
        FROM daily
        QUALIFY yl IS NOT NULL
    ), s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
            sum(yl) AS s1, sum(xl) AS s2,
            sum(yl * yl) AS s11, sum(yl * xl) AS s12,
            sum(xl * xl) AS s22, sum(y) AS sy,
            sum(yl * y) AS s1y, sum(xl * y) AS s2y, sum(y * y) AS syy
        FROM lagged
    ), fits AS (
        SELECT n, sy, s1y, s2y, syy,
            (n * s1y - s1 * sy) / nullif(n * s11 - s1 * s1, 0.0) AS b_r,
            {b0} / nullif({det}, 0.0) AS b0,
            {b1} / nullif({det}, 0.0) AS b1,
            {b2} / nullif({det}, 0.0) AS b2,
            s1
        FROM s
    ), sses AS (
        SELECT n,
            syy - ((sy - b_r * s1) / n) * sy - b_r * s1y AS sse_r,
            syy - (b0 * sy + b1 * s1y + b2 * s2y) AS sse_u,
            b2
        FROM fits
    )
    SELECT CAST(n AS BIGINT) AS n,
        round(sse_r, 6) AS sse_r, round(sse_u, 6) AS sse_u,
        round((sse_r - sse_u)
              / nullif(sse_u / nullif(n - 3.0, 0.0), 0.0), 6) AS f_stat,
        CAST(n - 3.0 AS BIGINT) AS df2,
        round(b2, 6) AS beta_cause
    FROM sses
    """


# ---------------------------------------------------------------------------
# r12i: index-of-dispersion test — is this count series even Poisson
# ---------------------------------------------------------------------------


def _day_type_spine(
    df: DataFrame, ts_col: str, type_col: str
) -> DataFrame:
    """THE zero-filled (calendar day × event type) spine shared by
    :func:`dispersion_test_by_type`, :func:`friedman_test_daily_types`
    and :func:`cronbach_alpha_daily_types` (r12 third review pass: the
    block had grown four inline copies — the same drift class the
    module's `_daily_series` note calls out).  One (day, type)
    conditional aggregate (the only fact pass), the global calendar
    crossed with the type list, missing cells = genuine zeros.
    Returns (d, typ, c bigint); the per-(day,type) counts frame is
    pooled-persisted (it feeds the bounds aggregate, the type list,
    and the spine join)."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    counts = pooled_persist(
        df.filter(F.col(ts_col).isNotNull() & F.col(type_col).isNotNull())
        .groupBy(
            F.to_date(ts_col).alias("d"), F.col(type_col).alias("typ")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cal = counts.agg(F.min("d").alias("lo"), F.max("d").alias("hi")).select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    types = counts.select("typ").distinct()
    return cal.crossJoin(types).join(counts, ["d", "typ"], "left").select(
        "d", "typ", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )


def _sql_day_type_spine(
    table: str, ts_col: str, type_col: str
) -> str:
    """DuckDB twin of :func:`_day_type_spine` — emits the ``counts`` +
    ``cal`` + ``tspine`` CTE bodies (caller wraps in WITH)."""
    return f"""counts AS (
        SELECT CAST({ts_col} AS DATE) AS d, {type_col} AS typ,
            count(*) AS c
        FROM {table}
        WHERE {ts_col} IS NOT NULL AND {type_col} IS NOT NULL
        GROUP BY 1, 2
    ), cal AS (
        SELECT unnest(generate_series(min(d), max(d),
                                      INTERVAL 1 DAY))::DATE AS d
        FROM counts
    ), tspine AS (
        SELECT cal.d, t.typ, coalesce(counts.c, 0) AS c
        FROM cal CROSS JOIN (SELECT DISTINCT typ FROM counts) t
        LEFT JOIN counts ON counts.d = cal.d AND counts.typ = t.typ
    )"""


def dispersion_test_by_type(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Index-of-dispersion (variance-to-mean) test per event type's
    daily count series: D = s²/x̄ with the chi-square statistic
    (n−1)·D ~ χ²_{n−1} under the Poisson null — the modeling GATE in
    front of every "events are Poisson" assumption downstream (rate
    CIs, anomaly thresholds, the p-chart): D ≫ 1 is overdispersion
    (bursty, negative-binomial territory — burstiness_hist_users'
    population-level sibling), D ≪ 1 under-dispersion (throttled or
    deduplicated feeds).

    The verdict uses the normal approximation to χ²_{n−1} via the
    shared A&S polynomial (√(2χ²) − √(2(n−1)−1) ~ N(0,1), Fisher's
    approximation — identical literals both engines).

    Plan: one conditional date aggregate per type (single fact pass),
    calendar-spined (missing days are genuine zeros), then a
    type-grain moment fold. Returns one row per type
    (event_type, n_days, mean, variance, dispersion, chi2, z, p_value),
    6dp."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    spine = _day_type_spine(df, ts_col, type_col).select(
        "typ", F.col("c").cast("double").alias("c")
    )
    mom = spine.groupBy("typ").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    n = F.col("n")
    mean = F.col("s") / n
    var = F.try_divide(
        F.col("ss") - F.try_divide(F.col("s") * F.col("s"), n), n - 1.0
    )
    disp = F.try_divide(var, mean)
    chi2 = (n - 1.0) * disp
    z = F.sqrt(2.0 * chi2) - F.sqrt(2.0 * (n - 1.0) - 1.0)
    out = mom.select(
        F.col("typ").alias("event_type"),
        n.cast("long").alias("n_days"),
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("variance"),
        F.round(disp, 6).alias("dispersion"),
        F.round(chi2, 6).alias("chi2"),
        F.round(z, 6).alias("z"),
        z.alias("_z"),
    ).withColumn("_az", F.abs(F.col("_z")))
    return out.select(
        "event_type",
        "n_days",
        "mean",
        "variance",
        "dispersion",
        "chi2",
        "z",
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_dispersion_test_by_type(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`dispersion_test_by_type` — same spine,
    moments, Fisher approximation, and A&S polynomial."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    return f"""
    WITH {_sql_day_type_spine(table, ts_col, type_col)}, spine AS (
        SELECT typ, CAST(c AS DOUBLE) AS c FROM tspine
    ), mom AS (
        SELECT typ, CAST(count(*) AS DOUBLE) AS n, sum(c) AS s,
            sum(c * c) AS ss
        FROM spine GROUP BY 1
    ), stat AS (
        SELECT typ, n, s / n AS mean,
            (ss - s * s / n) / nullif(n - 1.0, 0.0) AS var
        FROM mom
    ), full_stat AS (
        -- n >= 2 guard on the Fisher term: sqrt(2(n-1)-1) is sqrt(-1)
        -- at n = 1, which DuckDB raises on where Spark's NaN degrades
        -- to NULL (r12 second review pass); var is NULL there anyway
        SELECT typ, n, mean, var,
            var / nullif(mean, 0.0) AS disp,
            (n - 1.0) * var / nullif(mean, 0.0) AS chi2,
            CASE WHEN n >= 2.0 THEN
                sqrt(2.0 * (n - 1.0) * var / nullif(mean, 0.0))
                - sqrt(2.0 * (n - 1.0) - 1.0) END AS z
        FROM stat
    )
    SELECT typ AS event_type, CAST(n AS BIGINT) AS n_days,
        round(mean, 6) AS mean, round(var, 6) AS variance,
        round(disp, 6) AS dispersion, round(chi2, 6) AS chi2,
        round(z, 6) AS z,
        round(2.0 * {_phi_upper_sql('abs(z)')}, 6) AS p_value
    FROM full_stat
    """


# ---------------------------------------------------------------------------
# r12j: Friedman test — do the event types rank the days the same way
# ---------------------------------------------------------------------------


def friedman_test_daily_types(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Friedman rank test across event types with DAYS as the repeated
    blocks: within each day, rank the k types by their count (average
    ranks on ties), then test whether some type consistently ranks
    high —

        χ²_F = 12n/(k(k+1)) · Σ_j (R̄_j − (k+1)/2)²   (k−1 dof)

    the nonparametric repeated-measures ANOVA: the parametric
    :func:`anova_oneway` compares LEVELS (error events may just be
    rarer); this compares within-day ORDERINGS, immune to any
    day-level scale effect (traffic spikes hit all types). Tie
    correction: the average-rank (`avg_rank`-style) assignment keeps
    the rank sum per day exactly k(k+1)/2, so the statistic stays
    exact under ties; p via the shared Fisher χ² normal approximation
    (A&S literals, the dispersion-test convention).

    Plan: one (day, type) conditional aggregate (the only fact pass),
    the (calendar × types) zero-filled spine, a per-day rank window
    (PARTITIONED by day — never global), a type-grain mean-rank fold,
    one-row χ². Returns one row (n_days, k_types, chi2, df, z,
    p_value), 6dp."""
    from pyspark.sql import Window

    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    spine = _day_type_spine(df, ts_col, type_col)
    # average rank under ties: rank + (count_of_equal - 1)/2 — the
    # module's shared avg-rank identity, per-day partition
    w_day = Window.partitionBy("d").orderBy("c")
    w_tie = Window.partitionBy("d", "c")
    ranked = spine.select(
        "d",
        "typ",
        (
            F.rank().over(w_day)
            + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
        ).alias("r"),
    )
    per_type = ranked.groupBy("typ").agg(
        F.avg("r").alias("rbar"), F.count(F.lit(1)).alias("n")
    )
    agg = per_type.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.max("n").cast("double").alias("n"),
        F.sum(
            (F.col("rbar") - F.lit(0.0)) * F.col("rbar")
        ).alias("_srr"),  # Σ rbar² (center applied below)
    )
    k, n = F.col("k"), F.col("n")
    center = (k + 1.0) / 2.0
    # Σ (rbar − c)² = Σ rbar² − 2c·Σrbar + k·c²; Σrbar = k(k+1)/2 / 1
    # exactly (rank sums per day are k(k+1)/2, so mean of means is c)
    ssq = F.col("_srr") - k * center * center
    # try_divide + k>=2 gate: ANSI double `/` RAISES on k=0 (empty
    # input) and sqrt(2·dof−1) is sqrt(-1) at k=1 — degrade to NULL,
    # the dispersion-test convention
    chi2 = F.try_divide(12.0 * n, k * (k + 1.0)) * ssq
    dof = k - 1.0
    # greatest(chi2, 0): the centered-sum difference can cancel a few
    # ulps negative at chi2 ~ 0 (the KW clamp's sibling)
    z = F.when(
        k >= 2.0,
        F.sqrt(2.0 * F.greatest(chi2, F.lit(0.0)))
        - F.sqrt(2.0 * dof - 1.0),
    )
    out = agg.select(
        n.cast("long").alias("n_days"),
        k.cast("long").alias("k_types"),
        F.round(chi2, 6).alias("chi2"),
        dof.cast("long").alias("df"),
        F.round(z, 6).alias("z"),
        z.alias("_z"),
    ).withColumn("_az", F.abs(F.col("_z")))
    return out.select(
        "n_days",
        "k_types",
        "chi2",
        "df",
        "z",
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_friedman_test_daily_types(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`friedman_test_daily_types` — same spine,
    average ranks, centered sum identity, Fisher approximation."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    return f"""
    WITH {_sql_day_type_spine(table, ts_col, type_col)}, ranked AS (
        SELECT d, typ,
            rank() OVER (PARTITION BY d ORDER BY c)
            + (count(*) OVER (PARTITION BY d, c) - 1) / 2.0 AS r
        FROM tspine
    ), per_type AS (
        SELECT typ, avg(r) AS rbar, count(*) AS n FROM ranked GROUP BY 1
    ), agg AS (
        SELECT CAST(count(*) AS DOUBLE) AS k,
            CAST(max(n) AS DOUBLE) AS n,
            sum(rbar * rbar) AS srr
        FROM per_type
    ), stat AS (
        SELECT CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k_types,
            12.0 * n / nullif(k * (k + 1.0), 0.0)
                * (srr - k * ((k + 1.0) / 2.0) * ((k + 1.0) / 2.0))
                AS chi2,
            CAST(k - 1.0 AS BIGINT) AS df, k
        FROM agg
    ), withz AS (
        -- layered over the computed chi2 (single definition) with the
        -- greatest() clamp — the KW oracle's shape
        SELECT n_days, k_types, chi2, df,
            CASE WHEN k >= 2.0 THEN
                sqrt(2.0 * greatest(chi2, 0.0))
                - sqrt(2.0 * (k - 1.0) - 1.0) END AS z
        FROM stat
    )
    SELECT n_days, k_types, round(chi2, 6) AS chi2, df,
        round(z, 6) AS z,
        round(2.0 * {_phi_upper_sql('abs(z)')}, 6) AS p_value
    FROM withz
    """


# ---------------------------------------------------------------------------
# r12j: Cronbach's alpha — do the type series measure one "activity" factor
# ---------------------------------------------------------------------------


def cronbach_alpha_daily_types(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cronbach's α over the event types' daily count series, treating
    each type as an "item" and each day as a respondent:

        α = k/(k−1) · (1 − Σ_i var_i / var_total)

    where var_total is the variance of the daily SUM across types —
    α near 1 means the types co-move (one underlying traffic factor:
    any one series is a good proxy), α near 0 means they carry
    independent signals (monitor all of them). The scalar companion to
    :func:`corr_matrix_daily_types`' pairwise matrix.

    Population variances on both engines (the moments convention —
    the k/(k−1) factor already carries the small-sample correction).
    Plan: one (day, type) conditional aggregate, the zero-filled
    spine, one per-type moment fold + one day-sum moment fold.
    Returns one row (n_days, k_types, sum_item_var, total_var, alpha),
    6dp; a single type or zero total variance degrades α to NULL."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    spine = pooled_persist(
        _day_type_spine(df, ts_col, type_col).select(
            "d", "typ", F.col("c").cast("double").alias("c")
        )
    )
    per_item = spine.groupBy("typ").agg(
        (
            F.avg(F.col("c") * F.col("c")) - F.avg("c") * F.avg("c")
        ).alias("v")
    )
    item_fold = per_item.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("v").alias("sv"),
    )
    day_tot = spine.groupBy("d").agg(F.sum("c").alias("s"))
    tot_fold = day_tot.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (
            F.avg(F.col("s") * F.col("s")) - F.avg("s") * F.avg("s")
        ).alias("vt"),
    )
    j = item_fold.crossJoin(tot_fold)
    k = F.col("k")
    alpha = F.try_divide(k, k - 1.0) * (
        1.0 - F.try_divide(F.col("sv"), F.col("vt"))
    )
    return j.select(
        F.col("n").cast("long").alias("n_days"),
        k.cast("long").alias("k_types"),
        F.round(F.col("sv"), 6).alias("sum_item_var"),
        F.round(F.col("vt"), 6).alias("total_var"),
        F.round(alpha, 6).alias("alpha"),
    )


def sql_cronbach_alpha_daily_types(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`cronbach_alpha_daily_types` — same
    spine, population variances, and NULLIF degeneracy."""
    return f"""
    WITH {_sql_day_type_spine(table, ts_col, type_col)}, spine AS (
        SELECT d, typ, CAST(c AS DOUBLE) AS c FROM tspine
    ), item_fold AS (
        SELECT CAST(count(*) AS DOUBLE) AS k, sum(v) AS sv FROM (
            SELECT typ, avg(c * c) - avg(c) * avg(c) AS v
            FROM spine GROUP BY 1
        )
    ), tot_fold AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
            avg(s * s) - avg(s) * avg(s) AS vt
        FROM (SELECT d, sum(c) AS s FROM spine GROUP BY 1)
    )
    SELECT CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k_types,
        round(sv, 6) AS sum_item_var, round(vt, 6) AS total_var,
        round(k / nullif(k - 1.0, 0.0)
              * (1.0 - sv / nullif(vt, 0.0)), 6) AS alpha
    FROM item_fold CROSS JOIN tot_fold
    """


# ---------------------------------------------------------------------------
# r12j: Ljung-Box — joint "is there ANY autocorrelation" portmanteau test
# ---------------------------------------------------------------------------


def ljung_box_daily(
    df: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Ljung-Box portmanteau test on the daily count series: the JOINT
    null "no autocorrelation at any lag ≤ h" —

        Q = n(n+2) · Σ_{k=1..h} r_k² / (n−k)        (~χ²_h)

    the one-number gate in front of the per-lag ACF/PACF readouts
    (:func:`autocorr_daily_counts`, :func:`pacf_daily`): seven
    individually-insignificant r_k can be jointly damning, and a
    forecast-residual series that fails Ljung-Box still has structure
    left to model. r_k is the global-mean autocovariance ratio (the
    PACF convention — one shared denominator); p via the shared Fisher
    χ² normal approximation.

    Plan: one fact pass to the spined series, ``max_lag`` lag columns
    folded in ONE aggregate, one-row Q arithmetic. Returns one row
    (n_days, max_lag, q_stat, df, z, p_value), 6dp; a constant series
    (zero c0) degrades to NULL."""
    from pyspark.sql import Window

    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    series = pooled_persist(_daily_series(df, ts_col))
    mean = series.agg((F.sum("c") / F.count(F.lit(1))).alias("ybar"))
    w = Window.orderBy("d")
    dv = series.crossJoin(F.broadcast(mean)).select(
        (F.col("c") - F.col("ybar")).alias("y"), "d"
    )
    lags = dv.select(
        "y",
        *[
            F.lag("y", k).over(w).alias(f"l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    sums = lags.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("y") * F.col("y")).alias("c0"),
        *[
            F.sum(F.col("y") * F.col(f"l{k}")).alias(f"c{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    n = F.col("n")
    q = None
    for k in range(1, max_lag + 1):
        rk = F.try_divide(F.col(f"c{k}"), F.col("c0"))
        # try_divide: n <= max_lag makes (n − k) hit 0 and ANSI double
        # `/` raises — degrade to NULL like everything else
        term = F.try_divide(rk * rk, n - F.lit(float(k)))
        q = term if q is None else q + term
    import math

    q_stat = n * (n + 2.0) * q
    dof = float(max_lag)
    z = F.sqrt(2.0 * q_stat) - F.lit(math.sqrt(2.0 * dof - 1.0))
    out = sums.select(
        n.cast("long").alias("n_days"),
        F.lit(max_lag).alias("max_lag"),
        F.round(q_stat, 6).alias("q_stat"),
        F.lit(int(dof)).alias("df"),
        F.round(z, 6).alias("z"),
        z.alias("_z"),
    ).withColumn("_az", F.abs(F.col("_z")))
    return out.select(
        "n_days",
        "max_lag",
        "q_stat",
        "df",
        "z",
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_ljung_box_daily(
    table: str = "events",
    ts_col: str = "ts",
    max_lag: int = 7,
) -> str:
    """DuckDB replay of :func:`ljung_box_daily` — same spine, lag sums,
    Q arithmetic, Fisher approximation."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    lag_cols = ",\n            ".join(
        f"lag(y, {k}) OVER (ORDER BY d) AS l{k}"
        for k in range(1, max_lag + 1)
    )
    lag_sums = ",\n            ".join(
        f"sum(y * l{k}) AS c{k}" for k in range(1, max_lag + 1)
    )
    q_terms = " + ".join(
        f"(c{k} / nullif(c0, 0.0)) * (c{k} / nullif(c0, 0.0))"
        f" / nullif(n - {k}, 0.0)"
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH {_sql_daily_series(table, ts_col, '1=1')}, mean AS (
        SELECT sum(c) / CAST(count(*) AS DOUBLE) AS ybar FROM series
    ), dv AS (
        SELECT series.c - mean.ybar AS y, series.d
        FROM series CROSS JOIN mean
    ), lags AS (
        SELECT y,
            {lag_cols}
        FROM dv
    ), sums AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, sum(y * y) AS c0,
            {lag_sums}
        FROM lags
    ), stat AS (
        SELECT CAST(n AS BIGINT) AS n_days,
            n * (n + 2.0) * ({q_terms}) AS q_stat
        FROM sums
    ), withz AS (
        SELECT n_days, q_stat,
            sqrt(2.0 * q_stat)
                - sqrt(2.0 * {float(max_lag)!r} - 1.0) AS z
        FROM stat
    )
    SELECT n_days, {max_lag} AS max_lag, round(q_stat, 6) AS q_stat,
        {max_lag} AS df, round(z, 6) AS z,
        round(2.0 * {_phi_upper_sql('abs(z)')}, 6) AS p_value
    FROM withz
    """


# ---------------------------------------------------------------------------
# r12j: Wald-Wolfowitz runs test — randomness of the daily series
# ---------------------------------------------------------------------------


def runs_test_daily(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily count series against its
    MEDIAN: too FEW runs of consecutive above/below-median days means
    clustering (regimes, trends), too MANY means oscillation — the
    sign-only randomness check that sees structure the
    autocorrelation family can miss (and vice versa).

        E[R] = 2·n₊·n₋/n + 1
        Var[R] = 2n₊n₋(2n₊n₋ − n) / (n²(n−1))
        z = (R − E[R]) / √Var[R]

    Days exactly AT the median are dropped (the standard convention —
    a sign test has no sign there); the median is the exact
    order-statistic lower median of the day counts (deterministic
    integer grain, both engines agree). p via the shared A&S
    polynomial.

    Plan: one fact pass to the spined series, an order-statistic
    median (day-grain sort), one lag window for run boundaries, a
    one-row moment fold. Returns one row (n_days, n_above, n_below,
    n_runs, expected_runs, z, p_value), 6dp."""
    from pyspark.sql import Window

    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    series = pooled_persist(_daily_series(df, ts_col))
    w_m = Window.orderBy("c")
    med = (
        series.withColumn("_r", F.row_number().over(w_m))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(F.col("_r") == F.ceil(F.col("_n") / 2.0).cast("int"))
        .select(F.col("c").alias("_med"))
    )
    signed = (
        series.crossJoin(F.broadcast(med))
        .filter(F.col("c") != F.col("_med"))
        .select(
            "d", (F.col("c") > F.col("_med")).cast("int").alias("s")
        )
    )
    w_d = Window.orderBy("d")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(w_d).isNull()
            | (F.lag("s").over(w_d) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("s").cast("double").alias("np"),
        F.sum("new_run").alias("r"),
    )
    n, npos = F.col("n"), F.col("np")
    nneg = n - npos
    # try_divide: every day at the median leaves the signed frame
    # empty (n = 0) and ANSI double `/` raises
    er = F.try_divide(2.0 * npos * nneg, n) + 1.0
    vr = F.try_divide(
        2.0 * npos * nneg * (2.0 * npos * nneg - n),
        n * n * (n - 1.0),
    )
    z = F.try_divide(F.col("r") - er, F.sqrt(vr))
    out = agg.select(
        n.cast("long").alias("n_days"),
        npos.cast("long").alias("n_above"),
        nneg.cast("long").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.round(er, 6).alias("expected_runs"),
        F.round(z, 6).alias("z"),
        z.alias("_z"),
    ).withColumn("_az", F.abs(F.col("_z")))
    return out.select(
        "n_days",
        "n_above",
        "n_below",
        "n_runs",
        "expected_runs",
        "z",
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_runs_test_daily(
    table: str = "events",
    ts_col: str = "ts",
) -> str:
    """DuckDB replay of :func:`runs_test_daily` — same order-statistic
    median, sign filter, run-boundary lag, moment fold."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    return f"""
    WITH {_sql_daily_series(table, ts_col, '1=1')}, med AS (
        SELECT c AS _med FROM (
            SELECT c, row_number() OVER (ORDER BY c) AS _r,
                count(*) OVER () AS _n
            FROM series
        ) WHERE _r = CAST(ceil(_n / 2.0) AS INT)
    ), signed AS (
        SELECT series.d,
            CAST(series.c > med._med AS INT) AS s
        FROM series CROSS JOIN med
        WHERE series.c <> med._med
    ), runs AS (
        SELECT s,
            CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
                   OR lag(s) OVER (ORDER BY d) <> s
                 THEN 1 ELSE 0 END AS new_run
        FROM signed
    ), agg AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(s) AS DOUBLE) AS np,
            CAST(sum(new_run) AS BIGINT) AS r
        FROM runs
    ), stat AS (
        SELECT CAST(n AS BIGINT) AS n_days,
            CAST(np AS BIGINT) AS n_above,
            CAST(n - np AS BIGINT) AS n_below,
            r AS n_runs,
            2.0 * np * (n - np) / nullif(n, 0.0) + 1.0 AS er,
            (r - (2.0 * np * (n - np) / nullif(n, 0.0) + 1.0))
                / nullif(sqrt(
                    (2.0 * np * (n - np) * (2.0 * np * (n - np) - n))
                    / nullif(n * n * (n - 1.0), 0.0)), 0.0) AS z
        FROM agg
    )
    SELECT n_days, n_above, n_below, n_runs,
        round(er, 6) AS expected_runs, round(z, 6) AS z,
        round(2.0 * {_phi_upper_sql('abs(z)')}, 6) AS p_value
    FROM stat
    """


# ---------------------------------------------------------------------------
# r12k: Kruskal-Wallis — the k-group rank test completing the family
# ---------------------------------------------------------------------------


def kruskal_wallis_value_by_type(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Kruskal-Wallis H across event types on the event VALUE — the
    k-group member of the rank family (Mann-Whitney is its 2-group
    special case, Friedman its blocked sibling), for the same reason
    MW exists next to Welch: value distributions are skewed and the
    parametric :func:`anova_oneway` leans on normality.

        H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1),
        H_c = H / (1 − Σ(t³−t)/(N³−N))          (tie correction)

    with average ranks for ties. Ranks are computed at VALUE grain
    (6dp-rounded): cells (value, group, cnt) → per-value tie totals →
    avg rank r(v) = below(v) + (t_v+1)/2 — the Mann-Whitney-bucketed
    insight that a value's rank is a function of cumulative counts, so
    NOTHING fact-grain is ever sorted; the one ordered window runs
    over the |distinct values| frame (the bucketed flavor generalizes
    if that ever dominates). p via the shared Fisher χ²_{k−1}
    approximation (A&S literals).

    Plan: one (value, group) cell aggregate (the only fact pass),
    value-grain windows, group-grain fold, one-row H. Returns one row
    (n_total, k_groups, h_stat, h_corrected, df, z, p_value), 6dp."""
    from pyspark.sql import Window

    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    cells = pooled_persist(
        df.filter(
            F.col(value_col).isNotNull() & F.col(type_col).isNotNull()
        )
        .groupBy(
            F.round(F.col(value_col), 6).alias("v"),
            F.col(type_col).alias("g"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist as _pp

    per_v = _pp(
        cells.groupBy("v")
        .agg(F.sum("cnt").alias("t"))
        .select(
            "v",
            "t",
            (
                F.sum("t").over(w_cum) - F.col("t")
            ).cast("double").alias("below"),
        )
        .select(
            "v",
            "t",
            (F.col("below") + (F.col("t") + 1.0) / 2.0).alias("r"),
        )
    )
    joined = cells.join(per_v, "v")
    per_g = joined.groupBy("g").agg(
        F.sum("cnt").cast("double").alias("n_g"),
        F.sum(F.col("cnt") * F.col("r")).alias("r_g"),
    )
    ties = per_v.agg(
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("tie_term")
    )
    agg = per_g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum(
            F.try_divide(F.col("r_g") * F.col("r_g"), F.col("n_g"))
        ).alias("srr"),
    ).crossJoin(F.broadcast(ties))
    n, k = F.col("n"), F.col("k")
    h = F.try_divide(12.0 * F.col("srr"), n * (n + 1.0)) - 3.0 * (n + 1.0)
    corr = 1.0 - F.try_divide(F.col("tie_term"), n * n * n - n)
    hc = F.try_divide(h, corr)
    dof = k - 1.0
    # greatest(hc, 0): identical-distribution groups drive the true H
    # to 0 and float cancellation can land a few ulps NEGATIVE — DuckDB
    # sqrt raises there and Spark returns NaN (r12 third review pass,
    # reproduced); clamp on BOTH engines
    z = F.when(
        k >= 2.0,
        F.sqrt(2.0 * F.greatest(hc, F.lit(0.0)))
        - F.sqrt(2.0 * dof - 1.0),
    )
    out = agg.select(
        n.cast("long").alias("n_total"),
        k.cast("long").alias("k_groups"),
        F.round(h, 6).alias("h_stat"),
        F.round(hc, 6).alias("h_corrected"),
        dof.cast("long").alias("df"),
        F.round(z, 6).alias("z"),
        z.alias("_z"),
    ).withColumn("_az", F.abs(F.col("_z")))
    return out.select(
        "n_total",
        "k_groups",
        "h_stat",
        "h_corrected",
        "df",
        "z",
        F.round(F.expr("2.0 * " + _phi_upper_sql("_az")), 6).alias(
            "p_value"
        ),
    )


def sql_kruskal_wallis_value_by_type(
    table: str = "events",
    type_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB replay of :func:`kruskal_wallis_value_by_type` — same
    value-grain rank construction, tie correction, Fisher χ²."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        _phi_upper_sql,
    )

    return f"""
    WITH cells AS (
        SELECT round({value_col}, 6) AS v, {type_col} AS g,
            count(*) AS cnt
        FROM {table}
        WHERE {value_col} IS NOT NULL AND {type_col} IS NOT NULL
        GROUP BY 1, 2
    ), per_v AS (
        SELECT v, t,
            CAST(sum(t) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
                AS DOUBLE) + (t + 1.0) / 2.0 AS r
        FROM (SELECT v, sum(cnt) AS t FROM cells GROUP BY 1)
    ), per_g AS (
        SELECT g, CAST(sum(cnt) AS DOUBLE) AS n_g,
            sum(cnt * r) AS r_g
        FROM cells JOIN per_v USING (v)
        GROUP BY 1
    ), ties AS (
        SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tie_term FROM per_v
    ), agg AS (
        SELECT CAST(count(*) AS DOUBLE) AS k, sum(n_g) AS n,
            sum(r_g * r_g / nullif(n_g, 0.0)) AS srr
        FROM per_g
    ), stat AS (
        SELECT CAST(n AS BIGINT) AS n_total, CAST(k AS BIGINT) AS k_groups,
            12.0 * srr / nullif(n * (n + 1.0), 0.0)
                - 3.0 * (n + 1.0) AS h,
            (12.0 * srr / nullif(n * (n + 1.0), 0.0) - 3.0 * (n + 1.0))
                / nullif(1.0 - tie_term / nullif(n * n * n - n, 0.0),
                         0.0) AS hc,
            CAST(k - 1.0 AS BIGINT) AS df, k
        FROM agg CROSS JOIN ties
    ), withz AS (
        SELECT n_total, k_groups, h, hc, df,
            CASE WHEN k >= 2.0 THEN
                sqrt(2.0 * greatest(hc, 0.0))
                - sqrt(2.0 * (k - 1.0) - 1.0) END AS z
        FROM stat
    )
    SELECT n_total, k_groups, round(h, 6) AS h_stat,
        round(hc, 6) AS h_corrected, df, round(z, 6) AS z,
        round(2.0 * {_phi_upper_sql('abs(z)')}, 6) AS p_value
    FROM withz
    """


# ---------------------------------------------------------------------------
# r12k: Brown-Forsythe — are the group variances even comparable
# ---------------------------------------------------------------------------


def brown_forsythe_value_by_type(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Brown-Forsythe test for EQUALITY OF VARIANCES across event
    types: one-way ANOVA on the absolute deviations from each group's
    MEDIAN —

        z_ij = |x_ij − median_j|,
        F = (Σ n_j (z̄_j − z̄)²/(k−1)) / (Σ Σ (z_ij − z̄_j)²/(N−k))

    the robust (median-centered) Levene variant — THE assumption gate
    in front of :func:`anova_oneway` and the pooled-variance tests
    (heteroscedastic groups make their F/t readouts lie). Medians are
    exact percentiles on CENTS-quantized values (the QTE parity
    discipline — identical interpolation on both engines). F and its
    dofs are emitted without a p (the F CDF has no closed form shared
    by both engines; compare to F(k−1, N−k) tables — ≈2.6 at the 5%
    level for k=5 and large N).

    Plan: one group-grain exact-percentile aggregate (a per-group sort
    inside the aggregate — the QTE shape), broadcast medians joined
    back for ONE conditional moment pass, one-row F. Returns one row
    (n_total, k_groups, f_stat, df1, df2), 6dp."""
    meds = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(type_col).isNotNull()
        )
        .groupBy(F.col(type_col).alias("g"))
        .agg(
            F.expr(
                f"percentile(CAST(round({value_col} * 100) AS BIGINT),"
                " 0.5)"
            ).alias("_med_cents")
        )
    )
    z = F.abs(
        F.col(value_col) - F.col("_med_cents") / 100.0
    )
    per_g = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(type_col).isNotNull()
        )
        .join(
            F.broadcast(meds),
            F.col(type_col) == F.col("g"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_g"),
            F.sum(z).alias("sz"),
            F.sum(z * z).alias("szz"),
        )
    )
    agg = per_g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("sz").alias("tz"),
        F.sum("szz").alias("tzz"),
        F.sum(
            F.try_divide(F.col("sz") * F.col("sz"), F.col("n_g"))
        ).alias("sgm"),
    )
    n, k = F.col("n"), F.col("k")
    ssb = F.col("sgm") - F.try_divide(F.col("tz") * F.col("tz"), n)
    ssw = F.col("tzz") - F.col("sgm")
    f_stat = F.try_divide(
        F.try_divide(ssb, k - 1.0), F.try_divide(ssw, n - k)
    )
    return agg.select(
        n.cast("long").alias("n_total"),
        k.cast("long").alias("k_groups"),
        F.round(f_stat, 6).alias("f_stat"),
        (k - 1.0).cast("long").alias("df1"),
        (n - k).cast("long").alias("df2"),
    )


def sql_brown_forsythe_value_by_type(
    table: str = "events",
    type_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB replay of :func:`brown_forsythe_value_by_type` — same
    cents-quantized medians, moment algebra, NULLIF degeneracy."""
    return f"""
    WITH meds AS (
        SELECT {type_col} AS g,
            quantile_cont(CAST(round({value_col} * 100) AS BIGINT), 0.5)
                AS _med_cents
        FROM {table}
        WHERE {value_col} IS NOT NULL AND {type_col} IS NOT NULL
        GROUP BY 1
    ), per_g AS (
        SELECT meds.g, CAST(count(*) AS DOUBLE) AS n_g,
            sum(abs(t.{value_col} - meds._med_cents / 100.0)) AS sz,
            sum(abs(t.{value_col} - meds._med_cents / 100.0)
                * abs(t.{value_col} - meds._med_cents / 100.0)) AS szz
        FROM {table} t JOIN meds ON t.{type_col} = meds.g
        WHERE t.{value_col} IS NOT NULL
        GROUP BY 1
    ), agg AS (
        SELECT CAST(count(*) AS DOUBLE) AS k, sum(n_g) AS n,
            sum(sz) AS tz, sum(szz) AS tzz,
            sum(sz * sz / nullif(n_g, 0.0)) AS sgm
        FROM per_g
    )
    SELECT CAST(n AS BIGINT) AS n_total, CAST(k AS BIGINT) AS k_groups,
        round(((sgm - tz * tz / nullif(n, 0.0)) / nullif(k - 1.0, 0.0))
              / nullif((tzz - sgm) / nullif(n - k, 0.0), 0.0), 6)
            AS f_stat,
        CAST(k - 1.0 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2
    FROM agg
    """


# ---------------------------------------------------------------------------
# r13c: Jarque-Bera normality gate
# ---------------------------------------------------------------------------


def jarque_bera_value(
    df: DataFrame,
    value_col: str = "value",
    where: F.Column | None = None,
) -> DataFrame:
    """Jarque-Bera normality test on a value column: the moments-based
    gate in front of every 'assumes normal' procedure downstream
    (Welch, Bollinger bands, control charts) —

        JB = n/6 · (S^2 + K^2/4),  S = m3/m2^1.5,  K = m4/m2^2 − 3

    with the chi-square(2 dof) tail CLOSED-FORM: p = exp(−JB/2) —
    no polynomial approximation needed, identical arithmetic on both
    engines.  Central moments come from ONE pass of raw power sums
    (m_k = E[x^k] expansions), clamped non-negative where cancellation
    could go ulp-negative (m2).  Returns one row
    (n, skewness, ex_kurtosis, jb, p_value), 6dp."""
    base = df.filter(F.col(value_col).isNotNull())
    if where is not None:
        base = base.filter(where)
    x = F.col(value_col).cast("double")
    raw = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.greatest(F.col("s2") / n - mu * mu, F.lit(0.0))
    m3 = F.col("s3") / n - 3.0 * mu * F.col("s2") / n + 2.0 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4.0 * mu * F.col("s3") / n
        + 6.0 * mu * mu * F.col("s2") / n
        - 3.0 * mu * mu * mu * mu
    )
    skew = F.try_divide(m3, F.pow(m2, 1.5))
    exk = F.try_divide(m4, m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    return raw.select(
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(exk, 6).alias("ex_kurtosis"),
        F.round(jb, 6).alias("jb"),
        F.round(F.exp(-jb / 2.0), 6).alias("p_value"),
    )


def sql_jarque_bera_value(
    table: str = "events",
    value_col: str = "value",
    where: str = "1=1",
) -> str:
    """DuckDB replay of :func:`jarque_bera_value` — same raw power
    sums, same clamp, same closed-form chi2(2) tail."""
    return f"""
    WITH raw AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
            sum({value_col}) AS s1,
            sum({value_col} * {value_col}) AS s2,
            sum({value_col} * {value_col} * {value_col}) AS s3,
            sum({value_col} * {value_col} * {value_col} * {value_col})
                AS s4
        FROM {table}
        WHERE ({where}) AND {value_col} IS NOT NULL
    ), mom AS (
        SELECT n,
            greatest(s2 / n - (s1 / n) * (s1 / n), 0.0) AS m2,
            s3 / n - 3.0 * (s1 / n) * s2 / n
                + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
            s4 / n - 4.0 * (s1 / n) * s3 / n
                + 6.0 * (s1 / n) * (s1 / n) * s2 / n
                - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM raw
    ), stat AS (
        SELECT n,
            m3 / nullif(power(m2, 1.5), 0.0) AS skew,
            m4 / nullif(m2 * m2, 0.0) - 3.0 AS exk
        FROM mom
    )
    SELECT n, round(skew, 6) AS skewness,
        round(exk, 6) AS ex_kurtosis,
        round(n / 6.0 * (skew * skew + exk * exk / 4.0), 6) AS jb,
        round(exp(-(n / 6.0 * (skew * skew + exk * exk / 4.0)) / 2.0), 6)
            AS p_value
    FROM stat
    """


# ---------------------------------------------------------------------------
# r13j: categorical distribution distances + feature ranking
# ---------------------------------------------------------------------------


def _type_dow_cells(
    df: DataFrame, ts_col: str, type_col: str
) -> DataFrame:
    """Shared (event_type, day-of-week) contingency frame (ty, dow, c),
    pooled-persisted — ONE alias scheme so :func:`hellinger_dow_pairs`
    and :func:`mutual_info_type_dow` hit the same cache entry instead
    of scanning the fact table twice (r13 second review)."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    return pooled_persist(
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("ty"),
            F.dayofweek(ts_col).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _sql_type_dow_cells(table: str, ts_col: str, type_col: str) -> str:
    """DuckDB twin of :func:`_type_dow_cells` (CTE body ``cells``;
    Spark dayofweek is 1=Sunday, DuckDB's 0=Sunday — hence +1)."""
    return f"""cells AS (
        SELECT {type_col} AS ty, dayofweek({ts_col}) + 1 AS dow,
            count(*) AS c
        FROM {table} WHERE {ts_col} IS NOT NULL GROUP BY 1, 2
    )"""


def hellinger_dow_pairs(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Pairwise Hellinger distance + Bhattacharyya coefficient between
    event types over their DAY-OF-WEEK distributions: do two event
    types live on the same weekly rhythm?

        BC(p, q) = Σ_d sqrt(p_d·q_d),   H = sqrt(1 − BC)

    H is a PROPER METRIC on distributions (unlike KL) and bounded
    [0, 1], so the pairwise matrix is directly comparable across
    pairs.  The dow marginals are exact categorical distributions —
    no binning decisions.  Plan: ONE (type, dow) contingency pass,
    a dense 7-cell grid per type (missing dows are genuine zeros),
    a |types|²/2 pair join on dow.  Returns (type_a, type_b,
    bhattacharyya, hellinger), 6dp, ordered."""
    cells = _type_dow_cells(df, ts_col, type_col)
    tot = cells.groupBy("ty").agg(F.sum("c").alias("n"))
    spark = df.sparkSession
    dows = spark.range(1, 8).select(F.col("id").cast("int").alias("dow"))
    dense = (
        tot.crossJoin(F.broadcast(dows))
        .join(cells, ["ty", "dow"], "left")
        .select(
            "ty",
            "dow",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("n")
            ).alias("p"),
        )
    )
    a = dense.select(
        F.col("ty").alias("type_a"), "dow", F.col("p").alias("pa")
    )
    b = dense.select(
        F.col("ty").alias("type_b"), "dow", F.col("p").alias("pb")
    )
    pairs = (
        a.join(b, "dow")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.sqrt(F.col("pa") * F.col("pb"))).alias("_bc")
        )
    )
    return pairs.select(
        "type_a",
        "type_b",
        F.round("_bc", 6).alias("bhattacharyya"),
        F.round(
            F.sqrt(F.greatest(1.0 - F.col("_bc"), F.lit(0.0))), 6
        ).alias("hellinger"),
    ).orderBy("type_a", "type_b")


def sql_hellinger_dow_pairs(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`hellinger_dow_pairs` — same dense
    7-cell grid and pair fold.  Spark ``dayofweek`` is 1=Sunday;
    DuckDB mirrors via ``dayofweek(d) + 1`` (0=Sunday there)."""
    return f"""
    WITH {_sql_type_dow_cells(table, ts_col, type_col)}, tot AS (
        SELECT ty, sum(c) AS n FROM cells GROUP BY 1
    ), dense AS (
        SELECT t.ty, d.dow,
            coalesce(cells.c, 0) / CAST(t.n AS DOUBLE) AS p
        FROM tot t CROSS JOIN (
            SELECT unnest(generate_series(1, 7)) AS dow) d
        LEFT JOIN cells ON cells.ty = t.ty AND cells.dow = d.dow
    ), pairs AS (
        SELECT a.ty AS type_a, b.ty AS type_b,
            sum(sqrt(a.p * b.p)) AS bc
        FROM dense a JOIN dense b
          ON a.dow = b.dow AND a.ty < b.ty
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, round(bc, 6) AS bhattacharyya,
        round(sqrt(greatest(1.0 - bc, 0.0)), 6) AS hellinger
    FROM pairs ORDER BY 1, 2
    """


def mutual_info_type_dow(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Mutual information between event type and day-of-week (nats),
    with the normalized variant NMI = I/sqrt(H_x·H_y) — the
    'how much does WHICH event happen tell you about WHEN' readout
    on an interpretable [0,1] scale, where chi²/Cramér's V (already
    shipped) answer a significance-shaped question instead:

        I = Σ_cells p·ln(p / (p_x·p_y))

    ONE contingency pass, marginals re-derived from the persisted
    cells (the contingency_effects plan), zero cells contribute 0.
    Returns one row (n, h_type, h_dow, mi, nmi), 6dp."""
    cells = _type_dow_cells(df, ts_col, type_col).select(
        F.col("ty").alias("x"), F.col("dow").alias("y"),
        F.col("c").alias("o"),
    )
    mx = cells.groupBy("x").agg(F.sum("o").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("o").alias("ny"))
    tot = cells.agg(F.sum("o").alias("n"))
    n = F.col("n").cast("double")
    joined = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("o") / n
    mi_term = p * F.log(
        F.col("o") * n / (F.col("nx").cast("double") * F.col("ny"))
    )
    folded = joined.agg(
        F.first("n").alias("n"),
        F.sum(mi_term).alias("_mi"),
    )
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            -(F.col("nx") / n) * F.log(F.col("nx") / n)
        ).alias("_hx")
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            -(F.col("ny") / n) * F.log(F.col("ny") / n)
        ).alias("_hy")
    )
    return (
        folded.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            F.round("_hx", 6).alias("h_type"),
            F.round("_hy", 6).alias("h_dow"),
            F.round("_mi", 6).alias("mi"),
            F.round(
                F.try_divide(
                    F.col("_mi"),
                    F.sqrt(
                        F.greatest(
                            F.col("_hx") * F.col("_hy"), F.lit(0.0)
                        )
                    ),
                ),
                6,
            ).alias("nmi"),
        )
    )


def sql_mutual_info_type_dow(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB replay of :func:`mutual_info_type_dow`."""
    return f"""
    WITH {_sql_type_dow_cells(table, ts_col, type_col)},
    cx AS (SELECT ty AS x, dow AS y, c AS o FROM cells),
    mx AS (SELECT x, sum(o) AS nx FROM cx GROUP BY 1),
    my AS (SELECT y, sum(o) AS ny FROM cx GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cx),
    folded AS (
        SELECT first(tot.n) AS n,
            sum((o / CAST(tot.n AS DOUBLE))
                * ln(o * CAST(tot.n AS DOUBLE)
                     / (CAST(mx.nx AS DOUBLE) * my.ny))) AS mi
        FROM cx
        JOIN mx ON cx.x = mx.x
        JOIN my ON cx.y = my.y
        CROSS JOIN tot
    ), hx AS (
        SELECT sum(-(nx / CAST(tot.n AS DOUBLE))
                   * ln(nx / CAST(tot.n AS DOUBLE))) AS hx
        FROM mx CROSS JOIN tot
    ), hy AS (
        SELECT sum(-(ny / CAST(tot.n AS DOUBLE))
                   * ln(ny / CAST(tot.n AS DOUBLE))) AS hy
        FROM my CROSS JOIN tot
    )
    SELECT n, round(hx.hx, 6) AS h_type, round(hy.hy, 6) AS h_dow,
        round(mi, 6) AS mi,
        round(mi / nullif(sqrt(greatest(hx.hx * hy.hy, 0.0)), 0.0), 6)
            AS nmi
    FROM folded CROSS JOIN hx CROSS JOIN hy
    """


def info_gain_features(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    max_stratum: int = 5,
) -> DataFrame:
    """Information-gain ranking of three categorical USER features
    against conversion — the feature-selection triage every
    propensity model starts with:

        IG(f) = H(conv) − Σ_v p(v)·H(conv | f = v)
        gain_ratio = IG / H(f)        (Quinlan's split-info correction)

    Features (all engine-derivable, no free-form config): activity
    tier (log2 event count, the post-strat strata), modal day-of-week
    of the user's events (ties to the smaller dow), and weekend share
    bucketed to quartiles.  Plan: ONE user-grain fold builds all
    features + the label, one (feature, level, label) unpivoted
    contingency per feature via a stack, entropy folds at level grain.
    Returns (feature, n_levels, info_gain, gain_ratio), 6dp, ordered
    by info_gain DESC, feature ASC."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        user_activity_tier,
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    dow = F.dayofweek(ts_col)
    per_user = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            user_activity_tier(max_stratum).alias("tier"),
            F.max(
                (F.col(type_col) == metric_type).cast("int")
            ).alias("label"),
            *[
                F.sum((dow == d).cast("int")).alias(f"_d{d}")
                for d in range(1, 8)
            ],
            F.avg(dow.isin([1, 7]).cast("double")).alias("_we"),
        )
    )
    # modal dow: 1-based first argmax over the 1=Sunday count array —
    # ties resolve to the smaller dow on both engines
    modal = F.expr(
        "array_position(array(_d1,_d2,_d3,_d4,_d5,_d6,_d7), "
        "array_max(array(_d1,_d2,_d3,_d4,_d5,_d6,_d7)))"
    )
    feat = per_user.select(
        "label",
        F.col("tier").cast("string").alias("f_tier"),
        modal.cast("string").alias("f_modal_dow"),
        F.least(
            F.floor(F.col("_we") * 4).cast("int"), F.lit(3)
        ).cast("string").alias("f_weekend_q"),
    )
    long = pooled_persist(
        feat.select(
            "label",
            F.explode(
                F.map_from_arrays(
                    F.array(
                        F.lit("tier"),
                        F.lit("modal_dow"),
                        F.lit("weekend_q"),
                    ),
                    F.array("f_tier", "f_modal_dow", "f_weekend_q"),
                )
            ).alias("feature", "level"),
        )
        .groupBy("feature", "level", "label")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    n_tot = long.filter(F.col("feature") == "tier").agg(
        F.sum("o").alias("n")
    )
    # H(conv): from any one feature's marginal over labels
    lab = (
        long.filter(F.col("feature") == "tier")
        .groupBy("label")
        .agg(F.sum("o").alias("nl"))
        .crossJoin(F.broadcast(n_tot))
        .agg(
            F.sum(
                -(F.col("nl") / F.col("n"))
                * F.log(F.col("nl") / F.col("n"))
            ).alias("_hc")
        )
    )
    lev = long.groupBy("feature", "level").agg(
        F.sum("o").alias("nv")
    )
    cond = (
        long.join(lev, ["feature", "level"])
        .select(
            "feature",
            "level",
            "nv",
            (
                -(F.col("o") / F.col("nv"))
                * F.log(F.col("o") / F.col("nv"))
            ).alias("_t"),
        )
        .groupBy("feature", "level")
        .agg(F.first("nv").alias("nv"), F.sum("_t").alias("_hv"))
    )
    per_feat = (
        cond.crossJoin(F.broadcast(n_tot))
        .groupBy("feature")
        .agg(
            F.count(F.lit(1)).alias("n_levels"),
            F.sum(
                (F.col("nv") / F.col("n")) * F.col("_hv")
            ).alias("_hcond"),
            F.sum(
                -(F.col("nv") / F.col("n"))
                * F.log(F.col("nv") / F.col("n"))
            ).alias("_hf"),
        )
    )
    return (
        per_feat.crossJoin(F.broadcast(lab))
        .select(
            "feature",
            "n_levels",
            F.round(F.col("_hc") - F.col("_hcond"), 6).alias(
                "info_gain"
            ),
            F.round(
                F.try_divide(
                    F.col("_hc") - F.col("_hcond"), F.col("_hf")
                ),
                6,
            ).alias("gain_ratio"),
        )
        .orderBy(F.desc("info_gain"), F.asc("feature"))
    )


def sql_info_gain_features(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    metric_type: str = "purchase",
    max_stratum: int = 5,
) -> str:
    """DuckDB replay of :func:`info_gain_features` — same features
    (1-based modal position over the same 1=Sunday dow array), same
    entropy folds."""
    from asctb_ct_label_mapper_spark.operators.experiment import (
        sql_user_activity_tier,
    )

    ds = ", ".join(
        f"sum(CASE WHEN dayofweek({ts_col}) + 1 = {d} THEN 1 ELSE 0 END)"
        f" AS d{d}"
        for d in range(1, 8)
    )
    return f"""
    WITH per_user AS (
        SELECT {user_col} AS u,
            {sql_user_activity_tier(max_stratum)} AS tier,
            max(CASE WHEN {type_col} = '{metric_type}'
                     THEN 1 ELSE 0 END) AS label,
            {ds},
            avg(CASE WHEN dayofweek({ts_col}) + 1 IN (1, 7)
                     THEN 1.0 ELSE 0.0 END) AS we
        FROM {table} WHERE {ts_col} IS NOT NULL
        GROUP BY 1
    ), feat AS (
        SELECT label,
            CAST(tier AS VARCHAR) AS f_tier,
            CAST(list_position([d1,d2,d3,d4,d5,d6,d7],
                 list_max([d1,d2,d3,d4,d5,d6,d7])) AS VARCHAR)
                AS f_modal_dow,
            CAST(least(CAST(floor(we * 4) AS INT), 3) AS VARCHAR)
                AS f_weekend_q
        FROM per_user
    ), long AS (
        SELECT feature, level, label, count(*) AS o FROM (
            SELECT label, 'tier' AS feature, f_tier AS level FROM feat
            UNION ALL
            SELECT label, 'modal_dow', f_modal_dow FROM feat
            UNION ALL
            SELECT label, 'weekend_q', f_weekend_q FROM feat
        ) GROUP BY 1, 2, 3
    ), n_tot AS (
        SELECT sum(o) AS n FROM long WHERE feature = 'tier'
    ), lab AS (
        SELECT sum(-(nl / CAST(n_tot.n AS DOUBLE))
                   * ln(nl / CAST(n_tot.n AS DOUBLE))) AS hc
        FROM (
            SELECT label, sum(o) AS nl FROM long
            WHERE feature = 'tier' GROUP BY 1
        ) CROSS JOIN n_tot
    ), lev AS (
        SELECT feature, level, sum(o) AS nv FROM long GROUP BY 1, 2
    ), cond AS (
        SELECT long.feature, long.level, first(lev.nv) AS nv,
            sum(-(long.o / CAST(lev.nv AS DOUBLE))
                * ln(long.o / CAST(lev.nv AS DOUBLE))) AS hv
        FROM long JOIN lev
          ON long.feature = lev.feature AND long.level = lev.level
        GROUP BY 1, 2
    ), per_feat AS (
        SELECT feature, count(*) AS n_levels,
            sum((nv / CAST(n_tot.n AS DOUBLE)) * hv) AS hcond,
            sum(-(nv / CAST(n_tot.n AS DOUBLE))
                * ln(nv / CAST(n_tot.n AS DOUBLE))) AS hf
        FROM cond CROSS JOIN n_tot GROUP BY 1
    )
    SELECT feature, n_levels,
        round(lab.hc - hcond, 6) AS info_gain,
        round((lab.hc - hcond) / nullif(hf, 0.0), 6) AS gain_ratio
    FROM per_feat CROSS JOIN lab
    ORDER BY info_gain DESC, feature ASC
    """
