"""Column-level table profiling — the ANALYZE/data-quality primitive a
pipeline runs on every new ingest: per-column row/null/distinct counts and
min/max, in long format so any table profiles into one fixed schema.

Scale shape (r7 — the Expand is GONE): count/min/max/nulls are plain
map-side-combinable aggregates in one wide pass. Exact per-column
distinct counts are NOT computed as multi-count-distinct in that same
agg — Catalyst plans that as a single Expand (the stream duplicated once
per DISTINCT column: measured 14.4 s at sf0.1 for 8 lineitem columns,
and a data x n_cols shuffle at 100 TB). Instead the exact path unpivots
to (column, value) long format and runs ONE ``countDistinct`` grouped by
column name: Catalyst plans that as two ordinary hash aggregations
(partial dedup per partition, then count), so the shuffle carries only
the per-partition-distinct pairs and nulls are filtered before the
exchange. Same exact answers, no Expand (measured 14.4 s -> ~1 s at
sf0.1). ``exact_distinct=False`` swaps in HLL++
(approx_count_distinct) inside the wide agg — still the cheapest flavor
(one pass, no unpivoted stream) and the petabyte default; exact remains
the DEFAULT because it is what the SQL oracle replays value-for-value.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    min_s, max_s) with min/max rendered as strings so heterogeneous column
    types share one output schema (timestamps via date_format for
    cross-engine stability)."""
    from pyspark.sql import types as T

    cols = list(columns) if columns is not None else df.columns
    n_rows = F.count(F.lit(1))

    def str_of(c: str):
        dt = df.schema[c].dataType
        if isinstance(dt, T.TimestampType):
            return lambda x: F.date_format(x, "yyyy-MM-dd HH:mm:ss")
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return lambda x: x.cast("decimal(38,6)").cast("string")
        return lambda x: x.cast("string")

    aggs = [n_rows.alias("n_rows")]
    for c in cols:
        s = str_of(c)
        aggs.append((n_rows - F.count(F.col(c))).alias(f"{c}__nulls"))
        if not exact_distinct:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"{c}__distinct")
            )
        aggs.append(s(F.min(F.col(c))).alias(f"{c}__min"))
        aggs.append(s(F.max(F.col(c))).alias(f"{c}__max"))
    wide = df.agg(*aggs)
    # wide (1 row) -> long via stack: constant-folded, no second pass.
    # `pos` pins the output to the requested column order (the distinct
    # join below would otherwise scramble it).
    dcol = "" if exact_distinct else ", {c}__distinct"
    stack_args = ", ".join(
        f"'{c}', {i}{dcol.format(c=c)}, {c}__nulls, {c}__min, {c}__max"
        for i, c in enumerate(cols)
    )
    dfield = "" if exact_distinct else " n_distinct,"
    base = wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            f"(column, pos,{dfield} n_nulls, min_s, max_s)"
        ),
        "n_rows",
    )
    if exact_distinct:
        # Exact distincts WITHOUT the multi-count-distinct Expand: unpivot
        # to (column, value) and run one countDistinct grouped by column —
        # two plain hash aggs, shuffle carries per-partition-distinct pairs
        # only. The string encoding must preserve VALUE-equality, not just
        # injectivity: float -0.0 and 0.0 are equal values but distinct
        # strings, so float/double columns add +0.0 first (IEEE: -0.0+0.0
        # = +0.0, every other value unchanged), matching countDistinct and
        # the DuckDB oracle's native-value semantics.
        def val_of(c: str) -> str:
            dt = df.schema[c].dataType
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                return f"cast(({c} + cast(0.0 as double)) as string)"
            return f"cast({c} as string)"

        val_args = ", ".join(f"'{c}', {val_of(c)}" for c in cols)
        longv = df.select(
            F.expr(f"stack({len(cols)}, {val_args}) AS (column, value)")
        ).filter(F.col("value").isNotNull())
        dist = longv.groupBy("column").agg(
            F.countDistinct("value").alias("n_distinct")
        )
        # n_cols-row join: left + coalesce keeps all-null / empty columns
        # (their pairs were filtered before the exchange, so they have no
        # dist row) at n_distinct = 0, matching countDistinct semantics.
        base = base.join(dist, "column", "left").withColumn(
            "n_distinct", F.coalesce("n_distinct", F.lit(0))
        )
    return base.orderBy("pos").select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s"
    )


def sql_profile_table(
    table: str,
    columns: Sequence[str],
    types: dict[str, str] | None = None,
) -> str:
    """DuckDB replay of ``profile_table``: one UNION ALL branch per column
    (DuckDB aggregates each branch over the shared scan). ``types`` maps a
    column to 'ts' or 'float' for the same string rendering Spark uses."""
    types = types or {}

    def render(c: str, agg: str) -> str:
        kind = types.get(c)
        if kind == "ts":
            return f"strftime({agg}({c}), '%Y-%m-%d %H:%M:%S')"
        if kind == "float":
            return f"CAST(CAST({agg}({c}) AS DECIMAL(38,6)) AS VARCHAR)"
        return f"CAST({agg}({c}) AS VARCHAR)"

    branches = [
        f"""
    SELECT '{c}' AS "column", count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           {render(c, 'min')} AS min_s,
           {render(c, 'max')} AS max_s
    FROM {table}"""
        for c in columns
    ]
    return "\n    UNION ALL".join(branches)


def group_quantiles(
    df: "DataFrame",
    value_col: str,
    group_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> "DataFrame":
    """EXACT per-group quantiles of ``value_col`` — the distributional
    half of the ingest profile (length/score distributions per language
    or source drive curation thresholds; means hide the tails that
    matter).

    Engine-agnostic by construction: instead of leaning on builtin
    percentile functions whose boundary semantics differ across engines
    (interpolation vs nearest-rank vs rounding), the q-quantile is
    DEFINED positionally as the ``ceil(q * n)``-th smallest value
    (nearest-rank, the SQL-standard PERCENTILE_DISC), computed from a
    row_number window — the same arithmetic replays in any engine, so
    the result is hash-checkable.

    Scale shape: ONE shuffle on the group key (window sort within
    groups), then a map-side-combinable conditional aggregate. Skew =
    largest group's sort, the same bound every per-group operator here
    carries. For GLOBAL quantiles at corpus scale use
    ``approx_percentile`` (t-digest-style sketch, no global sort) — this
    operator is the exact, grouped flavor.

    Returns one row per group: (group_col, n, q_25, q_50, ... as
    ``q_<pct>`` columns, values cast to double).
    """
    # ties in _v need no id tie-break: only the VALUE at a position is
    # emitted, and equal values at the boundary emit the same value
    # whichever of them row_number places there
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.col("_v"))
    ranked = ranked.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    aggs = [F.max("_n").alias("n")]
    for q in qs:
        tag = f"q_{int(round(q * 100))}"
        aggs.append(
            F.max(
                F.when(
                    F.col("_rn") == F.ceil(F.lit(float(q)) * F.col("_n")),
                    F.col("_v"),
                )
            ).alias(tag)
        )
    return ranked.groupBy(group_col).agg(*aggs)


def sql_group_quantiles(
    table: str,
    value_col: str,
    group_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> str:
    """DuckDB replay of ``group_quantiles`` (same nearest-rank position
    arithmetic, not DuckDB's builtin quantile)."""
    cols = ",\n        ".join(
        f"max(CASE WHEN rn = CAST(ceil({float(q)!r} * n) AS BIGINT) "
        f"THEN v END) AS q_{int(round(q * 100))}"
        for q in qs
    )
    return f"""
    SELECT {group_col}, CAST(max(n) AS BIGINT) AS n,
        {cols}
    FROM (
        SELECT {group_col},
            CAST({value_col} AS DOUBLE) AS v,
            row_number() OVER (PARTITION BY {group_col}
                               ORDER BY CAST({value_col} AS DOUBLE)) AS rn,
            count(*) OVER (PARTITION BY {group_col}) AS n
        FROM {table}
        WHERE {value_col} IS NOT NULL
    )
    GROUP BY {group_col}
    """


def flag_outliers_iqr(
    df: DataFrame,
    value_col: str,
    group_col: str,
    factor: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier flags per group: rows whose ``value_col`` falls
    outside [q25 - factor*IQR, q75 + factor*IQR] of THEIR group — the
    standard length-outlier gate (truncated fragments, concatenation
    blobs) that a fixed global threshold gets wrong across
    languages/domains with different length distributions.

    Composes :func:`group_quantiles` (exact nearest-rank q25/q75 — one
    group shuffle) with a broadcast-able join of the group-count-sized
    fence table back onto the corpus. Returns only the OUTLIER rows plus
    (fence_lo, fence_hi, side) — churn-sized output.
    """
    q = group_quantiles(df, value_col, group_col, qs=(0.25, 0.75)).select(
        group_col,
        F.col("q_25"),
        F.col("q_75"),
    )
    iqr = F.col("q_75") - F.col("q_25")
    fences = q.select(
        group_col,
        (F.col("q_25") - factor * iqr).alias("fence_lo"),
        (F.col("q_75") + factor * iqr).alias("fence_hi"),
    )
    v = F.col(value_col).cast("double")
    return (
        df.join(F.broadcast(fences), group_col)
        .filter((v < F.col("fence_lo")) | (v > F.col("fence_hi")))
        .withColumn(
            "side",
            F.when(v < F.col("fence_lo"), "low").otherwise("high"),
        )
    )


def sql_flag_outliers_iqr(
    table: str,
    value_col: str,
    group_col: str,
    factor: float = 1.5,
    cols: str = "*",
) -> str:
    """DuckDB replay of ``flag_outliers_iqr`` (same nearest-rank quantiles
    and fence arithmetic). With the default ``cols='*'`` the outer SELECT
    must not re-list the fence columns (``*`` after the USING join
    already carries them once — the sql_capped_sample lesson)."""
    outer = cols if cols == "*" else f"{cols}, fence_lo, fence_hi"
    qsql = sql_group_quantiles(table, value_col, group_col, qs=(0.25, 0.75))
    return f"""
    WITH q AS ({qsql}),
    fences AS (
        SELECT {group_col},
            q_25 - {factor} * (q_75 - q_25) AS fence_lo,
            q_75 + {factor} * (q_75 - q_25) AS fence_hi
        FROM q
    )
    SELECT {outer},
        CASE WHEN CAST({value_col} AS DOUBLE) < fence_lo THEN 'low'
             ELSE 'high' END AS side
    FROM {table} JOIN fences USING ({group_col})
    WHERE CAST({value_col} AS DOUBLE) < fence_lo
       OR CAST({value_col} AS DOUBLE) > fence_hi
    """


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's
    [lo_q, hi_q] nearest-rank quantiles — the tail-taming companion to
    ``flag_outliers_iqr`` (that one REPORTS tails; this one CAPS them,
    the standard pre-normalization step before length/score features
    feed a mixture or quality model).

    Reuses ``group_quantiles`` verbatim for the cut points, so the
    boundary semantics stay the single positional (ceil(q*n)-th smallest)
    definition shared with the oracle. The cuts table is group-count-
    sized: re-attached by broadcast join; the clip itself is a map.
    Returns (id, group, <value> double, <value>_w double).
    """
    if not (0.0 < lo_q < hi_q < 1.0):
        raise ValueError("need 0 < lo_q < hi_q < 1")
    lo_tag = f"q_{int(round(lo_q * 100))}"
    hi_tag = f"q_{int(round(hi_q * 100))}"
    if lo_tag == hi_tag:
        # group_quantiles names columns by rounded percent; a collision
        # would alias two aggregates identically and fail later with an
        # opaque AMBIGUOUS_REFERENCE (review finding)
        raise ValueError(
            f"lo_q={lo_q} and hi_q={hi_q} round to the same percent tag"
            f" {lo_tag}; separate them by at least one percent"
        )
    cuts = group_quantiles(df, value_col, group_col, qs=(lo_q, hi_q)).select(
        group_col,
        F.col(lo_tag).alias("_lo"),
        F.col(hi_tag).alias("_hi"),
    )
    v = F.col(value_col).cast("double")
    return (
        df.select(F.col(id_col), F.col(group_col), v.alias(value_col))
        .filter(v.isNotNull())
        .join(F.broadcast(cuts), group_col)
        .select(
            id_col,
            group_col,
            value_col,
            F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
            .alias(f"{value_col}_w"),
        )
    )


def sql_winsorize(
    table: str,
    value_col: str,
    group_col: str,
    id_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> str:
    """DuckDB replay of ``winsorize``: the cuts CTE is
    ``sql_group_quantiles`` verbatim (same positional arithmetic), the
    clip is least/greatest."""
    lo_tag = f"q_{int(round(lo_q * 100))}"
    hi_tag = f"q_{int(round(hi_q * 100))}"
    if lo_tag == hi_tag:
        raise ValueError(
            f"lo_q={lo_q} and hi_q={hi_q} round to the same percent tag"
            f" {lo_tag}; separate them by at least one percent"
        )
    cuts = sql_group_quantiles(table, value_col, group_col, qs=(lo_q, hi_q))
    return f"""
    WITH cuts AS ({cuts})
    SELECT d.{id_col}, d.{group_col},
        CAST(d.{value_col} AS DOUBLE) AS {value_col},
        least(greatest(CAST(d.{value_col} AS DOUBLE), c.{lo_tag}), c.{hi_tag})
            AS {value_col}_w
    FROM {table} d JOIN cuts c ON d.{group_col} = c.{group_col}
    WHERE d.{value_col} IS NOT NULL
    """


def mad_anomaly_days(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    z: float = 3.0,
) -> DataFrame:
    """Robust daily-volume anomaly flags: a (group, day) whose event count
    deviates from the group's MEDIAN daily count by more than ``z`` times
    the group's MAD (median absolute deviation) — the observability gate
    that survives the outliers a mean/stddev z-score is dragged by.

    Both medians use :func:`group_quantiles`' nearest-rank positional
    definition VERBATIM, so the whole report replays exactly in SQL.
    Scale: the event stream reduces to a (group x day) grid immediately
    (one map-side-combinable shuffle); every later step — two quantile
    passes and the flag join — runs on dimension-sized frames, broadcast
    back. MAD = 0 (a perfectly constant series) degenerates to flagging
    any deviation, the conventional robust-z convention."""
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    # pooled: the (grp x day) grid feeds the median branch, the deviation
    # join, and (via dev) the MAD branch + final join — without the
    # persist the corpus-sized scan+shuffle runs once per consumer
    # (4x, plan-verified); the grid itself is dimension-sized
    daily = pooled_persist(
        df.select(F.col(group_col).alias("grp"), F.to_date(ts_col).alias("day"))
        .groupBy("grp", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    med = group_quantiles(daily, "n_events", "grp", qs=(0.5,)).select(
        "grp", F.col("q_50").alias("med")
    )
    dev = pooled_persist(
        daily.join(F.broadcast(med), "grp").withColumn(
            "absdev", F.abs(F.col("n_events") - F.col("med"))
        )
    )
    mad = group_quantiles(dev, "absdev", "grp", qs=(0.5,)).select(
        "grp", F.col("q_50").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .select(
            F.col("grp").alias(group_col),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "med",
            "mad",
            F.when(F.col("mad") > 0, F.col("absdev") > z * F.col("mad"))
            .otherwise(F.col("absdev") > 0)
            .cast("int")
            .alias("is_anomaly"),
        )
    )


def sql_mad_anomaly_days(
    table: str = "events",
    ts_col: str = "ts",
    group_col: str = "event_type",
    z: float = 3.0,
) -> str:
    """DuckDB replay of ``mad_anomaly_days`` — the medians EMBED
    ``sql_group_quantiles`` (one positional definition in the codebase,
    not a re-implementation)."""
    med_quantiles = sql_group_quantiles("daily", "n_events", "grp", qs=(0.5,))
    mad_quantiles = sql_group_quantiles("dev", "absdev", "grp", qs=(0.5,))
    return f"""
    WITH daily AS (
        SELECT {group_col} AS grp, CAST({ts_col} AS DATE) AS day,
            count(*) AS n_events
        FROM {table} GROUP BY 1, 2
    ),
    med AS (
        SELECT grp, q_50 AS med FROM ({med_quantiles})
    ),
    dev AS (
        SELECT d.*, m.med, abs(d.n_events - m.med) AS absdev
        FROM daily d JOIN med m USING (grp)
    ),
    mad AS (
        SELECT grp, q_50 AS mad FROM ({mad_quantiles})
    )
    SELECT d.grp AS {group_col}, strftime(d.day, '%Y-%m-%d') AS day,
        d.n_events, d.med, a.mad,
        CAST(CASE WHEN a.mad > 0 THEN d.absdev > {float(z)!r} * a.mad
                  ELSE d.absdev > 0 END AS INT) AS is_anomaly
    FROM dev d JOIN mad a USING (grp)
    """


# --- deterministic sample-based quantile sketch -------------------------------


def priority_sample(
    df: DataFrame, id_col: str, value_col: str, k: int = 512
) -> DataFrame:
    """Deterministic uniform row sample: the ``k`` rows whose md5(id)
    priority is smallest — the KMV trick applied to ROWS, which makes
    the sample (a) reproducible across runs/engines/partitionings,
    (b) EXACTLY mergeable (bottom-k of a union == bottom-k of the
    slices' bottom-ks — per-shard samples union + re-cut with no bias),
    and (c) uniform, because md5 is exchangeable with respect to the
    values. Plan: one narrow hash + TakeOrderedAndProject heaps.
    Returns (pr, v); k rows forever, the mergeable quantile state."""
    from asctb_ct_label_mapper_spark.operators.sketches import kmv_hash60

    # NULL ids (NULL priority: Spark sorts them FIRST, DuckDB LAST) and
    # NULL values (collect_list drops them, desyncing n_sample from the
    # array under ANSI element_at) are excluded on BOTH engines
    return (
        df.filter(F.col(id_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            kmv_hash60(F.col(id_col)).alias("pr"),
            F.col(value_col).cast("double").alias("v"),
        )
        .orderBy("pr")
        .limit(k)
    )


def sample_quantiles(
    sample: DataFrame, qs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Linear-interpolated quantiles over a (bounded) priority sample:
    sort the k values in one row, est(q) = v[lo] + frac*(v[hi] - v[lo])
    with h = (n-1)q — written as the IDENTICAL list arithmetic the
    oracle runs, so the estimates hash-match (6dp guard). One row per
    q: (q, n_sample, est)."""
    arr = F.array_sort(F.collect_list("v"))
    base = sample.agg(arr.alias("_a"), F.count(F.lit(1)).alias("n_sample"))
    # every quantile reads the SAME one-row agg: build all estimates in
    # one select and explode (union legs would re-run the sample's
    # TakeOrdered scan once per q)
    ests = []
    for q in qs:
        h = (F.col("n_sample") - 1) * F.lit(float(q))
        lo = F.floor(h).cast("int")
        frac = h - lo
        lo_v = F.element_at("_a", lo + 1)
        hi_v = F.element_at("_a", F.least(lo + 2, F.col("n_sample")).cast("int"))
        # empty sample: lo = floor(-q) = -1 and element_at(_a, 0) raises
        # under ANSI while DuckDB's a[0] quietly returns NULL — guard the
        # whole estimate (CASE WHEN mirrors on both engines; CaseWhen
        # evaluates the guarded branch lazily, unlike an aggregate)
        ests.append(
            F.struct(
                F.lit(float(q)).alias("q"),
                F.when(
                    F.col("n_sample") > 0,
                    F.round(lo_v + frac * (hi_v - lo_v), 6),
                )
                .otherwise(F.lit(None).cast("double"))
                .alias("est"),
            )
        )
    return base.select(
        F.explode(F.array(*ests)).alias("_s"), "n_sample"
    ).select(
        F.col("_s").getField("q").alias("q"),
        "n_sample",
        F.col("_s").getField("est").alias("est"),
    )


def sql_sample_quantiles(
    table: str,
    id_col: str,
    value_col: str,
    k: int = 512,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    where: str = "1=1",
) -> str:
    """DuckDB replay of priority_sample + sample_quantiles (same md5
    priority, same bottom-k, same interpolation arithmetic)."""
    parts = []
    for q in qs:
        parts.append(f"""
        SELECT CAST({float(q)} AS DOUBLE) AS q, n_sample,
            CASE WHEN n_sample > 0 THEN
                round(a[lo + 1] + frac * (a[least(lo + 2, n_sample)] - a[lo + 1]), 6)
            ELSE NULL END AS est
        FROM (
            SELECT a, n_sample,
                CAST(floor((n_sample - 1) * {float(q)}) AS INT) AS lo,
                (n_sample - 1) * {float(q)}
                    - CAST(floor((n_sample - 1) * {float(q)}) AS INT) AS frac
            FROM base
        )""")
    union = " UNION ALL ".join(parts)
    return f"""
    WITH sample AS (
        SELECT CAST({value_col} AS DOUBLE) AS v
        FROM {table}
        WHERE ({where}) AND {id_col} IS NOT NULL AND {value_col} IS NOT NULL
        ORDER BY CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)
        LIMIT {k}
    ), base AS (
        SELECT list(v ORDER BY v) AS a, count(*) AS n_sample FROM sample
    )
    {union}
    """


# --- equi-width histogram -----------------------------------------------------


def equi_width_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Fixed-bin histogram with explicit under/overflow buckets — the
    distribution profile a DQ dashboard plots. Bucket 0 is v < lo,
    bucket n_bins+1 is v >= hi, interior bucket i covers
    [lo + (i-1)*w, lo + i*w) with w = (hi-lo)/n_bins. One combinable
    aggregate; bin edges derived from the bucket index (no second
    pass). Empty buckets are absent (LEFT-join a bin spine downstream
    if a dense axis is needed). NULL values are excluded (they are a
    DQ metric, not a histogram bin)."""
    v = F.col(value_col).cast("double")
    w = (hi - lo) / n_bins
    bucket = (
        F.when(v < F.lit(float(lo)), F.lit(0))
        .when(v >= F.lit(float(hi)), F.lit(n_bins + 1))
        .otherwise(F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("int") + 1)
    )
    return (
        df.filter(v.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bucket",
            F.round(F.lit(float(lo)) + (F.col("bucket") - 1) * F.lit(w), 6).alias(
                "bin_lo"
            ),
            F.round(F.lit(float(lo)) + F.col("bucket") * F.lit(w), 6).alias(
                "bin_hi"
            ),
            "n_rows",
        )
    )


def sql_equi_width_histogram(
    table: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    where: str = "1=1",
) -> str:
    """DuckDB replay (identical bucket arithmetic — same double
    division and floor, so boundary values bucket identically)."""
    w = (hi - lo) / n_bins
    bucket = f"""CASE
        WHEN CAST({value_col} AS DOUBLE) < {float(lo)} THEN 0
        WHEN CAST({value_col} AS DOUBLE) >= {float(hi)} THEN {n_bins + 1}
        ELSE CAST(floor((CAST({value_col} AS DOUBLE) - {float(lo)}) / {w})
             AS INT) + 1 END"""
    return f"""
    SELECT bucket,
        round(CAST({float(lo)} AS DOUBLE) + (bucket - 1) * CAST({w} AS DOUBLE), 6) AS bin_lo,
        round(CAST({float(lo)} AS DOUBLE) + bucket * CAST({w} AS DOUBLE), 6) AS bin_hi,
        count(*) AS n_rows
    FROM (
        SELECT {bucket} AS bucket
        FROM {table}
        WHERE ({where}) AND {value_col} IS NOT NULL
    ) GROUP BY bucket
    """


# --- population stability index (distribution drift) -------------------------


def psi_drift(
    df_base: DataFrame,
    df_new: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a baseline and a new snapshot
    of ``value_col`` — the standard drift gate in front of a model or a
    curation threshold re-use: PSI = sum_bins (p_new - p_base) *
    ln(p_new / p_base) over the shared equi-width binning (plus
    under/overflow buckets). Rule-of-thumb thresholds the caller
    applies: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted.

    Plan shape: one combinable histogram aggregate per side (each folds
    its table to <= n_bins+2 rows), FULL OUTER join on the bin spine,
    epsilon-floored shares so empty bins stay finite — everything after
    the two scans is bins-sized arithmetic. Returns one row per
    occupied bin (bucket, p_base, p_new, psi_term) plus the total as
    bucket = -1."""
    # NOTE (r14, examined + rejected): the two <= n_bins+2-row histograms
    # are each consumed twice and the union's total leg re-embeds the
    # terms subtree, so the plan shows 8 table scans. Persisting hb/hn was
    # A/B'd at sf0.1 and REGRESSED (0.62 -> 1.14 s min-of-3): the persist
    # jobs + stage boundaries cost more than re-running combinable
    # histogram aggregates over a page-cached scan. Left duplicated on
    # measurement (the scans are pruned to one column and map-side-fold
    # to <= 12 rows — cheap at any scale relative to a materialization).
    hb = equi_width_histogram(df_base, value_col, lo, hi, n_bins)
    hn = equi_width_histogram(df_new, value_col, lo, hi, n_bins)
    tb = hb.agg(F.sum("n_rows").alias("_tb"))
    tn = hn.agg(F.sum("n_rows").alias("_tn"))
    joined = (
        hb.select("bucket", F.col("n_rows").alias("n_base"))
        .join(
            hn.select("bucket", F.col("n_rows").alias("n_new")),
            "bucket",
            "full_outer",
        )
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(tn))
    )
    p_base = F.greatest(
        F.coalesce(F.col("n_base"), F.lit(0)) / F.col("_tb"), F.lit(float(eps))
    )
    p_new = F.greatest(
        F.coalesce(F.col("n_new"), F.lit(0)) / F.col("_tn"), F.lit(float(eps))
    )
    terms = joined.select(
        "bucket",
        F.round(p_base, 6).alias("p_base"),
        F.round(p_new, 6).alias("p_new"),
        F.round((p_new - p_base) * F.log(p_new / p_base), 6).alias("psi_term"),
    )
    total = terms.agg(
        F.lit(-1).alias("bucket"),
        F.round(F.lit(0.0), 6).alias("p_base"),
        F.round(F.lit(0.0), 6).alias("p_new"),
        F.round(F.sum("psi_term"), 6).alias("psi_term"),
    )
    return terms.unionByName(total)


def sql_psi_drift(
    table: str,
    value_col: str,
    base_where: str,
    new_where: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> str:
    """DuckDB replay of ``psi_drift`` over two filters of one table
    (identical bucket arithmetic and epsilon floor)."""
    w = (hi - lo) / n_bins

    def hist(where):
        return f"""
        SELECT CASE
            WHEN CAST({value_col} AS DOUBLE) < {float(lo)} THEN 0
            WHEN CAST({value_col} AS DOUBLE) >= {float(hi)} THEN {n_bins + 1}
            ELSE CAST(floor((CAST({value_col} AS DOUBLE) - {float(lo)}) / {w})
                 AS INT) + 1 END AS bucket,
            count(*) AS n
        FROM {table} WHERE ({where}) AND {value_col} IS NOT NULL
        GROUP BY 1"""

    return f"""
    WITH hb AS ({hist(base_where)}), hn AS ({hist(new_where)}),
    tb AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM hb),
    tn AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM hn),
    j AS (
        SELECT coalesce(hb.bucket, hn.bucket) AS bucket,
            greatest(coalesce(hb.n, 0) / tb.t, {float(eps)}) AS p_base,
            greatest(coalesce(hn.n, 0) / tn.t, {float(eps)}) AS p_new
        FROM hb FULL OUTER JOIN hn ON hb.bucket = hn.bucket, tb, tn
    ), terms AS (
        SELECT bucket, round(p_base, 6) AS p_base, round(p_new, 6) AS p_new,
            round((p_new - p_base) * ln(p_new / p_base), 6) AS psi_term
        FROM j
    )
    SELECT * FROM terms
    UNION ALL
    SELECT -1 AS bucket, round(CAST(0.0 AS DOUBLE), 6) AS p_base,
        round(CAST(0.0 AS DOUBLE), 6) AS p_new,
        round(sum(psi_term), 6) AS psi_term
    FROM terms
    """


# --- categorical association (mutual information / chi-square) ---------------


def categorical_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Association strength between two categorical columns — the
    feature-redundancy / leakage probe (is `source` just `lang` in
    disguise?): mutual information (nats) and the chi-square statistic
    over the contingency table.

    Plan shape: ONE combinable groupBy(a, b) builds the contingency
    cells; marginals derive from the cells (cardinality-sized
    re-aggregations, not table rescans); the total is a one-row
    broadcast. Everything past the first aggregate is
    category-cardinality-sized. NULL categories are real levels and are
    routed through a sentinel (both engines agree)."""
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("<null>"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("<null>"))
    cells = df.groupBy(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).alias("n_ab")
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    cells = pooled_persist(cells)  # feeds marginals AND the term sum
    ma = cells.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    tot = cells.agg(F.sum("n_ab").alias("n"))
    j = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    p_ab = F.col("n_ab") / F.col("n")
    p_a = F.col("n_a") / F.col("n")
    p_b = F.col("n_b") / F.col("n")
    # double BEFORE the product: a long*long marginal product overflows
    # (ANSI error) at ~3e9-row marginals; the double product is exact up
    # to 2^53 and the oracle's integer product rounds identically there
    e = F.col("n_a").cast("double") * F.col("n_b") / F.col("n")
    return j.agg(
        F.round(F.sum(p_ab * F.log(p_ab / (p_a * p_b))), 6).alias("mi_nats"),
        F.round(
            F.sum((F.col("n_ab") - e) * (F.col("n_ab") - e) / e), 6
        ).alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
        F.first("n").alias("n_rows"),
    )


def sql_categorical_association(table: str, col_a: str, col_b: str) -> str:
    """DuckDB replay of ``categorical_association``."""
    return f"""
    WITH cells AS (
        SELECT coalesce(CAST({col_a} AS VARCHAR), '<null>') AS a,
            coalesce(CAST({col_b} AS VARCHAR), '<null>') AS b,
            count(*) AS n_ab
        FROM {table} GROUP BY 1, 2
    ), ma AS (SELECT a, sum(n_ab) AS n_a FROM cells GROUP BY a),
    mb AS (SELECT b, sum(n_ab) AS n_b FROM cells GROUP BY b),
    tot AS (SELECT CAST(sum(n_ab) AS DOUBLE) AS n FROM cells),
    j AS (
        SELECT cells.*, ma.n_a, mb.n_b, tot.n
        FROM cells JOIN ma USING (a) JOIN mb USING (b), tot
    )
    SELECT
        round(sum((n_ab / n) * ln((n_ab / n) / ((n_a / n) * (n_b / n)))), 6)
            AS mi_nats,
        round(sum((n_ab - n_a * n_b / n) * (n_ab - n_a * n_b / n)
            / (n_a * n_b / n)), 6) AS chi2,
        count(*) AS n_cells,
        CAST(any_value(n) AS BIGINT) AS n_rows
    FROM j
    """


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    privacy gate a training-data release pipeline runs before shipping:
    a row is at risk when its quasi-identifier group has fewer than
    ``k`` members. One combinable groupBy + one aggregate over the
    group-sized frame; nothing data-sized past the first fold.

    Returns one row (n_groups, violating_groups, rows_at_risk,
    min_group_size, k_anonymous) where k_anonymous is true iff every
    group has >= k rows."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n") < k).cast("long")).alias("violating_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n") < k, F.col("n"))), F.lit(0)
        ).alias("rows_at_risk"),
        F.min("n").alias("min_group_size"),
        (F.min("n") >= k).alias("k_anonymous"),
    )


def sql_k_anonymity_report(
    table: str, quasi_cols: list[str], k: int = 5, where: str = "1=1"
) -> str:
    """DuckDB replay of ``k_anonymity_report``."""
    qc = ", ".join(quasi_cols)
    return f"""
    WITH g AS (
        SELECT {qc}, count(*) AS n FROM {table} WHERE {where} GROUP BY {qc}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
        CAST(sum(CASE WHEN n < {k} THEN 1 ELSE 0 END) AS BIGINT)
            AS violating_groups,
        CAST(coalesce(sum(CASE WHEN n < {k} THEN n END), 0) AS BIGINT)
            AS rows_at_risk,
        CAST(min(n) AS BIGINT) AS min_group_size,
        min(n) >= {k} AS k_anonymous
    FROM g
    """


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit — k-anonymity's stronger sibling (Machanavajjhala
    et al., ICDE 2006): a quasi-identifier group is safe only when it
    contains at least ``l`` DISTINCT values of the sensitive attribute
    (a k-anonymous group whose members all share one diagnosis still
    leaks it). One two-level fold: (quasi, sensitive) grain, then quasi
    grain counting distinct sensitives — both combinable; nothing
    data-sized past the first.

    NULL sensitive values are EXCLUDED on both engines (r10 review):
    missing data is not a disclosed value, and counting the NULL
    pseudo-group toward ``l`` would report a group whose every real
    member shares one value as diverse. A group that is entirely NULL
    therefore disappears from the audit (nothing is disclosed there).
    When NOTHING is disclosed anywhere (zero audited groups) the
    verdict is vacuously l-diverse with violating_groups = 0 and a
    NULL min_l — coalesced on both engines so the gate never returns
    a NULL verdict.

    Returns one row (n_groups, violating_groups, min_l, l_diverse)."""
    per_sens = (
        df.filter(F.col(sensitive_col).isNotNull())
        .groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    groups = per_sens.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("nd")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(
            F.sum((F.col("nd") < l).cast("long")), F.lit(0)
        ).alias("violating_groups"),
        F.min("nd").alias("min_l"),
        F.coalesce(F.min("nd") >= l, F.lit(True)).alias("l_diverse"),
    )


def sql_l_diversity_report(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``l_diversity_report``."""
    qc = ", ".join(quasi_cols)
    return f"""
    WITH ps AS (
        SELECT {qc}, {sensitive_col}, count(*) AS _n
        FROM {table}
        WHERE ({where}) AND {sensitive_col} IS NOT NULL
        GROUP BY {qc}, {sensitive_col}
    ), g AS (
        SELECT {qc}, count(*) AS nd FROM ps GROUP BY {qc}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
        CAST(coalesce(sum(CASE WHEN nd < {l} THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS violating_groups,
        CAST(min(nd) AS BIGINT) AS min_l,
        coalesce(min(nd) >= {l}, TRUE) AS l_diverse
    FROM g
    """


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.3,
    ordered: bool = False,
) -> DataFrame:
    """t-closeness audit — the distributional strengthening of
    [k-anonymity, l-diversity] (Li, Li & Venkatasubramanian, ICDE
    2007): an l-diverse group can still leak when its sensitive-value
    DISTRIBUTION diverges from the table's (a group that is 90% one
    diagnosis discloses a belief update even with l distinct values).
    A quasi-identifier group passes when the distance between its
    sensitive distribution and the GLOBAL distribution is <= ``t``:

    - ``ordered=False`` (categorical): total variational distance
      ``0.5 * sum_i |p_i - q_i|``;
    - ``ordered=True`` (ordinal/numeric domain): Earth Mover's
      Distance with unit ground steps, which for sorted values
      reduces to ``sum_i |cumsum(p - q)_i| / (m - 1)`` (m = distinct
      sensitive values; 0 when m = 1).

    NULL sensitive values are excluded exactly as in
    :func:`l_diversity_report` (nothing is disclosed by missing data).

    Scale shape: one combinable (quasi, sensitive) fold, then
    everything derives from that cell frame — class sizes by a second
    combinable fold, the global distribution by a sensitive-grain fold
    re-attached via BROADCAST (the sensitive DOMAIN is bounded vocab
    by contract — an audit over a million-value sensitive column is a
    different problem), and the per-class distance over a spine of
    (classes x m) rows whose per-class window partitions hold exactly
    m rows. Nothing data-sized past the first fold; the verdict
    aggregate is one row. Distances compare at 6dp on both engines so
    IEEE partial-sum order cannot flip a boundary group.

    Returns one row (n_groups, violating_groups, max_dist, t_close)."""
    cells = (
        df.filter(F.col(sensitive_col).isNotNull())
        .groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    cells = pooled_persist(cells)
    class_n = cells.groupBy(*quasi_cols).agg(F.sum("_n").alias("_cn"))
    glob = cells.groupBy(sensitive_col).agg(F.sum("_n").alias("_gn"))
    tot = cells.agg(
        F.sum("_n").alias("_tot"),
        F.count_distinct(F.col(sensitive_col)).alias("_m"),
    )
    # NULL-SAFE cell re-join (r11 review): a quasi GROUP KEY may itself
    # be NULL (k_anonymity/l_diversity audit such groups via plain
    # groupBy) — non-null-safe equality would never match that group's
    # own cells, score its distribution as all-zeros, and flag a
    # perfectly-close group as maximally distant. The sensitive side
    # needs no null-safety (NULL sensitives are excluded above).
    cells_r = cells.select(
        *[F.col(c).alias(f"_e_{c}") for c in quasi_cols],
        F.col(sensitive_col).alias("_e_s"),
        "_n",
    )
    cond = F.col(sensitive_col) == F.col("_e_s")
    for c in quasi_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_e_{c}"))
    spine = (
        class_n.crossJoin(F.broadcast(glob.crossJoin(tot)))
        .join(cells_r, cond, "left")
        .drop("_e_s", *[f"_e_{c}" for c in quasi_cols])
    )
    p = F.coalesce(F.col("_n"), F.lit(0)).cast("double") / F.col("_cn")
    q = F.col("_gn").cast("double") / F.col("_tot")
    if ordered:
        w = (
            Window.partitionBy(*quasi_cols)
            .orderBy(F.col(sensitive_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = spine.select(
            *quasi_cols,
            F.col("_m"),
            F.sum(p - q).over(w).alias("_cum"),
        )
        per_class = cum.groupBy(*quasi_cols).agg(
            F.round(
                F.sum(F.abs(F.col("_cum")))
                / F.greatest(F.max("_m") - 1, F.lit(1)).cast("double"),
                6,
            ).alias("_dist")
        )
    else:
        per_class = spine.groupBy(*quasi_cols).agg(
            F.round(F.sum(F.abs(p - q)) * 0.5, 6).alias("_dist")
        )
    return per_class.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(
            F.sum((F.col("_dist") > t).cast("long")), F.lit(0)
        ).alias("violating_groups"),
        F.max("_dist").alias("max_dist"),
        F.coalesce(F.max("_dist") <= t, F.lit(True)).alias("t_close"),
    )


def sql_t_closeness_report(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.3,
    ordered: bool = False,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``t_closeness_report`` (same NULL exclusion,
    same variational / unit-step-EMD arithmetic, same 6dp compare)."""
    qc = ", ".join(quasi_cols)
    s = sensitive_col
    if ordered:
        cum_cte = f""",
    cum_t AS (
        SELECT {qc}, {s}, _m,
            sum(p - q) OVER (
                PARTITION BY {qc} ORDER BY {s}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS cum
        FROM spine
    ),
    dists AS (
        SELECT {qc},
            round(sum(abs(cum))
                / CAST(greatest(max(_m) - 1, 1) AS DOUBLE), 6) AS _dist
        FROM cum_t GROUP BY {qc}
    )"""
    else:
        cum_cte = f""",
    dists AS (
        SELECT {qc},
            round(sum(abs(p - q)) * 0.5, 6) AS _dist
        FROM spine GROUP BY {qc}
    )"""
    return f"""
    WITH cells AS (
        SELECT {qc}, {s}, count(*) AS _n
        FROM {table}
        WHERE ({where}) AND {s} IS NOT NULL
        GROUP BY {qc}, {s}
    ),
    class_n AS (SELECT {qc}, sum(_n) AS _cn FROM cells GROUP BY {qc}),
    gdist AS (SELECT {s}, sum(_n) AS _gn FROM cells GROUP BY {s}),
    tot AS (
        SELECT sum(_n) AS _tot, count(DISTINCT {s}) AS _m FROM cells
    ),
    spine AS (
        SELECT c.*, g.{s}, g._gn, tot._tot, tot._m,
            CAST(coalesce(e._n, 0) AS DOUBLE) / c._cn AS p,
            CAST(g._gn AS DOUBLE) / tot._tot AS q
        FROM class_n c CROSS JOIN gdist g CROSS JOIN tot
        LEFT JOIN cells e
            ON {' AND '.join(f'c.{x} IS NOT DISTINCT FROM e.{x}' for x in quasi_cols)}
            AND g.{s} = e.{s}
    ){cum_cte}
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
        CAST(coalesce(sum(CASE WHEN _dist > {t} THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS violating_groups,
        max(_dist) AS max_dist,
        coalesce(max(_dist) <= {t}, TRUE) AS t_close
    FROM dists
    """


def benford_audit(df: DataFrame, int_col) -> DataFrame:
    """Benford's-law first-digit audit — the forensic data-quality gate
    (fabricated or truncated numeric columns drift from the log
    distribution real measurements follow). ``int_col`` is an
    INTEGER-VALUED column or expression (callers scale decimals first,
    e.g. ``round(value * 100)``) so the leading digit comes from exact
    integer rendering — no float log10 boundary hazards between
    engines. The contract is ENFORCED (r10): the operator wraps the
    expression in round() on BOTH engines before the BIGINT cast,
    because Spark ``.cast('bigint')`` truncates while DuckDB CAST
    rounds — a raw double column would otherwise get silently
    different digit counts.

    One combinable digit-count fold (<= 9 groups) plus a one-row
    chi-square against the Benford shares. Returns one row per observed
    digit: (digit, n, share, benford_share, chi2_total) — chi2_total
    repeated per row so the output stays one flat table."""
    raw = F.col(int_col) if isinstance(int_col, str) else int_col
    col = F.round(raw)  # half-away-from-zero on both engines
    digit = F.substring(F.abs(col.cast("bigint")).cast("string"), 1, 1).cast(
        "int"
    )
    counts = (
        df.filter(raw.isNotNull() & (col.cast("bigint") != 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    import math

    bshare = F.element_at(
        F.array(*[F.lit(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]),
        F.col("digit"),
    )
    tot = F.sum("n").over(Window.partitionBy())
    share = F.col("n").cast("double") / tot.cast("double")
    term = (
        (share - F.col("benford_share"))
        * (share - F.col("benford_share"))
        / F.col("benford_share")
    )
    base = counts.select(
        "digit", "n", bshare.alias("benford_share")
    )
    with_share = base.select(
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round("benford_share", 6).alias("benford_share"),
        (term * tot.cast("double")).alias("_chi"),
    )
    chi = with_share.agg(F.round(F.sum("_chi"), 6).alias("chi2_total"))
    return with_share.drop("_chi").crossJoin(chi)


def sql_benford_audit(table: str, int_expr: str, where: str = "1=1") -> str:
    """DuckDB replay of ``benford_audit`` (same integer-rendered leading
    digit, same chi-square arithmetic)."""
    import math

    # CAST: a bare decimal literal is DECIMAL in DuckDB and would drag
    # the share arithmetic through decimal truncation
    bvals = ", ".join(
        f"CAST({math.log10(1.0 + 1.0 / d)!r} AS DOUBLE)" for d in range(1, 10)
    )
    return f"""
    WITH counts AS (
        SELECT CAST(substr(CAST(abs(CAST(round({int_expr}) AS BIGINT))
                    AS VARCHAR), 1, 1) AS INT) AS digit,
            count(*) AS n
        FROM {table}
        WHERE ({where}) AND {int_expr} IS NOT NULL
            AND CAST(round({int_expr}) AS BIGINT) <> 0
        GROUP BY 1
    ), b AS (
        SELECT digit, n, ([{bvals}])[digit] AS benford_share,
            CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share_raw,
            CAST(sum(n) OVER () AS DOUBLE) AS tot
        FROM counts
    ), chi AS (
        SELECT round(sum((share_raw - benford_share)
                         * (share_raw - benford_share)
                         / benford_share * tot), 6) AS chi2_total
        FROM b
    )
    SELECT digit, CAST(n AS BIGINT) AS n, round(share_raw, 6) AS share,
        round(benford_share, 6) AS benford_share, chi.chi2_total
    FROM b, chi
    """


def woe_iv_binning(
    df: DataFrame,
    value_col: str,
    target: Column,
    id_col: str,
    n_bins: int = 10,
    impl: str = "ntile",
    rank_buckets: int = 32,
) -> DataFrame:
    """Weight-of-evidence feature audit: equal-population bins of
    ``value_col`` (ntile, ties broken by ``id_col`` — the standing
    total-order bucket contract) scored by
    WOE = ln((goodᵢ/good_tot)/(badᵢ/bad_tot)) against the boolean
    ``target``, plus the information value
    IV = Σ (g% − b%)·WOE — the classic feature-selection /
    population-drift statistic (IV < 0.02 useless, > 0.5 suspicious).

    A bin with zero goods or zero bads has undefined WOE: emitted NULL
    and excluded from IV (coalesce 0) — stated, not smoothed; callers
    wanting Laplace smoothing can pre-aggregate.

    ``impl='ntile'`` bins with one global window over the raw rows —
    the exact-semantics oracle anchor, and a single-task sort at row
    grain. ``impl='bucketed'`` (r10 verdict #3) computes the SAME bins
    without any single-partition window: the two-phase
    ``curation.global_rank`` (approxQuantile-sampled range buckets,
    per-bucket row_number + broadcast offsets) yields every row's exact
    global rank, and SQL ntile's bucket rule (the first N mod n bins
    carry one extra row) is then pure integer arithmetic on that rank —
    bit-identical bins, hash-checkable against the SAME ntile oracle.
    That is the flavor to run at the 100x tier; IV arithmetic is shared
    verbatim."""
    # NULL values are excluded on BOTH engines before the ntile: Spark
    # orders NULLS FIRST (bin 1), DuckDB NULLS LAST (bin n) — leaving
    # them in shifts every bin boundary differently per engine
    if impl not in ("ntile", "bucketed"):
        raise ValueError(f"unknown impl {impl!r}")
    base = df.filter(F.col(value_col).isNotNull())
    if impl == "bucketed":
        from asctb_ct_label_mapper_spark.operators.curation import (
            global_rank,
            rank_buckets_from_sample,
        )

        sel = base.select(
            F.col(value_col).alias("_v"),
            F.col(id_col).alias("_id"),
            target.cast("int").alias("_g"),
        )
        ranked = global_rank(
            sel,
            bucket=rank_buckets_from_sample(sel, "_v", rank_buckets),
            order_cols=["_v", "_id"],
            rank_col="_rk",
        )
        tot = sel.agg(F.count(F.lit(1)).alias("_N"))
        # ntile(n) over N rows: q = N div n full bins, the first
        # r = N mod n bins take one extra row — replayed from the
        # 0-based global rank with exact integer division (div, never
        # float). q = 0 (N < n) keeps every row in the THEN branch, so
        # the div-by-zero arm is never evaluated.
        binned = (
            ranked.crossJoin(F.broadcast(tot))
            .withColumn("_q", F.expr(f"_N div {int(n_bins)}"))
            .withColumn("_r", F.col("_N") % int(n_bins))
            .select(
                F.expr(
                    "CAST(CASE WHEN (_rk - 1) < _r * (_q + 1)"
                    " THEN (_rk - 1) div (_q + 1)"
                    " ELSE _r + ((_rk - 1) - _r * (_q + 1)) div _q"
                    " END + 1 AS INT)"
                ).alias("bin"),
                "_g",
            )
        )
    else:
        binned = base.select(
            F.ntile(n_bins)
            .over(Window.orderBy(F.col(value_col), F.col(id_col)))
            .alias("bin"),
            target.cast("int").alias("_g"),
        )
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    # n_bins rows, FOUR consumers (with_woe, its tots broadcast, the iv
    # broadcast, and iv's own tots) — unpersisted, each broadcast subtree
    # re-embedded the whole upstream binning chain, so the corpus scan +
    # rank window ran up to 4x per action (guide §2.4 duplicated
    # subtrees; the bucketed flavor's plan showed 12 parquet scans).
    per_bin = pooled_persist(
        binned.groupBy("bin").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_g").alias("n_good"),
            (F.count(F.lit(1)) - F.sum("_g")).alias("n_bad"),
        )
    )
    tots = per_bin.agg(
        F.sum("n_good").alias("_gt"), F.sum("n_bad").alias("_bt")
    )
    scored = per_bin.crossJoin(F.broadcast(tots))
    g_rate = F.col("n_good").cast("double") / F.col("_gt").cast("double")
    b_rate = F.col("n_bad").cast("double") / F.col("_bt").cast("double")
    woe = F.when(
        (F.col("n_good") > 0) & (F.col("n_bad") > 0),
        F.log(g_rate / b_rate),
    )
    with_woe = scored.select(
        "bin",
        "n",
        "n_good",
        "n_bad",
        F.round(woe, 6).alias("woe"),
        ((g_rate - b_rate) * woe).alias("_ivc"),
    )
    iv = with_woe.agg(
        F.round(F.sum(F.coalesce(F.col("_ivc"), F.lit(0.0))), 6).alias(
            "iv_total"
        )
    )
    return with_woe.drop("_ivc").crossJoin(F.broadcast(iv))


def sql_woe_iv_binning(
    table: str,
    value_col: str,
    target_expr: str,
    id_col: str,
    n_bins: int = 10,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``woe_iv_binning`` (same tie-broken ntile, same
    NULL-on-degenerate-bin contract, same coalesce-0 IV)."""
    return f"""
    WITH binned AS (
        SELECT ntile({n_bins}) OVER (ORDER BY {value_col}, {id_col}) AS bin,
            CAST({target_expr} AS INT) AS g
        FROM {table} WHERE ({where}) AND {value_col} IS NOT NULL
    ), per_bin AS (
        SELECT bin, count(*) AS n, sum(g) AS n_good,
            count(*) - sum(g) AS n_bad
        FROM binned GROUP BY 1
    ), tots AS (
        SELECT sum(n_good) AS gt, sum(n_bad) AS bt FROM per_bin
    ), scored AS (
        SELECT bin, n, n_good, n_bad,
            CASE WHEN n_good > 0 AND n_bad > 0
                 THEN ln((CAST(n_good AS DOUBLE) / CAST(gt AS DOUBLE))
                         / (CAST(n_bad AS DOUBLE) / CAST(bt AS DOUBLE)))
            END AS woe_raw,
            CAST(n_good AS DOUBLE) / CAST(gt AS DOUBLE)
                - CAST(n_bad AS DOUBLE) / CAST(bt AS DOUBLE) AS diff
        FROM per_bin, tots
    ), iv AS (
        SELECT round(sum(coalesce(diff * woe_raw, 0.0)), 6) AS iv_total
        FROM scored
    )
    SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_good AS BIGINT) AS n_good,
        CAST(n_bad AS BIGINT) AS n_bad,
        round(woe_raw, 6) AS woe, iv.iv_total
    FROM scored, iv
    """
