"""Sequential-pattern funnel analysis over the events table.

The engine-brief analytics family (tumbling counts, sessionization,
view->click attribution) stops at two-step patterns; this adds the classic
N-step conversion funnel: for each user, the FIRST entry event, then the
first next-step event within a gap of the previous step, chained.

Plan shape (the 100 TB contract): ONE shuffle on user_id. Every step is a
conditional-min window over the same ``partitionBy(user_id)`` window, and
consecutive windows over an identical partitioning reuse one Exchange —
step count grows the projection chain, never the shuffle count. No joins,
no UDFs, no per-user row expansion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    gap_minutes: int = 30,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel: first ``steps[0]`` event, then for each later step
    the first matching event strictly after the previous step's event and
    within ``gap_minutes`` of it. Returns one row per user that entered
    the funnel: (user_id, <step>_ts ... one formatted-string column per
    step, NULL once the chain breaks, stage = number of steps reached).
    """
    w = Window.partitionBy(user_col)
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    ts = F.col(ts_col)

    # only step-type rows can satisfy any window condition, and the
    # post-window distinct collapses the per-user result to the same
    # rows either way — so the step-set filter is semantics-identical
    # (pinned by a hash-equality test) and runs BEFORE the user
    # Exchange, cutting scan output and shuffle volume by the non-step
    # fraction. At 100 TB with dozens of event types this is the
    # difference between shuffling three types and shuffling the log.
    df = events.select(user_col, type_col, ts_col).filter(
        F.col(type_col).isin(*steps)
    )
    prev: Column | None = None
    step_cols = []
    for step in steps:
        name = f"_{step}_ts"
        if prev is None:
            cond = F.col(type_col) == step
        else:
            cond = (
                (F.col(type_col) == step) & (ts > prev) & (ts <= prev + gap)
            )
        # each F.min(...).over(w) shares the SAME user partitioning: Spark
        # plans one Exchange and a chain of Window operators over it
        df = df.withColumn(name, F.min(F.when(cond, ts)).over(w))
        prev = F.col(name)
        step_cols.append(name)

    out = df.filter(F.col(step_cols[0]).isNotNull()).select(
        user_col,
        *[
            F.date_format(F.col(c), _TS_FMT).alias(f"{s}_ts")
            for c, s in zip(step_cols, steps)
        ],
        sum(
            F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in step_cols
        ).alias("stage"),
    )
    return out.distinct()


def sql_funnel_steps(
    table: str = "events",
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    gap_minutes: int = 30,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB replay of ``funnel_steps``: the same conditional-min window
    chain, one CTE stage per step (a window cannot reference a window
    defined in the same SELECT)."""
    ctes = []
    prev_cte = table
    prev_col = None
    for i, step in enumerate(steps):
        col = f"{step}_raw"
        if prev_col is None:
            cond = f"{type_col} = '{step}'"
        else:
            cond = (
                f"{type_col} = '{step}' AND {ts_col} > {prev_col} "
                f"AND {ts_col} <= {prev_col} + INTERVAL {int(gap_minutes)} MINUTES"
            )
        ctes.append(
            f"s{i} AS (SELECT *, min(CASE WHEN {cond} THEN {ts_col} END)"
            f" OVER (PARTITION BY {user_col}) AS {col} FROM {prev_cte})"
        )
        prev_cte = f"s{i}"
        prev_col = col
    raw_cols = [f"{s}_raw" for s in steps]
    sel = ", ".join(
        f"strftime({c}, '%Y-%m-%d %H:%M:%S') AS {s}_ts"
        for c, s in zip(raw_cols, steps)
    )
    stage = " + ".join(
        f"CASE WHEN {c} IS NOT NULL THEN 1 ELSE 0 END" for c in raw_cols
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT DISTINCT {user_col}, {sel}, {stage} AS stage
    FROM {prev_cte}
    WHERE {raw_cols[0]} IS NOT NULL
    """


def cohort_retention(
    events: DataFrame,
    event_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention grid for one event type: users are cohorted
    by the week (Monday-start) of their FIRST ``event_type`` event, then
    each (cohort_week, week_offset) cell counts the distinct cohort
    members active ``week_offset`` weeks after their own first event.
    Returns (cohort_week 'yyyy-MM-dd', week_offset, active_users).

    Plan shape (the 100 TB contract): the type filter is pushed into the
    scan, the per-user first date is a min window over ONE user_id
    Exchange (no groupBy+self-join), and the week offset is pure integer
    day arithmetic — ``floor(datediff/7)`` — identical in the DuckDB
    oracle, so no engine-specific week-boundary semantics can diverge.
    The final distinct count re-shuffles only (cohort, offset, user)
    triples, already deduplicated map-side by the partial aggregate.
    """
    w = Window.partitionBy(user_col)
    ev = events.filter(F.col(type_col) == event_type).select(
        F.col(user_col), F.to_date(ts_col).alias("d")
    )
    ev = ev.withColumn("first_date", F.min("d").over(w))
    return (
        ev.select(
            F.date_format(F.date_trunc("week", "first_date"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.floor(F.datediff("d", "first_date") / 7).alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("active_users"))
    )


def sql_cohort_retention(
    table: str = "events",
    event_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB replay of ``cohort_retention`` (same Monday-start
    date_trunc('week'), same integer floor(day-diff/7) offset)."""
    return f"""
    WITH ev AS (
        SELECT {user_col}, CAST({ts_col} AS DATE) AS d
        FROM {table} WHERE {type_col} = '{event_type}'
    ),
    with_first AS (
        SELECT {user_col}, d,
            min(d) OVER (PARTITION BY {user_col}) AS first_date
        FROM ev
    )
    SELECT strftime(date_trunc('week', first_date), '%Y-%m-%d') AS cohort_week,
        CAST(floor(datediff('day', first_date, d) / 7.0) AS BIGINT) AS week_offset,
        count(DISTINCT {user_col}) AS active_users
    FROM with_first
    GROUP BY 1, 2
    """


def calendar_fill(
    events: DataFrame,
    value_threshold: float = 300.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Zero-filled daily incident grid: count events with ``value_col`` >
    ``value_threshold`` per (event_type, day), on a DENSE calendar spine
    covering [min day, max day] of the stream x all event types — days
    (or types) with no qualifying events emit an explicit 0 row. The
    gap-fill every dashboard and anomaly detector needs: a missing day
    must read as zero, not as absent.

    NULL contract (review finding): rows with NULL ``type_col`` or NULL
    ``ts_col`` are EXCLUDED up front — an equality join can never match a
    NULL key, so without the explicit filter a NULL-typed qualifying
    event would be silently dropped from counts while still minting a
    phantom all-zero NULL series from the type dim. Explicit exclusion
    (mirrored in the oracle) makes that a documented contract instead of
    a silent asymmetry.

    Plan shape (the 100 TB contract): the stream is scanned ONCE, into a
    dimension-sized (type, day) grid whose qualifying count is a
    conditional sum; the calendar span, the type dim, and the left-join
    base are all derived from that GRID (grid rows exist wherever any
    event exists, so its min/max day and distinct types equal the
    stream's). The grid is pooled-persisted: Spark does NOT dedupe
    self-referencing subtrees, so without the persist each of the three
    grid consumers would re-scan the raw stream (single-scan contract is
    plan-asserted in tests). The spine is a 1-row span agg exploded into
    days, cross-joined with the type dim — broadcast-trivial either
    side. Returns (day 'yyyy-MM-dd', event_type, n).
    """
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist
    grid = (
        events.filter(
            F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(type_col),
            F.to_date(ts_col).alias("d"),
            F.col(value_col),
        )
        .groupBy(type_col, "d")
        .agg(
            F.sum(
                F.when(F.col(value_col) > value_threshold, 1).otherwise(0)
            ).alias("n")
        )
    )
    grid = pooled_persist(grid)
    span = grid.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    days = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    types = grid.select(type_col).distinct()
    spine = types.crossJoin(days)
    return (
        spine.join(grid, [type_col, "d"], "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col(type_col),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
    )


def sql_calendar_fill(
    table: str = "events",
    value_threshold: float = 300.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB replay of ``calendar_fill`` (same NULL exclusion, same
    grid-derived generate_series spine, same left-join zero coalesce)."""
    return f"""
    WITH grid AS (
        SELECT {type_col}, CAST({ts_col} AS DATE) AS d,
            sum(CASE WHEN {value_col} > {float(value_threshold)}
                THEN 1 ELSE 0 END) AS n
        FROM {table}
        WHERE {type_col} IS NOT NULL AND {ts_col} IS NOT NULL
        GROUP BY 1, 2
    ),
    span AS (SELECT min(d) AS lo, max(d) AS hi FROM grid),
    days AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        FROM span
    ),
    types AS (SELECT DISTINCT {type_col} FROM grid)
    SELECT strftime(d.d, '%Y-%m-%d') AS day, t.{type_col},
        coalesce(g.n, 0) AS n
    FROM types t
    CROSS JOIN days d
    LEFT JOIN grid g ON g.{type_col} = t.{type_col} AND g.d = d.d
    """


def user_journeys(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    sep: str = ">",
    max_group_rows: int | None = None,
) -> DataFrame:
    """Sequence assembly: per (user, day), the ORDERED event-type path as
    one separator-joined string — the behavioral-ML feature (journey
    mining, next-action models) and the session-replay debugging view.

    ``max_group_rows`` (opt-in) enforces the bounded-(user, day) contract
    the packing relies on via ``dq.assert_group_bound`` — a bot account
    with 10^7 events in one day raises a named error instead of OOMing
    the packing task.

    Determinism contract: order inside a path is (ts, event_id) — the
    tie-break matters because collect_list carries NO ordering guarantee
    in a distributed agg. The sort happens AFTER collection via
    ``array_sort`` over (ts, id, type) structs (lexicographic struct
    compare), so the plan stays one groupBy shuffle — no window sort
    followed by a second agg. Output string order is identical to the
    oracle's ``string_agg(... ORDER BY ts, event_id)``.

    Scale: one shuffle on (user, day); per-cell memory is the day's
    events for one user — bounded by daily activity, not history.
    Returns (user_id, day 'yyyy-MM-dd', path, n_events).
    """
    cell = events.select(
        F.col(user_col),
        F.date_format(F.to_date(ts_col), "yyyy-MM-dd").alias("day"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("et"),
        ).alias("s"),
    )
    if max_group_rows is not None:
        from asctb_ct_label_mapper_spark.operators.dq import assert_group_bound

        assert_group_bound(
            cell, [user_col, "day"], max_group_rows, label="user_journeys"
        )
    return cell.groupBy(user_col, "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda x: x.getField("et")
            ),
            sep,
        ).alias("path"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sql_user_journeys(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    sep: str = ">",
) -> str:
    """DuckDB replay of ``user_journeys`` (ordered string_agg with the
    same (ts, id) tie-break)."""
    return f"""
    SELECT {user_col}, strftime(CAST({ts_col} AS DATE), '%Y-%m-%d') AS day,
        string_agg({type_col}, '{sep}' ORDER BY {ts_col}, {id_col}) AS path,
        count(*) AS n_events
    FROM {table}
    GROUP BY 1, 2
    """


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (prev_type, next_type) pair, the transition count
    and row-normalized probability. The model behind next-action
    prediction baselines and funnel-drop diagnosis.

    Plan: lag window over ONE user_id Exchange (deterministic (ts, id)
    order), then a type-pair aggregate — the matrix is |types|² rows, so
    the normalizing per-prev sum is a window over a dimension-sized
    frame. Integer counts divide once at the end: no float accumulation.
    """
    seq_w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    trans = (
        # NULL-ts events are excluded BEFORE the lag: ts is the window
        # order key and the engines place NULLs at opposite ends (Spark
        # NULLS FIRST, DuckDB NULLS LAST), which would change the
        # consecutive-pair set — same guard as behavior.markov_transitions
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(type_col).alias("next_type"),
            F.lag(type_col).over(seq_w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm_w = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(norm_w), 6
        ).alias("p"),
    )


def sql_markov_transitions(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB replay of ``markov_transitions`` (same lag order, same
    integer-count division)."""
    return f"""
    WITH seq AS (
        SELECT {type_col} AS next_type,
            lag({type_col}) OVER (
                PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}
            ) AS prev_type
        FROM {table} WHERE {ts_col} IS NOT NULL
    ),
    trans AS (
        SELECT prev_type, next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
        round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6)
            AS p
    FROM trans
    """


# ---------------------------------------------------------------------------
# multi-touch attribution
# ---------------------------------------------------------------------------

def attribution_position(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every touch
    event is assigned to the user's NEXT conversion within
    ``lookback_days``; a conversion's credit splits 40% first touch,
    40% last touch, 20% evenly across the middles (100%/50-50 for 1-
    and 2-touch paths) — the standard marketing-mix readout between
    last-touch (the ``j_view_click_attribution`` sibling) and Shapley.

    Returns per touch type: (touch_type, n_touches, credit), credit
    rounded 6dp.

    Plan: ONE user-keyed shuffle for the next-conversion window (a
    conditional min over FOLLOWING rows — the funnel family's
    total-order contract (ts, id)), one (user, conversion)-keyed
    window pair for position/size, then a type-dimension aggregate.
    NULL-ts rows are excluded up front (no order position)."""
    w_next = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ts = F.col(ts_col)
    base = events.select(user_col, type_col, ts_col, id_col).filter(
        ts.isNotNull()
        & F.col(type_col).isin(*(list(touch_types) + [conversion_type]))
    )
    with_conv = base.withColumn(
        "_conv",
        F.min(
            F.when(F.col(type_col) == conversion_type, ts)
        ).over(w_next),
    )
    touches = with_conv.filter(
        F.col(type_col).isin(*touch_types)
        & F.col("_conv").isNotNull()
        & (
            F.col("_conv")
            <= ts + F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        )
    )
    w_grp = Window.partitionBy(user_col, "_conv")
    w_pos = w_grp.orderBy(F.col(ts_col), F.col(id_col))
    scored = touches.select(
        F.col(type_col).alias("touch_type"),
        F.row_number().over(w_pos).alias("_pos"),
        F.count(F.lit(1)).over(w_grp).alias("_n"),
    )
    credit = (
        F.when(F.col("_n") == 1, F.lit(1.0))
        .when(F.col("_n") == 2, F.lit(0.5))
        .when(F.col("_pos") == 1, F.lit(0.4))
        .when(F.col("_pos") == F.col("_n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("_n") - 2).cast("double"))
    )
    return (
        scored.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum(credit), 6).alias("credit"),
        )
    )


def sql_attribution_position(
    table: str = "events",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB replay of ``attribution_position`` (same next-conversion
    window, same U-shaped weights)."""
    tt = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
    WITH base AS (
        SELECT {user_col} AS u, {type_col} AS typ, {ts_col} AS ts,
            {id_col} AS eid
        FROM {table}
        WHERE {ts_col} IS NOT NULL
            AND {type_col} IN ({tt}, '{conversion_type}')
    ), with_conv AS (
        SELECT u, typ, ts, eid,
            min(CASE WHEN typ = '{conversion_type}' THEN ts END) OVER (
                PARTITION BY u ORDER BY ts, eid
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
            ) AS conv
        FROM base
    ), touches AS (
        SELECT u, typ, ts, eid, conv FROM with_conv
        WHERE typ IN ({tt}) AND conv IS NOT NULL
            AND conv <= ts + INTERVAL {int(lookback_days)} DAY
    ), scored AS (
        SELECT typ AS touch_type,
            row_number() OVER (PARTITION BY u, conv
                               ORDER BY ts, eid) AS pos,
            count(*) OVER (PARTITION BY u, conv) AS n
        FROM touches
    )
    SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
        round(sum(CASE WHEN n = 1 THEN 1.0
                       WHEN n = 2 THEN 0.5
                       WHEN pos = 1 THEN 0.4
                       WHEN pos = n THEN 0.4
                       ELSE 0.2 / (n - 2) END), 6) AS credit
    FROM scored GROUP BY touch_type
    """


# ---------------------------------------------------------------------------
# r12i: journey edit-distance matrix — how far apart the common paths are
# ---------------------------------------------------------------------------


def journey_distance_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    top_k: int = 10,
) -> DataFrame:
    """Pairwise Levenshtein distance between the ``top_k`` most common
    per-(user, day) journeys, on the one-letter-per-event alphabet
    (v/c/p/s/e…): the journey-SIMILARITY readout on top of
    :func:`user_journeys`' assembly — which frequent paths are one
    edit apart (a variant worth merging in a funnel definition) vs
    structurally different behaviors.

    Letters come from the event type's first character (injective on
    this schema's vocabulary); similarity = 1 − lev/max(len) is the
    usual normalized form. Both engines ship the SAME classical
    Levenshtein, so parity is exact.

    Plan: the user_journeys one-shuffle assembly, a path-grain count +
    top-k rank (count desc, path asc — injective), then a k²/2 pair
    cross of the BROADCAST top-k frame; the quadratic never touches
    more than ``top_k`` rows. Returns (path_a, path_b, n_a, n_b,
    lev, similarity), 6dp."""
    from pyspark.sql import Window

    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    cell = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col),
        F.date_format(F.to_date(ts_col), "yyyy-MM-dd").alias("day"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.substring(F.col(type_col), 1, 1).alias("et"),
        ).alias("s"),
    )
    # the user_journeys assembly (array_sort over (ts, id, letter)
    # structs — one groupBy shuffle, oracle-identical ordering), on the
    # one-letter alphabet
    paths = cell.groupBy(user_col, "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("s")),
                lambda x: x.getField("et"),
            ),
            "",
        ).alias("p")
    ).select("p")
    top = pooled_persist(
        paths.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("p").asc())
            ),
        )
        .filter(F.col("_rk") <= top_k)
        .drop("_rk")
    )
    a = top.select(F.col("p").alias("path_a"), F.col("n").alias("n_a"))
    b = top.select(F.col("p").alias("path_b"), F.col("n").alias("n_b"))
    lev = F.levenshtein(F.col("path_a"), F.col("path_b"))
    mx = F.greatest(F.length("path_a"), F.length("path_b"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("path_a") < F.col("path_b"))
        .select(
            "path_a",
            "path_b",
            "n_a",
            "n_b",
            lev.alias("lev"),
            F.round(
                1.0 - F.try_divide(lev.cast("double"), mx), 6
            ).alias("similarity"),
        )
    )


def sql_journey_distance_matrix(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    top_k: int = 10,
) -> str:
    """DuckDB replay of :func:`journey_distance_matrix` — same path
    assembly (ordered string_agg), letter compression, top-k rank, and
    Levenshtein pairing."""
    return f"""
    WITH cell AS (
        SELECT {user_col} AS u,
            strftime(CAST({ts_col} AS DATE), '%Y-%m-%d') AS day,
            string_agg(substr({type_col}, 1, 1), ''
                       ORDER BY {ts_col}, {id_col}) AS p
        FROM {table}
        WHERE {ts_col} IS NOT NULL
        GROUP BY 1, 2
    ), top AS (
        SELECT p, n FROM (
            SELECT p, count(*) AS n,
                row_number() OVER (ORDER BY count(*) DESC, p ASC) AS _rk
            FROM cell GROUP BY p
        ) WHERE _rk <= {top_k}
    )
    SELECT a.p AS path_a, b.p AS path_b, a.n AS n_a, b.n AS n_b,
        levenshtein(a.p, b.p) AS lev,
        round(1.0 - CAST(levenshtein(a.p, b.p) AS DOUBLE)
              / nullif(greatest(length(a.p), length(b.p)), 0), 6)
            AS similarity
    FROM top a JOIN top b ON a.p < b.p
    """
