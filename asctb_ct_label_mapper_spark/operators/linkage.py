"""Entity resolution: token-blocked edit-distance (fuzzy) name matching.

The reference reconciles free-text author labels against a controlled
vocabulary by exact match first (ASCTB_CT_Label_Mapper/utilities/
asctb_data_wrangling.py:79 — overwrite when the cleaned label equals a
reference label) and embedding similarity second. Between those two sits
the classic record-linkage middle ground this module supplies: *nearly*
identical strings — typos, dropped characters, singular/plural — caught by
bounded Levenshtein distance.

Semantics contract (the same contract the LSH dedup family uses): the
operator's DEFINITION is blocked — a pair is compared iff the two names
share at least one whitespace token. That blocking is part of the operator,
replayed verbatim by the DuckDB oracle, so Spark and oracle agree by
construction; it is the standard token-blocking scheme of the entity-
resolution literature (JedAI / Dedupe), not a private shortcut.

Plan shape (the 100 TB contract):

- candidate generation is an **equi-join on the token key** over the
  DISTINCT name table — never an all-pairs cross join. Candidates scale
  with token co-occurrence, not n².
- the Levenshtein verify runs **per candidate** (native JVM
  ``levenshtein`` codegen, O(len²) DP per pair), after a distinct() so a
  pair sharing three tokens is verified once.
- ubiquitous blocking tokens are the skew risk (one token shared by m
  names yields m² candidates); ``max_token_df`` drops tokens blocking
  more than that many names (a documented coverage trade, default off so
  the oracle replay stays exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str = "p_name",
    max_dist: int = 2,
    max_token_df: int | None = None,
) -> DataFrame:
    """All unordered pairs of DISTINCT ``name_col`` values that share at
    least one whitespace token and have Levenshtein distance <=
    ``max_dist``. Returns (name_a, name_b, dist) with name_a < name_b.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    names = df.select(F.col(name_col).alias("name")).filter(
        F.col("name").isNotNull()
    ).distinct()
    tok = names.select(
        "name", F.explode(F.split("name", " ")).alias("tok")
    )
    if max_token_df is not None:
        keep = (
            tok.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("tok_df"))
            .filter(F.col("tok_df") <= max_token_df)
            .select("tok")
        )
        tok = tok.join(F.broadcast(keep), "tok")
    a = tok.select(F.col("name").alias("name_a"), "tok")
    b = tok.select(F.col("name").alias("name_b"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= max_dist)


def sql_fuzzy_name_pairs(
    table: str = "part", name_col: str = "p_name", max_dist: int = 2
) -> str:
    """DuckDB replay of ``fuzzy_name_pairs`` (same token blocking, same
    distinct-pair verify; DuckDB's levenshtein is the same unit-cost DP)."""
    return f"""
    WITH names AS (
        SELECT DISTINCT {name_col} AS name FROM {table}
        WHERE {name_col} IS NOT NULL
    ),
    tok AS (
        SELECT name, unnest(string_split(name, ' ')) AS tok FROM names
    ),
    cand AS (
        SELECT DISTINCT a.name AS name_a, b.name AS name_b
        FROM tok a JOIN tok b ON a.tok = b.tok AND a.name < b.name
    )
    SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= {int(max_dist)}
    """


def group_memberships(
    df: DataFrame, group_col: str, actor_col: str
) -> DataFrame:
    """The census's shared input: one row per non-NULL group with its
    sorted distinct non-NULL actor array — columns (g, items).

    This is the expensive half of :func:`co_occurrence_pairs` (the
    group-keyed collect_set aggregate over the fact table). Composites
    that run several census consumers over the SAME bipartite table
    (degree histogram + triangles + association rules — the graph
    family) should build this ONCE, persist it, and hand it to each
    consumer via the ``memberships`` parameter, instead of paying the
    fact-table aggregate per consumer (r10 verdict #6)."""
    return (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.sort_array(F.collect_set(actor_col)).alias("items"))
    )


def co_occurrence_pairs(
    df: DataFrame,
    group_col: str,
    actor_col: str,
    max_group_degree: int | None = None,
    min_shared: int = 1,
    memberships: DataFrame | None = None,
) -> DataFrame:
    """Actor co-occurrence counts from a bipartite (group, actor) table
    — the recommender / collaboration-graph primitive ("users active in
    the same hour", "authors on the same document"): one row per
    unordered actor pair with the number of groups they share.

    Plan shape (the set-similarity-join formulation, same family as the
    n-gram Jaccard dedup): distinct per-group actor sets, each
    unordered ``a1 < a2`` pair emitted once, then one combinable count
    — candidates scale with sum_g degree(g)^2, never |actors|^2.

    The quadratic-per-group term IS the skew risk: ``max_group_degree``
    (the documented coverage trade, default off so the oracle replay
    stays exact) drops groups larger than the cap BEFORE pairing,
    the standard frequent-item prune of the co-occurrence literature.

    r10 plan upgrade (shared with graph.copurchase_edges, which
    delegates here): ONE group-keyed aggregate collects each group's
    distinct actor set, the pair set is generated in-row with
    whole-stage-codegen HOFs (indexed transform × slice), then one
    pair-keyed count — two Exchanges where the previous
    distinct×2 + self-join + count plan paid four. NULL handling
    matches the old join semantics exactly (and the SQL mirror's):
    NULL group keys are filtered (a join on g drops them; groupBy
    would silently keep them as one merged pseudo-group — the r9
    NULL-group trap in reverse), and NULL actors are dropped by
    collect_set, so the degree cap counts distinct NON-NULL actors
    (the SQL mirror filters them from its membership CTE to match).

    The compact per-group frame gets AQE-coalesced to ~1 partition,
    which would serialize the pair explosion — the explicit
    repartition spreads it; its exchange moves only the arrays.

    ``memberships``, when supplied, is a pre-built (ideally persisted)
    :func:`group_memberships` frame — the seam that lets a composite
    pay the fact-table aggregate once across several census consumers;
    ``df``/``group_col``/``actor_col`` are ignored for plan-building
    then (only the session is taken from ``df``).

    Returns (a1, a2, n_shared) with n_shared >= ``min_shared``."""
    spread = df.sparkSession.sparkContext.defaultParallelism
    per_group = (
        memberships
        if memberships is not None
        else group_memberships(df, group_col, actor_col)
    )
    if max_group_degree is not None:
        # degree == distinct actors per group == size(items)
        per_group = per_group.filter(
            F.size("items") <= max_group_degree
        )
    pair = F.explode(
        F.flatten(
            F.expr(
                "transform(items, (x, i) -> transform("
                "slice(items, i + 2, size(items)),"
                " y -> struct(x AS a1, y AS a2)))"
            )
        )
    ).alias("p")
    return (
        per_group.repartition(spread)
        .select(pair)
        .select("p.a1", "p.a2")
        .groupBy("a1", "a2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def sql_co_occurrence_pairs(
    table: str,
    group_expr: str,
    actor_col: str,
    max_group_degree: int | None = None,
    min_shared: int = 1,
    where: str = "1=1",
) -> str:
    """DuckDB replay of ``co_occurrence_pairs`` (same distinct
    memberships, same degree cap, same a1 < a2 canonicalization).
    NULL actors are filtered from the membership CTE so the degree
    cap counts distinct NON-NULL actors — exactly what the Spark
    plan's size(collect_set) sees (r10 second review pass: without
    the filter the two cap semantics diverged on NULL actors)."""
    cap = ""
    if max_group_degree is not None:
        cap = f"""
    , deg AS (SELECT g, count(*) AS d FROM m GROUP BY g)
    , mc AS (SELECT m.g, m.a FROM m JOIN deg USING (g)
             WHERE deg.d <= {max_group_degree})"""
    src = "mc" if max_group_degree is not None else "m"
    return f"""
    WITH m AS (
        SELECT DISTINCT {group_expr} AS g, {actor_col} AS a
        FROM {table}
        WHERE ({where}) AND {actor_col} IS NOT NULL
    ){cap}
    SELECT l.a AS a1, r.a AS a2, CAST(count(*) AS BIGINT) AS n_shared
    FROM {src} l JOIN {src} r ON l.g = r.g AND l.a < r.a
    GROUP BY l.a, r.a
    HAVING count(*) >= {min_shared}
    """


# ---------------------------------------------------------------------------
# r12: Fellegi-Sunter probabilistic match scoring over the blocked census
# ---------------------------------------------------------------------------

def fs_linkage_weights(
    df: DataFrame,
    id_col: str = "p_partkey",
    name_col: str = "p_name",
    fields: tuple = ("p_brand", "p_type", "p_size"),
    m_probs: tuple = (0.9, 0.9, 0.85),
    threshold: float = 0.0,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over a blocked
    candidate census: each candidate pair gets the classic
    log-likelihood match score

        score = Σ_k  agree_k · log₂(m_k / u_k)
               + (1 − agree_k) · log₂((1 − m_k) / (1 − u_k))

    where ``m_k`` (P(agree | match)) are supplied per field and ``u_k``
    (P(agree | non-match)) are ESTIMATED FROM THE DATA as the random-
    agreement probability Σ_v (n_v/N)² over field ``k``'s value
    frequencies — the frequency-based u of the FS literature, computed
    as one dimension-sized aggregate per field and broadcast as a 1-row
    frame.  This is the principled scoring layer ABOVE the
    edit-distance census (``fuzzy_name_pairs``): agreement on a rare
    brand is worth more bits than agreement on a ubiquitous one.

    Blocking (part of the operator's DEFINITION, replayed by the
    oracle): candidates share the FIRST TWO whitespace tokens of
    ``name_col`` — one token alone has an 8-value vocabulary on this
    corpus, which put 25M pairs through the scorer at sf0.1 (measured
    14.6 s); the bigram key fans the census out to vocab² blocks while
    keeping true near-matches together.  A production deployment swaps
    in the least-frequent token or a phonetic key, same plan shape.
    Census discipline as everywhere: an equi-join on the block key over
    the distinct record table, work ∝ Σ block², never N².

    NULL fields disagree (CASE a=b semantics on both engines).
    Returns (id_a, id_b, agree flags per field, score ≥ ``threshold``),
    6dp, id_a < id_b."""
    if len(fields) != len(m_probs):
        raise ValueError("fields and m_probs must align")
    recs = df.select(
        F.col(id_col).alias("_id"),
        F.array_join(
            F.slice(F.split(F.col(name_col), " "), 1, 2), " "
        ).alias("_blk"),
        *[F.col(c) for c in fields],
    ).filter(F.col("_blk").isNotNull())
    n_tot = F.count(F.lit(1))
    u_aggs = []
    for k in fields:
        per_v = recs.groupBy(k).agg(F.count(F.lit(1)).alias("_c"))
        u_aggs.append(
            per_v.agg(
                (
                    F.sum(F.col("_c").cast("double") * F.col("_c"))
                    / (F.sum("_c") * F.sum("_c")).cast("double")
                ).alias(f"_u_{k}")
            )
        )
    u_row = u_aggs[0]
    for other in u_aggs[1:]:
        u_row = u_row.crossJoin(other)
    from asctb_ct_label_mapper_spark.plans.partitioning import (
        ensure_min_partitions,
    )

    # The block self-join fans each probe-side row out to its whole block
    # (Σ block² pairs through the codegen scorer); a sub-split dimension
    # file scans as ONE partition, serializing that fan-out onto 1 core
    # (guide §2.5). Widen ONLY the pair sides — the three u-probability
    # legs are plain combinable aggregates, exactly the shape the round's
    # widening A/Bs showed a round-robin shuffle does not pay for.
    # No-op at real-table scale.
    recs_w = ensure_min_partitions(recs)
    a = recs_w.select(
        F.col("_blk"),
        F.col("_id").alias("id_a"),
        *[F.col(c).alias(f"_a_{c}") for c in fields],
    )
    b = recs_w.select(
        F.col("_blk"),
        F.col("_id").alias("id_b"),
        *[F.col(c).alias(f"_b_{c}") for c in fields],
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.crossJoin(F.broadcast(u_row))
    score = F.lit(0.0)
    out_cols = []
    for k, m in zip(fields, m_probs):
        agree = F.when(
            F.col(f"_a_{k}") == F.col(f"_b_{k}"), F.lit(1)
        ).otherwise(F.lit(0))
        u = F.col(f"_u_{k}")
        mf = F.lit(float(m))
        score = score + F.when(
            agree == 1, F.log2(mf / u)
        ).otherwise(F.log2((F.lit(1.0) - mf) / (F.lit(1.0) - u)))
        out_cols.append(agree.alias(f"agree_{k}"))
    return (
        scored.select(
            "id_a",
            "id_b",
            *out_cols,
            F.round(score, 6).alias("score"),
        )
        .filter(F.col("score") >= float(threshold))
    )


def sql_fs_linkage_weights(
    table: str = "part",
    id_col: str = "p_partkey",
    name_col: str = "p_name",
    fields: tuple = ("p_brand", "p_type", "p_size"),
    m_probs: tuple = (0.9, 0.9, 0.85),
    threshold: float = 0.0,
) -> str:
    """DuckDB replay of ``fs_linkage_weights`` (same first-two-token
    blocking, same frequency-based u estimation, same log₂ weight
    arithmetic and NULL-disagrees semantics)."""
    u_ctes = ",\n    ".join(
        f"""u_{k} AS (
        SELECT sum(CAST(c AS DOUBLE) * c) / CAST(sum(c) * sum(c) AS DOUBLE)
            AS u
        FROM (SELECT {k}, count(*) AS c FROM recs GROUP BY 1)
    )"""
        for k in fields
    )
    agree_exprs = ", ".join(
        f"CASE WHEN a._a_{k} = b._b_{k} THEN 1 ELSE 0 END AS agree_{k}"
        for k in fields
    )
    score_terms = " + ".join(
        f"""CASE WHEN agree_{k} = 1
             THEN log2({float(m)!r} / (SELECT u FROM u_{k}))
             ELSE log2({1.0 - float(m)!r} / (1.0 - (SELECT u FROM u_{k})))
           END"""
        for k, m in zip(fields, m_probs)
    )
    a_cols = ", ".join(f"{k} AS _a_{k}" for k in fields)
    b_cols = ", ".join(f"{k} AS _b_{k}" for k in fields)
    agree_out = ", ".join(f"agree_{k}" for k in fields)
    return f"""
    WITH recs AS (
        SELECT {id_col} AS _id,
            array_to_string(string_split({name_col}, ' ')[1:2], ' ')
                AS _blk,
            {", ".join(fields)}
        FROM {table}
        WHERE array_to_string(string_split({name_col}, ' ')[1:2], ' ')
            IS NOT NULL
    ),
    {u_ctes},
    pairs AS (
        SELECT a._id AS id_a, b._id AS id_b, {agree_exprs}
        FROM (SELECT _id, _blk, {a_cols} FROM recs) a
        JOIN (SELECT _id, _blk, {b_cols} FROM recs) b
            ON a._blk = b._blk AND a._id < b._id
    )
    SELECT id_a, id_b, {agree_out},
        round({score_terms}, 6) AS score
    FROM pairs
    WHERE round({score_terms}, 6) >= {float(threshold)!r}
    """
