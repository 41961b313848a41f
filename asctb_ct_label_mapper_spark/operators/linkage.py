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
