"""Lexical retrieval: BM25 scoring + top-k over a tokenized corpus.

The reference's retrieval surface is embedding-cosine only
(ASCTB_CT_Label_Mapper/utilities/nlp_preprocessing.py:100 — encode then
cosine top-k); production training-data pipelines pair that with a lexical
(BM25) channel for decontamination lookups, eval-set retrieval, and hybrid
scoring. This module is the lexical channel, expressed Spark-first.

Plan shape (the 100 TB contract):

- **Per-doc term frequencies are computed column-wise on the token array**
  (``size(toks) - size(array_remove(toks, term))`` — native expressions,
  no lambda HOFs, which this repo has measured evaluating interpreted
  per-element) for the query's terms ONLY. No explode of the corpus into a
  (doc, token) stream, so the expensive posting-list shuffle that a
  general inverted index needs (textstats.inverted_index) never happens
  for a known query.
- **Corpus statistics (N, avgdl, per-term document frequencies) reduce to
  ONE row** via a single partial-aggregatable global agg, then re-attach by
  a 1-row broadcast cross join — the repo's standard scalar-threshold
  pattern (no driver collect in the plan).
- **Scoring is a fixed-order chained sum** over the literal term list, so
  IEEE summation order is identical in Spark and the DuckDB oracle (the
  float-determinism discipline the registry's conventions demand).
- **Top-k is a global TakeOrderedAndProject** on (rounded score DESC,
  doc_id ASC) — k rows to the driver, never a full sort materialized.

At 100 TB the per-doc tf pass is a pure map over the corpus (pipelined
with the parquet scan; only ``text`` + id are read), the stats agg is one
scalar row, and the top-k is per-partition heaps + a k-row merge: no
all-to-all shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def _require_terms(terms: list[str]) -> None:
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    for t in terms:
        if (not t) or (" " in t) or ("'" in t):
            raise ValueError(f"query term must be a single quote-free token: {t!r}")


def _per_doc_tf(
    docs: DataFrame, terms: list[str], id_col: str, text_col: str
) -> DataFrame:
    """Shared tokenization/tf contract for every lexical channel: split on
    single spaces (the corpus convention of textstats.token_topn), then
    per-term tf column-wise as ``size(toks) - size(array_remove(toks, t))``
    — native expressions, no lambda HOFs. One definition so BM25 and QL
    can never silently diverge (review finding)."""
    toks = F.split(F.col(text_col), " ")
    tf_cols = [
        (F.size(toks) - F.size(F.array_remove(toks, t))).alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    return docs.select(F.col(id_col), F.size(toks).alias("dl"), *tf_cols)


def _sql_tf_cte(table: str, terms: list[str], id_col: str, text_col: str) -> str:
    """DuckDB twin of ``_per_doc_tf`` (list_filter removal mirrors
    array_remove exactly)."""
    tf_exprs = ",\n            ".join(
        f"len(toks) - len(list_filter(toks, w -> w != '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    return f"""
        SELECT {id_col}, len(toks) AS dl,
            {tf_exprs}
        FROM (SELECT {id_col}, string_split({text_col}, ' ') AS toks FROM {table})
    """


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Score every document against the literal query ``terms`` with BM25
    (Robertson idf with the Lucene +1 floor: ``ln((N-df+0.5)/(df+0.5)+1)``)
    and return the global top ``k`` as (id, bm25) ordered by
    (bm25 DESC, id ASC). Documents matching no term are excluded.
    """
    _require_terms(terms)
    per_doc = _per_doc_tf(docs, terms, id_col, text_col)

    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = per_doc.crossJoin(F.broadcast(stats))
    contribs: Column | None = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        c = idf * (tf * (k1 + 1.0)) / denom
        contribs = c if contribs is None else contribs + c
    any_hit = sum(F.col(f"tf_{i}") for i in range(len(terms))) > 0
    return (
        scored.filter(any_hit)
        .select(F.col(id_col), F.round(contribs, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def sql_bm25_topk(
    table: str = "documents",
    terms: list[str] | None = None,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> str:
    """DuckDB replay of ``bm25_topk``: same tokenization, same fixed-order
    contribution sum, same (rounded score, id) total order."""
    terms = terms if terms is not None else ["spark", "join", "vector"]
    _require_terms(terms)
    n = len(terms)
    df_exprs = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(n)
    )
    contrib = " + ".join(
        f"(ln((stats.n_docs - stats.df_{i} + 0.5) / (stats.df_{i} + 0.5) + 1.0)"
        f" * (d.tf_{i} * {k1 + 1.0}) / (d.tf_{i} + {k1} *"
        f" ({1.0 - b} + {b} * d.dl / stats.avgdl)))"
        for i in range(n)
    )
    any_hit = " + ".join(f"d.tf_{i}" for i in range(n))
    return f"""
    WITH tf AS ({_sql_tf_cte(table, terms, id_col, text_col)}),
    stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_exprs} FROM tf
    )
    SELECT d.{id_col}, round({contrib}, 6) AS bm25
    FROM tf d, stats
    WHERE {any_hit} > 0
    ORDER BY round({contrib}, 6) DESC, d.{id_col}
    LIMIT {k}
    """


MU_DEFAULT = 300.0
RRF_K_DEFAULT = 60


def ql_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = MU_DEFAULT,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood scoring (Zhai & Lafferty):
    ``score = sum_t ln((tf + mu * cf_t/|C|) / (dl + mu))`` — the second
    classic lexical channel next to BM25, here restricted (like bm25_topk)
    to documents matching at least one term so the output is top-k sized.

    Same plan contract as bm25_topk: column-wise tf (no corpus explode,
    no lambda HOFs), ONE-row collection stats re-attached by broadcast
    cross join (collection frequencies cf_t and total token count), a
    fixed-order contribution sum, TakeOrderedAndProject top-k.

    A term absent from the whole corpus (cf=0) contributes 0 instead of
    ln(0): without the guard Spark's log(0) is NULL and poisons every
    score while the oracle's ln(0) hard-errors (review finding).
    """
    _require_terms(terms)
    per_doc = _per_doc_tf(docs, terms, id_col, text_col)
    stats = per_doc.agg(
        F.sum("dl").alias("total_toks"),
        *[F.sum(f"tf_{i}").alias(f"cf_{i}") for i in range(len(terms))],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    contribs: Column | None = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        c = F.when(
            F.col(f"cf_{i}") > 0,
            F.log(
                (tf + mu * F.col(f"cf_{i}") / F.col("total_toks"))
                / (F.col("dl") + mu)
            ),
        ).otherwise(F.lit(0.0))
        contribs = c if contribs is None else contribs + c
    any_hit = sum(F.col(f"tf_{i}") for i in range(len(terms))) > 0
    return (
        scored.filter(any_hit)
        .select(F.col(id_col), F.round(contribs, 6).alias("ql"))
        .orderBy(F.desc("ql"), F.col(id_col))
        .limit(k)
    )


def sql_ql_topk(
    table: str = "documents",
    terms: list[str] | None = None,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = MU_DEFAULT,
) -> str:
    """DuckDB replay of ``ql_topk`` (same fixed-order ln sum)."""
    terms = terms if terms is not None else ["spark", "join", "vector"]
    _require_terms(terms)
    n = len(terms)
    cf_exprs = ", ".join(f"sum(tf_{i}) AS cf_{i}" for i in range(n))
    contrib = " + ".join(
        f"(CASE WHEN s.cf_{i} > 0 THEN"
        f" ln((d.tf_{i} + {mu} * s.cf_{i} / s.total_toks) / (d.dl + {mu}))"
        f" ELSE 0.0 END)"
        for i in range(n)
    )
    any_hit = " + ".join(f"d.tf_{i}" for i in range(n))
    return f"""
    WITH tf AS ({_sql_tf_cte(table, terms, id_col, text_col)}),
    s AS (SELECT sum(dl) AS total_toks, {cf_exprs} FROM tf)
    SELECT d.{id_col}, round({contrib}, 6) AS ql
    FROM tf d, s
    WHERE {any_hit} > 0
    ORDER BY round({contrib}, 6) DESC, d.{id_col}
    LIMIT {k}
    """


def rrf_fuse(
    run_a: DataFrame,
    run_b: DataFrame,
    id_col: str = "doc_id",
    score_a: str = "bm25",
    score_b: str = "ql",
    k: int = 20,
    rrf_k: int = RRF_K_DEFAULT,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of two retrieval runs:
    ``rrf = sum_runs 1/(rrf_k + rank)`` with rank assigned within each run
    by (score DESC, id ASC) — rank-only fusion, so the two channels'
    incomparable score scales never mix. Documents in one run only get
    that run's term (the other contributes 0). Returns the fused top-k
    (id, rrf) by (rrf DESC, id ASC).

    Scale note: runs are already k-bounded (the expensive part happened in
    the channels), so both windows and the full-outer join are over k-row
    inputs — driver-trivial at any corpus size.
    """
    import pyspark.sql.window as _w

    wa = _w.Window.orderBy(F.desc(score_a), F.col(id_col))
    wb = _w.Window.orderBy(F.desc(score_b), F.col(id_col))
    ra = run_a.select(id_col, F.row_number().over(wa).alias("rank_a"))
    rb = run_b.select(id_col, F.row_number().over(wb).alias("rank_b"))
    fused = ra.join(rb, id_col, "full_outer").select(
        F.col(id_col),
        F.round(
            F.coalesce(1.0 / (rrf_k + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(1.0 / (rrf_k + F.col("rank_b")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.col(id_col)).limit(k)


def sql_rrf_hybrid(
    table: str = "documents",
    terms: list[str] | None = None,
    channel_k: int = 20,
    k: int = 20,
    id_col: str = "doc_id",
    rrf_k: int = RRF_K_DEFAULT,
) -> str:
    """DuckDB replay of the composed hybrid query: BM25 and QL channel
    CTEs (their own oracles verbatim), per-run row_number ranks with the
    same (score DESC, id ASC) tie-break, full-outer fusion."""
    bm25 = sql_bm25_topk(table, terms=terms, k=channel_k, id_col=id_col)
    ql = sql_ql_topk(table, terms=terms, k=channel_k, id_col=id_col)
    return f"""
    WITH bm25_run AS ({bm25}),
    ql_run AS ({ql}),
    ra AS (SELECT {id_col},
        row_number() OVER (ORDER BY bm25 DESC, {id_col}) AS rank_a
        FROM bm25_run),
    rb AS (SELECT {id_col},
        row_number() OVER (ORDER BY ql DESC, {id_col}) AS rank_b
        FROM ql_run)
    SELECT coalesce(ra.{id_col}, rb.{id_col}) AS {id_col},
        round(coalesce(1.0 / ({rrf_k} + ra.rank_a), 0.0)
            + coalesce(1.0 / ({rrf_k} + rb.rank_b), 0.0), 6) AS rrf
    FROM ra FULL OUTER JOIN rb ON ra.{id_col} = rb.{id_col}
    ORDER BY rrf DESC, coalesce(ra.{id_col}, rb.{id_col})
    LIMIT {k}
    """


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Offline ranking-quality evaluation — the gate a retrieval change
    ships through (BM25 tuning, hybrid fusion weights, an ANN recall
    knob): given a ``run`` of ranked results (query, doc, 1-based rank)
    and graded ``qrels`` (query, doc, rel >= 0), report per query

    - ``ndcg`` — DCG@k / IDCG@k with the exponential gain
      ``(2^rel - 1) / log2(rank + 1)``; 0 when the query has no
      relevant documents at all,
    - ``mrr`` — 1 / first rank holding rel > 0 (0 if none retrieved),
    - ``p_at_k`` / ``r_at_k`` — precision (over k) and recall (over
      the query's total relevant count) of rel > 0 docs in the top k,

    each rounded 6dp. Scale shape: one broadcast-or-shuffle equi-join
    run⟕qrels on (query, doc) — both sides are top-k- or label-grain,
    never corpus-grain — then per-query windows whose partitions are
    bounded by k (run side) and the per-query label count (ideal side).
    Nothing global; adding a million queries adds partitions, not
    partition size. Mirrors the TREC trec_eval contract so judges and
    runs from any engine can be replayed (reference has no evaluation
    harness; this extends its similarity-report surface, cf.
    reference main.py:96-118 mapping report).
    """
    q, d, rk, rl = query_col, doc_col, rank_col, rel_col
    run = run.select(q, d, rk).filter(F.col(rk) <= k)
    qrels = qrels.filter(F.col(rl).isNotNull())
    # per-query relevant universe (recall denominator + IDCG source)
    totals = qrels.filter(F.col(rl) > 0).groupBy(q).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    ideal_w = Window.partitionBy(q).orderBy(F.desc(rl), F.col(d))
    idcg = (
        qrels.filter(F.col(rl) > 0)
        .withColumn("_irank", F.row_number().over(ideal_w))
        .filter(F.col("_irank") <= k)
        .groupBy(q)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(rl)) - 1.0)
                / F.log2(F.col("_irank") + 1.0)
            ).alias("idcg")
        )
    )
    hits = run.join(qrels, [q, d], "left").select(
        q,
        F.col(rk).alias("_rank"),
        F.coalesce(F.col(rl), F.lit(0)).alias("_rel"),
    )
    per_q = hits.groupBy(q).agg(
        F.sum(
            (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
            / F.log2(F.col("_rank") + 1.0)
        ).alias("_dcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rank"))).alias("_first"),
        F.sum((F.col("_rel") > 0).cast("long")).alias("_n_hit"),
    )
    return (
        per_q.join(idcg, [q], "left")
        .join(totals, [q], "left")
        .select(
            F.col(q),
            F.round(
                F.when(
                    F.col("idcg").isNotNull(),
                    F.col("_dcg") / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
            F.round(
                F.coalesce(1.0 / F.col("_first"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(F.col("_n_hit") / F.lit(float(k)), 6).alias("p_at_k"),
            F.round(
                F.coalesce(
                    F.col("_n_hit") / F.col("n_rel").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("r_at_k"),
        )
    )


def sql_ranking_metrics(
    run_cte: str,
    qrels_cte: str,
    k: int = 10,
    query_col: str = "query",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> str:
    """DuckDB replay of ``ranking_metrics`` — same exponential gain, same
    (rel DESC, doc ASC) ideal tie-break, same zero-fills. ``run_cte`` /
    ``qrels_cte`` are SELECT bodies producing the two frames."""
    q, d, rk, rl = query_col, doc_col, rank_col, rel_col
    return f"""
    WITH run AS ({run_cte}),
    qrels AS (SELECT * FROM ({qrels_cte}) WHERE {rl} IS NOT NULL),
    totals AS (
        SELECT {q}, count(*) AS n_rel FROM qrels WHERE {rl} > 0 GROUP BY {q}
    ),
    idcg AS (
        SELECT {q}, sum((power(2.0, {rl}) - 1.0) / log2(_irank + 1.0)) AS idcg
        FROM (
            SELECT {q}, {rl}, row_number() OVER (
                PARTITION BY {q} ORDER BY {rl} DESC, {d}
            ) AS _irank
            FROM qrels WHERE {rl} > 0
        ) WHERE _irank <= {k} GROUP BY {q}
    ),
    per_q AS (
        SELECT r.{q},
            sum((power(2.0, coalesce(e.{rl}, 0)) - 1.0)
                / log2(r.{rk} + 1.0)) AS _dcg,
            min(CASE WHEN coalesce(e.{rl}, 0) > 0 THEN r.{rk} END) AS _first,
            sum(CASE WHEN coalesce(e.{rl}, 0) > 0 THEN 1 ELSE 0 END) AS _n_hit
        FROM run r LEFT JOIN qrels e
            ON r.{q} = e.{q} AND r.{d} = e.{d}
        WHERE r.{rk} <= {k}
        GROUP BY r.{q}
    )
    SELECT p.{q},
        round(CASE WHEN i.idcg IS NOT NULL THEN p._dcg / i.idcg
              ELSE 0.0 END, 6) AS ndcg,
        round(coalesce(1.0 / p._first, 0.0), 6) AS mrr,
        round(p._n_hit / CAST({k} AS DOUBLE), 6) AS p_at_k,
        round(coalesce(p._n_hit / CAST(t.n_rel AS DOUBLE), 0.0), 6)
            AS r_at_k
    FROM per_q p
    LEFT JOIN idcg i ON p.{q} = i.{q}
    LEFT JOIN totals t ON p.{q} = t.{q}
    """


def bm25_runs(
    docs: DataFrame,
    queries: dict,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """BM25 runs for MANY queries from ONE corpus tf pass — the batched
    evaluation path :func:`ranking_metrics` consumes. ``queries`` maps a
    query label to its term list; the union of all terms is computed
    column-wise in a single :func:`_per_doc_tf` scan (persisted), corpus
    stats (N, avgdl, every df) reduce to ONE broadcast row, and each
    query's top-k then reads the in-memory tf frame — q queries cost
    one corpus scan + q tiny TakeOrderedAndProject jobs instead of q
    full scans. Scoring is arithmetic-identical to :func:`bm25_topk`
    (same idf floor, same fixed per-query term order), so a run built
    here hash-matches one built by q separate calls.

    Returns (query, id_col, bm25, rank) with rank 1-based in
    (bm25 DESC, id ASC) order — ranking_metrics' run contract."""
    if not queries:
        raise ValueError("bm25_runs needs at least one query")
    for qlabel, terms in queries.items():
        _require_terms(list(terms))  # per query: an empty term list
        # would otherwise slip past a union-only check (r11 review)
    from asctb_ct_label_mapper_spark.plans.cache import pooled_persist

    all_terms = sorted({t for ts in queries.values() for t in ts})
    idx = {t: i for i, t in enumerate(all_terms)}
    per_doc = pooled_persist(_per_doc_tf(docs, all_terms, id_col, text_col))
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(all_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    runs = None
    for qlabel, terms in queries.items():
        contribs: Column | None = None
        for t in terms:  # the QUERY's term order (bm25_topk parity)
            i = idx[t]
            tf = F.col(f"tf_{i}").cast("double")
            idf = F.log(
                (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
                / (F.col(f"df_{i}") + 0.5)
                + 1.0
            )
            denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            c = idf * (tf * (k1 + 1.0)) / denom
            contribs = c if contribs is None else contribs + c
        any_hit = sum(F.col(f"tf_{idx[t]}") for t in terms) > 0
        topk = (
            scored.filter(any_hit)
            .select(
                F.lit(qlabel).alias("query"),
                F.col(id_col),
                F.round(contribs, 6).alias("bm25"),
            )
            .orderBy(F.desc("bm25"), F.col(id_col))
            .limit(k)
        )
        runs = topk if runs is None else runs.unionAll(topk)
    rank_w = Window.partitionBy("query").orderBy(
        F.desc("bm25"), F.col(id_col)
    )
    return runs.select(
        "query", id_col, "bm25", F.row_number().over(rank_w).alias("rank")
    )
