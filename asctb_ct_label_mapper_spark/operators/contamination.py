"""Cross-corpus contamination detection: n-gram overlap of an eval corpus
against a training corpus (the standard benchmark-leakage check run before
any model training at scale).

Not in the reference (it never trains) — engine-brief territory, same tier
as dedup.py / curation.py. The operator is corpus-vs-corpus where dedup is
doc-vs-doc: instead of pair formation, it asks "what fraction of THIS eval
document's n-grams appear ANYWHERE in train?".

Scale design (100 TB):
- The train side collapses to its distinct shingle VOCABULARY first — a
  map-side-combinable aggregation whose shuffle volume is per-partition
  vocabulary, not the token stream.
- The overlap probe is ONE hash-shuffle equi-join (eval shingles x train
  vocabulary) followed by a per-doc count aggregation: work is
  proportional to shingle occurrences, never |eval| x |train|.
- ``hash_join_key=True`` joins on ``xxhash64(shingle)`` instead of the raw
  string: same join cardinality (modulo 2^-64 collisions), but the shuffle
  rows shrink from arbitrary-length strings to 8 bytes — the right setting
  at full scale. Default False keeps raw strings so DuckDB can replay the
  join byte-identically for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.dedup import word_shingles_expr


def ngram_contamination(
    eval_df: DataFrame,
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    hash_join_key: bool = False,
) -> DataFrame:
    """Per eval document: distinct word ``n``-grams, how many of them occur
    in the train corpus, the contamination rate, and a threshold flag.

    Documents with fewer than ``n`` tokens have zero shingles and rate 0.0
    (kept in the output — absence would silently pass a short leaked doc).
    Returns (id_col, n_shingles, n_hit, contamination_rate,
    is_contaminated).
    """
    sh = word_shingles_expr(F.col(text_col), n)
    # explode_outer: zero-shingle docs survive as one null-gram row
    ev = eval_df.select(F.col(id_col), F.explode_outer(sh).alias("gram"))
    vocab = train_df.select(F.explode(sh).alias("gram")).distinct()
    if hash_join_key:
        ev = ev.withColumn("gk", F.xxhash64("gram"))
        vocab = vocab.select(F.xxhash64("gram").alias("gk")).distinct()
        joined = ev.join(vocab.withColumn("_hit", F.lit(1)), "gk", "left")
    else:
        joined = ev.join(vocab.withColumn("_hit", F.lit(1)), "gram", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("gram").alias("n_shingles"),
        F.count("_hit").alias("n_hit"),
    )
    rate = F.round(
        F.when(
            F.col("n_shingles") > 0,
            F.col("n_hit").cast("double") / F.col("n_shingles"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return agg.select(
        F.col(id_col),
        "n_shingles",
        "n_hit",
        rate.alias("contamination_rate"),
        (rate >= threshold).alias("is_contaminated"),
    )


def sql_ngram_contamination(
    assigned_table_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    train_split: str = "train",
    eval_split: str = "test",
) -> str:
    """DuckDB replay of ``ngram_contamination`` over a table expression that
    already carries a ``split`` column (e.g. the ``sql_hash_split`` body).
    Shingle comprehension mirrors word_shingles_expr: single-space split
    (empties kept), inclusive list slice of ``n`` tokens, list_distinct.
    """
    w = n - 1  # DuckDB slice is inclusive: toks[i:i+w] has n elements
    return f"""
    WITH assigned AS ({assigned_table_sql}),
    sh AS (
        SELECT {id_col}, split,
            list_distinct([array_to_string(toks[i:i+{w}], ' ')
                           for i in range(1, greatest(len(toks) - {w}, 0) + 1)]) AS shingles
        FROM (SELECT {id_col}, split, string_split({text_col}, ' ') AS toks FROM assigned)
    ),
    vocab AS (SELECT DISTINCT unnest(shingles) AS gram FROM sh WHERE split = '{train_split}'),
    ev AS (SELECT {id_col}, unnest(shingles) AS gram FROM sh WHERE split = '{eval_split}'),
    hits AS (
        SELECT e.{id_col}, count(*) AS n_sh, count(v.gram) AS n_hit
        FROM ev e LEFT JOIN vocab v ON v.gram = e.gram
        GROUP BY e.{id_col}
    )
    SELECT b.{id_col},
        coalesce(h.n_sh, 0) AS n_shingles,
        coalesce(h.n_hit, 0) AS n_hit,
        round(CASE WHEN coalesce(h.n_sh, 0) > 0
              THEN CAST(h.n_hit AS DOUBLE) / h.n_sh ELSE 0.0 END, 6)
            AS contamination_rate,
        (round(CASE WHEN coalesce(h.n_sh, 0) > 0
               THEN CAST(h.n_hit AS DOUBLE) / h.n_sh ELSE 0.0 END, 6)
         >= {threshold}) AS is_contaminated
    FROM (SELECT {id_col} FROM sh WHERE split = '{eval_split}') b
    LEFT JOIN hits h USING ({id_col})
    """
