"""Corpus snapshot diff — the ingest-QA primitive for a continuously
rebuilt training corpus: given two snapshots of the same logical table,
classify every document as added / removed / changed (content hash moved)
so a pipeline can alert on unexpected churn, build incremental downstream
work-lists, and audit reproducibility between corpus releases.

Scale shape: ONE full outer equi-join on the document id (both sides
hash-partition once; co-partitioned/bucketed snapshots elide even that),
comparing fixed-width md5 content hashes instead of the text itself —
the join carries (id, 32-byte hash), not documents. Unchanged rows are
dropped BEFORE the exchange-side projection widens, so the output is
churn-sized, not corpus-sized. At 100 TB this is the canonical
reconciliation MapReduce; the alternative full-text comparison would
move the corpus twice.

No counterpart in the reference (strictly single-snapshot, eager pandas);
net-new pipeline surface in the spirit of its cache freshness check
(asctb_ct_label_mapper/utils.py's pickle-cache presence test is the
closest analogue: "has the input changed since I built this?").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _content_hash(cols: Sequence[str]) -> F.Column:
    # \x1f separator + null sentinel: concat_ws drops nulls silently,
    # which would hash ("a", null) and ("a", "") identically
    return F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Per-document diff of two corpus snapshots:
    ``(id_col, status in {'added','removed','changed'})`` — unchanged
    documents are filtered out (they are the bulk; emitting them would
    make the result corpus-sized)."""
    o = old.select(
        F.col(id_col), _content_hash(content_cols).alias("_h_old")
    )
    n = new.select(
        F.col(id_col), _content_hash(content_cols).alias("_h_new")
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(id_col, "status")
    )


def sql_corpus_diff(
    old_sql: str,
    new_sql: str,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
) -> str:
    """DuckDB replay of ``corpus_diff`` over two snapshot subqueries
    (same md5-over-separated-concat content hash)."""
    cols = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in content_cols
    )
    h = f"md5(concat_ws(chr(31), {cols}))"
    return f"""
    WITH o AS (SELECT {id_col}, {h} AS h_old FROM ({old_sql})),
         n AS (SELECT {id_col}, {h} AS h_new FROM ({new_sql})),
         j AS (
            SELECT coalesce(o.{id_col}, n.{id_col}) AS {id_col},
                   o.h_old, n.h_new
            FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
         )
    SELECT {id_col},
           CASE WHEN h_old IS NULL THEN 'added'
                WHEN h_new IS NULL THEN 'removed'
                WHEN h_old <> h_new THEN 'changed' END AS status
    FROM j
    WHERE h_old IS NULL OR h_new IS NULL OR h_old <> h_new
    """
