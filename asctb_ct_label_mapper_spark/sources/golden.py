"""Loader for the reference's shipped golden artifact: the precomputed
ASCT+B embedding table (`asctb_reference_embeddings/ASCTB_Lungv1_2.csv`,
83 rows x 768-d vectors — the only correctness artifact the reference repo
publishes, SURVEY §5).

The CSV is exactly the lossy round-trip the reference works around with
pickle (main.py:12,29-30): the ndarray column is a multi-line numpy repr
inside a quoted field, and the file carries a utf-8-sig BOM. The engine
parses it once into a proper ``array<float>`` column — after which Parquet
(S7) makes the pickle unnecessary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_golden_reference(spark: SparkSession, csv_path: str) -> DataFrame:
    """Parse the golden CSV into the engine's reference schema:
    (CT_ID, CT_NAME, CT_LABEL, definition, all_text, embedding)."""
    raw = (
        spark.read.option("header", True)
        .option("multiLine", True)  # numpy repr wraps across lines
        .option("quote", '"')
        .option("escape", '"')
        .csv(csv_path)
    )
    # utf-8-sig BOM may glue onto the first header
    first = raw.columns[0]
    if first != "CT_ID":
        raw = raw.withColumnRenamed(first, "CT_ID")
    vec_text = F.regexp_replace(F.col("embedding_results"), r"[\[\]\n]", " ")
    embedding = F.transform(
        F.filter(F.split(F.trim(vec_text), r"\s+"), lambda s: s != ""),
        lambda s: s.cast("float"),
    )
    return raw.select(
        "CT_ID",
        "CT_NAME",
        "CT_LABEL",
        "definition",
        "all_text",
        embedding.alias("embedding"),
    )
