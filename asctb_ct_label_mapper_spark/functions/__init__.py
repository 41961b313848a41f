from asctb_ct_label_mapper_spark.functions.nlp import (
    clean_text_expr,
    clean_text_full_udf,
    embedding_text_udf,
    STOPWORDS,
)
from asctb_ct_label_mapper_spark.functions.vector import (
    cosine_expr,
    dot_expr,
    norm_expr,
    stub_encode_udf,
)

__all__ = [
    "clean_text_expr",
    "clean_text_full_udf",
    "embedding_text_udf",
    "STOPWORDS",
    "cosine_expr",
    "dot_expr",
    "norm_expr",
    "stub_encode_udf",
]
