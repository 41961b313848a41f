from asctb_ct_label_mapper_spark.functions.nlp import (
    STOPWORDS,
    clean_text_expr,
    clean_text_full_udf,
    clean_word_expr,
    embedding_text_expr,
    sql_clean_text,
    sql_not_stopword,
)
from asctb_ct_label_mapper_spark.functions.vector import (
    cosine_expr,
    dot_expr,
    norm_expr,
    sentence_encoder_udf,
    sql_cosine,
    stub_encode_udf,
)

__all__ = [
    "STOPWORDS",
    "clean_text_expr",
    "clean_text_full_udf",
    "clean_word_expr",
    "embedding_text_expr",
    "sql_clean_text",
    "sql_not_stopword",
    "cosine_expr",
    "dot_expr",
    "norm_expr",
    "sentence_encoder_udf",
    "sql_cosine",
    "stub_encode_udf",
]
