"""PySpark-native analytics engine with the query/data-processing
capabilities of ``hubmapconsortium/asctb-ct-label-mapper``.

The reference (/root/reference, 653 LoC of eager pandas/numpy/sklearn) maps
free-text cell-type labels onto the ASCT+B vocabulary via sentence embeddings
and cosine similarity.  This package re-expresses every operator the reference
implements (SURVEY.md §2) as lazy, Catalyst-optimized DataFrame plans, and
adds the large-scale training-data-pipeline operators (dedup, similarity
search, multimodal plumbing, text analysis) the reference never needed.

Design rules (see SURVEY.md §4):
- DataFrame/SQL first; UDFs only where built-ins can't express the semantics
  (encoder, lemmatizer, contractions) and then always Arrow-vectorized.
- Broadcast the small (reference) side of every join; never collect-loop.
- Explicit schemas everywhere; Parquet as the native format.
"""

from asctb_ct_label_mapper_spark.pipeline import (
    build_reference_embeddings,
    map_raw_labels,
)
from asctb_ct_label_mapper_spark.session import get_spark

__version__ = "0.2.0"

__all__ = [
    "build_reference_embeddings",
    "get_spark",
    "map_raw_labels",
    "__version__",
]
