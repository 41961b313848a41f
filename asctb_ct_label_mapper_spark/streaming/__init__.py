from asctb_ct_label_mapper_spark.streaming.curate import (
    start_curation_stream,
)
from asctb_ct_label_mapper_spark.streaming.dedup import (
    start_incremental_dedup_stream,
)
from asctb_ct_label_mapper_spark.streaming.events import (
    dedup_events,
    sessionize,
    sliding_user_activity,
    stateful_user_totals,
    stream_static_topk,
    tumbling_counts,
)

__all__ = [
    "dedup_events",
    "start_curation_stream",
    "start_incremental_dedup_stream",
    "sessionize",
    "stateful_user_totals",
    "sliding_user_activity",
    "stream_static_topk",
    "tumbling_counts",
]
