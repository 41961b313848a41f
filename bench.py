"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice: a warm-up pass (JIT/codegen/broadcast) is NOT
what we report — the timed pass reflects steady-state plan execution, which
is what scales. Results are consumed against BASELINE.md (acceptance: within
2x of DuckDB wall-clock at sf0.1, BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from asctb_ct_label_mapper_spark.queries import all_queries  # noqa: E402
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402

# Headline set: the flagship pipeline, both exact similarity strategies, the
# shuffle-heavy relational queries, and the LLM-pipeline operators.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_revenue_topn",
    "q5_region_revenue",
    "a1_topk_window",
    "w_running_total",
    "dt_events_hourly",
    "e_sessionize",
    "f18_json_extract",
    "nlp_clean_docs",
    "nlp_embed_text",
    "cos_topk_join",
    "cos_topk_blocked",
    "cos_topk_lsh",
    "j1_exact_overwrite",
    "sheet_unpivot",
    "mapping_report",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "text_stats_docs",
    "lang_id_docs",
    "fingerprint_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("asctb-bench")
    registry = all_queries()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = registry[name]
        fn(spark, sf_dir).count()  # warm-up: JIT, codegen, file listing
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
