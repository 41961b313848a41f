"""Time the registry's own DuckDB oracles over the same parquet — the
single-node baseline the engine is graded against (BASELINE.md publishes no
reference numbers, so the oracle SQL *is* the baseline workload).

Usage: python tools/bench_oracle.py [sf_dir] [query ...]
Prints one JSON line: {"sf_dir": ..., "queries": {name: sec}, "total": sec}.

Methodology mirrors bench.py: one warm-up materialization, then min of two
timed passes (DuckDB result fully fetched, so both engines pay
materialization).
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

from asctb_ct_label_mapper_spark.queries import all_oracles  # noqa: E402
from asctb_ct_label_mapper_spark.schemas import TESTDATA_TABLES  # noqa: E402

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_revenue_topn",
    "q5_region_revenue",
    "a1_topk_window",
    "dt_events_hourly",
    "e_sessionize",
    "nlp_clean_docs",
    "cos_topk_join",
    "j1_exact_overwrite",
    "sheet_unpivot",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "pipeline_curate",
    "text_stats_docs",
    "lang_id_docs",
    "fingerprint_docs",
    "token_topn_docs",
    "contamination_check",
    "repetition_docs",
    "tokenize_bpe_docs",
    "quantize_embed_stats",
    "cos_topk_quantized",
    "tfidf_topk_docs",
    "unigram_logppl_docs",
    "pack_sequences_docs",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    oracles = all_oracles()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings: dict[str, float] = {}
    for name in names:
        if name not in oracles:
            continue
        sql = oracles[name]
        con.sql(sql).fetchall()  # warm-up (buffer cache, casts)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"[oracle] {name}: {timings[name]}s", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "queries": timings,
                "total": round(sum(timings.values()), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
