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

# Same workload bench.py times, restricted to names with oracles, so the
# published Spark-vs-DuckDB totals compare like for like (ADVICE r5).
# Queries whose oracle is structurally non-comparable as a baseline are
# excluded with a reason:
# name -> reason; surfaced verbatim in the emitted JSON (r13 verdict
# #7) so the published head-to-head ratios are self-describing instead
# of the reasons living only in this comment block.
_EXCLUDED = {
    # reported as a head-to-head in SCALING.md, not folded into a total
    # it would swamp
    "pipeline_curate": (
        "recursive-CTE connected components: >580 s timeout at sf0.1 "
        "(measured r5); Spark side ~3 s"
    ),
    "dedup_representatives": (
        "same recursive-CTE connected-components core (>8 min at "
        "sf0.1, measured r6); Spark side ~1-2 s"
    ),
    "dedup_embedding_groups": (
        "same recursive-CTE connected-components core (>8 min at "
        "sf0.1, measured r6); Spark side ~1-2 s"
    ),
    "split_leakage_safe": (
        "groups via the same recursive CTE (split over components)"
    ),
    "dedup_minhash_quality": (
        "truth side is a corpus-wide doc_id< self-join with list ops — "
        "O(n^2) ~1.25B pairs in DuckDB at sf0.1; Spark's set-similarity "
        "join is collision-proportional (3 s)"
    ),
}


def default_queries() -> list[str]:
    from bench import BENCH_QUERIES  # noqa: E402 - repo root on sys.path

    oracles = all_oracles()
    return [q for q in BENCH_QUERIES if q in oracles and q not in _EXCLUDED]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or default_queries()
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
                # the published ratio is over the COMMON set; these are
                # the oracles it deliberately omits, and why
                "excluded": _EXCLUDED,
            }
        )
    )


if __name__ == "__main__":
    main()
