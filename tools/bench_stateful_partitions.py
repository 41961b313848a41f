"""One-off A/B: state-store partition count for the NON-stream-stream
stateful tiers (watermark dedup, session windows, enriched tumbling) —
extending the r14 {4..32}-partition stream-stream matrix
(plans/r14/streaming_matrix_r14.jsonl) to the other three tiers that
run state stores but inherited the session default (32 at local[32]).

Each cell runs in its OWN fresh session (bench methodology), with
spark.sql.shuffle.partitions pinned to the cell value before the tier
function builds its streaming query. Emits one JSON line per cell.

Usage: python tools/bench_stateful_partitions.py <sf_dir> [tier ...]
       tiers default to: watermark session enrich
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = {
    "watermark": "bench_streaming_watermark",
    "session": "bench_streaming_session",
    "enrich": "bench_streaming_enrich",
}


def main() -> None:
    sf_dir = sys.argv[1]
    tiers = sys.argv[2:] or ["watermark", "session", "enrich"]
    parts = [int(p) for p in os.environ.get(
        "AB_PARTITIONS", "32,4"
    ).split(",")]
    import bench as bench_mod
    from asctb_ct_label_mapper_spark.session import get_spark

    for tier in tiers:
        fn = getattr(bench_mod, TIERS[tier])
        for n_parts in parts:
            spark = get_spark(f"ab-{tier}-{n_parts}")
            spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
            try:
                out = fn(spark, sf_dir)
                row = {
                    "tier": tier,
                    "partitions": n_parts,
                    "mean_batch_sec": out.get("mean_batch_sec"),
                    "total_wall": out.get("total_wall"),
                    "matches_batch": out.get("matches_batch"),
                    "state_commit_ms_per_batch": out.get(
                        "state_commit_ms_per_batch"
                    ),
                    "state_rows_last": (
                        (out.get("state_rows_per_batch") or [None])[-1]
                    ),
                }
            except Exception as e:  # noqa: BLE001 - record, keep sweeping
                row = {"tier": tier, "partitions": n_parts,
                       "error": str(e)[:200]}
            finally:
                spark.stop()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
