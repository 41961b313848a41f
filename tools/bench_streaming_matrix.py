"""State-partition x state-store-provider matrix for the stream-stream
interval-join tiers (r13 verdict #2 + #6).

The 8-partition pin in bench.py was tuned when batches cost 0.87 s; the
r13 driver measured ~3.6 s/batch on identical code, so the tradeoff
needs re-measuring as a matrix, and the RocksDB provider needs an A/B
against the default HDFS-backed store to tell store-commit sensitivity
from compute.

Usage:
    python tools/bench_streaming_matrix.py [sf_dir] \
        [--parts 4,8,16,32] [--providers hdfs,rocksdb] [--loops inner,outer] \
        [--rate 1]

``--rate N`` (r15 verdict #7) replays the matrix at N x the arrival rate:
the events table is replaced by its ``ensure_events_scale`` N x copy
(same timestamp span, N x rows per micro-batch), so the sweep measures
where the local 4-partition default stops being right as state per batch
grows — the crossover that turns SPARK_GRAFT_STATE_PARTITIONS guidance
from asserted into measured.

Each cell runs in its OWN SparkSession (provider is a session conf read
at query start).  Prints one JSON line per cell with mean_batch_sec and
the per-batch state commit/update latency series, then a summary table
to stderr.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    parts = [int(p) for p in opts.get("parts", "4,8,16,32").split(",")]
    providers = opts.get("providers", "hdfs,rocksdb").split(",")
    loops = opts.get("loops", "inner,outer").split(",")
    rate = int(opts.get("rate", "1"))
    if rate != 1:
        sf_dir = bench.ensure_events_scale(sf_dir, rate)

    fns = {
        "inner": bench.bench_streaming_join,
        "outer": bench.bench_streaming_outer_join,
    }
    rows = []
    for provider in providers:
        for loop in loops:
            for n_parts in parts:
                spark = get_spark(f"ssmatrix-{provider}-{loop}-{n_parts}")
                if provider == "rocksdb":
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass",
                        ROCKSDB,
                    )
                try:
                    tier = fns[loop](
                        spark, sf_dir, state_partitions=n_parts
                    )
                    cell = {
                        "provider": provider,
                        "loop": loop,
                        "state_partitions": n_parts,
                        "rate_factor": rate,
                        "rows_in": tier.get("rows_in"),
                        "mean_batch_sec": tier["mean_batch_sec"],
                        "total_wall": tier["total_wall"],
                        "matches_batch": tier["matches_batch"],
                        "per_batch_sec": tier["per_batch_sec"],
                        "state_commit_ms_per_batch": tier.get(
                            "state_commit_ms_per_batch"
                        ),
                        "state_update_ms_per_batch": tier.get(
                            "state_update_ms_per_batch"
                        ),
                        "disk_fsync_ms": bench._disk_fsync_ms(),  # noqa: SLF001
                    }
                except Exception as e:  # noqa: BLE001
                    cell = {
                        "provider": provider,
                        "loop": loop,
                        "state_partitions": n_parts,
                        "error": str(e)[:300],
                    }
                finally:
                    spark.stop()
                rows.append(cell)
                print(json.dumps(cell), flush=True)
    print("\nprovider loop parts mean_batch matches", file=sys.stderr)
    for c in rows:
        print(
            f"{c['provider']:8s} {c['loop']:6s} {c['state_partitions']:5d} "
            f"{c.get('mean_batch_sec', 'ERR')!s:10s} "
            f"{c.get('matches_batch')}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
