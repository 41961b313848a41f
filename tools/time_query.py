"""Isolated per-query timing: fresh session, warm-up pass, then N timed
passes (bench methodology: .count() action, min + all runs reported).

Usage:
    python tools/time_query.py <data_dir> <query> [query ...] [--runs=3]

data_dir may be a testdata sf dir or a /tmp scale-tier dir.
Prints one JSON line per query: {"query": ..., "runs": [...], "min": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asctb_ct_label_mapper_spark.queries import all_queries  # noqa: E402
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    data_dir = args[0]
    names = args[1:]
    n_runs = int(opts.get("runs", "3"))
    spark = get_spark("time-query")
    registry = all_queries()
    # fresh-JVM warm-up, same as bench.py
    warm = "lineitem" if os.path.exists(
        os.path.join(data_dir, "lineitem.parquet")
    ) else ("documents" if os.path.exists(
        os.path.join(data_dir, "documents.parquet")
    ) else "events")
    spark.read.parquet(
        os.path.join(data_dir, f"{warm}.parquet")
    ).count()
    for name in names:
        fn = registry[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name}: warm-up")
        fn(spark, data_dir).count()
        runs = []
        for i in range(n_runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            t0 = time.perf_counter()
            fn(spark, data_dir).count()
            runs.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps({"query": name, "runs": runs, "min": min(runs)}),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
