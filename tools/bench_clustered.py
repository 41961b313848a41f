"""Price the range-clustered layout's read win (VERDICT r7 #6): the same
selective two-week shipdate scan over (a) the plain rel10x lineitem and
(b) the range-clustered copy, plus the parquet-footer audit showing WHY —
how many row groups the pushed predicate can prune in each layout.

Usage: python tools/bench_clustered.py [sf_dir] [factor]
Prints one JSON line with wall times and row-group pruning counts.
"""

from __future__ import annotations

import datetime
import json
import sys
import time

sys.path.insert(0, ".")

from asctb_ct_label_mapper_spark.queries import all_queries  # noqa: E402
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402


def overlap_counts(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(row groups whose [min,max] intersects [lo,hi), total row groups)
    straight from the parquet footers — the planner-visible ground truth
    for data skipping."""
    from asctb_ct_label_mapper_spark.sources.sinks import rowgroup_stats

    stats = rowgroup_stats(path, column)
    total = len(stats)

    def naive(ts):
        return ts.replace(tzinfo=None) if getattr(ts, "tzinfo", None) else ts

    hit = sum(
        1
        for (_f, _rg, mn, mx) in stats
        if naive(mx) >= lo and naive(mn) < hi
    )
    return hit, total


def scan_metrics(sdf) -> dict:
    """Execute ``sdf`` and pull the FileScan node's SQL metrics out of
    the final (AQE) physical plan — numOutputRows here is rows the scan
    actually DECODED after row-group pruning, the ground-truth 'read
    win' number that wall-clock hides under the per-query JVM floor."""
    sdf.collect()
    plan = sdf._jdf.queryExecution().executedPlan()
    try:
        plan = plan.finalPhysicalPlan()
    except Exception:  # noqa: BLE001 - non-AQE plan
        pass
    found: dict = {}

    def walk(node):
        if node.nodeName().startswith("Scan"):
            m = node.metrics()
            keys = m.keys().toList()
            for j in range(keys.size()):
                k = keys.apply(j)
                if k in ("numOutputRows", "numFiles", "filesSize"):
                    found[k] = m.apply(k).value()
            return
        try:
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))
        except Exception:  # noqa: BLE001
            pass
        try:
            walk(node.plan())  # QueryStageExec wrapper
        except Exception:  # noqa: BLE001
            pass

    walk(plan)
    return found


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from bench import ensure_relational_scale

    rel_dir = ensure_relational_scale(sf_dir, factor)
    spark = get_spark("bench-clustered")
    from asctb_ct_label_mapper_spark.sources.bucketing import (
        ensure_clustered_copy,
    )

    cl_path = ensure_clustered_copy(spark, rel_dir)
    registry = all_queries()
    out: dict = {"rel_dir": rel_dir}
    for name in ("scan_shipdate_range", "scan_shipdate_range_clustered"):
        fn = registry[name]
        spark.catalog.clearCache()
        fn(spark, rel_dir).count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, rel_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        m = scan_metrics(fn(spark, rel_dir))
        out[name + "_scan"] = {
            "rows_decoded": m.get("numOutputRows"),
            "files": m.get("numFiles"),
        }
    lo = datetime.datetime(1998, 3, 1)
    hi = datetime.datetime(1998, 3, 15)
    hit_p, tot_p = overlap_counts(
        rel_dir + "/lineitem.parquet", "l_shipdate", lo, hi
    )
    hit_c, tot_c = overlap_counts(cl_path, "l_shipdate", lo, hi)
    out["rowgroups_plain"] = {"overlapping": hit_p, "total": tot_p}
    out["rowgroups_clustered"] = {"overlapping": hit_c, "total": tot_c}
    out["speedup"] = round(
        out["scan_shipdate_range"] / out["scan_shipdate_range_clustered"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
