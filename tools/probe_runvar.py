"""Per-run variance attribution for the docs100x roulette (r15 verdict #2).

Runs one query N times in a fresh session and records, PER RUN: wall,
the box-wide /proc/stat delta split into user/system/idle/iowait/steal
ticks, and the JVM+worker-tree CPU delta.  A slow run whose extra wall
shows up as STEAL is hypervisor contention (measurement-day noise, not
code); extra USER beyond the baseline is genuine extra compute (JIT,
interpreted execution, Python churn); extra IDLE is a scheduling stall.

Usage:
    python tools/probe_runvar.py <data_dir> <query> [--runs=10]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asctb_ct_label_mapper_spark.queries import all_queries  # noqa: E402
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402


def stat_ticks() -> dict:
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return {
        "user": v[0] + v[1],
        "system": v[2] + v[5] + v[6],
        "idle": v[3],
        "iowait": v[4],
        "steal": v[7],
    }


def vmstat_counters() -> dict:
    out = {}
    for line in open("/proc/vmstat"):
        k, _, val = line.partition(" ")
        if k in ("pgfault", "pgmajfault", "thp_fault_alloc", "nr_tlb_remote_flush"):
            out[k] = int(val)
    return out


def worker_pids(root: int) -> set[int]:
    """PIDs of the JVM's live descendants (pyspark.daemon + workers)."""
    pids, todo = set(), [root]
    while todo:
        pid = todo.pop()
        try:
            for tid in os.listdir(f"/proc/{pid}/task"):
                try:
                    kids = [
                        int(c)
                        for c in open(
                            f"/proc/{pid}/task/{tid}/children"
                        ).read().split()
                    ]
                except OSError:
                    continue
                for k in kids:
                    if k not in pids:
                        pids.add(k)
                        todo.append(k)
        except OSError:
            continue
    return pids


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    data_dir, name = args[0], args[1]
    n_runs = int(opts.get("runs", "10"))
    hz = os.sysconf("SC_CLK_TCK") or 100

    import bench  # noqa: E402

    spark = get_spark("probe-runvar")
    registry = all_queries()
    fn = registry[name]
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory  # noqa: SLF001
    jvm_pid = int(mf.getRuntimeMXBean().getPid())

    def jvm_only_cpu_sec() -> float:
        with open(f"/proc/{jvm_pid}/stat") as fh:
            p = fh.read().rsplit(") ", 1)[1].split()
        return (int(p[11]) + int(p[12])) / hz

    spark.catalog.clearCache()
    fn(spark, data_dir).count()  # warm-up
    for i in range(n_runs):
        spark.catalog.clearCache()
        w0 = worker_pids(jvm_pid)
        s0, v0, c0 = stat_ticks(), vmstat_counters(), bench._jvm_counters(spark)
        j0 = jvm_only_cpu_sec()
        t0 = time.perf_counter()
        fn(spark, data_dir).count()
        wall = time.perf_counter() - t0
        s1, v1, c1 = stat_ticks(), vmstat_counters(), bench._jvm_counters(spark)
        j1 = jvm_only_cpu_sec()
        w1 = worker_pids(jvm_pid)
        d = {k: round((s1[k] - s0[k]) / hz, 2) for k in s0}
        cap = wall * (os.cpu_count() or 32)
        tree = ((c1["cpu_ms"] or 0) - (c0["cpu_ms"] or 0)) / 1000.0
        print(
            json.dumps(
                {
                    "run": i,
                    "wall": round(wall, 3),
                    "box_sec": d,
                    "box_cap_sec": round(cap, 1),
                    "steal_frac": round(d["steal"] / cap, 4) if cap else None,
                    "own_cpu_sec": round(tree, 1),
                    "jvm_cpu_sec": round(j1 - j0, 1),
                    "py_cpu_sec": round(tree - (j1 - j0), 1),
                    "gc_ms": (c1["gc_ms"] or 0) - (c0["gc_ms"] or 0),
                    "pgfault_k": round((v1["pgfault"] - v0["pgfault"]) / 1e3),
                    "pgmajfault": v1.get("pgmajfault", 0) - v0.get("pgmajfault", 0),
                    "workers_new": len(w1 - w0),
                    "workers_live": len(w1),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
