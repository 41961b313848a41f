"""Probe for the r14 in-tier docs100x CPU inflation (r15 verdict #2).

Reproduces the bench lifecycle inside ONE gateway JVM — a headline churn
phase (N registry queries executed once each at sf0.1, exactly what fills
the JIT code cache before the tiers run) followed by the docs100x tier
methodology (fresh SESSION, same JVM; warm-up + 3 timed runs per query) —
while sampling the JVM code-heap pools, metaspace, loaded-class count and
total JIT compilation time via public JMX beans.

The r14 markers showed the inflated cells burn ~87 s JVM CPU per 18 s wall
with GC < 2 s: genuine extra CPU in a long-lived JVM.  Hypothesis ranked
first by that signature: code-cache exhaustion (default
ReservedCodeCacheSize=240m) — when the cache fills, HotSpot stops/flushes
compilation and hot loops run interpreted or endlessly recompile.

Usage:
    python tools/probe_codecache.py <sf_dir> [--churn=N] [--runs=3]
        [--queries=dedup_minhash,bigram_logppl_docs,cos_topk_lsh]

To A/B the code-cache size, set SPARK_SUBMIT_OPTS before launching:
    SPARK_SUBMIT_OPTS="-XX:ReservedCodeCacheSize=512m" python tools/...

Prints one JSON line per phase step.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asctb_ct_label_mapper_spark.queries import all_queries  # noqa: E402
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402


def jvm_health(spark) -> dict:
    """Code-heap / metaspace / class / JIT counters from public JMX."""
    out: dict = {}
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        mf = jvm.java.lang.management.ManagementFactory
        for p in mf.getMemoryPoolMXBeans():
            n = p.getName()
            if "CodeHeap" in n or n == "Metaspace":
                u = p.getUsage()
                key = (
                    n.replace("CodeHeap '", "ch_")
                    .replace("'", "")
                    .replace(" ", "_")
                    .lower()
                )
                out[f"{key}_mb"] = round(u.getUsed() / 1048576, 1)
        cl = mf.getClassLoadingMXBean()
        out["classes_loaded"] = int(cl.getLoadedClassCount())
        out["classes_unloaded"] = int(cl.getUnloadedClassCount())
        comp = mf.getCompilationMXBean()
        out["jit_compile_ms"] = int(comp.getTotalCompilationTime())
    except Exception as e:  # noqa: BLE001 - probe is best-effort
        out["err"] = str(e)[:120]
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_churn = int(opts.get("churn", "283"))
    n_runs = int(opts.get("runs", "3"))
    targets = opts.get(
        "queries", "dedup_minhash,bigram_logppl_docs,cos_topk_lsh"
    ).split(",")

    import bench  # noqa: E402  (repo root on path)

    tier_dir = bench.ensure_docs_scale(sf_dir, 100)
    registry = all_queries()

    spark = get_spark("probe-churn")
    print(json.dumps({"phase": "start", **jvm_health(spark)}), flush=True)

    churn = bench.BENCH_QUERIES[:n_churn]
    t0 = time.perf_counter()
    for i, name in enumerate(churn):
        spark.catalog.clearCache()
        try:
            registry[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"churn_err": name, "err": str(e)[:120]}))
        if (i + 1) % 40 == 0:
            print(
                json.dumps(
                    {
                        "phase": f"churn_{i + 1}",
                        "wall": round(time.perf_counter() - t0, 1),
                        **jvm_health(spark),
                    }
                ),
                flush=True,
            )
    print(
        json.dumps(
            {
                "phase": "churn_done",
                "n": len(churn),
                "wall": round(time.perf_counter() - t0, 1),
                **jvm_health(spark),
            }
        ),
        flush=True,
    )

    # tier phase: fresh session, SAME JVM — exactly _fresh_session in bench
    spark.stop()
    spark = get_spark("probe-tier")
    spark.read.parquet(
        os.path.join(tier_dir, "documents.parquet")
    ).groupBy("lang").count().count()
    for name in targets:
        fn = registry[name]
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:  # noqa: BLE001
            pass
        spark.catalog.clearCache()
        fn(spark, tier_dir).count()  # warm-up, tier methodology
        runs = []
        c0 = bench._jvm_counters(spark)
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t = time.perf_counter()
            fn(spark, tier_dir).count()
            runs.append(round(time.perf_counter() - t, 4))
        c1 = bench._jvm_counters(spark)
        print(
            json.dumps(
                {
                    "phase": "tier",
                    "query": name,
                    "runs": runs,
                    "cpu_ms": (c1["cpu_ms"] or 0) - (c0["cpu_ms"] or 0),
                    "gc_ms": (c1["gc_ms"] or 0) - (c0["gc_ms"] or 0),
                    **jvm_health(spark),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
