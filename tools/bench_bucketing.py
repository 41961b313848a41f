"""Measure what bucketing buys on the rel10x fact-fact joins.

SCALING.md claims the dominant exchange in the order-grain TPC-H shapes
(q4/q18/q21's late-set build) disappears when lineitem/orders are
bucketed on the order key; tests/test_bucketing.py proves the no-Exchange
plan at sf0.001. This tool prices it at the rel10x tier (6M lineitem /
1.5M orders): both facts are written once as 32-bucket sorted tables,
then three order-grain workloads run against plain parquet vs the
bucketed tables, min of two timed passes each.

Workloads (the bucketing-sensitive cores, not the full queries — dims
and final small aggregates would only blur the join cost):
- q18_core: lineitem ⋈ orders -> per-order quantity sum + HAVING
- q4_core: EXISTS-style distinct (orderkey) semi probe
- q21_late: the late-set build (join + date filter + distinct pairs)

Output: one JSON line {"plain": {...}, "bucketed": {...}} (seconds).

Bucketed tables land in ./spark-warehouse (gitignored) under names
bb_orders/bb_lineitem and are dropped afterwards.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.session import get_spark

REL_DIR = "/tmp/spark_graft_scale/v2/rel10x"


def workloads(li, orders):
    def q18_core():
        (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
            .filter(F.col("q") > 300)
            .count()
        )

    def q4_core():
        (
            orders.join(
                li.select("l_orderkey").distinct(),
                orders["o_orderkey"] == F.col("l_orderkey"),
                "left_semi",
            ).count()
        )

    def q21_late():
        (
            li.join(
                orders.filter(F.col("o_orderstatus") == "F"),
                li["l_orderkey"] == orders["o_orderkey"],
            )
            .filter(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            )
            .select("l_orderkey", "l_suppkey")
            .distinct()
            .count()
        )

    return {"q18_core": q18_core, "q4_core": q4_core, "q21_late": q21_late}


def timed(fn) -> float:
    fn()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    if not os.path.exists(os.path.join(REL_DIR, "_DONE")):
        # build the tier if bench.py hasn't already (repo root is already
        # on sys.path from the module-level insert)
        from bench import ensure_relational_scale

        ensure_relational_scale("/root/testdata/sf0.1", 10)

    spark = get_spark("bucketing-bench")
    spark.sparkContext.setLogLevel("ERROR")
    li_plain = spark.read.parquet(os.path.join(REL_DIR, "lineitem.parquet"))
    o_plain = spark.read.parquet(os.path.join(REL_DIR, "orders.parquet"))

    for name, df, key in (
        ("bb_orders", o_plain, "o_orderkey"),
        ("bb_lineitem", li_plain, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(32, key).sortBy(key).mode("overwrite").saveAsTable(name)

    li_b, o_b = spark.table("bb_lineitem"), spark.table("bb_orders")

    result = {"plain": {}, "bucketed": {}}
    for label, li, orders in (("plain", li_plain, o_plain), ("bucketed", li_b, o_b)):
        for wname, fn in workloads(li, orders).items():
            result[label][wname] = timed(fn)
    for name in ("bb_orders", "bb_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
