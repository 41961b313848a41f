"""Measure the skew-mitigation ladder on a deliberately hot-keyed join.

Fixture: a 20M-row fact whose join key space is 10k keys but ONE key holds
40% of the rows (the web-corpus reality: one domain/boilerplate bucket
dominating), joined to a 10k-row dim with broadcast disabled (to model the
dim-too-big-for-broadcast regime where shuffle-join skew actually bites;
with broadcast on, skew is a non-event — that is mitigation rung zero and
the session default).

Rungs measured:
1. naive shuffle join, AQE skew split OFF — the hot key lands on one
   reducer; wall time == hottest task.
2. AQE skew split ON with thresholds sized to the fixture (the defaults
   target 256MB partitions; local toy partitions need lower bars —
   exactly what a real cluster would tune per workload).
3. explicit ``salted_join`` (operators/skew.py) — deterministic fan-out
   of the hot key over n_salts reducers, no AQE dependency.

Each rung counts the joined frame twice and keeps the min. Output: one
JSON line {"fixture": {...}, "naive_skew_off": s, "aqe_skew_split": s,
"salted_32": s}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.skew import salted_join

N_FACT = 20_000_000
N_KEYS = 10_000
HOT_FRACTION = 0.4


def build(spark: SparkSession):
    # deterministic: row i is hot iff i % 10 < 4 (40%), else uniform key
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 10 < 4, F.lit(0))
        .otherwise(F.pmod(F.hash(F.col("id")), F.lit(N_KEYS)))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.col("id").alias("row_id"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_payload")
    )
    return fact, dim


def timed(fn) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = (
        SparkSession.builder.appName("skew-bench")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark)
    fact = fact.persist()
    dim = dim.persist()
    fact.count(), dim.count()

    def set_skew(enabled: bool) -> None:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
        # size the split bars to the fixture (defaults assume 256MB tasks)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def run_naive():
        fact.join(dim, "k").agg(F.sum("v"), F.count(F.lit(1))).collect()

    def run_salted():
        salted_join(fact, dim, "k", n_salts=32, distributor="row_id").agg(
            F.sum("v"), F.count(F.lit(1))
        ).collect()

    set_skew(False)
    t_naive = timed(run_naive)
    t_salted_noaqe = timed(run_salted)
    set_skew(True)
    t_aqe = timed(run_naive)

    print(
        json.dumps(
            {
                "fixture": {
                    "fact_rows": N_FACT,
                    "keys": N_KEYS,
                    "hot_key_fraction": HOT_FRACTION,
                },
                "naive_skew_off": t_naive,
                "aqe_skew_split": t_aqe,
                "salted_32": t_salted_noaqe,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
