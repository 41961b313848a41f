"""TPC-H dialect completion: the 11 query shapes (Q2, Q6, Q8, Q9, Q11,
Q12, Q13, Q15, Q16, Q20, Q21) not already covered by queries.py, adapted
to the driver's trimmed synthetic schema (no partsupp table; lineitem has
no shipmode/commitdate/receiptdate). Together with queries.py's
q1/q3/q4/q5/q7/q10/q14/q17/q18/q19/q22 this gives all 22 TPC-H query
shapes a registered Spark plan + DuckDB oracle.

Where the schema lacks a TPC-H column the shape is preserved with a
derived stand-in (documented per query): supply cost := avg unit price
observed in lineitem (Q2), availqty-threshold := share-of-total shipped
quantity (Q20), shipmode := linestatus (Q12), comment-LIKE exclusions :=
priority / name-suffix predicates (Q13, Q16).

Same driver conventions as queries.py: identical column aliases on both
engines, money rounded 2dp, ratios 6dp, unit costs 4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.plans.cache import pooled_persist
from asctb_ct_label_mapper_spark.queries import _t, query


@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.015 AND 0.045
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-table filter + global sum — the canonical
    predicate-pushdown probe. All three predicates reach the parquet scan
    (PushedFilters: shipdate range, quantity, discount range) so only
    matching row groups are decoded; the aggregate is partial+final with
    no groupBy shuffle. The discount band uses 0.015/0.045 (mid-step
    bounds of the 0.01-step synthetic grid) so no value sits on a float
    boundary."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.015)
            & (F.col("l_discount") <= 0.045)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
            min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, n_name,
        unit_cost AS best_unit_cost
    FROM cost
    JOIN part ON l_partkey = p_partkey
    JOIN eu ON l_suppkey = s_suppkey
    WHERE p_size <= 10 AND p_type = 'LARGE'
      AND unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                       JOIN eu e2 ON c2.l_suppkey = e2.s_suppkey
                       WHERE c2.l_partkey = p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated-min subquery): cheapest European
    supplier per small LARGE part. No partsupp table in this schema, so
    supply cost is derived as the observed MINIMUM unit price per
    (part, supplier) pair in lineitem — same correlated `= (SELECT
    min(...))` structure as the reference query. min (not avg) keeps the
    cost bitwise identical across engines: both read the same parquet
    doubles and divide, no summation-order sensitivity, so the min
    equality is exact and the output column ships the raw double
    (rounding it would MANUFACTURE cross-engine diffs: 2dp-price ÷
    integer-quantity yields exact decimal ties like 1257.85775, where
    Spark's BigDecimal HALF_UP and DuckDB's float rounding split).
    Spark expresses the correlation as a min window over l_partkey AFTER
    restricting to European suppliers (a 2-phase broadcast:
    supplier⋈nation⋈region dims collapse to a tiny build side), then
    keeps rows at the per-part min. The part filter is applied FIRST, as
    a broadcast semi join on the fact before the pair aggregate — the
    correlation is per part, so dropping non-qualifying parts removes
    whole window partitions and never changes a surviving part's min;
    the pair aggregate + window then run on the ~3% of the fact whose
    part qualifies instead of all of it."""
    li = _t(spark, sf_dir, "lineitem")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    cost = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
        )
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("_min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("_min_cost")
    )
    return best.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "p_partkey",
        "p_name",
        "s_name",
        "n_name",
        F.col("unit_cost").alias("best_unit_cost"),
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
        round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
              / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
            l_extendedprice * (1 - l_discount) AS volume,
            n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — the deepest join tree in the
    suite (8 tables). Every dimension (part, supplier, both nations,
    region, customer-side chain) broadcasts; the only repartition
    shuffles are the two fact keys (l_orderkey, o_custkey). The
    conditional-sum ratio avoids a second pass: one aggregate computes
    numerator and denominator together. The 2-year order-date filter
    prunes orders before the fact-fact join."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), cust["c_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), sup["s_nationkey"] == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
        SELECT n_name AS nation,
            CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
            l_extendedprice * (1 - l_discount)
                - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for one
    product family. No partsupp.ps_supplycost in this schema, so cost is
    the deterministic stand-in 0.6 × p_retailprice × quantity (same
    revenue-minus-cost aggregate structure). The p_name LIKE filter is a
    substring predicate — NOT pushable to parquet as a range, but Catalyst
    still prunes part columns and broadcasts the ~filtered part dim, so
    the fact scan joins against a small build side."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    """
    WITH val AS (
        SELECT l_partkey AS partkey,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    )
    SELECT partkey, value FROM val
    WHERE value > (SELECT 2 * avg(value) FROM val)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value held by one nation's suppliers,
    kept only where it exceeds a multiple of the average per-part value —
    the HAVING-vs-global-scalar-subquery pattern, with a scale-free
    threshold (TPC-H's fixed fraction 0.0001/SF shrinks with SF for the
    same reason: a constant fraction of total returns nothing at scale). Spark computes the per-part
    aggregate once, derives the 1-row total FROM that aggregate (reuse,
    not a second corpus scan — the per-part frame is persisted around its
    two consumers), and applies the threshold via a broadcast cross
    join. Value stand-in for ps_supplycost*ps_availqty: lineitem revenue
    attributable to the nation's suppliers."""
    li = _t(spark, sf_dir, "lineitem")
    nat_sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_5")
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(nat_sup), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("value")
        )
    )
    val = pooled_persist(val)
    threshold = val.agg((F.avg("value") * 2).alias("_threshold"))
    out = (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_threshold"))
        .select("partkey", "value")
    )
    return out


@query(
    "q12_late_lines_by_status",
    """
    SELECT l_linestatus,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority split of late shipments per category.
    The schema has no l_shipmode/l_receiptdate, so the category is
    l_linestatus and "late" is shipped >60 days after the order date (a
    cross-table predicate evaluated post-join, exactly like the
    receipt-vs-commit comparison in the reference). The year filter DOES
    push into the lineitem scan; the conditional counts are one
    map-side-combinable aggregate over a 2-3 row group space."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count histogram. The join-condition
    exclusion (priority <> '5-LOW', standing in for the reference's
    o_comment NOT LIKE) must live IN the left join's ON clause — filtering
    orders before the join is equivalent here, and that's how Spark
    expresses it so zero-order customers survive with count 0. Two
    aggregations: per-customer count (shuffle on custkey, which the join
    already partitioned — Catalyst reuses the exchange), then the tiny
    histogram aggregate."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue (the reference's
    CREATE VIEW + max-subquery form). The revenue view materializes once
    (persisted around its two consumers: the max scalar and the equality
    filter); the max arrives as a broadcast 1-row frame, never a driver
    collect. Revenue is rounded 2dp BEFORE max/equality so both engines
    rank identical values — ties (multiple suppliers at the max) are all
    returned, per the reference semantics."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    rev = pooled_persist(rev)
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%7')
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute
    bucket, excluding flagged suppliers. The SQL derives a partsupp stand-
    in as DISTINCT (l_partkey, l_suppkey); the Spark plan SKIPS that
    materialized distinct — count_distinct dedups inside the final
    aggregate, so pre-distincting the pairs is a pure extra shuffle (the
    rel10x tier measured it as the sweep's most expensive query at 8.2 s).
    Order of operations is filter-first: the broadcast part filter prunes
    the fact to the ~13% of rows whose part qualifies BEFORE any
    wide-row movement, and the complaint exclusion (reference:
    s_comment LIKE; here a name-suffix predicate) is a broadcast
    left-anti. One real shuffle total: the (brand, type, size) aggregate
    with its internal distinct expansion."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    flagged = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(flagged),
            F.col("l_suppkey") == flagged["s_suppkey"],
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_heavy_red_shippers",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
        SELECT l_suppkey, sum(l_quantity) AS qty
        FROM lineitem JOIN red ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, n_name, qty AS red_qty
    FROM shipped
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE qty > (SELECT 1.2 * avg(qty) FROM shipped)
    """,
)
def q20_heavy_red_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped volume of one part family
    in one year clears a threshold derived from an aggregate of the same
    frame (reference: availqty > 0.5 × shipped qty; here: qty > 1.2 ×
    the average supplier's shipped qty of the family — scale-free, since
    no partsupp.availqty exists). The
    nested-subquery chain (parts LIKE → per-supplier sum → scalar
    threshold → supplier/nation decoration) is the same. l_quantity is
    whole-valued so the sums and the threshold comparison are exact in
    doubles — no rounding needed before the cut."""
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    shipped = pooled_persist(shipped)
    threshold = shipped.agg((F.avg("qty") * 1.2).alias("_threshold"))
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        shipped.crossJoin(F.broadcast(threshold))
        .filter(F.col("qty") > F.col("_threshold"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_name", F.col("qty").alias("red_qty"))
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH late AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    ),
    all_supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND EXISTS (SELECT 1 FROM all_supp a
                  WHERE a.l_orderkey = l1.l_orderkey
                    AND a.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late shipper on finished
    multi-supplier orders — the EXISTS + NOT EXISTS double-correlation.
    "Late" is shipped >90 days after order date (no receipt/commit dates
    in this schema).

    The oracle keeps the literal EXISTS/NOT EXISTS form; the Spark plan
    uses the AGGREGATE REWRITE, which is how this correlation should run
    at scale: a late row qualifies iff its order has >1 distinct supplier
    and exactly 1 distinct late one — itself. Two decisive plan moves:

    - the per-order aggregates are computed ONLY for orders that appear
      in the nation-filtered late set (semi join first): the correlation
      driver l1 is nation-sized, so the distinct-supplier count scans a
      sliver of the fact instead of aggregating every order on earth —
      the pair-join formulation this replaces re-shuffled the full pair
      set twice and measured 10.4 s at rel10x;
    - ``late`` is persisted EAGERLY (the bare count materializes the
      cache before its three consumers plan against it) — the lazy
      persist would let the first job recompute the fact-fact join,
      the double-evaluation trap SCALING.md documents for dedup.

    Equivalence to the literal EXISTS/NOT EXISTS SQL is exactly what the
    driver's hash check proves."""
    return q21_plan(spark, sf_dir, impl="plain")


def q21_plan(
    spark: SparkSession, sf_dir: str, impl: str = "auto"
) -> DataFrame:
    """The Q21 skew seam (r12 verdict #6): ONE builder, the layout
    recipe selectable without editing the query — the
    mann_whitney/WOE ``impl=`` precedent applied to the heaviest TPC-H
    shape (5.47 s plain vs 1.98 s bucketed at rel10x, SCALING.md).

    - ``impl='plain'``: shuffle-exchange plan over the raw parquet —
      three l_orderkey exchanges (late-set fact-fact join + both
      per-order aggregates).
    - ``impl='bucketed'``: the 32-bucket orderkey layout elides all
      three exchanges; first call pays the write-once ingest.
    - ``impl='auto'``: bucketed iff the bucketed tables are ALREADY
      materialized (steady-state cluster: layout exists, use it; cold
      ad-hoc session: don't charge a full ingest to one query) —
      checked against the catalog, zero jobs."""
    if impl not in ("auto", "plain", "bucketed"):
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "auto":
        from asctb_ct_label_mapper_spark.sources.bucketing import (
            bucketed_tables_ready,
        )

        impl = "bucketed" if bucketed_tables_ready(spark, sf_dir) else "plain"
    if impl == "bucketed":
        li, orders = _bucketed_facts(spark, sf_dir)
    else:
        li = _t(spark, sf_dir, "lineitem")
        orders = _t(spark, sf_dir, "orders")
    return _q21_core(
        li, orders, _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation")
    )


def _q21_core(
    lineitem: DataFrame,
    orders_all: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Q21 aggregate-rewrite over caller-supplied facts — shared by the
    plain and bucketed-layout variants (bucketed lineitem/orders elide
    the late-set join's and per-order aggregates' l_orderkey exchanges)."""
    li = lineitem.select("l_orderkey", "l_suppkey")
    orders = orders_all.filter(F.col("o_orderstatus") == "F")
    late = (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    late = pooled_persist(late)
    late.count()  # eager persist: materialize once for the 3 consumers
    nat1 = (
        supplier
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_1")
        .select("s_suppkey", "s_name")
    )
    l1 = late.join(F.broadcast(nat1), late["l_suppkey"] == nat1["s_suppkey"])
    keys = l1.select("l_orderkey").distinct()
    n_supp = (
        li.join(keys, "l_orderkey", "left_semi")
        .groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("_n_supp"))
    )
    n_late = (
        late.join(keys, "l_orderkey", "left_semi")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n_late"))  # late is distinct pairs
    )
    return (
        l1.join(n_supp, "l_orderkey")
        .join(n_late, "l_orderkey")
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# =============================================================================
# Bucketed-layout variants (VERDICT r6 #5): same Q18/Q21 semantics, facts
# read from the bucketed+sorted managed tables the ingest-side helper
# materializes once — the l_orderkey exchanges disappear from the plans.
# Oracles are byte-identical to the plain variants (layout must not change
# answers; the driver's hash check proves it).
# =============================================================================

from asctb_ct_label_mapper_spark.queries import ORACLES as _ORACLES  # noqa: E402


def _bucketed_facts(spark: SparkSession, sf_dir: str):
    from asctb_ct_label_mapper_spark.sources.bucketing import (
        ensure_bucketed_tables,
    )

    b = ensure_bucketed_tables(spark, sf_dir)
    return b["lineitem"], b["orders"]


@query("q18_large_orders_bucketed", _ORACLES["q18_large_orders"])
def q18_large_orders_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 over the 32-bucket orderkey layout: the HAVING-aggregate
    (groupBy l_orderkey) and the orders semi-join read bucket-local data —
    no Exchange on the order key anywhere before the customer join
    (tools/bench_bucketing.py prices the same core at 3.04 -> 1.12 s at
    rel10x). First call materializes the bucketed tables (ingest cost,
    write-once); steady-state runs are layout reads."""
    from asctb_ct_label_mapper_spark.queries import _q18_core

    li, orders = _bucketed_facts(spark, sf_dir)
    return _q18_core(li, orders, _t(spark, sf_dir, "customer"))


@query("q21_waiting_suppliers_bucketed", _ORACLES["q21_waiting_suppliers"])
def q21_waiting_suppliers_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 aggregate-rewrite over the bucketed layout: the late-set
    fact-fact join and both per-order aggregates run bucket-local on
    l_orderkey/o_orderkey — the three heaviest exchanges of the plain
    plan elided by storage layout.  Delegates to the ``q21_plan`` skew
    seam (r12 verdict #6) — same recipe, selectable via impl=."""
    return q21_plan(spark, sf_dir, impl="bucketed")


# --- clustered-layout selective scan pair (VERDICT r7 #6) --------------------

_SHIPDATE_SCAN_ORACLE = """
    SELECT l_returnflag,
        count(*) AS n_items,
        round(sum(l_quantity), 4) AS sum_qty,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-03-01'
      AND l_shipdate < TIMESTAMP '1998-03-15'
    GROUP BY l_returnflag
"""


def _shipdate_scan_core(li: DataFrame) -> DataFrame:
    lo = F.lit("1998-03-01").cast("timestamp")
    hi = F.lit("1998-03-15").cast("timestamp")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query("scan_shipdate_range", _SHIPDATE_SCAN_ORACLE)
def scan_shipdate_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective two-week range scan over the UNCLUSTERED lineitem layout
    — the baseline half of the clustered-layout read pair. The predicate
    is pushed to parquet, but the source row groups each span the whole
    shipdate domain (writer order is orderkey-ish), so min/max pruning
    skips nothing: every row group is read to answer a 0.5% slice."""
    return _shipdate_scan_core(_t(spark, sf_dir, "lineitem"))


@query("scan_shipdate_range_clustered", _SHIPDATE_SCAN_ORACLE)
def scan_shipdate_range_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME scan over the range-clustered copy
    (sinks.write_clustered via ensure_clustered_copy: repartitionByRange
    + sortWithinPartitions on l_shipdate, capped row groups): footer
    min/max become narrow and disjoint, so the pushed predicate prunes
    the row groups that cannot match and the scan reads ~the slice, not
    the table. Same oracle as the plain flavor — the hash match proves
    the layout changes nothing about the answer. First call pays the
    write-once ingest cost (by design: ingest owns the layout)."""
    from asctb_ct_label_mapper_spark.sources.bucketing import (
        ensure_clustered_copy,
    )

    path = ensure_clustered_copy(spark, sf_dir, "lineitem", ["l_shipdate"])
    return _shipdate_scan_core(spark.read.parquet(path))
