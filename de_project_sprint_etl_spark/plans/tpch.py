"""TPC-H pricing/market queries adapted to the TESTDATA tables.

The synthetic tables are TPC-H-shaped (TESTDATA.md), so the canonical
analytics suite runs almost verbatim — Q1 (pricing summary), Q3
(shipping priority, minus the absent ``o_shippriority`` column), Q5
(local supplier volume), Q6 (forecast revenue change). The reference
engine has nothing comparable (its SQL surface is the retention mart,
SURVEY §2); these pin this engine's star-schema join/agg chops on the
workload every warehouse is judged by.

Cross-engine money determinism (same rule as plans/relational.py, and
the hard-won lesson from the salted-join query): NEVER cast a double
*product* to decimal — the engines round the last cent differently.
Cast each factor to DECIMAL(18,2) first (prices and rates are 2-dp
values, so the cast is exact) and multiply in decimal. Averages are
decimal-sum / count, never a double ``avg()`` — a naive double
summation over ~1e10-magnitude sums carries ~1e-4 of rounding noise,
which 6-dp rounding cannot hide.

Scale shapes: Q1/Q6 are single-scan partial-combined aggregations (the
filter and projection reach the parquet scan — pushdown pinned for this
table in tests/test_plans.py). Q3/Q5 are star joins: dims broadcast
(region/nation always; customer under the 64 MB threshold — at a true
100 TB SF customer outgrows it and AQE picks a shuffled hash join on
the same plan), facts never shuffle before their group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.plans.registry import register
from de_project_sprint_etl_spark.plans.testdata import t

_D = 'CAST({c} AS DECIMAL(18,2))'
#: narrow variants for multi-factor products that must stay under the
#: 38-digit cap (see tpch_q1)
_DN = 'CAST({c} AS DECIMAL(12,2))'
_DS = 'CAST({c} AS DECIMAL(4,2))'


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


@register(
    "tpch_q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_D.format(c='l_quantity')}) AS DOUBLE) AS sum_qty,
       CAST(SUM({_D.format(c='l_extendedprice')}) AS DOUBLE) AS sum_base_price,
       -- narrow factor types: the triple product must stay under the
       -- 38-digit decimal cap on BOTH engines or Spark's
       -- allowPrecisionLoss rounds intermediates differently than
       -- DuckDB's reduction (1-ULP double drift at 6M-row sums,
       -- found by the sf1 sweep)
       -- ROUND to cents before the double cast: a scale-6 decimal sum's
       -- scaled integer passes 2^53 at sf1 (5.2e16) and DuckDB's
       -- int128->double conversion then double-rounds where Spark's
       -- BigDecimal rounds once; at scale 2 both conversions are exact
       CAST(ROUND(SUM({_DN.format(c='l_extendedprice')} * (1 - {_DS.format(c='l_discount')})), 2)
            AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM({_DN.format(c='l_extendedprice')} * (1 - {_DS.format(c='l_discount')})
                * (1 + {_DS.format(c='l_tax')})), 2) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM({_D.format(c='l_quantity')}) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM({_D.format(c='l_extendedprice')}) AS DOUBLE) / COUNT(*), 6)
         AS avg_price,
       ROUND(CAST(SUM({_D.format(c='l_discount')}) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: one filtered scan, one partial-combined aggregation —
    the canonical columnar-engine microbenchmark."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    # narrow factor types (12,2)/(4,2): the charge triple product then
    # peaks at decimal(24,6) — exact, no precision-loss rounding (the
    # (18,2)-typed form hit Spark's 38-digit cap and drifted 1 ULP from
    # DuckDB at sf1)
    price_n = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = price_n * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.round(F.sum(disc), 2).cast("double").alias("sum_disc_price"),
        F.round(
            F.sum(disc * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))), 2
        )
        .cast("double")
        .alias("sum_charge"),
        F.round(F.sum(_dec("l_quantity")).cast("double") / n, 6).alias("avg_qty"),
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / n, 6).alias("avg_price"),
        F.round(F.sum(_dec("l_discount")).cast("double") / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    f"""
SELECT l_orderkey,
       CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
            AS DOUBLE) AS revenue,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority; o_shippriority absent from the
    synthetic schema): star join with broadcast dims, then top-10 via
    TakeOrderedAndProject — no global sort."""
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = li.join(
        F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("string").alias("o_orderdate")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    f"""
SELECT n_name,
       CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: five-way star join (region→nation→supplier plus
    customer⋈orders), every dim broadcast, the fact table shuffled
    exactly once — for the final group-by."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    co = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_nationkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(F.broadcast(co), li.l_orderkey == co.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q6_forecast_revenue",
    f"""
SELECT CAST(SUM({_D.format(c='l_extendedprice')} * {_D.format(c='l_discount')})
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filtered-scan aggregation — every predicate
    pushes to the parquet reader, zero shuffles beyond the final
    single-row combine."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q18_large_volume_customers",
    f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM({_D.format(c='l_quantity')}) > 300)
SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       o_totalprice,
       CAST(SUM({_D.format(c='l_quantity')}) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the HAVING subquery becomes
    a partial-combined aggregation whose tiny survivor set broadcasts
    into a semi join — the fact table is filtered before the wide join,
    never after."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("s"))
        .filter(F.col("s") > 300)
        .select("l_orderkey")
    )
    li_big = li.join(F.broadcast(big), "l_orderkey", "left_semi")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = li_big.join(
        F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
        li_big.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .select(
            "c_name", "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice", "total_qty",
        )
    )


@register(
    "tpch_q4_order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-04-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking; the synthetic schema has no
    commit/receipt dates, so "late" = a line shipped >60 days after the
    order date). The correlated EXISTS becomes a left-semi join: the
    quarter's order slice broadcasts into the lineitem scan to evaluate
    the correlated predicate, and the distinct late-order keys broadcast
    back as the semi-join filter — the fact table is never shuffled."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_keys = (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_orderdate")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("o_orderkey")
        .distinct()
    )
    return (
        orders.join(F.broadcast(late_keys), "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
            AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00') shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations): every dimension
    — supplier⋈nation and orders⋈customer⋈nation — broadcasts; the
    disjunctive nation-pair predicate is applied after both sides are
    tagged, exactly one pass over the fact table."""
    nation = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select("n_nationkey", "n_name")
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    oc = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "cust_nation")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(oc), li.l_orderkey == oc.o_orderkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q10_returned_items",
    f"""
SELECT c_custkey, c_name,
       CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
            AS DOUBLE) AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): broadcast star join, one
    fact shuffle for the customer rollup, top-20 via
    TakeOrderedAndProject (no global sort)."""
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = li.join(
        F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment"
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_shipping_lateness",
    """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
            THEN 'late' ELSE 'ontime' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY ship_bucket
""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and priority; no l_shipmode in the
    synthetic schema, so lines bucket by shipping lateness instead):
    conditional aggregation — the CASE pair folds into one
    partial-combined agg, a two-row result with zero extra passes."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
                F.lit("late"),
            ).otherwise(F.lit("ontime")),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    f"""
SELECT ROUND(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN {_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')})
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
                AS DOUBLE), 6) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): part broadcasts into the filtered
    fact scan; both CASE branches fold into one partial-combined agg.
    The percentage divides two exact decimal sums in double at the very
    end (6-dp rounded) so both engines see identical operands."""
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero))
                .cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q16_parts_supplier_counts",
    """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship; the synthetic schema has
    no partsupp table, so observed part↔supplier pairs come from
    lineitem): NOT IN becomes a broadcast anti join against the
    negative-balance supplier set, and the distinct-supplier count is a
    two-level agg (distinct pair combine, then count) — no row
    explosion, one fact shuffle on the part-attribute key."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pairs = (
        li.join(
            F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


@register(
    "tpch_q19_discounted_revenue",
    f"""
SELECT CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): the
    classic OR-of-ANDs join. The part side pre-filters to the union of
    brand/size envelopes (a pushdown Catalyst derives via constraint
    propagation), broadcasts, and the residual disjunction evaluates
    post-join in one codegen stage — no triple scan, no union."""
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q22_global_sales_opportunity",
    f"""
WITH avg_bal AS (
  SELECT CAST(SUM({_D.format(c='c_acctbal')}) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM({_D.format(c='c_acctbal')}) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY c_mktsegment
""",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity; market segment substitutes
    for the absent phone country code, and "has no orders" is scoped
    to the trailing 13 months — the synthetic customers all have
    lifetime orders): the scalar AVG subquery is a one-row broadcast
    cross join, NOT EXISTS is a left-anti join against the distinct
    recent-order custkeys — the customer table is scanned twice (once
    for the average, once for the probe), never shuffled.

    Money determinism: DuckDB's AVG(DECIMAL) divides in decimal while
    Spark's avg(decimal) also yields decimal — but their quotient
    scales differ; dividing the exact decimal SUM by COUNT in *double*
    on both sides makes the operands bit-identical (plans/tpch.py
    module docstring), and the > comparison is then exact."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1)))
            .alias("a")
        )
    )
    order_keys = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("a"))
        .join(
            F.broadcast(order_keys),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part
JOIN pairs ON p_partkey = l_partkey
JOIN eu ON l_suppkey = s_suppkey
WHERE p_type = 'LARGE'
  AND s_acctbal = (
    SELECT MAX(eu2.s_acctbal)
    FROM pairs p2 JOIN eu eu2 ON p2.l_suppkey = eu2.s_suppkey
    WHERE p2.l_partkey = p_partkey)
ORDER BY s_acctbal DESC, p_partkey
LIMIT 100
""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier; the synthetic schema has no
    partsupp, so part↔supplier pairs are the ones observed in lineitem
    and "best" = highest account balance rather than lowest supply
    cost). The correlated MAX subquery becomes a per-part aggregate
    joined back on (part, acctbal) — ties survive, matching SQL
    semantics. The distinct pair set is the only fact shuffle; supplier
    ⋈nation⋈region and part both broadcast."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    eu = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = t(spark, sf_dir, "part").filter(
        F.col("p_type") == "LARGE"
    ).select("p_partkey", "p_name")
    pairs = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "l_suppkey")
        .distinct()
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = pairs.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        pairs.join(
            F.broadcast(best),
            (pairs.p_partkey == F.col("bp"))
            & (pairs.s_acctbal == F.col("best_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey"))
        .limit(100)
    )


@register(
    "tpch_q8_market_share",
    f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
       CAST(SUM(volume) AS DOUBLE) AS total_volume
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         {_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
GROUP BY o_year
""",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share of NATION_5 suppliers inside
    AMERICA-region demand for ECONOMY parts): a five-dim star join —
    every dimension broadcasts, the fact table is scanned once, and the
    share is a conditional-sum / sum pair folded into one
    partial-combined aggregate per year."""
    part = t(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("long").alias("o_year"))
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
    )


@register(
    "tpch_q9_product_profit",
    f"""
SELECT n_name AS nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS o_year,
         {_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')})
           - {_D.format(c='p_retailprice')} * {_D.format(c='l_quantity')} AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%bolt%') profit
GROUP BY n_name, o_year
""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit; no partsupp → the cost leg uses
    p_retailprice × quantity as the supply-cost proxy): profit per
    supplier nation per order year for parts matching a name pattern.
    All dims broadcast; the amount expression is pure decimal (2-dp ×
    2-dp → exact 4-dp) so both engines agree to the bit."""
    part = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_retailprice")
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    amount = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("amount", amount)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    f"""
WITH nat_value AS (
  SELECT l_partkey,
         SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
           AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey)
SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
FROM nat_value
WHERE CAST(value AS DOUBLE) > (
  SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM nat_value)
""",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock; no partsupp → "stock value" is the
    discounted revenue each part generated through NATION_3 suppliers):
    a HAVING-against-global-scalar shape. The per-part aggregate is
    computed once, reused for both the scalar total (second pass over
    the tiny agg output, broadcast as a one-row cross join) and the
    filter — the fact table is scanned and shuffled exactly once."""
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    per_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .alias("dec_value")
        )
        .persist()
    )
    total = per_part.agg(
        (F.sum("dec_value").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("dec_value").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("dec_value").cast("double").alias("value"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution, including
    zero-order customers): instead of a customer⊐orders left outer join
    followed by a count (which shuffles every order row), the orders
    side pre-aggregates to one row per customer and joins back
    broadcast — the histogram then needs only the customer scan.
    COUNT(o_orderkey) over the outer join ≡ coalesce(pre-agg count, 0)."""
    per_cust = (
        t(spark, sf_dir, "orders")
        .filter(~F.col("o_orderpriority").like("%URGENT%"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(F.broadcast(per_cust), cust.c_custkey == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1999-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier of the quarter): the revenue view is
    computed once and reused for both the scalar MAX (one-row broadcast
    cross join) and the equality filter; supplier broadcasts for the
    name lookup. Both engines compare the identical decimal-sum-cast-
    double value, so the float equality is deterministic."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
        .persist()
    )
    best = revenue.agg(F.max("total_revenue").alias("best_rev"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    f"""
SELECT ROUND(CAST(SUM({_D.format(c='l_extendedprice')}) AS DOUBLE) / 7.0, 6)
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5' AND p_size = 3
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM({_D.format(c='l_quantity')}) AS DOUBLE) / COUNT(*))
    FROM lineitem WHERE l_partkey = p_partkey)
""",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue; p_size stands in for
    the absent p_container): the correlated AVG subquery becomes a
    per-part aggregate over the full lineitem scan, broadcast back into
    the brand-filtered scan. The average is decimal-sum / count in
    double (module docstring rule) so the 0.2× threshold is
    bit-identical across engines."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_size") == 3)
    ).select("p_partkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part_avg = (
        li.groupBy(F.col("l_partkey").alias("ap"))
        .agg(
            (
                F.lit(0.2)
                * (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))
            ).alias("qty_cut")
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part_avg), F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q20_potential_promotion",
    f"""
SELECT s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING CAST(SUM({_D.format(c='l_quantity')}) AS DOUBLE) > 40.0)
ORDER BY s_name
""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion; no partsupp availqty → a
    supplier qualifies by having shipped >40 units of some small-named
    part in 2000): nested IN-subqueries become a chain — part-name
    filter broadcasts into the year slice, the (supplier, part)
    aggregate keeps the heavy lifting in one partial-combined shuffle,
    and the surviving supplier keys broadcast as a semi join into the
    nation-filtered supplier dim."""
    part = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy_suppliers = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("qty"))
        .filter(F.col("qty") > 40.0)
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        supp.join(
            F.broadcast(heavy_suppliers),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_2'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting; "late" = shipped
    >90 days after the order date of a finalized order, standing in for
    the absent commit/receipt dates). The EXISTS / NOT EXISTS pair is
    rewritten as per-order supplier statistics: aggregate lineitem to
    one row per (order, supplier) with its late-line count, then a
    window over the order computes how many distinct suppliers the
    order has and how many of them were late — a supplier's late lines
    qualify iff the order has other suppliers (EXISTS) and no OTHER
    supplier was late (NOT EXISTS ≡ exactly one late supplier). One
    fact shuffle on (orderkey, suppkey); the window reuses the same
    partitioning, so no second exchange."""
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("long")
    pair = (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late).alias("late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    stats = pair.withColumn("n_supp", F.count(F.lit(1)).over(w)).withColumn(
        "n_late_supp", F.sum((F.col("late_lines") > 0).cast("long")).over(w)
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        stats.filter(
            (F.col("late_lines") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )
