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


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


@register(
    "tpch_q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_D.format(c='l_quantity')}) AS DOUBLE) AS sum_qty,
       CAST(SUM({_D.format(c='l_extendedprice')}) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')}))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_D.format(c='l_extendedprice')} * (1 - {_D.format(c='l_discount')})
                * (1 + {_D.format(c='l_tax')})) AS DOUBLE) AS sum_charge,
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
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc).cast("double").alias("sum_disc_price"),
        F.sum(disc * (F.lit(1) + _dec("l_tax"))).cast("double").alias("sum_charge"),
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
