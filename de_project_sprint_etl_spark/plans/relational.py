"""Relational operators the reference does NOT contain (SURVEY §2.12)
— implemented natively anyway, so a user of the reference who outgrows
its SQL surface doesn't outgrow this engine.

Every op here is a single Catalyst primitive used the way it wants to be
used at scale:

- rollup / cube — partial-aggregatable grouping sets (one shuffle, the
  grouping-set expansion happens map-side).
- semi / anti join — `left_semi` / `left_anti`, which Catalyst turns
  into broadcast or shuffled-hash *existence* joins (no payload
  duplication, unlike a join+distinct emulation).
- top-k — `orderBy().limit(k)` compiles to TakeOrderedAndProject:
  per-partition heaps + a k-row driver merge, no global sort.
- intersect / except — hash-based set ops (Spark rewrites to
  aggregates + semi/anti joins internally).
- frame-spec windows (running sum, lag, rank) — one shuffle on the
  partition key, streaming frame evaluation within each partition.
- count distinct — exact (Spark expands to a two-phase aggregate) and
  HyperLogLog++ `approx_count_distinct` (constant memory at any scale;
  sketch differs from DuckDB's, so that one gets the driver's
  rows-only check).

Money determinism follows plans/testdata.py: sums go through
DECIMAL(18,2) and come back as double on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.plans.registry import register
from de_project_sprint_etl_spark.plans.testdata import t

_DEC_SUM = "CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"


def _dsum(col: str) -> F.Column:
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")


@register(
    "rollup_revenue",
    f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       o_orderpriority,
       {_DEC_SUM.format(c='o_totalprice')} AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP(CAST(EXTRACT(year FROM o_orderdate) AS INT), o_orderpriority)
""",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP(year, priority): subtotal + grand-total rows in
    one shuffle (grouping-sets op; absent from the reference, §2.12)."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .rollup("o_year", "o_orderpriority")
        .agg(_dsum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "cube_status_priority",
    f"""
SELECT o_orderstatus, o_orderpriority,
       {_DEC_SUM.format(c='o_totalprice')} AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over status × priority (grouping-sets op)."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(_dsum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "grouping_sets_events",
    """
WITH e AS (SELECT event_type, CAST(EXTRACT(year FROM ts) AS INT) AS y,
                  value FROM events)
SELECT event_type, y,
       CAST(GROUPING(event_type, y) AS INT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM e
GROUP BY GROUPING SETS ((event_type), (y), (event_type, y), ())
""",
)
def q_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS over events (type / year / both / grand
    total) with ``grouping_id()`` disambiguating which set produced each
    row — the general form of rollup/cube (§2.12). One shuffle: Catalyst
    lowers the four sets to a single Expand + hash aggregate, so the
    map-side partial agg still applies at 100 TB. The gid bit order
    (first listed column = high bit) is verified against DuckDB's
    GROUPING(), which shares the convention."""
    from de_project_sprint_etl_spark.plans.testdata import events_df

    ev = events_df(spark, sf_dir).select(
        "event_type", F.year("ts").cast("int").alias("y"), "value"
    )
    return ev.groupingSets(
        [["event_type"], ["y"], ["event_type", "y"], []], "event_type", "y"
    ).agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        _dsum("value").alias("total_value"),
    )


@register(
    "semi_join_urgent_customers",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 urgent order — an existence
    join, so the probe side is never duplicated however many orders
    match (semi/anti joins absent from the reference, §2.12)."""
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join_no_urgent_customers",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no urgent orders (the non-empty
    complement of the semi join above — every customer has *some* order
    in the synthetic data, so anti-on-any-order would be a vacuous
    0-row check)."""
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "topk_customers_by_revenue",
    f"""
SELECT o_custkey, {_DEC_SUM.format(c='o_totalprice')} AS revenue
FROM orders
GROUP BY o_custkey
ORDER BY revenue DESC, o_custkey
LIMIT 10
""",
)
def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by order revenue. orderBy().limit() compiles to
    TakeOrderedAndProject — per-partition top-k heaps, k-row merge on
    the driver, no global sort (limit/top-k absent from the reference,
    §2.12). Tie-break on o_custkey keeps the cut deterministic."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(_dsum("o_totalprice").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .limit(10)
    )


_Y98 = "SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998"
_Y99 = "SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1999"


@register("set_intersect_customers", f"{_Y98}\nINTERSECT\n{_Y99}")
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1998 and 1999 (set ops other
    than UNION ALL absent from the reference, §2.12)."""
    orders = t(spark, sf_dir, "orders")
    by_year = lambda y: (  # noqa: E731
        orders.filter(F.year("o_orderdate") == y).select("o_custkey").distinct()
    )
    return by_year(1998).intersect(by_year(1999))


@register("set_except_customers", f"{_Y98}\nEXCEPT\n{_Y99}")
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers active in 1998 who churned out of 1999."""
    orders = t(spark, sf_dir, "orders")
    by_year = lambda y: (  # noqa: E731
        orders.filter(F.year("o_orderdate") == y).select("o_custkey").distinct()
    )
    return by_year(1998).subtract(by_year(1999))


@register(
    "window_frames_customer_orders",
    """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       LAG(o_totalprice) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       CAST(RANK() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank
FROM orders
""",
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows per customer: running spend (rowsBetween),
    lag, and rank — one shuffle on o_custkey, all three frames evaluated
    in the same partition pass (frame-spec windows / lag / rank absent
    from the reference, §2.7)."""
    orders = t(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice").over(seq).alias("prev_price"),
        F.rank()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                F.col("o_totalprice").desc(), F.col("o_orderkey")
            )
        )
        .cast("int")
        .alias("price_rank"),
    )


@register(
    "count_distinct_customers",
    """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per priority — Spark expands this to a
    two-phase aggregate (distinct-expand shuffle, then count), which is
    the exact-answer scale path (absent from the reference, §2.12)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "approx_count_distinct_customers",
    """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers_exact,
       COUNT(*) AS n_orders,
       TRUE AS within_bound
FROM orders
GROUP BY o_orderpriority
""",
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct customers per priority —
    constant sketch memory per group at any corpus size (the 100 TB
    answer when ±2% is acceptable). Spark's HLL++ sketch is not
    bit-compatible with DuckDB's HLL, so the raw estimate cannot be
    value-hashed across engines; instead the query emits the VERDICT:
    ``within_bound`` is true iff the sketch estimate lands within 5×rsd
    of the exact count (≥5σ — deterministic given Spark's deterministic
    sketch), and the oracle asserts TRUE. A drifting sketch now fails
    the hash check instead of sliding through a rows-only count."""
    rsd = 0.02
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=rsd).alias("approx"),
            F.count_distinct("o_custkey").alias("n_customers_exact"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            "n_customers_exact",
            "n_orders",
            (
                F.abs(F.col("approx") - F.col("n_customers_exact"))
                <= 5 * rsd * F.col("n_customers_exact")
            ).alias("within_bound"),
        )
    )


@register(
    "salted_join_revenue",
    f"""
SELECT o_orderstatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order status through a 16-way salted join
    (functions/skew.salted_join) — the explicit skew-mitigation path
    for a hot join key when the build side exceeds broadcast and AQE is
    unavailable. hot_threshold=6 exercises the production mode: only
    keys in the per-key-row-count tail (>6 lineitems, ~14% of orders
    on this data) are salted and spread over 16 buckets; the rest join
    unsalted with a single build copy — salting cost must track the
    actual skew tail, not the table (threshold 4 salted 43% of keys
    and doubled the query's bench time for zero distribution benefit).
    Row-identical to the plain join (the oracle IS the plain join), so
    the hash check proves salting changes the physical distribution
    and nothing else."""
    from de_project_sprint_etl_spark.functions.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(li, orders, on=["l_orderkey"], n_salts=16, hot_threshold=6)
    return joined.groupBy("o_orderstatus").agg(
        # decimal arithmetic BEFORE the product: a double product cast
        # to decimal rounds differently across engines at the cent level
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "asof_join_clicks_purchases",
    """
WITH clicks AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_ts_us
  FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, epoch_us(ts) AS purchase_ts_us,
         MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(ts))
SELECT c.user_id, c.click_id, c.click_ts_us,
       p.purchase_ts_us, p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.click_ts_us >= p.purchase_ts_us
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (functions/asof.py): each click event joined to the
    same user's most recent purchase at-or-before the click instant —
    the point-in-time lookup the reference's equi/range joins cannot
    express (§2.12). One key+ts sort shuffle, zero row explosion; the
    oracle is DuckDB's native ASOF LEFT JOIN, so the >=-tie and
    no-prior-row semantics are verified against an independent
    implementation. The build side is pre-aggregated per (user, ts) —
    the determinism contract both engines share."""
    from de_project_sprint_etl_spark.functions.asof import asof_join
    from de_project_sprint_etl_spark.plans.testdata import events_df

    ev = events_df(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_ts_us"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts_us").alias("purchase_ts_us"))
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        probe_ts="click_ts_us",
        build_ts="purchase_ts_us",
        build_cols=["purchase_value"],
    )
