"""Explicit StructType schemas (SURVEY.md §1.4).

The reference declares fixed DDL schemas and recreates them every run
(reference ``src/dags/sql/staging.create_user_order_log.sql:1-16``,
``create_stage_inc_tables.sql:1-39``). We mirror those contracts as
StructTypes — production reads never infer.

Postgres -> Spark type mapping (SURVEY.md §1.3): serial -> long (generated
by row_number / monotonically_increasing_id), integer -> int,
BIGINT -> long, numeric(14,2) -> decimal(14,2), varchar/text -> string,
TIMESTAMP -> timestamp.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- staging layer (reference src/dags/sql/staging.create_*.sql) -----------

# reference staging.create_user_order_log.sql:2-16
USER_ORDER_LOG = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("uniq_id", T.StringType()),
        T.StructField("date_time", T.TimestampType()),
        T.StructField("city_id", T.IntegerType()),
        T.StructField("city_name", T.StringType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("item_id", T.IntegerType()),
        T.StructField("item_name", T.StringType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("payment_amount", T.DecimalType(14, 2)),
    ]
)

# reference create_stage_inc_tables.sql:13-28 (snapshot schema + status)
USER_ORDER_LOG_INC = T.StructType(
    USER_ORDER_LOG.fields + [T.StructField("status", T.StringType())]
)

# reference staging.create_user_activity_log.sql:2-10
USER_ACTIVITY_LOG = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("uniq_id", T.StringType()),
        T.StructField("date_time", T.TimestampType()),
        T.StructField("action_id", T.LongType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("quantity", T.LongType()),
    ]
)

# reference staging.create_customer_research.sql:2-10
CUSTOMER_RESEARCH = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("date_id", T.TimestampType()),
        T.StructField("category_id", T.IntegerType()),
        T.StructField("geo_id", T.IntegerType()),
        T.StructField("sales_qty", T.IntegerType()),
        T.StructField("sales_amt", T.DecimalType(14, 2)),
    ]
)

# reference ETL_logs_inc.py:126,131 — headerless CSV, names given in code
PRICE_LOG = T.StructType(
    [
        T.StructField("prod_name", T.StringType()),
        T.StructField("price", T.IntegerType()),
    ]
)

# --- mart layer (inferred from inserts; SURVEY.md §1.4) --------------------

# reference update_mart_d_tables.sql:4-15
D_CALENDAR = T.StructType(
    [
        T.StructField("date_id", T.LongType()),
        T.StructField("fact_date", T.DateType()),
        T.StructField("day_num", T.IntegerType()),
        T.StructField("month_num", T.IntegerType()),
        T.StructField("month_name", T.StringType()),
        T.StructField("year_num", T.IntegerType()),
    ]
)

# reference date_periods.sql:5-15
D_CALENDAR_WEEKS = T.StructType(
    [
        T.StructField("start_date", T.DateType()),
        T.StructField("end_date", T.DateType()),
        T.StructField("period", T.LongType()),
    ]
)

# reference creating_retention.sql:2-13
F_CUSTOMER_RETENTION = T.StructType(
    [
        T.StructField("new_customers_count", T.IntegerType()),
        T.StructField("returning_customers_count", T.IntegerType()),
        T.StructField("refunded_customer_count", T.IntegerType()),
        T.StructField("period_name", T.StringType()),
        T.StructField("period_id", T.IntegerType()),
        T.StructField("item_id_new_cust", T.IntegerType()),
        T.StructField("item_id_returned_cust", T.IntegerType()),
        T.StructField("item_id_refunded_cust", T.IntegerType()),
        T.StructField("new_customers_revenue", T.LongType()),
        T.StructField("returning_customers_revenue", T.LongType()),
        T.StructField("customers_refunded", T.IntegerType()),
    ]
)

# --- testdata tables (TESTDATA.md; read-only parquet, schema fixed) --------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
