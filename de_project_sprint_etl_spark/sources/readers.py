"""Source connectors (SURVEY.md §2.1).

The reference ingests CSV over HTTPS into Postgres via pandas + chunked
INSERTs (reference ``src/dags/ETL_logs_inc.py:121-199``). Spark reads the
same formats natively and in parallel, including object storage URIs
(``s3a://``), so the download/chunk machinery collapses into
``spark.read``. Schemas are always explicit (never inferred) in
production paths — reference behavior of ``pd.read_csv`` dtype inference
is reproduced only as an opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from de_project_sprint_etl_spark.schemas import TESTDATA_TABLES


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV with header (reference S5, ``ETL_logs_inc.py:150`` et al.)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_headerless_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Headerless CSV with caller-supplied column names (reference S6,
    ``ETL_logs_inc.py:126`` — ``names=['prod_name','price']``)."""
    return spark.read.schema(schema).option("header", "false").csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every TESTDATA.md table from ``sf_dir`` as a DataFrame.

    Reads are lazy; Catalyst prunes columns and pushes filters into each
    parquet scan, so loading the full dict costs nothing until an action.
    """
    return {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for name in TESTDATA_TABLES
    }


def read_jsonl_permissive(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """NDJSON ingest that SURVIVES bad records: PERMISSIVE mode parses
    what it can, NULL-fills unparseable fields, and captures each bad
    line verbatim in ``corrupt_col`` — at web-crawl scale some fraction
    of every drop is malformed, and FAILFAST (die) or DROPMALFORMED
    (silently lose data) are both wrong for a pipeline that must
    account for every input byte. Callers split on
    ``col(corrupt_col).isNull()`` into clean rows and a quarantine
    sink. The corrupt column must be declared in the schema (Spark
    only populates a declared column)."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if corrupt_col not in schema.fieldNames():
        schema = schema.add(corrupt_col, T.StringType())
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
