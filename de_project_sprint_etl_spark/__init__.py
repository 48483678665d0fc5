"""de_project_sprint_etl_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the computational capabilities of the
reference repo ``MatthewS-M/de-project-sprint-ETL`` (an Airflow + pandas +
PostgreSQL incremental retention-mart ETL), re-expressed Spark-first:

- every relational operator the reference's SQL uses (scans, filters,
  projections, equi/range/full joins, two-level aggregations, HAVING
  cohorts, DISTINCT ON, window row numbering, date scalar functions,
  snapshot-vs-increment merge) lives in ``operators/`` as pure
  ``DataFrame -> DataFrame`` functions;
- the reference's pipeline lifecycle (staging -> dims -> facts ->
  retention marts) lives in ``plans/pipeline.py``;
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal column plumbing) live in ``operators/`` as first-class ops.

Design notes are in SURVEY.md at the repo root. All operators are written
for the DataFrame API so Catalyst/Tungsten choose physical plans; they are
designed for multi-executor clusters (broadcast small dims, avoid global
windows on big data, keep expressions in whole-stage codegen) even though
tests run on local mode.
"""

__version__ = "0.1.0"
