"""LLM-data-pipeline functions (the BASELINE.json "north_star" extension
surface beyond the reference's SQL inventory): text analysis, document
deduplication, embedding similarity search, multimodal plumbing.

Everything here is built from JVM-side pyspark.sql.functions (no Python
row UDFs in any hot path); the only Python-side compute is the
multimodal decode stub, which is Arrow-batched via mapInPandas.
"""
