"""SparkSession factory with scale-oriented defaults.

The reference delegates all execution to PostgreSQL (reference
``src/dags/ETL_logs_inc.py:327-432`` hands SQL strings to PostgresOperator);
our engine delegates to Catalyst/Tungsten, so the only "physical" knobs we
own are session configs: AQE, shuffle partitioning, broadcast threshold.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "de-project-sprint-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults target the test rig (local[N], N=SPARK_GRAFT_CPUS) but every
    setting is the one we would ship on a real cluster: AQE on (runtime
    shuffle coalescing + skew-join splitting), a generous broadcast
    threshold for star-schema dims, Arrow for any pandas exchange.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local-mode driver hosts all executor threads; default 1g heap
        # OOMs on cached shuffles at sf0.1 (rig has 128 GiB)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # ~120 distinct queries x (warm + timed) whole-stage-codegen
        # overflow the JVM's default 240 MB code cache; eviction then
        # forces re-JIT of hot generated methods mid-session (measured:
        # the widest codegen query spiking 2.2 s -> 17 s late in a
        # bench run). 512 MB held the 97-query suite; re-sized to 768 MB
        # when the suite grew to 119 (the iterative ops added since —
        # GD linreg, grouped k-means/PQ, DSIR — are codegen-widest and
        # showed 2-4x run-to-run swings at 512 MB); 1 GB for the
        # 281-query suite with the larger generated-class cache below.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        # Generated-class cache (static conf, default 100 entries): the
        # 281-query registry floods a 100-entry cache many times over
        # within ONE pass, so every re-execution Janino-recompiles and
        # HotSpot re-JITs each query's generated stages from scratch.
        # Measured (r11 optimization pass, CompilationMXBean): JIT time
        # was ~90% of scd2_weeks_overlap's process CPU, 20-27 s of
        # compiler CPU per re-run at 100 entries vs 10-17 s at 10000;
        # query results are unaffected (pure compilation memoization).
        # This is a long-lived-session setting, not a bench trick: a
        # real cluster session running a large query mix re-JITs the
        # same way (same discipline as the prepared-plan cache in
        # plans/registry.py).
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of our config to a session we did
    not create (the verification driver owns its own SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
