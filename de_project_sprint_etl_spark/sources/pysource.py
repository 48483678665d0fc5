"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic event-log generator with partition pruning
via `pushFilters`.

Why this exists: a 100 TB training pipeline ingests from systems that
have no built-in Spark connector (internal feeds, RPC-backed stores,
procedural generators for load tests). The Python DataSource API is
the sanctioned extension point — each `InputPartition` is read
independently on executors (full parallelism, no driver funnel), and
`pushFilters` lets the source drop whole partitions before any data
is generated (the Python-source analog of parquet partition pruning).

Everything is integer arithmetic on the global row index, so a SQL
oracle can reproduce the stream exactly from `generate_series` —
the source is inside the DuckDB correctness gate like every other op.

Row model (shard = partition id, i = row within shard):
    k        = shard * rows_per_shard + i        (global index)
    user_id  = (k * 2654435761) % n_users
    cents    = (k * 1315423911) % 100000
All products stay far below 2**63 for any plausible size, so the
arithmetic is overflow-free in Spark longs and DuckDB BIGINTs alike.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import StructType

A_USER = 2654435761
A_CENTS = 1315423911

GEN_SCHEMA = "shard int, event_id long, user_id long, cents long"


class _Shard(InputPartition):
    def __init__(self, shard: int, rows: int, n_users: int):
        self.shard = shard
        self.rows = rows
        self.n_users = n_users


class GraftGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_shards = int(options.get("shards", "8"))
        self.rows = int(options.get("rowspershard", "12500"))
        self.n_users = int(options.get("users", "1000"))
        self.wanted_shards: set[int] | None = None

    def pushFilters(self, filters):
        """Accept `shard = <k>` equality filters (partition pruning);
        everything else is returned for Spark to re-apply."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("shard",)
                and isinstance(f.value, int)
            ):
                if self.wanted_shards is None:
                    self.wanted_shards = set()
                self.wanted_shards.add(f.value)
            else:
                yield f

    def partitions(self):
        shards = range(self.n_shards)
        if self.wanted_shards is not None:
            shards = [s for s in shards if s in self.wanted_shards]
        return [_Shard(s, self.rows, self.n_users) for s in shards]

    def read(self, partition: _Shard):
        base = partition.shard * partition.rows
        for i in range(partition.rows):
            k = base + i
            yield (
                partition.shard,
                k,
                (k * A_USER) % partition.n_users,
                (k * A_CENTS) % 100000,
            )


class GraftGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "graftgen"

    def schema(self) -> str:
        return GEN_SCHEMA

    def reader(self, schema: StructType) -> GraftGenReader:
        return GraftGenReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the `graftgen` format. Python-source
    filter pushdown ships disabled by default (Spark 4.1) — enable it,
    as partition pruning is the point of implementing `pushFilters`."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GraftGenDataSource)
