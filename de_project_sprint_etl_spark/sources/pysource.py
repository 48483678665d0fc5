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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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
        everything else is returned for Spark to re-apply. The filter
        list is a CONJUNCTION, so multiple shard equalities INTERSECT —
        two distinct values prune to the empty partition set (Catalyst
        normally folds contradictions first, but the source contract
        must not depend on that)."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("shard",)
                and isinstance(f.value, int)
            ):
                if self.wanted_shards is None:
                    self.wanted_shards = {f.value}
                else:
                    self.wanted_shards &= {f.value}
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

    def simpleStreamReader(self, schema: StructType):
        return GraftGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the `graftgen` format. Python-source
    filter pushdown ships disabled by default (Spark 4.1) — enable it,
    as partition pruning is the point of implementing `pushFilters`."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GraftGenDataSource)
    spark.dataSource.register(GraftSinkDataSource)


# --- write side: JSONL-shard sink with two-phase commit ----------------------


@dataclass
class _SinkCommit(WriterCommitMessage):
    temp_path: str
    rows: int


class GraftSinkWriter(DataSourceWriter):
    """Per-task JSONL writer with the two-phase commit the API is built
    around: each task streams its partition to a temp file and returns a
    commit message; the DRIVER promotes temps to final names and writes
    a `_MANIFEST` only if every task succeeded (failed jobs leave no
    visible output — the custom-sink analog of the `_SUCCESS` marker)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("graftsink requires a 'path' option")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str, sort_keys=True))
                f.write("\n")
                n += 1
        return _SinkCommit(temp_path=tmp, rows=n)

    def commit(self, messages):
        import json
        import os
        import uuid

        prior_rows = 0
        if self.overwrite:
            # clear the PREVIOUS job's visible output before promoting —
            # without this a smaller overwrite leaves stale part files
            # mixed in and the two-phase-commit guarantee is void
            for f in os.listdir(self.path):
                if f.startswith("part-") or f == "_MANIFEST":
                    os.remove(os.path.join(self.path, f))
        else:
            mf = os.path.join(self.path, "_MANIFEST")
            if os.path.exists(mf):
                prior_rows = json.load(open(mf))["rows"]
        # append mode: unique suffixes so part names never collide with
        # an earlier job's files
        run = uuid.uuid4().hex[:8]
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            name = (
                f"part-{i:05d}.jsonl"
                if self.overwrite
                else f"part-{run}-{i:05d}.jsonl"
            )
            os.replace(m.temp_path, os.path.join(self.path, name))
            total += m.rows
        with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
            json.dump({"rows": prior_rows + total, "parts": len(messages)}, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class GraftSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "graftsink"

    def writer(self, schema: StructType, overwrite: bool) -> GraftSinkWriter:
        return GraftSinkWriter(self.options, overwrite)


# --- streaming read side: deterministic micro-batch generator ----------------


class GraftGenStreamReader(SimpleDataSourceStreamReader):
    """Deterministic micro-batch stream over the same integer row model:
    offsets are plain `{"k": n}` dicts, each batch emits the next
    `batchsize` global indices until `maxrows`, then empty batches —
    replayable from any offset (`readBetweenOffsets`), which is what
    gives a custom source exactly-once semantics under checkpoint
    recovery."""

    def __init__(self, options):
        self.batch = int(options.get("batchsize", "1000"))
        self.max_rows = int(options.get("maxrows", "5000"))
        self.n_users = int(options.get("users", "1000"))

    def initialOffset(self):
        return {"k": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST, not a generator: the runner pickles and caches the
        # prefetched batch so readBetweenOffsets can replay it
        return [
            (0, k, (k * A_USER) % self.n_users, (k * A_CENTS) % 100000)
            for k in range(lo, hi)
        ]

    def read(self, start):
        lo = start["k"]
        hi = min(lo + self.batch, self.max_rows)
        return self._rows(lo, hi), {"k": hi}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["k"], end["k"])


def graftgen_stream(spark, batchsize: int = 1000, maxrows: int = 5000):
    register(spark)
    return (
        spark.readStream.format("graftgen")
        .option("batchsize", str(batchsize))
        .option("maxrows", str(maxrows))
        .load()
    )
