"""Custom Spark 4 Python Data Source: a deterministic synthetic-corpus
generator (``format("synthetic_docs")``).

The reference ingests whatever pandas can read; Spark 4's Python Data
Source API (SPARK-44076) is the idiomatic extension point for sources
Spark lacks a connector for — here a seeded document generator used for
load tests and pipeline dry-runs without touching real data. Design
points that matter at scale:

- **Partition-parallel**: ``partitions()`` splits the row range into
  ``n_partitions`` independent slices; each executor generates ONLY its
  slice (no driver materialization, no shuffle).
- **Deterministic**: every row is a pure function of (seed, row id) via
  a splitmix64-style hash — the same (seed, n_rows) always yields the
  same corpus on any partitioning, so tests can assert exact content.
- **Filter pushdown-friendly**: generation is lazy per partition;
  Catalyst prunes columns after the fact (generation cost is trivial
  next to I/O it replaces).

Registered lazily: ``register_synthetic_docs(spark)`` (idempotent).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window join small big the a query stream group column data "
    "customer order"
).split()
_LANGS = ["en", "de", "es", "fr", "zh"]
_SOURCES = [f"src_{i:02d}" for i in range(8)]

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", IntegerType()),
    ]
)


def _mix64(x: int) -> int:
    """splitmix64 finalizer — deterministic 64-bit hash of the row id."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row(seed: int, i: int) -> tuple:
    h = _mix64(seed * 0x5851F42D4C957F2D + i)
    n_words = 10 + h % 90
    words = []
    w = h
    for _ in range(n_words):
        w = _mix64(w)
        words.append(_WORDS[w % len(_WORDS)])
    text = " ".join(words)
    return (
        i,
        text,
        _LANGS[(h >> 8) % len(_LANGS)],
        _SOURCES[(h >> 16) % len(_SOURCES)],
        len(text),
    )


class _Slice(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed = seed
        self.start = start
        self.end = end


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        if self.n_rows <= 0:
            # n_rows=0 would make step 0 and range() raise before the
            # empty-list fallback could apply (ADVICE r4)
            return [_Slice(self.seed, 0, 0)]
        n = max(1, min(self.n_partitions, self.n_rows))
        step = -(-self.n_rows // n)
        return [
            _Slice(self.seed, lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)


class _SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Bounded micro-batch generator: each trigger emits the next
    ``rows_per_batch`` ids until ``max_rows``; offsets are plain row
    positions, so replay between checkpointed offsets is exact (the
    same determinism contract as the batch reader). The *simple* stream
    API generates on the driver — appropriate for a test/rate-style
    source; a partition-parallel DataSourceStreamReader is the upgrade
    path for real volume."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = start["offset"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter([_row(self.seed, i) for i in range(lo, hi)]), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_row(self.seed, i) for i in range(start["offset"], end["offset"])]
        )


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n_rows", N).load()``
    (batch) or ``spark.readStream.format("synthetic_docs")`` (bounded
    micro-batch stream)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SyntheticDocsStreamReader(self.options)


def register_synthetic_docs(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)
