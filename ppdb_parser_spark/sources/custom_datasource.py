"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a "ppdbpack" format that reads gzip PPDB pack shards as a first-class
``spark.read.format(...)`` connector.

This is the extensibility story for sources Spark has no built-in reader
for: one ``InputPartition`` per shard file (so shard count = scan
parallelism, the same contract the built-in text reader gives gzip), rows
produced lazily per partition on the executors — the driver only lists
files. The connector is registered per-session via
``spark.dataSource.register`` (idempotent).

At 100 TB the identical class works unchanged: partitions() returns one
entry per shard regardless of count, nothing is materialized on the
driver, and each executor decompresses only its own shard.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PPDBPackDataSource(DataSource):
    """``spark.read.format("ppdbpack").option("path", dir)`` →
    (shard string, value string) — one row per text line."""

    @classmethod
    def name(cls) -> str:
        return "ppdbpack"

    def schema(self) -> str:
        return "shard string, value string"

    def reader(self, schema) -> "PPDBPackReader":
        return PPDBPackReader(self.options)


class PPDBPackReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("ppdbpack requires .option('path', <pack dir>)")
        self._path = path

    def partitions(self):
        shards = sorted(glob.glob(os.path.join(self._path, "*.txt.gz")))
        if not shards:
            raise FileNotFoundError(f"no *.txt.gz shards under {self._path}")
        return [InputPartition(s) for s in shards]

    def read(self, partition):
        import gzip

        shard = os.path.basename(partition.value)
        with gzip.open(partition.value, "rt", encoding="utf-8") as fh:
            for line in fh:
                yield (shard, line.rstrip("\n"))


def register(spark) -> None:
    """Idempotent per-session registration: re-registering the same name
    is a WARN-and-replace in Spark 4 (verified), never an error — so any
    exception here is a genuine failure (e.g. Spark < 4 lacking the Python
    DataSource API) and must propagate, not read as 'already registered'."""
    spark.dataSource.register(PPDBPackDataSource)
