"""Structured Streaming operators over the events stream (SURVEY.md §2.10).

Batch/stream parity design (§3.4): the windowed aggregations are built by
functions that take *any* events DataFrame — the same code path serves the
batch twin (oracle-checkable) and the streaming run, so the driver's hash
check on the batch twin certifies the logical plan the stream runs.

Local test harness: file streaming source over the events parquet,
``trigger(availableNow=True)`` + memory sink, drained synchronously. On a
real deployment the source swaps for Kafka/file-drop directories and the
sink for ``foreachBatch`` → parquet; state lives in RocksDB state stores
and watermarks bound it (T4/T5).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import ensure_session_confs, table_path

#: TZ-independent epoch-µs for NTZ timestamps (same construct as windows.py).
def _epoch_us(col: str):
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
    )


def _stream_dir(sf_dir: str) -> str:
    """The file streaming source requires a *directory*; expose the events
    parquet file through a symlink dir under .cache (idempotent).

    Keyed by a hash of the ABSOLUTE source path (two different sf_dirs with
    the same basename must not collide), and re-linked via lexists (a
    dangling symlink from a regenerated fixture must not wedge the cache).
    """
    import hashlib
    import os

    from ..sources.ppdb_pack import pack_dir

    target = os.path.abspath(table_path(sf_dir, "events"))
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    key = hashlib.md5(target.encode()).hexdigest()[:8]
    d = os.path.join(
        os.path.dirname(pack_dir()), f"events_stream_{sf_tag}_{key}"
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if os.path.lexists(link) and os.readlink(link) != target:
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(target, link)
    return d


def events_stream(
    spark: SparkSession, sf_dir: str, tz_typed: bool = False
) -> DataFrame:
    """S7: the events table as an unbounded stream (file source).

    ``tz_typed=False`` yields a µs TIMESTAMP_NTZ ``ts`` (matches the batch
    loader — use for aggregations without watermarks). ``tz_typed=True``
    yields a TIMESTAMP ``ts``: Spark's event-time watermark machinery
    requires the TZ-typed flavor; downstream outputs must then use
    ``unix_micros`` (instant-based, timezone-independent).
    """
    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(_stream_dir(sf_dir))
    )
    if dict((f.name, f.dataType.simpleString()) for f in raw_schema.fields).get("ts") == "bigint":
        conv = (
            "timestamp_micros(ts div 1000)"
            if tz_typed
            else "timestampadd(MICROSECOND, ts div 1000,"
            " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        )
        stream = stream.withColumn("ts", F.expr(conv))
    elif tz_typed:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_agg(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """T1: tumbling-window counts + cents-exact sums per event_type.
    Works identically on batch and streaming inputs."""
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "sum_value"
            ),
        )
        .select(
            _epoch_us("window.start").alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """T2: sliding (overlapping) windows — each event lands in
    width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            _epoch_us("window.start").alias("window_start_us"),
            "event_type",
            "n_events",
        )
    )


def session_agg_stream(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """T3 (stream form): gap-based session windows per user. Requires a
    tz_typed=True stream (watermarks demand TIMESTAMP event time)."""
    return (
        events.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "sum_value"
            ),
        )
        .select(
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_table(result: DataFrame, output_mode: str) -> DataFrame:
    """Drain a streaming DataFrame synchronously (availableNow) into a
    memory sink; returns the materialized result as a batch DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return result.sparkSession.table(name)
