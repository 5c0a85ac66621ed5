"""Batch table sources over the driver's parquet fixtures (SURVEY.md §2.1 S2/S6).

At 100 TB these reads are partition-pruned, column-pruned parquet scans; the
only contract here is *schema stability* and *not materializing anything* —
every loader returns a lazy DataFrame whose filters/projections Catalyst
pushes into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_session_confs(spark: SparkSession) -> None:
    """Defensive runtime confs: query callables receive the *driver's*
    SparkSession, not one built by our factory, so anything semantically
    load-bearing must be settable here at runtime.

    - ``nanosAsLong``: Spark 4 otherwise refuses parquet TIMESTAMP(NANOS)
      (events.ts).
    - UTC session timezone: keeps any TimestampType round-trip aligned with
      the DuckDB oracle's naive-UTC timestamps (NTZ paths are TZ-independent
      by construction, this is belt-and-braces for TZ-typed intermediates).
    """
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # P6 contract: a malformed line (duplicate feature keys, doubled
        # separators producing empty-string keys) must never crash the
        # parse job — ANSI default EXCEPTION would.
        ("spark.sql.mapKeyDedupPolicy", "LAST_WIN"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by the host
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan — pushdown-friendly.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark 4 cannot
    map to a timestamp type; with ``spark.sql.legacy.parquet.nanosAsLong`` it
    arrives as a nanos-since-epoch long and is converted here to a µs
    ``timestamp_ntz`` — the same truncation DuckDB's ``CAST(ts AS TIMESTAMP)``
    applies, so both engines see identical values. The conversion goes through
    ``timestampadd`` on an NTZ literal, which is timezone-independent (no
    dependency on the session timezone of the caller's SparkSession).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
            ),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """S6: make every fixture table SQL-addressable under its bare name."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
