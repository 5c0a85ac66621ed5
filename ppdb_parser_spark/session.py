"""SparkSession factory for the engine.

Single place where execution-relevant configuration lives so tests, bench
and the driver entry point all run with identical, scale-conscious settings:

- AQE on (runtime coalescing, skew-join splitting, SMJ->BHJ demotion) —
  SURVEY.md §4.2.
- Arrow on for every pandas-UDF boundary — SURVEY.md §2.11 U6.
- ``spark.sql.shuffle.partitions`` sized to cores for local runs; on a real
  cluster AQE coalescing makes the initial number mostly a ceiling.
- Session timezone pinned to UTC so timestamp semantics agree with the
  DuckDB oracle (naive-UTC timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def shuffle_width(spark: SparkSession) -> int:
    """Partition count for the engine's AQE-exempt keyed repartitions.

    The compute-heavy exchanges (band-join fan-out, SemDeDup dominance
    cells, prefix candidate join) pin an explicit partition count because a
    count-less keyed repartition is fair game for AQE coalescing, which
    sees a bytes-cheap exchange and folds it to one partition — serializing
    the expensive downstream work (measured 2× whole-query wall on the
    band join, 11.9 s vs 4.4 s on the prefix join; see call sites).

    Sessions built by :func:`get_spark` set ``spark.sql.shuffle.partitions``
    explicitly and that value is used verbatim. On a vanilla session (the
    external driver's, a notebook's) the key may be unset — fall back to
    ``sparkContext.defaultParallelism`` (total cores in local mode, total
    executor cores on a cluster) rather than inheriting Spark's global
    200 default, so the exchange still spreads across every core
    (VERDICT r12 item 3).
    """
    try:
        raw = spark.conf.get("spark.sql.shuffle.partitions", None)
    except Exception:
        raw = None
    if raw is not None:
        try:
            width = int(raw)
            if width > 0:
                return width
        except (TypeError, ValueError):
            pass
    return max(1, spark.sparkContext.defaultParallelism)


def get_spark(
    app_name: str = "ppdb-parser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    In local mode the driver JVM is the only process; ``local[N]`` threads
    stand in for executors. All plan-shape decisions (broadcast thresholds,
    AQE) are the same ones that apply on a 1000-executor cluster, so plans
    validated here transfer.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # keep catalog artifacts (bucketed tables) out of the repo root
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(repo_root, ".cache", "warehouse"),
        )
        # Shuffle/blockmgr scratch on repo-owned storage: round-4's bench
        # regression traced to a /tmp cleaner evicting temp_shuffle_* files
        # mid-run (verdict r4). A path we own cannot be raced by tmpwatch.
        .config("spark.local.dir", os.path.join(repo_root, ".cache", "scratch"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Read NTZ parquet timestamps as NTZ (matches DuckDB's naive TIMESTAMP).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # Spark 4 rejects parquet TIMESTAMP(NANOS) outright; read as raw
        # nanos-since-epoch longs and convert in the loader (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
