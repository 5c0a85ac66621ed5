"""Text / gzip sources (SURVEY.md §2.1 S1, S3).

Gzip is decoded transparently by Spark's codec layer but is NOT splittable:
one ``.gz`` file maps to exactly one task. The scale discipline is therefore
(a) packs must ship as many shards (``ppdb_pack.ensure_pack`` writes one
file per shard) and (b) the first thing a 100 TB ingest does is parse →
write partitioned parquet (S5) so every later query reads a splittable,
column-pruned format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import ensure_session_confs


def read_text_lines(spark: SparkSession, path_glob: str) -> DataFrame:
    """S1: line-per-row text scan (gzip/zstd/bzip2 decoded by extension).

    A trailing single-level glob (e.g. ``dir/*.txt.gz``) is rewritten to
    the DIRECTORY path plus a ``pathGlobFilter`` option: same file set
    (bookkeeping files like ``_SUCCESS`` still excluded), but the path
    handed to the reader is a plain directory — Spark's FileStreamSink
    metadata probe logs a spurious WARN stack trace when given a glob
    path, and a clean log tail is worth keeping so real errors stay
    visible.
    """
    ensure_session_confs(spark)
    head, _, tail = path_glob.rpartition("/")
    if head and any(c in tail for c in "*?[") and not any(
        c in head for c in "*?["
    ):
        return spark.read.option("pathGlobFilter", tail).text(head)
    return spark.read.text(path_glob)


def reshard_to_parquet(
    lines_or_parsed: DataFrame, out_path: str, num_partitions: int | None = None
) -> None:
    """S5 companion for S1 (SURVEY.md §4.3): burn the non-splittable gzip
    cost exactly once, emitting splittable parquet for all later queries."""
    df = lines_or_parsed
    if num_partitions:
        df = df.repartition(num_partitions)
    df.write.mode("overwrite").parquet(out_path)
