"""16x scale-up smoke for the round-2 families (the 100x-claim evidence,
same methodology as the round-1 flagship smoke recorded in BASELINE.md):
feed key-shifted unions of the sf0.1 tables through the IDENTICAL plans
the registered queries use, and compare wall-clock + plan shape.

- events 16x (event_id-shifted, same time span): gap-fill/LOCF grid stays
  3600 slots with 16x rows per slot — tests that the aggregate absorbs the
  growth and the window input stays bounded by the grid, not the data.
- documents 16x (doc_id-shifted, text unchanged): every document gains 16
  exact copies — the curation pipeline's cheap content-hash stage must
  collapse them BEFORE the expensive near-dup join, so the Jaccard stage
  sees the same ~2.3k survivors as 1x and total time grows far sub-16x.

Run: ``python tools/scaleup_smoke.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(label: str, df) -> float:
    df.count()  # warm
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f} s ({n} rows)")
    return dt


def main() -> None:
    from ppdb_parser_spark.queries.pipeline import curate_documents
    from ppdb_parser_spark.queries.timeseries import filled_hourly_frame
    from ppdb_parser_spark.session import get_spark
    from ppdb_parser_spark.sources.tables import load_table

    spark = get_spark(app_name="scaleup-smoke")
    sf = "/root/testdata/sf0.1"
    k = 16

    ev = load_table(spark, sf, "events")
    ev16 = ev
    for i in range(1, k):
        ev16 = ev16.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        )
    docs = load_table(spark, sf, "documents")
    docs16 = docs
    for i in range(1, k):
        docs16 = docs16.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )

    print(f"events 1x={ev.count()} {k}x={ev16.count()}; "
          f"documents 1x={docs.count()} {k}x={docs16.count()}")

    def gapfill(frame):
        filled = filled_hourly_frame(frame)
        return filled.select(
            "event_type", "h",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )

    t1 = timed("gapfill 1x", gapfill(ev))
    t16 = timed(f"gapfill {k}x", gapfill(ev16))
    print(f"  -> {t16 / t1:.1f}x time for {k}x data")

    c1 = timed("curation 1x", curate_documents(docs))
    c16 = timed(f"curation {k}x", curate_documents(docs16))
    print(f"  -> {c16 / c1:.1f}x time for {k}x data "
          "(content-hash dedup collapses the copies pre-Jaccard)")


if __name__ == "__main__":
    main()
