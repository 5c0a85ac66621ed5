"""Shuffle-volume comparison: pair×shingle-stream Jaccard vs bitmap
(packed-fingerprint) Jaccard (round-1 verdict #10).

Runs each variant in its own SparkSession (isolating stage metrics), sums
shuffle write bytes across all stages from the AppStatusStore, verifies
both variants return the identical pair set, and prints a table. Result is
recorded in BASELINE.md §Bitmap Jaccard.

Usage: python tools/jaccard_shuffle_compare.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def total_shuffle_bytes(sc) -> tuple[int, int]:
    store = sc._jsc.sc().statusStore()
    gw, jvm = sc._gateway, sc._jvm
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    it = stages.iterator()
    w = r = 0
    while it.hasNext():
        s = it.next()
        w += s.shuffleWriteBytes()
        r += s.shuffleReadBytes()
    return w, r


def run(variant: str, sf_dir: str, cap: int | None):
    from pyspark.sql import SparkSession

    from ppdb_parser_spark.operators import dedup as DD
    from ppdb_parser_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"jaccard-{variant}")
        .config("spark.sql.shuffle.partitions", "8")
        # effective only for the first session of the python process (the
        # JVM is reused afterwards) — every variant shares the same heap
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        docs = load_table(spark, sf_dir, "documents")
        if variant == "prefix":
            mk = lambda: DD.jaccard_pairs_prefix(docs, threshold=0.5, n=2)
        elif variant == "minhash":
            mk = lambda: DD.minhash_match(docs, threshold=0.3)
        elif variant == "winnow":
            mk = lambda: DD.winnow_match(docs)
        else:
            fn = DD.jaccard_pairs if variant == "stream" else DD.jaccard_pairs_bitmap
            mk = lambda: fn(docs, threshold=0.5, n=2, max_doc_freq=cap)
        mk().count()  # warm
        t0 = time.perf_counter()
        rows = mk().collect()
        dt = time.perf_counter() - t0
        w, r = total_shuffle_bytes(spark.sparkContext)
        pairs = sorted(
            (x[0], x[1]) for x in ((r2_["id_a"], r2_["id_b"])
                                   if "id_a" in r2_.__fields__
                                   else (r2_["doc_a"], r2_["doc_b"])
                                   for r2_ in rows)
        )
        return pairs, dt, w, r
    finally:
        spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    p1, t1, w1, r1 = run("stream", sf_dir, cap)
    p2, t2, w2, r2 = run("bitmap", sf_dir, cap)
    assert p1 == p2, f"pair sets differ: {len(p1)} vs {len(p2)}"
    print(f"capped (df<={cap}) pairs: {len(p1)} (identical)")
    print(f"  stream: {t1:6.2f}s  shuffle write {w1/1e6:8.1f} MB (2 runs incl. warm)")
    print(f"  bitmap: {t2:6.2f}s  shuffle write {w2/1e6:8.1f} MB (2 runs incl. warm)")
    print(f"  shuffle-bytes ratio bitmap/stream: {w2/max(w1,1):.2f}")
    p3, t3, w3, r3 = run("prefix", sf_dir, None)
    print(f"UNCAPPED exact prefix-filter join: {len(p3)} pairs, "
          f"{t3:.2f}s, shuffle write {w3/1e6:.1f} MB "
          f"(stream/bitmap cannot run uncapped at this sf)")
    p4, t4, w4, r4 = run("minhash", sf_dir, None)
    print(f"minhash_match (J>=0.3, approx candidates + exact refine): "
          f"{len(p4)} pairs, {t4:.2f}s, shuffle write {w4/1e6:.1f} MB")
    p5, t5, w5, r5 = run("winnow", sf_dir, None)
    print(f"winnow_match (fingerprint overlap, different pair semantics): "
          f"{len(p5)} pairs, {t5:.2f}s, shuffle write {w5/1e6:.1f} MB")


if __name__ == "__main__":
    main()
