"""Z-order data-skipping measurement (round-7, VERDICT r6 item 6): turn
the per-bucket span audit into an actual row-groups-read number.

Writes the sf0.1 lineitem keys in three physical layouts —

- ``natural``   : input order (no clustering),
- ``sorted_ka`` : globally sorted by the first key only (the classic
  single-column sort: perfect skipping on ka, none on kb),
- ``zorder``    : globally sorted by the 32-bit Morton interleave of
  (ka, kb) — the multi-dimensional clustering layout,

each with small parquet row groups (1 MiB) so skipping granularity is
realistic, then evaluates point and range predicates on EACH key against
the parquet footer min/max statistics — exactly the stats Spark's parquet
reader (and any lakehouse skipping index) prunes row groups with. A row
group is "read" iff [min, max] of the predicate column intersects the
predicate. Prints one JSON line per (layout, predicate) with the skip
ratio; results are recorded in BASELINE.md.

Run: ``python tools/zorder_skip.py``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OUT = "/tmp/zorder_skip"


def rowgroup_stats(path_glob: str, cols: tuple[str, ...]):
    """(min, max) per row group per column, straight from the footers."""
    import pyarrow.parquet as pq

    groups = []
    for path in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = {}
            for c in cols:
                s = g.column(idx[c]).statistics
                st[c] = (s.min, s.max)
            st["n_rows"] = g.num_rows
            groups.append(st)
    return groups


def read_fraction(groups, col: str, lo: int, hi: int):
    """Fraction of row groups whose [min,max] intersects [lo, hi]."""
    hit = sum(1 for g in groups if g[col][0] <= hi and g[col][1] >= lo)
    return hit, len(groups)


def main() -> None:
    from ppdb_parser_spark.queries.sources_io import _z_spark
    from ppdb_parser_spark.session import get_spark
    from ppdb_parser_spark.sources.tables import load_table

    spark = get_spark(app_name="zorder-skip")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = load_table(spark, sf, "lineitem")
    ka = F.col("l_orderkey").bitwiseAND(F.lit(65535))
    kb = F.col("l_partkey").bitwiseAND(F.lit(65535))
    keys = li.select(
        ka.alias("ka"), kb.alias("kb"), _z_spark(ka, kb).alias("zkey")
    )

    shutil.rmtree(OUT, ignore_errors=True)
    layouts = {
        "natural": keys,
        "sorted_ka": keys.orderBy("ka"),
        "zorder": keys.orderBy("zkey"),
    }
    for name, df in layouts.items():
        (
            df.coalesce(4)
            .write.option("parquet.block.size", 128 << 10)
            .mode("overwrite")
            .parquet(f"{OUT}/{name}")
        )

    # predicates inside both actual key domains (ka spans the full 16-bit
    # range via the orderkey wrap; kb = partkey & 0xffff tops out at the
    # part count, 20000 at sf0.1): 64-wide points, 4096-wide ranges on
    # each key, and the 2-D box conjunction — the query shape z-ordering
    # exists for (single-key sorts bound ONE key's span per row group).
    preds = [
        ("ka_point", [("ka", 9000, 9063)]),
        ("kb_point", [("kb", 9000, 9063)]),
        ("ka_range", [("ka", 8192, 12287)]),
        ("kb_range", [("kb", 8192, 12287)]),
        ("box_both", [("ka", 8192, 12287), ("kb", 8192, 12287)]),
    ]
    results = []
    for name in layouts:
        groups = rowgroup_stats(f"{OUT}/{name}/*.parquet", ("ka", "kb"))
        for pname, clauses in preds:
            hits = [
                set(
                    i
                    for i, g in enumerate(groups)
                    if g[col][0] <= hi and g[col][1] >= lo
                )
                for col, lo, hi in clauses
            ]
            hit = len(set.intersection(*hits))
            total = len(groups)
            row = {
                "metric": "zorder_rowgroups_read",
                "layout": name, "predicate": pname,
                "rowgroups_read": hit, "rowgroups_total": total,
                "read_fraction": round(hit / total, 4),
            }
            results.append(row)
            print(json.dumps(row))

    # sanity: all three layouts hold identical data
    counts = {
        name: spark.read.parquet(f"{OUT}/{name}").count() for name in layouts
    }
    assert len(set(counts.values())) == 1, counts
    print(json.dumps({"metric": "summary", "n_rows": counts["natural"],
                      "n_results": len(results)}))


if __name__ == "__main__":
    main()
