"""A/B harness for jaccard_pairs_prefix plan variants at sf0.1.

Throwaway measurement tool (results recorded in BASELINE.md / commit
messages); each variant is the same exact AllPairs/PPJoin algebra with a
different exchange layout, so correctness is cross-checked by row count
against the committed operator.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from ppdb_parser_spark.session import get_spark
from ppdb_parser_spark.sources.tables import load_table


def build(df, threshold=0.5, n=2, id_col="doc_id", text_col="text",
          nparts=32, base_mode="col", pref_parts=None):
    toks = F.split(F.col(text_col), " ")
    sh_arr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                )
            ),
            lambda s: F.xxhash64(s),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base = df.select(F.col(id_col), F.sort_array(sh_arr).alias("fps")).select(
        id_col, F.size("fps").alias("n"), "fps"
    )
    if base_mode == "col":
        base = base.repartition(F.col(id_col))
    elif base_mode == "ncol":
        base = base.repartition(nparts, F.col(id_col))
    elif base_mode == "rr":
        base = base.repartition(nparts)
    # "none": no barrier
    occ = base.select(id_col, "n", F.explode("fps").alias("fp"))
    freq = occ.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    keyed = occ.join(freq, "fp").select(
        id_col, "n", F.struct(F.col("df"), F.col("fp")).alias("k")
    )
    t = float(threshold)
    packed = keyed.groupBy(id_col).agg(
        F.sort_array(F.collect_list("k")).alias("ks"),
        F.first("n").alias("n"),
    )
    prefix_len = F.col("n") - F.ceil(F.lit(t) * F.col("n")).cast("int") + 1
    pref = (
        packed.select(
            F.col(id_col), F.col("n"),
            F.posexplode(F.slice("ks", F.lit(1), prefix_len)).alias("pos", "k"),
        )
        .where(F.col("k.df") >= 2)
        .select(
            id_col, "n", (F.col("pos") + 1).alias("pos"),
            F.col("k.fp").alias("fp"),
        )
    )
    if pref_parts:
        pref = pref.repartition(pref_parts, F.col("fp"))
    a, b = pref.alias("a"), pref.alias("b")
    tc = F.lit(t)

    # sound last-match positional c-bound — mirrors the committed operator
    cand = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (tc * F.col("a.n") <= F.col("b.n"))
            & (tc * F.col("b.n") <= F.col("a.n")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first(F.col("a.n")).alias("na"),
            F.first(F.col("b.n")).alias("nb"),
            F.max(F.col("a.pos")).alias("ia"),
            F.max(F.col("b.pos")).alias("ib"),
        )
        .filter(
            F.col("c")
            + F.least(F.col("na") - F.col("ia"), F.col("nb") - F.col("ib"))
            >= F.ceil(F.lit(t / (1.0 + t)) * (F.col("na") + F.col("nb")))
        )
        .select("id_a", "id_b")
    )
    sa = base.select(F.col(id_col).alias("id_a"), F.col("fps").alias("fps_a"))
    sb = base.select(F.col(id_col).alias("id_b"), F.col("fps").alias("fps_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("fps_a", "fps_b")).cast("long").alias("n_common"),
            F.size("fps_a").cast("long").alias("n_a"),
            F.size("fps_b").cast("long").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def main():
    spark = get_spark(app_name="prefix-ab")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    variants = {
        "col": dict(base_mode="col"),
        "ncol": dict(base_mode="ncol"),
        "ncol+pref32": dict(base_mode="ncol", pref_parts=32),
        "rr+pref32": dict(base_mode="rr", pref_parts=32),
        "none+pref32": dict(base_mode="none", pref_parts=32),
    }
    want = sys.argv[1:] or list(variants)
    for name in want:
        kw = variants[name]
        mk = lambda: build(docs, **kw)
        cnt = mk().count()  # warm + sanity
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); mk().count(); ts.append(time.perf_counter() - t0)
        print(name, "rows=", cnt, "min=", round(min(ts), 2), [round(x, 2) for x in ts])


if __name__ == "__main__":
    main()
