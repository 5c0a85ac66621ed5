"""Bucketing demo (SURVEY.md §4.2, pyspark guide §Partitioning): two tables
bucketed on the join key co-locate — the join plans with NO shuffle
exchange on either side. This is the 100 TB answer for repeated
lineitem⋈orders-style joins: pay the shuffle once at write time."""

from __future__ import annotations

from pyspark.sql import functions as F

from ppdb_parser_spark.plans.checks import plan_string
from ppdb_parser_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    # in-memory catalog: a previous session's table dirs survive while the
    # metadata doesn't — clear both
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bkt", "o_bkt"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bkt")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bkt")
    )

    # at fixture scale the planner prefers broadcast (which bypasses
    # buckets entirely); disable it to expose the bucket-co-located SMJ —
    # the plan shape a large–large join gets at 100 TB
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bkt").join(
            spark.table("o_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_string(joined)
        # co-located buckets: no Exchange (shuffle) feeding the join
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Bucketed: true" in plan, plan

        # and the result matches the plain (shuffling) join
        n_bucketed = joined.count()
        n_plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n_bucketed == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
