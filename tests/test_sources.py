

def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema-on-read evolution: shards written with different (widening)
    schemas must union under mergeSchema — the 100 TB lake reality where
    columns appear over time."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(
        p + "/shard=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, score double"
    ).write.parquet(p + "/shard=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "s", "score", "shard"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_dynamic_partition_overwrite_is_idempotent(spark, sf_dir, tmp_path):
    """partitionOverwriteMode=dynamic: rewriting ONE partition must leave
    the others byte-identical — the idempotent-rerun contract a partitioned
    100 TB pipeline relies on (a failed day's job reruns without clobbering
    the rest of the table)."""
    from pyspark.sql import functions as F

    from ppdb_parser_spark.sources.tables import load_table

    out = str(tmp_path / "bylang")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.write.partitionBy("lang").parquet(out)
    before = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(out).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # rerun ONLY the 'en' slice (halved, to prove a real rewrite)
        docs.filter(
            (F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)
        ).write.mode("overwrite").partitionBy("lang").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
    after = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(out).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert after["en"] < before["en"]          # the rewritten partition changed
    for lang in before:
        if lang != "en":
            assert after[lang] == before[lang]  # every other partition intact


def test_no_query_orphaned_from_driver_evidence():
    """Anti-orphan audit (VERDICT r5 item 8): every registered query must
    hold a driver CORRECTNESS row from a past round OR sit inside the
    upcoming ~50-query driver sample prefix — so no query can silently
    lose its driver evidence to a prefix reorder."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import gen_ledger

    orphans, stale = gen_ledger.audit()
    assert not orphans, f"queries with no driver evidence path: {orphans}"
    # ADVICE r6: stale was computed but silently discarded. With tier-3
    # LRU rotation (round 7+) every query is re-sampled within one full
    # ceil(N/50)+1-round cycle, so staleness is now a hard invariant.
    assert not stale, f"queries outside the re-certification cycle: {stale}"


def test_zorder_buckets_bound_both_key_spans(spark, sf_dir):
    """The Morton interleave's locality contract: the top-6-bit z-bucket
    fixes 3 high bits of EACH 16-bit key, so within any bucket both key
    spans are < 2^13 — the multi-column data-skipping property a
    single-column sort cannot give (it leaves the second key's span at
    the full domain)."""
    from ppdb_parser_spark.queries import REGISTRY

    rows = REGISTRY["snk_zorder_layout"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["zbucket"] < 64
        assert r["ka_span"] < 8192 and r["kb_span"] < 8192
