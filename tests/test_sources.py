

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
