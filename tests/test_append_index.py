"""Appendable persisted indexes (round 14): the batch-accept COMMIT path.

`_load_appended_index` treats the corpus as append-only — index entries at
or below the stamped high-water mark are immutable, advancing the mark
signs only the new rows, and each batch lands as its own retry-safe
``seg=`` partition (dynamic partition overwrite + stamp-after-data). These
tests pin the contract: append followed by serve is byte-identical to a
from-scratch rebuild, a replayed append never duplicates rows, a foreign
fingerprint truncates stale segments, and the BM25 search path actually
partition-prunes the postings scan on the term-hash bucket."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

import ppdb_parser_spark.operators.dedup as DD
import ppdb_parser_spark.operators.text_analysis as TA
from ppdb_parser_spark.plans.checks import assert_partition_pruned
from ppdb_parser_spark.queries.similarity import _load_appended_index
from ppdb_parser_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CUT = 400


def _docs(spark):
    return load_table(spark, SF, "documents")


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def _mh_index(spark, docs, root, fp="fp0", cut=CUT):
    n_max = docs.agg(F.max("doc_id")).first()[0]

    def _slice(lo):
        cond = F.col("doc_id") < cut if lo is None else F.col("doc_id") >= lo
        return docs.filter(cond)

    bands = _load_appended_index(
        spark,
        os.path.join(root, "bands"),
        fp,
        cut,
        n_max,
        lambda: DD.minhash_banded_sigs(_slice(None), 16, 8),
        lambda lo: DD.minhash_banded_sigs(_slice(lo), 16, 8),
    )
    sets = _load_appended_index(
        spark,
        os.path.join(root, "sets"),
        fp,
        cut,
        n_max,
        lambda: DD.minhash_packed_sets(_slice(None)),
        lambda lo: DD.minhash_packed_sets(_slice(lo)),
    )
    return bands, sets


def test_append_then_serve_equals_rebuild(spark, tmp_path):
    docs = _docs(spark)
    bands, sets = _mh_index(spark, docs, str(tmp_path))
    got = _pairs(DD.minhash_pairs_full_from_index(bands, sets, 0.3))
    want = _pairs(DD.minhash_match(docs, 16, 8, 0.3))
    assert got == want and len(got) > 0


def test_replayed_append_is_idempotent(spark, tmp_path):
    """Crash between segment write and stamp → the next load re-appends
    the SAME segment; dynamic partition overwrite must replace it, not
    duplicate it."""
    docs = _docs(spark)
    bands, _ = _mh_index(spark, docs, str(tmp_path))
    # materialize BEFORE the replay: the overwrite replaces this
    # handle's underlying files (callers re-load after each commit)
    fresh_rows = sorted(map(tuple, bands.collect()))
    # simulate the crash: roll the stamp back to the pre-append mark
    meta_path = os.path.join(str(tmp_path), "bands_meta")
    spark.createDataFrame(
        [("fp0", CUT - 1)], "fingerprint string, max_id long"
    ).coalesce(1).write.mode("overwrite").parquet(meta_path)
    bands2, _ = _mh_index(spark, docs, str(tmp_path))
    assert sorted(map(tuple, bands2.collect())) == fresh_rows


def test_foreign_fingerprint_truncates_stale_segments(spark, tmp_path):
    """A regenerated corpus (fingerprint mismatch) rebuilds from scratch;
    the base write must TRUNCATE — segments of the old artifact may not
    survive into the new one."""
    docs = _docs(spark)
    bands_a, _ = _mh_index(spark, docs, str(tmp_path), fp="fp0")
    n_a = bands_a.count()
    # same path, new fingerprint, corpus now only the first 300 docs
    small = docs.filter(F.col("doc_id") < 300)
    bands_b, _ = _mh_index(
        spark, small, str(tmp_path), fp="fp1", cut=200
    )
    n_b = bands_b.count()
    assert n_b < n_a  # stale seg=CUT rows would make these equal or more
    want = DD.minhash_banded_sigs(small, 16, 8).count()
    assert n_b == want


def test_bm25_index_matches_restricted_fullscan(spark, tmp_path):
    """Top-k from the postings index == the exhaustive scorer restricted
    to documents containing ≥1 query term (the inverted-index contract),
    on the same value grid."""
    docs = _docs(spark)
    terms = ("query", "stream", "merge")
    n_max = docs.agg(F.max("doc_id")).first()[0]

    def _slice(lo):
        cond = F.col("doc_id") < CUT if lo is None else F.col("doc_id") >= lo
        return docs.filter(cond)

    postings = _load_appended_index(
        spark,
        os.path.join(str(tmp_path), "post"),
        "fp0",
        CUT,
        n_max,
        lambda: TA.inverted_postings(_slice(None)),
        lambda lo: TA.inverted_postings(_slice(lo)),
        extra_part_cols=("bucket",),
    )
    docstats = _load_appended_index(
        spark,
        os.path.join(str(tmp_path), "docs"),
        "fp0",
        CUT,
        n_max,
        lambda: TA.bm25_docstats(_slice(None)),
        lambda lo: TA.bm25_docstats(_slice(lo)),
    )
    got = TA.bm25_topk_from_index(postings, docstats, terms, k=10)
    tk = F.split(F.col("text"), " ")
    match = None
    for t in terms:
        c = F.array_contains(tk, F.lit(t))
        match = c if match is None else (match | c)
    # full-scan scorer with stats over ALL docs, candidates restricted:
    # bm25_topk computes its stats ctx from the df it is given, so feed it
    # the full corpus and restrict AFTER scoring via a join on matches.
    scored_all = TA.bm25_topk(docs, terms, k=docs.count())
    matching = docs.filter(match).select("doc_id")
    want = (
        scored_all.join(matching, "doc_id")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]
    assert got.count() == 10


def test_bm25_postings_scan_partition_pruned(spark, tmp_path):
    """The search's term filter must reach the postings scan as a
    PartitionFilter on the term-hash bucket — at 100 TB the difference
    between reading ≤ q buckets and the whole postings relation."""
    docs = _docs(spark)
    path = os.path.join(str(tmp_path), "post")
    TA.inverted_postings(docs).withColumn(
        "seg", F.lit(0)
    ).write.partitionBy("seg", "bucket").parquet(path)
    postings = spark.read.parquet(path).drop("seg")
    docstats = TA.bm25_docstats(docs)
    df = TA.bm25_topk_from_index(
        postings, docstats, ("query", "stream", "merge"), k=10
    )
    assert_partition_pruned(df, "bucket", "text_bm25_indexed_topk")
    ph = TA.phrase_hits_from_index(
        postings, (("table", "hash"), ("order", "fast"))
    )
    assert_partition_pruned(ph, "bucket", "text_phrase_indexed")
    assert ph.count() > 0


def test_bm25_batch_matches_single_query_path(spark, tmp_path):
    """Each batch member's rows must equal the single-query serving path
    for the same terms (same pruned-scan inputs, same score grid), and
    mixed arities are rejected loudly."""
    import pytest

    docs = _docs(spark)
    path = os.path.join(str(tmp_path), "post")
    TA.inverted_postings(docs).withColumn(
        "seg", F.lit(0)
    ).write.partitionBy("seg", "bucket").parquet(path)
    postings = spark.read.parquet(path).drop("seg")
    docstats = TA.bm25_docstats(docs)
    queries = {
        "qA": ("query", "stream", "merge"),
        "qB": ("table", "hash", "join"),
    }
    batch = TA.bm25_batch_from_index(postings, docstats, queries, k=10)
    rows = {
        qid: [
            (r.doc_id, r.lang, r.bm25)
            for r in batch.filter(F.col("query_id") == qid)
            .orderBy("rk")
            .collect()
        ]
        for qid in queries
    }
    for qid, terms in queries.items():
        single = TA.bm25_topk_from_index(postings, docstats, terms, k=10)
        assert rows[qid] == [tuple(r) for r in single.collect()], qid
    with pytest.raises(ValueError, match="arity"):
        TA.bm25_batch_from_index(
            postings, docstats, {"a": ("x", "y"), "b": ("x", "y", "z")}
        )


def test_multi_batch_append_then_compact(spark, tmp_path):
    """Ten 10-doc batches accumulate ten segments on top of the base;
    compaction collapses them to one seg=0 partition with byte-identical
    rows, leaves the meta stamp alone, and the NEXT append still lands
    correctly on the compacted artifact."""
    from ppdb_parser_spark.queries.similarity import (
        compact_appended_index,
    )

    docs = _docs(spark).filter(F.col("doc_id") < 500)
    path = os.path.join(str(tmp_path), "bands")

    def _load(upto):
        return _load_appended_index(
            spark,
            path,
            "fp0",
            300,
            upto,
            lambda: DD.minhash_banded_sigs(
                docs.filter(F.col("doc_id") < 300), 16, 8
            ),
            lambda lo: DD.minhash_banded_sigs(
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") <= upto)
                ),
                16,
                8,
            ),
        )

    for hi in range(309, 400, 10):  # batches [300..309], [310..319], ...
        _load(hi)
    segs = [d for d in os.listdir(path) if d.startswith("seg=")]
    assert len(segs) == 11  # base + 10 batches
    before = sorted(map(tuple, spark.read.parquet(path).drop("seg").collect()))
    assert compact_appended_index(spark, path, max_segments=8)
    segs2 = [d for d in os.listdir(path) if d.startswith("seg=")]
    assert segs2 == ["seg=0"]
    after = sorted(map(tuple, spark.read.parquet(path).drop("seg").collect()))
    assert after == before
    # below threshold now: a second compact is a no-op
    assert not compact_appended_index(spark, path, max_segments=8)
    # and the next batch still appends onto the compacted artifact
    got = _load(409)
    want = DD.minhash_banded_sigs(
        docs.filter(F.col("doc_id") < 410), 16, 8
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_ivf_inverted_list_pruned_and_matches_search(spark, tmp_path):
    """The inverted-list serve must (a) partition-prune the assignment
    scan to the probed cells and (b) return exactly what the
    corpus-reassigning search path returns — same candidates, same
    round-6 cosines."""
    import ppdb_parser_spark.operators.similarity as SIM

    e = load_table(spark, SF, "embeddings")
    cents = SIM.ivf_build_centroids(e, n_cells=8)
    path = os.path.join(str(tmp_path), "ivfassign")
    SIM.ivf_assignments(e, cents).withColumn(
        "seg", F.lit(0)
    ).write.partitionBy("seg", "cell_id").parquet(path)
    assignments = spark.read.parquet(path).drop("seg")
    got = SIM.ivf_topk_from_assignments(
        assignments, e, cents, probe_id=3, n_probe=2, k=5
    )
    assert_partition_pruned(got, "cell_id", "sim_ivf_append_topk")
    want = SIM.ivf_search_centroids(e, cents, probe_id=3, n_probe=2, k=5)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_pq_codes_serve_matches_codebook_search(spark, tmp_path):
    """Serving from the persisted codes relation must equal the
    per-query re-encoding search byte-for-byte (same tdots ints, same
    codes, same round-6 cosines), including through a parquet
    round-trip of the codes."""
    import ppdb_parser_spark.operators.similarity as SIM

    e = load_table(spark, SF, "embeddings")
    cb = SIM.pq_build_codebook(e, n_centroids=16, m=8, dim=64)
    path = os.path.join(str(tmp_path), "pqcodes")
    SIM.pq_codes_from_codebook(e, cb, dim=64, m=8).write.parquet(path)
    codes = spark.read.parquet(path)
    got = SIM.pq_topk_from_codes(
        codes, e, cb, probe_id=3, k=10, rerank=50, dim=64, m=8
    )
    want = SIM.pq_search_codebook(
        e, cb, probe_id=3, k=10, rerank=50, dim=64, m=8
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_registered_queries_cold_and_warm(spark, tmp_path, monkeypatch):
    """The registered queries build their artifacts under .cache/indexes
    on first run and serve read-only when fresh; both states must return
    identical results."""
    import ppdb_parser_spark.queries.dedup as QD
    import ppdb_parser_spark.queries.text_analysis as QT
    import ppdb_parser_spark.queries.similarity as QS

    # point the index home at a throwaway dir so this test owns lifecycle
    def _tmp_index_dir(sf_dir, name):
        return os.path.join(str(tmp_path), "idx", name)

    monkeypatch.setattr(QS, "_index_dir", _tmp_index_dir)
    cold_mh = _pairs(QD.dedup_minhash_index_append(spark, SF))
    warm_mh = _pairs(QD.dedup_minhash_index_append(spark, SF))
    assert cold_mh == warm_mh and len(cold_mh) > 0
    cold_bm = [tuple(r) for r in QT.text_bm25_indexed_topk(spark, SF).collect()]
    warm_bm = [tuple(r) for r in QT.text_bm25_indexed_topk(spark, SF).collect()]
    assert cold_bm == warm_bm and len(cold_bm) == 10
    cold_ivf = [tuple(r) for r in QS.sim_ivf_append_topk(spark, SF).collect()]
    warm_ivf = [tuple(r) for r in QS.sim_ivf_append_topk(spark, SF).collect()]
    assert cold_ivf == warm_ivf and len(cold_ivf) == 5
    shutil.rmtree(os.path.join(str(tmp_path), "idx"), ignore_errors=True)
