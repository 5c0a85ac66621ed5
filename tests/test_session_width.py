"""shuffle_width fallback contract (VERDICT r12 item 3 / next-round #6).

The engine's AQE-exempt keyed repartitions (`_first_match_pairs`,
`_sem_cell_dominance`, `jaccard_pairs_prefix`) pin an explicit partition
count read from the session. Sessions built by our factory always set
``spark.sql.shuffle.partitions``; the external driver's (or a notebook's)
vanilla session may not. These tests simulate the vanilla session by
UNSETTING the runtime conf on the shared fixture session — after unset,
``spark.conf.get(key, None)`` returns None exactly as it would on a
builder that never set the key — and prove both operators still
construct and execute with the ``defaultParallelism`` fallback.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from ppdb_parser_spark.session import shuffle_width

_KEY = "spark.sql.shuffle.partitions"


@contextlib.contextmanager
def _vanilla_conf(spark):
    """Temporarily remove the explicit shuffle-partitions setting."""
    saved = spark.conf.get(_KEY, None)
    spark.conf.unset(_KEY)
    try:
        yield
    finally:
        if saved is not None:
            spark.conf.set(_KEY, saved)


@contextlib.contextmanager
def _conf_set(spark, key, value):
    """Temporarily set a runtime conf, restoring the prior value after
    (ADVICE r13: a bare set left every later test in the shared session
    running at the overridden width — ordering-dependent pollution)."""
    saved = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


def test_shuffle_width_uses_configured_value(spark):
    with _conf_set(spark, _KEY, "8"):
        assert shuffle_width(spark) == 8


def test_shuffle_width_falls_back_to_default_parallelism(spark):
    with _vanilla_conf(spark):
        assert spark.conf.get(_KEY, None) is None
        assert shuffle_width(spark) == max(
            1, spark.sparkContext.defaultParallelism
        )


def test_first_match_pairs_on_vanilla_session(spark):
    """The banded-LSH candidate emitter must run without the repo session
    factory's conf (operators/similarity.py:_first_match_pairs)."""
    from ppdb_parser_spark.operators.similarity import _first_match_pairs

    rows = [
        (1, "01", "10"),
        (2, "01", "11"),  # collides with 1 on band0
        (3, "00", "11"),  # collides with 2 on band1
        (4, "10", "00"),  # no collisions
    ]
    sig = spark.createDataFrame(rows, "doc_id long, band0 string, band1 string")
    with _vanilla_conf(spark):
        got = {
            (r.id_a, r.id_b)
            for r in _first_match_pairs(sig, 2, 2, "doc_id").collect()
        }
    assert got == {(1, 2), (2, 3)}


def test_sem_cell_dominance_on_vanilla_session(spark):
    """The SemDeDup dominance kernel must run without the repo session
    factory's conf (operators/similarity.py:_sem_cell_dominance)."""
    from ppdb_parser_spark.operators.similarity import (
        _sem_cell_dominance,
        _sem_qnorm6,
        _sem_quant,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.01], 0),  # ~cos 0.99995 vs id 1 -> dominated
        (3, [0.0, 1.0], 0),   # orthogonal -> kept
        (4, [0.5, 0.5], 1),   # alone in its cell -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, v array<double>, cell_id int")
    assigned = df.select(
        "doc_id",
        _sem_quant(F.col("v")).alias("__qv"),
        _sem_qnorm6(_sem_quant(F.col("v"))).alias("__nrm"),
        "cell_id",
    )
    with _vanilla_conf(spark):
        kept = {
            r.doc_id: r.kept
            for r in _sem_cell_dominance(assigned, 0.9, "doc_id").collect()
        }
    assert kept == {1: True, 2: False, 3: True, 4: True}
