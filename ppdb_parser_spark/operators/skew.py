"""Skew-mitigation operators (SURVEY.md §4.3).

AQE handles skewed *joins* automatically; skewed *aggregations* on hot keys
(stopword-like phrases in PPDB, 'en' in a language column) still funnel a
hot key's rows into one reducer. :func:`salted_agg_sum_count` implements
the classic two-phase fix declaratively: salt the key with a deterministic
row-derived shard, pre-aggregate on (key, salt), then combine partials —
turning one hot reducer into ``n_salts`` balanced ones at the cost of a
second (tiny) aggregation over ``n_salts × |keys|`` rows.

The salt is derived from a hash of stable row attributes, NOT ``F.rand``:
re-executions of a task (speculation, stage retry) must salt a row the
same way or partial aggregates double-count — determinism here is a
correctness requirement at scale, not a test convenience.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg_sum_count(
    df: DataFrame,
    key_col: str,
    value_cents: Column,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregate: per ``key_col``, exact count and
    integer-cents sum of ``value_cents`` (a long Column).

    ``salt_from``: a stable column whose hash spreads the hot key's rows
    across ``n_salts`` partial groups.
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)))
    partial = salted.groupBy(key_col, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value_cents).alias("__cents"),
    )
    return partial.groupBy(key_col).agg(
        F.sum("__n").cast("long").alias("n_rows"),
        (F.sum("__cents") / 100.0).alias("total_value"),
    )


def salted_replicate_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    salt_from: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi join: salt the (skewed) fact side, replicate the
    dim side across all salts, join on ``(key, salt)``.

    This is the replicate-salt counterpart to :func:`salted_agg_sum_count`
    for joins where the dim side is too large to broadcast and a hot fact
    key would otherwise funnel into one shuffle partition. A hot key's
    rows spread over ``n_salts`` reducers; the dim pays an ``n_salts``×
    replication (explode of a literal salt array — map-side, no extra
    shuffle of the dim beyond the join's own exchange).

    AQE's skew-join splitting covers the sort-merge case adaptively; the
    salted form is the deterministic, planner-independent fix — it also
    works for shuffled hash joins and for engines/stages where AQE cannot
    re-plan (e.g. a stream-static join). The salt again derives from
    stable row attributes, never ``F.rand`` (speculative re-execution must
    salt identically).

    Result equals the plain equi join row-for-row (oracle-checked by
    ``skew_salted_join``).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salts))
    fact_s = fact.withColumn("__salt", salt.cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, [key_col, "__salt"]).drop("__salt")
