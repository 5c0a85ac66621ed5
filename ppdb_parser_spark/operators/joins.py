"""Join operators Spark lacks natively (SURVEY.md §2.4 J7/J8, §4.3).

Both are compositions of shuffle-friendly primitives — no BNLJ, no driver
loops — so they scale like any equi join + window:

- :func:`asof_join` — "latest right row at-or-before each left row" via a
  tagged union + running ``last(ignorenulls)`` window. One shuffle on the
  `by` key, one partition-local sort; identical cost shape to a sort-merge
  join, and skew on `by` is handled by AQE like any other shuffle.
- :func:`band_join` — interval/theta join re-expressed as a bucketized
  equi join: explode each band into fixed-width buckets, equi-join on the
  bucket id, refine with the exact range predicate. Turns an O(n·m) BNLJ
  into a hash join whose fan-out is bounded by band width / bucket width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_on <= left.left_on`` within the same ``by`` group.

    ``right_cols`` are the right-side columns to carry (pre-rename them to
    avoid collisions with left columns). ``how``: "left" keeps left rows
    with no match (NULL right columns); "inner" drops them.

    Tie semantics: a right row at exactly ``left_on`` is visible ("at or
    before"), matching DuckDB's ``ASOF JOIN ... ON l.t >= r.t``.
    """
    lpay_t = T.StructType([left.schema[c] for c in left.columns])
    rpay_t = T.StructType([right.schema[c] for c in right_cols])

    l2 = left.select(
        *[F.col(c).alias(f"__by_{i}") for i, c in enumerate(by)],
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lpay"),
        F.lit(None).cast(rpay_t).alias("__rpay"),
    )
    # NULL right timestamps can never be "at or before" anything (DuckDB's
    # ASOF evaluates l.t >= NULL as no-match) — and under ascending
    # NULLS-FIRST they would otherwise sort before everything and match
    # spuriously. Drop them up front.
    r2 = right.filter(F.col(right_on).isNotNull()).select(
        *[F.col(c).alias(f"__by_{i}") for i, c in enumerate(by)],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lpay_t).alias("__lpay"),
        F.struct(*right_cols).alias("__rpay"),
    )
    # Right rows sort before left rows at equal __t, so an exact-tie right
    # row is already visible to the left row's running last(). Among right
    # rows tied on __t the payload struct is the final tie-break, making
    # the selected match deterministic rather than partition-order luck.
    w = (
        Window.partitionBy(*[f"__by_{i}" for i in range(len(by))])
        .orderBy(F.asc("__t"), F.asc("__is_left"), F.asc_nulls_first("__rpay"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = l2.unionByName(r2).withColumn(
        "__match", F.last("__rpay", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("__is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: unsupported how={how!r}")
    return out.select("__lpay.*", "__match.*")


def band_join(
    fact: DataFrame,
    fact_col: str,
    bands: DataFrame,
    lo: str = "lo",
    hi: str = "hi",
    bucket_width: float = 500.0,
) -> DataFrame:
    """Interval join: attach the band whose ``[lo, hi)`` contains
    ``fact[fact_col]``. ``bands`` is small (broadcast); each band is
    exploded into ``ceil((hi-lo)/bucket_width)`` bucket rows so the join is
    a plain broadcast hash equi join on the bucket id + exact refinement —
    never a BNLJ, regardless of fact-side scale.
    """
    exploded = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_width),
                F.floor(F.col(hi) / bucket_width),
            )
        ),
    )
    f = fact.withColumn("__bucket", F.floor(F.col(fact_col) / bucket_width))
    refine: Column = (F.col(fact_col) >= F.col(lo)) & (F.col(fact_col) < F.col(hi))
    return (
        f.join(F.broadcast(exploded), on="__bucket", how="inner")
        .filter(refine)
        .drop("__bucket")
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Mirror of :func:`asof_join`: for each left row, attach the EARLIEST
    right row with ``right.right_on >= left.left_on`` in the same ``by``
    group — the "next event after" lookup (conversion lag, next-reading
    interpolation endpoints). Same cost shape: one shuffle on ``by``, one
    partition-local sort, running ``first(ignorenulls)`` over the
    following frame.

    Tie semantics: a right row at exactly ``left_on`` is visible ("at or
    after"). At equal ``__t`` left rows sort before right rows so the
    forward frame starting at the left row still sees the tied right row;
    among tied right rows the payload struct breaks the tie
    deterministically.
    """
    lpay_t = T.StructType([left.schema[c] for c in left.columns])
    rpay_t = T.StructType([right.schema[c] for c in right_cols])

    l2 = left.select(
        *[F.col(c).alias(f"__by_{i}") for i, c in enumerate(by)],
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lpay"),
        F.lit(None).cast(rpay_t).alias("__rpay"),
    )
    r2 = right.filter(F.col(right_on).isNotNull()).select(
        *[F.col(c).alias(f"__by_{i}") for i, c in enumerate(by)],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lpay_t).alias("__lpay"),
        F.struct(*right_cols).alias("__rpay"),
    )
    w = (
        Window.partitionBy(*[f"__by_{i}" for i in range(len(by))])
        .orderBy(F.asc("__t"), F.desc("__is_left"), F.asc_nulls_first("__rpay"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    u = l2.unionByName(r2).withColumn(
        "__match", F.first("__rpay", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("__is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join_forward: unsupported how={how!r}")
    return out.select("__lpay.*", "__match.*")
