"""In-engine distributed least squares (no ML library): fit a 2-feature
OLS model with ONE exact integer aggregation, solve the 3×3 normal
equations with Cramer's rule as a fixed closed-form expression, and score
with a broadcast 1-row coefficient context.

Why this shape at 100 TB: the entire fit is a single map-side-combinable
aggregation producing nine int64 sums — no shuffle beyond one 9-column
partial-aggregate tree, no iteration, no driver-side math. The solve is
O(1) arithmetic ON THE 1-ROW AGGREGATE (still inside the plan — no
collect), and scoring is a narrow broadcast-cross-join projection, so the
whole pipeline is two scans of the fact table with map-side work only.
This is the classic "normal equations beat gradient descent when k is
tiny" regime (k=2 features + intercept), and it parallelizes perfectly:
executors only ever exchange the nine partial sums.

Cross-engine determinism (the repo's hash-oracle discipline):

- Features and the label are INTEGERS (per-mille grids computed with
  ``floor``), so the nine sums-of-products are exact int64 arithmetic —
  order-independent, hence identical in Spark and DuckDB. Bounds: with
  per-row |f| ≤ 2^17 and products ≤ 2^34, int64 holds ~2^29 ≈ 5·10^8
  rows per partial before overflow could even begin; the documented
  model-input bound is ~2·10^10 rows (switch the sums to DECIMAL(38,0)
  beyond that).
- The Cramer solve is ONE fixed arithmetic expression evaluated on the
  nine sums cast to double. IEEE-754 double ops are deterministic given
  the same expression tree, and both engines are handed the IDENTICAL
  SQL text (:data:`CRAMER_SQL` below is spliced into the Spark plan via
  ``F.expr`` and into the DuckDB oracle verbatim), so the coefficients
  are bit-identical without any grid tricks.
- Residuals are rounded back onto the integer per-mille grid
  (``round(yhat − y)``; both engines round doubles half-away-from-zero),
  so the per-group MAE reduction is again exact integer arithmetic.

A singular design matrix (det = 0: a feature is constant or the two
features are collinear) raises loudly via an embedded ``assert_true``
instead of emitting NaN coefficients — the same fail-loud pattern as
pagerank's weighted-degree guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Cramer's-rule solve of the 3×3 normal equations
#:   [[n,  s1,  s2 ], [s1, s11, s12], [s2, s12, s22]] · b = [sy, s1y, s2y]
#: as SQL text shared VERBATIM by the Spark plan (F.expr) and the DuckDB
#: oracle — one source of truth, so the double arithmetic trees (and
#: therefore the solved coefficients) are bit-identical cross-engine.
CRAMER_SQL = {
    "det": (
        "(n * (s11 * s22 - s12 * s12)"
        " - s1 * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s12 - s11 * s2))"
    ),
    "det0": (
        "(sy * (s11 * s22 - s12 * s12)"
        " - s1 * (s1y * s22 - s12 * s2y)"
        " + s2 * (s1y * s12 - s11 * s2y))"
    ),
    "det1": (
        "(n * (s1y * s22 - s12 * s2y)"
        " - sy * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s2y - s1y * s2))"
    ),
    "det2": (
        "(n * (s11 * s2y - s1y * s12)"
        " - s1 * (s1 * s2y - s1y * s2)"
        " + sy * (s1 * s12 - s11 * s2))"
    ),
}


def ols_fit_2f(
    feats: DataFrame,
    f1: str = "f1",
    f2: str = "f2",
    y: str = "y",
) -> DataFrame:
    """ONE-row coefficient frame (b0, b1, b2) for y ≈ b0 + b1·f1 + b2·f2.

    ``feats`` must carry INTEGER (long) feature/label columns — the nine
    normal-equation sums are exact int64 products, map-side combinable.
    The returned frame stays lazy (no collect); broadcast-cross-join it
    onto the scoring scan. det == 0 fails loudly.
    """
    c1, c2, cy = F.col(f1), F.col(f2), F.col(y)
    sums = feats.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(c1).cast("double").alias("s1"),
        F.sum(c2).cast("double").alias("s2"),
        F.sum(c1 * c1).cast("double").alias("s11"),
        F.sum(c1 * c2).cast("double").alias("s12"),
        F.sum(c2 * c2).cast("double").alias("s22"),
        F.sum(cy).cast("double").alias("sy"),
        F.sum(c1 * cy).cast("double").alias("s1y"),
        F.sum(c2 * cy).cast("double").alias("s2y"),
    )
    det = F.expr(CRAMER_SQL["det"])
    guard = F.assert_true(
        det != F.lit(0.0),
        "ols_fit_2f: singular normal equations (det = 0) — a feature is "
        "constant or the features are collinear; pick independent features",
    )
    return sums.select(
        F.when(guard.isNull(), F.expr(CRAMER_SQL["det0"]) / det).alias("b0"),
        (F.expr(CRAMER_SQL["det1"]) / det).alias("b1"),
        (F.expr(CRAMER_SQL["det2"]) / det).alias("b2"),
    )


def ols_score_residual_milli(
    f1: Column, f2: Column, y: Column
) -> Column:
    """Integer per-mille residual ``round(b0 + b1·f1 + b2·f2 − y)`` —
    evaluate against a joined coefficient context (columns b0, b1, b2).
    The round() re-grids the double prediction so downstream reductions
    (MAE, bias) are exact integer sums again."""
    yhat = F.col("b0") + F.col("b1") * f1 + F.col("b2") * f2
    return F.round(yhat - y, 0).cast("long")


def ols_fit_2f_by(
    feats: DataFrame,
    keys: list[str],
    f1: str = "f1",
    f2: str = "f2",
    y: str = "y",
) -> DataFrame:
    """One OLS model PER KEY GROUP in a single pass — the grouped variant
    of :func:`ols_fit_2f`: the nine exact int64 sums aggregate under
    ``groupBy(keys)`` (still one map-side-combinable shuffle, now keyed),
    and the Cramer solve evaluates per GROUP ROW. Fitting a million
    per-domain/per-language models costs exactly one aggregation — no
    per-group jobs, no loops, no pandas. Returns (keys..., b0, b1, b2).

    Degenerate groups (constant/collinear features within a group) raise
    the same loud singular-matrix guard; filter such groups beforehand
    (e.g. ``HAVING count(*) >= k`` and non-constant features) if they are
    expected."""
    c1, c2, cy = F.col(f1), F.col(f2), F.col(y)
    sums = feats.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(c1).cast("double").alias("s1"),
        F.sum(c2).cast("double").alias("s2"),
        F.sum(c1 * c1).cast("double").alias("s11"),
        F.sum(c1 * c2).cast("double").alias("s12"),
        F.sum(c2 * c2).cast("double").alias("s22"),
        F.sum(cy).cast("double").alias("sy"),
        F.sum(c1 * cy).cast("double").alias("s1y"),
        F.sum(c2 * cy).cast("double").alias("s2y"),
    )
    det = F.expr(CRAMER_SQL["det"])
    guard = F.assert_true(
        det != F.lit(0.0),
        "ols_fit_2f_by: singular normal equations in a key group — a "
        "feature is constant or collinear within the group",
    )
    return sums.select(
        *keys,
        F.when(guard.isNull(), F.expr(CRAMER_SQL["det0"]) / det).alias("b0"),
        (F.expr(CRAMER_SQL["det1"]) / det).alias("b1"),
        (F.expr(CRAMER_SQL["det2"]) / det).alias("b2"),
    )
