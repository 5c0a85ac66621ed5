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


#: Per-row expression texts for the logistic (IRLS/Newton) fit — shared
#: VERBATIM between the Spark plan (F.expr) and the DuckDB oracle, the
#: same one-source-of-truth discipline as :data:`CRAMER_SQL`. The link is
#: the RATIONAL sigmoid s(z) = 1/2 + z / (2·(1+|z|)) — a strictly
#: monotone squashing onto (0,1) whose evaluation is closed-form IEEE
#: arithmetic (add/mul/div/abs are all correctly-rounded, so identical
#: expression text ⇒ bit-identical doubles cross-engine). exp()-based
#: logistic would hang cross-engine determinism on two libm
#: implementations agreeing to the last ulp — exactly the transcendental
#: hazard the repo's float-determinism rules exist to avoid. The decision
#: boundary is unchanged (s ≥ 1/2 ⇔ z ≥ 0) and the IRLS structure is the
#: textbook one; swap the link for exp() when running Spark-only.
LOGIT_SQL = {
    # linear score against a joined coefficient context (b0, b1, b2)
    "z": "(b0 + b1 * f1 + b2 * f2)",
    # rational sigmoid: strictly inside (0,1), so w = s(1-s) is never 0
    "s": "(0.5 + z / (2 * (1 + abs(z))))",
    # IRLS weight and weighted working response, quantized onto a 2^20
    # integer grid so the second-step "normal equation" sums are exact
    # integer arithmetic (order-independent ⇒ cross-engine identical).
    # w·u simplifies algebraically: w·(z + (y−s)/w) = w·z + (y−s) — the
    # simplified form avoids the division entirely and is the ONE shared
    # expression tree both engines evaluate.
    "wq": "CAST(floor(s * (1 - s) * 1048576) AS BIGINT)",
    "vq": "CAST(floor((s * (1 - s) * z + (y - s)) * 1048576) AS BIGINT)",
}


def logit_fit_2f(
    feats: DataFrame,
    f1: str = "f1",
    f2: str = "f2",
    y: str = "y",
) -> DataFrame:
    """ONE-row logistic coefficient frame (b0, b1, b2) for
    P(y=1) ≈ s(b0 + b1·f1 + b2·f2), fit with TWO Newton/IRLS steps — each
    step is one map-side-combinable aggregation + an in-plan 3×3 Cramer
    solve, the exact distributed shape of :func:`ols_fit_2f`. No ML
    library, no driver-side math, no iteration-until-convergence loop:
    two fixed steps from b=0 (deterministic, and ample for a 2-feature
    screening classifier — the use case is "cheap proxy for an expensive
    quality gate", not a converged MLE).

    Step 1 is closed-form: at b=0 every predicted probability is 1/2, so
    the Newton step is b = 4·(X'X)⁻¹·X'(y−1/2) — the OLS Cramer solve on
    the SAME nine exact int64 sums with a shifted/scaled RHS. Step 2
    rebuilds the weighted normal equations per row (weights w = s(1−s)
    from the step-1 scores, quantized onto a 2^20 integer grid, summed as
    DECIMAL(38,0) so the reduction is exact at any row count) and solves
    once more. ``feats`` must carry INTEGER feature columns and a 0/1
    integer label; per-row quantized products must stay inside int64
    (|wq·f·f| ≤ 2^18·|f1·f2|max — fine for per-mille-grid features to
    ~2^22, enforce upstream). Column names z/s/wq/vq are reserved.
    Singular designs raise loudly (same guard as OLS)."""
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
    # Newton step from b=0: rewrite the RHS in place (same column names),
    # then the shared Cramer text applies verbatim.
    step1_rhs = sums.select(
        "n", "s1", "s2", "s11", "s12", "s22",
        F.expr("(4 * (sy - n / 2))").alias("sy"),
        F.expr("(4 * (s1y - s1 / 2))").alias("s1y"),
        F.expr("(4 * (s2y - s2 / 2))").alias("s2y"),
    )
    det = F.expr(CRAMER_SQL["det"])
    guard1 = F.assert_true(
        det != F.lit(0.0),
        "logit_fit_2f: singular design (det = 0) in the first Newton "
        "step — a feature is constant or the features are collinear",
    )
    coefs1 = step1_rhs.select(
        F.when(guard1.isNull(), F.expr(CRAMER_SQL["det0"]) / det).alias("b0"),
        (F.expr(CRAMER_SQL["det1"]) / det).alias("b1"),
        (F.expr(CRAMER_SQL["det2"]) / det).alias("b2"),
    )
    # Step 2: per-row IRLS weights/working response from the broadcast
    # 1-row step-1 context, quantized, then the SAME Cramer solve on the
    # weighted sums. Sums go through DECIMAL(38,0) (Spark) / HUGEINT
    # (DuckDB SUM(BIGINT)) so the reduction is exact, order-independent
    # integer arithmetic at any scale.
    rows = (
        feats.select(
            c1.alias("f1"), c2.alias("f2"), cy.alias("y")
        )
        .crossJoin(F.broadcast(coefs1))
        .withColumn("z", F.expr(LOGIT_SQL["z"]))
        .withColumn("s", F.expr(LOGIT_SQL["s"]))
        .withColumn("wq", F.expr(LOGIT_SQL["wq"]))
        .withColumn("vq", F.expr(LOGIT_SQL["vq"]))
    )

    def dsum(col: Column) -> Column:
        return F.sum(col.cast("decimal(38,0)")).cast("double")

    wq, vq = F.col("wq"), F.col("vq")
    w_sums = rows.agg(
        dsum(wq).alias("n"),
        dsum(wq * F.col("f1")).alias("s1"),
        dsum(wq * F.col("f2")).alias("s2"),
        dsum(wq * F.col("f1") * F.col("f1")).alias("s11"),
        dsum(wq * F.col("f1") * F.col("f2")).alias("s12"),
        dsum(wq * F.col("f2") * F.col("f2")).alias("s22"),
        dsum(vq).alias("sy"),
        dsum(vq * F.col("f1")).alias("s1y"),
        dsum(vq * F.col("f2")).alias("s2y"),
    )
    guard2 = F.assert_true(
        det != F.lit(0.0),
        "logit_fit_2f: singular weighted design (det = 0) in the second "
        "Newton step",
    )
    return w_sums.select(
        F.when(guard2.isNull(), F.expr(CRAMER_SQL["det0"]) / det).alias("b0"),
        (F.expr(CRAMER_SQL["det1"]) / det).alias("b1"),
        (F.expr(CRAMER_SQL["det2"]) / det).alias("b2"),
    )


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
