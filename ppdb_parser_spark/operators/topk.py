"""Global top-k with rank, without a single-partition window over the
full input (SURVEY.md §4.2 — O2/W1 scale shape).

``Window.orderBy(...)`` with no partitionBy plans a WindowExec that drags
EVERY row to one partition — at 100 TB that is the whole table through one
task (Spark logs "No Partition Defined for Window operation" for exactly
this reason). The scale-correct shape is: top-k first via ``orderBy().
limit(k)`` — Catalyst plans TakeOrderedAndProject, a per-partition k-row
heap + k-way merge, no global sort — then rank only the k survivors.

The rank window still needs a partition spec: a literal key does not work
because Catalyst constant-folds foldable partition expressions away and
the empty spec (and the warning, and the full-input single-partition
window had we ranked pre-limit) comes back. We build a non-foldable zero
from an anchor column (``coalesce(length(cast(col)) * 0, 0)``) — constant
in VALUE, so all k rows land in one hash partition (which is the point:
k rows), but opaque to the optimizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def nonfoldable_zero(anchor: Column) -> Column:
    """A column that always evaluates to 0 but that Catalyst cannot
    constant-fold (it depends on ``anchor``). NULL-safe."""
    return F.coalesce(F.length(anchor.cast("string")) * F.lit(0), F.lit(0))


def global_topk_ranked(
    df: DataFrame,
    order: list[Column],
    k: int,
    rank_col: str = "rk",
    anchor: str | None = None,
) -> DataFrame:
    """Global top-``k`` rows by ``order`` with a 1-based ``rank_col``.

    Plan: TakeOrderedAndProject(k) over the full input, then a WindowExec
    over only the k-row result (partitioned by a non-foldable constant so
    the partition spec is never empty). ``order`` must be a full tie-break
    for deterministic results. ``anchor``: column used to build the
    constant partition key; defaults to the first column.
    """
    top = df.orderBy(*order).limit(k)
    key = nonfoldable_zero(F.col(anchor if anchor is not None else df.columns[0]))
    w = Window.partitionBy(key).orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w).cast("long"))
