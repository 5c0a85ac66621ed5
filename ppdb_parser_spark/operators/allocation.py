"""Exact integer water-filling budget allocation: split a global token
budget B across sources proportionally to integer quality weights w_i,
capped by each source's availability cap_i — the mixture-design step of
a training-data pipeline ("give higher-quality domains more of the
budget, but never more than they have").

Water-filling in one declarative pass (no iteration): sort sources by
saturation ratio cap_i/w_i ascending; a PREFIX of that order saturates
(takes alloc = cap), and every remaining source gets alloc = ⌊w_i·λ⌋ for
the common water level λ = (B − Σ_sat cap) / Σ_unsat w. All decisions are
exact int64/decimal arithmetic:

- the sort key is the SCALED ratio ⌊cap·10^6/w⌋ (ties broken by source
  id), so ordering is integer-deterministic cross-engine;
- saturation is decided by CROSS-MULTIPLICATION, never division:
  source i saturates iff (B − PC_i)·w_i ≥ cap_i·RW_i, where PC_i is the
  prefix cap sum before i and RW_i the weight sum from i on. Prefix-
  closure is enforced structurally (min over the sort prefix), so a
  pathological near-tie in the scaled ratio cannot produce a
  non-contiguous saturated set;
- unsaturated allocations are ⌊w_i·num/den⌋ via integer division, and
  the ≤ den−1 leftover tokens from the floors go one each to the
  unsaturated sources with the largest remainder (w_i·num) mod den
  (row_number tie-broken by source) — so Σ alloc == min(B, Σ cap)
  EXACTLY, token-for-token reproducible in any engine.

Scale note: the relation this operator sorts is the PER-SOURCE aggregate
(one row per domain/source), which is small by construction relative to
the corpus — the single-partition window here is over thousands-to-
millions of rows, not the 100 TB fact table. If the source dimension
itself outgrows one partition, replace the sorted-prefix scan with a
binary search for λ over aggregation passes (O(log range) scans, no
global sort); the cross-multiplied predicate below is exactly the
feasibility test that search needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def waterfill_alloc(
    per_source: DataFrame,
    budget: int | str,
    key: str = "source",
    cap: str = "cap",
    weight: str = "weight",
) -> DataFrame:
    """Allocate ``budget`` integer tokens across ``per_source`` rows
    (columns: key, cap ≥ 0, weight ≥ 1, all integer). Returns one row per
    source: (key, cap, weight, alloc, saturated) with Σ alloc ==
    min(budget, Σ cap) exactly. ``budget`` is either a Python int or the
    NAME of an integer column already on ``per_source`` (cross-join a
    1-row budget context first for a data-derived budget — keeps the
    whole allocation in-plan, no collect). See module docstring for the
    algorithm and determinism contract."""
    k, c, w = F.col(key), F.col(cap), F.col(weight)
    b = (
        F.col(budget).cast("long")
        if isinstance(budget, str)
        else F.lit(int(budget)).cast("long")
    )

    # exact int64 scaled ratio (div, not double division — see base_alloc)
    ratio_key = F.expr(f"({cap} * 1000000) div {weight}").cast("long")
    order = Window.orderBy(ratio_key.asc(), k.asc())
    prefix_cap = F.coalesce(
        F.sum(c).over(order.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    suffix_w = F.sum(w).over(
        order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ).cast("long")
    # clamp the budget so an over-provisioned B saturates everything
    total_cap = F.sum(c).over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    ).cast("long")
    b_eff = F.least(b, total_cap)
    # saturate i iff the water level computed with i still unsaturated,
    # (b_eff − PC_i)/RW_i, already reaches i's ratio cap_i/w_i —
    # cross-multiplied: (b_eff − PC_i)·w_i ≥ cap_i·RW_i
    pred = (b_eff - prefix_cap) * w >= c * suffix_w
    sat = F.min(pred.cast("int")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) == 1

    staged = per_source.select(
        k.alias("key"),
        c.cast("long").alias("cap"),
        w.cast("long").alias("weight"),
        sat.alias("saturated"),
        b_eff.alias("b_eff"),
    )
    # water level λ = num/den over the unsaturated remainder
    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    num = (
        F.col("b_eff")
        - F.coalesce(
            F.sum(F.when(F.col("saturated"), F.col("cap"))).over(whole),
            F.lit(0),
        )
    ).cast("long")
    den = F.coalesce(
        F.sum(F.when(~F.col("saturated"), F.col("weight"))).over(whole),
        F.lit(0),
    ).cast("long")
    leveled = staged.select(
        "key", "cap", "weight", "saturated",
        num.alias("num"), den.alias("den"),
    )
    # NB: `div`, not `/` + floor — long/long in Spark is DOUBLE division,
    # and a quotient landing one ulp above an integer would floor high,
    # silently breaking the Σ alloc == B invariant. DIV is exact int64.
    base_alloc = F.when(F.col("saturated"), F.col("cap")).otherwise(
        F.expr("(weight * num) div den").cast("long")
    )
    rem = F.when(F.col("saturated"), F.lit(-1)).otherwise(
        (F.col("weight") * F.col("num")) % F.col("den")
    )
    with_base = leveled.select(
        "key", "cap", "weight", "saturated", "num", "den",
        base_alloc.alias("base_alloc"), rem.alias("rem"),
    )
    # leftover from the floors: num − Σ unsat base_alloc tokens, one each
    # to the largest remainders (≤ den−1 of them, so rank < leftover+1)
    leftover = (
        F.col("num")
        - F.coalesce(
            F.sum(
                F.when(~F.col("saturated"), F.col("base_alloc"))
            ).over(whole),
            F.lit(0),
        )
    ).cast("long")
    rem_rank = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("key").asc())
    )
    return with_base.select(
        F.col("key").alias("source"),
        "cap", "weight",
        (
            F.col("base_alloc")
            + F.when(
                (~F.col("saturated")) & (rem_rank <= leftover), F.lit(1)
            ).otherwise(F.lit(0))
        ).cast("long").alias("alloc"),
        F.col("saturated").cast("int").alias("saturated"),
    )
