"""Frequency sketches with the sketch-then-verify discipline: a bounded-
memory per-partition pass proposes a SMALL candidate set with a coverage
guarantee, then an exact pass over only the candidates produces the final
answer — so the result is exact (hash-oracle-able against a plain
GROUP BY/HAVING) while the full-width shuffle the naive plan needs never
happens.

Misra-Gries coverage guarantee (why the candidate pass is sound): an MG
summary of capacity k over a stream of length m undercounts any item by
at most m/(k+1), so every item with frequency > m/(k+1) survives the
summary. Run per partition: if an item's GLOBAL frequency f ≥ n/θ, then
by pigeonhole over the partition ratios (Σf_p = f, Σn_p = n) at least one
partition has f_p ≥ n_p/θ, and capacity k = θ keeps it there (θ >
n_p/(θ+1)·... with k = θ the survivor bound is f_p > n_p/(θ+1), implied
by f_p ≥ n_p/θ). Hence the union of per-partition MG summaries is a
SUPERSET of the global θ-heavy hitters — never a miss, only false
candidates, and the exact verify pass removes those.

At 100 TB: the naive token histogram shuffles one record per distinct
token occurrence (the widest shuffle in a text pipeline). This plan
shuffles only |partitions|·θ candidate values (KBs), broadcasts the
deduplicated candidates back, and the exact count aggregates only rows
whose value is a candidate — map-side combinable on a set that by
construction fits in memory. The MG pass itself is Arrow-batched
``mapInPandas`` with an O(θ) dict per partition, no per-row Python UDF
calls.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries candidate values for ``col`` (strings),
    one output row per surviving counter per partition. Superset of every
    item with global frequency ≥ n/capacity (see module docstring); the
    caller must exact-verify. Output column: ``value``."""
    import pandas as pd

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros (dict comprehension —
                    # one pass, no per-key del churn)
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame({"value": list(counters.keys())})

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, schema="value string"
    )


def heavy_hitters(df: DataFrame, col: str, theta: int) -> DataFrame:
    """EXACT θ-heavy hitters of ``col``: every value with frequency
    ``freq * theta >= n`` (n = total non-null rows), computed without a
    full-width histogram shuffle. Returns (value, freq, n) with exact
    counts — the result equals the naive ``GROUP BY value HAVING
    freq*θ ≥ n`` plan row-for-row.

    Plan: MG candidate pass (capacity θ, per partition, bounded memory) →
    distinct candidates (tiny) → broadcast semi-join the source against
    the candidates → exact keyed count of ONLY candidate rows → filter by
    the 1-row total-count context (broadcast, provably 1 row)."""
    vals = df.select(F.col(col).cast("string").alias("value")).where(
        F.col("value").isNotNull()
    )
    cands = mg_candidates(vals, "value", capacity=theta).distinct()
    n_ctx = vals.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        vals.join(F.broadcast(cands), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        exact.crossJoin(F.broadcast(n_ctx))
        .where(F.col("freq") * F.lit(theta) >= F.col("n"))
        .select("value", "freq", "n")
    )
