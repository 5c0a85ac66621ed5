"""Embedding similarity-search operators (SURVEY.md §2.9 L1/L2).

- :func:`with_cosine` — cosine similarity against a probe vector as a pure
  SQL higher-order-function expression (zip_with product + aggregate sum):
  JVM-side, codegen'd, no Python boundary. The per-row reduction is a
  fixed-length (dim-64) loop — at 100 TB this is a narrow map over the
  scan, embarrassingly parallel, no shuffle at all until the top-k.
- :func:`cosine_topk` — brute-force exact top-k: map + TakeOrderedAndProject
  (no global sort materialization).
- :func:`lsh_similarity_join` — the sub-quadratic scale path: seeded
  random-hyperplane LSH implemented relationally (doc ⋈ hyperplanes →
  signature → band bucket join), avoiding O(n²) for all-pairs search.

Cross-engine float note: cosine values are rounded to 6 decimals before any
threshold/ranking — the dot-product accumulation order differs between
engines (ulp-level), while true cosines of random vectors are continuous,
so a 1e-6 grid is both safe and stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ppdb_parser_spark.session import shuffle_width


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(
    df: DataFrame,
    probe: list[float],
    vec_col: str = "embedding",
    out_col: str = "cosine",
) -> DataFrame:
    """Attach round(cosine(vec, probe), 6) for a constant probe vector."""
    p = F.array(*[F.lit(float(v)) for v in probe])
    c = _dot(F.col(vec_col), p) / (_norm(F.col(vec_col)) * _norm(p))
    return df.withColumn(out_col, F.round(c, 6))


def cosine_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Exact top-k by cosine (desc, id asc tie-break) — orderBy+limit shape
    so Catalyst plans TakeOrderedAndProject (per-partition heaps, no global
    sort). ``keep_cols``: extra columns carried into the result."""
    return (
        with_cosine(df, probe, vec_col)
        .select(id_col, *keep_cols, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def fold_dot_cols(
    df: DataFrame,
    terms: tuple[tuple[str, str, str], ...],
    keep_cols: tuple[str, ...],
) -> DataFrame:
    """LEFT-FOLD float inner products of array columns as a SHUFFLE-FREE
    Arrow map — the float-flavor kernel for the single-probe exact scans
    (VERDICT r10 item 3) and candidate-pair refines, completing the
    round-10 kernel family for the O(n·dim) maps that have no k factor.

    For each ``(a_col, b_col, out)`` term, emits
    ``Σ_t a[t]·b[t]`` accumulated dimension-by-dimension — the exact
    ``((0+t₀)+t₁)+…`` sequence of ``F.aggregate``'s fold in
    :func:`_dot`, vectorized over rows instead of terms — so values are
    bit-identical to the in-plan form and every oracle is unchanged.
    ``a_col == b_col`` computes the sum of squares (:func:`_norm`'s fold;
    its ``sqrt`` stays in-plan, correctly rounded in both engines).

    Unlike :func:`gemm_assign_cells` there is NO seeds context and NO
    block exchange: rows stream through the map in scan order, a pure
    narrow map like the fold it replaces, minus the interpreter (the
    nested ``aggregate``/``zip_with`` lambda is not whole-stage
    codegen'd). ``keep_cols`` must carry everything downstream needs —
    array columns not kept are pruned at the scan.

    Round 15 (guide §4.2): raw Arrow batches — the operand list columns
    reshape zero-copy (:func:`~..linalg.arrow_list_to_2d`) and the
    ``keep_cols`` pass through as untouched Arrow arrays instead of a
    pandas round-trip (which materialized every kept array column as
    per-row ndarray objects on BOTH crossings)."""
    dtypes = dict(df.dtypes)
    in_cols = list(
        dict.fromkeys(
            [*keep_cols, *(c for t in terms for c in t[:2])]
        )
    )
    out_schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in keep_cols]
        + [f"`{out}` double" for _, _, out in terms]
    )

    def fold_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import arrow_list_to_2d

        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            arrs = {}
            for c in dict.fromkeys(c for t in terms for c in t[:2]):
                arrs[c] = arrow_list_to_2d(rb.column(c), np.float64)
            outs = []
            for a_col, b_col, _name in terms:
                A, B = arrs[a_col], arrs[b_col]
                acc = np.zeros(n, dtype=np.float64)
                for t in range(A.shape[1]):
                    acc += A[:, t] * B[:, t]
                outs.append(pa.array(acc))
            yield pa.RecordBatch.from_arrays(
                [rb.column(c) for c in keep_cols] + outs,
                [*keep_cols, *(t[2] for t in terms)],
            )

    return df.select(*in_cols).mapInArrow(fold_batches, out_schema)


def cosine_topk_by_id(
    df: DataFrame,
    probe_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    tier: str = "fold",
) -> DataFrame:
    """Exact cosine top-k against the row whose ``id_col`` equals
    ``probe_id`` — the probe stays IN-PLAN as a 1-row broadcast context
    (filter → 1 row → crossJoin(broadcast)), so plan construction runs
    zero Spark jobs, unlike a driver-side ``.first()`` probe fetch.

    Scale shape: scan → broadcast 1-row probe → narrow cosine map →
    TakeOrderedAndProject. The probe row is read from the same relation
    (one extra scan of a pruned single-row filter — at 100 TB this is a
    parquet min/max-pruned point lookup, not a full pass).

    ``tier="fold"`` (default, MEASURED round 11 — VERDICT r10 item 3):
    unlike the O(n·cells·dim) assignment maps the kernel family
    converted, this scan's interpreted work is a single O(dim) fold per
    row with no k factor, and the in-plan form BEATS the Arrow kernel at
    every rung (256× ladder, 512k rows: fold 1.22 s vs kernel 3.42 s;
    128k: 0.59 vs 1.03 — the vector's Arrow boundary costs more than
    ~64 interpreted multiplies, and both sides scale O(n·dim) so the
    ratio cannot invert at 100×). ``tier="kernel"`` routes the dot and
    norm folds through :func:`fold_dot_cols` (bit-identical values,
    equivalence-tested) — kept as the A/B tier and for callers stacking
    MANY probe terms per row, where the boundary amortizes."""
    # limit(1): the id-filter is semantically 1-row (unique ids); the
    # explicit limit makes it PROVABLY 1-row (maxRows=1) so the broadcast
    # context registers as a bounded side in the cartesian plan sweep
    probe_row = df.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("probe_emb"),
        _norm(F.col(vec_col)).alias("probe_nrm"),
    ).limit(1)
    j = df.filter(F.col(id_col) != probe_id).crossJoin(F.broadcast(probe_row))
    if tier == "kernel":
        folded = fold_dot_cols(
            j,
            terms=(
                (vec_col, "probe_emb", "__dot"),
                (vec_col, vec_col, "__ssq"),
            ),
            keep_cols=(id_col, *keep_cols, "probe_nrm"),
        )
        cosine = F.round(
            F.col("__dot")
            / (F.sqrt(F.col("__ssq")) * F.col("probe_nrm")),
            6,
        )
        scored = folded
    elif tier == "fold":
        cosine = F.round(
            _dot(F.col(vec_col), F.col("probe_emb"))
            / (_norm(F.col(vec_col)) * F.col("probe_nrm")),
            6,
        )
        scored = j
    else:
        raise ValueError(f"tier must be 'kernel' or 'fold', got {tier!r}")
    return (
        scored.select(id_col, *keep_cols, cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    n_cells: int = 8,
    probe_id: int = 1,
    n_probe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    assign: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """IVF-style ANN top-k, fully relational — zero driver-side jobs.

    Coarse cells are seeded by the vectors with ``id < n_cells``
    (deterministic, no k-means iteration). The whole index state — the
    seeds array (with precomputed norms), the probe embedding, and the
    probe's top-``n_probe`` cells — is computed IN-PLAN as one broadcast
    context row (two 1-row aggregates cross-joined); the main scan then
    cross-join-broadcasts that row and does per-row argmax cell assignment
    with JVM higher-order functions over the seeds array.

    Scale shape: narrow map over the scan (O(n_cells) work per row, an
    array ``transform``/``array_sort`` — linear in cells, unlike a
    pairwise-comparison expression tree which is O(cells²) and caps at
    tens of cells), then candidate filter, then TakeOrderedAndProject.
    The only exchange in the plan is the broadcast of the 1-row context;
    no shuffle until the final top-k reduce. At 1000 executors this is a
    single pass over the data with a tiny broadcast — the same shape a
    production IVF probe uses.

    ``assign="gemm"`` (default) moves the corpus cell assignment onto
    :func:`gemm_assign_cells` (``dot="float"`` flavor: the kernel
    replays :func:`_dot`'s left-fold sum dimension-by-dimension, so the
    cosines — and therefore the oracle — are bit-identical); ``"hof"``
    keeps the interpreted in-plan argmax (VERDICT r9 weak #1: ~1 ms/row
    at 512 cells). The probe's own cell ranking stays in-plan — it is
    one row.
    """
    seeds = df.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).cast("int").alias("cell_id"),
        F.col(vec_col).alias("semb"),
    )
    # one row: all seeds as an array of (cell_id, embedding, norm) structs.
    # collect_list order is nondeterministic, but every consumer below is
    # an order-independent argmax/sort with a full tie-break.
    seeds_row = seeds.agg(
        F.collect_list(
            F.struct(
                F.col("cell_id"), F.col("semb"), _norm(F.col("semb")).alias("snorm")
            )
        ).alias("seeds")
    )
    probe_row = df.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("probe_emb"), _norm(F.col(vec_col)).alias("probe_nrm")
    ).limit(1)  # provably 1-row broadcast context (see cosine_topk_by_id)

    def _seed_cos(emb: Column, nrm: Column):
        """array<struct<negcos,cell_id>> sorted asc = cosine desc, id asc."""
        return F.array_sort(
            F.transform(
                F.col("seeds"),
                lambda s: F.struct(
                    (-F.round(_dot(emb, s["semb"]) / (nrm * s["snorm"]), 6)).alias(
                        "negcos"
                    ),
                    s["cell_id"].alias("cell_id"),
                ),
            )
        )

    ctx = (
        probe_row.crossJoin(seeds_row)
        .withColumn(
            "probe_cells",
            F.slice(
                F.transform(
                    _seed_cos(F.col("probe_emb"), F.col("probe_nrm")),
                    lambda s: s["cell_id"],
                ),
                1,
                n_probe,
            ),
        )
        .select("probe_emb", "probe_nrm", "seeds", "probe_cells")
    )

    base = df.withColumn("__nrm", _norm(F.col(vec_col)))
    if assign == "gemm":
        assigned = gemm_assign_cells(
            base,
            seeds_row,
            id_col=id_col,
            vec_col=vec_col,
            nrm_col="__nrm",
            dot="float",
            extra_cols=tuple(keep_cols),
            n_blocks=n_blocks,
        ).crossJoin(F.broadcast(ctx.select("probe_emb", "probe_nrm", "probe_cells")))
    else:
        assigned = base.crossJoin(F.broadcast(ctx)).withColumn(
            "cell_id",
            F.element_at(_seed_cos(F.col(vec_col), F.col("__nrm")), 1)[
                "cell_id"
            ],
        )
    cand = assigned.filter(
        F.array_contains(F.col("probe_cells"), F.col("cell_id"))
        & (F.col(id_col) != probe_id)
    )
    cosine = F.round(
        _dot(F.col(vec_col), F.col("probe_emb")) / (F.col("__nrm") * F.col("probe_nrm")),
        6,
    )
    return (
        cand.select(id_col, *keep_cols, cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_batch_topk(
    df: DataFrame,
    probe_pred: Column,
    n_cells: int = 8,
    n_probe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    assign: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """Batched IVF ANN: top-``k`` for EVERY probe selected by
    ``probe_pred`` in one plan — the realistic serving shape (queries
    arrive in batches; per-probe plans re-scan and re-assign the corpus
    m times, this does it once).

    Scale shape vs m× :func:`ivf_topk`:

    - the seeds context row and the per-row cell ASSIGNMENT (the
      O(n·cells) narrow map that dominates the single-probe plan) are
      computed ONCE and shared by all probes;
    - the probe relation — (probed_cell, probe_id, probe_emb) with
      n_probe rows per probe — is a broadcast; candidates come from an
      equi-join of assigned rows to it ON the cell id, so each data row
      is evaluated only against probes probing ITS cell (never a
      per-probe pass, never a cartesian against the probe batch);
    - the per-probe top-k is one window over the candidate set
      (partitioned by probe, full cosine/id tie-break), shuffling only
      candidates (probed-cell populations × colliding probes), not the
      corpus.

    All distances are grid-exact (int64 dots, round-6 cosines) so the
    batch carries a full value-hash DuckDB oracle; assignment argmax and
    per-probe ranking tie-break on cell/vec id.

    ``assign="gemm"`` (default) routes the corpus cell assignment — the
    dominant O(n·cells) stage — through :func:`gemm_assign_cells`
    (Arrow/numpy blocks, bit-identical values, oracle unchanged);
    ``"hof"`` keeps the in-plan nested-HOF argmax, whose per-row
    interpreter round 8 measured at ~1 ms/row at 512 cells (VERDICT r9
    weak #1). The probe side stays on the HOF path either way: probes
    are a ~1% selection, two orders of magnitude off the corpus map."""
    from pyspark.sql import Window

    seeds = df.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).cast("int").alias("cell_id"),
        F.col(vec_col).alias("semb"),
    )
    seeds_row = seeds.agg(
        F.collect_list(
            F.struct(
                F.col("cell_id"),
                F.col("semb"),
                _grid_norm6(F.col("semb")).alias("snorm"),
            )
        ).alias("seeds")
    )

    def _seed_cos(emb: Column, nrm: Column) -> Column:
        return F.array_sort(
            F.transform(
                F.col("seeds"),
                lambda s: F.struct(
                    (
                        -F.round(
                            (_grid_dot(emb, s["semb"]) / float(PQ_GRID))
                            / (nrm * s["snorm"]),
                            6,
                        )
                    ).alias("negcos"),
                    s["cell_id"].alias("cell_id"),
                ),
            )
        )

    base = df.withColumn("__nrm", _grid_norm6(F.col(vec_col)))
    if assign == "gemm":
        assigned = gemm_assign_cells(
            base,
            seeds_row,
            id_col=id_col,
            vec_col=vec_col,
            nrm_col="__nrm",
            dot="grid",
            extra_cols=tuple(keep_cols),
            n_blocks=n_blocks,
        )
    else:
        j = base.crossJoin(F.broadcast(seeds_row))
        assigned = j.withColumn(
            "cell_id",
            F.element_at(_seed_cos(F.col(vec_col), F.col("__nrm")), 1)[
                "cell_id"
            ],
        ).drop("seeds")

    probes = (
        df.filter(probe_pred)
        .select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_emb"),
            _grid_norm6(F.col(vec_col)).alias("probe_nrm"),
        )
        .crossJoin(F.broadcast(seeds_row))
        .select(
            "probe_id",
            "probe_emb",
            "probe_nrm",
            F.explode(
                F.slice(
                    F.transform(
                        _seed_cos(F.col("probe_emb"), F.col("probe_nrm")),
                        lambda s: s["cell_id"],
                    ),
                    1,
                    n_probe,
                )
            ).alias("cell_id"),
        )
    )

    cand = assigned.join(F.broadcast(probes), "cell_id").filter(
        F.col(id_col) != F.col("probe_id")
    )
    cosine = F.round(
        (_grid_dot(F.col(vec_col), F.col("probe_emb")) / float(PQ_GRID))
        / (F.col("__nrm") * F.col("probe_nrm")),
        6,
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        cand.select(
            "probe_id", F.col(id_col), *keep_cols, cosine.alias("cosine")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", id_col, *keep_cols, "cosine")
    )


def pairwise_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (brute force O(n²) — correctness
    baseline; use :func:`lsh_similarity_join` at scale).

    Per-pair work is ONE dot product: norms are hoisted to the per-vector
    projections (identical float expression, so identical values — they
    were previously re-reduced per pair, 3 HOF aggregates instead of 1,
    measured 75s → 7s on the 2k-vector fixture), and the 6-decimal
    rounding (a per-call BigDecimal in the JVM) is gated behind a strictly
    looser raw-dot prefilter ``dot ≥ (t − 1e-6)·na·nb`` — round(cos,6) ≥ t
    implies cos ≥ t − 5e-7, so no qualifying pair can be lost."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("__dot", _dot(F.col("va"), F.col("vb")))
        .filter(
            F.col("__dot")
            >= (threshold - 1e-6) * F.col("na") * F.col("nb")
        )
        .withColumn(
            "cosine",
            F.round(F.col("__dot") / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _round6_half_up(x: float) -> float:
    """round(x, 6) with EXACTLY ``F.round``'s semantics: the JVM rounds
    doubles via ``BigDecimal.valueOf(x)`` — which parses
    ``Double.toString(x)``'s shortest round-trip repr — then HALF_UP.
    Python's ``repr(float)`` is the same shortest-repr algorithm, so
    ``Decimal(repr(x))`` sees the identical decimal value. The naive
    ``floor(x·1e6 + 0.5)`` disagrees for doubles whose shortest repr ends
    in '5' but whose binary value sits below the decimal midpoint (e.g.
    the double nearest 0.1234565 rounds to 0.123457 under F.round but
    0.123456 under floor — ADVICE r7 medium); kernels that feed
    hash-oracled queries must use this form."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _np_round6(v):
    """Vectorized ``F.round(x, 6)`` over a float64 array — the batch form
    of :func:`_round6_half_up`, for kernels whose OUTPUT is the rounded
    value itself (the pair-refine tier emits round-6 cosines for every
    surviving pair, so a per-value Decimal would put an interpreter back
    in the hot path it just left).

    Fast path: ``y = |v|·1e6`` has absolute error < 1.2e-10 (rel 2⁻⁵³ at
    |v| ≤ 1 scaled by 1e6) and the shortest-repr decimal F.round actually
    parses differs from v by < half an ulp (< 5.6e-11 scaled). So when
    the fraction of y is ≥ 1e-8 away from the 0.5 midpoint, plain
    floor/ceil on y equals HALF_UP on the decimal — both errors are two
    orders of magnitude inside the guard. Only values INSIDE the guard
    band (possible midpoint stragglers, O(near-boundary values) not
    O(rows)) fall back to the exact Decimal path. Zeros are normalized
    to +0.0: the JVM's BigDecimal has no signed zero, so ``F.round``
    returns +0.0 where ``copysign`` would produce −0.0.

    Values are BIT-IDENTICAL to ``F.round``: the fast path's
    ``k / 1e6`` is the correctly-rounded double of the decimal k·10⁻⁶ —
    the same double ``BigDecimal.setScale(6).doubleValue()`` returns."""
    import numpy as np

    a = np.abs(v)
    y = a * 1e6
    fy = np.floor(y)
    frac = y - fy
    out = np.copysign((fy + (frac >= 0.5)) / 1e6, v)
    risky = np.abs(frac - 0.5) < 1e-8
    if risky.any():
        idx = np.nonzero(risky)[0]
        out[idx] = [_round6_half_up(float(v[i])) for i in idx]
    out[out == 0.0] = 0.0
    return out


def brute_cosine_pairs_blocked(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 32,
    n_b_shards: int = 1,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold as a BLOCKED GEMM: Spark does
    the blocking, numpy does the arithmetic.

    :func:`pairwise_cosine_pairs` expresses the same computation
    declaratively, but a dense dot product per joined row runs as a
    per-pair HOF — an array allocation plus 64 interpreted multiply-adds
    per pair, measured ~40s for 2M pairs at the fixture dim. A dense
    all-pairs similarity IS matrix multiplication, the canonical case
    where a vectorized kernel beats row-at-a-time expressions by orders
    of magnitude, so this tier ships each row-block × full-matrix product
    to BLAS via Arrow (measured: 1.5s same fixture, ~27×).

    Plan shape — a BLOCK-PAIR GRID: rows hash into ``n_blocks``
    row-blocks via ``pmod(xxhash64(id), n_blocks)`` (works, and stays
    uniform, for ANY id type; blocking on ``pmod(id, n)`` silently
    produced NULL blocks for non-numeric ids, vanishing their rows —
    ADVICE r7), and the B side hashes into ``n_b_shards`` column-shards
    on an independent hash stream. The shards broadcast-cross-join onto
    every row-block (the seeds_row pattern — NO driver-side collect, the
    plan stays lazy end to end), giving ``n_blocks × n_b_shards`` grid
    cells, each a task-sized GEMM; ``mapInArrow`` emits the qualifying
    (id_a, id_b, cosine) triples per cell. Each (a, b) pair lands in
    EXACTLY one cell (a's row-block × b's shard), so no dedup pass is
    needed. The id column keeps its input type in the output, like the
    declarative tier.

    ``n_b_shards=1`` (default, local scale) keeps the whole matrix in
    one broadcast row. At cluster scale a single Spark row holding the
    full matrix is the binding limit (row sizes are capped well before
    executor memory is), so callers size ``n_b_shards`` to hold each
    shard under the practical broadcast-row budget (e.g. 64 MB:
    ``n_b_shards = ceil(n·dim·8 / 64e6)``) — the blocked-GEMM
    decomposition is exactly how distributed dense linear algebra is
    always laid out (VERDICT r7 item 6; pair-identity vs the sharded
    and declarative tiers asserted in
    test_brute_blocked_b_shards_pair_identical).

    Determinism: the float64 GEMM only SELECTS candidates (with the same
    strictly-looser ``cos ≥ t − 1e-6`` prefilter the declarative tier
    uses — round(cos,6) ≥ t implies cos ≥ t − 5e-7, so no qualifying
    pair can be lost); each candidate's cosine is then rounded via
    ``decimal.Decimal(repr(cos))`` HALF_UP onto the 1e-6 grid, which is
    exactly ``F.round``'s semantics (JVM ``BigDecimal.valueOf(double)``
    parses ``Double.toString``'s shortest round-trip repr — Python
    ``repr(float)`` is the same shortest-repr algorithm). The previous
    ``floor(cos·1e6 + 0.5)`` rounding disagreed with F.round for doubles
    whose shortest repr ends in '5' but whose binary value sits below
    the midpoint — a boundary pair could flip kept/dropped between tiers
    under a value-hash oracle (ADVICE r7 medium). Candidates are few
    (pairs near/above threshold, not the n²/blocks scan), so per-value
    Decimal rounding costs nothing measurable; the O(n²) work stays in
    BLAS.
    """
    id_type = dict(df.dtypes)[id_col]
    bside = (
        df.withColumn(
            # A DIFFERENT hash stream than the row-blocking (seeded
            # xxhash64) so grid cells stay decorrelated from row blocks.
            "__bsh",
            F.pmod(F.xxhash64(F.col(id_col), F.lit(7)), F.lit(n_b_shards)),
        )
        .groupBy("__bsh")
        .agg(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"),
                )
            ).alias("bfull")
        )
    )
    blocks = (
        df.withColumn(
            "__blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
        )
        .groupBy("__blk")
        .agg(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"),
                )
            ).alias("ablock")
        )
    )
    ctx = blocks.crossJoin(F.broadcast(bside))
    thr = float(threshold)

    # round 16 (guide §4.2, VERDICT r15 #3): raw Arrow batches — vectors
    # reshape zero-copy per grid cell instead of materializing one
    # ndarray per row; only the few candidate ids near/above threshold
    # ever become Python objects (for the exact a<b / Decimal round-6
    # path, which is unchanged).
    def gemm_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import arrow_list_to_2d

        id_at = None
        for rb in batches:
            if not rb.num_rows:
                continue
            ab, bf = rb.column("ablock"), rb.column("bfull")
            aoffs = ab.offsets.to_numpy()
            boffs = bf.offsets.to_numpy()
            if id_at is None:
                id_at = ab.values.field("id").type
            out_a, out_b, out_c = [], [], []
            for r in range(rb.num_rows):
                a_ent = ab.values.slice(
                    aoffs[r], aoffs[r + 1] - aoffs[r]
                )
                b_ent = bf.values.slice(
                    boffs[r], boffs[r + 1] - boffs[r]
                )
                va = arrow_list_to_2d(a_ent.field("v"), np.float64)
                vb = arrow_list_to_2d(b_ent.field("v"), np.float64)
                cos = (va @ vb.T) / np.outer(
                    np.linalg.norm(va, axis=1),
                    np.linalg.norm(vb, axis=1),
                )
                ii, jj = np.nonzero(cos >= thr - 1e-6)
                if not ii.size:
                    continue
                ida = a_ent.field("id").to_pylist()
                idb = b_ent.field("id").to_pylist()
                for i, j in zip(ii, jj):
                    a, b = ida[i], idb[j]
                    if not a < b:
                        continue
                    c = _round6_half_up(cos[i, j])
                    if c >= thr:
                        out_a.append(a)
                        out_b.append(b)
                        out_c.append(c)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_a, type=id_at),
                    pa.array(out_b, type=id_at),
                    pa.array(out_c, type=pa.float64()),
                ],
                ["id_a", "id_b", "cosine"],
            )

    return ctx.mapInArrow(
        gemm_batches, f"id_a {id_type}, id_b {id_type}, cosine double"
    )


def lsh_similarity_join(
    df: DataFrame,
    threshold: float = 0.8,
    n_planes: int = 16,
    n_bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
) -> DataFrame:
    """Random-hyperplane LSH near-neighbor join, fully relational.

    signature bit i = sign(v · h_i) for seeded hyperplanes h_i; the
    n_planes bits split into n_bands bands; candidate pairs share ≥1 band
    value (equi join on (band, band_sig) — sub-quadratic); refined with the
    exact cosine. Deterministic given the seed, but recall is approximate →
    rows-only driver check.

    Tuning (measured, tools/ann_recall.py + RECALL.md; matches the
    hyperplane-LSH closed form recall = 1 − (1 − p^b)^L with
    p = 1 − acos(t)/π): at t = 0.35 the old (16 planes, 4 bands = 4-bit
    bands) default measured only 0.48 pair recall; the (16, 8) default
    (2-bit bands) measures 0.97–0.98 at both fixture scales, trading ~3×
    more candidate-join volume. Precision is always 1.0 — candidates are
    refined with the exact cosine before the threshold filter. Use wider
    bands (higher bits_per_band) only for thresholds well above 0.6.

    ``dim`` (required): embedding dimensionality. Callers always know it
    (it's part of the table contract); requiring it keeps plan construction
    100% lazy — no first()-probe job hidden inside what looks like a pure
    plan-building call.

    Round-12 plan modernization (values unchanged — the float sign bits,
    candidate SET, and left-fold cosine are all replicated exactly):
    banding runs over BARE ids with first-matching-band emission
    (:func:`_first_match_pairs` — the pair-level distinct over rows
    CARRYING dim-64 arrays is gone, the heaviest possible distinct),
    vectors + hoisted norms rejoin by id afterwards, and the refine is
    the float flavor of :func:`gemm_pair_cosine_refine` (termwise
    left-fold accumulation, bit-identical to the in-plan
    :func:`_dot`).
    """
    planes = lsh_planes(n_planes, dim, seed)
    bits_per_band = n_planes // n_bands

    sig_bits = [
        F.when(_dot(F.col(vec_col), F.array(*[F.lit(x) for x in p])) >= 0, 1)
        .otherwise(0)
        .alias(f"bit{i}")
        for i, p in enumerate(planes)
    ]
    band_cols = [
        F.concat_ws(
            "",
            *[F.col(f"bit{b * bits_per_band + j}") for j in range(bits_per_band)],
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    sig = df.select(F.col(id_col), *sig_bits).select(id_col, *band_cols)
    cand = _first_match_pairs(sig, n_bands, bits_per_band, id_col)
    pairs = _pair_vectors_joined(cand, df, id_col, vec_col, norm="float")
    return gemm_pair_cosine_refine(
        pairs, threshold, id_type=dict(df.dtypes)[id_col], dot="float"
    )


#: Brute-vs-LSH crossover for embedding near-dup pair generation, in input
#: vectors. Measured on the 64-dim fixture embeddings (BASELINE_HISTORY.md "Scale
#: note on the embedding-dedup pair"): brute all-pairs wins at n=2,000
#: (0.26 s vs 1.44 s — LSH's banding/dedup overhead dominates while n² is
#: small) and loses asymptotically (n² pair work vs ~n·bands); the measured
#: 16× smoke (32k vectors, tools/scaleup_smoke.py) sits firmly on the LSH
#: side. 8192 is the midpoint of the measured bracket.
EMBED_DEDUP_CROSSOVER = 8192


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float,
    n_vectors: int,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs (cosine ≥ threshold) with automatic
    exact/approximate path selection.

    ``n_vectors`` ≤ :data:`EMBED_DEDUP_CROSSOVER` → exact all-pairs via
    the blocked-GEMM kernel (:func:`brute_cosine_pairs_blocked` — full
    recall, O(n²) FLOPs but vectorized; the declarative
    :func:`pairwise_cosine_pairs` stays as the transparent oracle-baseline
    tier); above it → hyperplane-LSH banded join
    (:func:`lsh_similarity_join` — sub-quadratic, approximate recall,
    precision property test-asserted). Callers supply ``n_vectors`` from
    metadata (parquet footer row count locally; catalog/ANALYZE statistics
    on a real cluster) so selection costs zero Spark jobs and the plan
    stays lazy.
    """
    if n_vectors <= EMBED_DEDUP_CROSSOVER:
        return brute_cosine_pairs_blocked(
            df, threshold=threshold, id_col=id_col, vec_col=vec_col
        )
    return lsh_similarity_join(
        df,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        dim=dim,
    )


def _ivf_cell_argmax(emb, nrm):
    """Nearest-cell id for one row against the broadcast ``seeds``
    list column — the interpreted (``assign="hof"``) per-row argmax
    shared by both IVF assignment passes."""
    return F.element_at(
        F.array_sort(
            F.transform(
                F.col("seeds"),
                lambda s: F.struct(
                    (
                        -F.round(_dot(emb, s["semb"]) / (nrm * s["snorm"]), 6)
                    ).alias("negcos"),
                    s["cell_id"].alias("cell_id"),
                ),
            )
        ),
        1,
    )["cell_id"]


def ivf_build_centroids(
    df: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """The TRAINING half of :func:`ivf_kmeans_topk`: one relational Lloyd
    step producing the refined centroid relation ``(cell_id int,
    semb array<double>)``.

    1. assign each vector to its nearest seed (ids < n_cells), exactly as
       :func:`ivf_topk` does;
    2. recompute each cell's centroid as the element-wise mean — the sums
       run over the embedding's 1e-8 decimal grid as int64 (order-
       independent, hash-exact), divided once.

    The output is a plain two-column relation, so it persists through the
    S5 parquet sink unchanged (arrays of double round-trip bit-exact) —
    the build-once / search-many index workflow
    (:func:`ivf_search_centroids`, queries/similarity.py
    ``sim_ivf_persisted_topk``). Norms are NOT stored: they are derived
    data, recomputed from ``semb`` on load with the same ``_norm``
    expression, so a persisted index cannot carry a stale norm.
    """
    GRID = 100_000_000  # embeddings are rounded to 8 decimals

    seeds = df.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).cast("int").alias("cell_id"),
        F.col(vec_col).alias("semb"),
    )
    seeds_row = seeds.agg(
        F.collect_list(
            F.struct(
                F.col("cell_id"), F.col("semb"), _norm(F.col("semb")).alias("snorm")
            )
        ).alias("seeds")
    )
    base = df.withColumn("__nrm", _norm(F.col(vec_col)))
    if assign == "gemm":
        a1 = gemm_assign_cells(
            base,
            seeds_row,
            id_col=id_col,
            vec_col=vec_col,
            nrm_col="__nrm",
            dot="float",
            n_blocks=n_blocks,
        ).withColumnRenamed("cell_id", "cell1")
    else:
        a1 = base.crossJoin(F.broadcast(seeds_row)).withColumn(
            "cell1", _ivf_cell_argmax(F.col(vec_col), F.col("__nrm"))
        )

    exploded = a1.select(
        "cell1", F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    cent_components = exploded.groupBy("cell1", "pos").agg(
        (
            # x is FLOAT in the fixture: the product must run in DOUBLE
            # (matching DuckDB's float→double promotion) or the binary32
            # product crosses round()'s .5 ties differently and the
            # centroid numerators drift by ±1 grid unit — caught when the
            # persisted-index oracle exposed raw centroid values
            # (sim_ivf_persist_build, round 13).
            F.sum(F.round(F.col("x").cast("double") * GRID).cast("long"))
            / (F.count(F.lit(1)) * float(GRID))
        ).alias("c")
    )
    return (
        cent_components.groupBy("cell1")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("semb")
        )
        .select(F.col("cell1").cast("int").alias("cell_id"), "semb")
    )


def _ivf_seeds_row(centroids: DataFrame) -> DataFrame:
    """Collapse a centroid relation ``(cell_id, semb)`` to the 1-row
    ``seeds`` broadcast context (norms recomputed — derived data never
    persists). Shared by the search, assignment-build, and
    inverted-list serving paths so the seed layout can't drift."""
    return centroids.select(
        "cell_id", "semb", _norm(F.col("semb")).alias("snorm")
    ).agg(F.collect_list(F.struct("cell_id", "semb", "snorm")).alias("seeds"))


def _ivf_probe_ctx(
    df: DataFrame,
    centroids: DataFrame,
    probe_id: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The 1-row probe context (probe vector + norm, seeds, and the
    probe's top-``n_probe`` cells by round-6 cosine, ties to the smaller
    cell id) — the routing decision every IVF serving path shares."""
    cent_row = _ivf_seeds_row(centroids)
    probe_row = df.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("probe_emb"), _norm(F.col(vec_col)).alias("probe_nrm")
    ).limit(1)  # provably 1-row broadcast context (see cosine_topk_by_id)
    return (
        probe_row.crossJoin(cent_row)
        .withColumn(
            "probe_cells",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.transform(
                            F.col("seeds"),
                            lambda s: F.struct(
                                (
                                    -F.round(
                                        _dot(F.col("probe_emb"), s["semb"])
                                        / (F.col("probe_nrm") * s["snorm"]),
                                        6,
                                    )
                                ).alias("negcos"),
                                s["cell_id"].alias("cell_id"),
                            ),
                        )
                    ),
                    lambda s: s["cell_id"],
                ),
                1,
                n_probe,
            ),
        )
        .select("probe_emb", "probe_nrm", "seeds", "probe_cells")
    )


def ivf_search_centroids(
    df: DataFrame,
    centroids: DataFrame,
    probe_id: int = 1,
    n_probe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    assign: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """The SEARCH half of :func:`ivf_kmeans_topk`: given a centroid
    relation ``(cell_id, semb)`` — freshly built or loaded from a
    persisted parquet index — assign every corpus vector to its nearest
    centroid, route the probe to its top ``n_probe`` centroid cells, and
    take the exact top-k inside the probed cells.

    Centroid norms are recomputed here from ``semb`` (derived data never
    persists), then the whole ≤``n_cells``-row index collapses to a
    1-row broadcast context exactly as in :func:`ivf_kmeans_topk` — the
    search never shuffles the corpus; its one wide stage is the
    narrow assignment map over the scan.
    """
    base = df.withColumn("__nrm", _norm(F.col(vec_col)))
    ctx = _ivf_probe_ctx(df, centroids, probe_id, n_probe, id_col, vec_col)
    if assign == "gemm":
        a2 = gemm_assign_cells(
            base,
            _ivf_seeds_row(centroids),
            id_col=id_col,
            vec_col=vec_col,
            nrm_col="__nrm",
            dot="float",
            extra_cols=tuple(keep_cols),
            n_blocks=n_blocks,
        ).withColumnRenamed("cell_id", "cell2").crossJoin(
            F.broadcast(
                ctx.select("probe_emb", "probe_nrm", "probe_cells")
            )
        )
    else:
        a2 = base.crossJoin(F.broadcast(ctx)).withColumn(
            "cell2", _ivf_cell_argmax(F.col(vec_col), F.col("__nrm"))
        )
    cand = a2.filter(
        F.array_contains(F.col("probe_cells"), F.col("cell2"))
        & (F.col(id_col) != probe_id)
    )
    cosine = F.round(
        _dot(F.col(vec_col), F.col("probe_emb"))
        / (F.col("__nrm") * F.col("probe_nrm")),
        6,
    )
    return (
        cand.select(id_col, *keep_cols, cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_assignments(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    n_blocks: int | None = None,
) -> DataFrame:
    """The PERSISTABLE inverted-list relation of an IVF index:
    ``(cell_id, id, vec, *keep_cols)`` — every vector stored WITH its
    coarse-cell assignment, the FAISS inverted-file layout. Persisted
    partitioned by ``cell_id``, a search scans only its probed cells'
    partition directories (n_probe/n_cells of the data) instead of
    re-assigning the whole corpus per query, which is what
    :func:`ivf_search_centroids` — the index-BUILD-time assignment pass —
    pays. Assignment runs the same :func:`gemm_assign_cells` float-flavor
    kernel as the search path, so a persisted assignment equals the one
    the search would compute, and the ``sim_ivf_*`` oracles apply
    unchanged. Norms are derived data: dropped here, recomputed at
    serve."""
    base = df.withColumn("__nrm", _norm(F.col(vec_col)))
    return gemm_assign_cells(
        base,
        _ivf_seeds_row(centroids),
        id_col=id_col,
        vec_col=vec_col,
        nrm_col="__nrm",
        dot="float",
        extra_cols=tuple(keep_cols),
        n_blocks=n_blocks,
    ).select("cell_id", id_col, vec_col, *keep_cols)


def ivf_topk_from_assignments(
    assignments: DataFrame,
    probe_src: DataFrame,
    centroids: DataFrame,
    probe_id: int = 1,
    n_probe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """IVF top-k served from the persisted inverted-list relation — the
    steady-state ANN read path: NO corpus-wide assignment map runs. The
    probe routes to its top ``n_probe`` cells (the shared
    :func:`_ivf_probe_ctx` decision), the assignment scan prunes to
    those cells, and the exact top-k runs over only the pruned rows with
    the same round-6 cosine as :func:`ivf_search_centroids` — identical
    candidates, identical values, same oracle.

    The cell routing is collected driver-side (ONE bounded control-plane
    job over two tiny relations: the ≤n_cells-row centroid index and the
    pushed-filter probe lookup) so the probed cell ids are LITERALS in
    the scan filter — that is what lets parquet partition pruning drop
    the other n_cells − n_probe directories at plan time. This mirrors
    FAISS serving, where the coarse quantizer runs on the query node;
    an in-plan routing decision would keep the plan driver-job-free but
    read every cell partition. At 100 TB the pruned scan IS the index."""
    ctx = _ivf_probe_ctx(
        probe_src, centroids, probe_id, n_probe, id_col, vec_col
    )
    cells = [
        int(c) for c in ctx.select("probe_cells").first()["probe_cells"]
    ]
    cand = assignments.filter(
        F.col("cell_id").isin(cells) & (F.col(id_col) != probe_id)
    ).withColumn("__nrm", _norm(F.col(vec_col)))
    scored = cand.crossJoin(
        F.broadcast(ctx.select("probe_emb", "probe_nrm"))
    )
    cosine = F.round(
        _dot(F.col(vec_col), F.col("probe_emb"))
        / (F.col("__nrm") * F.col("probe_nrm")),
        6,
    )
    return (
        scored.select(id_col, *keep_cols, cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_kmeans_topk(
    df: DataFrame,
    n_cells: int = 8,
    probe_id: int = 1,
    n_probe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    assign: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """IVF top-k with one relational Lloyd (k-means) refinement step —
    the "trained centroids" upgrade over :func:`ivf_topk`'s raw seeds.

    Since round 13 this is literally
    ``ivf_search_centroids(df, ivf_build_centroids(df, ...), ...)`` — the
    train/search split exists so the trained index can be PERSISTED once
    and searched many times (VERDICT r12 next-round #8); composing the
    halves in one lineage reproduces the original single-plan form
    (explode → two hash aggregates → broadcast 1-row centroid context →
    narrow map; no driver-side jobs, no Python iteration loop).

    ``assign="gemm"`` (default) routes BOTH corpus assignment passes
    (seed assignment feeding the centroid recompute, and centroid
    re-assignment) through :func:`gemm_assign_cells` (``dot="float"``,
    bit-identical left-fold cosines — oracle unchanged); ``"hof"`` keeps
    the interpreted per-row argmax. Training via k-means is exactly the
    workload where the interpreter multiplies: every Lloyd step pays the
    O(n·cells) map again.
    """
    centroids = ivf_build_centroids(
        df,
        n_cells=n_cells,
        id_col=id_col,
        vec_col=vec_col,
        assign=assign,
        n_blocks=n_blocks,
    )
    return ivf_search_centroids(
        df,
        centroids,
        probe_id=probe_id,
        n_probe=n_probe,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        keep_cols=keep_cols,
        assign=assign,
        n_blocks=n_blocks,
    )


#: 1e-9 integer grid for the PQ float sums: every per-element product is
#: rounded onto the grid and accumulated as int64, so the sums are
#: associative (order-independent) and bit-identical across engines —
#: the functions/exact.py money_sum technique applied to dot products.
#: Bound: |term| <= 64 → 6.4e10 per term, × dim 64 ≈ 4e12 per sum « 2^63.
PQ_GRID = 1_000_000_000


def _grid_sum(a: Column, b: Column, f) -> Column:
    """Σ round(f(a_i, b_i) · PQ_GRID) as int64 over two equal-length
    arrays — an order-independent, cross-engine-exact float reduction."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.round(f(x.cast("double"), y.cast("double")) * PQ_GRID).cast(
                "long"
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _grid_dot(a: Column, b: Column) -> Column:
    return _grid_sum(a, b, lambda x, y: x * y)


#: semantic_dedup element grid — quantize each vector ONCE (1e-7/element)
#: so the Σ|cell|² pair scan reduces in pure int64 multiply-adds with no
#: per-pair rounding. round() on doubles goes through BigDecimal in the
#: JVM; paying it per pair × per element made the grid-exact conversion
#: ~24× slower than the float path it replaced (measured round 7:
#: dedup_semantic 0.43s → 10.3s at sf0.1, back to ~0.5s with this form).
SEM_QSCALE = 10_000_000


def _sem_quant(v: Column) -> Column:
    """Per-element int64 quantization ``round(x·1e7)`` — applied once per
    VECTOR. Bound: dim 64 · (|x|max·1e7)² ≤ 2⁶³ ⇒ |x| ≤ ~37 per element;
    unit-scale embeddings are far inside. Both engines quantize the same
    double the same way, so downstream dots/norms are bit-identical.

    The bound is ENFORCED, not just documented: an out-of-range element
    would silently wrap the ``_sem_qdot`` int64 sum and corrupt
    semantic-dedup decisions, so the quantized value is woven through an
    ``assert_true`` on max |element| (the pagerank-wdeg pattern — the
    ``when(assert.isNull(), q)`` form keeps column pruning from eliding
    the check; ADVICE r7)."""
    q = F.transform(
        v, lambda x: F.round(x.cast("double") * SEM_QSCALE).cast("long")
    )
    max_abs = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    return F.when(
        F.assert_true(
            max_abs <= F.lit(37.0),
            "semantic-dedup quantization overflow: |element| > 37 would "
            "wrap the int64 grid dot (dim 64 · (37e7)² ≈ 2⁶³) — rescale "
            "the embeddings or lower SEM_QSCALE",
        ).isNull(),
        q,
    )


def _sem_qdot(a: Column, b: Column) -> Column:
    """Exact int64 Σ a_i·b_i over two quantized arrays — the pair-scan
    hot path: one multiply and one add per element, nothing else."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _sem_qnorm6(q: Column) -> Column:
    """``round(‖q‖/1e7, 6)`` from a quantized array."""
    return F.round(F.sqrt(_sem_qdot(q, q).cast("double")) / SEM_QSCALE, 6)


def _grid_norm6(a: Column) -> Column:
    """round(‖a‖, 6) with the grid-exact inner sum."""
    return F.round(F.sqrt(_grid_sum(a, a, lambda x, y: x * y) / float(PQ_GRID)), 6)


def _assert_contiguous_ids(
    seeds: Column, id_field: str, n: int, what: str
) -> Column:
    """Validate that a 1-row, id-sorted codebook array covers ids 0..n-1
    exactly, returning it unchanged.

    ADC scoring indexes ptab/codebook arrays POSITIONALLY by code value
    (``table[s][code]`` — an O(1) lookup per term in the hot codes scan).
    That is only sound when the k-th entry of the id-sorted array has
    id == k, i.e. the seed ids are 0-based and contiguous. Rather than pay
    a per-row by-value search in the scan, assert the invariant once in
    the 1-row broadcast context: a filtered relation or a 1-based id space
    fails loudly here instead of silently shifting every adc score. The
    assert is woven into the seeds value itself (``when(assert.isNull(),
    seeds)``) so column pruning cannot elide it.
    """
    ok = F.transform(seeds, lambda c: c[id_field]) == F.sequence(
        F.lit(0), F.lit(n - 1)
    )
    return F.when(
        F.assert_true(
            ok,
            f"{what}: seed ids must be exactly 0..{n - 1} (0-based "
            "contiguous) for positional ADC lookup — re-key the relation "
            "(dense_rank the ids) or lower n to the available seed count",
        ).isNull(),
        seeds,
    )


def _np_round_half_away(v):
    """Vectorized EXACT replica of ``F.round`` on a double (BigDecimal
    HALF_UP on the shortest-repr decimal → half-away-from-zero on the
    double's value, since every half-integer < 2⁵² is itself an exact
    double and a shortest repr can never cross a neighboring double).

    NOT ``floor(v+0.5)``: for v one ulp below 0.5 the sum ``v+0.5``
    is inexact and rounds up to 1.0, crossing the boundary (caught by
    test_gemm_assign_round_fastpath_matches_f_round). Instead take
    ``frac = |v| − floor(|v|)`` — exact by Sterbenz (x−y exact when
    y ≤ x ≤ 2y; here floor(a) ≤ a < 2·floor(a) for a ≥ 1, and a−0 for
    a < 1) — and compare the exact fraction to 0.5."""
    import numpy as np

    a = np.abs(v)
    fa = np.floor(a)
    return np.copysign(fa + (a - fa >= 0.5), v).astype(np.int64)


def _np_round_half_away_consume(v):
    """:func:`_np_round_half_away` with fused in-place temporaries —
    identical values (same abs/floor/half-compare/copysign sequence on
    the same float64 inputs), ~2 fewer full-array allocations per call.
    CONSUMES ``v``: the caller must own the (freshly allocated) array
    and not reuse it afterwards."""
    import numpy as np

    a = np.abs(v)
    fa = np.floor(a)
    np.subtract(a, fa, out=a)
    fa += a >= 0.5
    np.copysign(fa, v, out=fa)
    return fa.astype(np.int64)


#: Target bytes of corpus rows collected into ONE kernel block (one
#: ``collect_list`` array value inside one executor task) — the binding
#: sizing constraint at scale; see :func:`kernel_block_count`.
KERNEL_BLOCK_BYTES = 128 << 20


def kernel_block_count(
    df: DataFrame,
    n_blocks: int | None = None,
    *,
    target_block_bytes: int = KERNEL_BLOCK_BYTES,
) -> int:
    """Derive an Arrow-kernel block count from PLAN BYTES, floored by
    parallelism: ``max(2 × defaultParallelism, ceil(est / 128 MB))``.

    Why bytes and not cores (VERDICT r10 weak #1): each kernel block
    materializes as ONE ``collect_list`` array value inside a single
    executor task, so a parallelism-only default lets per-block bytes
    grow linearly with the corpus — the classic executor-OOM shape at
    100×. Catalyst's own size estimate for the projected plan
    (``optimizedPlan().stats().sizeInBytes`` — the same number the
    planner prices broadcast decisions with, column-pruning-aware) sizes
    the block count instead: at 100 TB the identical code derives
    ~800k partition-sized blocks with no caller involvement, while
    fixture scales keep the interactive 2×parallelism floor. Blocking
    never affects values — only Arrow batch granularity — so the
    equivalence tests and every DuckDB oracle are untouched by where
    this lands.

    A caller-supplied ``n_blocks`` always wins. Stats that are absent
    (no classic-JVM plan handle) or absurd (> 1 PiB — Catalyst's
    "unknown" defaults, e.g. unresolved streaming leaves) fall back to
    the parallelism floor rather than exploding the block count."""
    if n_blocks is not None:
        return n_blocks
    floor = df.sparkSession.sparkContext.defaultParallelism * 2
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return floor
    if est <= 0 or est > (1 << 50):
        return floor
    return max(floor, -(-est // target_block_bytes))


def gemm_assign_cells(
    df: DataFrame,
    seeds_row: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    nrm_col: str,
    dot: str = "grid",
    extra_cols: tuple[str, ...] = (),
    n_blocks: int | None = None,
) -> DataFrame:
    """Coarse-cell ASSIGNMENT as an Arrow/numpy block kernel — the
    :func:`semantic_dedup_gemm` layout generalized to the IVF family's
    two arithmetic flavors, producing values BIT-IDENTICAL to the
    nested-HOF ``array_sort(transform(...))`` argmax it replaces (so the
    DuckDB oracles of every ``sim_ivf_*`` query are unchanged).

    Why: nested higher-order functions are not whole-stage-codegen'd;
    round 8 measured the interpreted per-row argmax at ~1 ms/row at 512
    cells (VERDICT r9 weak #1 — the one named 100 TB scale-killer left
    in the repo). Rows ship as Arrow blocks (one ``groupBy(hash(id))``
    exchange, seeds attached once per BLOCK via the broadcast 1-row
    context, never per row) and numpy does the O(n·cells·dim) arithmetic
    at memory-bandwidth speed.

    Exactness contract (mirrored by the untouched oracles):

    - ``dot="grid"``: per-term ``round(x·y·1e9)`` int64 sums
      (:func:`_grid_dot`). numpy replicates ``F.round`` on a double
      EXACTLY via :func:`_np_round_half_away` (sign-aware
      half-away-from-zero on the double's exact fraction — see its
      docstring for why ``floor(v+0.5)`` is NOT exact). int64→double,
      IEEE divides and per-pair ``nrm·snorm`` products are correctly
      rounded in both engines, so the raw cosine doubles are
      bit-identical.
    - ``dot="float"``: the :func:`_dot` LEFT-FOLD float sum is
      order-dependent, so the kernel accumulates dimension-by-dimension
      (``acc += Q[:,t]·S[:,t]``) — the same ``((0+t₀)+t₁)+…`` sequence
      as ``F.aggregate``, vectorized over rows instead of terms.
    - argmax of ``F.round(cos, 6)`` with ties to the smaller cell id:
      round-6 (HALF_UP on the shortest-repr decimal) is MONOTONE on
      doubles, so the raw-cosine argmax is the answer whenever it is
      isolated; only cells within 2.1e-6 of the row's raw max (a safe
      superset of "same round-6 bucket": equal round-6 values differ by
      ≤ 1e-6 + 2 half-ulps raw) fall back to the exact
      :func:`_round6_half_up` Decimal path, first index (seeds sorted
      by cell id) = smallest cell id. Near-ties are O(duplicate
      vectors), not O(n·cells).

    ``df`` must already carry ``nrm_col`` (the in-plan norm expression —
    shipped through, never recomputed) and ``seeds_row`` must be a 1-row
    relation with ``seeds: array<struct<cell_id int, semb, snorm>>``.
    Returns ``df``'s (id, vec, nrm, *extra_cols) columns plus
    ``cell_id int``; values pass through the kernel verbatim.
    ``n_blocks`` bounds kernel batch size; the default is
    :func:`kernel_block_count` on the projected input — block BYTES
    (~128 MB per block, since one block materializes as a single
    collected array in one executor task), floored by 2×parallelism at
    fixture scales. Blocking never affects values, only batch
    granularity.

    Zero-norm mirror (ADVICE r10 medium): a zero-norm row or seed makes
    the cosine denominator 0. The engine session runs Spark 4's default
    ``spark.sql.ansi.enabled=true``, under which the HOF tier's divide
    RAISES ``DIVIDE_BY_ZERO`` (verified in
    tests/test_operators.py::test_gemm_assign_nan_mirror) — it never
    reaches NaN ordering. The kernel mirrors that contract loudly: any
    zero denominator in a block raises ``ValueError`` before the argmax,
    so an uninitialized or NaN-ordered assignment can never be emitted."""
    dtypes = dict(df.dtypes)
    cols = [id_col, vec_col, nrm_col, *extra_cols]
    out_schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in cols] + ["cell_id int"]
    )
    proj = df.select(*cols)
    n_blocks = kernel_block_count(proj, n_blocks)
    blocks = (
        proj
        .withColumn(
            "__blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
        )
        .groupBy("__blk")
        .agg(F.collect_list(F.struct(*cols)).alias("ablock"))
    )
    ctx = blocks.crossJoin(F.broadcast(seeds_row))
    use_grid = dot == "grid"
    if dot not in ("grid", "float"):
        raise ValueError(f"dot must be 'grid' or 'float', got {dot!r}")

    # round 16 (guide §4.2, VERDICT r15 #3): raw Arrow record batches —
    # the pandas form materialized every row of every block as Python
    # struct/ndarray objects on BOTH crossings; here the block column
    # decomposes zero-copy (offsets + one flat buffer per field) and the
    # kernel's outputs are the pass-through child arrays plus one int32
    # column. Per-block math (and therefore every emitted value) is
    # unchanged.
    def assign_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import (
            arrow_list_to_2d,
            block_layout,
            context_entries,
        )

        for rb in batches:
            if not rb.num_rows:
                continue
            entries, offs = block_layout(rb.column("ablock"))
            seeds = context_entries(rb.column("seeds"))
            if not len(seeds):
                raise ValueError(
                    "gemm_assign_cells: empty seeds array — the "
                    "seeds_row context must carry >= 1 cell"
                )
            cells_raw = seeds.field("cell_id").to_numpy()
            order = np.argsort(cells_raw, kind="stable")
            cells = cells_raw[order].astype(np.int32)
            S = arrow_list_to_2d(seeds.field("semb"), np.float64)[order]
            sn = seeds.field("snorm").to_numpy()[order]
            d = S.shape[1]
            Qall = arrow_list_to_2d(entries.field(vec_col), np.float64)
            na_all = entries.field(nrm_col).to_numpy()
            base = int(offs[0])
            total = int(offs[-1]) - base
            pick_all = np.empty(total, dtype=np.int32)
            for bi in range(len(offs) - 1):
                lo_g, hi_g = int(offs[bi]), int(offs[bi + 1])
                Q = Qall[lo_g:hi_g]
                na = na_all[lo_g:hi_g]
                n = hi_g - lo_g
                if use_grid:
                    # chunk rows so the rows×cells×d term tensor stays
                    # ~32 MB regardless of cell count
                    step = max(1, 4_000_000 // max(1, len(cells) * d))
                    dots = np.empty((n, len(cells)), dtype=np.float64)
                    for lo in range(0, n, step):
                        v = (
                            Q[lo : lo + step, None, :] * S[None, :, :]
                        ) * 1e9
                        t = _np_round_half_away(v)
                        dots[lo : lo + step] = (
                            t.sum(axis=2).astype(np.float64) / 1e9
                        )
                    num = dots
                else:
                    acc = np.zeros((n, len(cells)), dtype=np.float64)
                    for t in range(d):
                        acc += Q[:, t : t + 1] * S[None, :, t]
                    num = acc
                den = na[:, None] * sn[None, :]
                if n and not den.all():
                    # ANSI mirror: the in-plan HOF tier raises
                    # DIVIDE_BY_ZERO on a zero cosine denominator
                    # (zero-norm row or seed) — never NaN-orders
                    raise ValueError(
                        "gemm_assign_cells: zero cosine denominator "
                        "(zero-norm vector or seed); the HOF tier "
                        "raises DIVIDE_BY_ZERO here under ANSI"
                    )
                C = num / den
                # never np.empty: with den fully nonzero every row has
                # ncand >= 1, but uninitialized garbage must stay
                # impossible by construction (ADVICE r10 medium)
                pick = np.full(n, cells[0] if len(cells) else 0,
                               dtype=np.int32)
                if n:
                    best = C.max(axis=1)
                    cand = C >= (best[:, None] - 2.1e-6)
                    ncand = cand.sum(axis=1)
                    pick[ncand == 1] = cells[C.argmax(axis=1)][ncand == 1]
                    for r in np.nonzero(ncand > 1)[0]:
                        idx = np.nonzero(cand[r])[0]
                        r6 = [_round6_half_up(C[r, j]) for j in idx]
                        m6 = max(r6)
                        pick[r] = cells[idx[r6.index(m6)]]
                pick_all[lo_g - base : hi_g - base] = pick
            out_rows = entries.slice(base, total)
            yield pa.RecordBatch.from_arrays(
                [out_rows.field(c) for c in cols]
                + [pa.array(pick_all)],
                [*cols, "cell_id"],
            )

    return ctx.mapInArrow(assign_batches, out_schema)


def gemm_lsh_bits(
    df: DataFrame,
    planes: list[list[float]],
    *,
    id_col: str,
    vec_col: str,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Hyperplane sign bits as an Arrow/numpy map — the third member of
    the round-10 kernel family (:func:`gemm_assign_cells`,
    :func:`pq_encode`'s gemm tier), and the CHEAPEST: the planes are
    compile-time literals (``lsh_planes`` output), so unlike the cell/
    code kernels no broadcast seeds context and NO SHUFFLE is needed —
    rows stream through ``mapInArrow`` in scan order, a pure narrow map
    like the HOF form it replaces, minus the interpreter (plane count ×
    dim per-term ``F.round`` BigDecimals per row).

    bit i = ``[Σ round(x·h_i·1e9) ≥ 0]`` — the exact int64 sign of
    :func:`_grid_dot`, replicated termwise by :func:`_np_round_half_away`,
    so every signature (and therefore every band/bucket/probe set) is
    bit-identical to the in-plan form and the LSH oracles are unchanged.

    Returns df's (id, *extra_cols, vec) columns plus ``bits array<int>``
    (one 0/1 per plane, plane order). Callers assemble band strings or
    packed signatures in-plan — O(planes) per row, not O(planes·dim).

    Round 15 (guide §4.2): raw Arrow batches — zero-copy list→(n, d)
    reshape on the way in, offsets-built list column on the way out,
    pass-through columns untouched (the pandas form materialized every
    row's vector as an ndarray object on both crossings)."""
    dtypes = dict(df.dtypes)
    cols = [id_col, *extra_cols, vec_col]
    out_schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in cols] + ["bits array<int>"]
    )

    def sig_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import arrow_list_to_2d, uniform_list_offsets

        Hm = np.array(planes, dtype=np.float64)
        n_pl, d = Hm.shape
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            Q = arrow_list_to_2d(rb.column(vec_col), np.float64)
            step = max(1, 4_000_000 // max(1, n_pl * d))
            bits = np.empty((n, n_pl), dtype=np.int32)
            for lo in range(0, n, step):
                v = np.multiply(Q[lo : lo + step, None, :], Hm[None, :, :])
                v *= 1e9
                g = _np_round_half_away_consume(v).sum(axis=2)
                bits[lo : lo + step] = (g >= 0).astype(np.int32)
            bits_col = pa.ListArray.from_arrays(
                uniform_list_offsets(n, n_pl),
                pa.array(bits.ravel()),
            )
            yield pa.RecordBatch.from_arrays(
                [rb.column(c) for c in cols] + [bits_col],
                [*cols, "bits"],
            )

    return df.select(*cols).mapInArrow(sig_batches, out_schema)


def pq_encode(
    df: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    encode: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """Product-quantization encoder (Jégou, Douze & Schmid, TPAMI 2011
    "Product Quantization for Nearest Neighbor Search" — public paper).
    Splits each ``dim``-vector into ``m`` subvectors and assigns each to
    its nearest of ``n_centroids`` per-subspace centroids; a vector
    compresses to ``m`` small codes + its norm — at 100 TB the serving
    scan reads this codes table (~9 bytes/vector here) instead of the
    256-byte float embedding, which is the entire point of PQ.

    Centroids are seeded deterministically from the vectors with
    ``id < n_centroids`` (the ivf_topk convention — no RNG, oracle-exact;
    `sim_ivf_kmeans_topk` shows how a relational Lloyd step sharpens seeded
    cells when needed). Distances are argmin'd on the int64 PQ_GRID, ties
    broken on centroid id, so codes are bit-reproducible cross-engine.

    Plan: 1-row broadcast of the codebook; encoding is a narrow in-row map
    (m · n_centroids · dim/m grid-dot products per row), no shuffle.

    ``encode="gemm"`` (default, round 10): the per-row code assignment —
    O(n · centroids · dim) with a PER-TERM ``F.round`` BigDecimal, the
    most expensive interpreter class in the repo (the grid flavor of
    VERDICT r9 weak #1) — runs as Arrow/numpy blocks, the
    :func:`gemm_assign_cells` layout applied to squared-distance argmin.
    EASIER exactness story than the cosine kernels: the argmin compares
    exact int64 grid distances (``Σ round((x−y)²·1e9)`` via
    :func:`_np_round_half_away`, bit-identical to :func:`_grid_sum`), so
    ties resolve by integer equality + first-index = smallest centroid
    id — no float rounding anywhere near the decision. One corpus block
    exchange buys the interpreter's removal; oracles unchanged.
    ``encode="hof"`` keeps the in-plan narrow map (zero shuffle — the
    A/B baseline).

    Returns (id_col, *keep_cols, codes array<int>, vnorm).
    """
    sub = dim // m
    seeds_row = df.filter(F.col(id_col) < n_centroids).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("int").alias("cell_id"),
                    F.col(vec_col).alias("semb"),
                )
            )
        ).alias("seeds")
    ).select(
        _assert_contiguous_ids(
            F.col("seeds"), "cell_id", n_centroids, "pq_encode codebook"
        ).alias("seeds")
    )

    if encode == "gemm":
        dtypes = dict(df.dtypes)
        cols = [id_col, *keep_cols, vec_col]
        out_schema = ", ".join(
            [f"`{c}` {dtypes[c]}" for c in (id_col, *keep_cols)]
            + ["codes array<int>", "vnorm double"]
        )
        proj = df.select(*cols).withColumn(
            "__vnorm", _grid_norm6(F.col(vec_col))
        )
        n_blocks = kernel_block_count(proj, n_blocks)
        blocks = (
            proj
            .withColumn(
                "__blk",
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)),
            )
            .groupBy("__blk")
            .agg(
                F.collect_list(
                    F.struct(*cols, "__vnorm")
                ).alias("ablock")
            )
        )
        ctx = blocks.crossJoin(F.broadcast(seeds_row))

        # round 16 (guide §4.2, VERDICT r15 #3): raw Arrow batches —
        # zero-copy block decomposition in, offsets-built codes column
        # out; per-subspace int64 grid argmin unchanged.
        def encode_batches(batches):
            import numpy as np
            import pyarrow as pa

            from .linalg import (
                arrow_list_to_2d,
                block_layout,
                context_entries,
                uniform_list_offsets,
            )

            for rb in batches:
                if not rb.num_rows:
                    continue
                entries, offs = block_layout(rb.column("ablock"))
                seeds = context_entries(rb.column("seeds"))
                order = np.argsort(
                    seeds.field("cell_id").to_numpy(), kind="stable"
                )
                S = arrow_list_to_2d(seeds.field("semb"), np.float64)[
                    order
                ]
                Qall = arrow_list_to_2d(
                    entries.field(vec_col), np.float64
                )
                base = int(offs[0])
                total = int(offs[-1]) - base
                codes_all = np.empty((total, m), dtype=np.int32)
                nc = S.shape[0]
                step = max(1, 4_000_000 // max(1, nc * sub))
                for bi in range(len(offs) - 1):
                    lo_g, hi_g = int(offs[bi]), int(offs[bi + 1])
                    Q = Qall[lo_g:hi_g]
                    n = hi_g - lo_g
                    out = codes_all[lo_g - base : hi_g - base]
                    for s in range(m):
                        Qs = Q[:, s * sub : (s + 1) * sub]
                        Ss = S[:, s * sub : (s + 1) * sub]
                        for lo in range(0, n, step):
                            diff = (
                                Qs[lo : lo + step, None, :]
                                - Ss[None, :, :]
                            )
                            t = _np_round_half_away((diff * diff) * 1e9)
                            # exact int64 distances: argmin's first-min
                            # = smallest centroid id (seeds sorted, ids
                            # contiguous)
                            out[lo : lo + step, s] = np.argmin(
                                t.sum(axis=2), axis=1
                            )
                out_rows = entries.slice(base, total)
                codes_col = pa.ListArray.from_arrays(
                    uniform_list_offsets(total, m),
                    pa.array(codes_all.ravel()),
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        out_rows.field(c)
                        for c in (id_col, *keep_cols)
                    ]
                    + [codes_col, out_rows.field("__vnorm")],
                    [id_col, *keep_cols, "codes", "vnorm"],
                )

        return ctx.mapInArrow(encode_batches, out_schema)
    if encode != "hof":
        raise ValueError(f"encode must be 'gemm' or 'hof', got {encode!r}")

    def _code_at(vec: Column, s: Column) -> Column:
        subv = F.slice(vec, s * sub + 1, sub)
        ranked = F.array_sort(
            F.transform(
                F.col("seeds"),
                lambda c: F.struct(
                    _grid_sum(
                        subv,
                        F.slice(c["semb"], s * sub + 1, sub),
                        lambda x, y: (x - y) * (x - y),
                    ).alias("d2g"),
                    c["cell_id"].alias("cell_id"),
                ),
            )
        )
        return F.element_at(ranked, 1)["cell_id"]

    return df.crossJoin(F.broadcast(seeds_row)).select(
        id_col,
        *keep_cols,
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: _code_at(F.col(vec_col), s),
        ).alias("codes"),
        _grid_norm6(F.col(vec_col)).alias("vnorm"),
    )


def pq_topk(
    df: DataFrame,
    probe_id: int = 1,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 10,
    rerank: int = 50,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    n_blocks: int | None = None,
) -> DataFrame:
    """PQ asymmetric-distance top-k (TPAMI'11 ADC) with exact rerank —
    the textbook PQ serving shape:

    1. codes scan: per row, adc_dot = Σ_s table[s][code_s] where ``table``
       is the broadcast (m × n_centroids) grid of probe-subvector ·
       centroid-subvector dots — O(m) int64 lookups per row, no float
       math in the hot loop;
    2. top-``rerank`` candidates by adc_cosine (TakeOrderedAndProject);
    3. the ≤ ``rerank`` survivors join back to the embeddings relation
       (a broadcast semi-lookup at scale) for the exact cosine, and the
       final top-``k`` is ranked on that.

    Fully deterministic (seeded codebook + grid sums + id tie-breaks) →
    hash-exact oracle; recall vs the exact scan is measured in
    tools/ann_recall.py. Zero driver-side jobs: probe and codebook are
    in-plan 1-row broadcast contexts.

    Returns (id_col, *keep_cols, adc_cosine, cosine) — ``cosine`` exact.
    """
    sub = dim // m
    codes = pq_encode(
        df,
        n_centroids,
        m,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        keep_cols=keep_cols,
        n_blocks=n_blocks,
    )
    seeds_row = df.filter(F.col(id_col) < n_centroids).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("int").alias("cell_id"),
                    F.col(vec_col).alias("semb"),
                )
            )
        ).alias("seeds")
    ).select(
        _assert_contiguous_ids(
            F.col("seeds"), "cell_id", n_centroids, "pq_topk ADC table"
        ).alias("seeds")
    )
    probe_row = df.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("q"), _grid_norm6(F.col(vec_col)).alias("qnorm")
    ).limit(1)  # provably 1-row broadcast context (see cosine_topk_by_id)
    ctx = probe_row.crossJoin(seeds_row).select(
        "q",
        "qnorm",
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.transform(
                F.col("seeds"),
                lambda c: _grid_dot(
                    F.slice(F.col("q"), s * sub + 1, sub),
                    F.slice(c["semb"], s * sub + 1, sub),
                ),
            ),
        ).alias("ptab"),
    )
    scored = (
        codes.crossJoin(F.broadcast(ctx))
        .withColumn(
            "adc_dot_grid",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0).cast("long"),
                lambda acc, s: acc
                + F.get(F.get(F.col("ptab"), s), F.get(F.col("codes"), s)),
            ),
        )
        .withColumn(
            "adc_cosine",
            F.round(
                (F.col("adc_dot_grid") / float(PQ_GRID))
                / (F.col("vnorm") * F.col("qnorm")),
                6,
            ),
        )
        .filter(F.col(id_col) != probe_id)
    )
    cands = scored.select(
        id_col, *keep_cols, "adc_cosine", "q", "qnorm", "vnorm"
    ).orderBy(F.desc("adc_cosine"), F.asc(id_col)).limit(rerank)
    reranked = df.select(id_col, vec_col).join(F.broadcast(cands), id_col)
    return (
        reranked.withColumn(
            "cosine",
            F.round(
                (_grid_dot(F.col(vec_col), F.col("q")) / float(PQ_GRID))
                / (F.col("vnorm") * F.col("qnorm")),
                6,
            ),
        )
        .select(id_col, *keep_cols, "adc_cosine", "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def pq_build_codebook(
    df: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """The TRAINING half of :func:`pq_kmeans_topk`: seed-assign codes
    exactly as :func:`pq_encode`, then refine every per-subspace centroid
    as the element-wise mean of its assigned subvectors (int64 grid sums
    divided once, rounded to 1e-9 — the rounding IS the codebook value,
    identical cross-engine). Returns the codebook relation
    ``(s int, c int, cvec array<double>)`` — a plain three-column
    relation that persists through the S5 parquet sink bit-exactly
    (queries/similarity.py ``sim_pq_persist_codebook`` /
    ``sim_pq_persisted_topk``). A cluster whose assignment set is empty
    drops out, same both engines.
    """
    sub = dim // m
    codes0 = pq_encode(
        df, n_centroids, m, dim=dim, id_col=id_col, vec_col=vec_col,
        keep_cols=(), n_blocks=n_blocks,
    ).select(id_col, F.posexplode("codes").alias("s", "c0"))

    el = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).select(
        id_col, (F.col("pos") / sub).cast("int").alias("s"), "pos", "x"
    )
    refined = (
        el.join(codes0, [id_col, "s"])
        .groupBy("s", "c0", "pos")
        .agg(
            # exact 1e-9-grid mean with an engine-independent tie rule:
            # k = floor((2S + n) / (2n)) (round-half-toward-+inf on the
            # int grid). Validity bound (ADVICE r13): the double quotient
            # identifies the tie exactly only while |2S + n| < 2^53 —
            # 2S + n = 2kn is then representable, and a non-tie sits
            # ≥ 1/(2n) away from an integer. 2S is bounded by
            # 2·n·max|x|·1e9, so with |x| ≤ 4 (unit-norm-ish embeddings)
            # the bound holds to n ≈ 2^50 subvectors per (s, c0, pos)
            # cell — far beyond any realistic cluster; past it BOTH
            # engines still agree (identical IEEE ops) but the tie rule
            # is no longer provably half-up. round(S/(n·1e9), 9) instead
            # left the codebook ENGINE-DEPENDENT at exact .5e-9
            # boundaries — Spark HALF_UP rounded up where DuckDB's
            # float-multiply round landed one grid unit lower (caught
            # when sim_pq_persist_codebook hash-checks raw codebook
            # values, round 13).
            (
                F.floor(
                    (
                        F.sum(
                            F.round(
                                F.col("x").cast("double") * PQ_GRID
                            ).cast("long")
                        )
                        * 2
                        + F.count(F.lit(1))
                    )
                    / (F.count(F.lit(1)) * 2.0)
                )
                / float(PQ_GRID)
            ).alias("cx")
        )
    )
    return (
        refined.groupBy("s", "c0")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda p: p["cx"],
            ).alias("cvec")
        )
        .select(F.col("s"), F.col("c0").alias("c"), "cvec")
    )


def pq_search_codebook(
    df: DataFrame,
    codebook: DataFrame,
    probe_id: int = 1,
    k: int = 10,
    rerank: int = 50,
    *,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    encode_tier: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """The SEARCH half of :func:`pq_kmeans_topk`: given a codebook
    relation ``(s, c, cvec)`` — freshly trained or loaded from a
    persisted parquet index — re-encode the corpus against it, ADC-score
    the probe, and exact-rerank the top ``rerank`` candidates to the
    final top-k. The whole ≤ m·n_centroids-row codebook collapses to a
    1-row broadcast context; the corpus is never shuffled — the one wide
    stage is the narrow encode/ADC map over the scan (Arrow kernel on
    the default tier).
    """
    sub = dim // m
    cents_row = codebook.agg(
        F.collect_list(
            F.struct(
                F.col("s").alias("cs"),
                F.col("c").alias("cc"),
                F.col("cvec").alias("cvec"),
            )
        ).alias("cents")
    )
    probe_row = df.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("q"), _grid_norm6(F.col(vec_col)).alias("qnorm")
    ).limit(1)  # provably 1-row broadcast context (see cosine_topk_by_id)
    ctx = probe_row.crossJoin(cents_row)

    def _sub_cents(s: Column) -> Column:
        return F.filter(F.col("cents"), lambda c: c["cs"] == s)

    def _code_at(vec: Column, s: Column) -> Column:
        subv = F.slice(vec, s * sub + 1, sub)
        ranked = F.array_sort(
            F.transform(
                _sub_cents(s),
                lambda c: F.struct(
                    _grid_sum(
                        subv, c["cvec"], lambda x, y: (x - y) * (x - y)
                    ).alias("d2g"),
                    c["cc"].alias("cc"),
                ),
            )
        )
        return F.element_at(ranked, 1)["cc"]

    def _adc_term(s: Column, code: Column) -> Column:
        hit = F.filter(
            F.col("cents"), lambda c: (c["cs"] == s) & (c["cc"] == code)
        )
        return _grid_dot(
            F.slice(F.col("q"), s * sub + 1, sub),
            F.element_at(hit, 1)["cvec"],
        )

    if encode_tier == "gemm":
        base = df.withColumn("vnorm", _grid_norm6(F.col(vec_col)))
        dtypes = dict(base.dtypes)
        cols = [id_col, *keep_cols, vec_col, "vnorm"]
        out_schema = ", ".join(
            [f"`{c}` {dtypes[c]}" for c in (id_col, *keep_cols, "vnorm")]
            + ["adc_dot_grid long"]
        )
        proj = base.select(*cols)
        n_blocks = kernel_block_count(proj, n_blocks)
        blocks = (
            proj
            .withColumn(
                "__blk",
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)),
            )
            .groupBy("__blk")
            .agg(F.collect_list(F.struct(*cols)).alias("ablock"))
        )
        kctx = blocks.crossJoin(F.broadcast(ctx))
        sub_l, m_l, vc = sub, m, vec_col

        # round 16 (guide §4.2, VERDICT r15 #3): raw Arrow batches; the
        # codebook context also parses ONCE per batch (the pandas form
        # rebuilt the by-subspace dict per block row). Same int64 grid
        # distances, same tdots, same adc sums.
        def adc_batches(batches):
            import numpy as np
            import pyarrow as pa

            from .linalg import (
                arrow_list_to_2d,
                block_layout,
                context_entries,
            )

            for rb in batches:
                if not rb.num_rows:
                    continue
                entries, offs = block_layout(rb.column("ablock"))
                cents = context_entries(rb.column("cents"))
                qv = np.asarray(
                    rb.column("q")[0].as_py(), dtype=np.float64
                )
                cs = cents.field("cs").to_numpy()
                cc = cents.field("cc").to_numpy()
                Cfull = arrow_list_to_2d(
                    cents.field("cvec"), np.float64
                )
                # per-subspace cc-sorted centroid matrices + the probe's
                # per-(subspace, centroid) dot table — pure context,
                # hoisted out of the block loop
                C_by_s, tdots_by_s = [], []
                for s in range(m_l):
                    rows = np.nonzero(cs == s)[0]
                    rows = rows[np.argsort(cc[rows], kind="stable")]
                    C = Cfull[rows]
                    qs = qv[s * sub_l : (s + 1) * sub_l]
                    C_by_s.append(C)
                    tdots_by_s.append(
                        _np_round_half_away((qs[None, :] * C) * 1e9).sum(
                            axis=1
                        )
                    )
                Qall = arrow_list_to_2d(entries.field(vc), np.float64)
                base_o = int(offs[0])
                total = int(offs[-1]) - base_o
                adc_all = np.zeros(total, dtype=np.int64)
                for bi in range(len(offs) - 1):
                    lo_g, hi_g = int(offs[bi]), int(offs[bi + 1])
                    Q = Qall[lo_g:hi_g]
                    out = adc_all[lo_g - base_o : hi_g - base_o]
                    for s in range(m_l):
                        C = C_by_s[s]
                        Qs = Q[:, s * sub_l : (s + 1) * sub_l]
                        diff = Qs[:, None, :] - C[None, :, :]
                        D = _np_round_half_away(
                            (diff * diff) * 1e9
                        ).sum(axis=2)
                        out += tdots_by_s[s][np.argmin(D, axis=1)]
                out_rows = entries.slice(base_o, total)
                yield pa.RecordBatch.from_arrays(
                    [
                        out_rows.field(c)
                        for c in (id_col, *keep_cols, "vnorm")
                    ]
                    + [pa.array(adc_all)],
                    [id_col, *keep_cols, "vnorm", "adc_dot_grid"],
                )

        scored = (
            kctx.mapInArrow(adc_batches, out_schema)
            .crossJoin(
                F.broadcast(ctx.select("q", "qnorm"))
            )
            .withColumn(
                "adc_cosine",
                F.round(
                    (F.col("adc_dot_grid") / float(PQ_GRID))
                    / (F.col("vnorm") * F.col("qnorm")),
                    6,
                ),
            )
            .filter(F.col(id_col) != probe_id)
        )
    else:
        scored = (
            df.withColumn("vnorm", _grid_norm6(F.col(vec_col)))
            .crossJoin(F.broadcast(ctx))
            .withColumn(
                "adc_dot_grid",
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    F.lit(0).cast("long"),
                    lambda acc, s: acc
                    + _adc_term(s, _code_at(F.col(vec_col), s)),
                ),
            )
            .withColumn(
                "adc_cosine",
                F.round(
                    (F.col("adc_dot_grid") / float(PQ_GRID))
                    / (F.col("vnorm") * F.col("qnorm")),
                    6,
                ),
            )
            .filter(F.col(id_col) != probe_id)
        )
    cands = scored.select(
        id_col, *keep_cols, "adc_cosine", "q", "qnorm", "vnorm"
    ).orderBy(F.desc("adc_cosine"), F.asc(id_col)).limit(rerank)
    reranked = df.select(id_col, vec_col).join(F.broadcast(cands), id_col)
    return (
        reranked.withColumn(
            "cosine",
            F.round(
                (_grid_dot(F.col(vec_col), F.col("q")) / float(PQ_GRID))
                / (F.col("vnorm") * F.col("qnorm")),
                6,
            ),
        )
        .select(id_col, *keep_cols, "adc_cosine", "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )




def pq_codes_from_codebook(
    df: DataFrame,
    codebook: DataFrame,
    *,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    n_blocks: int | None = None,
) -> DataFrame:
    """The PERSISTABLE codes relation of a trained PQ index:
    ``(id, *keep_cols, codes array<int>, vnorm)`` — each vector's
    per-subspace nearest-centroid code VALUES (``cc`` as stored in the
    codebook; trained codebooks may drop empty clusters, so codes are
    ids, not positions) plus its grid norm. This is the table a 100 TB
    PQ serving scan reads (~9 bytes/vector) instead of the float
    embeddings; encoding against the codebook is exactly the argmin the
    :func:`pq_search_codebook` kernel computes per query, paid ONCE here
    (and per accepted batch on the append path) instead of per search.

    ``vnorm`` persists deliberately: it derives from the VECTOR, which
    the codes relation exists to avoid storing — the norm is primary
    index payload (the FAISS IndexIVFPQ convention for IP/cosine), not
    recomputable derived data like the centroid norms.

    Exactness: exact int64 grid distances, argmin first-min = smallest
    ``cc`` over the cc-sorted codebook — byte-identical to the per-query
    encode, so serving from persisted codes equals re-encoding."""
    sub = dim // m
    cents_row = codebook.agg(
        F.collect_list(
            F.struct(
                F.col("s").alias("cs"),
                F.col("c").alias("cc"),
                F.col("cvec").alias("cvec"),
            )
        ).alias("cents")
    )
    dtypes = dict(df.dtypes)
    cols = [id_col, *keep_cols, vec_col]
    out_schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in (id_col, *keep_cols)]
        + ["codes array<int>", "vnorm double"]
    )
    proj = df.select(*cols).withColumn(
        "__vnorm", _grid_norm6(F.col(vec_col))
    )
    n_blocks = kernel_block_count(proj, n_blocks)
    blocks = (
        proj.withColumn(
            "__blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
        )
        .groupBy("__blk")
        .agg(F.collect_list(F.struct(*cols, "__vnorm")).alias("ablock"))
    )
    kctx = blocks.crossJoin(F.broadcast(cents_row))
    sub_l, m_l, vc = sub, m, vec_col

    # round 16 (guide §4.2, VERDICT r15 #3): raw Arrow batches; codebook
    # parsed once per batch; identical argmin-over-cc-sorted codes.
    def code_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import (
            arrow_list_to_2d,
            block_layout,
            context_entries,
            uniform_list_offsets,
        )

        for rb in batches:
            if not rb.num_rows:
                continue
            entries, offs = block_layout(rb.column("ablock"))
            cents = context_entries(rb.column("cents"))
            cs = cents.field("cs").to_numpy()
            cc = cents.field("cc").to_numpy()
            Cfull = arrow_list_to_2d(cents.field("cvec"), np.float64)
            C_by_s, cc_by_s = [], []
            for s in range(m_l):
                rows = np.nonzero(cs == s)[0]
                rows = rows[np.argsort(cc[rows], kind="stable")]
                C_by_s.append(Cfull[rows])
                cc_by_s.append(cc[rows].astype(np.int32))
            Qall = arrow_list_to_2d(entries.field(vc), np.float64)
            base_o = int(offs[0])
            total = int(offs[-1]) - base_o
            codes_all = np.empty((total, m_l), dtype=np.int32)
            for bi in range(len(offs) - 1):
                lo_g, hi_g = int(offs[bi]), int(offs[bi + 1])
                Q = Qall[lo_g:hi_g]
                out = codes_all[lo_g - base_o : hi_g - base_o]
                for s in range(m_l):
                    C = C_by_s[s]
                    Qs = Q[:, s * sub_l : (s + 1) * sub_l]
                    diff = Qs[:, None, :] - C[None, :, :]
                    D = _np_round_half_away((diff * diff) * 1e9).sum(
                        axis=2
                    )
                    # first-min over cc-sorted entries = smallest cc
                    out[:, s] = cc_by_s[s][np.argmin(D, axis=1)]
            out_rows = entries.slice(base_o, total)
            codes_col = pa.ListArray.from_arrays(
                uniform_list_offsets(total, m_l),
                pa.array(codes_all.ravel()),
            )
            yield pa.RecordBatch.from_arrays(
                [out_rows.field(c) for c in (id_col, *keep_cols)]
                + [codes_col, out_rows.field("__vnorm")],
                [id_col, *keep_cols, "codes", "vnorm"],
            )

    return kctx.mapInArrow(code_batches, out_schema)


def pq_topk_from_codes(
    codes_rel: DataFrame,
    probe_src: DataFrame,
    codebook: DataFrame,
    probe_id: int = 1,
    k: int = 10,
    rerank: int = 50,
    *,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """PQ top-k served from the persisted codes relation — the
    steady-state read path: the scan touches the ~9-byte/vector codes
    table, NEVER the float embeddings (except the probe lookup and the
    ``rerank``-row exact tail). ADC per row is an integer GATHER: the
    probe's per-(subspace, centroid) dot table is computed once per
    block from the broadcast codebook context, and each row sums its m
    looked-up entries — no per-row distance argmin, that was paid at
    encode/commit. Values are byte-identical to
    :func:`pq_search_codebook` over the live corpus (same tdots ints,
    same codes, same round-6 cosine), so the kmeans oracle applies
    unchanged."""
    sub = dim // m
    cents_row = codebook.agg(
        F.collect_list(
            F.struct(
                F.col("s").alias("cs"),
                F.col("c").alias("cc"),
                F.col("cvec").alias("cvec"),
            )
        ).alias("cents")
    )
    probe_row = probe_src.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("q"), _grid_norm6(F.col(vec_col)).alias("qnorm")
    ).limit(1)  # provably 1-row broadcast context (see cosine_topk_by_id)
    ctx = probe_row.crossJoin(cents_row)

    cols = [id_col, *keep_cols, "codes", "vnorm"]
    dtypes = dict(codes_rel.dtypes)
    out_schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in (id_col, *keep_cols, "vnorm")]
        + ["adc_dot_grid long"]
    )
    proj = codes_rel.select(*cols)
    blocks = (
        proj.withColumn(
            "__blk",
            F.pmod(
                F.xxhash64(F.col(id_col)),
                F.lit(kernel_block_count(proj, None)),
            ),
        )
        .groupBy("__blk")
        .agg(F.collect_list(F.struct(*cols)).alias("ablock"))
    )
    kctx = blocks.crossJoin(F.broadcast(ctx))
    sub_l, m_l = sub, m

    # round 16 (guide §4.2, VERDICT r15 #3): raw Arrow batches — the
    # ~9-byte/row codes column reshapes zero-copy and the integer gather
    # vectorizes over the WHOLE batch (blocks only delimited the pandas
    # loop; the gather needs no per-block state). Same tdots ints.
    def adc_gather_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import (
            arrow_list_to_2d,
            block_layout,
            context_entries,
        )

        for rb in batches:
            if not rb.num_rows:
                continue
            entries, offs = block_layout(rb.column("ablock"))
            cents = context_entries(rb.column("cents"))
            qv = np.asarray(rb.column("q")[0].as_py(), dtype=np.float64)
            cs = cents.field("cs").to_numpy()
            cc = cents.field("cc").to_numpy()
            Cfull = arrow_list_to_2d(cents.field("cvec"), np.float64)
            base_o = int(offs[0])
            total = int(offs[-1]) - base_o
            codes = arrow_list_to_2d(entries.field("codes"), np.int32)[
                base_o : base_o + total
            ]
            adc = np.zeros(total, dtype=np.int64)
            for s in range(m_l):
                rows = np.nonzero(cs == s)[0]
                rows = rows[np.argsort(cc[rows], kind="stable")]
                cc_ids = cc[rows].astype(np.int32)
                C = Cfull[rows]
                qs = qv[s * sub_l : (s + 1) * sub_l]
                tdots = _np_round_half_away(
                    (qs[None, :] * C) * 1e9
                ).sum(axis=1)
                pos = np.searchsorted(cc_ids, codes[:, s])
                adc += tdots[pos]
            out_rows = entries.slice(base_o, total)
            yield pa.RecordBatch.from_arrays(
                [
                    out_rows.field(c)
                    for c in (id_col, *keep_cols, "vnorm")
                ]
                + [pa.array(adc)],
                [id_col, *keep_cols, "vnorm", "adc_dot_grid"],
            )

    scored = (
        kctx.mapInArrow(adc_gather_batches, out_schema)
        .crossJoin(F.broadcast(ctx.select("q", "qnorm")))
        .withColumn(
            "adc_cosine",
            F.round(
                (F.col("adc_dot_grid") / float(PQ_GRID))
                / (F.col("vnorm") * F.col("qnorm")),
                6,
            ),
        )
        .filter(F.col(id_col) != probe_id)
    )
    cands = scored.select(
        id_col, *keep_cols, "adc_cosine", "q", "qnorm", "vnorm"
    ).orderBy(F.desc("adc_cosine"), F.asc(id_col)).limit(rerank)
    reranked = probe_src.select(id_col, vec_col).join(
        F.broadcast(cands), id_col
    )
    return (
        reranked.withColumn(
            "cosine",
            F.round(
                (_grid_dot(F.col(vec_col), F.col("q")) / float(PQ_GRID))
                / (F.col("vnorm") * F.col("qnorm")),
                6,
            ),
        )
        .select(id_col, *keep_cols, "adc_cosine", "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def pq_kmeans_topk(
    df: DataFrame,
    probe_id: int = 1,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 10,
    rerank: int = 50,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    encode_tier: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """:func:`pq_topk` with one relational Lloyd refinement of every
    per-subspace codebook — the PQ counterpart of
    :func:`ivf_kmeans_topk`'s trained-centroid upgrade:

    1. seed-assign codes exactly as :func:`pq_encode`;
    2. refine centroid (s, c) as the element-wise mean of its assigned
       subvectors — int64 grid sums divided once, rounded to 1e-9, so the
       trained codebook is bit-identical cross-engine (a cluster whose
       assignment set is empty simply drops out, same both engines);
    3. re-encode against the refined codebook, ADC-score, exact-rerank.

    One lineage: the refinement is two hash aggregates over the
    (vector, subspace, element) stream; the refined codebook comes back
    as a 1-row broadcast context. No driver loops — more Lloyd steps
    would unroll the same stage pattern.

    ``encode_tier="gemm"`` (default, round 10): the corpus RE-ENCODE +
    ADC scan against the trained codebook — per row, m × centroids
    interpreted grid sums for the argmin PLUS an O(centroids) in-plan
    array filter per ADC term — runs as one Arrow block kernel that
    emits ``adc_dot_grid`` directly (exact int64 distances for the
    argmin, first-min = smallest centroid id over the cc-sorted
    codebook — trained codebooks may drop empty clusters, so ids are
    sorted, not assumed contiguous; exact int64 q·centroid grid dots
    for the ADC terms). The stage-1 seed encode already rides
    :func:`pq_encode`'s kernel. ``"hof"`` keeps the in-plan map.
    Values bit-identical — oracle unchanged.
    """
    codebook = pq_build_codebook(
        df,
        n_centroids=n_centroids,
        m=m,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        n_blocks=n_blocks,
    )
    return pq_search_codebook(
        df,
        codebook,
        probe_id=probe_id,
        k=k,
        rerank=rerank,
        dim=dim,
        m=m,
        id_col=id_col,
        vec_col=vec_col,
        keep_cols=keep_cols,
        encode_tier=encode_tier,
        n_blocks=n_blocks,
    )


def lsh_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """The seeded hyperplane set as plain Python floats — single source of
    truth for both the Spark plan and the SQL oracle (float repr
    round-trips to the identical double in both engines)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def _lsh_band_candidates(
    df: DataFrame,
    n_planes: int,
    n_bands: int,
    seed: int,
    id_col: str,
    vec_col: str,
    dim: int,
    sig_tier: str = "gemm",
    delta_min_id: int | None = None,
) -> DataFrame:
    """Grid-exact hyperplane-LSH candidate generation shared by the
    checked LSH join and its JL-screened variant: signature bits from
    int64-grid plane projections, banded, then a band equi-join over the
    BARE ids — the Σdf² band fan-out and the pair-set distinct shuffle
    (id, band_sig) pairs, not dim-64 float arrays; embeddings (or JL
    sketches) rejoin by id AFTER dedup, the pq_topk rerank pattern (at
    100 TB the candidate exchange shrinks ~30×). Returns distinct
    (id_a, id_b) with id_a < id_b.

    ``sig_tier="gemm"`` (default, round 10): the signature map —
    n_planes × dim per-term ``F.round`` interpreter work per row — runs
    via :func:`gemm_lsh_bits` (shuffle-free narrow Arrow map, exact
    int64 signs, identical buckets → oracles unchanged); ``"hof"``
    keeps the in-plan form.

    Pair dedup (round 12): a pair colliding in k bands used to be
    emitted k times and collapsed by ``.distinct()`` — a second
    corpus-pair-scale exchange (~4 M pre-distinct rows for 1.79 M pairs
    at sf0.1, ~1 s of the candidate wall). Standard LSH first-match
    emission replaces it: each side carries its full packed signature
    (one int64 — ``conv(band_{B-1}‖…‖band_0, 2, 10)``, band j at bits
    [j·bpb, (j+1)·bpb)), and a joined pair survives only in its LOWEST
    colliding band: with ``x = pa XOR pb``, fold each bpb-bit group's
    OR into its LSB (``t = (x | x≫1 | … | x≫(bpb−1)) & lsbmask``), then
    require every group below the join's band to be nonzero
    (``(~t) & lsbmask & ((1≪(bpb·band))−1) == 0``). Pure codegen-able
    int ops per joined row; the emitted SET is exactly the old distinct
    (each colliding pair has a unique lowest band), so every downstream
    oracle is unchanged. The one exchange this keeps is a deliberate
    PRE-FAN-OUT repartition of the banded relation (n·bands rows — the
    cheap side, ~16 k rows at sf0.1): the removed distinct was also the
    exchange that spread the pair-scale work across cores, and without
    a replacement the band join, screens, and refine kernel all inherit
    the parquet scan's single partition (measured: the jl-screened
    refine ran 2× SLOWER than the distinct form until this moved the
    exchange from the 4 M-row pair stream to the 16 k-row banded side)."""
    sig = _band_sig_relation(
        df, n_planes, n_bands, seed, id_col, vec_col, dim, sig_tier
    )
    return _first_match_pairs(
        sig, n_bands, n_planes // n_bands, id_col, delta_min_id=delta_min_id
    )


def _band_sig_relation(
    df: DataFrame,
    n_planes: int,
    n_bands: int,
    seed: int,
    id_col: str,
    vec_col: str,
    dim: int,
    sig_tier: str = "gemm",
) -> DataFrame:
    """(id, vec, band0..band{n_bands-1}) signature relation — the
    grid-exact hyperplane bits grouped into band bit-strings, shared by
    `_lsh_band_candidates` and the persistable index builder
    :func:`lsh_banded_sigs`."""
    planes = lsh_planes(n_planes, dim, seed)
    bits_per_band = n_planes // n_bands
    if sig_tier == "gemm":
        sigb = gemm_lsh_bits(
            df, planes, id_col=id_col, vec_col=vec_col
        )
        band_cols = [
            F.concat_ws(
                "",
                *[
                    F.get(F.col("bits"), b * bits_per_band + j).cast(
                        "string"
                    )
                    for j in range(bits_per_band)
                ],
            ).alias(f"band{b}")
            for b in range(n_bands)
        ]
        sig = sigb.select(id_col, vec_col, *band_cols)
    else:
        bit_cols = [
            F.when(
                _grid_dot(F.col(vec_col), F.array(*[F.lit(x) for x in p]))
                >= 0,
                1,
            )
            .otherwise(0)
            .alias(f"bit{i}")
            for i, p in enumerate(planes)
        ]
        sig = df.select(F.col(id_col), F.col(vec_col), *bit_cols)
        band_cols = [
            F.concat_ws(
                "",
                *[
                    F.col(f"bit{b * bits_per_band + j}")
                    for j in range(bits_per_band)
                ],
            ).alias(f"band{b}")
            for b in range(n_bands)
        ]
        sig = sig.select(id_col, vec_col, *band_cols)
    return sig


def _first_match_pairs(
    sig: DataFrame,
    n_bands: int,
    bits_per_band: int,
    id_col: str,
    delta_min_id: int | None = None,
) -> DataFrame:
    """Distinct band-collision pairs from a signature relation carrying
    ``band0..band{n_bands-1}`` bit-string columns — the shared
    first-matching-band machinery of `_lsh_band_candidates` (see its
    docstring for the emission rule and the bit-arithmetic layout),
    reused verbatim by the float-signature tier.

    Wide-signature fallback: the packed-int64 bit arithmetic holds only
    for ``n_bands·bits_per_band ≤ 62`` (``conv`` to a signed long wraps
    past 2⁶³ — a silently wrong emission set, not an error). Wider
    configs — scale deployments grow plane count ∝ log n to keep bucket
    occupancy constant — carry the band-sig ARRAY instead and decide
    "no earlier band matched" with a short zip_with/exists over at most
    ``band`` elements (≤ n_bands terms per joined row; interpreted, but
    bounded by band count, not dim)."""
    banded = _banded_relation(sig, n_bands, bits_per_band, id_col).repartition(
        # EXPLICIT count, not .repartition(col): AQE prices the exchange
        # by its tiny pre-fan-out input (n·bands rows) and coalesces a
        # count-less repartition to ONE partition — putting the 4 M-row
        # band-join fan-out, the JL screen, and the refine kernel all on
        # a single core (measured 2× the whole-query wall at sf0.1). A
        # user-specified count is exempt from AQE coalescing, keeping
        # the exploding join spread across the session's shuffle width.
        shuffle_width(sig.sparkSession),
        F.col(id_col),
    )
    return _first_match_join(
        banded, banded, n_bands, bits_per_band, id_col, delta_min_id
    )


def _banded_relation(
    sig: DataFrame, n_bands: int, bits_per_band: int, id_col: str
) -> DataFrame:
    """(id, psig, band, band_sig) rows from a signature relation carrying
    ``band0..band{n_bands-1}`` bit-string columns — the banded form the
    first-match join consumes, and (via :func:`lsh_banded_sigs`) the
    PERSISTABLE signature-index artifact: n·n_bands narrow rows whose
    psig is one int64 for ≤ 62-bit configs (band-sig string array on the
    wide fallback)."""
    wide = n_bands * bits_per_band > 62
    if wide:
        packed = F.array(*[F.col(f"band{b}") for b in range(n_bands)])
    else:
        packed = F.conv(
            F.concat_ws(
                "", *[F.col(f"band{b}") for b in reversed(range(n_bands))]
            ),
            2,
            10,
        ).cast("long")
    return sig.select(
        F.col(id_col),
        packed.alias("psig"),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(n_bands)])).alias(
            "band", "band_sig"
        ),
    )


def _first_match_join(
    banded_a: DataFrame,
    banded_b: DataFrame,
    n_bands: int,
    bits_per_band: int,
    id_col: str,
    delta_min_id: int | None = None,
) -> DataFrame:
    """First-matching-band pair emission over two (possibly distinct)
    banded relations — see `_first_match_pairs` for the emission rule.
    Two-sided form exists for the persisted-index ingest path, where the
    a side is index ∪ delta and the b side is the delta alone."""
    wide = n_bands * bits_per_band > 62
    a = banded_a.select(
        F.col(id_col).alias("id_a"), F.col("psig").alias("pa"), "band", "band_sig"
    )
    b = banded_b.select(
        F.col(id_col).alias("id_b"), F.col("psig").alias("pb"), "band", "band_sig"
    )
    if wide:
        first_match = ~F.exists(
            F.zip_with(
                F.slice(F.col("pa"), F.lit(1), F.col("band")),
                F.slice(F.col("pb"), F.lit(1), F.col("band")),
                lambda s1, s2: s1 == s2,
            ),
            lambda eq: eq,
        )
    else:
        lsb_mask = sum(1 << (bits_per_band * j) for j in range(n_bands))
        x = F.col("pa").bitwiseXOR(F.col("pb"))
        t = x
        for k in range(1, bits_per_band):
            t = t.bitwiseOR(F.shiftright(x, k))
        t = t.bitwiseAND(F.lit(lsb_mask))
        prior_mask = F.get(
            F.array(
                *[
                    F.lit((1 << (bits_per_band * j)) - 1).cast("long")
                    for j in range(n_bands)
                ]
            ),
            F.col("band"),
        )
        first_match = (
            F.bitwise_not(t).bitwiseAND(F.lit(lsb_mask)).bitwiseAND(prior_mask)
            == 0
        )
    pair_filter = (F.col("id_a") < F.col("id_b")) & first_match
    if delta_min_id is not None:
        # incremental-ingest conjunct (the jaccard/minhash delta
        # contract): the single-side predicate pushes below the band
        # join to the b-side input — corpus bands × DELTA bands.
        pair_filter = pair_filter & (F.col("id_b") >= F.lit(delta_min_id))
    return (
        a.join(b, ["band", "band_sig"])
        .filter(pair_filter)
        .select("id_a", "id_b")
    )


def lsh_banded_sigs(
    df: DataFrame,
    n_planes: int,
    n_bands: int,
    seed: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    sig_tier: str = "gemm",
) -> DataFrame:
    """The PERSISTABLE LSH signature index: (id, psig, band, band_sig)
    rows — n·n_bands narrow rows per corpus, psig one int64 for ≤ 62-bit
    configs. Signing is the expensive O(n·planes·dim) map; persisting
    this relation through the S5 sink means a delta-ingest batch never
    re-signs the corpus — it signs only the delta and joins against the
    loaded index (:func:`lsh_pairs_from_index`). Grid-exact projections
    (`gemm_lsh_bits` tier by default), so the persisted signatures equal
    the freshly-computed ones bit-for-bit."""
    sig = _band_sig_relation(
        df, n_planes, n_bands, seed, id_col, vec_col, dim, sig_tier
    )
    return _banded_relation(sig, n_bands, n_planes // n_bands, id_col)


def lsh_pairs_from_index(
    index_banded: DataFrame,
    delta_banded: DataFrame,
    corpus: DataFrame,
    threshold: float,
    n_planes: int,
    n_bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Delta-ingest near-dup pairs against a persisted signature index:
    band-join (index ∪ delta) × delta with first-matching-band emission,
    then the exact grid refine on the candidate pairs' vectors. Emits
    exactly the pairs of the full self-join restricted to id_b in the
    delta (set-equality pinned in tests/test_lsh_index.py). The corpus
    relation is touched only to attach CANDIDATE vectors by id — the
    full-corpus signature map is what the index amortizes away."""
    bits_per_band = n_planes // n_bands
    both = index_banded.unionByName(delta_banded).repartition(
        # same AQE-exempt rationale as _first_match_pairs: the exchange
        # must spread the band-join fan-out across the shuffle width
        shuffle_width(index_banded.sparkSession),
        F.col(id_col),
    )
    cand = _first_match_join(
        both, delta_banded, n_bands, bits_per_band, id_col
    )
    pairs = _pair_vectors_joined(cand, corpus, id_col, vec_col)
    return gemm_pair_cosine_refine(
        pairs, threshold, id_type=dict(corpus.dtypes)[id_col]
    )


def gemm_pair_cosine_refine(
    pairs: DataFrame,
    threshold: float,
    *,
    id_type: str,
    dot: str = "grid",
) -> DataFrame:
    """The banded-LSH EXACT REFINE as an Arrow/numpy kernel — the fourth
    (and last) member of the kernel family, extending the round-10 rule
    from per-row maps to PER-PAIR maps: every full-corpus interpreted
    map defaults to a vectorized kernel.

    Input is the already-joined candidate-pair relation
    ``(id_a, id_b, va, na, vb, nb)`` (norms precomputed per VECTOR —
    the round-11 hoist is kept; the kernel never re-reduces ‖v‖).
    Like :func:`gemm_lsh_bits` this is a pure NARROW map — no extra
    shuffle, no broadcast context, no collect_list blocks: Arrow batches
    ARE the blocks, and each batch's O(pairs·dim) grid dot runs as one
    vectorized ``round((va·vb)·1e9)`` int64 row-sum instead of dim
    interpreted ``F.round`` BigDecimals per pair. Measured round 12 at
    sf0.1 (1.79 M candidate pairs × dim 64): `sim_lsh_pairs_checked`
    10.4 → ~3.5 s, `sim_lsh_jl_screened_pairs` 9.7 → ~3.5 s min-of-3.

    Exactness contract (DuckDB oracles unchanged, hof tier kept as the
    A/B twin):

    - per-term ``round(va_i·vb_i·1e9)`` replicated by
      :func:`_np_round_half_away` with the in-plan parenthesization
      ``(x·y)·1e9`` pinned; int64 sums are exact.
    - ``cosine = round6((dg/1e9)/(na·nb))`` — int64→double, IEEE
      divides and the ``na·nb`` product are correctly rounded in both
      engines; round-6 via :func:`_np_round6` (bit-identical to
      ``F.round``, Decimal fallback at the midpoint guard band).
    - zero-norm mirror (probed in this session's ANSI mode, pinned in
      tests/test_operators.py::test_pair_refine_gemm_equals_hof): the
      engine runs Spark 4's default ``spark.sql.ansi.enabled=true``,
      under which the in-plan tier's cosine divide RAISES
      ``DIVIDE_BY_ZERO`` on a zero-norm pair — it never reaches a
      NaN/Inf round. The kernel raises ``ValueError`` on the same
      input class (the :func:`gemm_assign_cells` convention), so the
      two tiers agree on EVERY input — both succeed bit-identically or
      both fail loudly (the agreement ADVICE r11 #2 asks for).

    Row chunking caps the elementwise product tensor at ~32 MB per step
    regardless of Arrow batch size or dim; memory per task is bounded by
    the batch (``spark.sql.execution.arrow.maxRecordsPerBatch``), not
    the corpus, so the operator's 100 TB shape is unchanged from the hof
    form it replaces.

    Round 15 (guide §4.2): the kernel consumes RAW ARROW BATCHES
    (``mapInArrow``) instead of pandas frames — a fixed-width Arrow
    list column is one contiguous values buffer plus offsets, so
    :func:`~..linalg.arrow_list_to_2d` reshapes it into the (n, d)
    operand in ~0.04 ms/batch where the pandas path materialized a
    Python ndarray object per row (~20 ms per 10 k×64 batch, ×2
    operands — the measured majority of the refine stage). The rounding
    chain also fuses its temporaries with in-place ops (same
    ``(A·B)·1e9`` parenthesization, floor/half-compare/copysign
    sequence — bit-identity pinned by
    test_pair_refine_gemm_equals_hof / the fused-vs-naive edge tests).

    ``dot="float"`` serves the float-signature LSH tier
    (:func:`lsh_similarity_join`): the in-plan :func:`_dot` is an
    order-dependent LEFT FOLD, so the kernel accumulates
    dimension-by-dimension (``acc += A[:,t]·B[:,t]`` — the identical
    ``((0+t₀)+t₁)+…`` sequence per pair, vectorized over pairs; the
    :func:`gemm_assign_cells` float-flavor rule), then the same
    round-6 + threshold tail."""
    thr = float(threshold)
    if dot not in ("grid", "float"):
        raise ValueError(f"dot must be 'grid' or 'float', got {dot!r}")
    use_grid = dot == "grid"

    def refine_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import arrow_list_to_2d

        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            A = arrow_list_to_2d(rb.column("va"), np.float64)
            B = arrow_list_to_2d(rb.column("vb"), np.float64)
            d = A.shape[1]
            den = rb.column("na").to_numpy(
                zero_copy_only=False
            ) * rb.column("nb").to_numpy(zero_copy_only=False)
            if use_grid:
                dg = np.empty(n, dtype=np.int64)
                step = max(1, 4_000_000 // max(1, d))
                for lo in range(0, n, step):
                    v = np.multiply(A[lo : lo + step], B[lo : lo + step])
                    v *= 1e9
                    dg[lo : lo + step] = _np_round_half_away_consume(
                        v
                    ).sum(axis=1)
                num = dg.astype(np.float64) / 1e9
            else:
                acc = np.zeros(n, dtype=np.float64)
                for t in range(d):
                    acc += A[:, t] * B[:, t]
                num = acc
            if not den.all():
                # ANSI mirror: the in-plan tier raises DIVIDE_BY_ZERO
                # on a zero cosine denominator (zero-norm vector)
                raise ValueError(
                    "gemm_pair_cosine_refine: zero cosine denominator "
                    "(zero-norm vector); the hof tier raises "
                    "DIVIDE_BY_ZERO here under ANSI"
                )
            cos = num / den
            r6 = _np_round6(cos)
            keep = r6 >= thr
            if not keep.any():
                continue
            mask = pa.array(keep)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("id_a").filter(mask),
                    rb.column("id_b").filter(mask),
                    pa.array(r6[keep]),
                ],
                ["id_a", "id_b", "cosine"],
            )

    return pairs.select(
        "id_a", "id_b", "va", "na", "vb", "nb"
    ).mapInArrow(
        refine_batches, f"id_a {id_type}, id_b {id_type}, cosine double"
    )


def gemm_jl_screen(
    pairs: DataFrame, bound: int, *, id_type: str
) -> DataFrame:
    """The integer JL distance screen as an Arrow/numpy narrow map —
    kernel twin of the in-plan ``Σ(jlaⱼ−jlbⱼ)² ≤ bound`` DECIMAL fold
    (the screen needs 38-digit arithmetic because the ENFORCED |element|
    ≤ 37 grid bound allows d² sums up to ~2.3e21 — past int64; the
    decimal fold is therefore interpreted per pair, the exact class the
    kernel family eliminates).

    Exactness without decimals: ``d = jla − jlb`` is exact int64
    (|d| < 2³⁶ at the bound), its float64 square-sum carries absolute
    error < ~16·ulp(2.3e21) ≈ 1e7 — so any pair whose float sum lands
    ≥ 1e9 away from the bound is decided exactly by the float compare,
    and only pairs INSIDE the guard band (a measure-zero sliver of the
    d² value range) fall back to exact Python-int arithmetic. Same
    fast-path/exact-fallback discipline as :func:`_np_round6` and the
    :func:`gemm_assign_cells` argmax.

    Input: ``(id_a, id_b, jla, jlb)``; output: the surviving
    ``(id_a, id_b)`` — identical to the decimal filter, so the
    jl-screened oracle is unchanged.

    Round 15 (guide §4.2): raw Arrow batches + zero-copy list→(n, d)
    reshape (:func:`~..linalg.arrow_list_to_2d`), same decision logic —
    fast float compare outside the ±1e9 guard band, exact Python-int
    arithmetic inside it."""
    bnd_i = int(bound)
    bnd_f = float(bnd_i)
    guard = 1e9

    def screen_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import arrow_list_to_2d

        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            D = arrow_list_to_2d(
                rb.column("jla"), np.int64
            ) - arrow_list_to_2d(rb.column("jlb"), np.int64)
            Df = D.astype(np.float64)
            s = (Df * Df).sum(axis=1)
            keep = s <= bnd_f - guard
            near = np.nonzero(np.abs(s - bnd_f) <= guard)[0]
            for r in near:
                keep[r] = (
                    sum(int(x) * int(x) for x in D[r]) <= bnd_i
                )
            if not keep.any():
                continue
            mask = pa.array(keep)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("id_a").filter(mask),
                    rb.column("id_b").filter(mask),
                ],
                ["id_a", "id_b"],
            )

    return pairs.select("id_a", "id_b", "jla", "jlb").mapInArrow(
        screen_batches, f"id_a {id_type}, id_b {id_type}"
    )


def _pair_vectors_joined(
    cand: DataFrame,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    norm: str = "grid",
) -> DataFrame:
    """Attach per-vector (vector, norm) to both sides of a bare
    (id_a, id_b) candidate relation. Norms are computed once per VECTOR
    (n rows) and joined in — never folded per pair (round-11 hoist:
    29.4 → 10.4 s at sf0.1; the oracle's ``vn`` CTE always had this
    shape). ``norm="grid"`` → :func:`_grid_norm6` (the checked tiers),
    ``"float"`` → :func:`_norm` (the float-signature tier)."""
    norm_expr = {"grid": _grid_norm6, "float": _norm}[norm]
    emb = df.select(
        F.col(id_col),
        F.col(vec_col),
        norm_expr(F.col(vec_col)).alias("nrm"),
    )
    return cand.join(
        emb.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            F.col("nrm").alias("na"),
        ),
        "id_a",
    ).join(
        emb.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            F.col("nrm").alias("nb"),
        ),
        "id_b",
    )


def lsh_similarity_join_exact(
    df: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 16,
    n_bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    refine_tier: str = "gemm",
    delta_min_id: int | None = None,
) -> DataFrame:
    """:func:`lsh_similarity_join` made bit-reproducible cross-engine:
    signature bits come from int64-grid projections (sign of
    Σ round(x·h·1e9) — order-independent, no float accumulation at the
    decision boundary) and the refine cosine runs on the same grid. The
    candidate SET — not just the refined pairs — is therefore identical
    in any engine evaluating the same plane constants, which upgrades the
    hyperplane-LSH tier from a rows-only driver check to a full
    hash-exact oracle. Same scale shape as the float variant: narrow
    signature map → band equi-join → exact refine.

    ``refine_tier="gemm"`` (default, round 12): the exact refine — the
    last O(pairs·dim) interpreted map in the engine; at sf0.1's τ=0.35
    bulk-overlap regime the band screen passes 1.79 M of 2.00 M
    possible pairs (89%), so the refine IS an all-pairs-scale scan —
    runs via :func:`gemm_pair_cosine_refine` (narrow Arrow map,
    bit-identical values, oracle unchanged); ``"hof"`` keeps the
    in-plan fold as the A/B twin.
    """
    cand = _lsh_band_candidates(
        df, n_planes, n_bands, seed, id_col, vec_col, dim,
        delta_min_id=delta_min_id,
    )
    pairs = _pair_vectors_joined(cand, df, id_col, vec_col)
    if refine_tier == "gemm":
        return gemm_pair_cosine_refine(
            pairs, threshold, id_type=dict(df.dtypes)[id_col]
        )
    if refine_tier != "hof":
        raise ValueError(
            f"refine_tier must be 'gemm' or 'hof', got {refine_tier!r}"
        )
    cos = F.round(
        (_grid_dot(F.col("va"), F.col("vb")) / float(PQ_GRID))
        / (F.col("na") * F.col("nb")),
        6,
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def jl_screen_bound(
    threshold: float, jl_dim: int, slack_num: int = 2, slack_den: int = 1
) -> int:
    """The exact integer JL-screen bound: keep a candidate pair iff its
    projected squared distance Σⱼ(paⱼ−pbⱼ)² ≤ slack·jl_dim·2(1−τ)·Q²
    (Q = linalg.JL_QSCALE). Derivation: on unit vectors cosine ≥ τ ⟺
    ‖x−y‖² ≤ 2(1−τ); the projection is unbiased with
    E[‖P(x−y)‖²] = jl_dim·‖x−y‖²·Q², and the measured p95 distortion
    ratio at jl_dim=16 is 1.652 (tests/test_operators.py::
    test_jl_projection_distortion_and_recall), so the default slack 2
    covers the 95%+ tail. Computed in exact rational arithmetic from the
    threshold's DECIMAL string (never float multiplication), so both
    engines compare against the identical integer literal."""
    from fractions import Fraction

    from .linalg import JL_QSCALE

    tau = Fraction(str(threshold))
    return int(
        Fraction(slack_num, slack_den)
        * jl_dim
        * 2
        * (1 - tau)
        * JL_QSCALE
        * JL_QSCALE
    )


def lsh_jl_screened_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 16,
    n_bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    jl_dim: int = 16,
    slack_num: int = 2,
    slack_den: int = 1,
    refine_tier: str = "gemm",
) -> DataFrame:
    """:func:`lsh_similarity_join_exact` with a 16-dim integer JL screen
    between banding and the exact refine — the three-tier ladder the JL
    sketch exists for:

    1. band equi-join over bare ids (shared `_lsh_band_candidates`);
    2. candidates rejoin the 16×int64 JL sketch (~128 B/row vs ~512 B
       for the dim-64 double vector: the pair-stage exchange is 4×
       lighter) and pairs whose PROJECTED squared distance exceeds
       :func:`jl_screen_bound` are dropped before any dim-64 work;
    3. only screen survivors rejoin the full embeddings for the exact
       grid cosine ≥ τ refine.

    Every stage is deterministic integer arithmetic (the screen compares
    an exact integer square-sum against an exact rational-derived
    integer — a DECIMAL(38,0) fold in the ``"hof"`` tier, the
    :func:`gemm_jl_screen` guarded-float kernel in the default
    ``"gemm"`` tier, identical decisions), so the whole ladder carries
    a full value-hash DuckDB oracle. The screen
    is APPROXIMATE BY CONTRACT — a true-positive pair whose projected
    distance lands beyond the slack·p95 tail is dropped. Measured
    (tests/test_operators.py::test_jl_screened_lsh_pairs), both regimes:

    - near-dup regime (τ=0.9, planted jittered duplicates): the screen
      kills 99.9% of ~161k band candidates (165 survive) at recall 1.0
      — the dim-64 refine runs on 0.1% of the collisions. This is the
      deployment regime: dedup thresholds are high, and band collisions
      at petabyte n dominate the pair count.
    - bulk-overlap regime (τ=0.35 on the isotropic fixture, where the
      τ-ball overlaps the typical inter-point distance d²≈2): only ~20%
      of candidates screened out, recall 0.992–0.996 vs the unscreened
      checked join (strict subset). When 2(1−τ)·slack exceeds the bulk
      distance the screen can't help — use the unscreened tier there."""
    from .linalg import jl_project

    cand = _lsh_band_candidates(
        df, n_planes, n_bands, seed, id_col, vec_col, dim
    )
    jl = jl_project(
        df.select(F.col(id_col), F.col(vec_col)),
        vec_col,
        dim_in=dim,
        dim_out=jl_dim,
    ).select(F.col(id_col), F.col("jl"))
    bound = jl_screen_bound(threshold, jl_dim, slack_num, slack_den)
    withjl = cand.join(
        jl.select(F.col(id_col).alias("id_a"), F.col("jl").alias("jla")),
        "id_a",
    ).join(
        jl.select(F.col(id_col).alias("id_b"), F.col("jl").alias("jlb")),
        "id_b",
    )
    if refine_tier == "gemm":
        # screen kernel BEFORE the dim-64 vector join, preserving the
        # ladder's scale shape (only survivors ever carry full vectors)
        screened = gemm_jl_screen(
            withjl, bound, id_type=dict(df.dtypes)[id_col]
        )
    else:
        d2 = F.aggregate(
            F.zip_with(
                F.col("jla"),
                F.col("jlb"),
                lambda x, y: (x - y).cast("decimal(19,0)")
                * (x - y).cast("decimal(19,0)"),
            ),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, v: acc + v,
        )
        screened = withjl.filter(
            d2 <= F.lit(bound).cast("decimal(38,0)")
        ).select("id_a", "id_b")
    # per-vector norms precomputed (never folded per candidate pair) and
    # the refine tier dispatch both shared with lsh_similarity_join_exact
    pairs = _pair_vectors_joined(screened, df, id_col, vec_col)
    if refine_tier == "gemm":
        return gemm_pair_cosine_refine(
            pairs, threshold, id_type=dict(df.dtypes)[id_col]
        )
    if refine_tier != "hof":
        raise ValueError(
            f"refine_tier must be 'gemm' or 'hof', got {refine_tier!r}"
        )
    cos = F.round(
        (_grid_dot(F.col("va"), F.col("vb")) / float(PQ_GRID))
        / (F.col("na") * F.col("nb")),
        6,
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivfpq_topk(
    df: DataFrame,
    probe_id: int = 1,
    n_cells: int = 8,
    n_probe: int = 2,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 10,
    rerank: int = 50,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    assign: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """IVF-PQ serving composition (Jégou et al. TPAMI'11 §V: coarse
    inverted lists + product codes — the FAISS IVFPQ architecture): route
    the probe to its ``n_probe`` nearest coarse cells, ADC-score ONLY the
    vectors in those cells from their PQ codes, exact-rerank the top
    ``rerank``. At 100 TB the scan touches n_probe/n_cells of the codes
    table instead of all of it — the two pruning levels compose.

    Simplification vs the paper (documented): codes quantize raw vectors,
    not cell residuals; the routing/ADC/rerank plan shape is identical.
    The paper-faithful residual variant is :func:`ivfpq_residual_topk`
    (inner-product ADC decomposes as dot(q,c) + dot(q,r) — one shared
    residual codebook, no per-cell training state). Coarse cells and
    codes both use the int64-grid arithmetic, so the full composition is
    hash-exact cross-engine.

    Zero driver jobs: coarse seeds, codebook, probe, and the probe's cell
    list are all in-plan 1-row broadcast contexts.

    ``assign="gemm"`` (default) routes the corpus coarse-cell assignment
    through :func:`gemm_assign_cells` with the seed norms hoisted into
    the 1-row context (the HOF form recomputed ``_grid_norm6(semb)`` per
    ROW per CELL — interpreter cost on top of interpreter cost);
    ``"hof"`` keeps the in-plan argmax. Values bit-identical either way,
    oracle unchanged. The post-route ADC/encode stages only touch the
    probed n_probe/n_cells fraction, so they stay in-plan.
    """
    seeds_row = df.filter(F.col(id_col) < n_cells).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("int").alias("cell_id"),
                    F.col(vec_col).alias("semb"),
                )
            )
        ).alias("cells")
    )

    def _cell_ranked(vec: Column, vnorm6: Column) -> Column:
        """array<struct<negcos, cell_id>> sorted: cosine desc, id asc —
        grid-exact cosine so the ranking is engine-independent."""
        return F.array_sort(
            F.transform(
                F.col("cells"),
                lambda c: F.struct(
                    (
                        -F.round(
                            (_grid_dot(vec, c["semb"]) / float(PQ_GRID))
                            / (vnorm6 * _grid_norm6(c["semb"])),
                            6,
                        )
                    ).alias("negcos"),
                    c["cell_id"].alias("cell_id"),
                ),
            )
        )

    codes = pq_encode(
        df, n_centroids, m, dim=dim, id_col=id_col, vec_col=vec_col,
        keep_cols=keep_cols, n_blocks=n_blocks,
    )
    sub = dim // m
    cb_row = df.filter(F.col(id_col) < n_centroids).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("int").alias("cid"),
                    F.col(vec_col).alias("cemb"),
                )
            )
        ).alias("cb")
    ).select(
        _assert_contiguous_ids(
            F.col("cb"), "cid", n_centroids, "ivfpq_topk ADC table"
        ).alias("cb")
    )
    probe_row = df.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("q"), _grid_norm6(F.col(vec_col)).alias("qnorm")
    ).limit(1)  # provably 1-row broadcast context (see cosine_topk_by_id)
    ctx = (
        probe_row.crossJoin(seeds_row)
        .crossJoin(cb_row)
        .withColumn(
            "probe_cells",
            F.slice(
                F.transform(
                    _cell_ranked(F.col("q"), F.col("qnorm")),
                    lambda s: s["cell_id"],
                ),
                1,
                n_probe,
            ),
        )
        .withColumn(
            "ptab",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.transform(
                    F.col("cb"),
                    lambda c: _grid_dot(
                        F.slice(F.col("q"), s * sub + 1, sub),
                        F.slice(c["cemb"], s * sub + 1, sub),
                    ),
                ),
            ),
        )
        .select("q", "qnorm", "cells", "probe_cells", "ptab")
    )
    base = df.select(id_col, vec_col).join(codes.select(id_col, "codes", "vnorm"), id_col)
    if assign == "gemm":
        seedsn_row = (
            df.filter(F.col(id_col) < n_cells)
            .select(
                F.col(id_col).cast("int").alias("cell_id"),
                F.col(vec_col).alias("semb"),
            )
            .withColumn("snorm", _grid_norm6(F.col("semb")))
            .agg(
                F.collect_list(
                    F.struct("cell_id", "semb", "snorm")
                ).alias("seeds")
            )
        )
        routed = (
            gemm_assign_cells(
                base,
                seedsn_row,
                id_col=id_col,
                vec_col=vec_col,
                nrm_col="vnorm",
                dot="grid",
                extra_cols=("codes",),
                n_blocks=n_blocks,
            )
            .crossJoin(
                F.broadcast(ctx.select("q", "qnorm", "probe_cells", "ptab"))
            )
            .filter(
                F.array_contains(F.col("probe_cells"), F.col("cell_id"))
                & (F.col(id_col) != probe_id)
            )
        )
    else:
        routed = (
            base.crossJoin(F.broadcast(ctx))
            .withColumn(
                "cell_id",
                F.element_at(
                    _cell_ranked(F.col(vec_col), F.col("vnorm")), 1
                )["cell_id"],
            )
            .filter(
                F.array_contains(F.col("probe_cells"), F.col("cell_id"))
                & (F.col(id_col) != probe_id)
            )
        )
    scored = routed.withColumn(
        "adc_dot_grid",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.get(F.get(F.col("ptab"), s), F.get(F.col("codes"), s)),
        ),
    ).withColumn(
        "adc_cosine",
        F.round(
            (F.col("adc_dot_grid") / float(PQ_GRID))
            / (F.col("vnorm") * F.col("qnorm")),
            6,
        ),
    )
    cands = scored.select(
        id_col, "adc_cosine", "q", "qnorm", "vnorm"
    ).orderBy(F.desc("adc_cosine"), F.asc(id_col)).limit(rerank)
    reranked = df.select(id_col, *keep_cols, vec_col).join(
        F.broadcast(cands), id_col
    )
    return (
        reranked.withColumn(
            "cosine",
            F.round(
                (_grid_dot(F.col(vec_col), F.col("q")) / float(PQ_GRID))
                / (F.col("vnorm") * F.col("qnorm")),
                6,
            ),
        )
        .select(id_col, *keep_cols, "adc_cosine", "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds_from: DataFrame | None = None,
    dominance_tier: str = "gemm",
    delta_min_id: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas, Tirumala, Simig,
    Ganguli & Morcos 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", arXiv:2303.09540 — public paper):
    cluster embeddings into coarse cells, search near-duplicate pairs ONLY
    within each cell, and keep one representative per duplicate relation.

    The cell partition is exactly what makes web-scale semantic dedup
    tractable: candidate-pair cost drops from n² to Σ|cell|², and
    ``n_cells`` is the scale knob — grown ∝ n it keeps the expected
    per-cell quadratic cost constant. Cells are seeded deterministically
    (vectors with ``id < n_cells``, the ivf_topk convention) and assigned
    by argmax of the 1e-6-rounded cosine with a cell-id tie-break, so the
    whole operator is hash-exact cross-engine.

    Drop rule (deterministic form of the paper's representative pick): x
    is dropped iff some y with ``y.id < x.id`` sits in the same cell with
    ``round(cos(x, y), 6) >= threshold`` — a dominance rule, not
    transitive-closure grouping (the paper prunes per ε-cluster the same
    way; components-based collapsing is :func:`~..operators.graph.
    connected_components_star`'s job when chain semantics are wanted).

    Plan shape: 1-row broadcast of the seed array → narrow per-row argmax
    assignment (no shuffle) → cell-keyed self equi join (bounded fan-out)
    → distinct dominated ids → left-anti keep mark. Returns
    ``(id_col, cell_id, kept)`` for every input vector.

    All cosines ride an int64 grid, quantize-once form (``_sem_quant`` /
    ``_sem_qdot`` / ``_sem_qnorm6``): every element is rounded onto a
    1e-7 grid ONCE per vector, and every dot product then reduces
    exactly in int64 — associative, so both the cell argmax and the
    threshold compare are bit-identical cross-engine; a pair landing
    exactly on the 1e-6 rounding boundary of ``threshold`` cannot flip
    between Spark and the oracle (ADVICE r6). Quantize-once (rather
    than rounding each per-pair product as the PQ tiers' ``_grid_dot``
    does) keeps the Σ|cell|² pair scan free of per-pair rounding — the
    JVM's BigDecimal round per pair × per element cost 24× wall,
    measured round 7. The 1e-7 element grid perturbs a true cosine by
    < 1e-6 for unit-scale vectors, inside the operator's existing
    1e-6-grid decision convention.

    ``seeds_from`` (default: ``df`` itself) supplies the cell-seed
    vectors — pass the UNRESTRICTED embedding relation when ``df`` is a
    filtered survivor subset that may have lost the ``id < n_cells``
    seed rows (the composed-pipeline case): cell geometry then stays
    identical whether or not upstream stages dropped any seed.
    """
    assigned = sem_assigned_relation(
        df, n_cells, id_col, vec_col, seeds_from=seeds_from
    )
    return _sem_cell_dominance(
        assigned, threshold, id_col, tier=dominance_tier,
        delta_min_id=delta_min_id,
    )


def sem_assigned_relation(
    df: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds_from: DataFrame | None = None,
) -> DataFrame:
    """The PERSISTABLE SemDeDup assignment index: (id, __qv, __nrm,
    cell_id) — the per-row argmax cell assignment over the seeded
    coarse cells, carrying the quantize-once int64 vector (``__qv``)
    and its round-6 norm (``__nrm``) the dominance kernel consumes.
    Both round-trip the S5 parquet sink exactly (int64 arrays; a
    round-6 double), so a delta-ingest batch never re-assigns or
    re-quantizes the corpus — it assigns only the delta and unions with
    the loaded relation (:func:`semantic_dedup_from_index`)."""
    seeds_row = (
        (seeds_from if seeds_from is not None else df)
        .filter(F.col(id_col) < n_cells)
        .select(
            F.col(id_col).cast("int").alias("cell_id"),
            _sem_quant(F.col(vec_col)).alias("sq"),
        )
        .select("cell_id", "sq", _sem_qnorm6(F.col("sq")).alias("snorm"))
        .agg(
            F.collect_list(F.struct("cell_id", "sq", "snorm")).alias("seeds")
        )
    )
    ranked = F.array_sort(
        F.transform(
            F.col("seeds"),
            lambda s: F.struct(
                (
                    -F.round(
                        (_sem_qdot(F.col("__qv"), s["sq"])
                         / float(SEM_QSCALE) ** 2)
                        / (F.col("__nrm") * s["snorm"]),
                        6,
                    )
                ).alias("negcos"),
                s["cell_id"].alias("cell_id"),
            ),
        )
    )
    return (
        df.withColumn("__qv", _sem_quant(F.col(vec_col)))
        .withColumn("__nrm", _sem_qnorm6(F.col("__qv")))
        .crossJoin(F.broadcast(seeds_row))
        .select(
            F.col(id_col),
            F.col("__qv"),
            "__nrm",
            F.element_at(ranked, 1)["cell_id"].alias("cell_id"),
        )
    )


def semantic_dedup_from_index(
    index_assigned: DataFrame,
    delta_df: DataFrame,
    delta_min_id: int,
    n_cells: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds_from: DataFrame | None = None,
    dominance_tier: str = "gemm",
) -> DataFrame:
    """Delta-ingest SemDeDup against the persisted assignment index:
    only the delta is quantized and argmax-assigned (``seeds_from``
    must supply the unrestricted seed rows — they live in the base
    corpus); the dominance kernel then runs over index ∪ delta rows
    with its delta row-tiles, exactly as the self-contained incremental
    form. Emits the same (id, cell_id, kept) rows as
    :func:`semantic_dedup` with ``delta_min_id`` (equality pinned in
    tests/test_operators.py), so it shares the
    ``dedup_semantic_incremental`` oracle."""
    delta_assigned = sem_assigned_relation(
        delta_df, n_cells, id_col, vec_col, seeds_from=seeds_from
    )
    assigned = index_assigned.unionByName(delta_assigned)
    return _sem_cell_dominance(
        assigned, threshold, id_col, tier=dominance_tier,
        delta_min_id=delta_min_id,
    )


def _sem_cell_dominance(
    assigned: DataFrame,
    threshold: float,
    id_col: str,
    tier: str = "gemm",
    delta_min_id: int | None = None,
) -> DataFrame:
    """Shared SemDeDup tail: within each cell, a row is DOMINATED iff
    some strictly-smaller id in the same cell has
    ``round(cos, 6) ≥ threshold``. ``assigned`` must carry
    ``(id_col, __qv, __nrm, cell_id)``; cosines reduce on the
    quantize-once int64 grid, so the threshold compare is bit-identical
    cross-engine in BOTH tiers.

    ``tier="gemm"`` (default, round 12 — the last interpreted per-PAIR
    fold in the SemDeDup family): one grouped-map kernel over the cell
    key computes each cell's pairwise int64 GEMM (exact within
    ``_sem_quant``'s enforced |x| ≤ 37 bound: 64·(3.7e8)² < 2⁶³),
    divides with the in-plan parenthesization pinned, rounds via
    :func:`_np_round6` (bit-identical to ``F.round``, so ANY threshold
    is exact — no 1e-6-grid restriction here), and marks the
    strict-lower-triangle dominance directly. That REPLACES the
    cell-keyed self join + per-pair interpreted ``_sem_qdot`` fold +
    distinct + left-join tail with ONE exchange and zero interpreted
    per-pair work; tiles cap the kernel's working set (~32 MB per
    tile) so a skewed cell bounds memory, not correctness. Zero-norm
    rows raise ``ValueError`` (the family's ANSI mirror — the hof
    tier's divide raises DIVIDE_BY_ZERO). Ids must be orderable the
    same way in numpy and Spark (numeric ids — every current caller).
    ``tier="hof"`` keeps the join form as the A/B twin; equivalence is
    pinned by tests/test_operators.py::test_sem_dominance_gemm_equals_hof.
    """
    if tier == "gemm":
        dtypes = dict(assigned.dtypes)
        out_schema = (
            f"`{id_col}` {dtypes[id_col]}, "
            f"cell_id {dtypes['cell_id']}, kept boolean"
        )
        thr = float(threshold)

        delta = delta_min_id

        def dominate(tbl):
            import numpy as np
            import pyarrow as pa

            from .linalg import arrow_list_to_2d

            def emit(ids_v, cells_v, kept_v):
                return pa.Table.from_arrays(
                    [pa.array(ids_v), pa.array(cells_v),
                     pa.array(np.asarray(kept_v, dtype=bool))],
                    [id_col, "cell_id", "kept"],
                )

            t = tbl.combine_chunks()
            n = t.num_rows
            ids = t.column(id_col).to_numpy()
            cells = t.column("cell_id").to_numpy()
            if delta is not None:
                keep_rows = ids >= delta
                if not keep_rows.any():
                    return emit(
                        ids[:0], cells[:0], np.zeros(0, dtype=bool)
                    )
            if n <= 1:
                if delta is not None:
                    return emit(
                        ids[keep_rows],
                        cells[keep_rows],
                        np.ones(int(keep_rows.sum()), dtype=bool),
                    )
                return emit(ids, cells, np.ones(n, dtype=bool))
            order = np.argsort(ids, kind="stable")
            Q = arrow_list_to_2d(t.column("__qv").chunk(0), np.int64)[
                order
            ]
            nrm = t.column("__nrm").to_numpy()[order]
            if not nrm.all():
                raise ValueError(
                    "_sem_cell_dominance: zero norm in cell — the hof "
                    "tier raises DIVIDE_BY_ZERO here under ANSI"
                )
            dom = np.zeros(n, dtype=bool)
            step = max(1, 4_000_000 // n)
            # incremental mode: delta ids are a SUFFIX of the sorted
            # order, so the row-tile loop starts at the first delta row —
            # per-cell work is |delta_cell| x |cell|, not the full lower
            # triangle (the columns compared against stay ALL smaller
            # ids, existing corpus and earlier delta alike)
            start = 1
            if delta is not None:
                start = int(np.searchsorted(ids[order], delta, side="left"))
                start = max(start, 1)
            for i0 in range(start, n, step):
                i1 = min(i0 + step, n)
                G = (Q[i0:i1] @ Q[:i1].T).astype(np.float64)
                C = (G / float(SEM_QSCALE) ** 2) / (
                    nrm[i0:i1, None] * nrm[None, :i1]
                )
                r6 = _np_round6(C.ravel()).reshape(C.shape)
                m = r6 >= thr
                # only strictly-smaller GLOBAL index dominates: full
                # columns below i0, strict lower triangle inside the
                # tile-local square
                m[:, i0:] = np.tril(m[:, i0:], k=-1)
                dom[i0:i1] = m.any(axis=1)
            kept = np.empty(n, dtype=bool)
            kept[order] = ~dom
            if delta is not None:
                return emit(
                    ids[keep_rows], cells[keep_rows], kept[keep_rows]
                )
            return emit(ids, cells, kept)

        return (
            assigned.select(id_col, "__qv", "__nrm", "cell_id")
            # explicit partition count: the exchange carries quantized
            # vectors (~bytes-cheap, compute-heavy downstream), so AQE
            # would coalesce it to a handful of tasks and serialize the
            # per-cell GEMMs (measured 7 tasks on 16 cores at the 16×
            # rung). A user-specified count is AQE-exempt, and a relation
            # already hash-partitioned by cell_id satisfies the
            # grouped-map clustering requirement — no second exchange.
            .repartition(
                shuffle_width(assigned.sparkSession),
                F.col("cell_id"),
            )
            .groupBy("cell_id")
            # round 15: applyInArrow — the cell's __qv list column
            # reshapes zero-copy instead of materializing per-row
            # ndarray objects (guide §4.2); values identical
            .applyInArrow(dominate, out_schema)
        )
    if tier != "hof":
        raise ValueError(f"tier must be 'gemm' or 'hof', got {tier!r}")
    a = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col("__qv").alias("qa"),
        F.col("__nrm").alias("na"),
        "cell_id",
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col("__qv").alias("qb"),
        F.col("__nrm").alias("nb"),
        "cell_id",
    )
    pair_cond = F.col("id_a") < F.col("id_b")
    if delta_min_id is not None:
        pair_cond = pair_cond & (F.col("id_b") >= F.lit(delta_min_id))
    dominated = (
        a.join(b, "cell_id")
        .filter(pair_cond)
        .filter(
            F.round(
                (_sem_qdot(F.col("qa"), F.col("qb"))
                 / float(SEM_QSCALE) ** 2)
                / (F.col("na") * F.col("nb")),
                6,
            )
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    marked = assigned
    if delta_min_id is not None:
        marked = marked.filter(F.col(id_col) >= F.lit(delta_min_id))
    return (
        marked.join(
            dominated.withColumn("__dom", F.lit(1)), id_col, "left"
        )
        .select(
            id_col,
            "cell_id",
            F.col("__dom").isNull().alias("kept"),
        )
    )


def semantic_decontaminate(
    df: DataFrame,
    eval_col: Column,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tier: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination: every TRAIN vector whose cosine
    to ANY EVAL vector reaches ``threshold`` is flagged contaminated —
    the semantic complement of n-gram decontamination
    (queries/training_data.py::pipeline_decontaminate), catching
    paraphrased/reworded benchmark leakage that shares no 8-gram with
    the eval slice (the failure mode n-gram overlap provably misses).

    ``eval_col`` is a boolean Column marking the eval slice on ``df``.
    Returns ``(id_col, contaminated)`` for every train (non-eval) row.

    Determinism: the quantize-once int64 grid shared with the SemDeDup
    family (``_sem_quant`` / ``_sem_qdot`` / ``_sem_qnorm6``) — the
    ``round(cos, 6) >= threshold`` compare is bit-identical
    cross-engine, so the flag carries a full value-hash oracle.

    Plan shape / scale: the eval side collects into ONE row (grouping-
    free aggregate → maxRows=1, the same bounded seeds-row idiom the
    registry-wide cartesian sweep proves for semantic_dedup) and
    broadcasts; the train side is a narrow per-row EXISTS map — zero
    shuffles beyond the broadcast. That is the right shape because an
    eval suite is small BY CONSTRUCTION (benchmarks, ~10⁵ vectors ≈
    tens of MB quantized) while train is the 100 TB side.

    ``tier``: the compare is O(|eval|·dim) PER TRAIN ROW — the exact
    map class the round-10 kernel family exists for, and the 256×
    ladder measured the interpreted EXISTS at 91 s for 512k train ×
    ~100 eval (~28 ns/term — pure interpreter). ``"gemm"`` (default)
    therefore routes the train side through the
    :func:`gemm_assign_cells` block layout: rows group into
    :func:`kernel_block_count`-sized blocks (one eval-matrix copy per
    BLOCK, not per row), numpy computes the exact int64 ``Q @ Eᵀ``
    (in-range by ``_sem_quant``'s enforced |x| ≤ 37 bound), converts
    and divides with the in-plan parenthesization pinned — doubles
    bit-identical to the JVM's — and decides ``round(cos, 6) ≥ τ`` on
    the per-row MAX (rounding is monotone, so the max pair decides the
    EXISTS), with a Decimal(repr) half-up fallback only within 1e-9 of
    the decision boundary. ``"hof"`` keeps the in-plan EXISTS as the
    A/B tier. ``threshold`` must lie on the 1e-6 grid (raise otherwise):
    the kernel's fast-path boundary τ − 5e-7 is only the true round-6
    decision boundary for grid thresholds (ADVICE r11).

    Zero-norm agreement (probed, pinned in tests/test_operators.py::
    test_semantic_decontaminate_zero_norm_both_tiers_raise): under the
    engine session's ANSI mode the hof tier's cosine divide raises
    ``DIVIDE_BY_ZERO`` on any zero-norm train OR eval vector — it never
    reaches a NaN compare — and the kernel raises ``ValueError`` on the
    same input class, so the tiers agree on every input: both succeed
    bit-identically or both fail loudly. Equivalence pinned by
    tests/test_operators.py::test_semantic_decontaminate_tier_equivalence.
    """
    q = df.select(
        F.col(id_col),
        eval_col.alias("__ev"),
        _sem_quant(F.col(vec_col)).alias("__qv"),
    ).select(
        id_col,
        "__ev",
        "__qv",
        _sem_qnorm6(F.col("__qv")).alias("__nrm"),
    )
    ev_row = q.filter(F.col("__ev")).agg(
        F.collect_list(
            F.struct(
                F.col("__qv").alias("qe"), F.col("__nrm").alias("ne")
            )
        ).alias("evs")
    )
    if tier == "hof":
        hit = F.exists(
            F.col("evs"),
            lambda e: F.round(
                (_sem_qdot(F.col("__qv"), e["qe"]) / float(SEM_QSCALE) ** 2)
                / (F.col("__nrm") * e["ne"]),
                6,
            )
            >= F.lit(threshold),
        )
        return (
            q.filter(~F.col("__ev"))
            .crossJoin(F.broadcast(ev_row))
            .select(id_col, hit.alias("contaminated"))
        )
    if tier != "gemm":
        raise ValueError(f"tier must be 'gemm' or 'hof', got {tier!r}")

    id_type = dict(df.dtypes)[id_col]
    proj = q.filter(~F.col("__ev")).select(id_col, "__qv", "__nrm")
    n_blocks = kernel_block_count(proj, n_blocks)
    blocks = (
        proj.withColumn(
            "__blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
        )
        .groupBy("__blk")
        .agg(
            F.collect_list(F.struct(id_col, "__qv", "__nrm")).alias(
                "ablock"
            )
        )
    )
    ctx = blocks.crossJoin(F.broadcast(ev_row))
    out_schema = f"`{id_col}` {id_type}, contaminated boolean"
    thr = float(threshold)
    from decimal import Decimal as _Dec

    # the kernel's fast-path boundary tau - 5e-7 is the true decision
    # boundary of round(cos, 6) >= tau ONLY when tau lies on the 1e-6
    # grid; a finer threshold would silently diverge from the hof tier
    # near the boundary (ADVICE r11), so reject it loudly at plan time
    if _Dec(str(threshold)) != _Dec(str(threshold)).quantize(
        _Dec("0.000001")
    ):
        raise ValueError(
            "semantic_decontaminate: threshold must lie on the 1e-6 "
            f"grid (round-6 cosines cannot resolve {threshold!r}); "
            "quantize it to 6 decimal places"
        )

    # round 16 (guide §4.2, VERDICT r15 #3): raw Arrow batches — the
    # eval-suite context parses once per batch, the train block GEMMs
    # over the whole batch (blocks only delimited the pandas loop; the
    # flag needs no per-block state). Same int64 GEMM, same boundary
    # Decimal path.
    def flag_batches(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pyarrow as pa

        from .linalg import (
            arrow_list_to_2d,
            block_layout,
            context_entries,
        )

        tau = Decimal(str(thr))
        grid6 = Decimal("0.000001")
        # real decision boundary of round-half-up at 6 places: the
        # smallest real that rounds to >= tau is tau - 5e-7 — derived
        # in exact decimal, not float subtraction
        thr_b = float(tau - Decimal("0.0000005"))
        for rb in batches:
            if not rb.num_rows:
                continue
            entries, offs = block_layout(rb.column("ablock"))
            base_o = int(offs[0])
            total = int(offs[-1]) - base_o
            out_rows = entries.slice(base_o, total)
            ids_col = out_rows.field(id_col)
            evs = context_entries(rb.column("evs"))
            if not len(evs):
                # EXISTS over an empty eval suite is false — same as
                # the HOF tier
                yield pa.RecordBatch.from_arrays(
                    [ids_col, pa.array(np.zeros(total, dtype=bool))],
                    [id_col, "contaminated"],
                )
                continue
            Q = arrow_list_to_2d(out_rows.field("__qv"), np.int64)
            na = out_rows.field("__nrm").to_numpy()
            E = arrow_list_to_2d(evs.field("qe"), np.int64)
            ne = evs.field("ne").to_numpy()
            if Q.size == 0:
                Q = Q.reshape(0, E.shape[1])
            if not (na.all() and ne.all()):
                raise ValueError(
                    "semantic_decontaminate: zero norm in train or "
                    "eval — a NaN cosine may not decide a flag"
                )
            # exact int64 GEMM (in-range by _sem_quant's bound),
            # then the in-plan parenthesization pinned:
            # (dot as double / 1e14) / (nrm * ne)
            D = (Q @ E.T).astype(np.float64)
            C = (D / float(SEM_QSCALE) ** 2) / (
                na[:, None] * ne[None, :]
            )
            m = C.max(axis=1) if total else C.reshape(0)
            flags = m > thr_b + 1e-9
            for r in np.nonzero(np.abs(m - thr_b) <= 1e-9)[0]:
                flags[r] = (
                    Decimal(repr(float(m[r]))).quantize(
                        grid6, rounding=ROUND_HALF_UP
                    )
                    >= tau
                )
            yield pa.RecordBatch.from_arrays(
                [ids_col, pa.array(flags)],
                [id_col, "contaminated"],
            )

    return ctx.mapInArrow(flag_batches, out_schema)


def _sem_argmax_cell(qv: Column, nrm: Column, arr: Column) -> Column:
    """cell_id of the argmax rounded-cosine seed in ``arr`` (array of
    struct with ``cell_id``/``sq``/``snorm``), ties to the smaller
    cell_id — the SemDeDup assignment rule as one expression."""
    return F.element_at(
        F.array_sort(
            F.transform(
                arr,
                lambda s: F.struct(
                    (
                        -F.round(
                            (_sem_qdot(qv, s["sq"])
                             / float(SEM_QSCALE) ** 2)
                            / (nrm * s["snorm"]),
                            6,
                        )
                    ).alias("negcos"),
                    s["cell_id"].alias("cell_id"),
                ),
            )
        ),
        1,
    )["cell_id"]


def semantic_dedup_two_level(
    df: DataFrame,
    n_cells: int = 16,
    n_super: int = 4,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds_from: DataFrame | None = None,
    dominance_tier: str = "gemm",
) -> DataFrame:
    """:func:`semantic_dedup` with a HIERARCHICAL (two-level) coarse
    assignment: routing each row through ``n_super ≈ √cells`` top-level
    seeds first, then refining only within the chosen super's child
    cells, keeps per-row FLOPs O(√cells) — the inverted-multi-index /
    coarse-quantizer layout (Babenko & Lempitsky 2012, "The inverted
    multi-index", CVPR — public paper).

    SUPERSEDED AS THE SCALE PATH by round-8 measurement (BASELINE_HISTORY.md
    §"SemDeDup assignment"): the binding cost of in-plan assignment is
    the nested-HOF INTERPRETER (~1 ms/row at 512 cells), not the FLOP
    count — halving FLOPs while keeping the interpreter only halves the
    wall, and at 128 cells this form's two-argmax overhead actually
    loses to flat (22.2 s vs 14.8 s forced at 16×). The production
    tiers are :func:`semantic_dedup_gemm` (flat kernel) and its
    ``two_level=True`` composition (this routing at kernel speed —
    measured 0.75 vs 1.82 step efficiency at 256× on genuinely 2-level
    data, occupancy collapse otherwise); pick via
    :func:`recommend_semantic_dedup_tier`. This in-plan form stays as
    the structural reference surface (`dedup_semantic_h2`, oracle-
    checked) and the no-Python-boundary fallback.

    Deterministic rule, mirrored exactly by the DuckDB oracle:

    1. child seeds = vectors with ``id < n_cells`` (cell_id = id);
       supers = the subset with ``id < n_super``;
    2. each CHILD cell is parented to its argmax-cosine super
       (1e-6-rounded grid cosine, ties to the smaller super id);
    3. each row picks its argmax super, then its argmax child AMONG
       that super's children — both with the same rounded-cosine
       tie-break rule;
    4. within-cell dominance identical to :func:`semantic_dedup`.

    The two-level cell can differ from the single-level one (hierarchical
    coarse quantization is an approximation — that is the entire point),
    so this is a SEPARATE oracle-checked query surface, not a flag that
    silently changes ``dedup_semantic``'s answers. Every super always has
    at least one child (itself: cos = 1 beats every other super, ties to
    its own id only for bit-identical duplicate seed vectors).

    Plan shape: unchanged from the single-level form — ONE 1-row
    broadcast seed context (child parenting is computed INSIDE the 1-row
    aggregate with nested HOFs, O(cells·√cells) once, no extra job or
    shuffle) → narrow per-row two-step argmax → the shared cell-join
    dominance tail. The only change at scale is the per-row flop count.
    """
    base = (
        (seeds_from if seeds_from is not None else df)
        .filter(F.col(id_col) < n_cells)
        .select(
            F.col(id_col).cast("int").alias("cell_id"),
            _sem_quant(F.col(vec_col)).alias("sq"),
        )
        .select("cell_id", "sq", _sem_qnorm6(F.col("sq")).alias("snorm"))
        .agg(F.collect_list(F.struct("cell_id", "sq", "snorm")).alias("cs"))
    )
    supers = F.filter(F.col("cs"), lambda c: c["cell_id"] < n_super)
    children = F.transform(
        F.col("cs"),
        lambda c: F.struct(
            c["cell_id"].alias("cell_id"),
            c["sq"].alias("sq"),
            c["snorm"].alias("snorm"),
            _sem_argmax_cell(c["sq"], c["snorm"], supers).alias("parent"),
        ),
    )
    # Children PRE-GROUPED by parent into a map<super_id, children> —
    # built once inside the 1-row ctx (O(supers·cells) there), so the
    # per-ROW refine touches ONLY its super's ~cells/supers children. A
    # per-row `filter(cs, parent == __super)` instead walks ALL cells per
    # row, silently re-introducing the O(cells) term the hierarchy exists
    # to remove (measured: 64x→256x step efficiency stuck at ~0.69 with
    # the per-row filter vs the single-level ladder's 0.88; the map form
    # drops per-row work to supers + cells/supers element visits).
    super_ids = F.sequence(F.lit(0), F.lit(n_super - 1))
    cmap = F.map_from_arrays(
        super_ids,
        F.transform(
            super_ids,
            lambda p: F.filter(children, lambda c: c["parent"] == p),
        ),
    )
    seeds_ctx = base.select(
        cmap.alias("cmap"), supers.alias("supers")
    )
    assigned = (
        df.withColumn("__qv", _sem_quant(F.col(vec_col)))
        .withColumn("__nrm", _sem_qnorm6(F.col("__qv")))
        .crossJoin(F.broadcast(seeds_ctx))
        .withColumn(
            "__super",
            _sem_argmax_cell(
                F.col("__qv"), F.col("__nrm"), F.col("supers")
            ),
        )
        .select(
            F.col(id_col),
            F.col("__qv"),
            "__nrm",
            _sem_argmax_cell(
                F.col("__qv"),
                F.col("__nrm"),
                F.element_at(F.col("cmap"), F.col("__super")),
            ).alias("cell_id"),
        )
    )
    return _sem_cell_dominance(
        assigned, threshold, id_col, tier=dominance_tier
    )


def semantic_dedup_gemm(
    df: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds_from: DataFrame | None = None,
    n_blocks: int | None = None,
    checkpoint: bool = False,
    two_level: bool = False,
    n_super: int | None = None,
    dominance_tier: str = "gemm",
) -> DataFrame:
    """:func:`semantic_dedup` with the cell ASSIGNMENT as a blocked int64
    GEMM (the :func:`brute_cosine_pairs_blocked` layout) instead of
    per-row nested-HOF argmax.

    Why this exists — measured, round 8: nested higher-order functions
    (a lambda inside ``array_sort(transform(...))``) are NOT whole-stage
    codegen'd; the per-row interpreted argmax costs ~1 ms/row at 512
    cells (150 s for 128k rows on local[32] — forced-methodology, fresh
    plan). Hierarchical routing (:func:`semantic_dedup_two_level`) cuts
    the per-row FLOP count to O(√cells) but keeps the interpreter; this
    tier removes the interpreter: rows ship as Arrow blocks and numpy
    does exact int64 ``Q @ Sᵀ`` against the seed matrix — the same
    assignment arithmetic at BLAS-adjacent speed, O(n·cells) flops that
    cost less wall than the hierarchy's O(n·√cells) interpreted ones.

    Determinism contract (its OWN rule, mirrored exactly by the DuckDB
    oracle — a separate query surface, like h2):

    - elements quantize once in-plan via ``_sem_quant`` (JVM
      ``F.round`` semantics, with the |x| ≤ 37 overflow guard), and
      ``__nrm`` is the in-plan ``_sem_qnorm6``; numpy receives ONLY
      exact int64 arrays and pre-rounded norms through Arrow — it never
      rounds anything;
    - assignment = argmax over cells of the UNROUNDED double cosine
      ``(Q·sᵀ as double) / ((nrm · snorm) · 1e14)``, ties to the
      smaller cell id. int64→double conversion and IEEE division are
      correctly rounded and parenthesization is pinned, so numpy, the
      JVM and DuckDB produce bit-identical doubles. (The flat/h2 tiers
      round the assignment cosine to 1e-6 first; rounding exists there
      to protect an in-plan BigDecimal boundary, which this kernel does
      not have — dropping it removes the one per-cell rounding step
      from the hot loop.)
    - the within-cell dominance tail is the shared
      :func:`_sem_cell_dominance` (round-6 ≥ threshold), unchanged.

    ``checkpoint=True`` materializes the assignment once
    (``localCheckpoint``) before the dominance tail — load-bearing for
    ``dominance_tier="hof"``, whose join tail consumes the assignment
    three times (a/b sides + the keep-mark join); the default gemm
    dominance consumes it ONCE, so the checkpoint is then just an
    optional lineage cut. Engine default stays lazy; large-scale
    harnesses opt in.

    ``two_level=True`` (with ``n_super``) composes the hierarchy INTO
    the kernel — the answer to the measured 256× knee (BASELINE_HISTORY.md
    round-8: flat GEMM step efficiency 2.42 at 512k vectors / 2048
    cells, the O(n·cells) flop law with the interpreter gone): child
    seeds parent to their argmax super, each row routes through its
    argmax super and then argmaxes only among that super's children —
    O(n·(supers + cells/supers)·dim) flops at kernel speed, the
    coarse-quantizer + SIMD layout of every billion-scale ANN system.
    Same unrounded-cosine/smaller-id rule at every level (the
    :func:`semantic_dedup_two_level` structure with this tier's
    arithmetic), mirrored by the ``dedup_semantic_gemm_h2`` oracle.
    Routing changes which cell near-boundary rows land in (hierarchical
    coarse quantization is an approximation — the h2 docstring's
    point), so it is again a separate query surface."""
    if two_level and not n_super:
        raise ValueError("two_level=True requires n_super")

    id_type = dict(df.dtypes)[id_col]
    seeds_row = (
        (seeds_from if seeds_from is not None else df)
        .filter(F.col(id_col) < n_cells)
        .select(
            F.col(id_col).cast("int").alias("cell_id"),
            _sem_quant(F.col(vec_col)).alias("sq"),
        )
        .select("cell_id", "sq", _sem_qnorm6(F.col("sq")).alias("snorm"))
        .agg(
            F.collect_list(F.struct("cell_id", "sq", "snorm")).alias("seeds")
        )
    )
    q = df.select(
        F.col(id_col), _sem_quant(F.col(vec_col)).alias("__qv")
    ).withColumn("__nrm", _sem_qnorm6(F.col("__qv")))
    # family default (round 11): block count derived from the projected
    # plan's BYTES (128 MB per collected block), floored by parallelism;
    # blocking never affects values, only Arrow batch granularity
    n_blocks = kernel_block_count(q, n_blocks)
    blocks = (
        q.withColumn(
            "__blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
        )
        .groupBy("__blk")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), "__qv", "__nrm")
            ).alias("ablock")
        )
    )
    ctx = blocks.crossJoin(F.broadcast(seeds_row))

    # round 16 (guide §4.2, VERDICT r15 #3): raw Arrow batches — the
    # pandas form materialized per-row struct objects (and re-built the
    # quantized __qv list per row on the way OUT); here __qv/__nrm pass
    # through as untouched child arrays and only cell_id is built. Same
    # unrounded-cosine/smaller-id argmax at every level.
    def assign_batches(batches):
        import numpy as np
        import pyarrow as pa

        from .linalg import (
            arrow_list_to_2d,
            block_layout,
            context_entries,
        )

        def _ucos(Qm, nq, Sm, ns):
            # exact int64 GEMM (bounded by the in-plan |x|<=37 guard),
            # then the pinned (nrm*snorm)*1e14 denominator
            den = np.outer(nq, ns) * 1e14
            if den.size and not den.all():
                # ANSI mirror (ADVICE r10): zero-norm input would make
                # numpy emit NaN silently where the in-plan tiers raise
                # DIVIDE_BY_ZERO — raise instead of diverging
                raise ValueError(
                    "semantic_dedup_gemm: zero cosine denominator "
                    "(zero-norm vector or seed)"
                )
            return (Qm @ Sm.T).astype(np.float64) / den

        for rb in batches:
            if not rb.num_rows:
                continue
            entries, offs = block_layout(rb.column("ablock"))
            seeds = context_entries(rb.column("seeds"))
            order = np.argsort(
                seeds.field("cell_id").to_numpy(), kind="stable"
            )
            cells = (
                seeds.field("cell_id").to_numpy()[order].astype(np.int32)
            )
            S = arrow_list_to_2d(seeds.field("sq"), np.int64)[order]
            sn = seeds.field("snorm").to_numpy()[order]
            Qall = arrow_list_to_2d(entries.field("__qv"), np.int64)
            na_all = entries.field("__nrm").to_numpy()
            base_o = int(offs[0])
            total = int(offs[-1]) - base_o
            pick_all = np.empty(total, dtype=np.int32)
            if two_level:
                msk = cells < n_super
                supids = cells[msk]
                Ssup, snsup = S[msk], sn[msk]
                # child -> super parenting (identical rule)
                parent = supids[
                    np.argmax(_ucos(S, sn, Ssup, snsup), axis=1)
                ]
            for bi in range(len(offs) - 1):
                lo_g, hi_g = int(offs[bi]), int(offs[bi + 1])
                Q = Qall[lo_g:hi_g]
                na = na_all[lo_g:hi_g]
                # argmax with ties to the smaller cell id everywhere:
                # seeds sorted by cell_id and np.argmax returns the
                # FIRST maximum
                if not two_level:
                    pick = cells[np.argmax(_ucos(Q, na, S, sn), axis=1)]
                else:
                    rsup = supids[
                        np.argmax(_ucos(Q, na, Ssup, snsup), axis=1)
                    ]
                    pick = np.empty(hi_g - lo_g, dtype=np.int32)
                    for s in supids:
                        rows = np.nonzero(rsup == s)[0]
                        if rows.size == 0:
                            continue
                        ch = np.nonzero(parent == s)[0]
                        pick[rows] = cells[ch][
                            np.argmax(
                                _ucos(Q[rows], na[rows], S[ch], sn[ch]),
                                axis=1,
                            )
                        ]
                pick_all[lo_g - base_o : hi_g - base_o] = pick
            out_rows = entries.slice(base_o, total)
            yield pa.RecordBatch.from_arrays(
                [
                    out_rows.field("id"),
                    out_rows.field("__qv"),
                    out_rows.field("__nrm"),
                    pa.array(pick_all),
                ],
                ["id", "__qv", "__nrm", "cell_id"],
            )

    assigned = ctx.mapInArrow(
        assign_batches,
        f"id {id_type}, __qv array<long>, __nrm double, cell_id int",
    ).withColumnRenamed("id", id_col)
    if checkpoint:
        assigned = assigned.localCheckpoint(eager=True)
    return _sem_cell_dominance(
        assigned, threshold, id_col, tier=dominance_tier
    )


def ivfpq_residual_topk(
    df: DataFrame,
    probe_id: int = 1,
    n_cells: int = 8,
    n_probe: int = 2,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 10,
    rerank: int = 50,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    train_codebook: bool = False,
    assign: str = "gemm",
    n_blocks: int | None = None,
) -> DataFrame:
    """Paper-faithful IVFADC (Jégou, Douze & Schmid TPAMI'11 §V): codes
    quantize the RESIDUAL v − c(v) against the vector's coarse cell — the
    refinement :func:`ivfpq_topk` documents as its simplification.
    Residuals concentrate near the origin, so the same per-subspace
    codebook budget quantizes them far more precisely than raw vectors.

    Inner-product ADC with residuals decomposes exactly:
    ``dot(q, v) = dot(q, c) + dot(q, r_v)`` — so serving needs one
    cell-independent table ``ptab[s][j] = dot(q_s, codebook[j]_s)`` plus a
    per-cell constant ``dot(q, c)``; no query-residual recomputation per
    probed cell (that is an L2-metric artifact — for dot/cosine the
    decomposition is linear).

    The residual codebook is seeded deterministically from the residuals
    of the vectors with ``id < n_centroids`` (after their own cell
    assignment), all arithmetic on the int64 PQ_GRID → the full
    composition (assignment, residuals, codes, ADC, rerank) is hash-exact
    cross-engine. Encoding runs inline in the scan (the precomputed-codes
    serving story is :func:`ivfpq_topk`'s; the codes are identical).

    Plan: 1-row broadcast ctx (cells + residual codebook + probe tables)
    → narrow per-row assign/encode/ADC map over n_probe/n_cells of the
    data → top-``rerank`` → broadcast-join exact rerank → top-``k``.

    ``assign="gemm"`` (default) moves the corpus coarse-cell assignment
    to :func:`gemm_assign_cells` (grid flavor, seed norms hoisted into
    the context, values bit-identical — oracle unchanged); ``"hof"``
    keeps the in-plan argmax. Residual encode/ADC only run on the routed
    n_probe/n_cells fraction either way. The optional ``train_codebook``
    Lloyd pass still assigns in-plan (training is not in the serving
    query's oracle surface).
    """
    sub = dim // m
    cells_row = df.filter(F.col(id_col) < n_cells).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("int").alias("cell_id"),
                    F.col(vec_col).alias("semb"),
                )
            )
        ).alias("cells")
    )

    def _cell_ranked(vec: Column, vnorm6: Column) -> Column:
        return F.array_sort(
            F.transform(
                F.col("cells"),
                lambda c: F.struct(
                    (
                        -F.round(
                            (_grid_dot(vec, c["semb"]) / float(PQ_GRID))
                            / (vnorm6 * _grid_norm6(c["semb"])),
                            6,
                        )
                    ).alias("negcos"),
                    c["cell_id"].alias("cell_id"),
                ),
            )
        )

    def _residual(vec: Column, cell_id: Column) -> Column:
        cvec = F.element_at(
            F.filter(F.col("cells"), lambda c: c["cell_id"] == cell_id), 1
        )["semb"]
        return F.zip_with(
            vec, cvec, lambda x, y: x.cast("double") - y.cast("double")
        )

    # residual codebook: residuals of the first n_centroids vectors,
    # id-sorted and contiguity-asserted (positional ptab lookup below)
    rcb_row = (
        df.filter(F.col(id_col) < n_centroids)
        .crossJoin(F.broadcast(cells_row))
        .select(
            F.col(id_col).cast("int").alias("cid"),
            _residual(
                F.col(vec_col),
                F.element_at(
                    _cell_ranked(F.col(vec_col), _grid_norm6(F.col(vec_col))), 1
                )["cell_id"],
            ).alias("rv"),
        )
        .agg(F.array_sort(F.collect_list(F.struct("cid", "rv"))).alias("rcb"))
        .select(
            _assert_contiguous_ids(
                F.col("rcb"), "cid", n_centroids, "ivfpq_residual ADC table"
            ).alias("rcb")
        )
    )
    if train_codebook:
        # One relational Lloyd pass ON THE RESIDUALS (Jégou §V trains the
        # product codebook on residual distributions, not raw vectors —
        # the round-7 clustered-recall measurement showed the seeded
        # residual codebook LOSES to raw codes without this):
        # 1. assign every vector's residual to its nearest seeded entry
        #    per subspace; 2. refine entry (s, cid) to the element-wise
        #    mean of its assigned sub-residuals (int64 grid sums, round
        #    1e-9 — deterministic); 3. reassemble full-dim codewords,
        #    seeded element as fallback where an (s, cid) cluster is
        #    empty. Two hash aggregates, same pattern as pq_kmeans_topk.
        sub_l = sub

        allr = (
            df.crossJoin(F.broadcast(cells_row.crossJoin(rcb_row)))
            .withColumn(
                "rv",
                _residual(
                    F.col(vec_col),
                    F.element_at(
                        _cell_ranked(
                            F.col(vec_col), _grid_norm6(F.col(vec_col))
                        ),
                        1,
                    )["cell_id"],
                ),
            )
            .withColumn(
                "codes0",
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.element_at(
                        F.array_sort(
                            F.transform(
                                F.col("rcb"),
                                lambda r: F.struct(
                                    _grid_sum(
                                        F.slice(F.col("rv"), s * sub_l + 1, sub_l),
                                        F.slice(r["rv"], s * sub_l + 1, sub_l),
                                        lambda x, y: (x - y) * (x - y),
                                    ).alias("d2g"),
                                    r["cid"].alias("cid"),
                                ),
                            )
                        ),
                        1,
                    )["cid"],
                ),
            )
            .select(id_col, "rv", "codes0")
        )
        rel = allr.select(
            F.posexplode("rv").alias("pos", "x"),
            F.col("codes0"),
        ).select(
            (F.col("pos") / sub_l).cast("int").alias("s"),
            "pos",
            "x",
            F.get(F.col("codes0"), (F.col("pos") / sub_l).cast("int")).alias(
                "cid"
            ),
        )
        refined = rel.groupBy("s", "cid", "pos").agg(
            F.round(
                F.sum(F.round(F.col("x") * PQ_GRID).cast("long"))
                / (F.count(F.lit(1)) * float(PQ_GRID)),
                9,
            ).alias("cx")
        )
        # (cid, pos) grid from the seeded codebook, refined mean where the
        # cluster is non-empty, seeded element as the deterministic
        # fallback for empty (s, cid) cells
        seeded_el = rcb_row.select(
            F.explode("rcb").alias("r")
        ).select(
            F.col("r.cid").alias("cid"),
            F.posexplode("r.rv").alias("pos", "x0"),
        ).withColumn("s", (F.col("pos") / sub_l).cast("int"))
        trained = (
            seeded_el.join(refined, ["s", "cid", "pos"], "left")
            .select(
                "cid",
                "pos",
                F.coalesce(F.col("cx"), F.col("x0")).alias("cx"),
            )
        )
        rcb_row = (
            trained.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                    lambda p: p["cx"],
                ).alias("rv")
            )
            .agg(
                F.array_sort(F.collect_list(F.struct("cid", "rv"))).alias(
                    "rcb"
                )
            )
            .select(
                _assert_contiguous_ids(
                    F.col("rcb"),
                    "cid",
                    n_centroids,
                    "ivfpq_residual trained ADC table",
                ).alias("rcb")
            )
        )
    probe_row = df.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("q"), _grid_norm6(F.col(vec_col)).alias("qnorm")
    ).limit(1)
    ctx = (
        probe_row.crossJoin(cells_row)
        .crossJoin(rcb_row)
        .withColumn(
            "probe_cells",
            F.slice(
                F.transform(
                    _cell_ranked(F.col("q"), F.col("qnorm")),
                    lambda s: s["cell_id"],
                ),
                1,
                n_probe,
            ),
        )
        .withColumn(
            "dqc",
            F.transform(
                F.col("cells"),
                lambda c: F.struct(
                    c["cell_id"].alias("cell_id"),
                    _grid_dot(F.col("q"), c["semb"]).alias("dg"),
                ),
            ),
        )
        .withColumn(
            "ptab",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.transform(
                    F.col("rcb"),
                    lambda r: _grid_dot(
                        F.slice(F.col("q"), s * sub + 1, sub),
                        F.slice(r["rv"], s * sub + 1, sub),
                    ),
                ),
            ),
        )
        .select("q", "qnorm", "cells", "rcb", "probe_cells", "dqc", "ptab")
    )

    def _code_at(rv: Column, s: Column) -> Column:
        subr = F.slice(rv, s * sub + 1, sub)
        ranked = F.array_sort(
            F.transform(
                F.col("rcb"),
                lambda r: F.struct(
                    _grid_sum(
                        subr,
                        F.slice(r["rv"], s * sub + 1, sub),
                        lambda x, y: (x - y) * (x - y),
                    ).alias("d2g"),
                    r["cid"].alias("cid"),
                ),
            )
        )
        return F.element_at(ranked, 1)["cid"]

    if assign == "gemm":
        seedsn_row = (
            df.filter(F.col(id_col) < n_cells)
            .select(
                F.col(id_col).cast("int").alias("cell_id"),
                F.col(vec_col).alias("semb"),
            )
            .withColumn("snorm", _grid_norm6(F.col("semb")))
            .agg(
                F.collect_list(
                    F.struct("cell_id", "semb", "snorm")
                ).alias("seeds")
            )
        )
        routed = (
            gemm_assign_cells(
                df.withColumn("vnorm", _grid_norm6(F.col(vec_col))),
                seedsn_row,
                id_col=id_col,
                vec_col=vec_col,
                nrm_col="vnorm",
                dot="grid",
                n_blocks=n_blocks,
            )
            .crossJoin(F.broadcast(ctx))
            .filter(
                F.array_contains(F.col("probe_cells"), F.col("cell_id"))
                & (F.col(id_col) != probe_id)
            )
            .withColumn("rv", _residual(F.col(vec_col), F.col("cell_id")))
        )
    else:
        routed = (
            df.withColumn("vnorm", _grid_norm6(F.col(vec_col)))
            .crossJoin(F.broadcast(ctx))
            .withColumn(
                "cell_id",
                F.element_at(
                    _cell_ranked(F.col(vec_col), F.col("vnorm")), 1
                )["cell_id"],
            )
            .filter(
                F.array_contains(F.col("probe_cells"), F.col("cell_id"))
                & (F.col(id_col) != probe_id)
            )
            .withColumn("rv", _residual(F.col(vec_col), F.col("cell_id")))
        )
    scored = routed.withColumn(
        "adc_dot_grid",
        F.element_at(
            F.filter(F.col("dqc"), lambda d: d["cell_id"] == F.col("cell_id")),
            1,
        )["dg"]
        + F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.get(F.get(F.col("ptab"), s), _code_at(F.col("rv"), s)),
        ),
    ).withColumn(
        "adc_cosine",
        F.round(
            (F.col("adc_dot_grid") / float(PQ_GRID))
            / (F.col("vnorm") * F.col("qnorm")),
            6,
        ),
    )
    cands = scored.select(
        id_col, "adc_cosine", "q", "qnorm", "vnorm"
    ).orderBy(F.desc("adc_cosine"), F.asc(id_col)).limit(rerank)
    reranked = df.select(id_col, *keep_cols, vec_col).join(
        F.broadcast(cands), id_col
    )
    return (
        reranked.withColumn(
            "cosine",
            F.round(
                (_grid_dot(F.col(vec_col), F.col("q")) / float(PQ_GRID))
                / (F.col("vnorm") * F.col("qnorm")),
                6,
            ),
        )
        .select(id_col, *keep_cols, "adc_cosine", "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_multiprobe_topk(
    df: DataFrame,
    probe_id: int = 1,
    n_planes: int = 8,
    seed: int = 42,
    k: int = 10,
    max_flips: int = 2,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("label",),
    sig_tier: str = "gemm",
) -> DataFrame:
    """Multi-probe LSH top-k (Lv, Josephson, Wang, Charikar & Li,
    "Multi-probe LSH: efficient indexing for high-dimensional similarity
    search", VLDB 2007 — public paper): instead of many hash tables, ONE
    hyperplane signature table probed at the query's bucket AND every
    bucket within ``max_flips`` bit perturbations (1 + C(n,1) + C(n,2)
    probes at the default T=2) — the standard way to buy recall without
    replicating the index. n_planes trades bucket selectivity against
    probe count: 8 planes / 37 probes scans ~14% of an isotropic corpus;
    more planes shrink buckets and the probed fraction.

    Signatures are grid-exact sign bits packed into an int (bit p =
    [Σ round(x·h_p·1e9) ≥ 0]), so the probed bucket SET is reproducible
    cross-engine and the query carries a full hash oracle. Candidates pay
    one exact grid cosine each; ranking is exact over the candidate set.

    Plan: narrow signature map over the scan (n_planes grid dots/row, no
    shuffle), 1-row broadcast probe-set ctx, bucket membership filter,
    exact cosine on the surviving fraction, TakeOrderedAndProject.

    ``sig_tier="gemm"`` (default): the signature map runs via
    :func:`gemm_lsh_bits` (still shuffle-free — planes are literals) and
    the packed int is assembled in-plan from the bits array (O(planes)
    per row); ``"hof"`` keeps the fully in-plan form. Signatures are
    bit-identical either way — oracle unchanged.
    """
    planes = lsh_planes(n_planes, dim, seed)
    if sig_tier == "gemm":
        packed = None
        for i in range(n_planes):
            term = (F.get(F.col("bits"), i) * F.lit(1 << i)).cast("long")
            packed = term if packed is None else packed + term
        sigs = gemm_lsh_bits(
            df, planes, id_col=id_col, vec_col=vec_col,
            extra_cols=tuple(keep_cols),
        ).select(
            F.col(id_col), *keep_cols, F.col(vec_col), packed.alias("sig")
        )
    else:
        sig = None
        for i, p in enumerate(planes):
            bit = (
                F.when(
                    _grid_dot(
                        F.col(vec_col), F.array(*[F.lit(x) for x in p])
                    )
                    >= 0,
                    F.lit(1 << i).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
            )
            sig = bit if sig is None else sig + bit
        sigs = df.select(
            F.col(id_col), *keep_cols, F.col(vec_col), sig.alias("sig")
        )
    probe_row = (
        sigs.filter(F.col(id_col) == probe_id)
        .select(
            F.col(vec_col).alias("q"),
            _grid_norm6(F.col(vec_col)).alias("qnorm"),
            F.col("sig").alias("qsig"),
        )
        .limit(1)
    )
    from itertools import combinations

    masks = [
        sum(1 << i for i in c)
        for t in range(max_flips + 1)
        for c in combinations(range(n_planes), t)
    ]
    ctx = probe_row.select(
        "q",
        "qnorm",
        F.array(
            *[
                F.col("qsig").bitwiseXOR(F.lit(m).cast("long"))
                for m in masks
            ]
        ).alias("probe_sigs"),
    )
    cand = (
        sigs.crossJoin(F.broadcast(ctx))
        .filter(
            F.array_contains(F.col("probe_sigs"), F.col("sig"))
            & (F.col(id_col) != probe_id)
        )
    )
    cosine = F.round(
        (_grid_dot(F.col(vec_col), F.col("q")) / float(PQ_GRID))
        / (_grid_norm6(F.col(vec_col)) * F.col("qnorm")),
        6,
    )
    return (
        cand.select(id_col, *keep_cols, cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def recommend_ann_tier(
    n: int,
    dim: int,
    clusters_hint: int | None = None,
    *,
    n_cells: int | None = None,
    bytes_per_vector_budget: float | None = None,
    exact_scan_ceiling: int = 100_000,
) -> dict:
    """Serving-tier recommendation pinned to RECALL.md's MEASURED recall
    tables (rounds 5-7, tools/ann_recall.py) — an assertable helper so
    the guidance cannot drift from the evidence (VERDICT r7 item 8). The
    unit test (tests/test_operators.py::test_recommend_ann_tier_*)
    asserts each branch against the table rows that justify it.

    Decision rule, with the measured row behind each branch:

    - ``n ≤ exact_scan_ceiling`` → ``cosine_topk`` (exact brute force):
      recall 1.0 by definition, and at local scales the O(n·dim) scan is
      cheaper than building any index.
    - clustered corpus (``clusters_hint ≥ 2``):
      - raw vectors fit the I/O budget → ``ivf_kmeans_topk`` — measured
        0.92 mean recall@10 on mog16, the best of every tier (RECALL.md
        §clustered; Lloyd centroids capture exactly the cluster
        structure);
      - vectors do NOT fit (``bytes_per_vector_budget`` < 8·dim raw
        float64) → ``ivfpq_topk`` with RAW codes — measured 0.68-0.80,
        beating residual coding (0.22-0.60) at every practical coarse
        budget (RECALL.md: residuals have HIGHER variance than raw
        points when the coarse quantizer under-resolves the clusters).
    - isotropic / unknown (``clusters_hint`` None or < 2) at scale →
      ``ivf_topk`` with ``n_probe`` as the recall/cost knob (measured
      0.60/0.70/0.80 at probe 1/2/4, sf0.1 — the representative
      scale; the old sf0.01 0.85 row was corrected round 10; raising
      n_probe adds no
      shuffle). Hyperplane-bucket tiers are NEVER recommended here:
      ``lsh_multiprobe_topk`` measured 0.30 isotropic — neighbors spread
      across buckets when there are no planted clusters.

    ``residual_ok`` gates ``ivfpq_residual_topk`` separately: True only
    when the coarse quantizer OVER-resolves the cluster structure
    (``n_cells ≥ 2 × clusters_hint``) — below that the residual premise
    is measurably inverted (0.45 vs raw 0.68 at 8 cells / 16 clusters) —
    and even then only with ``train_codebook=True`` (the offline ceiling
    crosses over only with a converged codebook: raw 0.78 vs residual
    0.83 at 32 cells).
    """
    residual_ok = bool(
        clusters_hint
        and n_cells is not None
        and n_cells >= 2 * clusters_hint
    )
    rec = {
        "residual_ok": residual_ok,
        "residual_requires": {"train_codebook": True},
    }
    if n <= exact_scan_ceiling:
        rec.update(tier="cosine_topk", why="exact scan cheaper than index")
        return rec
    if clusters_hint and clusters_hint >= 2:
        raw_bytes = 8.0 * dim
        if (
            bytes_per_vector_budget is not None
            and bytes_per_vector_budget < raw_bytes
        ):
            rec.update(
                tier="ivfpq_topk",
                why="clustered, vectors exceed I/O budget: raw PQ codes "
                "beat residual at practical coarse budgets "
                "(RECALL.md 0.68-0.80 vs 0.22-0.60)",
            )
            return rec
        rec.update(
            tier="ivf_kmeans_topk",
            why="clustered, vectors fit I/O budget: measured best tier "
            "(RECALL.md mog16 mean recall@10 = 0.92)",
        )
        return rec
    rec.update(
        tier="ivf_topk",
        why="isotropic/unknown: n_probe is the recall/cost knob "
        "(RECALL.md 0.60/0.70/0.80 at probe 1/2/4, sf0.1); LSH buckets "
        "measured 0.30 here",
        params={"n_probe": 4},
    )
    return rec


def recommend_semantic_dedup_tier(
    n: int,
    n_cells: int,
    *,
    hierarchical_hint: bool = False,
    interpreted_row_cost_s: float = 1e-3,
) -> dict:
    """Assignment-tier recommendation for SemDeDup, pinned to the
    round-8 MEASURED ladders (BASELINE_HISTORY.md §"SemDeDup assignment" and
    §"when hierarchical coarse assignment helps") the same way
    :func:`recommend_ann_tier` is pinned to RECALL.md — the unit test
    asserts each branch against the table rows that justify it.

    Decision rule, with the measured row behind each branch:

    - in-plan HOF argmax (``semantic_dedup`` / ``semantic_dedup_two_
      level``) ONLY while the interpreted assignment is negligible:
      nested HOFs are not codegen'd and cost ~1 ms/row at 512 cells
      (measured 150 s for 128k rows assignment-only). Estimated
      assignment wall ``n · cells/512 · 1ms`` must stay under ~10 s.
    - otherwise ``semantic_dedup_gemm`` (flat): the Arrow int64 kernel
      removed the interpreter (64×: 21.7 s full vs 287 s in-plan-h2 /
      >40 min flat ladder leg); step efficiency stays ≤ 1 through 64×
      with cells ∝ n.
    - ``two_level=True`` ONLY with ``hierarchical_hint`` (supers are
      real cluster centroids and children sub-centroids): measured
      256× step efficiency 0.75 vs flat's 1.82 on 2-level data, but
      occupancy COLLAPSE on flat data (max 7,169/128k vs 580 — the
      stage-1 winner also wins stage 2) and on 1-level clusters (the
      center beats every member under cosine argmax; max 2,996,
      median 2). Without the hint, hierarchy is strictly worse.
    - the flat-GEMM flop law (O(n·cells), step efficiency 2.42 at 512k
      rows × 2048 cells) binds roughly beyond ~100k rows at cells ∝ n —
      at that point either supply real hierarchy or grow cells
      sub-linearly (the returned ``cells_advice``).
    """
    interpreted_s = n * (n_cells / 512.0) * interpreted_row_cost_s
    rec = {"threshold_note": "dominance tail identical across tiers"}
    if interpreted_s <= 10.0:
        rec.update(
            tier="semantic_dedup",
            why="interpreted assignment negligible at this scale "
            f"(~{interpreted_s:.1f}s est; measured 1ms/row at 512 cells)",
        )
        return rec
    if hierarchical_hint:
        rec.update(
            tier="semantic_dedup_gemm",
            params={"two_level": True, "checkpoint": True},
            why="2-level structure: measured 256x step efficiency 0.75 "
            "vs flat 1.82 (BASELINE_HISTORY.md semdedupcluster ladder)",
        )
        return rec
    rec.update(
        tier="semantic_dedup_gemm",
        params={"two_level": False, "checkpoint": True},
        why="kernel removes the ~1ms/row interpreter (measured 150s -> "
        "in-kernel at 64x); hierarchy without real 2-level structure "
        "collapses occupancy (measured max 7,169/128k vs 580)",
        cells_advice="grow cells sub-linearly (~sqrt(n)) past ~100k rows "
        "or supply hierarchical_hint: flat GEMM flops are O(n*cells) "
        "(measured step efficiency 2.42 at 512k x 2048)",
    )
    return rec
