"""Mergeable cardinality/frequency sketches on exact integer arithmetic
(SURVEY.md §2.5 A3 "approx distinct" extended to first-class sketch
surfaces — the structures a 100 TB profile pass actually ships between
executors instead of exact distinct sets).

Spark's built-ins (``approx_count_distinct``/HLL++, count-min via
``stat.freqItems``) are JVM-internal and not reproducible in DuckDB, so
these queries build the classic sketches *relationally* from the same
60-bit md5 hash both engines compute byte-identically:

- **HyperLogLog** (Flajolet et al. 2007): m=64 registers keyed by the
  hash's top 6 bits; the register is the leading-zero rank of the low
  54 bits. The harmonic mean is folded on a dyadic integer grid —
  ``sum(1 << (CAP - reg))`` with the register capped at CAP=20 — so the
  estimate is a pure int64 division, no float pow/log anywhere. The
  registers are max-mergeable; tests/test_sketches.py asserts the
  half-corpus merge law max(regs_A, regs_B) == regs_{A∪B}.
- **Count-Min** (Cormode & Muthukrishnan 2005): depth 3 × width
  ``_CMS_W`` (16 on the fixture — sized DOWN so collisions occur; see
  the constant's comment) conditional-sum rows; the point estimate is
  the min over rows, always ≥ the true count (one-sided error, asserted
  per row in the output).

Scale: both sketches aggregate map-side to O(m·depth) rows per task —
the shuffle carries registers, never tokens. That is the entire point
at 100 TB: profile passes become bandwidth-free.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .governance import _MD5_INT60_SQL, _md5_int60
from .registry import query

# --------------------------------------------------------------------------
# agg_hll_sketch — integer-grid HyperLogLog vs exact distinct, per lang.
# --------------------------------------------------------------------------
_HLL_M = 64  # registers (top 6 hash bits)
_HLL_LOW = 54  # low bits feeding the leading-zero rank (rho ∈ 1..55)
_HLL_CAP = 20  # register cap: keeps the dyadic fold inside int64
# alpha_64 * m^2 on a rational grid: 0.7213/(1+1.079/64) = 0.709365…;
# A = floor(alpha_num * m^2 * 2^CAP / alpha_den) precomputed exactly.
_HLL_A = (70937 * _HLL_M * _HLL_M * (1 << _HLL_CAP)) // 100000
# Small-range (linear counting) correction: when est_raw <= 2.5*m and
# V = #empty registers > 0, the estimate is m*ln(m/V). ln is NOT
# cross-engine ulp-safe, so the 64 possible values are precomputed here
# as integer literals embedded identically in the Spark expression and
# the DuckDB SQL (V is 1-indexed into this table).
_HLL_LC = [round(_HLL_M * math.log(_HLL_M / v)) for v in range(1, _HLL_M + 1)]
_HLL_SMALL = (5 * _HLL_M) // 2  # 2.5 * m on the integer grid



def hll_sql(src: str, key: str, item_sql: str, exact_sql: str | None = None) -> str:
    """DuckDB oracle for the relational HLL over ``src`` grouped by ``key``,
    hashing ``item_sql``. With ``exact_sql`` (an exact-distinct aggregate
    over the same source) the output carries the n_exact/err_bp columns of
    agg_hll_sketch; without it, just (key, hll_est) — the streaming-twin
    shape. Token-for-token the same register/fold/linear-counting algebra
    as the Spark builders below."""
    lc = ", ".join(str(x) for x in _HLL_LC)
    # Composite keys ("lang, source") are fine for the estimate-only
    # shape, but the exact_sql join below is built per key COLUMN —
    # naive substitution would emit `ON e.lang, source = f.lang, source`
    # (invalid SQL — ADVICE r9 latent). Split and qualify each part.
    keys = [k.strip() for k in key.split(",")]
    exact_cte = (
        f", exact AS (SELECT {key}, {exact_sql} AS n_exact FROM {src} GROUP BY {key})"
        if exact_sql
        else ""
    )
    sel_keys = ", ".join(f"e.{k}" for k in keys)
    join_cond = " AND ".join(f"e.{k} = f.{k}" for k in keys)
    select = (
        f"""SELECT {sel_keys}, n_exact, CAST(hll_est AS BIGINT) AS hll_est,
           CAST(abs(hll_est - n_exact) * 10000 // n_exact AS BIGINT) AS err_bp
           FROM exact e JOIN est f ON {join_cond}"""
        if exact_sql
        else f"SELECT {key}, CAST(hll_est AS BIGINT) AS hll_est FROM est"
    )
    return f"""
    WITH hashed AS (
      SELECT {key}, {_MD5_INT60_SQL.format(x=item_sql)} AS h FROM {src}
    ),
    regs AS (
      SELECT {key}, h >> {_HLL_LOW} AS j,
             MAX(least(CASE WHEN h % {1 << _HLL_LOW} = 0 THEN {_HLL_LOW + 1}
                            ELSE {_HLL_LOW + 1} - length(bin(h % {1 << _HLL_LOW}))
                       END, {_HLL_CAP})) AS reg
      FROM hashed GROUP BY {key}, h >> {_HLL_LOW}
    ),
    folded AS (
      SELECT {key},
             SUM(CAST(1 AS BIGINT) << CAST({_HLL_CAP} - reg AS INTEGER))
               + ({_HLL_M} - COUNT(*)) * {1 << _HLL_CAP} AS s,
             {_HLL_M} - COUNT(*) AS v
      FROM regs GROUP BY {key}
    ),
    est AS (
      SELECT {key},
             CASE WHEN {_HLL_A} // s <= {_HLL_SMALL} AND v > 0
                  THEN [{lc}][CAST(v AS INTEGER)]
                  ELSE {_HLL_A} // s END AS hll_est
      FROM folded
    ){exact_cte}
    {select}
"""


def hll_registers(df: DataFrame, key_cols: list[str], item_col: str) -> DataFrame:
    """(key…, j, reg) HyperLogLog register table — max-mergeable: unioning
    two register tables and re-maxing equals sketching the unioned input
    (asserted in tests/test_sketches.py)."""
    h = _md5_int60(F.col(item_col))
    w = h % (1 << _HLL_LOW)
    rho = F.when(w == 0, F.lit(_HLL_LOW + 1)).otherwise(
        F.lit(_HLL_LOW + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*key_cols, F.shiftright(h, _HLL_LOW).alias("j"),
                  F.least(rho, F.lit(_HLL_CAP)).alias("rho"))
        .groupBy(*key_cols, "j")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Fold a register table to (key…, hll_est) on the dyadic int grid,
    with the standard linear-counting small-range branch (integer-table
    lookup, see _HLL_LC)."""
    term = F.expr(f"shiftleft(cast(1 as bigint), cast({_HLL_CAP} - reg as int))")
    lc = ", ".join(str(x) for x in _HLL_LC)
    return (
        regs.groupBy(*key_cols)
        .agg(
            (
                F.sum(term)
                + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(1 << _HLL_CAP)
            ).alias("s"),
            (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v"),
        )
        .select(
            *key_cols,
            F.expr(
                f"case when {_HLL_A} div s <= {_HLL_SMALL} and v > 0"
                f" then element_at(array({lc}), cast(v as int))"
                f" else {_HLL_A} div s end"
            )
            .cast("long")
            .alias("hll_est"),
        )
    )


_HLL_ORACLE = hll_sql(
    "(SELECT lang, unnest(str_split(text, ' ')) AS token FROM documents)",
    "lang",
    "token",
    exact_sql="COUNT(DISTINCT token)",
)


@query("agg_hll_sketch", oracle=_HLL_ORACLE, tags=("A3", "A1", "X3"), bench=True)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    regs = hll_registers(toks, ["lang"], "token")
    est = hll_estimate(regs, ["lang"])
    exact = toks.groupBy("lang").agg(
        F.countDistinct("token").alias("n_exact")
    )
    return exact.join(est, "lang").select(
        "lang",
        "n_exact",
        "hll_est",
        F.expr("abs(hll_est - n_exact) * 10000 div n_exact").alias("err_bp"),
    )


# --------------------------------------------------------------------------
# text_cms_heavy_hitters — Count-Min point estimates for the exact top-20
# tokens. The sketch is depth×width conditional sums (3 × W rows,
# broadcastable whatever the corpus size); the estimate min-folds the
# depth rows and is provably ≥ the exact count (one-sided collisions).
# W=16 is sized DOWN to the fixture's ~31-token synthetic vocabulary so
# collisions (the sketch's entire error model) actually occur; production
# sizes W ≈ e/ε for additive error ε·N and the query shape is unchanged.
# --------------------------------------------------------------------------
_CMS_W = 16
_CMS_DEPTH = (0, 1, 2)
_CMS_TOPK = 20

_CMS_BUCKET_SQL = (
    "(" + _MD5_INT60_SQL.format(x="'cms' || CAST({d} AS VARCHAR) || ':' || token")
    + f" % {_CMS_W})"
)

_CMS_ORACLE = f"""
    WITH toks AS (
      SELECT unnest(str_split(text, ' ')) AS token FROM documents
    ),
    rows_ AS (
      SELECT d, {_CMS_BUCKET_SQL.format(d='d')} AS b, COUNT(*) AS c
      FROM toks, (SELECT unnest([0, 1, 2]) AS d)
      GROUP BY d, {_CMS_BUCKET_SQL.format(d='d')}
    ),
    top_ AS (
      SELECT token, COUNT(*) AS n_exact
      FROM toks GROUP BY token
      ORDER BY n_exact DESC, token ASC LIMIT {_CMS_TOPK}
    ),
    probe AS (
      SELECT token, n_exact, d, {_CMS_BUCKET_SQL.format(d='d')} AS b
      FROM top_, (SELECT unnest([0, 1, 2]) AS d)
    )
    SELECT p.token, p.n_exact, MIN(r.c) AS cm_est,
           CAST((MIN(r.c) - p.n_exact) * 10000 // p.n_exact AS BIGINT)
             AS overest_bp
    FROM probe p JOIN rows_ r ON p.d = r.d AND p.b = r.b
    GROUP BY p.token, p.n_exact
"""


def _cms_bucket(token: F.Column, d: int) -> F.Column:
    return _md5_int60(F.concat(F.lit(f"cms{d}:"), token)) % _CMS_W


@query("text_cms_heavy_hitters", oracle=_CMS_ORACLE, tags=("A3", "A1", "O2", "J1"))
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    # depth×width sketch rows: the explode is a constant ×3 map; the
    # aggregate map-side-combines to ≤ depth·_CMS_W rows per task
    # (3·16 on the fixture; production widths keep the same bound).
    cms = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _cms_bucket(F.col("token"), d).alias("b"),
                        )
                        for d in _CMS_DEPTH
                    ]
                )
            ).alias("e")
        )
        .groupBy("e.d", "e.b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("token").asc())
        .limit(_CMS_TOPK)
    )
    probe = top.select(
        "token",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col("token"), d).alias("b"),
                    )
                    for d in _CMS_DEPTH
                ]
            )
        ).alias("e"),
    ).select("token", "n_exact", "e.d", "e.b")
    return (
        probe.join(F.broadcast(cms), ["d", "b"])
        .groupBy("token", "n_exact")
        .agg(F.min("c").alias("cm_est"))
        .select(
            "token",
            "n_exact",
            "cm_est",
            F.expr("(cm_est - n_exact) * 10000 div n_exact").alias("overest_bp"),
        )
    )


# --------------------------------------------------------------------------
# agg_hll_set_ops — sketch SET ALGEBRA: intersection cardinality per
# event-type pair by inclusion-exclusion over max-merged registers,
# |A∩B| ≈ E(A) + E(B) − E(max-merge(regs_A, regs_B)). This is the whole
# reason mergeable sketches exist: the union estimate needs only the two
# 64-register tables, never the raw id sets. The error of the difference
# is the documented weakness of HLL intersections (it compounds the three
# estimates' errors) — the query reports it honestly against the exact
# intersection. Pair generation is a theta self-join of the 5-row
# event-type dimension (dimension-sized, like the J9 contract query);
# the data side only ever joins register tables.
# --------------------------------------------------------------------------
_HLL_PAIR_UNION_SRC = """(
      WITH p AS (
        SELECT a.event_type AS t1, b.event_type AS t2
        FROM (SELECT DISTINCT event_type FROM events) a,
             (SELECT DISTINCT event_type FROM events) b
        WHERE a.event_type < b.event_type
      ),
      pm AS (SELECT t1, t2, unnest([t1, t2]) AS member FROM p)
      SELECT pm.t1, pm.t2, CAST(e.user_id AS VARCHAR) AS u
      FROM pm JOIN events e ON e.event_type = pm.member
    )"""

_HLL_SINGLES_SRC = "(SELECT event_type, CAST(user_id AS VARCHAR) AS u FROM events)"


def _hll_set_ops_oracle() -> str:
    union_q = hll_sql(_HLL_PAIR_UNION_SRC, "t1, t2", "u")
    single_q = hll_sql(_HLL_SINGLES_SRC, "event_type", "u")
    return f"""
    WITH exact AS (
      SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_exact
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT event_type, user_id FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    unions AS (SELECT t1, t2, hll_est AS est_union FROM ({union_q})),
    singles AS (SELECT event_type, hll_est FROM ({single_q}))
    SELECT x.t1, x.t2, x.n_exact,
           CAST(sa.hll_est + sb.hll_est - u.est_union AS BIGINT)
             AS hll_inter_est,
           CAST(abs(sa.hll_est + sb.hll_est - u.est_union - x.n_exact)
                * 10000 // x.n_exact AS BIGINT) AS err_bp
    FROM exact x
    JOIN unions u ON x.t1 = u.t1 AND x.t2 = u.t2
    JOIN singles sa ON x.t1 = sa.event_type
    JOIN singles sb ON x.t2 = sb.event_type
"""


@query(
    "agg_hll_set_ops",
    oracle=_hll_set_ops_oracle(),
    tags=("A3", "A2", "J6", "A1"),
)
def agg_hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid"), "user_id"
    )
    regs = hll_registers(ev, ["event_type"], "uid")
    types = ev.select("event_type").distinct()
    pairs = types.select(F.col("event_type").alias("t1")).join(
        types.select(F.col("event_type").alias("t2")),
        F.col("t1") < F.col("t2"),
    )
    members = pairs.select(
        "t1", "t2", F.explode(F.array("t1", "t2")).alias("event_type")
    )
    pair_regs = (
        members.join(regs, "event_type")
        .groupBy("t1", "t2", "j")
        .agg(F.max("reg").alias("reg"))
    )
    est_union = hll_estimate(pair_regs, ["t1", "t2"]).withColumnRenamed(
        "hll_est", "est_union"
    )
    singles = hll_estimate(regs, ["event_type"])
    du = ev.select("event_type", "user_id").distinct()
    exact = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    fused = (
        exact.join(est_union, ["t1", "t2"])
        .join(
            singles.select(
                F.col("event_type").alias("t1"), F.col("hll_est").alias("est_a")
            ),
            "t1",
        )
        .join(
            singles.select(
                F.col("event_type").alias("t2"), F.col("hll_est").alias("est_b")
            ),
            "t2",
        )
    )
    inter = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return fused.select(
        "t1",
        "t2",
        "n_exact",
        inter.cast("long").alias("hll_inter_est"),
        F.expr(
            "cast(abs(est_a + est_b - est_union - n_exact) * 10000"
            " div n_exact as bigint)"
        ).alias("err_bp"),
    )


# recommend_bloom_bits moved to queries/governance.py (round 10): it now
# SIZES pipeline_decontaminate_bloom's module-level constants, and
# governance cannot import sketches (this module imports governance).
# Re-exported here so its historical import path keeps working.
from .governance import recommend_bloom_bits  # noqa: E402,F401


# --------------------------------------------------------------------------
# agg_hll_rollup — sketch OLAP: distinct-token estimates for the full
# (lang, source) grouping LATTICE from ONE register build. The corpus is
# scanned once at the finest grain; every coarser level re-maxes the
# SAME (lang, source, j, reg) table (register max-merge IS the rollup
# operator), so the lattice costs three ≤(groups × 64)-row folds instead
# of three corpus passes — the sketch counterpart of A5's grouping sets.
# Exact distinct counts per level ride along for the error audit.
# --------------------------------------------------------------------------
_HLL_ROLLUP_ORACLE = f"""
    WITH toks AS (
      SELECT lang, source, unnest(str_split(text, ' ')) AS token
      FROM documents
    ),
    hashed AS (
      SELECT lang, source, {_MD5_INT60_SQL.format(x='token')} AS h FROM toks
    ),
    regs AS (
      SELECT lang, source, h >> {_HLL_LOW} AS j,
             MAX(least(CASE WHEN h % {1 << _HLL_LOW} = 0 THEN {_HLL_LOW + 1}
                            ELSE {_HLL_LOW + 1} - length(bin(h % {1 << _HLL_LOW}))
                       END, {_HLL_CAP})) AS reg
      FROM hashed GROUP BY 1, 2, 3
    ),
    lattice AS (
      SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
             j, MAX(reg) AS reg
      FROM regs GROUP BY GROUPING SETS ((lang, source, j), (lang, j), (j))
    ),
    folded AS (
      SELECT lang, source,
             SUM(CAST(1 AS BIGINT) << CAST({_HLL_CAP} - reg AS INTEGER))
               + ({_HLL_M} - COUNT(*)) * {1 << _HLL_CAP} AS s,
             {_HLL_M} - COUNT(*) AS v
      FROM lattice GROUP BY lang, source
    ),
    est AS (
      SELECT lang, source,
             CASE WHEN {_HLL_A} // s <= {_HLL_SMALL} AND v > 0
                  THEN [{', '.join(str(x) for x in _HLL_LC)}][CAST(v AS INTEGER)]
                  ELSE {_HLL_A} // s END AS hll_est
      FROM folded
    ),
    exact AS (
      SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
             COUNT(DISTINCT token) AS n_exact
      FROM toks GROUP BY GROUPING SETS ((lang, source), (lang), ())
    )
    SELECT e.lang, e.source, n_exact, CAST(hll_est AS BIGINT) AS hll_est,
           CAST(abs(hll_est - n_exact) * 10000 // n_exact AS BIGINT) AS err_bp
    FROM exact e JOIN est f ON e.lang = f.lang AND e.source = f.source
"""


@query("agg_hll_rollup", oracle=_HLL_ROLLUP_ORACLE, tags=("A3", "A5", "A1"))
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "source", F.explode(F.split("text", " ")).alias("token")
    )
    regs = hll_registers(toks, ["lang", "source"], "token")
    # A rollup() over (lang, source, j) would collapse j before source —
    # the register dimension must survive every level — so the three
    # lattice levels are built explicitly (each a ≤(groups×64) fold):
    l0 = regs.select("lang", "source", "j", "reg")
    l1 = (
        regs.groupBy("lang", "j")
        .agg(F.max("reg").alias("reg"))
        .select("lang", F.lit("ALL").alias("source"), "j", "reg")
    )
    l2 = (
        regs.groupBy("j")
        .agg(F.max("reg").alias("reg"))
        .select(
            F.lit("ALL").alias("lang"), F.lit("ALL").alias("source"), "j", "reg"
        )
    )
    all_regs = l0.unionByName(l1).unionByName(l2)
    est = hll_estimate(all_regs, ["lang", "source"])
    exact = (
        toks.groupBy("lang", "source")
        .agg(F.countDistinct("token").alias("n_exact"))
        .unionByName(
            toks.groupBy("lang")
            .agg(F.countDistinct("token").alias("n_exact"))
            .select("lang", F.lit("ALL").alias("source"), "n_exact")
        )
        .unionByName(
            toks.agg(F.countDistinct("token").alias("n_exact")).select(
                F.lit("ALL").alias("lang"),
                F.lit("ALL").alias("source"),
                "n_exact",
            )
        )
    )
    return exact.join(est, ["lang", "source"]).select(
        "lang",
        "source",
        "n_exact",
        "hll_est",
        F.expr("abs(hll_est - n_exact) * 10000 div n_exact").alias("err_bp"),
    )
