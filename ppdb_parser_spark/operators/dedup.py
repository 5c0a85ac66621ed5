"""Deduplication operators for LLM-data pipelines (SURVEY.md §2.7 O5–O6 +
north-star dedup family: exact, n-gram Jaccard, SimHash, MinHash-LSH).

Scale shapes:

- exact: hash-aggregate on a content fingerprint — one shuffle keyed by the
  hash, no skew (md5 is uniform).
- shingle Jaccard: candidate generation via an equi join on shared shingles
  (only pairs sharing ≥1 shingle are materialized), then exact refinement.
  At 100 TB the candidate join is the bottleneck → cap fan-out by dropping
  ubiquitous shingles (document-frequency ceiling) exactly like a
  stopword filter; the LSH variants below are the sub-quadratic path.
- SimHash: per-token 60-bit hashes → per-bit majority vote → one 60-bit
  signature per doc. Pure integer bit arithmetic (md5-derived), identical
  in both engines → strong oracle despite being a "sketch".
- MinHash-LSH: pyspark.ml MinHashLSH with fixed seed; approximate →
  rows-only driver check, Jaccard-threshold property asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import exploded_tokens

#: Number of SimHash bits (60 = 15 hex chars, safely inside int64).
SIMHASH_BITS = 60


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: one row per distinct content with the
    canonical (min) id and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with array higher-order functions (slice over the token array),
    not a window over exploded tokens — shingling is a narrow per-row map
    with ZERO shuffles: per-document uniqueness is ``array_distinct``
    BEFORE the explode (a distinct over (id, shingle) rows would be a
    full extra shuffle for the same result, since shingles only need
    deduping within a document).

    Shingling is CPU-heavy relative to its input bytes (every token
    written n times), so when the source collapses to fewer partitions
    than the session's parallelism — e.g. one small parquet file — the
    input is repartitioned first. At real scale the scan already has
    ≥ parallelism splits and this branch is a no-op.
    """
    sess = df.sparkSession
    par = sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    toks = F.split(F.col(text_col), " ")
    # guard: sequence(1, 0) would step DOWNWARD; docs shorter than n
    # tokens have no shingles
    shingles = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(shingles).alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-Jaccard ≥ threshold (exact).

    candidate pairs = equi join on shared shingles (never a cross join);
    jaccard = |A∩B| / (|A|+|B|-|A∩B|) — an int/int rational, so the
    threshold comparison is deterministic cross-engine.

    ``max_doc_freq``: drop shingles appearing in more than this many
    documents BEFORE pairing (and before set sizes are computed — the
    Jaccard is then over the filtered shingle sets, mirrored identically
    in the oracle). The candidate join costs Σ_shingle df² — ubiquitous
    shingles contribute quadratically while carrying no dedup signal, so
    a DF ceiling is the standard scale control (same role as LSH banding).
    """
    sh = word_shingles(df, n, id_col, text_col)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        keep = freq.filter(F.col("df") <= max_doc_freq).select("shingle")
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def jaccard_pairs_bitmap(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Same pairs as :func:`jaccard_pairs`, with the intersection counted
    on packed per-document fingerprint sets instead of the pair×shingle
    stream (round-1 verdict #10 "bitmap Jaccard").

    The baseline shuffles the full candidate stream — one row per shared
    (shingle, docA, docB), Σ_shingle df² rows — into a groupBy(id_a,id_b)
    count. Here that stream carries NO payload and collapses to *distinct
    pairs* (map-side combine dedups before the exchange); |A∩B| is then
    ``size(array_intersect)`` over each doc's sorted 64-bit shingle
    fingerprints (a roaring-bitmap stand-in: Spark has no native bitmap
    type, and a sorted distinct int64 array gives the same O(|A|+|B|)
    merge-intersection JVM-side). Candidate pairs that share many shingles
    — exactly the near-duplicates the operator exists to find — shrink
    from k rows to 1, which is where the shuffle-volume win comes from.

    64-bit fingerprint collisions could in principle merge two shingles
    (p ≈ n²/2⁶⁵ — negligible at any realistic shingle count); equality
    with the exact path is regression-tested.
    """
    sh = word_shingles(df, n, id_col, text_col)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        keep = freq.filter(F.col("df") <= max_doc_freq).select("shingle")
        sh = sh.join(keep, "shingle")
    fp = sh.select(F.col(id_col), F.xxhash64("shingle").alias("fp"))
    sets = fp.groupBy(id_col).agg(
        F.sort_array(F.collect_set("fp")).alias("fps")
    )
    a, b = fp.alias("a"), fp.alias("b")
    cand = (
        a.join(b, "fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("fps").alias("fps_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("fps").alias("fps_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("fps_a", "fps_b")).cast("long").alias("n_common"),
            F.size("fps_a").cast("long").alias("n_a"),
            F.size("fps_b").cast("long").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard-join via prefix filtering (AllPairs / PPJoin family —
    Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW 2007): the EXACT same pairs as :func:`jaccard_pairs`, with the
    candidate join restricted to each document's *prefix* of rarest
    shingles.

    Principle: order every document's shingles by a global canonical order
    (here (document-frequency asc, fingerprint asc) — no global dense rank
    needed, the sort key itself is the order, so there is no
    single-partition ranking step). If J(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉,
    so by pigeonhole A and B must share an element inside their first
    |X| − ⌈t·|X|⌉ + 1 shingles. Joining prefix-against-prefix therefore
    loses no qualifying pair, while ubiquitous shingles — the df² cost
    bombs — land in almost no prefix (every doc that has anything rarer
    pushes them out). Candidates are verified exactly with a packed-set
    ``array_intersect``.

    Unlike ``max_doc_freq`` capping this needs NO semantic compromise
    (capping changes the measured Jaccard; the prefix filter does not),
    which makes it the preferred 100 TB path for exact near-dup joins.
    """
    # One doc-keyed exchange right after the tokenize+explode map: both
    # consumers below (the df count and the occurrence⋈df join) read this
    # single materialized exchange, so tokenization runs exactly once,
    # and the partitioning is inherited by the fattest aggregate in the
    # plan — the per-doc collect_list building `packed` — which therefore
    # needs no further shuffle. (Measured fastest at sf0.1 against both a
    # shingle-keyed exchange and a plain distinct barrier.)
    sh = word_shingles(df, n, id_col, text_col).repartition(id_col)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    keyed = sh.join(freq, "shingle").select(
        F.col(id_col),
        F.struct(F.col("df"), F.xxhash64("shingle").alias("fp")).alias("k"),
    )
    # per-doc shingles in canonical (rarest-first) order + packed set
    packed = keyed.groupBy(id_col).agg(
        F.sort_array(F.collect_list("k")).alias("ks")
    )
    t = float(threshold)
    n_sh = F.size("ks")
    prefix_len = n_sh - F.ceil(F.lit(t) * n_sh).cast("int") + 1
    # df = 1 prefix elements can never be common to two documents, so they
    # are dropped BEFORE the candidate join's exchange (rarest-first
    # ordering puts them at the head of every prefix, so this halves the
    # exchanged occurrence rows); c is unaffected because c counts common
    # elements only. n and the prefix window are computed from the FULL
    # set before the drop, so all bounds stay exact.
    pref = (
        packed.select(
            F.col(id_col),
            n_sh.alias("n"),
            F.explode(F.slice("ks", F.lit(1), prefix_len)).alias("k"),
        )
        .where(F.col("k.df") >= 2)
        .select(id_col, "n", F.col("k.fp").alias("fp"))
    )
    # Candidate pruning (PPJoin family — Xiao, Wang, Lin & Yu, WWW 2008),
    # AGGREGATED per pair rather than per occurrence: the equi-join on
    # prefix fingerprints yields one row per common prefix element; a
    # single hash aggregate then gives, per (id_a, id_b), the EXACT prefix
    # overlap c = |prefix(A) ∩ prefix(B)|. Since every further common
    # element must lie in a suffix (length n − pl, with pl a pure function
    # of n), the full overlap obeys
    #     overlap ≤ c + min(n_a − pl_a, n_b − pl_b),
    # and pairs whose bound is < α = ⌈t/(1+t)·(n_a+n_b)⌉ cannot reach
    # J ≥ t — pruned BEFORE the set-verification join, provably losing no
    # qualifying pair. This is the workhorse filter: junk pairs share only
    # a few prefix shingles, so requiring c ≥ α − min(suffix) collapses
    # the candidate set by four orders of magnitude (measured at sf0.1:
    # 3.5M distinct candidate pairs under the per-occurrence positional
    # filter alone → ~300 under the c-bound), which in turn makes the
    # exact verification join negligible. The join payload is kept to
    # (id, n, fp) — prefix lengths are recomputed from n post-aggregation
    # rather than carried through the 16M-row join.
    a, b = pref.alias("a"), pref.alias("b")
    tc = F.lit(t)

    def _plen(n: F.Column) -> F.Column:
        return n - F.ceil(tc * n).cast("int") + 1

    # PPJoin's length filter rides along in the join condition: J ≥ t
    # forces t·max(n_a, n_b) ≤ min(n_a, n_b) (since overlap ≤ min and
    # union ≥ max), so length-incompatible occurrence rows are dropped as
    # the equi-join on fp emits them — BEFORE they reach the pair
    # aggregate's exchange. Pruning only; verification stays exact.
    cand = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (tc * F.col("a.n") <= F.col("b.n"))
            & (tc * F.col("b.n") <= F.col("a.n")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first(F.col("a.n")).alias("na"),
            F.first(F.col("b.n")).alias("nb"),
        )
        .filter(
            F.col("c")
            + F.least(
                F.col("na") - F.least(_plen(F.col("na")), F.col("na")),
                F.col("nb") - F.least(_plen(F.col("nb")), F.col("nb")),
            )
            >= F.ceil(F.lit(t / (1.0 + t)) * (F.col("na") + F.col("nb")))
        )
        .select("id_a", "id_b")
    )
    sets = packed.select(
        F.col(id_col),
        F.sort_array(F.transform("ks", lambda s: s["fp"])).alias("fps"),
    )
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("fps").alias("fps_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("fps").alias("fps_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("fps_a", "fps_b")).cast("long").alias("n_common"),
            F.size("fps_a").cast("long").alias("n_a"),
            F.size("fps_b").cast("long").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def _token_hash60(token_col: str = "token") -> F.Column:
    """First 15 hex chars of md5 → 60-bit integer (identical both engines:
    Spark conv(hex,16,10); DuckDB CAST('0x'||hex AS BIGINT))."""
    return F.conv(F.substring(F.md5(F.col(token_col)), 1, 15), 16, 10).cast("long")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document from distinct-token md5 hashes.

    Per bit b: vote = Σ_tokens (2·bit_b(h) − 1); signature bit b is 1 iff
    vote > 0. Implemented as token×bit explode → two hash aggregates —
    ~60·|tokens| intermediate rows, all integer ops, fully parallel.
    """
    toks = (
        exploded_tokens(df, id_col, text_col)
        .select(id_col, "token")
        .distinct()
        .withColumn("h", _token_hash60())
    )
    bits = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
        "h",
    ).withColumn(
        # F.shiftright only takes a literal shift → SQL expr for col-by-col
        "vote",
        F.expr("(shiftright(h, b) % 2) * 2 - 1"),
    )
    votes = bits.groupBy(id_col, "b").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs at scale: signatures split into ``n_bands``
    bit-bands; candidates must share at least one exact band (equi join on
    (band_idx, band_bits) — sub-quadratic, like MinHash banding); refined
    with the true hamming distance via xor + bit_count. All integer ops →
    deterministic and oracle-checkable, unlike probabilistic LSH recall.

    Note the usual banding guarantee: a pair is a candidate iff some band
    matches exactly, which (pigeonhole) covers every pair with hamming <
    n_bands; beyond that recall is partial — the point of the sketch.
    """
    bits_per_band = SIMHASH_BITS // n_bands
    sig = simhash(df, id_col, text_col)
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band_idx"),
    ).withColumn(
        "band_bits",
        F.expr(
            f"(simhash >> (band_idx * {bits_per_band}))"
            f" % shiftleft(CAST(1 AS BIGINT), {bits_per_band})"
        ),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"),
        "band_idx", "band_bits",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"),
        "band_idx", "band_bits",
    )
    cand = (
        a.join(b, ["band_idx", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.expr("sig_a ^ sig_b")).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
