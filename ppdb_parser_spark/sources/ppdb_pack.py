"""Deterministic synthetic PPDB pack (FIXTURES.md §B).

The reference's native input is a gzipped text database: one paraphrase rule
per line, fields separated by `` ||| `` —

    LHS ||| PHRASE ||| PARAPHRASE ||| FEATURES ||| ALIGNMENT [||| ENTAILMENT]

No real PPDB pack ships with the fixtures, so this module synthesizes one,
fully deterministically (``random.Random(seed)``, no wall-clock), writes it
as **many gzipped shards** (gzip is non-splittable: one file = one Spark
task, so pack discipline at 100 TB is many-files — SURVEY.md §4.3), and
exposes the same lines as a DuckDB ``VALUES`` relation so the oracle can
parse the identical input in SQL.

Adversarial cases baked in (FIXTURES.md §B): malformed lines (wrong field
count), empty features, a non-float feature value, duplicate rules, reverse
(symmetric) pairs, a >50-token phrase, unicode, and blank lines.
"""

from __future__ import annotations

import gzip
import os
import random

# Vocabulary intentionally overlaps documents.text (FIXTURES.md) so
# paraphrase-lookup joins against document tokens actually hit.
VOCAB = (
    "the fast key order sort table scan merge part window small data slow "
    "filter customer line total group query row spark join index value plan "
    "hash cache disk read write block store shift stream event batch"
).split()

LHS_TAGS = ["[VP]", "[NN]", "[JJ]", "[S]", "[ADV]", "[NP]"]
ENTAILMENTS = [
    "Equivalence",
    "ForwardEntailment",
    "ReverseEntailment",
    "Exclusion",
    "Independent",
    "OtherRelated",
]
FEATURE_KEYS = ["AGigaSim", "p(e|f)", "p(f|e)", "RarityPenalty", "WordLenDiff"]

#: Hand-written golden lines covering the grammar corners (kept verbatim —
#: tests assert exact parses of these).
GOLDEN_LINES = [
    "[VP] ||| take into account ||| consider ||| PPDB2.0Score=4.12 AGigaSim=0.71 p(e|f)=0.12 ||| 0-0 1-0 2-0 ||| Equivalence",
    "[NN] ||| car ||| automobile ||| PPDB2.0Score=4.87 AGigaSim=0.88 ||| 0-0 ||| Equivalence",
    "[NN] ||| dog ||| animal ||| PPDB2.0Score=2.31 AGigaSim=0.44 ||| 0-0 ||| ForwardEntailment",
    "[JJ] ||| hot ||| cold ||| PPDB2.0Score=1.02 AGigaSim=0.35 ||| 0-0 ||| Exclusion",
    "[VP] ||| take into account ||| consider ||| p(e|f)=0.12 p(f|e)=0.09 ||| 0-0 1-0 2-0",
    "[NN] ||| café ||| coffee shop ||| PPDB2.0Score=3.10 ||| 0-0 0-1 ||| Equivalence",
    # adversarial: too few fields (quarantine), empty features, non-float feature
    "[XX] ||| only three fields",
    "[NN] ||| empty feats |||  spare  |||  ||| 0-0 ||| Independent",
    "[NN] ||| flagged ||| marked ||| ContainsX=1 PPDB2.0Score=2.00 ||| 0-0 ||| OtherRelated",
    "",  # blank line (quarantine)
]


def generate_lines(n_lines: int = 600, seed: int = 42) -> list[str]:
    """Deterministic synthetic pack content, golden lines included."""
    rng = random.Random(seed)
    lines: list[str] = list(GOLDEN_LINES)

    def mk_phrase(lo: int = 1, hi: int = 3) -> str:
        return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(lo, hi)))

    symmetric_backlog: list[tuple[str, str, str]] = []
    while len(lines) < n_lines:
        roll = rng.random()
        if symmetric_backlog and roll < 0.10:
            # reverse direction of an earlier rule (J6 self-join fixture)
            lhs, phrase, para = symmetric_backlog.pop()
            pair = (lhs, para, phrase)
        else:
            pair = (rng.choice(LHS_TAGS), mk_phrase(), mk_phrase())
            if rng.random() < 0.25:
                symmetric_backlog.append(pair)
        lhs, phrase, para = pair
        feats = [f"PPDB2.0Score={round(rng.uniform(1, 5), 2)}"]
        for key in FEATURE_KEYS:
            if rng.random() < 0.5:
                feats.append(f"{key}={round(rng.uniform(0, 1), 4)}")
        n_src = len(phrase.split())
        n_tgt = len(para.split())
        align = " ".join(
            f"{i}-{rng.randrange(n_tgt)}" for i in range(n_src)
        )
        line = f"{lhs} ||| {phrase} ||| {para} ||| {' '.join(feats)} ||| {align}"
        if rng.random() < 0.8:
            line += f" ||| {rng.choice(ENTAILMENTS)}"
        if rng.random() < 0.01:
            line = line.split(" ||| ", 1)[0] + " ||| malformed"  # wrong arity
        lines.append(line)
        if rng.random() < 0.02:
            lines.append(line)  # exact duplicate rule (O5 fixture)
    return lines


def _cache_root(root: str | None = None) -> str:
    return root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache"
    )


def pack_dir(root: str | None = None, n_lines: int = 600, seed: int = 42, shards: int = 4) -> str:
    # generator params are part of the cache key: a pack built with
    # different params must never be served from a stale directory
    return os.path.join(_cache_root(root), f"ppdb_pack_{n_lines}_{seed}_{shards}")


def _write_shards(d: str, lines: list[str], shards: int) -> None:
    for s in range(shards):
        shard_lines = [ln for i, ln in enumerate(lines) if i % shards == s]
        with gzip.open(
            os.path.join(d, f"part-{s:04d}.txt.gz"), "wt", encoding="utf-8"
        ) as f:
            f.write("\n".join(shard_lines) + "\n")


def ensure_pack(root: str | None = None, n_lines: int = 600, seed: int = 42, shards: int = 4) -> str:
    """Write the pack as ``shards`` gzipped text files (idempotent, atomic
    under concurrent callers)."""
    from ._cache import ensure_cached_dir

    return ensure_cached_dir(
        pack_dir(root, n_lines, seed, shards),
        lambda d: _write_shards(d, generate_lines(n_lines, seed), shards),
    )


def ensure_big_pack(root: str | None = None, n_lines: int = 100_000, seed: int = 7, shards: int = 16) -> str:
    """Bench-scale pack (separate from the oracle-checked 600-line pack):
    used to measure raw parse throughput against the reference's
    single-process line loop. 16 shards ⇒ 16-way parallel gzip decode."""
    from ._cache import ensure_cached_dir

    d = os.path.join(_cache_root(root), f"ppdb_pack_big_{n_lines}_{seed}_{shards}")
    return ensure_cached_dir(
        d, lambda t: _write_shards(t, generate_lines(n_lines, seed), shards)
    )


def ensure_pack_bz2(root: str | None = None, n_lines: int = 600, seed: int = 42) -> str:
    """The same pack content as ONE bzip2 file — the splittable-compression
    ingest path (SURVEY.md §4.3).

    Gzip shards parallelize only as far as the file count; a splittable
    codec lets Spark split a single compressed file into many input splits
    at block boundaries. SURVEY §4.3 names seekable-zstd as the production
    choice, but Hadoop's zstd text codec needs native libraries this
    container lacks (CODEC_NOT_AVAILABLE lists: bzip2, deflate, snappy,
    lz4, gzip) — of those, bzip2 is the one SplittableCompressionCodec, so
    it carries the splittable-ingest contract here; splittability itself is
    asserted in tests (one .bz2 file → many input splits)."""
    import bz2

    from ._cache import ensure_cached_dir

    def build(d: str) -> None:
        with bz2.open(
            os.path.join(d, "pack.txt.bz2"), "wt", encoding="utf-8"
        ) as f:
            f.write("\n".join(generate_lines(n_lines, seed)) + "\n")

    return ensure_cached_dir(
        os.path.join(_cache_root(root), f"ppdb_pack_bz2_{n_lines}_{seed}"), build
    )


def ensure_big_pack_bz2(root: str | None = None, n_lines: int = 100_000, seed: int = 7) -> str:
    """Bench-scale single-file bzip2 pack (splittability fixture)."""
    import bz2

    from ._cache import ensure_cached_dir

    def build(d: str) -> None:
        with bz2.open(
            os.path.join(d, "pack.txt.bz2"), "wt", encoding="utf-8"
        ) as f:
            f.write("\n".join(generate_lines(n_lines, seed)) + "\n")

    return ensure_cached_dir(
        os.path.join(_cache_root(root), f"ppdb_pack_big_bz2_{n_lines}_{seed}"), build
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def lines_values_sql(n_lines: int = 600, seed: int = 42) -> str:
    """The exact pack content as a DuckDB VALUES relation ``(value VARCHAR)``.

    Lets the oracle parse the same input the Spark gzip scan reads, keeping
    the whole S1→P* path hash-checked end-to-end.
    """
    lines = generate_lines(n_lines, seed)
    rows = ",\n      ".join(f"({_sql_quote(ln)})" for ln in lines)
    return f"(SELECT * FROM (VALUES\n      {rows}\n    ) AS t(value))"
