"""Parse-kernel tests (SURVEY.md §5.3 layers 1–2): golden-line exact parses
and a seeded format→parse round-trip property."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ppdb_parser_spark.operators.ppdb import parse_ppdb, parse_ppdb_clean, quarantine
from ppdb_parser_spark.sources.ppdb_pack import GOLDEN_LINES


def _lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def test_golden_full_parse(spark):
    rows = {
        r["_raw_line"]: r
        for r in parse_ppdb(_lines_df(spark, GOLDEN_LINES)).collect()
    }
    r0 = rows[GOLDEN_LINES[0]]
    assert r0["lhs"] == "[VP]"
    assert r0["phrase"] == "take into account"
    assert r0["paraphrase"] == "consider"
    assert r0["features"] == {"PPDB2.0Score": 4.12, "AGigaSim": 0.71, "p(e|f)": 0.12}
    assert r0["ppdb2score"] == 4.12
    assert [(a["src"], a["tgt"]) for a in r0["alignment"]] == [(0, 0), (1, 0), (2, 0)]
    assert r0["entailment"] == "Equivalence"

    # PPDB-1.0 line: no 6th field -> entailment NULL, no promoted score
    r10 = rows[GOLDEN_LINES[4]]
    assert r10["entailment"] is None
    assert r10["ppdb2score"] is None
    assert r10["features"] == {"p(e|f)": 0.12, "p(f|e)": 0.09}

    # unicode phrase survives
    assert rows[GOLDEN_LINES[5]]["phrase"] == "café"

    # empty features field -> empty map, extra inner spaces trimmed
    r_empty = rows[GOLDEN_LINES[7]]
    assert r_empty["features"] == {}
    assert r_empty["paraphrase"] == "spare"

    # non-numeric feature value: key kept, value NULL
    r_flag = rows[GOLDEN_LINES[8]]
    assert r_flag["features"]["PPDB2.0Score"] == 2.0
    assert r_flag["ppdb2score"] == 2.0

    # malformed + blank lines flagged invalid, not crashed
    assert rows[GOLDEN_LINES[6]]["is_valid"] is False
    assert rows[""]["is_valid"] is False


def test_quarantine_split(spark):
    df = _lines_df(spark, GOLDEN_LINES)
    n_good = parse_ppdb_clean(df).count()
    n_bad = quarantine(df).count()
    assert n_good + n_bad == len(GOLDEN_LINES)
    assert n_bad == 2  # the 3-field line and the blank line


def test_roundtrip_property(spark):
    """Seeded property: format a random rule as a PPDB line, parse it back,
    require exact field equality. One batched Spark job for all cases."""
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "épée", "zeta"]
    cases = []
    for i in range(200):
        lhs = f"[{rng.choice(['NN', 'VP', 'JJ'])}]"
        phrase = " ".join(rng.choice(words) for _ in range(rng.randint(1, 60)))
        para = " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
        feats = {
            f"k{j}": round(rng.uniform(-10, 10), 4) for j in range(rng.randint(1, 5))
        }
        feats["PPDB2.0Score"] = round(rng.uniform(1, 5), 2)
        align = [
            (s, rng.randrange(len(para.split()))) for s in range(len(phrase.split()))
        ]
        ent = rng.choice([None, "Equivalence", "Exclusion", "Independent"])
        line = (
            f"{lhs} ||| {phrase} ||| {para} ||| "
            + " ".join(f"{k}={v}" for k, v in feats.items())
            + " ||| "
            + " ".join(f"{s}-{t}" for s, t in align)
        )
        if ent:
            line += f" ||| {ent}"
        cases.append((line, lhs, phrase, para, feats, align, ent))

    parsed = {
        r["_raw_line"]: r
        for r in parse_ppdb(_lines_df(spark, [c[0] for c in cases])).collect()
    }
    for line, lhs, phrase, para, feats, align, ent in cases:
        r = parsed[line]
        assert r["is_valid"], line
        assert r["lhs"] == lhs
        assert r["phrase"] == phrase
        assert r["paraphrase"] == para
        assert r["features"] == feats
        assert r["ppdb2score"] == feats["PPDB2.0Score"]
        assert [(a["src"], a["tgt"]) for a in r["alignment"]] == align
        assert r["entailment"] == ent


def test_bz2_pack_is_splittable(spark):
    """One .bz2 pack file must fan out into multiple input splits (the
    §4.3 splittable-ingest contract): with a small maxPartitionBytes the
    single-file scan plans >1 partition, and the row count is unchanged."""
    from ppdb_parser_spark.sources.ppdb_pack import ensure_big_pack_bz2
    from ppdb_parser_spark.sources.text import read_text_lines

    pack = ensure_big_pack_bz2(n_lines=100_000, seed=7)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        df = read_text_lines(spark, pack + "/*.txt.bz2")
        n_parts = df.rdd.getNumPartitions()
        n_rows = df.count()
    finally:
        if old is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        else:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert n_parts > 1, f"bz2 scan did not split: {n_parts} partition(s)"
    assert n_rows == 100_000
