"""CSV / JSON-lines sources (SURVEY.md §2.1 S3) with deterministic fixture
generation. Explicit schemas everywhere — schema inference is a full extra
pass over the data at 100 TB and is banned in this engine."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .ppdb_pack import pack_dir

N_CSV_ROWS = 200
N_JSON_ROWS = 150


def csv_rows() -> list[tuple[str, int, float]]:
    """(sku, qty, price) — pure function of the row index."""
    return [
        (f"SKU{i:03d}", (i * 7) % 13, round(i * 1.5 + 0.25, 2))
        for i in range(N_CSV_ROWS)
    ]


def json_rows() -> list[dict]:
    """{id, tags[], score} — pure function of the row index."""
    return [
        {
            "id": i,
            "tags": [f"t{j}" for j in range(i % 4)],
            "score": round(i * 0.31 + 0.07, 2),
        }
        for i in range(N_JSON_ROWS)
    ]


def _cache_root() -> str:
    return os.path.dirname(pack_dir())


def ensure_csv(root: str | None = None) -> str:
    from ._cache import ensure_cached_dir

    def build(d: str) -> None:
        with open(os.path.join(d, "items.csv"), "w") as f:
            f.write("sku,qty,price\n")
            for sku, qty, price in csv_rows():
                f.write(f"{sku},{qty},{price}\n")

    return ensure_cached_dir(os.path.join(root or _cache_root(), "csv_v1"), build)


def ensure_json(root: str | None = None) -> str:
    from ._cache import ensure_cached_dir

    def build(d: str) -> None:
        with open(os.path.join(d, "docs.jsonl"), "w") as f:
            for row in json_rows():
                f.write(json.dumps(row) + "\n")

    return ensure_cached_dir(os.path.join(root or _cache_root(), "json_v1"), build)


CSV_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType()),
        T.StructField("qty", T.LongType()),
        T.StructField("price", T.DoubleType()),
    ]
)

JSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("score", T.DoubleType()),
    ]
)


def read_csv_items(spark: SparkSession) -> DataFrame:
    return spark.read.schema(CSV_SCHEMA).option("header", "true").csv(
        os.path.join(ensure_csv(), "items.csv")
    )


def read_json_docs(spark: SparkSession) -> DataFrame:
    return spark.read.schema(JSON_SCHEMA).json(
        os.path.join(ensure_json(), "docs.jsonl")
    )


#: rows whose qty field is written unparseable in the dirty CSV fixture.
BAD_CSV_EVERY = 29


def dirty_csv_rows() -> list[tuple[str, str, str, bool]]:
    """(sku, qty_text, price_text, is_bad) — same pure function as
    csv_rows, with every BAD_CSV_EVERY-th row's qty corrupted to a
    non-numeric token (the malformed-line shape a real ingest sees)."""
    out = []
    for i, (sku, qty, price) in enumerate(csv_rows()):
        bad = i % BAD_CSV_EVERY == 3
        out.append((sku, "notanumber" if bad else str(qty), str(price), bad))
    return out


def ensure_csv_dirty(root: str | None = None) -> str:
    from ._cache import ensure_cached_dir

    def build(d: str) -> None:
        with open(os.path.join(d, "items_dirty.csv"), "w") as f:
            f.write("sku,qty,price\n")
            for sku, qty_text, price_text, _ in dirty_csv_rows():
                f.write(f"{sku},{qty_text},{price_text}\n")

    return ensure_cached_dir(
        os.path.join(root or _cache_root(), "csv_dirty_v1"), build
    )


def read_csv_items_permissive(spark: SparkSession) -> DataFrame:
    """PERMISSIVE CSV scan: schema violations land in a `_corrupt` column
    instead of failing the job — the S3 counterpart of the PPDB parser's
    P6 quarantine discipline. (DROPMALFORMED/FAILFAST are the other modes;
    PERMISSIVE + corrupt-column is the only one that keeps evidence.)"""
    schema = T.StructType(
        list(CSV_SCHEMA.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(os.path.join(ensure_csv_dirty(), "items_dirty.csv"))
    )
