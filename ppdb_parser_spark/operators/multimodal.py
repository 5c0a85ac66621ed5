"""Multimodal (binary) column handling (SURVEY.md §2.1 S4, §2.9 L7).

Blobs are opaque ``binary`` columns plus typed metadata. The container has
no image/audio codecs, so the *decode* steps for real formats are stubbed
behind ``NotImplementedError`` (clearly marked), while the Spark-side
plumbing — binaryFile source, schema, Arrow batch shape of the
``mapInPandas`` decoder, content hashing for identity/dedup — is real and
oracle-checked against hashes precomputed with hashlib.

Fake blob format ("FAKE"): 4-byte magic ``FAKE`` · width uint16-BE ·
height uint16-BE · payload bytes (deterministic per index). A decoder for
this format exists and is exact, standing in for a JPEG/PNG decoder with
identical dataflow.
"""

from __future__ import annotations

import hashlib
import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BLOBS = 48
MAGIC = b"FAKE"


def blob_bytes(i: int) -> bytes:
    """Deterministic content of blob i (no RNG: reproducible anywhere)."""
    width = 16 + (i * 7) % 240
    height = 16 + (i * 13) % 240
    payload = bytes((i * 31 + j * 17) % 256 for j in range(64 + (i % 5) * 32))
    return MAGIC + struct.pack(">HH", width, height) + payload


def blob_meta(i: int) -> tuple[str, int, int, int, str]:
    """(file_name, n_bytes, width, height, sha256hex) — ground truth for
    the oracle VALUES relation."""
    b = blob_bytes(i)
    w, h = struct.unpack(">HH", b[4:8])
    return (f"blob-{i:04d}.fake", len(b), w, h, hashlib.sha256(b).hexdigest())


def blobs_dir(root: str | None = None) -> str:
    root = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache"
    )
    return os.path.join(root, "blobs_v1")


def ensure_blobs(root: str | None = None) -> str:
    from ..sources._cache import ensure_cached_dir

    def build(d: str) -> None:
        for i in range(N_BLOBS):
            with open(os.path.join(d, f"blob-{i:04d}.fake"), "wb") as f:
                f.write(blob_bytes(i))

    return ensure_cached_dir(blobs_dir(root), build)


def blobs_values_sql() -> str:
    rows = ", ".join(
        f"('{n}', {ln}, {w}, {h}, '{sha}')"
        for n, ln, w, h, sha in (blob_meta(i) for i in range(N_BLOBS))
    )
    return (
        f"(SELECT * FROM (VALUES {rows}) "
        "AS b(file_name, n_bytes, width, height, sha256))"
    )


def read_blobs(spark: SparkSession, path: str | None = None) -> DataFrame:
    """S4: binaryFile source → (path, modificationTime, length, content)."""
    d = path or ensure_blobs()
    return spark.read.format("binaryFile").load(os.path.join(d, "*.fake"))


def decode_meta(blobs: DataFrame) -> DataFrame:
    """Decode typed metadata from binary content via ``mapInPandas``
    (Arrow-batched; the real-codec branch is a marked stub).

    Returns (file_name, n_bytes, width, height, sha256).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file_name": [],
                "n_bytes": [],
                "width": [],
                "height": [],
                "sha256": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if not data.startswith(MAGIC):
                    # Real formats (JPEG/PNG/WAV/MP4) need codec libraries
                    # that are not in this container — deliberate stub.
                    raise NotImplementedError(
                        "non-FAKE blob decode requires an image/audio codec"
                    )
                w, h = struct.unpack(">HH", data[4:8])
                out["file_name"].append(os.path.basename(path))
                out["n_bytes"].append(len(data))
                out["width"].append(w)
                out["height"].append(h)
                out["sha256"].append(hashlib.sha256(data).hexdigest())
            yield pd.DataFrame(out)

    return blobs.mapInPandas(
        _decode,
        schema="file_name string, n_bytes long, width long, height long, sha256 string",
    )
