"""Unit tests for the round-16 Arrow kernel adapters in operators/linalg:
the zero-copy decompositions every converted ``mapInArrow`` block kernel
builds on (block_layout / context_entries / uniform_list_offsets), plus
the ADVICE-r15 edge-case hardening of arrow_list_to_2d. Pure pyarrow —
no SparkSession, so this file runs in milliseconds."""

import numpy as np
import pyarrow as pa
import pytest

from ppdb_parser_spark.operators.linalg import (
    arrow_list_to_2d,
    block_layout,
    context_entries,
    uniform_list_offsets,
)


def _list_struct(rows):
    """list<struct<id long, v list<double>>> column from python rows."""
    entries = pa.array(
        [e for block in rows for e in block],
        type=pa.struct(
            [("id", pa.int64()), ("v", pa.list_(pa.float64()))]
        ),
    )
    offs = np.zeros(len(rows) + 1, dtype=np.int32)
    np.cumsum([len(b) for b in rows], out=offs[1:])
    return pa.ListArray.from_arrays(pa.array(offs), entries)


def test_arrow_list_to_2d_empty_is_2d():
    # ADVICE r15: empty input must give a (0, 0) 2-D array, not the 1-D
    # shape-(0,) array a caller reading .shape[1] would crash on
    out = arrow_list_to_2d(
        pa.array([], type=pa.list_(pa.float64())), np.float64
    )
    assert out.shape == (0, 0)


def test_arrow_list_to_2d_non_primitive_falls_back():
    # ADVICE r15: list<list<...>> values can't zero-copy; the helper
    # must fall through to the exact object path, not raise
    arr = pa.array([[[1.0, 2.0]], [[3.0, 4.0]]])
    out = arrow_list_to_2d(arr, np.float64)
    assert out.shape == (2, 1, 2) or out.shape == (2, 1)  # object path
    assert float(np.asarray(out[0]).ravel()[0]) == 1.0


def test_arrow_list_to_2d_sliced_offsets():
    # raw offsets of a SLICED list array don't start at 0; the reshape
    # must honor offs[0] (the invariant the block kernels rely on)
    arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    out = arrow_list_to_2d(arr.slice(1, 2), np.float64)
    assert out.tolist() == [[3.0, 4.0], [5.0, 6.0]]


def test_uniform_list_offsets_overflow_raises():
    with pytest.raises(ValueError, match="overflows int32"):
        uniform_list_offsets(2**26, 2**6)  # (n+1)*width > 2^31
    offs = uniform_list_offsets(3, 4)
    assert offs.to_pylist() == [0, 4, 8, 12]


def test_block_layout_and_context_entries_roundtrip():
    col = _list_struct([[(1, [1.0, 2.0])], [(2, [3.0, 4.0]), (3, [5.0, 6.0])]])
    col = pa.ListArray.from_arrays(
        col.offsets,
        pa.array(
            [
                {"id": 1, "v": [1.0, 2.0]},
                {"id": 2, "v": [3.0, 4.0]},
                {"id": 3, "v": [5.0, 6.0]},
            ]
        ),
    )
    entries, offs = block_layout(col)
    assert offs.tolist() == [0, 1, 3]
    Q = arrow_list_to_2d(entries.field("v"), np.float64)
    # per-block slices via raw offsets
    assert Q[offs[0] : offs[1]].tolist() == [[1.0, 2.0]]
    assert Q[offs[1] : offs[2]].tolist() == [[3.0, 4.0], [5.0, 6.0]]
    # concatenated output order = entries.slice(offs[0], offs[-1]-offs[0])
    out = entries.slice(offs[0], offs[-1] - offs[0])
    assert out.field("id").to_pylist() == [1, 2, 3]
    # context adapter: first element of a (replicated) list<struct> column
    ctx = context_entries(col, row=1)
    assert ctx.field("id").to_pylist() == [2, 3]


def test_block_layout_rejects_null_blocks():
    col = pa.array([[{"id": 1}], None], type=pa.list_(pa.struct([("id", pa.int64())])))
    with pytest.raises(ValueError, match="null block"):
        block_layout(col)
