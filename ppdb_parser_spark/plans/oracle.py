"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered query's PySpark implementation and its ANSI-SQL oracle on
the same parquet tables and compares row-count + schema-width + values with
columns sorted by name and rows sorted by all columns — a strictly harsher
version of the driver's order-insensitive value-hash, so passing here means
passing there.
"""

from __future__ import annotations

from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from ..sources.tables import TABLE_NAMES, table_path


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the fixture parquet files as views, like the driver does."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize a result frame: name-sorted columns, normalized dtypes,
    rows sorted by every column."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif s.dtype == object:
            # decimal.Decimal / lists etc. -> string canonical form
            pdf[c] = s.map(lambda v: v if isinstance(v, str) or v is None else str(v))
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str

    def __bool__(self) -> bool:  # pragma: no cover
        return self.ok


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> CompareResult:
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        return CompareResult(name, False, f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
    if len(a) != len(b):
        return CompareResult(name, False, f"row count differs: spark={len(a)} duck={len(b)}")
    # Dtype-strict gate: the driver's value-hash distinguishes 1 from 1.0, so a
    # Spark int64 column against a DuckDB float64/object column (e.g. an uncast
    # HUGEINT SUM) must FAIL here even when the values compare equal.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            return CompareResult(
                name,
                False,
                f"dtype kind mismatch on col {c!r}: spark={a[c].dtype} duck={b[c].dtype} "
                "(driver value-hash would differ — cast the oracle SQL or the Spark column)",
            )
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
            both_nan = sa.isna() & sb.isna()
            eq = (sa == sb) | both_nan
            if not bool(eq.all()):
                bad = (~eq).to_numpy().nonzero()[0][:3]
                diffs = np.abs(sa.to_numpy()[bad] - sb.to_numpy()[bad])
                return CompareResult(
                    name,
                    False,
                    f"float col {c!r} differs at rows {bad.tolist()} "
                    f"(|Δ| up to {np.nanmax(diffs):.3e}; spark={sa.iloc[bad[0]]!r} duck={sb.iloc[bad[0]]!r})",
                )
        else:
            eq = (sa == sb) | (sa.isna() & sb.isna())
            if not bool(eq.all()):
                bad = (~eq).to_numpy().nonzero()[0][:3]
                return CompareResult(
                    name,
                    False,
                    f"col {c!r} differs at rows {bad.tolist()}: "
                    f"spark={sa.iloc[bad[0]]!r} duck={sb.iloc[bad[0]]!r}",
                )
    return CompareResult(name, True, f"{len(a)} rows x {len(a.columns)} cols match")


def check_query(spark, sf_dir: str, name: str) -> CompareResult:
    """Run one registered query against its oracle and compare."""
    from ..queries.registry import REGISTRY

    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        ok = len(spark_pdf) >= 0
        return CompareResult(name, ok, f"rows-only: {len(spark_pdf)} rows")
    con = duck_connect(sf_dir)
    try:
        duck_pdf = con.execute(spec.oracle).df()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, duck_pdf)
