"""Local replica of the driver's correctness harness (SURVEY §5.1).

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, column names, arrow-level
types (by kind/width) and values after an order-insensitive row sort —
a strict local proxy for the driver's value-hash comparison.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from .io import TABLES
from .registry import Query


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell types, sort rows."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = pd.DataFrame(index=pdf.index)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("string").str.replace(" 00:00:00", "", regex=False)
        else:
            out[c] = s.map(lambda v: None if v is None else str(v)).astype("string")
    if len(out):
        out = out.sort_values(list(out.columns), na_position="first", kind="mergesort")
    return out.reset_index(drop=True)


def compare(spark, query: Query, sf_dir: str, con=None) -> dict:
    """Return a comparison report; raises AssertionError on mismatch."""
    sdf = query.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if query.oracle is None:
        assert len(spdf) >= 0
        return {"name": query.name, "rows": len(spdf), "oracle": None}

    own_con = con is None
    if own_con:
        con = duckdb_conn(sf_dir)
    try:
        opdf = con.sql(query.oracle).df()
    finally:
        if own_con:
            con.close()

    assert len(spdf) == len(opdf), (
        f"{query.name}: row count {len(spdf)} (spark) != {len(opdf)} (duckdb)"
    )
    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{query.name}: columns {sorted(spdf.columns)} != {sorted(opdf.columns)}"
    )
    a = _normalize(spdf)
    b = _normalize(opdf)
    max_float_diff = 0.0
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            av = a[c].to_numpy(dtype="float64", na_value=np.nan)
            bv = b[c].to_numpy(dtype="float64", na_value=np.nan)
            both_nan = np.isnan(av) & np.isnan(bv)
            diff = np.abs(av - bv)
            diff[both_nan] = 0.0
            if np.isnan(diff).any():
                raise AssertionError(f"{query.name}.{c}: NaN mismatch")
            d = float(diff.max()) if len(diff) else 0.0
            max_float_diff = max(max_float_diff, d)
            if d != 0.0:
                raise AssertionError(
                    f"{query.name}.{c}: float values differ, max abs diff {d:g}"
                )
        else:
            eq = a[c].fillna("\x00NULL") == b[c].fillna("\x00NULL")
            if not bool(eq.all()):
                bad = int((~eq).idxmax())
                raise AssertionError(
                    f"{query.name}.{c}: value mismatch at sorted row {bad}: "
                    f"spark={a[c][bad]!r} duckdb={b[c][bad]!r} "
                    f"({int((~eq).sum())} rows differ)"
                )
    return {
        "name": query.name,
        "rows": len(spdf),
        "max_float_diff": max_float_diff,
        "oracle": True,
    }
