"""Local differential harness mimicking the driver's DuckDB-oracle check:
row count, column names, and order-insensitive value comparison."""

from __future__ import annotations

import datetime
import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        # decimals -> float, numpy scalars -> python, timestamps -> iso str
        if s.dtype == object:
            df[c] = s.map(
                lambda v: float(v)
                if hasattr(v, "as_tuple")
                else v.isoformat()
                if isinstance(v, (datetime.date, datetime.datetime))
                else v
            )
        if str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]").astype(str)
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if "int" in str(df[c].dtype):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray" else v
            )
    return df


def _key(row, float_nd=9):
    out = []
    for v in row:
        if isinstance(v, float):
            if math.isnan(v):
                out.append("NaN")
            else:
                out.append(f"{v:.{float_nd}g}")
        else:
            out.append(v)
    return tuple(out)


def assert_frames_match(spark_df, duck_df: pd.DataFrame, name: str = "query"):
    sp = _canon(spark_df.toPandas())
    du = _canon(duck_df)
    assert list(sp.columns) == list(du.columns), (
        f"{name}: column mismatch {list(sp.columns)} vs {list(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count {len(sp)} vs {len(du)}"
    sk = sorted(_key(r) for r in sp.itertuples(index=False, name=None))
    dk = sorted(_key(r) for r in du.itertuples(index=False, name=None))
    mismatches = [(a, b) for a, b in zip(sk, dk) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"
