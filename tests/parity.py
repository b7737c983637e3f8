"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB oracle result — a local replica of the driver's correctness
check (row count + column names + sorted value comparison)."""

from __future__ import annotations

import math

import pandas as pd


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        # driver-style canonicalization: floats to a fixed repr
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_canon_cell(row[c]) for c in cols))
    out.sort()
    return out


def assert_match(spark_df, duck_df: pd.DataFrame, name: str) -> None:
    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} duck={sorted(duck_df.columns)}"
    )
    assert len(spdf) == len(duck_df), f"{name}: row count spark={len(spdf)} duck={len(duck_df)}"
    a = canonical_rows(spdf)
    b = canonical_rows(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
