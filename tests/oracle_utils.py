"""Local re-implementation of the driver's oracle-differential check
(SURVEY.md §5): run the Spark query and the DuckDB oracle SQL on the
same parquet tables, then compare row count + column names + values
order-insensitively.  Stricter than the driver on floats (exact-after-
round match expected; tiny tolerance only to absorb rounding-boundary
drift in order-dependent sums).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from etl_tpch_spark.schemas import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if len(s.dropna()) else None, (list, np.ndarray)):
            df[c] = s.map(lambda v: tuple(v) if v is not None else None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, *, float_atol: float = 1e-6) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_df)
    problems: list[str] = []
    if list(got.columns) != list(want.columns):
        return [f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"]
    if len(got) != len(want):
        return [f"row count differs: spark={len(got)} oracle={len(want)}"]
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype("float64").to_numpy()
            wa = w.astype("float64").to_numpy()
            both_nan = np.isnan(ga) & np.isnan(wa)
            close = np.isclose(ga, wa, rtol=0, atol=float_atol) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                problems.append(
                    f"col {c}: {int((~close).sum())} mismatches, e.g. row {i}: "
                    f"spark={ga[i]!r} oracle={wa[i]!r}"
                )
            else:
                diff = np.abs(np.where(both_nan, 0.0, ga - wa))
                mx = float(np.max(diff)) if len(diff) else 0.0
                if mx > 0:
                    problems.append(f"WARN col {c}: max float diff {mx:.2e} (passes atol)")
        else:
            eq = (g == w) | (g.isna() & w.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, e.g. row {i}: "
                    f"spark={g.iloc[i]!r} oracle={w.iloc[i]!r}"
                )
    return [p for p in problems if not p.startswith("WARN")]


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.execute(sql).df()
