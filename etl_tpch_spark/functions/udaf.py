"""User-defined aggregates via GROUPED_AGG pandas UDFs (SURVEY.md §2.10).

The reference has no UDAF surface at all; Spark's native form is a
pandas UDF of type Series → scalar used inside ``groupBy().agg()`` —
Arrow ships each group's column to Python once, the kernel reduces it
vectorized, and Catalyst treats the result like any aggregate column.

Caveat vs built-in aggregates: GROUPED_AGG has **no partial (map-side)
aggregation** — every group's raw values shuffle to one reducer.  So:
only reach for it when the reduction genuinely isn't expressible with
built-ins, and keep group cardinality high / group size moderate at
scale.  Both demo kernels here are *also* expressible with built-ins
(exp∘avg∘ln), which is exactly what lets the DuckDB oracle hash-verify
the UDAF path; the docstrings show the built-in rewrite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


def _geomean_kernel(v: pd.Series) -> float:
    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


def _rms_kernel(v: pd.Series) -> float:
    x = v.to_numpy(dtype="float64")
    return float(np.sqrt((x * x).mean()))


def geometric_mean(col):
    """Geometric mean of a positive column (log-space for stability).
    Built-in rewrite: ``exp(avg(ln(v)))``.  Built lazily — pandas_udf
    resolves its return type against the active SparkSession."""
    return F.pandas_udf(_geomean_kernel, "double")(col)


def root_mean_square(col):
    """RMS — built-in rewrite: ``sqrt(avg(v*v))``."""
    return F.pandas_udf(_rms_kernel, "double")(col)


def _count_kernel(v: pd.Series) -> int:
    return int(len(v))


def count_agg(col):
    """Count as a pandas UDAF — exists because Spark disallows mixing
    GROUPED_AGG pandas UDFs with built-in aggregates in one agg();
    a UDAF-only aggregation needs its own count."""
    return F.pandas_udf(_count_kernel, "long")(col)


def sql_geometric_mean(col: str) -> str:
    return f"exp(avg(ln({col})))"


def sql_root_mean_square(col: str) -> str:
    return f"sqrt(avg({col} * {col}))"
