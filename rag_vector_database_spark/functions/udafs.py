"""Custom aggregate (UDAF) surface: pandas GROUPED_AGG UDFs.

NOTE: no ``from __future__ import annotations`` here — pandas-UDF eval
type inference reads the REAL type hints (pd.Series -> scalar selects
the grouped-agg eval type); postponed annotations stringify them and
break inference.
"""

import pandas as pd

from pyspark.sql import functions as F


def weighted_mean_long():
    """Integer weighted mean: sum(x*w) // sum(w), all int64 — exact, so
    the custom-UDAF surface stays inside the value-hash oracle gate."""

    @F.pandas_udf("long")
    def wmean(x: pd.Series, w: pd.Series) -> float:
        import numpy as np
        xi = x.to_numpy(dtype=np.int64)
        wi = w.to_numpy(dtype=np.int64)
        return int((xi * wi).sum() // wi.sum())

    return wmean
