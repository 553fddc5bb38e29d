"""Pandas UDAFs (GROUPED_AGG) — the user-defined aggregate surface.

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers the
UDF type from *evaluated* annotations; stringified ones fail with
UNSUPPORTED_SIGNATURE.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median per group (built-ins only offer approx percentile).
    pandas' interpolating median matches SQL median() exactly."""
    return float(v.median())
