"""Approximate-sketch aggregates (north-star surface).

At 100 TB, exact ``count(DISTINCT ...)`` is a full shuffle of every distinct
value and exact percentiles are a global sort; the sketch versions are
fixed-size mergeable state (HyperLogLog++ registers, GK quantile summaries)
computed map-side and merged in one narrow reduce — the only viable shape at
scale. Spark's built-ins are deterministic for a fixed input and rsd, but
not reproducible in other engines, so the contract query is rows-only; the
error bound against the exact answer is pinned by unit test instead
(tests/test_operators.py::TestSketches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_stats(
    df: DataFrame,
    group_col: str = "event_type",
    distinct_col: str = "user_id",
    value_col: str = "value",
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group HLL++ distinct estimate and approximate quantiles, with the
    exact distinct count alongside so the estimation error is visible in the
    result itself."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(distinct_col, rsd).alias("n_distinct_approx"),
        F.countDistinct(distinct_col).alias("n_distinct_exact"),
        F.percentile_approx(value_col, [0.5, 0.9, 0.99], 10_000).alias("value_quantiles"),
        F.count(F.lit(1)).alias("n_rows"),
    )
