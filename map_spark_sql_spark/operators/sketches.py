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


def sketch_bound_verdicts(
    df: DataFrame,
    group_col: str = "event_type",
    distinct_col: str = "user_id",
    value_col: str = "value",
    rsd: float = 0.05,
    quantile_slack: float = 0.02,
) -> DataFrame:
    """Per-group sketch ERROR-BOUND verdicts — the engine-portable face of
    :func:`sketch_stats`.

    Sketch internals (HLL++ registers, GK summaries) aren't reproducible
    across engines, but the bounds they promise are: this emits, per group,

    - ``hll_within_bound``: |approx_distinct − exact| / exact ≤ 3·rsd
      (HLL++'s standard-error guarantee at 3σ),
    - ``qXX_within_bound``: the GK estimate of quantile p lies between the
      EXACT quantiles at p±``quantile_slack`` (rank-error form of the GK
      guarantee; accuracy 10 000 ⇒ rank error 1e-4, so the slack is wide),
    - ``n_rows``: exact group size (hash-checked for free).

    A DuckDB oracle emits the same rows with literal TRUE verdicts, so the
    driver's hash gate certifies the bounds themselves. The exact
    distinct/percentile references make this a verification query — at
    100 TB you'd run it on a sampled slice beside the sketch job, not on
    the full corpus; the sketch operator itself stays the scale path.
    """
    probes = [0.5, 0.9, 0.99]
    lo = [max(0.0, p - quantile_slack) for p in probes]
    hi = [min(1.0, p + quantile_slack) for p in probes]
    agg = df.groupBy(group_col).agg(
        F.approx_count_distinct(distinct_col, rsd).alias("_approx"),
        F.countDistinct(distinct_col).alias("_exact"),
        F.percentile_approx(value_col, probes, 10_000).alias("_q"),
        F.expr(f"percentile({value_col}, array({','.join(map(str, lo))}))").alias("_qlo"),
        F.expr(f"percentile({value_col}, array({','.join(map(str, hi))}))").alias("_qhi"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    hll_ok = (
        F.abs(F.col("_approx") - F.col("_exact")) / F.col("_exact") <= 3 * rsd
    ).alias("hll_within_bound")
    q_ok = [
        (
            (F.col("_q")[i] >= F.col("_qlo")[i]) & (F.col("_q")[i] <= F.col("_qhi")[i])
        ).alias(f"q{int(p * 100)}_within_bound")
        for i, p in enumerate(probes)
    ]
    return agg.select(group_col, hll_ok, *q_ok, "n_rows")


def sketch_bound_verdicts_oracle(
    table: str = "events", group_col: str = "event_type"
) -> str:
    """DuckDB twin: the bounds HOLD, i.e. literal TRUE per verdict, plus the
    exact group size."""
    return f"""
SELECT {group_col}, TRUE AS hll_within_bound,
       TRUE AS q50_within_bound, TRUE AS q90_within_bound, TRUE AS q99_within_bound,
       count(*) AS n_rows
FROM {table} GROUP BY {group_col}
"""
