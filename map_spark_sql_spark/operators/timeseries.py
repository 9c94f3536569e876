"""Time-series regularization: fixed-grid resample with gap fill (LOCF).

Event streams are irregular; training pipelines and rollup dashboards want a
dense per-key grid (one row per key per bucket) with missing buckets filled
by the last observation (LOCF — last observation carried forward).

Plan shape (one wide shuffle on the key, everything else key-local):
1. bucket aggregate: groupBy(key, date_trunc(unit, ts)) — the only
   fact-table-sized shuffle, keyed on (key, bucket);
2. per-key bounds: groupBy(key) min/max bucket — re-uses the same hash
   partitioning (Catalyst plans it as a partial agg over stage 1's output);
3. grid: ``sequence(lo, hi, interval)`` + ``explode`` — generated
   executor-side from the *bounds* table (|keys| rows, not |events|), so the
   fan-out costs |keys| x buckets rows with zero extra shuffle;
4. left join grid<-agg on (key, bucket) — both sides already keyed;
5. LOCF: ``last(v, ignorenulls=True)`` over (partition by key, order by
   bucket, rows unbounded preceding..current) — sort is per-key, within the
   join's partitioning.

At 100 TB the dominant term is step 1 (a plain partial+final count/sum).
The grid explode is bounded by key-cardinality x horizon; for a whale key
horizon (years of minutes), cap with a coarser unit or split the horizon.

Reference parity: no time/date functions exist in the reference at all
(SURVEY.md §1.2); this is a north-star extension operator (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
) -> DataFrame:
    """Dense (key, bucket) grid between each key's first and last event,
    sum(value) per bucket, gaps carried forward. Returns
    (key, bucket, v_filled, observed)."""
    agg = (
        df.groupBy(key_col, F.date_trunc(unit, F.col(ts_col)).alias("bucket"))
        .agg(F.round(F.sum(value_col), 4).alias("v"))
    )
    bounds = agg.groupBy(key_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {unit.upper()}"))
        ).alias("bucket"),
    )
    joined = grid.join(agg, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNotNull().cast("int").alias("observed"),
    )


def resample_locf_oracle(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    where: str | None = None,
) -> str:
    """DuckDB twin: generate_series grid + IGNORE NULLS last_value window."""
    cond = f"WHERE {where}" if where else ""
    return f"""
WITH agg AS (
  SELECT {key_col}, date_trunc('{unit}', {ts_col}) AS bucket,
         round(sum({value_col}), 4) AS v
  FROM {table} {cond}
  GROUP BY {key_col}, date_trunc('{unit}', {ts_col})
),
bounds AS (SELECT {key_col}, min(bucket) AS lo, max(bucket) AS hi FROM agg GROUP BY {key_col}),
grid AS (
  SELECT {key_col}, unnest(generate_series(lo, hi, INTERVAL 1 {unit.upper()})) AS bucket
  FROM bounds
)
SELECT g.{key_col}, g.bucket,
       last_value(a.v IGNORE NULLS) OVER (
         PARTITION BY g.{key_col} ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
       CAST(a.v IS NOT NULL AS INTEGER) AS observed
FROM grid g LEFT JOIN agg a ON a.{key_col} = g.{key_col} AND a.bucket = g.bucket
"""


def trailing_range_stats(
    df: DataFrame,
    part_col: str,
    ts_us_col: str,
    int_col: str,
    range_us: int,
    n_col: str = "n_trailing",
    sum_col: str = "sum_trailing",
) -> DataFrame:
    """Trailing time-RANGE window features: for every row, the count and
    integer sum of ``int_col`` over the same key's rows in
    ``[ts - range_us, ts]`` (inclusive both ends — RANGE frames take all
    peers of a tied timestamp, in every engine). The bread-and-butter
    rolling-feature primitive ("events in the last hour", "spend in the
    last day") feature stores compute per entity.

    Plan shape: ONE hash partition on the key + per-key sort — Spark's
    WindowExec keeps a sliding frame pointer over the sorted run, so cost
    is O(rows log run) per key with no self-join fan-out (the naive
    ``e1 JOIN e2 ON key AND ts BETWEEN`` quadruples on hot keys and
    re-shuffles twice). Whale keys are bounded by the per-key sort spill,
    not memory. ``int_col`` must already be integer-typed (sum order over
    doubles is partition-dependent; integer sums are order-free, which is
    what makes the result hash-stable across engines).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(ts_us_col)
        .rangeBetween(-int(range_us), 0)
    )
    return df.withColumn(
        n_col, F.count(F.lit(1)).over(w).cast("bigint")
    ).withColumn(sum_col, F.sum(int_col).over(w).cast("bigint"))
