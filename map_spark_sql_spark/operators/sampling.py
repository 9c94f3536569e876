"""Deterministic sampling / dataset-split operators (north-star surface).

A training-data pipeline needs reproducible train/val/test splits that are
(a) stable across runs and engines, (b) computed row-local with no shuffle,
and (c) independent of row order and partitioning. ``rand(seed)`` fails (a)
and (c) — it depends on partition layout — so the split key is a content
hash: the first 8 hex chars of md5(id) mapped to an integer bucket 0..99.
md5 is bit-identical across Spark, DuckDB, and every other engine, which is
what makes the oracle (and any future backfill in another system) agree.

At 100 TB this is a pure map-side projection: no shuffle, no driver state,
and the split predicate pushes into the scan when materialized as a
partition column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BOUNDS = (80, 90)  # train < 80 <= val < 90 <= test


def hash_bucket_sql(id_expr: str, d: str, buckets: int = 100) -> str:
    """0..buckets-1 bucket from the md5 of the id — dialect-shared semantics."""
    if d == "spark":
        return (
            f"CAST(conv(substring(md5(CAST({id_expr} AS STRING)), 1, 8), 16, 10) "
            f"AS BIGINT) % {buckets}"
        )
    return (
        f"CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)) AS BIGINT) "
        f"% {buckets}"
    )


def split_label_sql(id_expr: str, d: str, bounds: tuple[int, int] = DEFAULT_BOUNDS) -> str:
    b = hash_bucket_sql(id_expr, d)
    lo, hi = bounds
    return (
        f"CASE WHEN {b} < {lo} THEN 'train' "
        f"WHEN {b} < {hi} THEN 'val' ELSE 'test' END"
    )


def hash_split(
    df: DataFrame, id_col: str = "doc_id", bounds: tuple[int, int] = DEFAULT_BOUNDS
) -> DataFrame:
    """Attach ``bucket`` and ``split`` columns — row-local, shuffle-free."""
    return df.withColumn(
        "bucket", F.expr(hash_bucket_sql(id_col, "spark"))
    ).withColumn("split", F.expr(split_label_sql(id_col, "spark", bounds)))
