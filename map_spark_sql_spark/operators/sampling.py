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


def shuffle_shards(
    df: DataFrame, n_shards: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global shuffle into training shards.

    Training runs need the corpus in a pseudo-random order, materialized as
    N shards that loaders consume sequentially. A true global sort by
    ``rand()`` is neither reproducible nor scalable; instead each row gets
    a content-derived shard (md5 bucket — the same engine-portable rule as
    :func:`hash_split`) and a position within its shard by md5-hex order.

    Scale shape: ONE shuffle on the shard key; the per-shard ``row_number``
    windows run in parallel across shards (at 100 TB you set ``n_shards``
    to O(10k), so no window sees more than a shard's worth of rows and no
    single-partition sort exists anywhere). Because the md5 key is
    content-derived, re-running after corpus growth only perturbs order
    locally — the shard assignment of existing rows never changes.

    Output: ``(id, shard, pos)`` — ``pos`` is 1-based within the shard.
    """
    from pyspark.sql import Window

    shard = F.expr(hash_bucket_sql(id_col, "spark", n_shards)).cast("int")
    okey = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard").orderBy(okey.asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def shuffle_shards_oracle(
    n_shards: int = 32, table: str = "documents", id_col: str = "doc_id"
) -> str:
    b = hash_bucket_sql(id_col, "duckdb", n_shards)
    return f"""
SELECT {id_col}, CAST({b} AS INTEGER) AS shard,
       CAST(row_number() OVER (
         PARTITION BY {b}
         ORDER BY md5(CAST({id_col} AS VARCHAR)) ASC, {id_col} ASC
       ) AS BIGINT) AS pos
FROM {table}
"""


def ppm_bucket_sql(id_expr: str, d: str) -> str:
    """Per-million md5 bucket (the fine-grained twin of hash_bucket_sql,
    shared with the mixture operators' acceptance rule)."""
    return hash_bucket_sql(id_expr, d, buckets=1_000_000)


def weighted_sample(
    df: DataFrame,
    weight_sql: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-document weighted sampling: keep each row with
    probability equal to its weight in [0, 1] (clamped), decided by the
    row's md5 per-million bucket — no RNG, stable under re-runs, corpus
    growth, and engine moves, like every sampling op here.

    This is the per-DOCUMENT companion of ``mixture.mixture_sample``'s
    per-SOURCE ratios: quality-weighted downsampling ("keep good docs with
    higher probability") is a standard curation stage between the hard
    quality gate and the mixture step. ``weight_sql`` is a Spark SQL
    expression over the input columns (e.g. a quality score); rows with
    NULL weight drop (both engines exclude NULL comparisons).

    Scale shape: row-local projection + filter; no shuffle, pushdown-safe.
    Output: ``(id, weight_ppm)`` kept rows.
    """
    w = f"CAST(floor(least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE), {weight_sql})) * 1000000) AS BIGINT)"
    bucket = ppm_bucket_sql(id_col, "spark")
    return (
        df.withColumn("weight_ppm", F.expr(w))
        .filter(F.expr(f"{bucket} < weight_ppm"))
        .select(id_col, "weight_ppm")
    )


def weighted_sample_oracle(
    weight_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`weighted_sample` (``weight_sql`` in DuckDB
    dialect over the same columns)."""
    w = f"CAST(floor(least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE), {weight_sql})) * 1000000) AS BIGINT)"
    bucket = ppm_bucket_sql(id_col, "duckdb")
    return f"""
SELECT {id_col}, {w} AS weight_ppm
FROM {table}
WHERE {bucket} < {w}
"""
