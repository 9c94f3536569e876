"""Skew-mitigation helpers for whale keys.

The engine's canonical whale is the ``"0:0"`` ALL map key: every input record
carries it (``MapKeysUDF.java:115``), so any per-key *list* aggregation (A6:
``collect_list`` per view) funnels the whole table through one reducer for
that key. Plain counts/sums don't need this — partial aggregation already
caps them — but ``collect_list``/``collect_set`` have no map-side combine
benefit for a single giant group.

``salted_collect_list`` is the standard two-phase fix: salt the group key
into ``buckets`` sub-groups (phase 1 collects per (key, salt) — the whale
splits across ``buckets`` reducers), then concatenate the partial lists per
key (phase 2 moves ``buckets`` rows per key, not N). Order within the result
is nondeterministic, exactly like plain ``collect_list`` — sort downstream
if order matters (the pipeline sorts feature lists at encode time anyway).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_collect_list(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    out_col: str = "items",
    buckets: int = 16,
) -> DataFrame:
    """Two-phase collect_list keyed by ``keys``, skew-split over ``buckets``.

    Equivalent (as a multiset) to
    ``df.groupBy(*keys).agg(collect_list(value))`` with the whale-key
    reducer bottleneck removed.
    """
    value_col = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(value_col.cast("string")), F.lit(buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.collect_list(value_col).alias("_part")
    )
    return partial.groupBy(*keys).agg(
        F.flatten(F.collect_list("_part")).alias(out_col)
    )


def key_skew_report(
    df: DataFrame, key_col: str, id_alias: str = "key"
) -> DataFrame:
    """Key-cardinality skew profile: per power-of-two group-size bucket,
    how many distinct keys land there and how much row mass they carry —
    the diagnostic you run BEFORE choosing a salting/broadcast strategy
    for a 100 TB shuffle (a whale key shows up as a lonely high bucket
    holding most of the mass).

    The bucket is ``floor(log2(count))`` computed as binary-digit length
    (``length(bin(n)) - 1``) — exact integer arithmetic, no float log to
    disagree at power-of-two boundaries. Scale shape: one shuffle for the
    per-key counts (map-side combined), then a tiny bucket rollup.

    Output: ``(bucket, n_keys, n_rows, max_count)``.
    """
    per_key = df.groupBy(F.col(key_col).alias(id_alias)).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_key.withColumn(
            "bucket", (F.length(F.expr("bin(cnt)")) - 1).cast("int")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.max("cnt").cast("long").alias("max_count"),
        )
    )


def key_skew_report_oracle(table: str, key_col: str) -> str:
    # subquery form (not WITH) so callers can embed it after their own CTE
    # prelude (queries._oracle already opens a WITH chain)
    return f"""
SELECT CAST(length(bin(cnt)) - 1 AS INTEGER) AS bucket,
       count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(max(cnt) AS BIGINT) AS max_count
FROM (
  SELECT {key_col} AS key, count(*) AS cnt FROM {table} GROUP BY {key_col}
) per_key GROUP BY bucket
"""


def salted_topk(
    df: DataFrame,
    keys: Sequence[str],
    score_col: str,
    id_col: str,
    k: int,
    buckets: int = 8,
) -> DataFrame:
    """Per-key top-k with the whale-key sort sharded (the window twin of
    :func:`salted_collect_list`).

    A plain ``row_number() OVER (PARTITION BY key ORDER BY score)`` sends a
    whale key's entire row mass through ONE reducer's sort. Phase 1 here
    ranks within ``(key, md5-salt-of-id)`` — each of ``buckets`` shards
    sorts ~1/buckets of the whale — and keeps ``k`` per shard (the global
    per-key top-k is always contained in the union of per-shard top-k's);
    phase 2 re-ranks the <= buckets*k survivors per key, a bounded set.
    Deterministic: ties break on the lower ``id_col`` in both phases.

    Use case: per-domain document caps ("keep at most k docs per domain,
    best quality first") — a standard curation stage where domains are
    exactly the skewed key (one crawl domain can be 10% of a dump).

    Output: the input columns of ``keys`` + ``id_col`` + ``score_col`` +
    ``rank`` (1-based).
    """
    from pyspark.sql import Window

    from map_spark_sql_spark.operators.sampling import hash_bucket_sql

    salt = F.expr(hash_bucket_sql(id_col, "spark", buckets))
    w1 = Window.partitionBy(*keys, "_salt").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (
        df.select(*keys, id_col, score_col)
        .withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
