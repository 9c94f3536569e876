"""Sequence packing: assign documents to fixed-size training sequences.

LLM pretraining consumes a corpus as concat-and-chunk: documents are laid
end-to-end in a deterministic order and the token stream is cut into
fixed-length sequences; a document can straddle a cut. The operator maps
every document to the chunk(s) it lands in:

    (doc_id, n_tokens, chunk_id, tok_offset, take)

``tok_offset`` = the document's token position within ``chunk_id``; ``take`` =
how many of its tokens land there. A document longer than the residual
space of its first chunk emits one row per touched chunk; Σ take = the
document's token count, and every chunk except the last is exactly full.

100 TB shape — the global prefix sum is the crux. A plain
``sum() OVER (ORDER BY id)`` window has no PARTITION BY, which Spark plans
as a SINGLE-partition window — a non-starter at scale. Instead the
classic two-phase distributed scan:

1. range-repartition by the ordering key (so partition p holds a
   contiguous id range), cumsum WITHIN each partition (parallel windows),
2. aggregate one partial sum per partition (num_partitions rows — a
   bounded driver collect, same contract as the reference's S11 bounded
   stats collect), broadcast the exclusive per-partition offsets back, and
   add.

The chunk fan-out is then row-local arithmetic + ``sequence`` explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from map_spark_sql_spark.operators.text import token_counts_sql

DEFAULT_CHUNK = 512


def _ws_token_count_sql(text: str, d: str) -> str:
    """Whitespace token count — the packing currency (cheap, dialect-shared)."""
    return token_counts_sql(text, d)["n_ws_tokens"]


def global_running_sum(
    df: DataFrame,
    sum_col: str,
    order_cols: list,
    out_col: str = "_run_end",
) -> DataFrame:
    """Two-phase distributed running sum over a global order — the scalable
    replacement for ``sum() OVER (ORDER BY ...)`` with no PARTITION BY
    (which Spark plans as a SINGLE-partition window, a non-starter at
    100 TB). Appends ``out_col`` = the INCLUSIVE running sum of ``sum_col``
    in ``order_cols`` order:

    1. range-repartition on ``order_cols`` (partition p holds a contiguous
       key range; sort direction is honored, so ``F.col(x).desc()`` works),
       cumsum WITHIN each partition via parallel windows;
    2. collect one partial sum per partition (bounded driver collect,
       |rows| = partition count — the reference's S11 contract), fold into
       exclusive per-partition offsets, broadcast back as a CASE column.

    The eager ``localCheckpoint`` pins ONE physical layout:
    ``repartitionByRange`` picks boundaries by sampling, so without it the
    phase-2 collect job and the output job could each evaluate the lineage
    with different partition ids, silently mis-applying the offsets (task
    retries / AQE replan).
    """
    parted = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = parted.withColumn(
        "_local_end", F.sum(sum_col).over(w)
    ).localCheckpoint(eager=True)

    partials = {
        r["_pid"]: r["_sum"]
        for r in local.groupBy("_pid").agg(F.max("_local_end").alias("_sum")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(partials):
        offsets[pid] = acc
        acc += partials[pid]
    offset_col = F.coalesce(
        *[
            F.when(F.col("_pid") == pid, F.lit(off))
            for pid, off in sorted(offsets.items())
        ],
        F.lit(0),
    ) if offsets else F.lit(0)
    return local.withColumn(out_col, F.col("_local_end") + offset_col).drop(
        "_pid", "_local_end"
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = DEFAULT_CHUNK,
) -> DataFrame:
    """Concat-and-chunk packing over ``id_col`` order (deterministic)."""
    counted = docs.select(
        F.col(id_col),
        F.expr(_ws_token_count_sql(text_col, "spark")).cast("long").alias("n_tokens"),
    )

    run = global_running_sum(counted, "n_tokens", [F.col(id_col)])
    spans = run.select(
        id_col,
        "n_tokens",
        (F.col("_run_end") - F.col("n_tokens")).alias("_start"),
    )

    # row-local chunk fan-out: doc spans tokens [_start, _start + n_tokens)
    first = F.floor(F.col("_start") / chunk_tokens)
    last = F.floor((F.col("_start") + F.col("n_tokens") - 1) / chunk_tokens)
    exploded = spans.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        "_start",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    chunk_lo = F.col("chunk_id") * chunk_tokens
    chunk_hi = chunk_lo + chunk_tokens
    take = F.least(F.col("_start") + F.col("n_tokens"), chunk_hi) - F.greatest(
        F.col("_start"), chunk_lo
    )
    return exploded.select(
        id_col,
        "n_tokens",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.greatest(F.col("_start"), chunk_lo) - chunk_lo).cast("long").alias("tok_offset"),
        take.cast("long").alias("take"),
    )


def pack_sequences_oracle(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = DEFAULT_CHUNK,
) -> str:
    """DuckDB twin: plain global cumsum window (single-node, so the
    distributed-scan decomposition is unnecessary) + generate_series chunk
    fan-out."""
    n = _ws_token_count_sql(text, "duckdb")
    return f"""
WITH counted AS (
  SELECT {id_col}, CAST({n} AS BIGINT) AS n_tokens FROM {table}
),
spans AS (
  SELECT {id_col}, n_tokens,
         sum(n_tokens) OVER (ORDER BY {id_col}) - n_tokens AS _start
  FROM counted
),
exploded AS (
  SELECT {id_col}, n_tokens, _start,
         unnest(generate_series(
           CAST(floor(_start / {chunk_tokens}) AS BIGINT),
           CAST(floor((_start + n_tokens - 1) / {chunk_tokens}) AS BIGINT)
         )) AS chunk_id
  FROM spans WHERE n_tokens > 0
)
SELECT {id_col}, n_tokens, chunk_id,
       CAST(greatest(_start, chunk_id * {chunk_tokens})
            - chunk_id * {chunk_tokens} AS BIGINT) AS tok_offset,
       CAST(least(_start + n_tokens, chunk_id * {chunk_tokens} + {chunk_tokens})
            - greatest(_start, chunk_id * {chunk_tokens}) AS BIGINT) AS take
FROM exploded
"""


def select_token_budget(
    docs: DataFrame,
    token_budget: int = 8000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ranked corpus selection under a token budget: rank documents
    by the integer-exact quality classifier (descending, id tiebreak) and
    keep the prefix whose cumulative whitespace-token count fits
    ``token_budget`` — the greedy "best docs until the budget runs out"
    selection step of pretraining-data curation (the budget knob of
    mixture building, applied corpus-wide instead of per-source).

    Scale shape: one scan computes (logit, n_tokens) scan-locally; the
    global running sum in quality order is :func:`global_running_sum`'s
    two-phase distributed scan (range repartition on the quality key +
    bounded per-partition offset collect) — no single-partition window
    anywhere. The final budget predicate is row-local. NULL texts are
    excluded up front (no rankable score).

    Output: ``(doc_id, quality_logit, n_tokens, cum_tokens)`` for the kept
    prefix, ``cum_tokens`` inclusive.
    """
    from map_spark_sql_spark.operators.text import quality_classifier_sql

    scored = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.expr(quality_classifier_sql(text_col, "spark")).alias("quality_logit"),
        F.expr(_ws_token_count_sql(text_col, "spark")).cast("long").alias("n_tokens"),
    )
    run = global_running_sum(
        scored, "n_tokens", [F.col("quality_logit").desc(), F.col(id_col)],
        out_col="cum_tokens",
    )
    return run.filter(F.col("cum_tokens") <= token_budget).select(
        id_col, "quality_logit", "n_tokens", "cum_tokens"
    )


def select_token_budget_oracle(
    token_budget: int = 8000,
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: plain global cumsum window in quality order."""
    from map_spark_sql_spark.operators.text import quality_classifier_sql

    logit = quality_classifier_sql(text, "duckdb")
    n = _ws_token_count_sql(text, "duckdb")
    return f"""
WITH scored AS (
  SELECT {id_col}, {logit} AS quality_logit, CAST({n} AS BIGINT) AS n_tokens
  FROM {table} WHERE {text} IS NOT NULL),
run AS (
  SELECT {id_col}, quality_logit, n_tokens,
         sum(n_tokens) OVER (ORDER BY quality_logit DESC, {id_col}) AS cum_tokens
  FROM scored)
SELECT {id_col}, quality_logit, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM run WHERE cum_tokens <= {token_budget}
"""


def select_token_budget_per_source(
    docs: DataFrame,
    budget_per_source: int = 700,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source (stratified) budget selection: the best-quality prefix of
    EACH source under that source's token budget — how curation applies a
    mixture's per-source budgets after :func:`temperature weighting
    <map_spark_sql_spark.operators.mixture.temperature_mixture>` decides
    them.

    Deliberate contrast with the corpus-wide :func:`select_token_budget`:
    a PER-SOURCE cumulative sum has a natural PARTITION BY, so the plain
    window is already parallel (one hash shuffle on source, per-partition
    sorts) and the two-phase distributed scan is unnecessary. A whale
    source's sort can still be salted like any per-key window
    (``skew.salted_topk`` pattern) — but the budget predicate needs the
    true in-order prefix, so the simple form stays until a profiled whale
    forces the shard.

    Output: ``(source, doc_id, quality_logit, n_tokens, cum_tokens)``.
    """
    from map_spark_sql_spark.operators.text import quality_classifier_sql

    scored = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(source_col),
        F.col(id_col),
        F.expr(quality_classifier_sql(text_col, "spark")).alias("quality_logit"),
        F.expr(_ws_token_count_sql(text_col, "spark")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy(source_col).orderBy(
        F.col("quality_logit").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_per_source)
        .select(source_col, id_col, "quality_logit", "n_tokens", "cum_tokens")
    )


def select_token_budget_per_source_oracle(
    budget_per_source: int = 700,
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> str:
    from map_spark_sql_spark.operators.text import quality_classifier_sql

    logit = quality_classifier_sql(text, "duckdb")
    n = _ws_token_count_sql(text, "duckdb")
    return f"""
WITH scored AS (
  SELECT {source_col}, {id_col}, {logit} AS quality_logit,
         CAST({n} AS BIGINT) AS n_tokens
  FROM {table} WHERE {text} IS NOT NULL),
run AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY {source_col}
                                ORDER BY quality_logit DESC, {id_col}) AS cum_tokens
  FROM scored)
SELECT {source_col}, {id_col}, quality_logit, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM run WHERE cum_tokens <= {budget_per_source}
"""
