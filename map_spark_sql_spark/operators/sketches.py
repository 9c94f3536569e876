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


# --- count-min heavy hitters --------------------------------------------------


def _cm_bucket_sql(key: str, j: int, width: int, d: str) -> str:
    """Row-j count-min bucket for a key expression: md5-derived, so BOTH
    engines compute the identical hash family (the property that upgrades
    this sketch from bound-verdict verification to a full hash gate)."""
    if d == "spark":
        return (
            f"CAST(conv(substring(md5(concat('{j}', ':', CAST({key} AS STRING))), 1, 8), 16, 10) "
            f"AS BIGINT) % {width}"
        )
    return (
        f"CAST(('0x' || substr(md5('{j}' || ':' || CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % {width}"
    )


def count_min_counters(
    df: DataFrame,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the count-min sketch counter table ``(j, bucket, cnt)`` —
    ``depth x width`` cells regardless of corpus size.

    This is THE fixed-size mergeable frequency state at 100 TB: the
    explode fans each row into ``depth`` (j, bucket) cells, the map-side
    partial aggregation collapses every partition to at most depth*width
    rows before the (only) shuffle, and merging two sketches is cell-wise
    addition — so the same counters work for streaming foreachBatch
    accumulation. No per-key state exists anywhere.
    """
    from map_spark_sql_spark.sources.readers import widen as _widen

    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(_cm_bucket_sql(key_col, j, width, "spark")).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    # widen: the md5 fan-out is CPU-bound per row; a one-file scan would
    # serialize it on a single task (no-op at real scale)
    return (
        _widen(df).select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_heavy_hitters(
    df: DataFrame,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 1024,
    k: int = 20,
) -> DataFrame:
    """Top-k heavy hitters by count-min estimate: ``est(key) = min over j
    of counter[j][h_j(key)]`` — never under the true count, over by at most
    ~e*N/width with high probability.

    The candidate keys here come from an exact per-key pass (which also
    yields ``exact_n``, making the overcount visible in the result); at
    100 TB the candidate set comes from a sample or a prior round instead,
    and the ESTIMATE path — broadcast of the depth*width counter table
    against the candidates — is unchanged. Ties and output order pin on
    (est desc, key).

    Output: ``(key, cm_est, exact_n, overcount)``.
    """
    counters = count_min_counters(df, key_col, depth, width)
    keys = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_n"))
    probes = keys.select(
        key_col,
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_cm_bucket_sql(key_col, j, width, "spark")).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "exact_n", "c.j", "c.bucket")
    est = (
        probes.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy(key_col, "exact_n")
        .agg(F.min("cnt").alias("cm_est"))
    )
    return (
        est.select(
            key_col,
            "cm_est",
            "exact_n",
            (F.col("cm_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.desc("cm_est"), F.asc(key_col))
        .limit(k)
    )


def count_min_heavy_hitters_oracle(
    table: str = "events",
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 1024,
    k: int = 20,
) -> str:
    """DuckDB twin rebuilding the IDENTICAL md5 hash family — counters,
    estimates, and ranking all hash-gate exactly."""
    cell_selects = " UNION ALL ".join(
        f"SELECT {j} AS j, {_cm_bucket_sql(key_col, j, width, 'duckdb')} AS bucket FROM {table}"
        for j in range(depth)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT {key_col}, exact_n, {j} AS j, "
        f"{_cm_bucket_sql(key_col, j, width, 'duckdb')} AS bucket FROM keys"
        for j in range(depth)
    )
    return f"""
WITH cells AS ({cell_selects}),
counters AS (SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY j, bucket),
keys AS (SELECT {key_col}, count(*) AS exact_n FROM {table} GROUP BY {key_col}),
probes AS ({probe_selects}),
est AS (
  SELECT p.{key_col}, p.exact_n, min(c.cnt) AS cm_est
  FROM probes p JOIN counters c USING (j, bucket)
  GROUP BY p.{key_col}, p.exact_n)
SELECT {key_col}, cm_est, exact_n, cm_est - exact_n AS overcount
FROM est ORDER BY cm_est DESC, {key_col} LIMIT {k}
"""


# --- Bloom-filter digest membership prefilter ----------------------------------


def _bloom_pos_sql(key: str, j: int, m: int, d: str) -> str:
    """Bit position j for a key expression — the count-min md5 hash family
    (``_cm_bucket_sql``) reused with the bloom's own salt prefix, so both
    engines compute the identical k positions and the whole operator is a
    full hash gate, not a bound verdict."""
    if d == "spark":
        return (
            f"CAST(conv(substring(md5(concat('bf{j}', ':', CAST({key} AS STRING))), 1, 8), 16, 10) "
            f"AS BIGINT) % {m}"
        )
    return (
        f"CAST(('0x' || substr(md5('bf{j}' || ':' || CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % {m}"
    )


def bloom_prefilter(
    standing: DataFrame,
    batch: DataFrame,
    k: int = 3,
    m: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter membership prefilter for batch-over-corpus dedup: build
    a k-hash Bloom filter over the STANDING corpus's content digests, probe
    every BATCH document against it, and report the exact truth alongside —
    ``(doc_id, bloom_hit, present, false_positive)``.

    Why this exists at 100 TB: ``incremental_dedup``'s anti join must
    shuffle the whole batch against the digest table every run. The Bloom
    filter is at most ``m`` set-bit rows (a few KB broadcast) REGARDLESS of
    standing-corpus size, so the probe is scan-local + tiny broadcast join,
    and only bloom-maybe rows (true members + false positives) need the
    exact digest join at all. Bloom guarantees no false negatives — a
    bloom-miss row is definitely new and skips the shuffle entirely. The
    ``present``/``false_positive`` columns keep the FP rate observable
    (no-silent-caps): sizing rule m >= ~14n bits for ~0.1% FP at k=3; an
    undersized filter degrades to "everything hits" visibly, never to a
    wrong dedup.

    Plan shape: one distinct-positions aggregate over the standing scan
    (<= m rows out), broadcast to the batch's exploded probe positions,
    one groupBy(doc) rollup, and one broadcast-able distinct-digest join
    for the exact flag. NULL-text rows are excluded on both sides (no
    digest to hash).

    Hash family: md5-derived positions (``_bloom_pos_sql``) — identical in
    both engines, so the output row set is engine-exact.
    """
    from map_spark_sql_spark.operators.dedup import content_hash

    s = standing.where(F.col(text_col).isNotNull()).select(
        content_hash(text_col).alias("_dg")
    )
    positions = F.array(
        *[F.expr(_bloom_pos_sql("_dg", j, m, "spark")) for j in range(k)]
    )
    bits = (
        s.select(F.explode(positions).alias("pos"))
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    b = batch.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), content_hash(text_col).alias("_dg")
    )
    probes = b.select(id_col, "_dg", F.explode(positions).alias("pos"))
    hits = (
        probes.join(F.broadcast(bits), "pos", "left")
        .groupBy(id_col, "_dg")
        .agg((F.sum(F.coalesce("_set", F.lit(0))) == k).alias("bloom_hit"))
    )
    known = s.distinct().withColumn("_known", F.lit(1))
    return (
        hits.join(known, hits["_dg"] == known["_dg"], "left")
        .select(
            F.col(id_col),
            F.col("bloom_hit"),
            F.col("_known").isNotNull().alias("present"),
            (F.col("bloom_hit") & F.col("_known").isNull()).alias("false_positive"),
        )
    )


def bloom_prefilter_oracle(
    standing_sql: str,
    batch_sql: str,
    k: int = 3,
    m: int = 65536,
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bloom_prefilter` — identical md5 hash family,
    identical set-bit construction. ``standing_sql``/``batch_sql`` yield
    relations with ``({id_col}, {text})``."""
    from map_spark_sql_spark.operators.dedup import content_hash_sql

    h = content_hash_sql(text, "duckdb")
    pos_exprs = ", ".join(_bloom_pos_sql("_dg", j, m, "duckdb") for j in range(k))
    return f"""
WITH s AS (SELECT {h} AS _dg FROM ({standing_sql}) st WHERE {text} IS NOT NULL),
bits AS (SELECT DISTINCT unnest([{pos_exprs}]) AS pos FROM s),
b AS (SELECT {id_col}, {h} AS _dg FROM ({batch_sql}) bt WHERE {text} IS NOT NULL),
probes AS (SELECT {id_col}, _dg, unnest([{pos_exprs}]) AS pos FROM b),
hits AS (
  SELECT p.{id_col}, p._dg,
         (count(*) FILTER (WHERE bi.pos IS NOT NULL)) = {k} AS bloom_hit
  FROM probes p LEFT JOIN bits bi ON p.pos = bi.pos
  GROUP BY p.{id_col}, p._dg),
known AS (SELECT DISTINCT _dg FROM s)
SELECT h.{id_col}, h.bloom_hit,
       kn._dg IS NOT NULL AS present,
       (h.bloom_hit AND kn._dg IS NULL) AS false_positive
FROM hits h LEFT JOIN known kn ON h._dg = kn._dg
"""
