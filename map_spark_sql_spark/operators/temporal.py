"""Temporal join operators: as-of join and interval/range join.

The reference has no joins at all (SURVEY.md §2.3); these are north-star
extension operators in the custom-operator family the build brief calls out
(as-of join, range join) — implemented as compositions of existing DataFrame
ops, per the (a)-path of the custom-operator ladder (composition before
Pandas UDF before mapPartitions).

**As-of join** (``left`` row matched to the latest ``right`` row with
``right.ts <= left.ts`` per key) is built on the union + ordered-window
``last(ignorenulls)`` formulation rather than a join:

- one shuffle, keyed by the join key (the union is shuffle-free);
- no range predicate in a join condition (which Spark would execute as a
  broadcast-nested-loop or a sort-merge with per-row scan-back);
- at 100 TB both sides stream through one sort per partition-key group —
  the same shape Spark uses for window functions, with well-understood
  spill behavior. Skewed keys salt the same way any window op does.

The DuckDB oracle uses native ``ASOF LEFT JOIN`` — an independent
implementation of the same semantics, which makes the correctness check a
cross-engine differential test of the window formulation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Match each left row to the most recent right row at-or-before its
    timestamp, per join key.

    Returns all left columns plus ``{prefix}{col}`` for each
    ``right_payload`` column and ``{prefix}ts`` (null when no right row
    precedes). Ties on the timestamp resolve to the right row with the
    greatest payload struct (deterministic; irrelevant when ``(key, ts)`` is
    unique on the right, the common case).
    """
    keys = [on] if isinstance(on, str) else list(on)

    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_payload]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType))

    # right rows sort before left rows at an equal timestamp -> inclusive <=
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__side"), F.col("__p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r.select(*l.columns))
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out.append(F.col("__m.__ts").alias(f"{prefix}ts"))
    out += [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_payload]
    return matched.select(*out)


def interval_band_join(
    df: DataFrame,
    bands: Sequence[tuple[str, float, float]],
    value_col: str,
    band_col: str = "band",
) -> DataFrame:
    """Range join of rows to [lo, hi) literal bands via a broadcast inequality
    join — the band table is tiny by definition, so Catalyst plans a
    broadcast-nested-loop over it, which is a map-side O(rows x bands) pass,
    not a shuffle."""
    spark = df.sparkSession
    band_df = spark.createDataFrame(
        [(b, float(lo), float(hi)) for b, lo, hi in bands], f"{band_col} string, lo double, hi double"
    )
    cond = (F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi"))
    return df.join(F.broadcast(band_df), cond).drop("lo", "hi")


def explode_interval_bins(
    df: DataFrame, start_col: str, end_col: str, bin_seconds: int
) -> DataFrame:
    """Explode each closed interval into the coarse time bins it touches
    (``_bin`` = floor(truncated-unix-seconds / bin_seconds), one row per
    covered bin). The building block of :func:`interval_overlap_join`,
    public so its fan-out and bin population are observable BEFORE running
    the join (compose with ``skew.key_skew_report`` over ``(key, _bin)``
    to find hot bins / whale intervals and size ``bin_seconds``)."""
    w = int(bin_seconds)
    return df.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    )



def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_l: str,
    end_l: str,
    start_r: str,
    end_r: str,
    keys: Sequence[str] = (),
    bin_seconds: int = 600,
) -> DataFrame:
    """Big x big interval-overlap join via time binning — the range-join
    case :func:`interval_band_join` cannot handle (neither side is
    broadcastable, so Catalyst's only native plan for a pure inequality
    condition is a broadcast-nested-loop or a cartesian product).

    Both sides explode each CLOSED interval ``[start, end]`` into the
    coarse time bins it touches (``sequence(floor(us/w), floor(ue/w))``
    over truncated unix seconds), equi-join on ``(*keys, bin)``, then
    filter the exact overlap predicate ``start_l <= end_r AND start_r <=
    end_l``. A pair sharing n bins would match n times, so each pair is
    emitted ONLY in its owner bin — ``floor(unix(greatest(start_l,
    start_r))/w)``, the first bin where both intervals are live — which
    makes the join exactly-once without a distinct (no second shuffle).
    Truncated-seconds binning is safe because flooring is monotone: the
    owner bin is always inside both explode ranges; exactness comes from
    the full-precision timestamp filter, never from the bins.

    Scale shape: per-row fan-out is ``len(interval)/bin_seconds + 1``, so
    pick ``bin_seconds`` near the P95 interval length (fan-out ~2); ONE
    shuffle keyed by ``(*keys, bin)`` — time bins distribute uniformly by
    construction, and an equi-key (tenant, user) co-partitions further.
    There is no quadratic stage: bin population bounds candidate pairs the
    same way LSH buckets bound near-dup candidates.
    """
    w = int(bin_seconds)
    l = explode_interval_bins(left, start_l, end_l, w).alias("l")
    r = explode_interval_bins(right, start_r, end_r, w).alias("r")
    on = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys] + [
        F.col("l._bin") == F.col("r._bin")
    ]
    owner = (
        F.unix_timestamp(F.greatest(F.col(f"l.{start_l}"), F.col(f"r.{start_r}"))) / w
    ).cast("long")
    out = (
        l.join(r, on)
        .filter(
            (F.col(f"l.{start_l}") <= F.col(f"r.{end_r}"))
            & (F.col(f"r.{start_r}") <= F.col(f"l.{end_l}"))
            & (F.col("l._bin") == owner)
        )
    )
    lcols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    rcols = [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}")
        for c in right.columns
        if c not in keys
    ]
    return out.select(*lcols, *rcols)
