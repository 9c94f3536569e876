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
