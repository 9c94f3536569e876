"""Runtime join prefilters: prune the fact-side *scan* from the dim side.

Catalyst's InjectRuntimeFilter (``spark.sql.optimizer.runtime.bloomFilter.
enabled``, on by default) adds a bloom-filter semi-join below shuffle joins,
but it filters *post-scan* rows. For a 100 TB fact table the bigger win is
pruning at the **scan** (parquet row-group statistics / dictionary filters),
which needs a *concrete* predicate at plan time. These helpers compute one
from the (filtered) dim side with a bounded driver collect — the same
driver-mediated routing the reference uses for its threshold split
(MapBuilder.java:199-205, a collected set shipped back into the plan):

- ``prefilter_minmax``: collect 2 scalars (min/max of the dim join key),
  inject ``fact.key BETWEEN lo AND hi``. Always safe; prunes whole
  row groups whenever key ranges correlate with file layout (sorted /
  Z-ordered sinks — see ``functions/zorder.py``).
- ``prefilter_inlist``: if the dim side has few distinct keys, inject an
  IN-list (parquet dictionary-level pruning); above the cap, fall back to
  min/max. Cap bounds driver memory exactly like the reference's
  `largeMapKeys` set.

Both return the fact DataFrame *pre-filtered but not joined* — compose with
the actual join; semantics are identical with or without the prefilter
(superset guarantee), so correctness oracles are the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefilter_minmax(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str) -> DataFrame:
    """Inject [min, max] of ``dim_key`` as a scan predicate on ``fact``."""
    row = dim.agg(F.min(dim_key).alias("lo"), F.max(dim_key).alias("hi")).collect()[0]
    if row["lo"] is None:  # empty dim side -> empty join
        return fact.filter(F.lit(False))
    return fact.filter(F.col(fact_key).between(F.lit(row["lo"]), F.lit(row["hi"])))


def prefilter_inlist(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    max_keys: int = 10_000,
) -> DataFrame:
    """Inject an IN-list when the dim key set is small; else min/max.

    The key-count probe and the key collect are one job each on the
    (already filtered, hence small) dim side — bounded, like the
    reference's driver-collected stats (SURVEY.md §2.1 S11).
    """
    keys = [
        r[0] for r in dim.select(dim_key).distinct().limit(max_keys + 1).collect()
    ]
    if len(keys) > max_keys:
        return prefilter_minmax(fact, dim, fact_key, dim_key)
    if not keys:
        return fact.filter(F.lit(False))
    return fact.filter(F.col(fact_key).isin(keys))
