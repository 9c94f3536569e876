"""Sinks.

The reference's sink is HBase bulk-load HFiles: rows keyed by a fixed-width
salt prefix are shuffled with a custom ``SaltPrefixPartitioner`` (one
partition per pre-split HBase region, ``SaltPrefixPartitioner.java:21-37``)
and sorted within each partition, as the HFile format requires
(``PointMapBuilder.java:93-116``, ``TileMapBuilder.java:181-200``, S7/X2/X3).

HBase itself is out of scope (SURVEY.md §2.1); the Spark-equivalent contract
we keep is **shuffle aligned to the sink**: ``repartition(modulus, salt)`` +
``sortWithinPartitions(key)`` + partitioned parquet. At 100 TB this matters
because it is the *only* full shuffle of the final stage and it replaces a
global sort — each salt bucket sorts independently and in parallel, exactly
like the reference's region-aligned HFile write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_salted_sorted(
    df: DataFrame,
    path: str,
    salt_col: str = "salt",
    key_col: str | tuple[str, ...] = "key",
    num_partitions: int | None = None,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Salt-partitioned, key-sorted parquet write (the HFile-shape sink).

    ``num_partitions`` defaults to the salt cardinality the caller chose
    (the reference uses ``10^saltDigits`` partitions so each partition maps
    1:1 onto an HBase region). ``key_col`` may be a tuple for composite sink
    orders — e.g. ``("mapKey", "zkey")`` with a Z-order key
    (functions/zorder.py) clusters spatially-adjacent tiles into adjacent
    file ranges, minimizing range reads for viewport scans.
    """
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    out = (
        df.repartition(int(parts), F.col(salt_col))
        .sortWithinPartitions(*keys)
        .write.mode(mode)
    )
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.parquet(path)
