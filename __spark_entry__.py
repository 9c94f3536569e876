"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (map-key fan-out -> stats -> threshold, the
reference's ``mapKeyExceedingThreshold`` at ``MapBuilder.java:180-206``);
``queries``/``oracle_sql`` expose every implemented operator from SURVEY.md §2
with DuckDB twins (see map_spark_sql_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from map_spark_sql_spark.queries import QUERIES

    return QUERIES["mapkeys_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from map_spark_sql_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from map_spark_sql_spark.queries import ORACLES

    return dict(ORACLES)
