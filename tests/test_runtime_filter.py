"""Runtime join-filter behavior: Catalyst's bloom-filter injection rule and
the engine's scan-level prefilter operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_spark_sql_spark.operators.runtime_filter import (
    prefilter_inlist,
    prefilter_minmax,
)
from map_spark_sql_spark.sources import load_table

SF = "/root/testdata/sf0.001"


class TestCatalystBloomInjection:
    def test_inject_runtime_filter_fires_on_shuffle_join(self, spark, tmp_path):
        """With size thresholds relaxed, InjectRuntimeFilter adds a
        might_contain(bloom_filter_agg(...)) semi-filter below the fact side
        of a shuffle join whose dim side is selectively filtered. At
        production scale the defaults (creation side <10MB, application scan
        >10GB) gate it; this pins that the engine's session leaves the rule
        ON and the plan shape Catalyst produces."""
        fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
        spark.range(0, 20000).withColumn("k", F.col("id") % 1000).write.parquet(fact_p)
        spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        ).write.parquet(dim_p)
        old = {
            "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold"
            ),
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
            ),
        }
        try:
            assert (
                spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
                == "true"
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                "0",
            )
            fact = spark.read.parquet(fact_p)
            dim = spark.read.parquet(dim_p).filter(F.col("grp") == 3)
            joined = fact.join(dim, "k")
            plan = joined._jdf.queryExecution().optimizedPlan().toString()
            assert "might_contain" in plan, plan
            assert joined.count() == 20 * 143  # 143 dim keys with grp==3
        finally:
            for key, val in old.items():
                spark.conf.set(key, val)


class TestScanPrefilters:
    def test_inlist_prefilter_semantics_and_pushdown(self, spark):
        fact = load_table(spark, SF, "lineitem")
        dim = load_table(spark, SF, "part").filter("p_size = 15")
        pre = prefilter_inlist(fact, dim, "l_partkey", "p_partkey", max_keys=10_000)
        plain = fact.join(
            dim.select(F.col("p_partkey").alias("l_partkey")).distinct(),
            "l_partkey",
            "left_semi",
        )
        assert sorted(map(tuple, pre.join(
            dim.select(F.col("p_partkey").alias("l_partkey")).distinct(),
            "l_partkey", "left_semi").collect())) == sorted(map(tuple, plain.collect()))
        # the injected IN-list is a concrete scan predicate (pushable)
        plan = pre._jdf.queryExecution().executedPlan().toString()
        assert "l_partkey" in plan and ("PushedFilters: [In(l_partkey" in plan or "l_partkey IN" in plan), plan[:2000]

    def test_inlist_falls_back_to_minmax_above_cap(self, spark):
        fact = load_table(spark, SF, "lineitem")
        dim = load_table(spark, SF, "part")  # all parts > cap of 5
        pre = prefilter_inlist(fact, dim, "l_partkey", "p_partkey", max_keys=5)
        lo, hi = dim.agg(F.min("p_partkey"), F.max("p_partkey")).collect()[0]
        expected = fact.filter(F.col("l_partkey").between(lo, hi)).count()
        assert pre.count() == expected

    def test_minmax_empty_dim_short_circuits(self, spark):
        fact = load_table(spark, SF, "lineitem")
        dim = load_table(spark, SF, "part").filter("p_size = -1")
        assert prefilter_minmax(fact, dim, "l_partkey", "p_partkey").count() == 0
        assert prefilter_inlist(fact, dim, "l_partkey", "p_partkey").count() == 0
