"""Physical-plan audit over the contract queries (SCALE.md's data source).

For each query: exchange count, parquet filter pushdown, join strategies,
Python-execution nodes, and the HOF-in-scan-DataFilter rule (SCALE.md
"optimizer pitfalls"). Exits non-zero if a pitfall regression appears.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOIN_TAGS = [
    ("BHJ", "BroadcastHashJoin"),
    ("SMJ", "SortMergeJoin"),
    ("SHJ", "ShuffledHashJoin"),
    ("BNLJ", "BroadcastNestedLoopJoin"),
    ("TopK", "TakeOrderedAndProject"),
    ("ArrowPy", "ArrowEvalPython|FlatMapGroupsInPandas|AggregateInPandas|MapInPandas"),
]


def main() -> int:
    from map_spark_sql_spark.queries import QUERIES
    from map_spark_sql_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(QUERIES)

    spark = get_session(app_name="audit_plans", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    bad = []
    for name in names:
        try:
            plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:34s} ERROR {str(e).splitlines()[0][:80]}")
            bad.append(name)
            continue
        n_exch = len(re.findall(r"Exchange (hash|range|RoundRobin)", plan))
        pushed = any(x.strip() for x in re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
        hof = any(
            "transform(" in x or "aggregate(" in x
            for x in re.findall(r"DataFilters: \[([^\]]*)\]", plan)
        )
        row_udf = "BatchEvalPython" in plan
        marks = [f"{t}x{len(re.findall(p, plan))}" for t, p in JOIN_TAGS if re.search(p, plan)]
        flags = ("HOF-IN-SCAN! " if hof else "") + ("ROW-PY-UDF! " if row_udf else "")
        if hof or row_udf:
            bad.append(name)
        print(
            f"{name:34s} exch={n_exch:2d} pushed={'Y' if pushed else 'n'} "
            f"{flags}{' '.join(marks)}"
        )
    spark.stop()
    if bad:
        print(f"\nFAIL: {len(bad)} queries with plan pitfalls: {', '.join(bad)}")
        return 1
    print(f"\nOK: {len(names)} plans clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
