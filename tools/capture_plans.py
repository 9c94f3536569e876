"""Capture ``.explain("formatted")`` output for contract queries into files.

Used by the optimization rounds to record before/after physical plans under
``plans/r{N}/<query>_{tag}.txt`` so plan-shape claims in OPTIMIZATION_r{N}.md
are checkable without running Spark.

Usage: python tools/capture_plans.py <out_dir> <tag> [sf_dir] [query ...]
  e.g. python tools/capture_plans.py plans/r11 before /root/testdata/sf0.1 \
           dedup_prefix_filter_pairs corpus_curation
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from map_spark_sql_spark.queries import QUERIES
    from map_spark_sql_spark.session import get_session

    out_dir = sys.argv[1]
    tag = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or sorted(QUERIES)

    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="capture_plans", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: ERROR {str(e).splitlines()[0][:100]}")
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"{name}: wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
