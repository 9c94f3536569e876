"""Isolated repeat-timer for single registry queries (guide §1.1/§1.4).

Runs each named query N times in ONE warm session and reports every
timing plus the min (the noise floor on a box with ~19% run-to-run
swing). The timed action mirrors bench.py's collect() of the bounded
result so numbers are comparable with the bench; pass --noop to time a
noop-sink write instead (computes every column, no driver transfer) when
diagnosing whether collect/driver transfer is the cost.

Usage: python tools/isolate_bench.py [--sf DIR] [--reps N] [--noop] query...
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    noop = False
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--reps":
            reps = int(next(it))
        elif a == "--noop":
            noop = True
        else:
            names.append(a)

    import __spark_entry__ as entrymod
    from map_spark_sql_spark.session import get_session

    spark = get_session(app_name="isolate", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    for name in names:
        fn = queries[name]
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(times):.3f}s runs="
            + ",".join(f"{t:.3f}" for t in times),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
