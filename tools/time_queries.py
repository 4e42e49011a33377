"""Time named headline queries exactly like bench.py (noop sink).

Usage:
    python tools/time_queries.py [N_RUNS] name [name ...]

Warms the JVM on the first name, then runs each named query N_RUNS
times (default 3) and prints per-query min/median. Same session
factory and timing region as bench.py so numbers are comparable.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0].isdigit():
        n_runs = int(args[0])
        args = args[1:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from acero_delta_lake_streaming_spark.session import get_spark

    spark = get_spark(app_name="time-queries", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    registry = entrymod.queries()

    def run(name: str) -> float:
        df = registry[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    try:
        run(names[0])
    except Exception as exc:
        print(f"warmup failed: {exc}", file=sys.stderr)

    for name in names:
        samples = [run(name) for _ in range(n_runs)]
        print(
            f"{name}: median={statistics.median(samples):.3f}s "
            f"min={min(samples):.3f}s runs={[round(s, 3) for s in samples]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
