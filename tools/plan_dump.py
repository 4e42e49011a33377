"""Dump .explain('formatted') for headline queries to plans/<round>/.

Usage:
    python tools/plan_dump.py <suffix> [name ...]

Round directory comes from $SPARK_GRAFT_PLAN_DIR (default r14).
Writes ``plans/<round>/<query>_<suffix>.txt`` for each named query (default:
every headline query present in the registry). Driver-side only — plans
are captured without executing the query, except for the eager storage
verbs whose callable itself performs writes (the established storage-verb
convention; their timed arm is the returned DataFrame).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"),
)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)

    from acero_delta_lake_streaming_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="plan-dump", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    import bench

    registry = entrymod.queries()
    names = [n for n in bench.HEADLINE if n in registry]
    if only:
        names = [n for n in names if n in only]

    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok   {name}")
        except Exception as exc:  # keep going; a broken query is news too
            print(f"FAIL {name}: {exc}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
