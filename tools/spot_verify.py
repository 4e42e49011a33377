"""Driver-style oracle spot-verify (vanilla session, strict compare).

Usage:
    python tools/spot_verify.py [--sf 0.01] name [name ...]

Runs each named query with a VANILLA SparkSession (the external driver
does not use the engine's tuned get_spark) and compares the sorted
stringified tuples against the DuckDB oracle at the given SF. Exits
non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf = "0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    names = args
    sf_dir = f"/root/testdata/sf{sf}"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    import __spark_entry__ as ep

    qs, osql = ep.queries(), ep.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    bad = 0
    for name in names:
        spdf = qs[name](spark, sf_dir).toPandas()
        opdf = con.execute(osql[name]).df()
        a = sorted(
            map(str, spdf[sorted(spdf.columns)].itertuples(index=False, name=None))
        )
        b = sorted(
            map(str, opdf[sorted(opdf.columns)].itertuples(index=False, name=None))
        )
        ok = a == b
        if not ok:
            bad += 1
            # Set differences, not positional zip pairs (ADVICE r13):
            # zip truncates on unequal counts and one inserted row
            # misaligns every later pair.
            sa, sb = set(a), set(b)
            only_spark = sorted(sa - sb)[:3]
            only_oracle = sorted(sb - sa)[:3]
            print(
                f"MISMATCH {name}: {len(spdf)} vs {len(opdf)} rows; "
                f"spark-only={only_spark} oracle-only={only_oracle}"
            )
        else:
            print(f"MATCH {name} ({len(spdf)} rows)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
