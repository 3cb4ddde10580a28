"""Dev loop: run every registry query against the DuckDB oracle.

Usage: python scripts/check_oracle.py [--vanilla] [sf_dir] [name ...]

--vanilla builds a BARE SparkSession (no repo defaults: no AQE/Arrow/
UTC/pushdown confs) instead of session.get_spark() — the portability
audit VERDICT r8 asked for: a query's correctness must never depend on
who built the session (the driver harness uses a vanilla one).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.plans.oracle import duckdb_conn, run_compare
from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES
from spark_cassandra_collabfiltering_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or list(QUERIES)
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]"
            )
            # memory/stack sizing only (a matter of the local-JVM test
            # box, not session semantics); NO SQL confs — the point is
            # to catch any correctness-bearing session-default
            # dependence in the queries themselves
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            )
            .config("spark.driver.extraJavaOptions", "-Xss16m")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="oracle-check")
    conn = duckdb_conn(sf_dir)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            res = run_compare(spark, sf_dir, name, conn)
        except Exception as exc:  # surface, keep going
            failures += 1
            print(f"ERROR {name}: {type(exc).__name__}: {str(exc).splitlines()[0][:200]}")
            continue
        status = "ok  " if res.ok else "FAIL"
        if not res.ok:
            failures += 1
        print(f"{status} {name:28s} {time.time()-t0:6.2f}s  {res.detail[:150]}")
    print(f"\n{len(names) - failures}/{len(names)} queries match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
