#!/usr/bin/env python
"""Measured derived-pruning scale proof (r7 cont.) — generated
columns as hidden partitioning, measured against the brute-force
alternative on the SAME data, one JVM.

An N-row event table is committed partitioned by a DECLARED generated
column d = CAST(ts AS DATE) spanning D days; the query is the everyday
shape 'WHERE ts BETWEEN lo AND hi' covering Q of those days. Contrast:

1. full scan + filter (what a reader without the log does),
2. txn_read_pruned_derived: the monotone interval [date(lo), date(hi)]
   prunes whole date partitions from pure log arithmetic — no file
   listed or opened outside the Q-day window, the caller never names
   the partition column (the Delta generated-column / Iceberg hidden-
   partitioning payoff).

Both sides return identical rows (asserted). At 100 TB the pruned read
costs Q/D of the table; the full scan costs the table.

Usage: python scripts/lake_derived_proof.py [rows] [days] [query_days]
Prints one JSON line; numbers land in SCALING.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_cassandra_collabfiltering_spark.session import get_spark  # noqa: E402
from spark_cassandra_collabfiltering_spark.sources import lake  # noqa: E402


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def main():
    import tempfile

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    days = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    qdays = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(app_name="lake-derived-proof")
    base = spark.range(rows).select(
        F.col("id").alias("eid"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(
                secs=(F.col("id") % (days * 86400)).cast("double")
            )
        ).alias("ts"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    root = tempfile.mkdtemp(prefix="lake_derived_proof_") + "/t"
    t_write, _ = timed(
        lambda: lake.txn_write(
            base, root,
            generated={"d": "CAST(ts AS DATE)"},
            partition_by=["d"], stats_cols=["eid"],
        )
    )
    lo, hi = "2026-01-10 00:00:00", f"2026-01-{10 + qdays - 1:02d} 23:59:59"

    def full_scan():
        df = lake.txn_read(spark, root).filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
        )
        return df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.crc32("pad")).alias("h")
        ).collect()[0]

    def derived():
        df, nread, ntotal = lake.txn_read_pruned_derived(
            spark, root, "ts", lo, hi
        )
        r = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.crc32("pad")).alias("h")
        ).collect()[0]
        return r, nread, ntotal

    # min-of-2 each, interleaved, same JVM
    t_full = min(timed(full_scan)[0] for _ in range(2))
    r_d, nread, ntotal = derived()
    t_der = min(timed(derived)[0] for _ in range(2))
    r_f = full_scan()
    assert (r_f["n"], r_f["h"]) == (r_d["n"], r_d["h"]), (r_f, r_d)
    print(
        json.dumps(
            {
                "rows": rows,
                "days": days,
                "query_days": qdays,
                "files_read": nread,
                "files_total": ntotal,
                "t_write_s": round(t_write, 2),
                "t_full_scan_s": round(t_full, 2),
                "t_derived_s": round(t_der, 2),
                "speedup": round(t_full / t_der, 2),
                "rows_matched": r_f["n"],
            }
        )
    )


if __name__ == "__main__":
    main()
