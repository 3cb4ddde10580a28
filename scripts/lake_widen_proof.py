#!/usr/bin/env python
"""Measured type-widening read-cost proof: a widened table's live
files span two physical types, so reads scan per schema-group and
union — this measures what that costs against a same-size uniform
table (expected: ~nothing; same bytes, two scan nodes instead of one,
no shuffle added).

Table A: N/2 rows written int, txn_widen_column to long, N/2 rows
appended long (mixed groups). Table B: N rows written long (uniform).
Same aggregate over both, min-of-2 interleaved, one JVM; identical
results asserted (the int rows upcast losslessly).

Usage: python scripts/lake_widen_proof.py [rows]
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
    half = rows // 2
    spark = get_spark(app_name="lake-widen-proof")

    def mk(lo, hi, typ):
        return spark.range(lo, hi).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 1_000_000).cast(typ).alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )

    ra = tempfile.mkdtemp(prefix="lake_widen_proof_") + "/a"
    lake.txn_write(mk(0, half, "int").repartition(24), ra,
                   stats_cols=["id"])
    lake.txn_widen_column(ra, "v", "long")
    lake.txn_write(mk(half, rows, "long").repartition(24), ra,
                   stats_cols=["id"])

    rb = tempfile.mkdtemp(prefix="lake_widen_proof_") + "/b"
    lake.txn_write(mk(0, rows, "long").repartition(48), rb,
                   stats_cols=["id"])

    def agg(root):
        return (
            lake.txn_read(spark, root)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("s"),
                F.sum(F.crc32("pad")).alias("h"),
            )
            .collect()[0]
        )

    t_mixed = min(timed(lambda: agg(ra))[0] for _ in range(2))
    t_uniform = min(timed(lambda: agg(rb))[0] for _ in range(2))
    a, b = agg(ra), agg(rb)
    assert (a["n"], a["s"], a["h"]) == (b["n"], b["s"], b["h"]), (a, b)
    print(
        json.dumps(
            {
                "rows": rows,
                "t_mixed_grouped_scan_s": round(t_mixed, 2),
                "t_uniform_scan_s": round(t_uniform, 2),
                "overhead_x": round(t_mixed / t_uniform, 2),
                "rows_agg": a["n"],
            }
        )
    )


if __name__ == "__main__":
    main()
