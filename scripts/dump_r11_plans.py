"""Dump .explain('formatted') for the round-11 touched queries to
plans/r11/<query>_<suffix>.txt.

Usage: python scripts/dump_r11_plans.py <suffix> [query ...]

FLAT=1 additionally monkeypatches DataFrame.localCheckpoint /
checkpoint to identity BEFORE building, so subtrees that normally
hide inside a lazy-checkpoint LogicalRDD (e.g. the ppjoin candidate
join and its r11 length-band key) appear in the dumped plan. Display
only — the shipped queries keep their checkpoints.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "cf_ndcg_itemknn_sub",
    "dedup_ppjoin",
    "dedup_ppjoin_zipf",
    "a3_rmse_item_mean",
    "ml_nb_confusion",
    "text_winnowing",
    "dedup_minhash_lsh",
    "curation_contamination",
    "graph_triangles",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("FLAT"):
        # patch the CLASSIC class — pyspark.sql.DataFrame is the
        # abstract base in Spark 4 and sessions hand out the classic
        # subclass, whose own method would shadow a base-class patch
        from pyspark.sql.classic.dataframe import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
        DataFrame.checkpoint = lambda self, eager=True: self  # type: ignore[method-assign]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(path)


if __name__ == "__main__":
    main()
