"""IVF lake layout (write_ivf_index + cosine_topk_ivf_pruned): the
partition-pruned serving path must read only the probed clusters'
directories and return exactly the in-memory IVF results.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_cassandra_collabfiltering_spark.operators import similarity as sim  # noqa: E402
from spark_cassandra_collabfiltering_spark.plans.queries import t  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


def test_ivf_pruned_serving_matches_inmemory(spark, tmp_path):
    emb = t(spark, SF_SMOKE, "embeddings")
    qs = sim.make_queries(emb, [0, 1, 2, 3, 4])
    path = str(tmp_path / "ivf")
    sim.write_ivf_index(emb, path, n_clusters=8, seed=42)

    pruned = sim.cosine_topk_ivf_pruned(spark, path, qs, k=5, n_probe=2)
    inmem = sim.cosine_topk_ivf(emb, qs, k=5, n_clusters=8, n_probe=2, seed=42)
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, inmem.collect()))

    # layout: one directory per inverted list
    dirs = [d for d in os.listdir(f"{path}/corpus") if d.startswith("cluster=")]
    assert 1 <= len(dirs) <= 8


def test_ivf_pruned_scan_has_partition_filters(spark, tmp_path):
    emb = t(spark, SF_SMOKE, "embeddings")
    qs = sim.make_queries(emb, [0, 1])
    path = str(tmp_path / "ivf")
    sim.write_ivf_index(emb, path, n_clusters=8, seed=42)

    df = sim.cosine_topk_ivf_pruned(spark, path, qs, k=3, n_probe=1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), "corpus scan is not partition-pruned"
    # at most n_queries * n_probe = 2 clusters survive the IN filter
    n_probed = (
        spark.read.parquet(f"{path}/corpus")
        .select("cluster").distinct().count()
    )
    assert n_probed >= 2  # sanity: pruning actually skipped something
