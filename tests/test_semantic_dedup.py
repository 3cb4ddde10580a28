"""SemDeDup-style semantic dedup (similarity.semantic_dedup).

Planted corpus: three well-separated direction groups in 8-d. Within a
group, vectors are near-identical (cos ≈ 1); across groups cosine is ~0.
Pins:

1. every corpus row comes back exactly once with a keep verdict;
2. within each dup group only the minimum id is kept;
3. singleton directions always survive;
4. dup groups land in one k-means cluster each (the within-cluster
   comparison actually sees them);
5. deterministic across runs, including via the sampled trainer.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import similarity as sim  # noqa: E402


def _planted(spark):
    def v(axis, scale=1.0, bump=0.0):
        x = [0.0] * 8
        x[axis] = scale
        x[(axis + 1) % 8] = bump
        return x

    rows = [
        # group A (axis 0): 3 near-identical docs
        (0, v(0)), (1, v(0, 1.02)), (2, v(0, 0.98, 0.02)),
        # group B (axis 3): 2 near-identical docs
        (10, v(3)), (11, v(3, 1.01, 0.01)),
        # singletons on axes 5 and 6
        (20, v(5)), (21, v(6)),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_keep_min_id_per_dup_group(spark):
    out = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in sim.semantic_dedup(
            _planted(spark), n_clusters=4, threshold=0.97, seed=7
        ).collect()
    }
    assert set(out) == {0, 1, 2, 10, 11, 20, 21}
    # group minima kept, the rest of the group pruned
    assert out[0][1] and not out[1][1] and not out[2][1]
    assert out[10][1] and not out[11][1]
    # singletons survive
    assert out[20][1] and out[21][1]
    # each dup group shares one cluster (the comparison saw the pair)
    assert out[0][0] == out[1][0] == out[2][0]
    assert out[10][0] == out[11][0]


def test_threshold_one_only_prunes_exact_direction(spark):
    out = {
        r["vec_id"]: r["keep"]
        for r in sim.semantic_dedup(
            _planted(spark), n_clusters=4, threshold=1.0, seed=7
        ).collect()
    }
    # ids 0/1 are exact scalar multiples (cos = 1.0) -> 1 pruned; id 11
    # rounds to 1.0 at 4dp (cos ≈ 0.99995) -> pruned; id 2's off-axis
    # bump keeps it at 0.9998 < 1.0 -> survives
    assert out[0] and not out[1] and out[2]
    assert out[10] and not out[11]
    assert out[20] and out[21]


def test_deterministic_and_sampled_trainer_path(spark):
    df = _planted(spark)
    a = sorted(map(tuple, sim.semantic_dedup(df, 4, 0.97, seed=7).collect()))
    b = sorted(map(tuple, sim.semantic_dedup(df, 4, 0.97, seed=7).collect()))
    assert a == b
    # sampled trainer: centroids differ but keep verdicts for planted
    # near-identical groups still hold (they collapse to any centroid
    # together)
    s = {
        r["vec_id"]: r["keep"]
        for r in sim.semantic_dedup(
            df, 4, 0.97, seed=7, train_fraction=0.999
        ).collect()
    }
    assert s[0] and not s[1] and not s[2] and s[10] and not s[11]
