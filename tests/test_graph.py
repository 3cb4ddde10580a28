"""Pins for graph.pagerank: structural properties on hand-built
graphs (the cross-engine exactness itself is pinned by the
graph_pagerank oracle row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators import graph as gr


def _sym_edges(spark, pairs):
    fwd = [(a, b) for a, b in pairs]
    rev = [(b, a) for a, b in pairs]
    return spark.createDataFrame(fwd + rev, "src bigint, dst bigint")


def test_star_center_outranks_leaves(spark):
    edges = _sym_edges(spark, [(0, i) for i in range(1, 6)])
    got = {r.node: r.rank_e12 for r in gr.pagerank(edges, iters=5).collect()}
    assert set(got) == set(range(6))
    leaves = {got[i] for i in range(1, 6)}
    assert len(leaves) == 1  # symmetric leaves tie exactly
    assert got[0] > leaves.pop()


def test_ring_is_uniform(spark):
    n = 8
    edges = _sym_edges(spark, [(i, (i + 1) % n) for i in range(n)])
    got = {r.node: r.rank_e12 for r in gr.pagerank(edges, iters=4).collect()}
    # 2-regular graph: PageRank fixed point is uniform, and the exact
    # integer recursion preserves that symmetry bit-for-bit
    assert len(set(got.values())) == 1
    assert len(got) == n


def test_mass_conserved_up_to_floor_leakage(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    edges = _sym_edges(spark, pairs)
    iters = 5
    out = gr.pagerank(edges, iters=iters)
    total = out.agg(F.sum("rank_e12")).collect()[0][0]
    scale, n_edges, n_nodes = gr.SCALE_E12, 2 * len(pairs), 4
    # each floor division loses < 1 unit: per iteration at most one
    # per edge (contrib) + one per node (base), plus the initial split
    leak = iters * (n_edges + n_nodes) + n_nodes
    assert scale - leak <= total <= scale


def test_more_central_ranks_higher(spark):
    # path graph a-b-c-d-e: middle node c collects from both halves
    edges = _sym_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {r.node: r.rank_e12 for r in gr.pagerank(edges, iters=6).collect()}
    assert got[2] > got[0] and got[2] > got[4]
    assert got[1] > got[0] and got[3] > got[4]
    assert got[0] == got[4] and got[1] == got[3]  # mirror symmetry exact


def test_in_degree_zero_node_keeps_base_rank(spark):
    """A node that only points outward (legal under the src-coverage
    precondition) must stay in the rank vector with its teleport base,
    and its contribution must keep flowing to its target."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 0)], "src bigint, dst bigint"
    )
    got = {r.node: r.rank_e12 for r in gr.pagerank(edges, iters=3).collect()}
    assert set(got) == {0, 1, 2}          # C (=2) does not vanish
    n = 3
    base = (15 * gr.SCALE_E12) // (100 * n)
    assert got[2] == base                 # in-degree 0 -> base only
    assert got[0] > got[1] > got[2]       # 0 receives from both others


def test_personalized_pagerank_concentrates_on_seed_side(spark):
    """PPR: teleport mass restricted to the seed; nodes unreachable
    from the seed get rank 0; near-seed nodes outrank far ones."""
    # two disconnected 2-cycles: {0,1} and {8,9}; seed = {0}
    edges = _sym_edges(spark, [(0, 1), (8, 9)])
    seeds = spark.createDataFrame([(0,)], "node bigint")
    got = {
        r.node: r.rank_e12
        for r in gr.pagerank(edges, iters=4, seeds=seeds).collect()
    }
    assert got[8] == 0 and got[9] == 0     # unreachable component
    assert got[0] > got[1] > 0             # seed holds the restart mass


def test_ppr_unseeded_matches_plain_pagerank(spark):
    edges = _sym_edges(spark, [(0, 1), (1, 2), (2, 0)])
    a = sorted(map(tuple, gr.pagerank(edges, iters=3).collect()))
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node bigint")
    b = sorted(map(tuple, gr.pagerank(edges, iters=3, seeds=seeds).collect()))
    assert a == b  # seeding with ALL nodes degenerates to plain PR


# --- triangle_counts -------------------------------------------------------


def test_triangles_k4_every_node_in_three(spark):
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
    got = {r.node: r.n_triangles for r in gr.triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_path_has_none(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    got = {r.node: r.n_triangles for r in gr.triangle_counts(edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_triangles_canonicalizes_dirty_input(spark):
    # one triangle {0,1,2}, stated with duplicates, both orientations,
    # and a self-loop; plus a pendant node 3
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2), (2, 3)],
        "src bigint, dst bigint",
    )
    got = {r.node: r.n_triangles for r in gr.triangle_counts(edges).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 0}


def test_triangles_hub_with_one_closed_pair(spark):
    # hub 0 joined to 5 leaves; only leaves 1-2 are linked, so exactly
    # one triangle — the degree orientation must not overcount wedges
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2)], "src bigint, dst bigint"
    )
    got = {r.node: r.n_triangles for r in gr.triangle_counts(edges).collect()}
    assert got[0] == 1 and got[1] == 1 and got[2] == 1
    assert all(got[i] == 0 for i in range(3, 6))


def test_partition_modularity_hand_computed(spark):
    """Two triangles joined by one bridge, labeled by triangle:
    m = 7 edges, e_within = 3 + 3, degrees 7 + 7.
    Q = (4*7*6 - (49 + 49)) / (4*49) = 70/196 -> 357142 in e6."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src bigint, dst bigint",
    )
    labels = spark.createDataFrame(
        [(n, "A" if n <= 3 else "B") for n in range(1, 7)],
        "node bigint, label string",
    )
    got = {
        r.label: (r.n_nodes, r.e_within, r.degree_sum, r.q_e6)
        for r in gr.partition_modularity(edges, labels).collect()
    }
    assert got == {"A": (3, 3, 7, 357142), "B": (3, 3, 7, 357142)}


def test_partition_modularity_single_label_is_zero(spark):
    """Everything in one community: e_within = m and d = 2m, so
    Q = (4m*m - 4m^2)/4m^2 = 0 exactly."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src bigint, dst bigint"
    )
    labels = spark.createDataFrame(
        [(n, "X") for n in (1, 2, 3)], "node bigint, label string"
    )
    got = gr.partition_modularity(edges, labels).collect()
    assert [(r.label, r.q_e6) for r in got] == [("X", 0)]


def test_partition_modularity_anti_assortative_negative(spark):
    """A perfect bipartite alternation (no within-label edge at all)
    must yield negative Q."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src bigint, dst bigint"
    )
    labels = spark.createDataFrame(
        [(1, "A"), (3, "A"), (2, "B"), (4, "B")], "node bigint, label string"
    )
    got = gr.partition_modularity(edges, labels).collect()
    assert all(r.q_e6 < 0 for r in got)
