"""Connected components: min-label propagation vs large-star/small-star
contraction must produce identical (node, component) maps on every
graph shape — including the chain graphs where propagation's
rounds-equals-diameter cost is pathological and star contraction's
O(log n) bound is the point."""

from __future__ import annotations

import random

import pytest

from map_reduce_rpc_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _components(df):
    return {(r.node, r.component) for r in df.collect()}


CASES = {
    # worst case for propagation: one long path (diameter = n)
    "path": [(i, i + 1) for i in range(120)],
    # best case / dup-graph shape: disjoint cliques
    "cliques": [
        (g * 10 + i, g * 10 + j)
        for g in range(12)
        for i in range(10)
        for j in range(i + 1, 10)
    ],
    # hub + an unrelated far-away pair
    "star+pair": [(0, i) for i in range(1, 40)] + [(1000, 1001)],
}
_rng = random.Random(7)
CASES["random"] = [
    (a, b)
    for a, b in ((_rng.randrange(300), _rng.randrange(300)) for _ in range(250))
    if a != b
]


@pytest.mark.parametrize("name", sorted(CASES))
def test_star_matches_propagation(spark, name):
    df = spark.createDataFrame(CASES[name], ["id_a", "id_b"])
    prop = _components(connected_components(df, max_iter=200))
    star = _components(connected_components_star(df))
    assert star == prop


def test_star_converges_in_log_rounds_on_path(spark):
    """A 120-node path must converge well inside max_iter=25 (the
    O(log n) contract); propagation would need 120 rounds."""
    import warnings

    df = spark.createDataFrame(CASES["path"], ["id_a", "id_b"])
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # non-convergence raises
        out = _components(connected_components_star(df, max_iter=25))
    # a path is one component labeled by its min node
    assert out == {(i, 0) for i in range(121)}


def test_components_within_blocks_matches_global_cc(spark):
    """Blocked union-find must equal global min-label CC whenever edges
    are block-local (the semantic_dedup contract): same components,
    same min-id labels — including chain shapes within a block (where
    the single-shuffle form skips the per-round iteration entirely)."""
    from map_reduce_rpc_spark.operators.graph import (
        components_within_blocks,
        connected_components,
    )

    edges = spark.createDataFrame(
        [
            # block 0: chain 1-2-3-4 plus isolated pair 8-9
            (0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 8, 9),
            # block 1: triangle 10-11-12 with redundant edges
            (1, 10, 11), (1, 11, 12), (1, 10, 12),
            # block 2: self-contained star around 20
            (2, 20, 21), (2, 20, 22), (2, 20, 23),
        ],
        "blk int, id_a long, id_b long",
    )
    blocked = {
        (r["node"], r["component"])
        for r in components_within_blocks(edges, "blk").collect()
    }
    global_cc = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert blocked == global_cc
    assert (4, 1) in blocked and (12, 10) in blocked and (23, 20) in blocked


def test_pagerank_star_center_dominates_and_mass_conserves(spark):
    """On a 6-leaf star the center must out-rank every leaf and all
    leaves must tie exactly (bit-equal doubles — the determinism
    contract); total mass stays within the documented quantization
    leak (< edges * 2^-20 per iteration) of 1."""
    from map_reduce_rpc_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "src long, dst long"
    )
    ranks = {r["node"]: r["r"] for r in pagerank(edges, iters=3).collect()}
    center, leaves = ranks[0], [ranks[i] for i in range(1, 7)]
    assert all(center > v for v in leaves)
    assert len(set(leaves)) == 1, "leaves must be bit-identical"
    assert 0.999 < sum(ranks.values()) <= 1.0


def test_pagerank_is_partitioning_invariant(spark):
    """The quantized-message design's point: the same graph shuffled
    through a different partition count yields BIT-identical ranks."""
    from map_reduce_rpc_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 23) for i in range(40)], "src long, dst long"
    ).where("src <> dst")
    a = sorted(map(tuple, pagerank(edges, iters=3).collect()))
    b = sorted(map(tuple, pagerank(edges.repartition(7), iters=3).collect()))
    assert a == b


def test_directed_pagerank_conserves_mass_and_ranks_sinks(spark):
    """Directed star a->{b..g}: without dangling redistribution the
    sinks' mass would leak every round (total -> ~(1-d) after a few
    iters); with it, total mass stays within the quantization leak of
    1 and every sink out-ranks the source (they receive, it only
    dangles its share)."""
    from map_reduce_rpc_spark.operators.graph import pagerank_directed

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "src long, dst long"
    )
    ranks = {r["node"]: r["r"] for r in pagerank_directed(edges, iters=3).collect()}
    total = sum(ranks.values())
    assert 0.995 < total <= 1.0, total
    assert all(ranks[i] > ranks[0] for i in range(1, 7))
    # sinks must tie bit-exactly (determinism of the shared expression)
    assert len({ranks[i] for i in range(1, 7)}) == 1


def test_kcore_peels_pendants_keeps_clique(spark):
    """4-clique {0,1,2,3} + pendant chain 3-4-5: the 3-core is exactly
    the clique (every member degree 3); the chain peels off over two
    rounds (5 first, then 4) — exercising the iteration, not just the
    first filter."""
    from map_reduce_rpc_spark.operators.graph import kcore_truncated

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(
        clique + [(3, 4), (4, 5)], "u long, v long"
    )
    got = {r["u"]: r["core_deg"] for r in kcore_truncated(edges, k=3, rounds=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_converges_within_configured_rounds(spark, sf_dir):
    """The registered query's FIXED round count must be at fixpoint on
    the real backbone: one extra round changes nothing, so the
    truncated peel equals the exact k-core here."""
    from map_reduce_rpc_spark.operators.graph import kcore_truncated
    from map_reduce_rpc_spark.plans.relational import (
        KCORE_K,
        KCORE_ROUNDS,
        _supplier_backbone,
    )

    edges = _supplier_backbone(spark, sf_dir)
    a = sorted(
        (r["u"], r["core_deg"])
        for r in kcore_truncated(edges, KCORE_K, KCORE_ROUNDS).collect()
    )
    b = sorted(
        (r["u"], r["core_deg"])
        for r in kcore_truncated(edges, KCORE_K, KCORE_ROUNDS + 1).collect()
    )
    assert a == b and len(a) > 0


def test_label_propagation_splits_bridged_cliques(spark):
    """Two 4-cliques joined by ONE bridge edge (3,10): connected
    components necessarily merges them; 3-round LPA must keep them as
    two communities (labeled by each clique's min id after the vote
    dynamics settle) — the exact behavior that distinguishes
    community detection from reachability."""
    from map_reduce_rpc_spark.operators.graph import label_propagation

    def clique(ids):
        return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]

    edges = spark.createDataFrame(
        clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)],
        "u long, v long",
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 13: 10}


def test_lpa_query_finds_multiple_communities_in_one_component(spark, sf_dir):
    """On the real thinned backbone the registered query must produce
    MORE communities than connected components does — if the two
    numbers are equal the backbone is too dense and LPA has
    degenerated to reachability (the failure mode LPA_TOP_NEIGHBORS
    exists to prevent)."""
    from map_reduce_rpc_spark.operators.graph import connected_components
    from map_reduce_rpc_spark.plans.relational import (
        LPA_TOP_NEIGHBORS,
        _supplier_backbone,
        label_prop_communities,
    )

    lpa = label_prop_communities(spark, sf_dir).collect()
    n_comm = len({r["community"] for r in lpa})
    edges = _supplier_backbone(spark, sf_dir, top_t=LPA_TOP_NEIGHBORS)
    cc = connected_components(edges, src="u", dst="v").collect()
    n_comp = len({r["component"] for r in cc})
    assert len(lpa) == len(cc) > 0
    assert n_comm > n_comp


def test_ppr_ranks_seed_neighborhood_over_global_popularity(spark):
    """Personalized PageRank must invert global popularity inside the
    seed's neighborhood: supplier 5 has two customers (globally more
    central), supplier 3 has only the seed customer — with restart to
    the seed, supplier 3 must outrank supplier 5, and nodes outside
    the seed's component must score 0 teleport mass only."""
    from map_reduce_rpc_spark.operators.graph import (
        pagerank_directed,
        pagerank_personalized,
    )

    rel = [(2, 3), (4, 5), (6, 5)]
    edges = spark.createDataFrame(
        rel + [(b, a) for a, b in rel], "src long, dst long"
    )
    ppr = {
        r["node"]: r["r"]
        for r in pagerank_personalized(edges, seeds=(2,), iters=3).collect()
    }
    glob = {
        r["node"]: r["r"]
        for r in pagerank_directed(edges, iters=3).collect()
    }
    assert glob[5] > glob[3], "premise: supplier 5 is globally more central"
    assert ppr[3] > ppr[5], "personalization must invert it for the seed"
    # disconnected-from-seed nodes get no restart mass and no inflow
    assert ppr[4] == 0.0 and ppr[5] == 0.0 and ppr[6] == 0.0
    # all mass stays in the seed component (up to quantization leak)
    assert 0.9 < sum(ppr.values()) <= 1.0 + 1e-9


def test_lpa_is_partitioning_invariant(spark):
    """Quantization-free but aggregation-ordered: the mode/argmax per
    node must not depend on how edges are partitioned — the same
    random graph through a different partition count yields identical
    communities (the max(struct) tie-break is the guarantee)."""
    import random as _r

    from map_reduce_rpc_spark.operators.graph import label_propagation

    rng = _r.Random(7)
    edges = spark.createDataFrame(
        [(rng.randrange(40), rng.randrange(40)) for _ in range(120)],
        "u long, v long",
    ).where("u <> v")
    a = sorted(map(tuple, label_propagation(edges, rounds=3).collect()))
    b = sorted(
        map(tuple, label_propagation(edges.repartition(7), rounds=3).collect())
    )
    assert a == b and len(a) > 0


def test_bfs_hops_on_path_graph(spark):
    """Path 1-2-3-4-5, seed {1}, 3 rounds: hops are exact shortest
    distances; node 5 is beyond the horizon and stays unreached; the
    disconnected node 99 never appears; a seed absent from the graph
    still reports hops=0 (the seed set is ground truth, not derived)."""
    from map_reduce_rpc_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (99, 100)], "u long, v long"
    )
    got = {
        r.node: r.hops
        for r in bfs_hops(edges, seeds=(1, 7), rounds=3).collect()
    }
    assert got == {1: 0, 7: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_hops_undirected_and_multisource_min(spark):
    """Edges are treated as undirected, and with two seeds every node
    gets the MIN distance over seeds (first-seen = minimal)."""
    from map_reduce_rpc_spark.operators.graph import bfs_hops

    # star: 0 at center; seeds at two leaves -> center is 1 hop, other
    # leaves 2 (via center), regardless of edge direction in the input
    edges = spark.createDataFrame(
        [(0, 1), (2, 0), (0, 3), (4, 0)], "u long, v long"
    )
    got = {
        r.node: r.hops
        for r in bfs_hops(edges, seeds=(1, 2), rounds=4).collect()
    }
    assert got == {1: 0, 2: 0, 0: 1, 3: 2, 4: 2}
