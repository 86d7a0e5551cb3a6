"""Approx max k-cut + CELF influence maximization."""

from __future__ import annotations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.influence import CelfConfig, celf
from neo4j_graph_data_science_spark.operators.maxkcut import (
    MaxKCutConfig,
    approx_max_k_cut,
)


def test_max_2cut_bipartite(spark):
    # complete bipartite K(3,3): optimal 2-cut = all 9 edges
    edges = [(a, 3 + b) for a in range(3) for b in range(3)]
    g = from_edge_list(spark, edges, n_nodes=6)
    part, cut = approx_max_k_cut(g, MaxKCutConfig(k=2, iterations=3,
                                                  local_rounds=10))
    assert cut == 9.0
    got = {r["id"]: r["community"] for r in part.collect()}
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[3], got[4], got[5]}) == 1
    assert got[0] != got[3]


def test_celf_picks_hubs(spark):
    # star hub 0 with 10 leaves + isolated pair 11-12: at p=1 the first
    # pick must be in the star component (spread 11), second adds the pair
    edges = [(0, i) for i in range(1, 11)] + [(11, 12)]
    g = from_edge_list(spark, edges, n_nodes=13)
    res = celf(g, CelfConfig(seed_set_size=2, propagation_probability=1.0,
                             monte_carlo_simulations=4)).collect()
    assert res[0]["node_id"] in range(0, 11)
    assert res[0]["spread"] == 11.0
    assert res[1]["node_id"] in (11, 12)
    assert res[1]["spread"] == 13.0


def test_celf_directed_cascade_semantics(spark):
    """The case where directed IC provably differs from the round-2
    undirected-components approximation (verdict #6): edges 0->1 and 2->1
    at p=1. A directed cascade from 0 activates {0,1} (spread 2); the
    undirected component {0,1,2} would claim spread 3. Hand-computed IC:
    greedy picks 0 (spread 2.0) then 2 (cumulative 3.0)."""
    g = from_edge_list(spark, [(0, 1), (2, 1)], n_nodes=3)
    res = celf(g, CelfConfig(seed_set_size=2, propagation_probability=1.0,
                             monte_carlo_simulations=3)).collect()
    assert res[0]["node_id"] == 0 and res[0]["spread"] == 2.0
    assert res[1]["node_id"] == 2 and res[1]["spread"] == 3.0
    # the legacy approximation overstates exactly as predicted
    legacy = celf(g, CelfConfig(seed_set_size=1, propagation_probability=1.0,
                                monte_carlo_simulations=3,
                                mode="undirected_components")).collect()
    assert legacy[0]["spread"] == 3.0


def test_celf_probabilistic_spread_bounds(spark):
    edges = [(0, i) for i in range(1, 6)]
    g = from_edge_list(spark, edges, n_nodes=6)
    res = celf(g, CelfConfig(seed_set_size=1, propagation_probability=0.3,
                             monte_carlo_simulations=30)).collect()
    # hub 0 is the best single seed; expected spread in [1, 6]
    assert res[0]["node_id"] == 0
    assert 1.0 <= res[0]["spread"] <= 6.0


def test_max_kcut_md5_mode_bipartite_optimum(spark):
    """hash_mode=md5 (oracle-replayable draws) still reaches the bipartite
    optimum: on K_{3,3} with k=2 the max cut separates the two sides."""
    from neo4j_graph_data_science_spark.catalog import from_edge_list
    from neo4j_graph_data_science_spark.operators.maxkcut import (
        MaxKCutConfig, approx_max_k_cut,
    )

    edges = [(a, b) for a in range(3) for b in range(3, 6)]
    g = from_edge_list(spark, edges, n_nodes=6)
    part, cut = approx_max_k_cut(
        g, MaxKCutConfig(k=2, iterations=3, local_rounds=8, hash_mode="md5"))
    got = {r["id"]: r["community"] for r in part.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]
    assert cut == 9.0


def test_celf_reach_guard_falls_back(spark):
    """High propagation probability on a well-connected graph makes the
    directed closure quadratic; the guard must downgrade to the component
    approximation with a warning instead of materializing it
    (round-3 verdict #3)."""
    import warnings

    from neo4j_graph_data_science_spark.operators.influence import (
        CelfConfig, celf,
    )

    edges = [(a, b) for a in range(8) for b in range(8) if a != b]
    g = from_edge_list(spark, edges, n_nodes=8)
    cfg = CelfConfig(seed_set_size=2, propagation_probability=0.95,
                     monte_carlo_simulations=4, max_reach_rows=50)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = celf(g, cfg).collect()
    assert any("undirected_components" in str(w.message) for w in caught)
    # p=0.95 on (near-)K8 saturates after the first seed: the greedy loop
    # stops when no marginal gain remains (same semantics both modes)
    assert len(out) >= 1 and out[0].spread > 0


def test_celf_md5_mode_matches_xxhash_shape(spark):
    """md5 coin mode (DuckDB-replayable) returns the same schema and a
    deterministic seed set; unknown hash modes are rejected."""
    import pytest

    from neo4j_graph_data_science_spark.operators.influence import (
        CelfConfig, celf,
    )

    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 4), (4, 0), (1, 4)]
    g = from_edge_list(spark, edges, n_nodes=5)
    cfg = CelfConfig(seed_set_size=2, propagation_probability=0.4,
                     monte_carlo_simulations=6, hash_mode="md5")
    r1 = celf(g, cfg).collect()
    r2 = celf(g, cfg).collect()
    assert [(x.node_id, x.spread) for x in r1] == \
        [(x.node_id, x.spread) for x in r2]
    with pytest.raises(ValueError, match="hash_mode"):
        celf(g, CelfConfig(hash_mode="sha1")).collect()
