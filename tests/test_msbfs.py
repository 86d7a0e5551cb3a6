"""Bit-parallel MS-BFS: parity with a pure-Python reference BFS, including
a >64-source graph that forces multiple bitmask batches."""

from __future__ import annotations

import random
from collections import deque

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.centrality import (
    ClosenessConfig,
    harmonic_centrality,
)
from neo4j_graph_data_science_spark.operators.msbfs import all_shortest_paths


def _py_bfs(n: int, adj: dict[int, list[int]]) -> dict[tuple[int, int], int]:
    dists = {}
    for s in range(n):
        seen = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, []):
                if v not in seen:
                    seen[v] = seen[u] + 1
                    dq.append(v)
        for t, d in seen.items():
            dists[(s, t)] = d
    return dists


def _random_graph(n: int, m: int, seed: int):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    return sorted(edges), adj


def test_all_shortest_paths_multi_batch(spark):
    # 150 nodes -> 3 bitmask batches; directed random graph
    n, m = 150, 500
    edges, adj = _random_graph(n, m, seed=7)
    g = from_edge_list(spark, edges, n_nodes=n)
    got = {
        (r["source"], r["target"]): r["dist"]
        for r in all_shortest_paths(g).collect()
    }
    assert got == _py_bfs(n, adj)


def test_all_shortest_paths_sampled_sources(spark):
    n, m = 60, 150
    edges, adj = _random_graph(n, m, seed=11)
    g = from_edge_list(spark, edges, n_nodes=n)
    srcs = [0, 7, 23]
    got = {
        (r["source"], r["target"]): r["dist"]
        for r in all_shortest_paths(g, sources=srcs).collect()
    }
    want = {k: v for k, v in _py_bfs(n, adj).items() if k[0] in srcs}
    assert got == want


def test_harmonic_matches_python(spark):
    n, m = 80, 240
    edges, adj = _random_graph(n, m, seed=3)
    g = from_edge_list(spark, edges, n_nodes=n)
    got = {r["id"]: r["centrality"]
           for r in harmonic_centrality(g, ClosenessConfig()).collect()}
    dists = _py_bfs(n, adj)
    for v in range(n):
        want = sum(1.0 / d for (s, t), d in dists.items()
                   if t == v and d > 0) / (n - 1)
        assert abs(got[v] - want) < 1e-9, v
