"""Articulation points and bridges.

Reference: articulationpoints/ArticulationPoints.java:33 and
bridges/Bridges.java -- both are single-threaded DFS low-link (Tarjan)
walkers in the reference as well; the algorithm is inherently sequential
(low-link needs DFS tree order). Like operators/paths.dfs, the adjacency
is collected to the driver behind an edge-count guard; for graphs beyond
the guard, a distributed approximation is the k-core / WCC toolbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import DST, SRC, SparkGraph


def _collect_undirected(graph: SparkGraph, max_edges: int):
    rows = (
        graph.edges.select(F.least(SRC, DST).alias("a"),
                           F.greatest(SRC, DST).alias("b"))
        .filter(F.col("a") != F.col("b")).distinct()
        .limit(max_edges + 1).collect()
    )
    if len(rows) > max_edges:
        raise ValueError(
            f"articulation/bridges collect adjacency to the driver; graph "
            f"exceeds {max_edges} edges")
    adj: dict[int, list[int]] = {}
    for r in rows:
        adj.setdefault(r["a"], []).append(r["b"])
        adj.setdefault(r["b"], []).append(r["a"])
    for v in adj:
        adj[v].sort()
    return adj


def _lowlink(adj):
    """Iterative Tarjan DFS: returns (articulation point set, bridge set)."""
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    parent: dict[int, int] = {}
    aps: set[int] = set()
    bridges: set[tuple[int, int]] = set()
    timer = 0
    for root in sorted(adj):
        if root in disc:
            continue
        root_children = 0
        stack = [(root, iter(adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in disc:
                    parent[w] = v
                    if v == root:
                        root_children += 1
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w != parent.get(v):
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] > disc[u]:
                        bridges.add((min(u, v), max(u, v)))
                    if u != root and low[v] >= disc[u]:
                        aps.add(u)
        if root_children >= 2:
            aps.add(root)
    return aps, bridges


def articulation_points(graph: SparkGraph,
                        max_collected_edges: int = 5_000_000) -> DataFrame:
    """(id) nodes whose removal disconnects their component."""
    adj = _collect_undirected(graph, max_collected_edges)
    aps, _ = _lowlink(adj)
    spark = graph.nodes.sparkSession
    return spark.createDataFrame([(int(v),) for v in sorted(aps)], "id long")


def bridges(graph: SparkGraph,
            max_collected_edges: int = 5_000_000) -> DataFrame:
    """(src, dst) edges whose removal disconnects their component (src<dst)."""
    adj = _collect_undirected(graph, max_collected_edges)
    _, brs = _lowlink(adj)
    spark = graph.nodes.sparkSession
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in sorted(brs)], f"{SRC} long, {DST} long")
