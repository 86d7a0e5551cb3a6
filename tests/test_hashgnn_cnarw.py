"""HashGNN binary embeddings + CNARW sampler."""

from __future__ import annotations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.embeddings import (
    HashGNNConfig,
    hashgnn,
)
from neo4j_graph_data_science_spark.sources.generator import (
    CnarwSampleConfig,
    cnarw_sample,
)


def _jacc(a, b):
    a, b = set(a), set(b)
    return len(a & b) / max(len(a | b), 1)


def test_hashgnn_homophily(spark):
    # two cliques + bridge: same-clique embeddings overlap more
    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a + 4, b + 4) for a, b in k1]
    g = from_edge_list(spark, k1 + k2 + [(3, 4)], n_nodes=8)
    emb = {r["id"]: list(r["embedding"])
           for r in hashgnn(g, HashGNNConfig(embedding_density=24,
                                             iterations=2)).collect()}
    assert len(emb) == 8
    same, cross = [], []
    for i in range(8):
        for j in range(i + 1, 8):
            (same if (i < 4) == (j < 4) else cross).append(_jacc(emb[i], emb[j]))
    assert sum(same) / len(same) > sum(cross) / len(cross)


def test_hashgnn_deterministic(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], n_nodes=3)
    a = sorted((r["id"], tuple(r["embedding"])) for r in hashgnn(g).collect())
    b = sorted((r["id"], tuple(r["embedding"])) for r in hashgnn(g).collect())
    assert a == b


def test_cnarw_sample_coverage(spark):
    # ring of 60 nodes: CNARW should reach the target ratio
    edges = [(i, (i + 1) % 60) for i in range(60)]
    g = from_edge_list(spark, edges, n_nodes=60)
    sub = cnarw_sample(g, CnarwSampleConfig(sampling_ratio=0.25,
                                            start_nodes=(0,), fanout=2))
    n = sub.nodes.count()
    assert n >= 15
    # induced edges connect sampled nodes only
    ids = {r["id"] for r in sub.nodes.collect()}
    for r in sub.edges.collect():
        assert r["src"] in ids and r["dst"] in ids
