"""GraphSAGE: embedding geometry should reflect community structure when
features carry the signal, and the whole pipeline must be deterministic."""

from __future__ import annotations

import numpy as np

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.graphsage import (
    GraphSageConfig,
    graphsage,
    graphsage_predict,
    graphsage_train,
)


def _two_cliques(spark):
    edges = []
    for i in range(8):
        for j in range(i + 1, 8):
            edges.append((i, j))
            edges.append((8 + i, 8 + j))
    edges.append((0, 8))  # bridge
    g = from_edge_list(spark, edges, n_nodes=16)
    rows = []
    for v in range(16):
        base = [1.0, 0.0] if v < 8 else [0.0, 1.0]
        noise = [((v * 37 + k) % 10) / 100.0 for k in range(2)]
        rows.append((v, [base[0] + noise[0], base[1] + noise[1]]))
    feats = spark.createDataFrame(rows, "id long, features array<double>")
    return g, feats


def test_graphsage_separates_communities(spark):
    g, feats = _two_cliques(spark)
    cfg = GraphSageConfig(embedding_dim=8, hidden_dim=8,
                          train_node_count=16, epochs=30, seed=1)
    emb = {r["id"]: np.array(r["embedding"])
           for r in graphsage(g, feats, cfg).collect()}
    assert all(len(v) == 8 for v in emb.values())

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    within = np.mean([cos(emb[i], emb[j])
                      for i in range(8) for j in range(i + 1, 8)])
    across = np.mean([cos(emb[i], emb[8 + j])
                      for i in range(8) for j in range(8)])
    assert within > across


def test_graphsage_deterministic(spark):
    g, feats = _two_cliques(spark)
    cfg = GraphSageConfig(embedding_dim=4, hidden_dim=4,
                          train_node_count=16, epochs=5, seed=7)
    m1 = graphsage_train(g, feats, cfg)
    m2 = graphsage_train(g, feats, cfg)
    for k in ("Ws1", "Wn1", "Ws2", "Wn2"):
        assert np.allclose(m1[k], m2[k])
    e1 = sorted((r["id"], tuple(np.round(r["embedding"], 9)))
                for r in graphsage_predict(g, m1, feats, cfg).collect())
    e2 = sorted((r["id"], tuple(np.round(r["embedding"], 9)))
                for r in graphsage_predict(g, m2, feats, cfg).collect())
    assert e1 == e2


def test_training_sample_guard(spark):
    """A misconfigured training sample fails loudly before building the
    O(involved^2) driver-side adjacency (round-2 verdict #9)."""
    import pytest

    g, feats = _two_cliques(spark)
    with pytest.raises(ValueError, match="max_involved_nodes"):
        graphsage_train(g, feats, GraphSageConfig(train_node_count=8,
                                                  max_involved_nodes=4))


def test_graphsage_pool_aggregator_separates_and_is_deterministic(spark):
    """aggregator='pool' (MaxPoolingAggregator.java): learned
    relu(W_pool.h + b) per neighbor, elementwise MAX combine. Same
    community-separation and determinism contracts as the mean path."""
    g, feats = _two_cliques(spark)
    cfg = GraphSageConfig(embedding_dim=8, hidden_dim=8,
                          train_node_count=16, epochs=30, seed=1,
                          aggregator="pool")
    m1 = graphsage_train(g, feats, cfg)
    assert m1["aggregator"] == "pool"
    assert m1["Wp1"].shape == (2, 2) and m1["Wp2"].shape == (8, 8)
    m2 = graphsage_train(g, feats, cfg)
    for k in ("Ws1", "Wn1", "Ws2", "Wn2", "Wp1", "bp1", "Wp2", "bp2"):
        assert np.allclose(m1[k], m2[k]), k
    emb = {r["id"]: np.array(r["embedding"])
           for r in graphsage_predict(g, m1, feats, cfg).collect()}
    assert all(len(v) == 8 for v in emb.values())

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    within = np.mean([cos(emb[i], emb[j])
                      for i in range(8) for j in range(i + 1, 8)])
    across = np.mean([cos(emb[i], emb[8 + j])
                      for i in range(8) for j in range(8)])
    assert within > across
    e1 = sorted((r["id"], tuple(np.round(r["embedding"], 9)))
                for r in graphsage_predict(g, m1, feats, cfg).collect())
    e2 = sorted((r["id"], tuple(np.round(r["embedding"], 9)))
                for r in graphsage_predict(g, m2, feats, cfg).collect())
    assert e1 == e2


def test_graphsage_pool_differs_from_mean(spark):
    g, feats = _two_cliques(spark)
    base = dict(embedding_dim=4, hidden_dim=4, train_node_count=16,
                epochs=5, seed=7)
    em = {r["id"]: tuple(r["embedding"]) for r in graphsage(
        g, feats, GraphSageConfig(**base, aggregator="mean")).collect()}
    ep = {r["id"]: tuple(r["embedding"]) for r in graphsage(
        g, feats, GraphSageConfig(**base, aggregator="pool")).collect()}
    assert em != ep


def test_graphsage_rejects_unknown_aggregator(spark):
    import pytest

    g, feats = _two_cliques(spark)
    with pytest.raises(ValueError, match="aggregator"):
        graphsage_train(g, feats, GraphSageConfig(aggregator="lstm"))


def test_pool_max_grad_splits_ties():
    """Tied argmax contributors share (split) the gradient instead of each
    receiving the full upstream gradient."""
    from neo4j_graph_data_science_spark.operators.graphsage import (
        _pool_max, _pool_max_grad,
    )

    # node 0 has neighbors 1 and 2 with IDENTICAL pooled rows
    P = np.array([[0.0], [3.0], [3.0]])
    ev = np.array([0, 0])
    eu = np.array([1, 2])
    M = _pool_max(P, ev, eu)
    assert M[0, 0] == 3.0
    dM = np.array([[2.0], [0.0], [0.0]])
    dP = _pool_max_grad(dM, P, M, ev, eu)
    assert dP[1, 0] == 1.0 and dP[2, 0] == 1.0   # split, not 2.0 each
    assert dP.sum() == 2.0
