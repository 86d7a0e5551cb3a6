"""K-means over vectors + node2vec embedding quality."""

from __future__ import annotations

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.clustering import (
    KmeansConfig,
    kmeans,
    lloyd_kmeans,
)
from neo4j_graph_data_science_spark.operators.embeddings import (
    Node2VecConfig,
    node2vec,
)


def test_kmeans_separated_clusters(spark):
    # two well-separated blobs in 4-d (deterministic jitter)
    rows = []
    for i in range(20):
        j = (i % 7) * 0.01
        rows.append((i, [0.0 + j, 0.0, 0.0, j]))
        rows.append((100 + i, [10.0 + j, 10.0, 10.0, j]))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    res = kmeans(df, KmeansConfig(k=2, seed=1)).collect()
    comm = {r["id"]: r["community"] for r in res}
    lo = {comm[i] for i in range(20)}
    hi = {comm[100 + i] for i in range(20)}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi
    assert all(r["distance_from_centroid"] < 1.0 for r in res)


def test_lloyd_kmeans_deterministic_clusters(spark):
    # same blobs: the pinned-init Lloyd variant must separate them too,
    # and two runs must agree exactly (no RNG anywhere)
    rows = []
    for i in range(20):
        j = (i % 7) * 0.01
        rows.append((i, [0.0 + j, 0.0, 0.0, j]))
        rows.append((100 + i, [10.0 + j, 10.0, 10.0, j]))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    a = {r["id"]: (r["community"], round(r["distance_from_centroid"], 9))
         for r in lloyd_kmeans(df, k=2, iterations=4).collect()}
    b = {r["id"]: (r["community"], round(r["distance_from_centroid"], 9))
         for r in lloyd_kmeans(df, k=2, iterations=4).collect()}
    assert a == b
    lo = {a[i][0] for i in range(20)}
    hi = {a[100 + i][0] for i in range(20)}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi


def test_kmeans_silhouette_bounds(spark):
    rows = [(i, [float(i % 2) * 8, 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    res = kmeans(df, KmeansConfig(k=2, seed=1, compute_silhouette=True)).collect()
    for r in res:
        assert -1.0 <= r["silhouette"] <= 1.0
    assert sum(r["silhouette"] for r in res) / len(res) > 0.5


def test_node2vec_community_similarity(spark):
    # two cliques joined by one edge: same-clique embeddings must be more
    # similar than cross-clique on average (link-reconstruction smoke)
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a + 5, b + 5) for a, b in k1]
    g = from_edge_list(spark, k1 + k2 + [(4, 5)], n_nodes=10)
    emb = {r["id"]: r["embedding"]
           for r in node2vec(g, Node2VecConfig(
               embedding_dim=8, walk_length=12, walks_per_node=20,
               iterations=4)).collect()}
    assert len(emb) == 10

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb + 1e-12)

    same, cross = [], []
    for i in range(10):
        for j in range(i + 1, 10):
            (same if (i < 5) == (j < 5) else cross).append(cos(emb[i], emb[j]))
    assert sum(same) / len(same) > sum(cross) / len(cross)


def test_node2vec_native_sgns_parameter_surface(spark):
    """Round-4 verdict #7: the native trainer exposes the reference's SGNS
    parameter surface (Node2VecBaseConfig.java:32-77). Formula parity for
    the sampling machinery + the same clique-separation quality bar as
    the word2vec backend, at matched reference-default parameters."""
    import numpy as np

    from neo4j_graph_data_science_spark.operators.embeddings import (
        _negative_cumdist, _positive_keep_probs,
    )

    # keep-prob formula (RandomWalkProbabilitiesBuilder.java:92)
    counts = np.array([50, 10, 1], dtype="int64")
    probs = _positive_keep_probs(counts, 61, 0.001)
    for c, p in zip(counts, probs):
        f = c / 61
        expected = (np.sqrt(f / 0.001) + 1) * (0.001 / f)
        assert abs(p - expected) < 1e-12
    assert probs[0] < probs[1] < probs[2]  # frequent nodes kept less

    # negative distribution ~ freq^0.75, cumulative (binary-search form)
    cum = _negative_cumdist(counts, 0.75)
    assert cum[-1] == np.sum(counts.astype(float) ** 0.75)
    assert np.all(np.diff(cum) > 0)

    # quality at reference defaults (negative_sampling_rate=5, psf=0.001,
    # exponent=0.75, lr 0.025 -> 1e-4, NORMALIZED init)
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a + 5, b + 5) for a, b in k1]
    g = from_edge_list(spark, k1 + k2 + [(4, 5)], n_nodes=10)
    emb = {r["id"]: r["embedding"]
           for r in node2vec(g, Node2VecConfig(
               embedding_dim=8, walk_length=12, walks_per_node=20,
               iterations=4, trainer="native")).collect()}
    assert len(emb) == 10

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb + 1e-12)

    same, cross = [], []
    for i in range(10):
        for j in range(i + 1, 10):
            (same if (i < 5) == (j < 5) else cross).append(cos(emb[i], emb[j]))
    assert sum(same) / len(same) > sum(cross) / len(cross)

    # determinism: same seed -> identical embeddings
    emb2 = {r["id"]: r["embedding"]
            for r in node2vec(g, Node2VecConfig(
                embedding_dim=8, walk_length=12, walks_per_node=20,
                iterations=4, trainer="native")).collect()}
    assert all(np.allclose(emb[i], emb2[i]) for i in emb)

    # corpus guard + unknown trainer
    import pytest

    with pytest.raises(ValueError, match="max_corpus_size"):
        node2vec(g, Node2VecConfig(trainer="native", max_corpus_size=3))
    with pytest.raises(ValueError, match="unknown trainer"):
        node2vec(g, Node2VecConfig(trainer="bogus"))
