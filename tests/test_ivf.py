"""IVF-Flat ANN (operators/ann.ivf_index / ivf_topk): the coarse-quantizer
scale path. Key properties: probing ALL cells degrades to exact brute
force; partial probe keeps high recall on clustered data; the pipeline is
deterministic (pinned Lloyd init + rounded normalization)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neo4j_graph_data_science_spark.operators.ann import (
    brute_force_topk, ivf_index, ivf_topk,
)


def _clustered_vectors(spark, n_clusters=4, per_cluster=30, dim=8):
    """Deterministic blobs: cluster (vid % n_clusters) centered at 10*e_c,
    hash-jittered. Cluster ids INTERLEAVE across vec_ids so the pinned
    Lloyd init (vectors of the k smallest ids) starts one centroid per
    blob -- the quantizer-quality tests then measure the probe logic, not
    k-means init sensitivity."""
    rows = []
    for c in range(n_clusters):
        for j in range(per_cluster):
            vid = j * n_clusters + c
            vec = []
            for d in range(dim):
                base = 10.0 if d == c else 0.0
                h = (vid * 7919 + d * 104729 + 13) % 1000
                vec.append(base + (h / 1000.0 - 0.5))
            rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_full_probe_equals_brute_force(spark):
    emb = _clustered_vectors(spark)
    queries = emb.filter(F.col("vec_id") % 17 == 0)
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_cells=4, n_probe=4,
                      quantizer_iterations=2)
    e = {(r.query_id, r.neighbor_id): r.cosine for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id): r.cosine for r in approx.collect()}
    assert set(e) == set(a)
    for key in e:
        assert math.isclose(e[key], a[key], abs_tol=1e-9)


def test_ivf_partial_probe_recall_on_blobs(spark):
    emb = _clustered_vectors(spark)
    queries = emb.filter(F.col("vec_id") % 11 == 0)
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_cells=4, n_probe=1,
                      quantizer_iterations=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # blobs are well separated: a 1-of-4 probe still finds ~all true
    # neighbors (they live in the query's own cell)
    assert len(e & a) / len(e) >= 0.9
    # and the candidate set was genuinely restricted: no cross-cluster
    # neighbors at k=5 on separated blobs
    assert len(a - e) <= len(e) // 10 + 1


def test_ivf_deterministic(spark):
    emb = _clustered_vectors(spark, n_clusters=3, per_cluster=20)
    queries = emb.filter(F.col("vec_id") < 5)
    r1 = sorted(map(tuple, ivf_topk(emb, queries, k=3, n_cells=3,
                                    n_probe=2).collect()))
    r2 = sorted(map(tuple, ivf_topk(emb, queries, k=3, n_cells=3,
                                    n_probe=2).collect()))
    assert r1 == r2


def test_ivf_index_partitions_corpus(spark):
    emb = _clustered_vectors(spark)
    lists, cent = ivf_index(emb, n_cells=4, quantizer_iterations=3)
    assert lists.count() == emb.count()          # every vector assigned
    assert cent.count() == 4
    # well-separated blobs -> quantizer recovers them: each cell is pure
    sizes = lists.groupBy("cell").count().collect()
    assert len(sizes) == 4
    spread = (lists.withColumn("true_c", F.col("id") % 4)
              .groupBy("cell").agg(F.countDistinct("true_c").alias("nc"))
              .agg(F.max("nc")).collect()[0][0])
    assert spread == 1


def test_lsh_paths_tolerate_null_and_ragged_vectors(spark):
    """The Arrow signature kernel would crash on a NULL / wrong-length
    embedding (np.stack raises on ragged batches); such rows must drop
    out of the bucket join like the round-3 NULL-signature behavior."""
    from neo4j_graph_data_science_spark.operators.ann import (
        cosine_near_duplicates, lsh_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),
        (2, None),
        (3, [1.0, 0.0]),           # wrong length
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r.vec_a, r.vec_b)
             for r in cosine_near_duplicates(emb, threshold=0.9,
                                             method="lsh").collect()}
    assert (0, 1) in pairs
    assert all(2 not in p and 3 not in p for p in pairs)
    top = lsh_topk(emb, emb, k=2, n_planes=4).collect()
    ids = {r.query_id for r in top} | {r.neighbor_id for r in top}
    assert 2 not in ids and 3 not in ids and len(top) > 0


def test_lsh_dim_probe_survives_null_and_ragged_first_rows(spark):
    """dim inference must be null-safe and modal: a NULL or ragged FIRST
    row must neither crash the probe nor mis-infer the corpus dim."""
    from neo4j_graph_data_science_spark.operators.ann import (
        cosine_near_duplicates, lsh_topk,
    )

    rows = [
        (2, None),
        (3, [1.0, 0.0]),                    # ragged, first non-null
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [1.0, None, 0.0, 0.0]),          # null ELEMENT
    ]
    emb = (spark.createDataFrame(rows, "vec_id long, embedding array<double>")
           .coalesce(1).sortWithinPartitions("vec_id"))
    pairs = {(r.vec_a, r.vec_b)
             for r in cosine_near_duplicates(emb, threshold=0.9,
                                             method="lsh").collect()}
    assert (0, 1) in pairs                  # dim inferred as 4, not 2
    assert all(5 not in p for p in pairs)   # null-element row dropped
    top = lsh_topk(emb, emb, k=3, n_planes=4).collect()
    assert len(top) > 0
    assert all(r.cosine is not None for r in top)

    allnull = spark.createDataFrame([(9, None)],
                                    "vec_id long, embedding array<double>")
    assert cosine_near_duplicates(allnull, method="lsh").count() == 0
    assert lsh_topk(allnull, allnull).count() == 0


def test_lsh_probe_dim_null_plurality_legacy_size_conf(spark):
    """Round-4 ADVICE: with spark.sql.ansi.enabled=false (legacy
    sizeOfNull -> size(NULL) = -1), a NULL-plurality corpus must still
    probe the modal dim from the NON-null vectors instead of yielding
    dim=-1 and silently returning empty."""
    from neo4j_graph_data_science_spark.operators.ann import lsh_topk

    prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        rows = [(i, None) for i in range(6)] + \
               [(10 + i, [1.0 * i, 2.0, 3.0]) for i in range(4)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        top = lsh_topk(emb, emb, k=2, n_planes=2)
        assert top.count() > 0
        assert {r.query_id for r in top.collect()} <= {10, 11, 12, 13}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_lsh_probe_dim_empty_array_plurality(spark):
    """Code-review r5: empty arrays (failed upstream featurization) must
    be excluded from the modal-dim probe like NULLs -- an empty-plurality
    corpus still probes dim from the valid vectors."""
    from neo4j_graph_data_science_spark.operators.ann import lsh_topk

    rows = [(i, []) for i in range(6)] + \
           [(10 + i, [1.0 * i, 2.0, 3.0]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = lsh_topk(emb, emb, k=2, n_planes=2)
    assert top.count() > 0
    assert {r.query_id for r in top.collect()} <= {10, 11, 12, 13}
