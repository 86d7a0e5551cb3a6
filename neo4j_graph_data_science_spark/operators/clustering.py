"""Vector clustering over node properties: K-means (and its GDS result
shape: communityId + distanceFromCentroid + optional silhouette).

Reference: kmeans/Kmeans.java:41 -- Lloyd iterations over a node property
of type float array, with K-means|| init and per-node distance results
(KmeansResult: communities, distances, centers, optional silhouette).
Spark-first: delegate the Lloyd loop to spark.ml.clustering.KMeans (JVM,
DataFrame-native, one pass per iteration) instead of re-implementing it,
then derive distances/silhouette as Catalyst expressions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import SparkGraph


@dataclass
class KmeansConfig:
    k: int = 10
    max_iterations: int = 20
    seed: int = 42
    compute_silhouette: bool = False


def kmeans(vectors: DataFrame, config: KmeansConfig | None = None,
           id_col: str = "id", vec_col: str = "embedding") -> DataFrame:
    """(id, community, distance_from_centroid [, silhouette]).

    `vectors` is any (id, array<numeric>) DataFrame -- a node property,
    FastRP/node2vec output, or the embeddings table.
    """
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    cfg = config or KmeansConfig()
    feat = vectors.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
    )
    model = MLKMeans(
        k=cfg.k, maxIter=cfg.max_iterations, seed=cfg.seed,
        featuresCol="_features", predictionCol="community",
    ).fit(feat)
    pred = model.transform(feat)

    centers = feat.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "community int, _center array<double>",
    )
    dist = F.sqrt(F.aggregate(
        F.zip_with(vector_to_array("_features"), F.col("_center"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    out = (
        pred.join(F.broadcast(centers), "community")
        .select("id", F.col("community").cast("long").alias("community"),
                dist.alias("distance_from_centroid"))
    )
    if not cfg.compute_silhouette:
        return out
    # simplified silhouette (centroid-based, as in GDS's optional variant):
    # b = distance to nearest OTHER centroid, a = distance to own centroid
    other = (
        pred.join(F.broadcast(centers.withColumnRenamed("community", "_oc")))
        .filter(F.col("_oc") != F.col("community"))
        .select("id", dist.alias("_od"))
        .groupBy("id").agg(F.min("_od").alias("_b"))
    )
    return (
        out.join(other, "id", "left")
        .select(
            "id", "community", "distance_from_centroid",
            ((F.col("_b") - F.col("distance_from_centroid"))
             / F.greatest(F.col("_b"), F.col("distance_from_centroid")))
            .alias("silhouette"),
        )
    )


def kmeans_node_property(graph: SparkGraph, property_col: str,
                         config: KmeansConfig | None = None) -> DataFrame:
    """GDS entry shape: cluster graph nodes on an array node property."""
    return kmeans(graph.nodes.select("id", property_col), config,
                  id_col="id", vec_col=property_col)


@dataclass
class HdbscanConfig:
    min_pts: int = 5             # core-distance neighbor count
    knn_k: int = 15              # candidate-edge pool per point
    cut_distance: float = 1.0    # flat extraction level (HDBSCAN(eps))
    min_cluster_size: int = 5
    nn_iterations: int = 3


def hdbscan(vectors: DataFrame, config: HdbscanConfig | None = None,
            id_col: str = "id", vec_col: str = "embedding") -> DataFrame:
    """(id, cluster): density clustering over a vector column
    (hdbscan/HDBScan.java:32). Pipeline, each stage a distributed operator:

      1. kNN graph (NN-Descent over euclidean distance) -- candidate pool;
      2. core distance = distance to the min_pts-th neighbor;
      3. mutual-reachability weights mr(a,b) = max(core_a, core_b, d(a,b))
         on the kNN candidate edges (the standard scalable approximation of
         the all-pairs mutual-reachability graph);
      4. minimum spanning tree over those weights (Boruvka,
         operators/spanningtree);
      5. flat extraction: cut MST edges above cut_distance, clusters =
         remaining components, components smaller than min_cluster_size
         become noise (cluster = -1) -- the HDBSCAN(eps) flat variant; the
         reference's condensed-tree stability selection is a driver-side
         post-pass over the O(V) MST that this pipeline makes available.
    """
    from ..catalog import DST, SRC, SparkGraph, W
    from ..plans.checkpoint import truncate
    from .spanningtree import spanning_tree
    from .wcc import WccConfig, wcc

    cfg = config or HdbscanConfig()
    pts = vectors.select(F.col(id_col).alias("id"),
                         F.col(vec_col).cast("array<double>").alias("_v"))
    pts = truncate(pts, "hdb_pts")

    # kNN by euclidean distance: NN-Descent's refinement loop with its
    # euclidean SimilarityComputer (the distances it returns are exact for
    # the candidate pairs it keeps)
    from .ann import nn_descent_topk

    scored = nn_descent_topk(
        pts.select(F.col("id").alias("vec_id"), F.col("_v").alias("embedding")),
        k=max(cfg.knn_k, cfg.min_pts), iterations=cfg.nn_iterations,
        metric="euclidean",
    ).select(F.col("query_id").alias("a"), F.col("neighbor_id").alias("b"),
             F.col("distance").alias("d"))
    scored = truncate(scored, "hdb_knn")

    from pyspark.sql.window import Window

    win = Window.partitionBy("a").orderBy(F.col("d").asc(), F.col("b").asc())
    ranked = scored.withColumn("_rn", F.row_number().over(win))
    core = (
        ranked.filter(F.col("_rn") <= cfg.min_pts)
        .groupBy("a").agg(F.max("d").alias("core"))
        .withColumnRenamed("a", "id")
    )
    mr = (
        scored.join(core.select(F.col("id").alias("a"),
                                F.col("core").alias("_ca")), "a")
        .join(core.select(F.col("id").alias("b"), F.col("core").alias("_cb")), "b")
        .select(
            F.least("a", "b").alias(SRC), F.greatest("a", "b").alias(DST),
            F.greatest("d", "_ca", "_cb").alias(W),
        )
        .groupBy(SRC, DST).agg(F.min(W).alias(W))
        .select(SRC, DST, F.lit("MR").alias("rel_type"), W)
    )
    g = SparkGraph(nodes=pts.select("id"), edges=mr)
    tree = spanning_tree(g)
    kept = tree.filter(F.col(W) <= cfg.cut_distance)
    comp = wcc(SparkGraph(
        nodes=pts.select("id"),
        edges=kept.select(SRC, DST, F.lit("T").alias("rel_type"), W),
    ), WccConfig()).state
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("_sz"))
    return (
        comp.join(sizes, "component")
        .select(
            "id",
            F.when(F.col("_sz") >= cfg.min_cluster_size, F.col("component"))
            .otherwise(F.lit(-1)).alias("cluster"),
        )
    )
