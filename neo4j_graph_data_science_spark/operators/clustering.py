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
