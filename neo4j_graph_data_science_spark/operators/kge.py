"""Knowledge-graph-embedding link prediction (gds.ml.kge.predict).

Reference semantics (algo/src/main/java/org/neo4j/gds/algorithms/
machinelearning/TopKMapComputer.java:22, LinkScorerFactory.java):
given a per-node embedding property and one relationship-type embedding
vector r, score every candidate (source, target) pair with

  * DISTMULT (DoubleDistMultLinkScorer.java:  score = sum_i s_i*r_i*t_i,
    HIGHER is better), or
  * TRANSE   (DoubleEuclideanDistanceLinkScorer.java:
    score = sqrt(sum_i (s_i + r_i - t_i)^2), LOWER is better),

keep the top-k targets per source.  Candidate pairs are
(sourceNodeFilter x targetNodeFilter) minus self-pairs minus already-
existing relationships (TopKMapComputer.isCandidateLink: s != t &&
!graph.exists(s, t)); NaN scores are dropped (TopKMapComputer.compute).

Spark shape: the scoring is pure Catalyst (zip_with + aggregate over the
double-cast embedding arrays -- JVM codegen, no Python).  The target side
is broadcast: the reference itself is a brute-force sources x targets
double loop, so the contract here is "targets bounded by the filter".
At 100-TB scale with an unbounded target set, use operators/ann.ivf_topk
(DistMult on L2-normalized embeddings is cosine ANN) as the approximate
path; this operator is the exact-parity scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kge_predict(
    nodes: DataFrame,
    edges: DataFrame | None,
    rel_embedding: list[float],
    score_function: str = "distmult",
    top_k: int = 10,
    id_col: str = "id",
    vec_col: str = "embedding",
    source_filter: str | None = None,
    target_filter: str | None = None,
    broadcast_max_bytes: int = 512 * 1024 * 1024,
) -> DataFrame:
    """(source_id, target_id, score): top-k KGE-scored candidate links.

    ``nodes``: (id, embedding array<float|double>).  ``edges``: existing
    relationships (src, dst) excluded from candidates (None = no
    exclusion).  ``source_filter`` / ``target_filter``: SQL predicates
    over the pseudo-column ``node`` (the NodeFilterSpec analogue,
    KGEPredictParameters.java:32-33).

    Deterministic tie-break: (score best-first, target_id asc) --
    best-first is DESC for distmult, ASC for transe
    (TopKMapComputer.higherIsBetter).
    """
    from ..catalog import bind_node_filter

    if score_function not in ("distmult", "transe"):
        raise ValueError(f"unknown score_function {score_function!r}")

    r_lit = F.array(*[F.lit(float(v)) for v in rel_embedding])

    # zip_with pads the shorter array with nulls, so a rel_embedding whose
    # length differs from the node embedding dim would yield NULL scores
    # silently; validate up front with a one-row probe.
    probe = (nodes.select(F.size(F.col(vec_col)).alias("_d"))
             .filter(F.col("_d") >= 0).limit(1).collect())
    if probe and probe[0]["_d"] != len(rel_embedding):
        raise ValueError(
            f"rel_embedding length {len(rel_embedding)} != node embedding "
            f"dim {probe[0]['_d']} (column {vec_col!r})")

    src = nodes.select(F.col(id_col).alias("source_id"),
                       F.col(vec_col).cast("array<double>").alias("_sv"))
    tgt = nodes.select(F.col(id_col).alias("target_id"),
                       F.col(vec_col).cast("array<double>").alias("_tv"))
    src = bind_node_filter(src, source_filter, "source_id")
    tgt = bind_node_filter(tgt, target_filter, "target_id")

    # init(sourceNode): the scorer pre-combines source with r once per
    # source (DoubleDistMultLinkScorer.init / DoubleEuclidean...init);
    # here that is a per-row projection, computed once before the join
    if score_function == "distmult":
        src = src.withColumn(
            "_sr", F.zip_with("_sv", r_lit, lambda x, ri: x * ri))
    else:
        src = src.withColumn(
            "_sr", F.zip_with("_sv", r_lit, lambda x, ri: x + ri))

    # size-gate the broadcast IN BYTES, not rows: each target row carries
    # the embedding array (dim * 8B doubles + ~16B array header + ~16B row
    # overhead), so 5M rows at dim 64 would be ~2.5+ GB of payload before
    # hash-relation overhead -- far past any sane broadcast limit.  Budget
    # rows x estimated row width against broadcast_max_bytes (default
    # 512 MiB).  Below the gate the sources-x-targets scoring pipelines in
    # one stage; above it (unfiltered 100-TB target sets) the cross join
    # falls back to the planner's partitioned strategy -- and at that
    # scale the right tool is the ANN path (module docstring), not exact
    # KGE top-k.
    dim = len(rel_embedding)
    row_bytes = dim * 8 + 32
    n_tgt = tgt.count()
    cand = src.join(
        F.broadcast(tgt) if n_tgt * row_bytes <= broadcast_max_bytes
        else tgt,
        F.col("source_id") != F.col("target_id"))
    if edges is not None:
        exist = edges.select(F.col("src").alias("source_id"),
                             F.col("dst").alias("target_id")).distinct()
        # the exclusion set is usually far larger than the target set --
        # gate ITS broadcast separately (two longs per row, ~32B); above
        # the gate the anti-join shuffles, which is the only correct
        # shape at 10^9+ edges
        if exist.count() * 32 <= broadcast_max_bytes:
            exist = F.broadcast(exist)
        cand = cand.join(exist, ["source_id", "target_id"], "left_anti")

    if score_function == "distmult":
        score = F.aggregate(
            F.zip_with("_sr", "_tv", lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)
        order = [F.col("score").desc(), F.col("target_id").asc()]
    else:
        score = F.sqrt(F.aggregate(
            F.zip_with("_sr", "_tv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x))
        order = [F.col("score").asc(), F.col("target_id").asc()]

    # drop NULL scores as well as NaN: a null embedding yields NULL, and
    # under transe's ascending order Spark sorts nulls FIRST by default,
    # so an unfiltered NULL would occupy top-k slots the reference's
    # TopKMapComputer would never admit
    scored = (cand.withColumn("score", score)
              .filter(F.col("score").isNotNull() & ~F.isnan("score"))
              .select("source_id", "target_id", "score"))
    w = Window.partitionBy("source_id").orderBy(*order)
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_k)
            .drop("_rn"))
