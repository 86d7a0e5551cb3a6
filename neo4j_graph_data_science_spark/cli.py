"""spark-submit entrypoint: run an algorithm over a transcript table.

    spark-submit --py-files gds_spark.zip -m neo4j_graph_data_science_spark.cli \
        pagerank --input /data/transcripts --output /out/scores \
        --checkpoint-dir /ckpt --run-id run42

On a cluster, --input is an Iceberg table name (``--format iceberg``) or a
parquet directory; the derived link graph, the superstep checkpoints and
the result write-back all flow through the same code paths the tests and
benchmarks exercise. A killed run re-invoked with the same
--checkpoint-dir/--run-id resumes from the last committed superstep.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from .catalog import SparkGraph
from .operators.labelprop import LabelPropagationConfig, label_propagation
from .operators.pagerank import PageRankConfig, page_rank
from .operators.scc import SccConfig, scc
from .operators.triangle import TriangleCountConfig, triangle_count
from .operators.wcc import WccConfig, wcc
from .session import get_spark
from .sources.transcripts import derive_edges, transcript_id_map

ALGOS = ("pagerank", "wcc", "scc", "labelprop", "triangles", "betweenness",
         "louvain", "leiden", "degree", "hits", "fastrp", "node2vec",
         "kcore", "closeness", "harmonic", "nodesim")


def load_transcripts(spark: SparkSession, path: str, fmt: str):
    if fmt == "iceberg":
        return spark.read.table(path)
    return spark.read.format(fmt).load(path)


def build_graph(transcripts) -> SparkGraph:
    idm = transcript_id_map(transcripts)
    edges = derive_edges(transcripts, idm)
    return SparkGraph(nodes=idm.select("id"), edges=edges, id_map=idm,
                      name="transcripts")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gds-spark")
    p.add_argument("algorithm", choices=ALGOS)
    p.add_argument("--input", required=True,
                   help="transcript table: parquet dir or iceberg table name")
    p.add_argument("--format", default="parquet",
                   choices=("parquet", "iceberg", "orc", "csv"))
    p.add_argument("--output", required=True,
                   help="result sink: parquet dir (or iceberg table with --output-iceberg)")
    p.add_argument("--output-iceberg", action="store_true")
    p.add_argument("--output-format", choices=("parquet", "csv"),
                   default="parquet",
                   help="result file format when not writing to Iceberg")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--run-id", default="run")
    p.add_argument("--max-iterations", type=int, default=None)
    p.add_argument("--tolerance", type=float, default=1e-7)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    p.add_argument("--sampling-size", type=int, default=None,
                   help="betweenness: number of sampled sources (None = exact)")
    args = p.parse_args(argv)

    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark(f"gds_spark_{args.algorithm}", master=args.master)
    t = load_transcripts(spark, args.input, args.format)
    g = build_graph(t)

    meta: dict = {"algorithm": args.algorithm, "run_id": args.run_id}
    if args.algorithm == "pagerank":
        res = page_rank(g, PageRankConfig(
            damping_factor=args.damping,
            max_iterations=args.max_iterations or 20,
            tolerance=args.tolerance,
            checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id,
            partitions=args.partitions,
        ))
        out, meta["iterations"], meta["converged"] = res.state, res.iterations, res.converged
    elif args.algorithm == "wcc":
        res = wcc(g, WccConfig(
            max_iterations=args.max_iterations or 100,
            checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, partitions=args.partitions,
        ))
        out, meta["iterations"], meta["converged"] = res.state, res.iterations, res.converged
    elif args.algorithm == "labelprop":
        res = label_propagation(g, LabelPropagationConfig(
            max_iterations=args.max_iterations or 10,
            checkpoint_dir=args.checkpoint_dir,
            run_id=args.run_id, partitions=args.partitions,
        ))
        out, meta["iterations"], meta["converged"] = res.state, res.iterations, res.converged
    elif args.algorithm == "scc":
        out = scc(g, SccConfig(partitions=args.partitions))
    elif args.algorithm == "triangles":
        out = triangle_count(g, TriangleCountConfig())
    elif args.algorithm == "betweenness":
        from .operators.betweenness import BetweennessConfig, betweenness
        out = betweenness(g, BetweennessConfig(
            sampling_size=args.sampling_size))
    elif args.algorithm == "louvain":
        from .operators.louvain import LouvainConfig, louvain
        labels, meta["levels"], meta["modularities"] = louvain(
            g, LouvainConfig(max_levels=args.max_iterations or 10))
        out = labels
    elif args.algorithm == "leiden":
        from .operators.leiden import LeidenConfig, leiden
        labels, meta["levels"], meta["modularities"] = leiden(
            g, LeidenConfig(max_levels=args.max_iterations or 10))
        out = labels
    elif args.algorithm == "degree":
        out = g.degrees()
    elif args.algorithm == "hits":
        from .operators.centrality import HitsConfig, hits
        out = hits(g, HitsConfig(hits_iterations=args.max_iterations or 20))
    elif args.algorithm == "fastrp":
        from .operators.embeddings import FastRPConfig, fast_rp
        out = fast_rp(g, FastRPConfig(partitions=args.partitions))
    elif args.algorithm == "kcore":
        from .operators.community import KCoreConfig, k_core
        out = k_core(g, KCoreConfig())
    elif args.algorithm == "closeness":
        from .operators.centrality import ClosenessConfig, closeness_centrality
        out = closeness_centrality(g, ClosenessConfig())
    elif args.algorithm == "harmonic":
        from .operators.centrality import ClosenessConfig, harmonic_centrality
        out = harmonic_centrality(g, ClosenessConfig())
    elif args.algorithm == "nodesim":
        from .operators.similarity import NodeSimilarityConfig, node_similarity
        out = node_similarity(g.edges.select("src", "dst").distinct(),
                              "src", "dst", NodeSimilarityConfig())
    else:
        from .operators.embeddings import Node2VecConfig, node2vec
        out = node2vec(g, Node2VecConfig())

    if args.algorithm == "nodesim" and g.id_map is not None:
        # pair-shaped result: map BOTH endpoints back to original keys,
        # prefixing the key columns so the two joins don't collide
        from pyspark.sql import functions as F
        for c in ("node1", "node2"):
            m = g.id_map.select(
                F.col("id").alias(c),
                *[F.col(k).alias(f"{c}_{k}")
                  for k in g.id_map.columns if k != "id"])
            out = out.join(m, c)
        result = out
    else:
        result = g.to_original_ids(out)
    if args.output_iceberg:
        result.writeTo(args.output).createOrReplace()
    elif args.output_format == "csv":
        from pyspark.sql import functions as F

        cols = [
            F.to_json(c).alias(c) if t.startswith(("array", "struct"))
            else F.col(c)
            for c, t in result.dtypes
        ]
        result.select(*cols).write.mode("overwrite") \
            .option("header", True).csv(args.output)
    else:
        result.write.mode("overwrite").parquet(args.output)
    meta["rows"] = result.count()
    print(json.dumps(meta))
    if not pre_existing:  # don't tear down a caller-owned session
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
