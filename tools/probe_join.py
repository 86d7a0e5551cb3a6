"""Probe: per-superstep join strategy x partition count on the scaling graph.

Round-3 scaling diagnosis: the PageRank superstep's state-to-edges join is a
SortMergeJoin, so the 31M-row persisted edge table is RE-SORTED every
superstep (partitioning persists; sort order does not). A shuffled-hash
join (build = the small state side, stream = the pre-partitioned edges)
removes that per-superstep sort. Separately, shuffle_partitions=16 gives
only 2 task waves per stage at 8 cores (straggler-sensitive with AQE off
in the loop).

This probe times the SAME superstep loop (run_pregel, check_every=3,
9 supersteps, stats fast path) across variants, one subprocess per variant:
  join in {smj, hash} x partitions in {16, 64}

Usage: python tools/probe_join.py [--convs 800000] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus, n_convs, join, parts = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
from pyspark.sql import functions as F
from neo4j_graph_data_science_spark.session import get_spark
from neo4j_graph_data_science_spark.sources.transcripts import transcript_graph
from neo4j_graph_data_science_spark.catalog import DST, SRC, W
from neo4j_graph_data_science_spark.plans.pregel import (
    PregelConfig, prepare_edges, run_pregel)

spark = get_spark("probe_join", master=f"local[{cpus}]",
                  shuffle_partitions=parts)
g = transcript_graph(spark, n_convs=n_convs, seed=42, max_turns=40,
                     dense_ids=False)
edges = prepare_edges(g.aggregated_edges("COUNT"), parts)
n_edges = edges.count()
deg = edges.groupBy(F.col(SRC).alias("id")).agg(F.sum(W).alias("out_deg"))
state0 = (g.nodes.select("id").join(deg, "id", "left")
          .select("id", F.lit(0.15).alias("rank"),
                  F.coalesce("out_deg", F.lit(0.0)).alias("out_deg"))
          .withColumn("contrib", F.when(F.col("out_deg") > 0,
                      F.col("rank") / F.col("out_deg")).otherwise(F.lit(0.0)))
          .withColumn("delta", F.col("rank")))

def hintit(df):
    return df.hint("shuffle_hash") if join == "hash" else df

def superstep(state, it):
    msgs = (edges.join(
                hintit(state.select(F.col("id").alias(SRC), "contrib")), SRC)
            .select(F.col(DST).alias("id"),
                    (F.col("contrib") * F.col(W)).alias("_m"))
            .groupBy("id").agg(F.sum("_m").alias("msg")))
    return (state.join(hintit(msgs), "id", "left")
            .select("id",
                    (F.lit(0.15) + F.lit(0.85) * F.coalesce("msg", F.lit(0.0))
                     ).alias("rank"),
                    "out_deg",
                    F.abs(F.lit(0.15) + F.lit(0.85)
                          * F.coalesce("msg", F.lit(0.0))
                          - F.col("rank")).alias("delta"))
            .withColumn("contrib", F.when(F.col("out_deg") > 0,
                        F.col("rank") / F.col("out_deg"))
                        .otherwise(F.lit(0.0))))

# warmup: 2 supersteps end to end
run_pregel(state0, superstep, lambda o, n, i: False,
           PregelConfig(max_iterations=2, tolerance=0.0, track_metrics=True),
           stats=[F.max("delta")],
           converged_stats=lambda row, it: False)
res = run_pregel(state0, superstep, lambda o, n, i: False,
                 PregelConfig(max_iterations=9, tolerance=0.0,
                              check_every=3, track_metrics=True),
                 stats=[F.max("delta")],
                 converged_stats=lambda row, it: False)
loop_wall = sum(m["wall_s"] for m in res.metrics)
print(json.dumps({
    "join": join, "parts": parts, "cpus": cpus, "edges": n_edges,
    "supersteps": res.iterations, "wall_s": round(loop_wall, 3),
    "edges_per_sec_per_superstep":
        round(n_edges * res.iterations / loop_wall, 1),
}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=800000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--variants", nargs="*",
                    default=["smj,16", "hash,16", "smj,64", "hash,64"])
    args = ap.parse_args()
    for v in args.variants:
        join, parts = v.split(",")
        try:
            out = subprocess.run(
                [sys.executable, "-c", WORKER, str(args.cpus),
                 str(args.convs), join, parts],
                capture_output=True, text=True, timeout=2700)
            line = [l for l in out.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            print(line, flush=True)
        except Exception as ex:  # noqa: BLE001
            print(json.dumps({"variant": v,
                              "error": f"{type(ex).__name__}: {ex}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
