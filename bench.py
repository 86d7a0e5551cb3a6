"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extras": {...}}

The extras record the north-star metric (edges processed per second per
PageRank superstep) and the per-superstep wall times, so scaling-efficiency
runs (tools/bench_scaling.py, local[8] vs local[32]) can compare
throughput at two parallelism levels on the same input.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graph_data_science_spark.session import get_spark  # noqa: E402
from neo4j_graph_data_science_spark.operators.pagerank import (  # noqa: E402
    PageRankConfig, page_rank,
)
from neo4j_graph_data_science_spark.operators.wcc import WccConfig, wcc  # noqa: E402
from neo4j_graph_data_science_spark.operators.labelprop import (  # noqa: E402
    LabelPropagationConfig, label_propagation,
)
from neo4j_graph_data_science_spark.operators.triangle import (  # noqa: E402
    TriangleCountConfig, triangle_count,
)
from neo4j_graph_data_science_spark.sources.tables import (  # noqa: E402
    events_graph, part_co_occurrence_graph,
)
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark("gds_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    timings: dict[str, float] = {}
    extras: dict[str, object] = {"cpus": cpus}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"  bench {name}: {timings[name]}s", file=sys.stderr, flush=True)
        return out

    # --- north-star: PageRank to convergence over the event link graph ----
    g = events_graph(spark, sf_dir)
    n_edges = g.edges.count()
    t0 = time.time()
    # run to actual 1e-6 convergence (north-star metric is convergence-
    # gated; round 1 mislabeled an iteration-capped run)
    # check_every=3 batches 3 supersteps per Spark job (plans/pregel.py):
    # fixed per-job costs dominate at this scale; results stay within the
    # 1e-6 tolerance (convergence detection delayed <3 supersteps)
    res = page_rank(g, PageRankConfig(max_iterations=100, tolerance=1e-6,
                                      check_every=3))
    res.state.count()
    pr_wall = time.time() - t0
    timings["pagerank_events"] = round(pr_wall, 3)
    supersteps = max(res.iterations, 1)
    extras["edges"] = n_edges
    extras["pagerank_supersteps"] = supersteps
    extras["edges_per_sec_per_superstep"] = round(n_edges * supersteps / pr_wall, 1)
    extras["pagerank_converged"] = res.converged

    timed("wcc_events", lambda: wcc(g, WccConfig()).state.count())
    # NOTE: batching (check_every=5) measured SLOWER here (20 s vs 9 s):
    # LPA's superstep is two shuffles + a window, so a 5-deep lazy chain
    # trades 5 small jobs for one massive-plan job and loses
    timed("lpa_events", lambda: label_propagation(
        g, LabelPropagationConfig(max_iterations=5)).state.count())

    gp = part_co_occurrence_graph(spark, sf_dir)
    timed("triangles_parts", lambda: triangle_count(
        gp, TriangleCountConfig()).agg(F.sum("triangles")).collect())

    q = entrymod.queries()
    for name in ("degree_events", "minhash_lsh_fast", "ann_topk",
                 "node_similarity_customers", "token_stats_docs",
                 "betweenness_parts_mod"):
        timed(name, lambda n=name: q[n](spark, sf_dir).count())

    # near-dup at a REALISTIC threshold (0.9): the banded-LSH prefilter
    # keeps candidates sparse; the 0.45-threshold contract query is a
    # recall demo, not the production operating point
    from neo4j_graph_data_science_spark.operators.ann import (  # noqa: E402
        cosine_near_duplicates,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("cosine_near_dup_lsh09",
          lambda: cosine_near_duplicates(emb, threshold=0.9, method="lsh").count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline-suite wall time (pagerank/wcc/lpa/triangles/dedup/ann/text)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extras": extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
