"""Superstep tuning experiment: where does PageRank superstep time go and
which knobs move it? Runs one deterministic transcript graph under several
Spark configs in separate JVMs and prints per-superstep wall times.

Usage: python tools/bench_tune.py [--convs 150000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); n_convs = int(sys.argv[2])
conf = json.loads(sys.argv[3])
from neo4j_graph_data_science_spark.session import get_spark
from neo4j_graph_data_science_spark.sources.transcripts import transcript_graph
from neo4j_graph_data_science_spark.operators.pagerank import PageRankConfig, page_rank

shuffle = int(conf.pop("_shuffle", cpus))
truncate = int(conf.pop("_truncate", 2))
spark = get_spark("tune", master=f"local[{cpus}]", shuffle_partitions=shuffle,
                  extra_conf=conf)
g = transcript_graph(spark, n_convs=n_convs, seed=42, max_turns=40)
n_edges = g.edges.count()
import neo4j_graph_data_science_spark.plans.pregel as P
import neo4j_graph_data_science_spark.operators.pagerank as PR
# apply the truncate-cadence knob: wrap run_pregel where page_rank bound it
# (dataclass defaults are frozen at class creation, so patching the
# PregelConfig class attribute would silently do nothing)
_orig_run = PR.run_pregel
def _patched_run(state0, superstep, converged, config, **kw):
    config.truncate_every = truncate
    return _orig_run(state0, superstep, converged, config, **kw)
PR.run_pregel = _patched_run
page_rank(g, PageRankConfig(max_iterations=3, tolerance=0.0))  # warmup
t0 = time.time()
res = page_rank(g, PageRankConfig(max_iterations=11, tolerance=0.0))
res.state.count()
wall = time.time() - t0
per = [m["wall_s"] for m in res.metrics]
print(json.dumps({"edges": n_edges, "wall": round(wall,2), "per_superstep": per,
                  "eps": round(n_edges*res.iterations/wall,1)}))
spark.stop()
"""

CONFIGS = {
    "base": {},
    "heap16g": {"spark.driver.memory": "16g"},
    "heap16g_g1": {"spark.driver.memory": "16g",
                   "spark.driver.extraJavaOptions": "-XX:+UseG1GC -XX:MaxGCPauseMillis=200"},
    "shuffle2x": {"_shuffle": 64},
    "no_aqe_coalesce": {"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    "truncate4": {"_truncate": 4},
    "bigbatch_arrow": {"spark.sql.execution.arrow.maxRecordsPerBatch": "100000"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=150000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS))
    args = ap.parse_args()
    for name in args.configs:
        conf = CONFIGS[name]
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(args.cpus), str(args.convs),
             json.dumps(conf)],
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        print(name, lines[-1] if lines else out.stderr[-500:], flush=True)


if __name__ == "__main__":
    main()
