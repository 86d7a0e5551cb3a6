"""Checkpoint/resume: a run killed after superstep k resumes and produces
identical output (north-rule resumability requirement; BASELINE.md)."""

from __future__ import annotations

import math

from neo4j_graph_data_science_spark import from_edge_list
from neo4j_graph_data_science_spark.operators.pagerank import PageRankConfig, page_rank
from neo4j_graph_data_science_spark.plans.checkpoint import CheckpointManager

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 2), (1, 5)]


def _scores(res):
    return {r["id"]: r["score"] for r in res.state.collect()}


def test_resume_mid_iteration_identical(spark, tmp_path):
    g = from_edge_list(spark, EDGES, n_nodes=6)
    full = _scores(page_rank(g, PageRankConfig(max_iterations=12, tolerance=0.0)))

    ckpt = str(tmp_path / "ck")
    # simulate a kill after superstep 5: run with max_iterations=5
    partial = page_rank(
        g, PageRankConfig(max_iterations=5, tolerance=0.0,
                          checkpoint_dir=ckpt, run_id="r1"),
    )
    assert partial.iterations == 5
    cm = CheckpointManager(ckpt, "r1")
    # 5 GDS supersteps = 4 rank updates (superstep 0 is send-only)
    assert cm.committed_iterations() == [1, 2, 3, 4]
    assert len(cm.metrics()) == 4

    # resume: same run_id continues from iteration 5 to 12
    resumed = page_rank(
        g, PageRankConfig(max_iterations=12, tolerance=0.0,
                          checkpoint_dir=ckpt, run_id="r1"),
    )
    got = _scores(resumed)
    assert resumed.iterations == 12
    for v, exp in full.items():
        assert math.isclose(got[v], exp, rel_tol=0, abs_tol=1e-12), (v, got[v], exp)


def test_checkpoint_metrics_lineage(spark, tmp_path):
    g = from_edge_list(spark, EDGES, n_nodes=6)
    ckpt = str(tmp_path / "ck2")
    page_rank(g, PageRankConfig(max_iterations=3, tolerance=0.0,
                                checkpoint_dir=ckpt, run_id="m1"))
    cm = CheckpointManager(ckpt, "m1")
    ms = cm.metrics()
    assert [m["iteration"] for m in ms] == [1, 2]
    assert all("wall_s" in m and "vertices" in m for m in ms)
    # per-partition lineage: every committed snapshot records which
    # partition held how many vertex rows, and they sum to the graph
    for it in cm.committed_iterations():
        lin = cm.lineage(it)
        assert lin is not None and lin["iteration"] == it
        assert sum(lin["partition_rows"].values()) == 6
        assert lin["partitions"] == len(lin["partition_rows"])
    assert all(m["partitions"] >= 1 for m in ms)
