"""CSR-block Arrow-kernel PageRank matches the DataFrame engine exactly."""

from __future__ import annotations

import math

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.pagerank import (
    PageRankConfig, page_rank,
)
from neo4j_graph_data_science_spark.operators.pagerank_csr import page_rank_csr
from tests.test_pagerank import WIKI_EDGES, EXPECTED


def test_csr_matches_dataframe_engine(spark):
    g = from_edge_list(spark, WIKI_EDGES, n_nodes=11)
    cfg = PageRankConfig(max_iterations=41, tolerance=0.0)
    df_scores = {r["id"]: r["score"] for r in page_rank(g, cfg).state.collect()}
    csr_scores = {r["id"]: r["score"]
                  for r in page_rank_csr(g, cfg, block_partitions=4).state.collect()}
    assert set(df_scores) == set(csr_scores)
    for v in df_scores:
        assert math.isclose(csr_scores[v], df_scores[v], rel_tol=0, abs_tol=1e-9)
    for v, exp in EXPECTED.items():
        assert math.isclose(csr_scores[v], exp, rel_tol=0, abs_tol=1e-5)


def test_csr_transcript_graph(spark):
    from neo4j_graph_data_science_spark.sources.transcripts import transcript_graph

    g = transcript_graph(spark, n_convs=30, max_turns=12)
    cfg = PageRankConfig(max_iterations=10, tolerance=0.0)
    a = {r["id"]: r["score"] for r in page_rank(g, cfg).state.collect()}
    b = {r["id"]: r["score"]
         for r in page_rank_csr(g, cfg, block_partitions=8).state.collect()}
    assert set(a) == set(b)
    for v in a:
        assert math.isclose(a[v], b[v], rel_tol=0, abs_tol=1e-9)
