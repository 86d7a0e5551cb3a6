"""Articulation points, bridges, indirect exposure."""

from __future__ import annotations

import pytest

from neo4j_graph_data_science_spark.catalog import from_edge_list
from neo4j_graph_data_science_spark.operators.articulation import (
    articulation_points,
    bridges,
)
from neo4j_graph_data_science_spark.operators.exposure import (
    IndirectExposureConfig,
    indirect_exposure,
)


def test_articulation_and_bridges_path(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2)], n_nodes=3)
    assert {r["id"] for r in articulation_points(g).collect()} == {1}
    assert {(r["src"], r["dst"]) for r in bridges(g).collect()} == {(0, 1), (1, 2)}


def test_articulation_cycle_none(spark):
    g = from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], n_nodes=3)
    assert articulation_points(g).count() == 0
    assert bridges(g).count() == 0


def test_articulation_shared_vertex(spark):
    # two triangles sharing vertex 2: articulation {2}, no bridges
    g = from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)],
                       n_nodes=5)
    assert {r["id"] for r in articulation_points(g).collect()} == {2}
    assert bridges(g).count() == 0


def test_indirect_exposure_chain(spark):
    # sanctioned 0; transfers 0-1 (w 2), 1-2 (w 1); undirected degrees:
    # wdeg(1) = 3 -> exposure(1) = (1*2)/3; wdeg(2) = 1 -> exposure(2) =
    # (exposure(1)*1)/1
    g = from_edge_list(spark, [(0, 1, 2.0), (1, 2, 1.0)], n_nodes=3)
    out = {r["id"]: r for r in indirect_exposure(g, [0]).collect()}
    assert out[0]["exposure"] == 1.0 and out[0]["hop"] == 0
    assert out[1]["exposure"] == pytest.approx(2 / 3)
    assert out[1]["parent"] == 0 and out[1]["root"] == 0 and out[1]["hop"] == 1
    assert out[2]["exposure"] == pytest.approx(2 / 3)
    assert out[2]["parent"] == 1 and out[2]["root"] == 0 and out[2]["hop"] == 2


def test_indirect_exposure_max_parent(spark):
    # node 3 reachable from sanctioned 0 and 1 in one hop; takes the MAX
    # weighted message: from 1 (w 5) over 0 (w 1); wdeg(3) = 6
    g = from_edge_list(spark, [(0, 3, 1.0), (1, 3, 5.0)], n_nodes=4)
    out = {r["id"]: r for r in indirect_exposure(g, [0, 1]).collect()}
    assert out[3]["exposure"] == pytest.approx(5 / 6)
    assert out[3]["parent"] == 1
    assert out[2]["exposure"] == 0.0 and out[2]["hop"] == -1
