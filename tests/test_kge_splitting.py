"""KGE link prediction (gds.ml.kge.predict) + splitRelationships.

Reference semantics pinned here:
  * DistMult score = sum_i s_i*r_i*t_i, higher-is-better top-k
    (DoubleDistMultLinkScorer.java); TransE = sqrt(sum (s_i+r_i-t_i)^2),
    lower-is-better (DoubleEuclideanDistanceLinkScorer.java).
  * Candidates exclude self-pairs and existing edges
    (TopKMapComputer.isCandidateLink).
  * splitRelationships: floor(validCount*fraction) positives with
    label=1.0, remainder keeps weight, invalid-endpoint edges dropped from
    both sides (EdgeSplitter.splitPositiveExamples); undirected graphs
    split per-pair with directed selected rows (UndirectedEdgeSplitter).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neo4j_graph_data_science_spark.operators.kge import kge_predict
from neo4j_graph_data_science_spark.operators.splitting import (
    split_relationships,
)


def _nodes(spark):
    rows = [
        (0, [1.0, 0.0, 2.0]),
        (1, [0.0, 1.0, 1.0]),
        (2, [2.0, 1.0, 0.0]),
        (3, [1.0, 1.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_kge_distmult_hand_computed(spark):
    r = [1.0, 2.0, 0.5]
    out = kge_predict(_nodes(spark), None, r, "distmult", top_k=2)
    got = {(x.source_id, x.target_id): x.score for x in out.collect()}
    # score(0, t) = 1*1*t0 + 0*2*t1 + 2*0.5*t2 = t0 + t2
    assert math.isclose(got[(0, 2)], 2.0)   # 2 + 0
    assert math.isclose(got[(0, 3)], 2.0)   # 1 + 1
    # top-2 of source 1: score(1,t) = 2*t1 + 0.5*t2
    # -> t=3: 2.5, t=2: 2.0, t=0: 1.0; top-2 targets are exactly {2, 3}
    s1 = sorted(t for (s0, t) in got if s0 == 1)
    assert s1 == [2, 3]
    assert math.isclose(got[(1, 3)], 2.5) and math.isclose(got[(1, 2)], 2.0)


def test_kge_transe_lower_is_better(spark):
    # r = target - source  =>  distance 0 is the best possible score
    r = [-1.0, 1.0, -1.0]  # node0 + r == node1 exactly
    out = kge_predict(_nodes(spark), None, r, "transe", top_k=1)
    best = {x.source_id: (x.target_id, x.score) for x in out.collect()}
    assert best[0][0] == 1 and math.isclose(best[0][1], 0.0)


def test_kge_excludes_existing_edges_and_self(spark):
    edges = spark.createDataFrame([(0, 1), (0, 2)], "src long, dst long")
    out = kge_predict(_nodes(spark), edges, [1.0, 1.0, 1.0],
                      "distmult", top_k=10)
    pairs = {(x.source_id, x.target_id) for x in out.collect()}
    assert (0, 1) not in pairs and (0, 2) not in pairs
    assert (0, 3) in pairs
    assert all(s != t for s, t in pairs)


def test_kge_filters(spark):
    out = kge_predict(_nodes(spark), None, [1.0, 1.0, 1.0], "distmult",
                      top_k=10, source_filter="node = 0",
                      target_filter="node >= 2")
    pairs = {(x.source_id, x.target_id) for x in out.collect()}
    assert pairs == {(0, 2), (0, 3)}


def _edges(spark, n=20):
    rows = [(i, (i + 1) % n, float(i)) for i in range(n)]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_split_sizes_and_label(spark):
    res = split_relationships(_edges(spark), holdout_fraction=0.3, seed=7)
    sel = res.selected.collect()
    rem = res.remaining.collect()
    assert len(sel) == 6 and len(rem) == 14          # floor(20 * 0.3)
    assert all(r.label == 1.0 for r in sel)
    assert {"src", "dst", "weight"} == set(res.remaining.columns)
    # partition: every input edge lands in exactly one side
    all_pairs = {(r.src, r.dst) for r in sel} | {(r.src, r.dst) for r in rem}
    assert len(all_pairs) == 20


def test_split_deterministic_and_seed_sensitive(spark):
    e = _edges(spark)
    a = {(r.src, r.dst) for r in
         split_relationships(e, 0.3, seed=7).selected.collect()}
    b = {(r.src, r.dst) for r in
         split_relationships(e, 0.3, seed=7).selected.collect()}
    c = {(r.src, r.dst) for r in
         split_relationships(e, 0.3, seed=8).selected.collect()}
    assert a == b
    assert a != c  # 20-choose-6 makes a collision astronomically unlikely


def test_split_node_filters_drop_invalid_everywhere(spark):
    res = split_relationships(_edges(spark), 0.5, seed=1,
                              source_filter="node < 10")
    kept = ({(r.src, r.dst) for r in res.selected.collect()}
            | {(r.src, r.dst) for r in res.remaining.collect()})
    assert all(s < 10 for s, _ in kept) and len(kept) == 10


def test_split_undirected_splits_pairs_once(spark):
    # both directions of each undirected pair present in the input
    rows = [(i, (i + 1) % 10) for i in range(10)]
    rows += [(d, s) for s, d in rows]
    e = spark.createDataFrame(rows, "src long, dst long")
    res = split_relationships(e, 0.4, seed=3, undirected=True)
    sel = {(r.src, r.dst) for r in res.selected.collect()}
    assert len(sel) == 4                              # floor(10 pairs * 0.4)
    assert all(s < d for s, d in sel)                 # one directed row/pair
    # no selected pair leaks into remaining in either direction
    rem = {(r.src, r.dst) for r in res.remaining.collect()}
    assert not {(d, s) for s, d in sel} & rem and not sel & rem


def test_split_md5_mode_matches_duckdb(spark):
    """The md5 draw replays in DuckDB: same ranking, same cut."""
    import duckdb

    e = _edges(spark)
    sel = sorted((r.src, r.dst) for r in split_relationships(
        e, 0.25, seed=11, hash_mode="md5").selected.collect())
    con = duckdb.connect()
    rows = sorted((r.src, r.dst, r.weight) for r in e.collect())
    con.execute("CREATE TABLE edges(src BIGINT, dst BIGINT, weight DOUBLE)")
    con.executemany("INSERT INTO edges VALUES (?, ?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute("""
        WITH h AS (
          SELECT src, dst,
                 md5(concat_ws(':', 11, src, dst)) AS hh,
                 count(*) OVER () AS n
          FROM edges
        ), r AS (
          SELECT src, dst,
                 row_number() OVER (ORDER BY hh, src, dst) AS rn,
                 floor(n * 0.25) AS cut
          FROM h
        )
        SELECT src, dst FROM r WHERE rn <= cut
    """).fetchall())
    assert sel == want


def test_semantic_dedup_marks_near_duplicates(spark):
    """Planted near-dup pair lands in one cluster and the higher id is
    dropped with duplicate_of = the lower id; spread vectors survive."""
    from neo4j_graph_data_science_spark.operators.dedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r for r in semantic_dedup(
        vecs, threshold=0.95, k=3, iterations=2).collect()}
    assert len(out) == 4
    assert not out[1].keep and out[1].duplicate_of == 0
    assert out[0].keep and out[2].keep and out[3].keep
    assert out[0].duplicate_of == -1


def test_semantic_dedup_pairs_confined_to_clusters(spark):
    """Items similar above threshold but in DIFFERENT clusters are kept --
    the documented approximation that makes the pair space sub-quadratic."""
    from neo4j_graph_data_science_spark.operators.dedup import semantic_dedup

    # ids 0/1 seed two clusters (pinned first-k init); 2 is closest to 1's
    # centroid but nearly parallel to 0 -- if clustering separates them no
    # dup mark can cross the boundary
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.6, 0.8]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r for r in semantic_dedup(
        vecs, threshold=0.5, k=2, iterations=1).collect()}
    # 2 assigns to cluster of 1 (d2 0.4^2+0.2^2=0.2 vs 0.16+0.64=0.8);
    # cosine(1,2)=0.8 >= 0.5 -> dup within cluster
    assert not out[2].keep and out[2].duplicate_of == 1
    assert out[0].keep and out[1].keep


def test_kge_null_embedding_never_in_topk(spark):
    """A null embedding yields a NULL score; under transe's ascending
    order Spark sorts nulls first, so an unfiltered NULL would steal
    top-k slots TopKMapComputer never admits (ADVICE round 3)."""
    rows = [
        (0, [1.0, 0.0, 2.0]),
        (1, [0.0, 1.0, 1.0]),
        (2, None),
    ]
    nodes = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = kge_predict(nodes, None, [-1.0, 1.0, -1.0], "transe", top_k=1)
    best = {x.source_id: x.target_id for x in out.collect()}
    assert best[0] == 1          # not the NULL-scored node 2
    assert 2 not in best         # null source scores nothing


def test_kge_dim_mismatch_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="dim"):
        kge_predict(_nodes(spark), None, [1.0, 1.0], "distmult")


def test_kge_rejects_unknown_score_function(spark):
    import pytest

    with pytest.raises(ValueError):
        kge_predict(_nodes(spark), None, [1.0, 1.0, 1.0], "euclid")
