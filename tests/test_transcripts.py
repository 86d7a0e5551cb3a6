"""Transcript synthesis, edge derivation, invariants (FIXTURES.md sections 1-2, 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_graph_data_science_spark.sources.transcripts import (
    derive_edges,
    synthesize_transcripts,
    transcript_graph,
    transcript_id_map,
)


def test_schema_matches_input_hint(spark):
    t = synthesize_transcripts(spark, n_convs=20)
    assert [(f.name, f.dataType.simpleString()) for f in t.schema.fields] == [
        ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
        ("text", "string"), ("tool", "string"), ("ts", "timestamp"),
    ]


def test_synthesis_deterministic(spark):
    a = synthesize_transcripts(spark, n_convs=30).orderBy("conv_id", "turn_idx").collect()
    b = synthesize_transcripts(spark, n_convs=30).orderBy("conv_id", "turn_idx").collect()
    assert a == b


def test_text_roundtrip_invariant(spark):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering:
    the derivation is read-only over the transcript table."""
    t = synthesize_transcripts(spark, n_convs=25).persist()
    before = t.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    g = transcript_graph(spark, n_convs=25)
    g.edges.count()  # force full derivation
    after = t.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    assert before == after
    t.unpersist()


def test_id_map_dense_and_sorted(spark):
    t = synthesize_transcripts(spark, n_convs=10)
    idm = transcript_id_map(t)
    rows = idm.orderBy("id").collect()
    assert [r["id"] for r in rows] == list(range(len(rows)))
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)


def test_next_edges_follow_turn_order(spark):
    t = synthesize_transcripts(spark, n_convs=5)
    idm = transcript_id_map(t)
    e = derive_edges(t, idm)
    nxt = e.filter(F.col("rel_type") == "NEXT")
    # every NEXT edge connects consecutive dense ids within a conversation
    joined = (
        nxt.join(idm.select(F.col("id").alias("src"), F.col("conv_id").alias("c1"),
                            F.col("turn_idx").alias("t1")), "src")
        .join(idm.select(F.col("id").alias("dst"), F.col("conv_id").alias("c2"),
                         F.col("turn_idx").alias("t2")), "dst")
    )
    bad = joined.filter((F.col("c1") != F.col("c2")) | (F.col("t2") != F.col("t1") + 1))
    assert bad.count() == 0
    # count: sum over convs of (n_turns - 1)
    n_turns = t.groupBy("conv_id").count().collect()
    assert nxt.count() == sum(r["count"] - 1 for r in n_turns)


def test_tool_and_role_edges_stay_in_conversation(spark):
    t = synthesize_transcripts(spark, n_convs=8)
    idm = transcript_id_map(t)
    e = derive_edges(t, idm)
    for rel in ("TOOL", "ROLE"):
        sub = e.filter(F.col("rel_type") == rel)
        joined = (
            sub.join(idm.select(F.col("id").alias("src"), F.col("conv_id").alias("c1")), "src")
            .join(idm.select(F.col("id").alias("dst"), F.col("conv_id").alias("c2")), "dst")
        )
        assert joined.filter(F.col("c1") != F.col("c2")).count() == 0
        assert sub.count() > 0


def test_graph_has_hub_conversations(spark):
    """Zipf-ish turn counts: conv 0..4 are hubs (skew-path exercise)."""
    t = synthesize_transcripts(spark, n_convs=50, max_turns=20)
    counts = {r["conv_id"]: r["count"] for r in t.groupBy("conv_id").count().collect()}
    hub = counts["conv_000000"]
    assert hub == 80
    assert hub > max(v for k, v in counts.items() if k > "conv_000004")
