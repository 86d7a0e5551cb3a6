"""Transcript table synthesis + graph derivation (the primary input shape).

Input table shape (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Edge induction (BASELINE.json north_star / FIXTURES.md section 2):
  NEXT  (conv_id, turn_idx) -> (conv_id, turn_idx + 1)           weight 1.0
  TOOL  consecutive turns in a conversation sharing the same non-null tool
  ROLE  consecutive turns in a conversation sharing the same role

Vertex identity: dense id over (conv_id, turn_idx) -- matching GDS's sorted
dense IdMap (ArrayIdMap.java:41-44). The derivation is strictly read-only
over the transcript table (per-turn text equality invariant), and all edge
rules are expressed as window functions over the (conv_id, turn_idx)
ordering, so the only shuffle is one hash-partition by conv_id; at 10^12-turn
scale that is the natural partition key (conversations are independent) and
hub skew only arises in derived-graph joins, handled in the Pregel kernel.

Synthesis is fully deterministic (hash-based, no RNG state) so the same
(n_convs, seed) always produces byte-identical tables on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import DST, REL, SRC, W, SparkGraph, bucketed_dense_ids

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "code", "sql", "browse", "files", "math", "plot", "shell"]


def synthesize_transcripts(
    spark: SparkSession, n_convs: int = 200, seed: int = 42, max_turns: int = 40
) -> DataFrame:
    """Deterministic synthetic transcript table.

    Turn counts follow a Zipf-ish skew (a few hub conversations are much
    longer) to exercise the hub-vertex/salting path. All columns derive from
    xxhash64(conv, turn, seed) -- no driver-side randomness, fully parallel:
    spark.range(n) -> per-conv turn count -> explode to turns, all columnar.
    """
    conv = spark.range(n_convs).select(F.col("id").alias("conv"))
    h = F.abs(F.xxhash64(F.col("conv"), F.lit(seed)))
    # Zipf-ish: most convs short, conv 0..4 get max_turns*4 (hubs)
    n_turns = (
        F.when(F.col("conv") < 5, F.lit(max_turns * 4))
        .otherwise((h % F.lit(max_turns - 2)) + F.lit(2))
        .cast("int")
    )
    turns = conv.withColumn("n_turns", n_turns).select(
        "conv", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )
    th = F.abs(F.xxhash64(F.col("conv"), F.col("turn_idx"), F.lit(seed)))
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (th % len(ROLES) + 1).cast("int")
    )
    th2 = F.abs(F.xxhash64(F.col("conv"), F.col("turn_idx"), F.lit(seed * 2 + 1)))
    tool = F.when(
        (th % 3) == 0,
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]), (th2 % len(TOOLS) + 1).cast("int")
        ),
    ).otherwise(F.lit(None).cast("string"))
    conv_id = F.format_string("conv_%06d", F.col("conv"))
    return turns.select(
        conv_id.alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.format_string(
            "conv_%06d:%d:%s", F.col("conv"), F.col("turn_idx"), role
        ).alias("text"),
        tool.alias("tool"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
            secs=(F.col("conv") * 100000 + F.col("turn_idx")).cast("double")
        )).alias("ts"),
    )


def transcript_id_map(transcripts: DataFrame, dense: bool = True) -> DataFrame:
    """Vertex ids over (conv_id, turn_idx).

    dense=True: GDS-compatible dense ids via a global row_number -- a
    single-partition sort, fine for fixtures/tests but SERIAL at scale.
    dense=False (the 10^12-turn path): composite id
    ``(xxhash64(conv_id) mod 2^40) * 2^21 + turn_idx`` -- embarrassingly
    parallel, no shuffle at all, unique as long as conversations stay under
    2^21 turns and conv hashes don't collide in 2^40 (~1e-7 for 10^6
    convs). Algorithms only need unique longs; results join back through
    this map either way.
    """
    if dense:
        # partition-parallel dense ranking: conv_id is fixed-width
        # ("conv_%06d"), so a 9-char prefix buckets ~100 convs and is
        # monotonic in string order -> identical ids to a global sort
        return bucketed_dense_ids(
            transcripts.select("conv_id", "turn_idx"),
            ["conv_id", "turn_idx"],
            F.substring("conv_id", 1, 9),
        )
    return transcripts.select("conv_id", "turn_idx").withColumn(
        "id",
        F.pmod(F.xxhash64("conv_id"), F.lit(1 << 40)) * F.lit(1 << 21)
        + F.col("turn_idx").cast("long"),
    )


def derive_edges(transcripts: DataFrame, id_map: DataFrame | None = None) -> DataFrame:
    """Edge table (src, dst, rel_type, weight) from turn adjacency and
    tool/role co-occurrence. Read-only over the input: only window functions
    partitioned by conv_id, ordered by turn_idx.
    """
    idm = id_map if id_map is not None else transcript_id_map(transcripts)
    t = transcripts.join(idm, ["conv_id", "turn_idx"])
    w = Window.partitionBy("conv_id").orderBy("turn_idx")

    nxt = t.select(
        F.col("id").alias(SRC),
        F.lead("id").over(w).alias(DST),
        F.lit("NEXT").alias(REL),
        F.lit(1.0).alias(W),
    ).filter(F.col(DST).isNotNull())

    wt = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    tool = (
        t.filter(F.col("tool").isNotNull())
        .select(
            F.col("id").alias(SRC),
            F.lead("id").over(wt).alias(DST),
            F.lit("TOOL").alias(REL),
            F.lit(1.0).alias(W),
        )
        .filter(F.col(DST).isNotNull())
    )

    wr = Window.partitionBy("conv_id", "role").orderBy("turn_idx")
    role = t.select(
        F.col("id").alias(SRC),
        F.lead("id").over(wr).alias(DST),
        F.col("role").alias("_r"),
        F.lit(1.0).alias(W),
    ).filter(F.col(DST).isNotNull()).select(
        SRC, DST, F.lit("ROLE").alias(REL), F.col(W)
    )

    return nxt.unionByName(tool).unionByName(role)


def transcript_graph(
    spark: SparkSession, n_convs: int = 200, seed: int = 42, max_turns: int = 40,
    dense_ids: bool = True,
) -> SparkGraph:
    t = synthesize_transcripts(spark, n_convs, seed, max_turns)
    idm = transcript_id_map(t, dense=dense_ids)
    edges = derive_edges(t, idm)
    nodes = idm.select("id")
    return SparkGraph(nodes=nodes, edges=edges, id_map=idm, name="transcripts")
