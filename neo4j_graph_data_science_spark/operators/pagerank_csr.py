"""PageRank over CSR-packed per-partition adjacency blocks (Arrow kernels).

The north-star execution shape: adjacency is packed ONCE into per-partition
CSR blocks (one row per hash partition of src: sorted src/dst/weight numpy
arrays, reference analogue AdjacencyList/HugeGraph CSR --
core-api/.../AdjacencyList.java:33), persisted, and each superstep a
``cogroup().applyInPandas`` kernel joins the (small) contribution state to
its block and emits per-destination PARTIAL sums -- numpy the whole way,
one Arrow batch per partition, never per-row Python. The only shuffle per
superstep is (a) state re-keyed by block (O(V)) and (b) the final
groupBy(dst) combine of partials (at most V rows per block after in-kernel
combining).

vs the pure-DataFrame plan (operators/pagerank.py): identical math, same
shuffle asymptotics; the CSR path trades JVM codegen for numpy batch work
and pre-grouped Arrow transfer. On local[32]/small graphs the JVM join
usually wins; at very wide rows or with python-side per-edge logic (e.g.
custom message functions that Catalyst cannot express) this path wins --
which is exactly when GDS users write custom Pregel computations.

Results match operators/pagerank.page_rank to float precision (tested at
1e-9 on the GDS wiki fixture).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StructField, StructType,
)

from ..catalog import DST, SRC, SparkGraph, W, register_cache
from .pagerank import PageRankConfig, _out_degrees
from ..plans.pregel import PregelResult

BLOCK_SCHEMA = StructType([
    StructField("pkey", LongType()),
    StructField("srcs", ArrayType(LongType())),
    StructField("dsts", ArrayType(LongType())),
    StructField("ws", ArrayType(DoubleType())),
])

PARTIAL_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("partial", DoubleType()),
])


def pack_csr_blocks(edges: DataFrame, partitions: int = 32) -> DataFrame:
    """One row per hash(src) partition: src-sorted adjacency arrays.
    Pack once, reuse every superstep (GDS 'project once, iterate many')."""

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        return pd.DataFrame({
            "pkey": [key[0]],
            "srcs": [pdf["src"].to_numpy().tolist()],
            "dsts": [pdf["dst"].to_numpy().tolist()],
            "ws": [pdf["weight"].to_numpy(dtype="float64").tolist()],
        })

    keyed = edges.select(
        F.pmod(F.xxhash64(SRC), F.lit(partitions)).alias("pkey"),
        F.col(SRC).alias("src"), F.col(DST).alias("dst"),
        F.col(W).alias("weight"),
    )
    blocks = register_cache(
        keyed.groupBy("pkey").applyInPandas(pack, BLOCK_SCHEMA).persist())
    blocks.count()
    return blocks


def page_rank_csr(graph: SparkGraph, config: PageRankConfig | None = None,
                  block_partitions: int = 32) -> PregelResult:
    """Same semantics/config as operators/pagerank.page_rank; CSR engine."""
    cfg = config or PageRankConfig()
    d = cfg.damping_factor
    agg_edges = graph.aggregated_edges("SUM" if cfg.weighted else "COUNT")
    blocks = pack_csr_blocks(agg_edges, block_partitions)
    deg = _out_degrees(agg_edges)
    nodes = graph.nodes.select("id")

    state = (
        nodes.join(deg, "id", "left")
        .select(
            "id",
            F.lit(1.0 - d).alias("rank"),
            F.coalesce("out_deg", F.lit(0.0)).alias("out_deg"),
        )
        .withColumn(
            "contrib",
            F.when(F.col("out_deg") > 0, F.col("rank") / F.col("out_deg"))
            .otherwise(F.lit(0.0)),
        )
        .localCheckpoint(eager=True)
    )

    def kernel(key, edges_it, state_it) -> pd.DataFrame:
        import numpy as np

        e = pd.concat(list(edges_it)) if not isinstance(edges_it, pd.DataFrame) else edges_it
        s = pd.concat(list(state_it)) if not isinstance(state_it, pd.DataFrame) else state_it
        if len(e) == 0 or len(s) == 0:
            return pd.DataFrame({"id": [], "partial": []}).astype(
                {"id": "int64", "partial": "float64"})
        srcs = np.asarray(e["srcs"].iloc[0], dtype="int64")
        dsts = np.asarray(e["dsts"].iloc[0], dtype="int64")
        ws = np.asarray(e["ws"].iloc[0], dtype="float64")
        contrib = pd.Series(
            s["contrib"].to_numpy(dtype="float64"), index=s["id"].to_numpy()
        )
        per_edge = contrib.reindex(srcs).to_numpy() * ws
        out = pd.DataFrame({"id": dsts, "partial": per_edge}) \
            .groupby("id", as_index=False)["partial"].sum()
        return out

    it = 0
    max_updates = max(cfg.max_iterations - 1, 0)
    converged = False
    while it < max_updates:
        contribs = state.select(
            F.pmod(F.xxhash64("id"), F.lit(block_partitions)).alias("pkey"),
            "id", "contrib",
        )
        partials = (
            blocks.groupBy("pkey")
            .cogroup(contribs.groupBy("pkey"))
            .applyInPandas(kernel, PARTIAL_SCHEMA)
        )
        msgs = partials.groupBy("id").agg(F.sum("partial").alias("msg"))
        new_state = (
            state.join(msgs, "id", "left")
            .select(
                "id",
                (F.lit(1.0 - d) + F.lit(d) * F.coalesce("msg", F.lit(0.0))).alias("rank"),
                "out_deg",
                F.abs(
                    F.lit(1.0 - d) + F.lit(d) * F.coalesce("msg", F.lit(0.0))
                    - F.col("rank")
                ).alias("delta"),
            )
            .withColumn(
                "contrib",
                F.when(F.col("out_deg") > 0, F.col("rank") / F.col("out_deg"))
                .otherwise(F.lit(0.0)),
            )
            .localCheckpoint(eager=True)
        )
        it += 1
        if cfg.tolerance > 0:
            mx = new_state.agg(F.max("delta")).collect()[0][0]
            if mx is not None and mx <= cfg.tolerance:
                state = new_state
                converged = True
                break
        state = new_state
    blocks.unpersist()
    return PregelResult(
        state=state.select("id", F.col("rank").alias("score")),
        iterations=it + 1,  # GDS-style count incl. initial send-only step
        converged=converged,
    )
