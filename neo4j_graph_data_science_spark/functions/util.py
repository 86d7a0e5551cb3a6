"""gds.util.* scalar surface + gds.version / gds.graph.exists.

Reference (SURVEY §2.5; proc/.../UserFunctions): gds.util.{asNode, asNodes,
nodeProperty, NaN, infinity, isFinite, isInfinite}, gds.version,
gds.graph.exists. In Neo4j these bridge algorithm results (internal node
ids) back to database nodes; in this engine the same role is a broadcast
join of a result DataFrame against the graph's node-property table, and
the numeric guards are Catalyst Column expressions (NaN/Infinity are plain
IEEE doubles in Spark SQL, so everything stays in whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import __version__
from ..catalog import GraphCatalog, SparkGraph


def nan() -> Column:
    """gds.util.NaN()."""
    return F.lit(float("nan"))


def infinity() -> Column:
    """gds.util.infinity()."""
    return F.lit(float("inf"))


def is_finite(col: Column) -> Column:
    """gds.util.isFinite: non-null, non-NaN, non-infinite."""
    c = col.cast("double")
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def is_infinite(col: Column) -> Column:
    """gds.util.isInfinite == NOT isFinite, exactly as the reference
    (proc/common/.../IsFiniteFunc.java:36-38 returns
    ``value == null || !Double.isFinite(value)``): NULL and NaN are BOTH
    "infinite" under this predicate, not just +-Infinity."""
    return ~is_finite(col)


def as_nodes(result: DataFrame, graph: SparkGraph, id_col: str = "id") -> DataFrame:
    """gds.util.asNode(s): join result rows back to the graph's node rows
    (all node properties attached). Node side is broadcast when small;
    with a big node table Catalyst/AQE picks the shuffle strategy — the
    result side keeps its partitioning either way.
    """
    nodes = graph.nodes
    if id_col != "id":
        result = result.withColumnRenamed(id_col, "id")
    return result.join(nodes, "id", "left")


def node_property(
    result: DataFrame, graph: SparkGraph, prop: str, id_col: str = "id"
) -> DataFrame:
    """gds.util.nodeProperty: attach ONE node property column (column-pruned
    join — only (id, prop) is read from the node table)."""
    nodes = graph.nodes.select("id", prop)
    if id_col != "id":
        result = result.withColumnRenamed(id_col, "id")
    return result.join(nodes, "id", "left")


def version() -> str:
    """gds.version()."""
    return __version__


def graph_exists(catalog: GraphCatalog, name: str) -> bool:
    """gds.graph.exists(name)."""
    return name in catalog.list()
