"""PySpark-native graph analytics engine with Neo4j GDS capabilities.

Built from scratch on the DataFrame API: graphs are (nodes, edges)
DataFrame pairs in a catalog; iterative algorithms run on a Pregel
superstep kernel where Spark's map-side-combined ``groupBy(dst)`` shuffle
is the reducing messenger. See SURVEY.md for the reference mapping.
"""

__version__ = "0.2.0"

from .catalog import (
    Aggregation,
    GraphCatalog,
    Orientation,
    SparkGraph,
    build_id_map,
    from_edge_list,
)
from .session import get_spark

__all__ = [
    "Aggregation",
    "GraphCatalog",
    "Orientation",
    "SparkGraph",
    "build_id_map",
    "from_edge_list",
    "get_spark",
]
