from treemachine_spark.graph.closure import build_closure, with_self_paths
from treemachine_spark.graph.hierarchy import hierarchy_edges, hierarchy_nodes

__all__ = [
    "build_closure",
    "with_self_paths",
    "hierarchy_edges",
    "hierarchy_nodes",
]
