from gnnkeras_tpu.graph.graph import GraphObject, CompositeGraphObject
from gnnkeras_tpu.graph.batch import GraphBatch, graphs_to_batch, single_graph_batch

__all__ = [
    "GraphObject",
    "CompositeGraphObject",
    "GraphBatch",
    "graphs_to_batch",
    "single_graph_batch",
]
