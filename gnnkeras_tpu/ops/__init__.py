from gnnkeras_tpu.ops.segment import (
    segment_sum,
    aggregate_neighbors,
    aggregate_edges,
    graph_readout,
)

__all__ = [
    "segment_sum",
    "aggregate_neighbors",
    "aggregate_edges",
    "graph_readout",
]
