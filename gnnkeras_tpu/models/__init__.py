from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.models.gnn import GNNnodeBased, GNNarcBased, GNNgraphBased
from gnnkeras_tpu.models.composite import (
    CompositeGNNnodeBased,
    CompositeGNNarcBased,
    CompositeGNNgraphBased,
)
from gnnkeras_tpu.models.lgnn import LGNN, CompositeLGNN

__all__ = [
    "MLP",
    "get_inout_dims",
    "GNNnodeBased",
    "GNNarcBased",
    "GNNgraphBased",
    "CompositeGNNnodeBased",
    "CompositeGNNarcBased",
    "CompositeGNNgraphBased",
    "LGNN",
    "CompositeLGNN",
]
