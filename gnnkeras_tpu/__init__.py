"""gnnkeras_tpu — a TPU-native framework with the capabilities of GNNkeras.

A from-scratch JAX/XLA/Pallas implementation of the original Scarselli-style
Graph Neural Network family (iterate-to-convergence "unfolding" message
passing), layered (LGNN) stacks, composite heterogeneous variants and mixed
inductive-transductive learning — re-designed TPU-first:

- immutable pytree graph batches with static padded shapes (MXU/XLA friendly),
- neighbor aggregation as edge-wise gather + segment-sum (and a Pallas
  block-sparse SpMM kernel for the hot path),
- the fixed-point state unfolding as a jit-compiled ``lax.scan`` /
  ``lax.while_loop`` instead of the reference's forced-eager ``tf.while_loop``
  (reference: GNN/Models/GNN.py:157,265),
- distribution via ``jax.sharding.Mesh`` + ``shard_map`` collectives.

Public API mirrors the reference's capability surface (see SURVEY.md §2).
"""

from gnnkeras_tpu.graph.graph import GraphObject, CompositeGraphObject
from gnnkeras_tpu.graph.batch import GraphBatch, graphs_to_batch
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.models.gnn import GNNnodeBased, GNNarcBased, GNNgraphBased
from gnnkeras_tpu.models.composite import (
    CompositeGNNnodeBased,
    CompositeGNNarcBased,
    CompositeGNNgraphBased,
)
from gnnkeras_tpu.models.lgnn import LGNN, CompositeLGNN
from gnnkeras_tpu.data.sequencers import (
    MultiGraphSequencer,
    SingleGraphSequencer,
    CompositeMultiGraphSequencer,
    CompositeSingleGraphSequencer,
)
from gnnkeras_tpu.data.prefetch import PrefetchSequencer
from gnnkeras_tpu.data.transductive import (
    TransductiveMultiGraphSequencer,
    TransductiveSingleGraphSequencer,
)
from gnnkeras_tpu.config import GNNConfig
from gnnkeras_tpu.data.mutag import load_mutag, load_tu_dataset
from gnnkeras_tpu.serving import MicroBatcher, Predictor, export_forward, load_exported

__version__ = "0.2.0"

__all__ = [
    "GraphObject",
    "CompositeGraphObject",
    "GraphBatch",
    "graphs_to_batch",
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
    "MultiGraphSequencer",
    "SingleGraphSequencer",
    "CompositeMultiGraphSequencer",
    "CompositeSingleGraphSequencer",
    "PrefetchSequencer",
    "TransductiveMultiGraphSequencer",
    "TransductiveSingleGraphSequencer",
    "GNNConfig",
    "load_mutag",
    "load_tu_dataset",
    "MicroBatcher",
    "Predictor",
    "export_forward",
    "load_exported",
]
