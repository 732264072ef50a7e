from gnnkeras_tpu.parallel.mesh import make_mesh, device_count
from gnnkeras_tpu.parallel.data_parallel import (
    stack_batches,
    shard_batches,
    make_dp_train_step,
    make_dp_epoch_step,
    DataParallelTrainer,
)
from gnnkeras_tpu.parallel.partition import partition_graph, PartitionedGraph, PartitionedGNN
from gnnkeras_tpu.parallel.packed import (
    PackedPartitionedGNN,
    PackedPartitionedLGNN,
    partition_packed,
    split_merged_by_graph,
)
from gnnkeras_tpu.parallel.expert import ExpertParallelCompositeGNN
from gnnkeras_tpu.parallel.hybrid import make_hybrid_train_step, stack_partitioned
from gnnkeras_tpu.parallel.tensor_parallel import TensorParallelGNN, TensorParallelMLP
from gnnkeras_tpu.parallel.pipeline import PipelineLGNN

__all__ = [
    "TensorParallelGNN",
    "TensorParallelMLP",
    "PipelineLGNN",
    "make_mesh",
    "device_count",
    "stack_batches",
    "shard_batches",
    "make_dp_train_step",
    "make_dp_epoch_step",
    "DataParallelTrainer",
    "partition_graph",
    "partition_packed",
    "PackedPartitionedGNN",
    "PackedPartitionedLGNN",
    "split_merged_by_graph",
    "PartitionedGraph",
    "PartitionedGNN",
    "ExpertParallelCompositeGNN",
    "make_hybrid_train_step",
    "stack_partitioned",
]
