from gnnkeras_tpu.parallel.mesh import make_mesh, device_count
from gnnkeras_tpu.parallel.data_parallel import (
    stack_batches,
    shard_batches,
    make_dp_train_step,
    DataParallelTrainer,
)
from gnnkeras_tpu.parallel.partition import partition_graph, PartitionedGraph, PartitionedGNN

__all__ = [
    "make_mesh",
    "device_count",
    "stack_batches",
    "shard_batches",
    "make_dp_train_step",
    "DataParallelTrainer",
    "partition_graph",
    "PartitionedGraph",
    "PartitionedGNN",
]
