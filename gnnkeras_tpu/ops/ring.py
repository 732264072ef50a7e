"""Pallas ring all-gather over inter-chip RDMA.

The transport tier for the edge-partitioned convergence loop
(gnnkeras_tpu/parallel/partition.py): each device's published boundary-state
buffer travels around the ICI ring via ``pltpu.make_async_remote_copy`` with
double-buffered send/recv slots — the hand-rolled equivalent of
``lax.all_gather`` that the Pallas pipeline can later overlap with local
aggregation compute.

Runs compiled on real multi-chip TPU and under the Pallas TPU interpreter on
CPU meshes (how it is tested here: a single tunneled v5e chip cannot exercise
multi-chip RDMA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ring_kernel(num_devices: int, rows: int, axis_name: str):
    def kernel(local_ref, out_ref, comm_buf, send_sem, recv_sem):
        my_id = jax.lax.axis_index(axis_name)
        out_ref[pl.ds(my_id * rows, rows), :] = local_ref[...]
        comm_buf[0] = local_ref[...]

        def step(i, _):
            send_slot = i % 2
            recv_slot = (i + 1) % 2
            dst = jax.lax.rem(my_id + 1, num_devices)
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_buf.at[send_slot],
                dst_ref=comm_buf.at[recv_slot],
                send_sem=send_sem.at[send_slot],
                recv_sem=recv_sem.at[recv_slot],
                device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait()
            src_dev = jax.lax.rem(my_id - i - 1 + num_devices, num_devices)
            out_ref[pl.ds(src_dev * rows, rows), :] = comm_buf[recv_slot]
            return 0

        jax.lax.fori_loop(0, num_devices - 1, step, 0)

    return kernel


def ring_all_gather(x: jax.Array, axis_name: str, num_devices: int) -> jax.Array:
    """All-gather ``x`` (rows, d) over the ring → (num_devices·rows, d).
    Must be called inside ``shard_map`` over ``axis_name``.  The feature dim
    is lane-padded internally."""
    rows, d = x.shape
    d_pad = ((d + LANES - 1) // LANES) * LANES
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))

    out = pl.pallas_call(
        _ring_kernel(num_devices, rows, axis_name),
        out_shape=jax.ShapeDtypeStruct((num_devices * rows, d_pad), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, d_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True, collective_id=0),
        interpret=pltpu.InterpretParams() if jax.default_backend() != "tpu" else False,
    )(x)
    return out[:, :d]
