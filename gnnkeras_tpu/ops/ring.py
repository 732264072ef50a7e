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


def _ring_kernel(num_devices: int, rows: int, axis_name: str,
                 mesh_axes: tuple, barrier: bool):
    def kernel(local_ref, out_ref, comm_buf, send_sem, recv_sem, credit_sem):
        my_id = jax.lax.axis_index(axis_name)
        left = jax.lax.rem(my_id - 1 + num_devices, num_devices)
        dst = jax.lax.rem(my_id + 1, num_devices)

        # FLAT logical ids on the full mesh (row-major over mesh_axes, the
        # numbering LOGICAL device ids use): my neighbors differ from me only
        # in the ring-axis coordinate.  Computing dst from the ring index
        # alone is only correct on a 1-axis mesh — on a hybrid data×graph
        # mesh it would address row-0 devices from every data row and
        # deadlock the ring.
        base, stride, mult = 0, 1, 1
        for name, size in reversed(mesh_axes):
            if name == axis_name:
                stride = mult
            else:
                base = base + jax.lax.axis_index(name) * mult
            mult *= size
        left_flat = base + left * stride
        dst_flat = base + dst * stride

        if barrier:
            # entry barrier with both ring neighbors: the first remote DMA
            # below writes the right neighbor's VMEM scratch, which is only
            # safe once that neighbor has entered the kernel (devices start
            # with skew on real hardware)
            barrier_sem = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                barrier_sem, inc=1, device_id=left_flat,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            pltpu.semaphore_signal(
                barrier_sem, inc=1, device_id=dst_flat,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            pltpu.semaphore_wait(barrier_sem, 2)

        out_ref[pl.ds(my_id * rows, rows), :] = local_ref[...]
        comm_buf[0] = local_ref[...]

        def step(i, _):
            send_slot = i % 2
            recv_slot = (i + 1) % 2

            # flow control: my iteration-i send writes the right neighbor's
            # slot (i+1)%2, which that neighbor last sent FROM at iteration
            # i-1.  Nothing else orders my progress with the neighbor's, so
            # without a credit I could overwrite a buffer whose outbound DMA
            # is still in flight (the interleaving the interpret-mode
            # scheduler exposed; it would race on real hardware too).  The
            # neighbor releases the slot by signaling a credit after its own
            # send completes.
            @pl.when(i > 0)
            def _():
                pltpu.semaphore_wait(credit_sem, 1)

            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_buf.at[send_slot],
                dst_ref=comm_buf.at[recv_slot],
                send_sem=send_sem.at[send_slot],
                recv_sem=recv_sem.at[recv_slot],
                device_id=dst_flat,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait()

            # my send from send_slot is done → the LEFT neighbor may write it
            # next iteration (skip the last iteration so the semaphore drains)
            @pl.when(i < num_devices - 2)
            def _():
                pltpu.semaphore_signal(
                    credit_sem, inc=1, device_id=left_flat,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )

            src_dev = jax.lax.rem(my_id - i - 1 + num_devices, num_devices)
            out_ref[pl.ds(src_dev * rows, rows), :] = comm_buf[recv_slot]
            return 0

        jax.lax.fori_loop(0, num_devices - 1, step, 0)

    return kernel


def ring_all_gather(
    x: jax.Array, axis_name: str, num_devices: int,
    mesh_axes: tuple = None,
) -> jax.Array:
    """All-gather ``x`` (rows, d) over the ring → (num_devices·rows, d).
    Must be called inside ``shard_map`` over ``axis_name``.  The feature dim
    is lane-padded internally.

    ``mesh_axes``: ordered ``((name, size), ...)`` of ALL the mesh's axes —
    required whenever the mesh has more than the ring axis (each data-row of
    a hybrid ``data×graph`` mesh runs its own independent ring; the kernel
    needs the full shape to address the right neighbor's LOGICAL id).
    Defaults to the 1-axis mesh ``((axis_name, num_devices),)``."""
    rows, d = x.shape
    d_pad = ((d + LANES - 1) // LANES) * LANES
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    if mesh_axes is None:
        mesh_axes = ((axis_name, num_devices),)
    mesh_axes = tuple((str(n), int(s)) for n, s in mesh_axes)
    assert any(n == axis_name and s == num_devices for n, s in mesh_axes), (
        f"mesh_axes {mesh_axes} must contain the ring axis ({axis_name}, {num_devices})"
    )

    interp = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _ring_kernel(num_devices, rows, axis_name, mesh_axes, barrier=True),
        out_shape=jax.ShapeDtypeStruct((num_devices * rows, d_pad), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, d_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True, collective_id=0),
        interpret=pltpu.InterpretParams() if interp else False,
    )(x)
    return out[:, :d]
