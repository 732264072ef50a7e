"""Multi-host (DCN) layout: meshes and communication-volume accounting.

No reference counterpart (the reference is single-process eager TF; SURVEY
§2 "Parallelism statement").  The design rule (SURVEY §5, BASELINE scaling
target) is: the **per-iteration** halo/state exchange of the partitioned
convergence loop must ride ICI (intra-host), while only the **per-step**
gradient reduction crosses DCN (inter-host).  That is exactly the hybrid
('data' × 'graph') step in parallel/hybrid.py with the data axis mapped
across hosts — this module supplies the host-aware mesh construction, the
``jax.distributed`` bootstrap for real multi-host runs, and an analytic
communication-volume model so the ≥80% 1→2-host scaling-efficiency target
can be projected (and later verified) without hardware present.

Simulated testing: a (hosts × per-host) mesh over virtual CPU devices runs
the same shard_map code single-process (SURVEY §4 "distributed tests without
a cluster"); on a real multi-host slice ``make_multihost_mesh`` places the
outer axis across processes via ``mesh_utils.create_hybrid_device_mesh``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Bootstrap ``jax.distributed`` for a real multi-host run (no-op when
    already initialized or single-process).  Returns the process count."""
    if num_processes is not None and num_processes > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as exc:  # the documented no-op on re-bootstrap
            # jax <=0.4 says "already initialized"; 0.9 says
            # "distributed.initialize should only be called once."
            msg = str(exc)
            if "already initialized" not in msg and "only be called once" not in msg:
                raise
    return jax.process_count()


def make_multihost_mesh(
    n_hosts: int,
    devices_per_host: int,
    dcn_axis: str = "data",
    ici_axis: str = "graph",
) -> Mesh:
    """(n_hosts × devices_per_host) mesh with the outer axis across hosts.

    With multiple JAX processes the hybrid mesh helper guarantees the outer
    axis maps to DCN and the inner axis to ICI; single-process (incl. the
    virtual-CPU simulation) it reshapes the flat device list, which preserves
    the same program and collective structure."""
    if jax.process_count() > 1:
        n_slices = len({getattr(d, "slice_index", 0) for d in jax.devices()})
        if n_slices > 1 and n_slices != n_hosts:
            raise ValueError(
                f"{n_slices} device slices but n_hosts={n_hosts}: the outer "
                "mesh axis must align with the DCN (slice) boundary — pass "
                "n_hosts == number of slices (devices_per_host = devices per "
                "slice), or build the mesh explicitly"
            )
        if n_slices == n_hosts:
            # multi-slice TPU: group by slice so the outer axis rides DCN
            from jax.experimental import mesh_utils

            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, devices_per_host),
                dcn_mesh_shape=(n_hosts, 1),
            )
            return Mesh(devices.reshape(n_hosts, devices_per_host), (dcn_axis, ici_axis))
        # single slice spanning hosts (or CPU simulation): one mesh row per
        # process — the outer axis maps to the inter-process transport
        devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        if len(devices) != n_hosts * devices_per_host:
            raise ValueError(
                f"need {n_hosts * devices_per_host} devices, have {len(devices)}"
            )
        if n_hosts != jax.process_count():
            # a mesh row straddling processes would put the per-iteration
            # halo (the inner axis) on the inter-host transport — exactly
            # what this layout exists to avoid
            raise ValueError(
                f"n_hosts={n_hosts} must equal jax.process_count()="
                f"{jax.process_count()} so each mesh row stays on one host"
            )
        return Mesh(np.array(devices).reshape(n_hosts, devices_per_host), (dcn_axis, ici_axis))
    devices = np.array(jax.devices()[: n_hosts * devices_per_host])
    if devices.size < n_hosts * devices_per_host:
        raise ValueError(
            f"need {n_hosts * devices_per_host} devices, have {devices.size} "
            "(simulate with jax_num_cpu_devices)"
        )
    return Mesh(devices.reshape(n_hosts, devices_per_host), (dcn_axis, ici_axis))


@dataclass
class CommVolume:
    """Per-training-step communication volumes (bytes) of the hybrid
    data(DCN) × graph(ICI) step for one replica group."""

    ici_halo_bytes_per_iteration: int  # boundary-state exchange, every unfolding iteration
    ici_bytes_per_step: int  # halo · k plus the graph-axis grad/BN reductions
    dcn_bytes_per_step: int  # the data-axis gradient/BN reduction only
    n_iterations: int

    def scaling_efficiency_estimate(self, step_compute_seconds: float,
                                    dcn_bandwidth_bytes_per_s: float = 25e9) -> float:
        """Projected 1→N-host scaling efficiency under perfect overlap of
        everything except the DCN reduction (the standard DCN-bound model:
        efficiency = compute / (compute + dcn_time))."""
        dcn_time = self.dcn_bytes_per_step / dcn_bandwidth_bytes_per_s
        return step_compute_seconds / (step_compute_seconds + dcn_time)


def comm_volume(pg, params, state_width: int, n_iterations: Optional[int] = None,
                dtype_bytes: int = 4) -> CommVolume:
    """Analytic per-step communication volumes for a partitioned graph ``pg``
    (parallel/partition.py) trained with parameter tree ``params`` under the
    hybrid data × graph step.

    - ICI per iteration: every device all-gathers the published halo rows
      (H·d values from each of the D partitions) — or the full state when no
      halo set exists.
    - DCN per step: one all-reduce of the gradient tree (+ the BN statistics
      inside it, which live in the same tree reduction).
    """
    D = pg.n_parts
    if pg.publish_local is not None:
        rows_moved = int(pg.publish_local.shape[1]) * D
    else:
        rows_moved = int(pg.nodes_per_part) * D
    halo = rows_moved * state_width * dtype_bytes

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    grad_bytes = 2 * n_params * dtype_bytes  # ring all-reduce moves ~2x the tree

    k = n_iterations if n_iterations is not None else 1
    return CommVolume(
        ici_halo_bytes_per_iteration=halo,
        ici_bytes_per_step=halo * k + grad_bytes,  # graph-axis grad pmean rides ICI
        dcn_bytes_per_step=grad_bytes,
        n_iterations=k,
    )
