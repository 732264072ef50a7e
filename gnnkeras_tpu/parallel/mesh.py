"""Device-mesh helpers.

The reference has no distribution of any kind (single eager device, SURVEY §2);
this module is the new framework's first-class communication layer: meshes over
ICI (intra-slice) / DCN (multi-host), with shard_map + XLA collectives doing
the transport.  Axis conventions:

- ``data``  — data parallelism over merged graph batches (gradient psum),
- ``graph`` — edge/node partition of one large graph (state rows sharded;
  per-iteration boundary-state exchange — this domain's sequence-parallel
  analog).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh over the available devices.  With one axis, all devices go
    on it; with several, ``shape`` must multiply out to the device count."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        if len(axes) != 1:
            raise ValueError("shape is required for multi-axis meshes")
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != device count {len(devices)}")
    return Mesh(np.asarray(devices).reshape(shape), axes)
