"""Hybrid data-parallel × graph-partitioned training.

A 2D mesh ('data', 'graph'): each data-replica group trains on its own large
partitioned graph whose state rows are sharded over the 'graph' axis.
Gradients are psum'd over 'graph' (completing the per-graph backward) and then
pmean'd over 'data' (averaging across the replica groups), so a single jitted
step composes both parallelism axes — the shape ``dryrun_multichip`` compiles.
No reference counterpart (the reference is single-device)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnkeras_tpu.parallel.partition import PartitionedGNN, PartitionedGraph


def stack_partitioned(pgs: Sequence[PartitionedGraph]) -> PartitionedGraph:
    """Stack equal-shape partitioned graphs along a new leading data axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *pgs)


def make_hybrid_train_step(
    pgnn: PartitionedGNN,
    mesh: Mesh,
    data_axis: str = "data",
    graph_axis: str = "graph",
):
    """Jitted step over a ('data','graph') mesh.

    Signature: ``(params, mstate, opt_state, stacked_pg, rng) -> (params,
    mstate, opt_state, logs)`` where ``stacked_pg`` has leading axes
    (data_parallel, n_parts).
    """
    gnn = pgnn.gnn
    loss_fn = gnn.loss
    if loss_fn is None:
        raise RuntimeError("call gnn.compile() before building the hybrid train step")

    def device_step(params, mstate, opt_state, pg, rng):
        my_data = jax.lax.axis_index(data_axis)
        rng = jax.random.fold_in(rng, my_data)
        (loss, (k, out, new_mstate, count)), grads = jax.value_and_grad(
            lambda p: pgnn._local_loss(p, mstate, pg, rng, loss_fn, True, strip_axes=2),
            has_aux=True,
        )(params)
        # per-device losses within a graph group all equal that group's global
        # loss and params are tied, so pmean over 'graph' recovers the exact
        # group gradient (grad-inside-shard_map differentiates the sum of
        # per-device losses; see partition.py make_train_step)
        grads = jax.lax.pmean(grads, graph_axis)
        if gnn.average_st_grads:
            grads = gnn.scale_state_grads(grads, k)
        grads = jax.lax.pmean(grads, data_axis)
        new_mstate = jax.lax.pmean(new_mstate, data_axis)
        loss = jax.lax.pmean(loss, data_axis)

        updates, opt_state = gnn.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_mstate, opt_state, {"loss": loss, "k": k}

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(data_axis, graph_axis), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2))
