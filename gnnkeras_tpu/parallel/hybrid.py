"""Hybrid data-parallel × graph-partitioned (× tensor-parallel) training.

A ('data','graph'[,'model']) mesh: each data-replica group trains on its own
large partitioned graph whose state rows are sharded over 'graph'; with a
``PartitionedGNN(tp_shards>1)`` the state MLP's features are additionally
sharded over 'model'.  Gradients follow the exact recipes derived in
partition.py / tensor_parallel.py (grad-inside-shard_map differentiates the
sum of per-device losses): tied leaves are assembled with pmean/psum over the
group axes, model-sharded leaves are exact under the 1/(Dg·Dm)-scaled
objective.  No reference counterpart (the reference is single-device)."""

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
    model_axis: str = "model",
    opt_template=None,
):
    """Jitted step over a ('data','graph') or ('data','graph','model') mesh.

    Signature: ``(params, mstate, opt_state, stacked_pg, rng) -> (params,
    mstate, opt_state, logs)`` where ``stacked_pg`` has leading axes
    (data_parallel, n_parts).  With ``pgnn.tp_state`` set, params/mstate/
    opt_state must carry the model-stacked net_state
    (``pgnn.shard_tp_variables``) and ``opt_template`` is required for the
    per-leaf optimizer-state sharding specs."""
    gnn = pgnn.gnn
    loss_fn = gnn.loss
    if loss_fn is None:
        raise RuntimeError("call gnn.compile() before building the hybrid train step")
    tp = pgnn.tp_state

    if tp is None:
        def device_step(params, mstate, opt_state, pg, rng):
            my_data = jax.lax.axis_index(data_axis)
            rng = jax.random.fold_in(rng, my_data)
            (loss, (k, out, new_mstate, count)), grads = jax.value_and_grad(
                lambda p: pgnn._local_loss(p, mstate, pg, rng, loss_fn, True, strip_axes=2),
                has_aux=True,
            )(params)
            # per-device losses within a graph group all equal that group's
            # global loss and params are tied, so pmean over 'graph' recovers
            # the exact group gradient (see partition.py make_train_step)
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

    # --- 3-axis: data × graph × model ---------------------------------------
    Dg, Dm = mesh.shape[graph_axis], mesh.shape[model_axis]
    tied_state = tp.tied_mask()

    def _is_model_leaf(path) -> bool:
        return any(getattr(p, "key", None) == "net_state" for p in path)

    def _strip_model(tree):
        """Drop the local model axis (size 1 after shard_map) from net_state
        leaves; net_output/scalar leaves are replicated and untouched."""
        return jax.tree_util.tree_map_with_path(
            lambda path, v: v[0] if _is_model_leaf(path) and getattr(v, "ndim", 0) > 0 else v,
            tree,
        )

    def _expand_model(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, v: v[None] if _is_model_leaf(path) and getattr(v, "ndim", 0) > 0 else v,
            tree,
        )

    def device_step_tp(sparams, smstate, opt_state, pg, rng):
        my_data = jax.lax.axis_index(data_axis)
        rng = jax.random.fold_in(rng, my_data)
        params = _strip_model(sparams)
        mstate = _strip_model(smstate)
        opt_local = _strip_model(opt_state)

        def objective(p):
            loss, aux = pgnn._local_loss(p, mstate, pg, rng, loss_fn, True, strip_axes=2)
            # 1/(Dg·Dm): the group's devices all compute the same loss
            return loss / (Dg * Dm), (loss,) + aux

        (_, (loss, k, out, new_mstate, count)), grads = jax.value_and_grad(
            objective, has_aux=True
        )(params)
        if gnn.average_st_grads:
            grads = gnn.scale_state_grads(grads, k)
        # graph axis ties every leaf; model axis ties only the tied leaves
        grads = jax.lax.psum(grads, graph_axis)
        grads = {
            "net_state": jax.tree_util.tree_map(
                lambda t, g: jax.lax.psum(g, model_axis) if t else g,
                tied_state,
                grads["net_state"],
            ),
            "net_output": jax.lax.psum(grads["net_output"], model_axis),
        }
        grads = jax.lax.pmean(grads, data_axis)
        new_mstate = jax.lax.pmean(new_mstate, data_axis)
        loss = jax.lax.pmean(loss, data_axis)

        updates, opt_local = gnn.optimizer.update(grads, opt_local, params)
        params = optax.apply_updates(params, updates)
        return _expand_model(params), _expand_model(new_mstate), _expand_model(opt_local), {
            "loss": loss, "k": k,
        }

    def opt_specs(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: P(model_axis)
            if _is_model_leaf(path) and getattr(x, "ndim", 0) > 0
            else P(),
            tree,
        )

    if opt_template is None:
        raise ValueError("TP-hybrid needs opt_template for optimizer-state sharding specs")
    vars_spec = {"net_state": P(model_axis), "net_output": P()}
    sharded = shard_map(
        device_step_tp,
        mesh=mesh,
        in_specs=(vars_spec, vars_spec, opt_specs(opt_template), P(data_axis, graph_axis), P()),
        out_specs=(vars_spec, vars_spec, opt_specs(opt_template), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2))
