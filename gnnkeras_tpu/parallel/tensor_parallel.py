"""Tensor parallelism: shard the state-MLP feature dimension over a 'model'
mesh axis (SURVEY §2 parallelism mapping, SURVEY.md:101 — no reference
counterpart; the reference is single-device eager).

Megatron-style alternating splits over the Dense stack:

- even Dense layers are **column-split** (output features sharded; the
  following BatchNorm/bias/activation act per-feature and stay local),
- odd Dense layers are **row-split** (contraction over the sharded features;
  partial products are ``psum``'d over the model axis, bias added once),
- a trailing column-split layer is ``all_gather``'d so the unfolding loop's
  state stays replicated.

Feature dims that don't divide the shard count are zero-padded: padded
features carry zero kernel columns/bias/gamma, so they stay exactly zero
through Dense→BN→activation and contribute nothing through the next layer's
zero kernel rows — sharded results equal the single-device ones bit-for-bit
(up to float reassociation in the psum).

Gradient convention: ``jax.grad`` inside ``shard_map`` differentiates the
**sum of the per-device losses** (collective transposes are collectives, so a
replicated cotangent picks up a factor of D at every forward psum).  Because
every device computes the same full loss L, the exact recipe is: scale the
per-device objective by 1/D, then ``psum`` the gradients of **tied**
(replicated) leaves while leaving **sharded** leaves untouched — correct for
any path structure, recurrent loop included (``TensorParallelMLP.tied_mask``
marks which is which)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnkeras_tpu.graph.batch import GraphBatch
from gnnkeras_tpu.models.gnn import GNNnodeBased, run_unfold_loops
from gnnkeras_tpu.models.mlp import MLP, _batch_norm_apply, _dropout_apply, get_activation


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class TensorParallelMLP:
    """Sharded-parameter view + sharded apply for an ``MLP`` spec.

    ``split_plan`` marks each program entry: 'col' (feature-sharded Dense and
    any BN/dropout until the next Dense), 'row' (contracting Dense), or
    'rep' (replicated compute)."""

    def __init__(self, mlp: MLP, n_shards: int, axis: str = "model"):
        self.mlp = mlp
        self.n_shards = int(n_shards)
        self.axis = axis

        # Walk the program assigning split types.  The stack starts replicated;
        # Dense layers alternate col → row → col ...; non-Dense layers inherit
        # the current activation sharding.
        plan: List[str] = []
        dense_parity = 0
        current = "rep"  # sharding of the running activation
        for layer in mlp.program:
            if layer[0] == "dense":
                if dense_parity % 2 == 0:
                    plan.append("col")
                    current = "col"
                else:
                    plan.append("row")
                    current = "rep"
                dense_parity += 1
            else:
                plan.append(current)
        self.plan = plan
        self.gather_output = current == "col"  # trailing col-split → all_gather

        # softmax mixes features; only legal on replicated activations
        for layer, tag in zip(mlp.program, plan):
            if layer[0] == "dense" and tag == "col" and layer[2] == "softmax":
                if not self.gather_output or layer is not mlp.program[-1]:
                    raise ValueError("softmax on a column-split layer requires gathering first")

    # -- parameter resharding -------------------------------------------------
    def _padded_units(self, units: int) -> int:
        return _round_up(units, self.n_shards)

    def shard_variables(self, variables: dict) -> dict:
        """Full variables → stacked per-shard variables (leading axis D).
        Column-split features are zero-padded to a multiple of D."""
        D = self.n_shards
        params, state = variables["params"], variables["state"]
        out_p, out_s = [], []
        prev_tag = "rep"
        for layer, tag, p, s in zip(self.mlp.program, self.plan, params, state):
            if layer[0] == "dense":
                kernel, bias = p["kernel"], p["bias"]
                if tag == "col":
                    U = kernel.shape[1]
                    U_pad = self._padded_units(U)
                    k = jnp.pad(kernel, ((0, 0), (0, U_pad - U)))
                    b = jnp.pad(bias, (0, U_pad - U))
                    out_p.append(
                        {
                            "kernel": jnp.stack(jnp.split(k, D, axis=1)),  # (D, F, u)
                            "bias": jnp.stack(jnp.split(b, D)),  # (D, u)
                        }
                    )
                else:  # row: pad input rows to match the col-sharded features
                    F = kernel.shape[0]
                    F_pad = self._padded_units(F)
                    k = jnp.pad(kernel, ((0, F_pad - F), (0, 0)))
                    out_p.append(
                        {
                            "kernel": jnp.stack(jnp.split(k, D, axis=0)),  # (D, f, V)
                            "bias": jnp.broadcast_to(bias, (D,) + bias.shape),  # replicated
                        }
                    )
                out_s.append({})
            elif layer[0] == "batch_norm":
                def shard_feat(v):
                    U = v.shape[0]
                    U_pad = self._padded_units(U)
                    vv = jnp.pad(v, (0, U_pad - U))
                    return jnp.stack(jnp.split(vv, D))

                if tag == "col":
                    out_p.append({"gamma": shard_feat(p["gamma"]), "beta": shard_feat(p["beta"])})
                    out_s.append(
                        {
                            "moving_mean": shard_feat(s["moving_mean"]),
                            "moving_var": shard_feat(s["moving_var"]),
                        }
                    )
                else:
                    out_p.append(jax.tree_util.tree_map(lambda v: jnp.broadcast_to(v, (D,) + v.shape), p))
                    out_s.append(jax.tree_util.tree_map(lambda v: jnp.broadcast_to(v, (D,) + v.shape), s))
            else:
                out_p.append({})
                out_s.append({})
        return {"params": out_p, "state": out_s}

    def tied_mask(self) -> List[dict]:
        """Per-leaf True where the parameter is TIED (replicated on every
        shard) rather than sharded — tied grads are psum'd, sharded grads are
        complete as-is (module docstring)."""
        out = []
        for layer, tag in zip(self.mlp.program, self.plan):
            if layer[0] == "dense":
                if tag == "col":
                    out.append({"kernel": False, "bias": False})
                else:
                    out.append({"kernel": False, "bias": True})
            elif layer[0] == "batch_norm":
                tied = tag != "col"
                out.append({"gamma": tied, "beta": tied})
            else:
                out.append({})
        return out

    def gather_variables(self, stacked: dict) -> dict:
        """Inverse of ``shard_variables`` (drops feature padding)."""
        params, state = stacked["params"], stacked["state"]
        out_p, out_s = [], []
        feat = self.mlp.input_dim[0]
        for layer, tag, p, s in zip(self.mlp.program, self.plan, params, state):
            if layer[0] == "dense":
                if tag == "col":
                    U = layer[1]
                    kernel = jnp.concatenate(list(p["kernel"]), axis=1)[:, :U]
                    bias = jnp.concatenate(list(p["bias"]))[:U]
                else:
                    F = feat
                    kernel = jnp.concatenate(list(p["kernel"]), axis=0)[:F]
                    bias = p["bias"][0]
                out_p.append({"kernel": kernel, "bias": bias})
                out_s.append({})
                feat = layer[1]
            elif layer[0] == "batch_norm":
                if tag == "col":
                    out_p.append({k: jnp.concatenate(list(v))[:feat] for k, v in p.items()})
                    out_s.append({k: jnp.concatenate(list(v))[:feat] for k, v in s.items()})
                else:
                    out_p.append({k: v[0] for k, v in p.items()})
                    out_s.append({k: v[0] for k, v in s.items()})
            else:
                out_p.append({})
                out_s.append({})
        return {"params": out_p, "state": out_s}

    # -- sharded forward (inside shard_map; local vars have no D axis) --------
    def apply(
        self,
        variables: dict,
        x: jax.Array,
        *,
        training: bool = False,
        mask: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        bn_axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, List[dict]]:
        """``bn_axis_name``: mesh axis over which BatchNorm ROW statistics
        are psum'd (e.g. the 'graph' axis when rows are edge-partitioned);
        feature sharding over the model axis never needs stat collectives."""
        axis = self.axis
        params, state = variables["params"], variables["state"]
        new_state: List[dict] = []
        deferred_act = None
        for layer, tag, p, s in zip(self.mlp.program, self.plan, params, state):
            if layer[0] == "dense":
                act = get_activation(layer[2])
                if tag == "col":
                    x = x @ p["kernel"] + p["bias"]
                    if layer[2] == "softmax":  # gathered below; apply after
                        deferred_act = act
                    else:
                        x = act(x)
                else:
                    x = jax.lax.psum(x @ p["kernel"], axis) + p["bias"]
                    x = act(x)
                new_state.append({})
            elif layer[0] == "batch_norm":
                # feature-sharded or replicated: moments are per-feature, so
                # the model axis never enters; row sharding (if any) does.
                x, s_new = _batch_norm_apply(p, s, x, training, mask, bn_axis_name)
                new_state.append(s_new)
            else:
                _, rate, alpha = layer
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                    if tag == "col":  # distinct masks per feature shard
                        sub = jax.random.fold_in(sub, jax.lax.axis_index(axis))
                else:
                    sub = None
                x = _dropout_apply(rate, alpha, x, training, sub)
                new_state.append({})
        if self.gather_output:
            x = jax.lax.all_gather(x, axis, axis=1, tiled=True)[:, : self.mlp.output_dim]
            if deferred_act is not None:
                x = deferred_act(x)
        return x, new_state


class TensorParallelGNN:
    """Replicated-data, model-sharded unfolding engine around a homogeneous
    ``GNNnodeBased``-family model: the state MLP's features are sharded over
    the 'model' axis; aggregation and the output net run replicated.

    Numerically equivalent to the single-device engine (equality tests in
    tests/test_tensor_parallel.py)."""

    def __init__(self, gnn: GNNnodeBased, mesh: Optional[Mesh] = None, axis: str = "model"):
        from gnnkeras_tpu.parallel.mesh import make_mesh

        if getattr(gnn, "per_iteration_bn", False):
            raise ValueError(
                "per_iteration_bn models are not supported by TensorParallelGNN "
                "(the wrapper re-implements the unfold with shared BatchNorm moments)"
            )
        self.gnn = gnn
        self.axis = axis
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.n_devices = self.mesh.shape[axis]
        self.tp_state = TensorParallelMLP(gnn.net_state, self.n_devices, axis)
        self._cache = {}

    # -- variable resharding --------------------------------------------------
    def shard_variables(self, variables: dict) -> dict:
        D = self.n_devices
        rep = lambda tree: jax.tree_util.tree_map(lambda v: jnp.broadcast_to(v, (D,) + v.shape), tree)
        sv = self.tp_state.shard_variables(
            {"params": variables["params"]["net_state"], "state": variables["state"]["net_state"]}
        )
        return {
            "params": {
                "net_state": sv["params"],
                "net_output": rep(variables["params"]["net_output"]),
            },
            "state": {
                "net_state": sv["state"],
                "net_output": rep(variables["state"]["net_output"]),
            },
        }

    def gather_variables(self, stacked: dict) -> dict:
        g = self.tp_state.gather_variables(
            {"params": stacked["params"]["net_state"], "state": stacked["state"]["net_state"]}
        )
        take0 = lambda tree: jax.tree_util.tree_map(lambda v: v[0], tree)
        return {
            "params": {"net_state": g["params"], "net_output": take0(stacked["params"]["net_output"])},
            "state": {"net_state": g["state"], "net_output": take0(stacked["state"]["net_output"])},
        }

    # -- device-local forward (inside shard_map) ------------------------------
    def _local_forward(self, variables, batch: GraphBatch, rng, training: bool):
        gnn = self.gnn
        from gnnkeras_tpu.ops.segment import aggregate_edges

        n = batch.num_nodes
        if batch.agg_arc_labels is not None:
            aggregated_arcs = batch.agg_arc_labels
        else:
            aggregated_arcs = aggregate_edges(batch.arc_label, batch.arc_dst, batch.arcnode_weight, n)
        # the single-device key chain (gnn.forward:479): rng splits into
        # (loop, out) — the readout gets its OWN key, not a key the last
        # unfold iteration's dropout already consumed
        if rng is not None:
            rng_loop, rng_out = jax.random.split(rng)
        else:
            rng_loop = rng_out = None
        state0, aggregated_nodes = gnn._initial_state(batch, rng_loop)
        state_old0 = jnp.ones_like(state0)
        bn0 = variables["state"]["net_state"]

        n_steps = max(gnn.max_iteration, 1)
        if rng_loop is not None:
            step_rngs = jax.random.split(rng_loop, n_steps)
        else:
            key = jax.random.PRNGKey(0)
            step_rngs = jnp.zeros((n_steps,) + key.shape, dtype=key.dtype)

        def transition(state, bn_state, step_rng, aggregated_states=None):
            if aggregated_states is None:
                aggregated_states = batch.aggregate(state)
            inp = gnn._transition_input(state, batch, aggregated_states, aggregated_nodes, aggregated_arcs)
            return self.tp_state.apply(
                {"params": variables["params"]["net_state"], "state": bn_state},
                inp,
                training=training,
                mask=batch.node_mask,
                rng=step_rng if rng is not None else None,
            )

        # the SHARED loop driver (models/gnn.py run_unfold_loops): training
        # scan / inference while_loop with early exit / peel / remat — one
        # copy of the loop semantics for every engine, including this one
        peel_agg = (
            batch.agg_node_labels
            if gnn.state_vect_dim == 0 and batch.agg_node_labels is not None
            else None
        )
        k, state, bn_final = run_unfold_loops(
            gnn, batch, state0, state_old0, bn0, step_rngs, training, transition,
            peel_agg=peel_agg,
        )

        # replicated readout (reference apply_filters + net_output)
        out, out_mask, bn_out = gnn.apply_output(
            {
                "params": {"net_output": variables["params"]["net_output"]},
                "state": {"net_output": variables["state"]["net_output"]},
            },
            state,
            batch,
            training=training,
            rng=rng_out,
        )
        return k, state, out, out_mask, {"net_state": bn_final, "net_output": bn_out}

    # -- public jitted entry points -------------------------------------------
    def make_forward(self, training: bool = False):
        key = f"fwd_{training}"
        if key in self._cache:
            return self._cache[key]
        axis = self.axis

        def device_fwd(stacked_vars, batch, rng):
            local = jax.tree_util.tree_map(lambda v: v[0], stacked_vars)
            k, state, out, out_mask, new_mstate = self._local_forward(local, batch, rng, training)
            return k, state, out, jax.tree_util.tree_map(lambda v: v[None], new_mstate)

        sharded = shard_map(
            device_fwd,
            mesh=self.mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(), P(), P(), P(axis)),
            check_vma=False,
        )
        fn = jax.jit(sharded, static_argnums=())
        self._cache[key] = fn
        return fn

    def forward(self, batch: GraphBatch, training: bool = False, rng=None):
        self.gnn.build()
        # cache the stacked tree against the model's variables OBJECT — a
        # prediction loop would otherwise re-pad/re-split/re-upload the whole
        # tree once per batch (updates replace model.variables wholesale, so
        # identity is the correct invalidation key; the held reference keeps
        # the id stable)
        if getattr(self, "_stacked_src", None) is not self.gnn.variables:
            self._stacked_src = self.gnn.variables
            self._stacked_vars = self.shard_variables(self.gnn.variables)
        stacked = self._stacked_vars
        # training also needs a key (dropout) even at dim_state==0 — without
        # it a training=True forward silently runs dropout-disabled
        if rng is None and (self.gnn.state_vect_dim > 0 or training):
            rng = self.gnn.next_rng()
        k, state, out, _ = self.make_forward(training)(stacked, batch, rng)
        return k, state, out

    def make_train_step(self):
        if "train" in self._cache:
            return self._cache["train"]
        gnn, axis = self.gnn, self.axis
        loss_fn = gnn.loss
        if loss_fn is None:
            raise RuntimeError("call gnn.compile() before building the TP train step")
        from gnnkeras_tpu.training.losses import masked_mean

        D = self.n_devices
        tied_state = self.tp_state.tied_mask()

        def device_step(stacked_params, stacked_mstate, opt_state, batch, rng):
            params = jax.tree_util.tree_map(lambda v: v[0], stacked_params)
            mstate = jax.tree_util.tree_map(lambda v: v[0], stacked_mstate)
            opt_local = jax.tree_util.tree_map(lambda v: v[0], opt_state)

            def objective(p):
                k, state, out, out_mask, new_mstate = self._local_forward(
                    {"params": p, "state": mstate}, batch, rng, True
                )
                loss = masked_mean(loss_fn(batch.targets, out), batch.target_mask, batch.sample_weight)
                # 1/D: grad-inside-shard_map differentiates the sum of the D
                # identical per-device losses (module docstring)
                return loss / D, (k, loss, new_mstate)

            (_, (k, loss, new_mstate)), grads = jax.value_and_grad(objective, has_aux=True)(params)
            # tied leaves: assemble the full gradient across shards; sharded
            # leaves are already exact under the 1/D objective.
            grads = {
                "net_state": jax.tree_util.tree_map(
                    lambda tied, g: jax.lax.psum(g, axis) if tied else g,
                    tied_state,
                    grads["net_state"],
                ),
                "net_output": jax.lax.psum(grads["net_output"], axis),
            }
            if gnn.average_st_grads:
                grads = gnn.scale_state_grads(grads, k)
            updates, opt_local = gnn.optimizer.update(grads, opt_local, params)
            params = optax.apply_updates(params, updates)
            expand = lambda tree: jax.tree_util.tree_map(lambda v: v[None], tree)
            return expand(params), expand(new_mstate), expand(opt_local), {"loss": loss, "k": k}

        sharded = shard_map(
            device_step,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(axis), P(axis), P(axis), P()),
            check_vma=False,
        )
        step = jax.jit(sharded, donate_argnums=(0, 1, 2))
        self._cache["train"] = step
        return step

    def fit(self, batch: GraphBatch, epochs: int = 1, verbose: int = 1, seed: int = 0):
        """Full-batch TP training; model weights are written back gathered."""
        gnn = self.gnn
        if gnn.optimizer is None:
            raise RuntimeError("call compile() before fit()")
        gnn.build(seed=seed)
        stacked = self.shard_variables(gnn.variables)
        params, mstate = stacked["params"], stacked["state"]
        opt_state = jax.tree_util.tree_map(
            lambda v: v, jax.vmap(gnn.optimizer.init)(params)
        )
        step = self.make_train_step()
        history = {"loss": []}
        for epoch in range(epochs):
            params, mstate, opt_state, logs = step(params, mstate, opt_state, batch, gnn.next_rng())
            history["loss"].append(float(logs["loss"]))
            if verbose:
                print(f"Epoch {epoch + 1}/{epochs} loss: {float(logs['loss']):.4f}")
        gnn.variables = self.gather_variables({"params": params, "state": mstate})
        return history
