"""Expert parallelism over composite per-node-type state MLPs.

SURVEY §2 maps EP onto this framework as "the per-node-type expert MLPs of
CompositeGNN ARE an expert-parallel structure — shard types across devices".
This module does exactly that:

- every type's state MLP is padded to a common input width (zero kernel rows
  for the padding, so outputs are bit-identical) and stacked into one
  leading-axis parameter pytree,
- the stacked experts are sharded over the ``expert`` mesh axis; each device
  runs its local experts over *all* node rows (vmapped), masks by node type,
  and the per-type partial states are ``psum``-combined — the composite
  convergence step (reference CompositeGNN.py:215-234) distributed across
  devices,
- the output MLP and all graph data stay replicated; expert gradients live
  sharded (each device owns its experts' optimizer state implicitly through
  the sharded grads).

Equality with the single-device composite forward is tested on the virtual
8-device CPU mesh.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnkeras_tpu.graph.batch import GraphBatch
from gnnkeras_tpu.models.composite import CompositeGNNnodeBased
from gnnkeras_tpu.models.gnn import STATE_INIT_STDDEV, run_unfold_loops
from gnnkeras_tpu.utils.dtypes import floatx


def _check_same_program(mlps) -> None:
    def _reg_key(r):
        # named regularizers compare by value; callables by identity, except
        # that DISTINCT callables are tolerated (separately constructed
        # lambdas/partials repr to different addresses while being
        # semantically identical — only the presence pattern must agree)
        return r if isinstance(r, (str, type(None))) else "<callable>"

    progs = [
        [
            (l[0],) + ((l[1], l[2], _reg_key(l[5]), _reg_key(l[6])) if l[0] == "dense" else ())
            for l in m.program
        ]
        for m in mlps
    ]
    if any(p != progs[0] for p in progs[1:]):
        raise ValueError(
            "expert parallelism requires all per-type MLPs to share the same layer "
            "program (units, activations, regularizers)"
        )


def stack_expert_params(
    mlps,
    params_list: List[list],
    state_list: List[list],
    n_pad_types: int,
    label_widths: Optional[List[int]] = None,
):
    """Stack per-type MLP params along a new leading axis, zero-padding the
    width-dependent leaves (first dense kernel, first BatchNorm) to the widest
    type.  With ``label_widths`` (= per-type ``dim_node_label``) the padding is
    INSERTED after the label slice (rows d_t..d_max) so every expert consumes
    the uniform input layout
    ``[label(zero-padded to d_max) | state | agg_states | agg_component]`` —
    which lets each device build inputs for its LOCAL experts only; without it
    the padding is appended at the end (legacy all-types-input layout).  Zero
    kernel rows make the padded columns inert, so stacked execution is exactly
    equal to per-type execution."""
    _check_same_program(mlps)
    widths = [m.input_dim[0] for m in mlps]
    w_max = max(widths)

    def insert_rows(v, at: int, n: int):
        if n == 0:
            return v
        pad_shape = (n,) + v.shape[1:]
        return jnp.concatenate([v[:at], jnp.zeros(pad_shape, v.dtype), v[at:]], axis=0)

    def pad_first_width(tree_list, layer_kinds):
        out = []
        for t, layers in enumerate(tree_list):
            n_pad = w_max - widths[t]
            at = label_widths[t] if label_widths is not None else widths[t]
            padded_layers = []
            first_width_done = False
            for kind, leafdict in zip(layer_kinds, layers):
                d = dict(leafdict)
                if not first_width_done and kind == "batch_norm":
                    d = {key: insert_rows(v, at, n_pad) for key, v in d.items()}
                elif not first_width_done and kind == "dense":
                    if "kernel" in d:
                        d["kernel"] = insert_rows(d["kernel"], at, n_pad)
                    first_width_done = True
                padded_layers.append(d)
                if kind == "dense":
                    first_width_done = True
            out.append(padded_layers)
        return out

    kinds = [l[0] for l in mlps[0].program]
    params_padded = pad_first_width(params_list, kinds)
    state_padded = pad_first_width(state_list, kinds)

    def stack(trees):
        while len(trees) < n_pad_types:
            trees = trees + [jax.tree_util.tree_map(jnp.zeros_like, trees[0])]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)

    return stack(params_padded), stack(state_padded), w_max


def unstack_expert_params(
    mlps,
    stacked_params,
    stacked_state,
    label_widths: Optional[List[int]] = None,
):
    """Inverse of :func:`stack_expert_params`: slice each REAL type's entry
    off the leading expert axis and strip the inserted zero-padding rows from
    the width-dependent leaves, restoring the wrapped model's per-type
    variable lists (padded phantom experts are dropped)."""
    widths = [m.input_dim[0] for m in mlps]
    w_max = max(widths)
    kinds = [l[0] for l in mlps[0].program]

    def strip_rows(v, at: int, n: int):
        if n == 0:
            return v
        return jnp.concatenate([v[:at], v[at + n :]], axis=0)

    def unpack(stacked, t):
        layers = jax.tree_util.tree_map(lambda x: x[t], stacked)
        n_pad = w_max - widths[t]
        at = label_widths[t] if label_widths is not None else widths[t]
        out, first_done = [], False
        for kind, leafdict in zip(kinds, layers):
            d = dict(leafdict)
            if not first_done and kind == "batch_norm":
                d = {key: strip_rows(v, at, n_pad) for key, v in d.items()}
            elif not first_done and kind == "dense":
                if "kernel" in d:
                    d["kernel"] = strip_rows(d["kernel"], at, n_pad)
                first_done = True
            out.append(d)
            if kind == "dense":
                first_done = True
        return out

    n_types = len(mlps)
    return (
        [unpack(stacked_params, t) for t in range(n_types)],
        [unpack(stacked_state, t) for t in range(n_types)],
    )


class ExpertParallelCompositeGNN:
    """Distributed wrapper around a (compiled, built) composite GNN: the
    per-type state experts are sharded over the ``expert`` mesh axis."""

    def __init__(self, cgnn: CompositeGNNnodeBased, mesh: Optional[Mesh] = None, axis: str = "expert"):
        from gnnkeras_tpu.parallel.mesh import make_mesh

        if getattr(cgnn, "per_iteration_bn", False):
            raise ValueError(
                "per_iteration_bn models are not supported by ExpertParallelCompositeGNN "
                "(the wrapper re-implements the unfold with shared BatchNorm moments)"
            )
        self.cgnn = cgnn
        self.axis = axis
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.n_devices = self.mesh.shape[axis]
        self.n_types = len(cgnn.net_state)
        self.types_pad = -(-self.n_types // self.n_devices) * self.n_devices
        self._cache = {}
        self.proto = cgnn.net_state[0]
        self.stacked_params = None  # built lazily: label widths come from the batch
        self.stacked_state = None
        self.w_max = max(m.input_dim[0] for m in cgnn.net_state)
        self._label_widths = None

    def _ensure_stacked(self, batch: GraphBatch) -> None:
        if self.stacked_params is not None:
            return
        self.cgnn.build()
        self._label_widths = [int(d) for d in batch.dim_node_label]
        self.stacked_params, self.stacked_state, self.w_max = stack_expert_params(
            self.cgnn.net_state,
            self.cgnn.variables["params"]["net_state"],
            self.cgnn.variables["state"]["net_state"],
            self.types_pad,
            label_widths=self._label_widths,
        )

    # -- expert inputs ---------------------------------------------------------
    def _nodes_by_type(self, batch: GraphBatch):
        """(T_pad, N, d_max): type t's node-label slice zero-padded to the
        widest label.  Built OUTSIDE shard_map and sharded over the expert
        axis, so each device only materializes its own experts' label slices;
        the shared [state|aggs|component] tail is appended device-locally
        (replaces the old all-types ``_expert_inputs``, which replicated
        O(T_pad·N·w_max) work and memory on every device)."""
        d_max = max(self._label_widths)
        rows = []
        for d_t in self._label_widths:
            rows.append(jnp.pad(batch.nodes[:, :d_t], ((0, 0), (0, d_max - d_t))))
        while len(rows) < self.types_pad:
            rows.append(jnp.zeros_like(rows[0]))
        return jnp.stack(rows, axis=0)

    def _type_masks(self, batch: GraphBatch):
        cols = [jnp.logical_and(batch.type_mask[:, t], batch.node_mask) for t in range(self.n_types)]
        while len(cols) < self.types_pad:
            cols.append(jnp.zeros_like(cols[0]))
        return jnp.stack(cols, axis=0)  # (T_pad, N)

    # -- forward (inside shard_map; leading expert axis local) ------------------
    def _local_forward(self, sparams, sstate, out_params, out_state, local_nodes, local_masks, batch, rng, training):
        """``local_nodes`` (t_local, N, d_max) / ``local_masks`` (t_local, N)
        are this device's experts' label slices and node-type masks — the only
        per-type buffers materialized per device."""
        gnn, axis, proto = self.cgnn, self.axis, self.proto
        n = batch.num_nodes
        # the composite forward's key chain (models/base + composite.unfold):
        # rng splits into (loop, out) so the state init, per-step dropout AND
        # the output head's dropout all see the wrapped model's exact keys
        rng, rng_out = jax.random.split(rng)
        agg_component = gnn._aggregated_component(batch)
        t_local = self.types_pad // self.n_devices

        if gnn.state_vect_dim > 0:
            state0 = STATE_INIT_STDDEV * jax.random.normal(
                rng, (n, gnn.state_vect_dim), dtype=floatx()
            )
        else:
            state0 = batch.nodes
        state_old0 = jnp.ones_like(state0)
        state_width = gnn.state_vect_dim or batch.nodes.shape[1]

        apply_one = lambda p, s, x, m, r: proto.apply(
            {"params": p, "state": s}, x, training=training, mask=m, rng=r
        )
        vapply = jax.vmap(apply_one, in_axes=(0, 0, 0, 0, 0))

        def transition(state, bn_states, step_rng, agg_states=None):
            if agg_states is None:
                agg_states = batch.aggregate(state)
            tail = jnp.concatenate([state, agg_states, agg_component], axis=1)
            local_inputs = jnp.concatenate(
                [local_nodes, jnp.broadcast_to(tail[None], (t_local,) + tail.shape)], axis=2
            )
            # per-expert rngs: EXACTLY the single-device composite's split
            # layout (composite.py: split(rng, n_steps*n_types) reshaped per
            # step), sliced to this device's experts — dropout masks match
            # the wrapped model bit-for-bit
            e = jax.lax.axis_index(axis)
            rngs = jax.lax.dynamic_slice_in_dim(step_rng, e * t_local, t_local, axis=0)
            outs, new_bn = vapply(sparams, bn_states, local_inputs, local_masks, rngs)
            partial = jnp.sum(jnp.where(local_masks[:, :, None], outs, 0.0), axis=0)
            new_state = jax.lax.psum(partial, axis)
            return new_state[:, :state_width], new_bn

        bn0 = sstate
        n_steps = max(gnn.max_iteration, 1)
        # (n_steps, types_pad, key): real types use the composite model's own
        # key layout; padded experts get inert zero keys (outputs masked)
        n_types = len(gnn.net_state)
        key_shape = jax.random.PRNGKey(0).shape
        typed = jax.random.split(rng, n_steps * n_types).reshape((n_steps, n_types) + key_shape)
        pad_keys = jnp.zeros((n_steps, self.types_pad - n_types) + key_shape, dtype=typed.dtype)
        step_rngs = jnp.concatenate([typed, pad_keys], axis=1)

        # the SHARED loop driver (models/gnn.py run_unfold_loops): training
        # scan / inference while_loop with early exit / peel / remat — the
        # wrapper must not carry its own copy of the loop semantics
        peel_agg = (
            batch.agg_node_labels
            if gnn.state_vect_dim == 0 and batch.agg_node_labels is not None
            else None
        )
        k, state, bn_final = run_unfold_loops(
            gnn, batch, state0, state_old0, bn0, step_rngs, training, transition,
            peel_agg=peel_agg,
        )

        # shared output head (replicated)
        out, out_mask, bn_out = gnn.apply_output(
            {"params": {"net_state": None, "net_output": out_params},
             "state": {"net_state": None, "net_output": out_state}},
            state, batch, training=training, rng=rng_out,
        )
        return k, state, out, out_mask, bn_final, bn_out

    def make_forward(self, training: bool = False):
        key = f"fwd_{training}"
        if key in self._cache:
            return self._cache[key]
        axis = self.axis

        def device_fn(sparams, sstate, out_params, out_state, local_nodes, local_masks, batch, rng):
            return self._local_forward(
                sparams, sstate, out_params, out_state, local_nodes, local_masks, batch, rng, training
            )

        sharded = shard_map(
            device_fn,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(), P(), P(axis), P(axis), P(), P()),
            out_specs=(P(), P(), P(), P(), P(axis), P()),
            check_vma=False,
        )
        fn = jax.jit(sharded)
        self._cache[key] = fn
        return fn

    def forward(self, batch: GraphBatch, training: bool = False, rng=None):
        """(k, state, out, out_mask) — numerically equal to the wrapped
        composite model's forward."""
        self._ensure_stacked(batch)
        if rng is None:
            rng = self.cgnn.next_rng()
        fn = self.make_forward(training)
        out_vars = self.cgnn.variables
        k, state, out, out_mask, new_sstate, new_out_state = fn(
            self.stacked_params,
            self.stacked_state,
            out_vars["params"]["net_output"],
            out_vars["state"]["net_output"],
            self._nodes_by_type(batch),
            self._type_masks(batch),
            batch,
            rng,
        )
        self.stacked_state = new_sstate
        return k, state, out, out_mask

    # -- training ----------------------------------------------------------------
    def make_train_step(self, opt_e_template, opt_o_template):
        """Jitted expert-parallel train step.  Expert params/grads/optimizer
        state stay sharded over the expert axis (each device optimizes only
        its experts); the shared output head is replicated.

        Gradient convention: grad-inside-shard_map differentiates the SUM of
        the D identical per-device losses, so the device objective is
        ``data_loss/D + reg(local experts) + reg(out)/D`` — under it the
        sharded expert grads come out exact as-is and the tied output-head
        grads are completed with one psum (see tensor_parallel.py docstring
        for the derivation).  Spec trees are derived per-leaf because
        optimizer states carry unshardable scalar leaves (optax count)."""
        if "train" in self._cache:
            return self._cache["train"]
        gnn, axis, proto = self.cgnn, self.axis, self.proto
        loss_fn = gnn.loss
        if loss_fn is None:
            raise RuntimeError("compile() the wrapped composite model before training")
        import optax

        from gnnkeras_tpu.training.losses import masked_mean
        from gnnkeras_tpu.training.metrics import get_metric

        D = self.n_devices

        def local_reg(sp):
            return jnp.sum(
                jax.vmap(lambda p: proto.regularization_loss({"params": p, "state": None}))(sp)
            )

        def out_reg(op):
            return gnn.net_output.regularization_loss({"params": op, "state": None})

        def device_step(sparams, sstate, out_p, out_s, opt_e, opt_o, local_nodes, local_masks, batch, rng):
            def objective(sp, op):
                k, state, out, out_mask, bn_e, bn_o = self._local_forward(
                    sp, sstate, op, out_s, local_nodes, local_masks, batch, rng, True
                )
                data_loss = masked_mean(loss_fn(batch.targets, out), batch.target_mask, batch.sample_weight)
                obj = data_loss / D + local_reg(sp) + out_reg(op) / D
                return obj, (k, data_loss, out, bn_e, bn_o)

            (_, (k, data_loss, out, bn_e, bn_o)), (g_sp, g_op) = jax.value_and_grad(
                objective, argnums=(0, 1), has_aux=True
            )(sparams, out_p)
            g_op = jax.lax.psum(g_op, axis)  # tied head: assemble the full grad
            if gnn.average_st_grads:
                # reference GNN.py:295 divides the STATE-net grads by the
                # iteration count k — the experts ARE the state net here
                g_sp = jax.tree_util.tree_map(lambda g: g / jnp.maximum(k, 1.0), g_sp)
            loss = data_loss + jax.lax.psum(local_reg(sparams), axis) + out_reg(out_p)

            upd_e, opt_e = gnn.optimizer.update(g_sp, opt_e, sparams)
            sparams = optax.apply_updates(sparams, upd_e)
            upd_o, opt_o = gnn.optimizer.update(g_op, opt_o, out_p)
            out_p = optax.apply_updates(out_p, upd_o)
            logs = {"loss": loss, "k": k}
            for spec in gnn.metrics:
                name, fn = get_metric(spec)
                s, c = fn(batch.targets, out, batch.target_mask, batch.sample_weight)
                logs[f"{name}_sum"] = s
                logs[f"{name}_count"] = c
            return sparams, bn_e, out_p, bn_o, opt_e, opt_o, logs

        def sharded_specs(tree):
            return jax.tree_util.tree_map(
                lambda x: P(axis) if getattr(x, "ndim", 0) > 0 else P(), tree
            )

        opt_e_spec = sharded_specs(opt_e_template)
        sharded = shard_map(
            device_step,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(), P(), opt_e_spec, P(), P(axis), P(axis), P(), P()),
            out_specs=(P(axis), P(axis), P(), P(), opt_e_spec, P(), P()),
            check_vma=False,
        )
        step = jax.jit(sharded, donate_argnums=(0, 1, 2, 3, 4, 5))
        self._cache["train"] = step
        return step

    def fit(
        self,
        sequencer,
        epochs: int = 1,
        verbose: int = 1,
        seed: int = 0,
        *,
        validation_data=None,
        callbacks: Optional[list] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
        resume: bool = False,
        class_weight: Optional[dict] = None,
        validation_freq: int = 1,
    ):
        """Expert-parallel training over a (composite) sequencer, with the
        full single-device fit surface (one shared driver,
        training/fit_loop.py): validation (scored by ``self.evaluate`` with
        the sharded experts), callbacks, resumable Orbax checkpoints and
        ``class_weight``.  Returns a History (dict-style ``h["loss"]``).

        Checkpoints store the wrapped model's per-type variable lists (synced
        every epoch) plus the engine's optimizer pair — sharded experts and
        tied head — as ``{"expert": ..., "out": ...}`` in the model's
        ``_opt_state``, so a resumed run restacks and continues exactly."""
        from gnnkeras_tpu.training.fit_loop import run_fit_loop
        from gnnkeras_tpu.training.metrics import get_metric
        from gnnkeras_tpu.training.trainer import (
            _apply_class_weight,
            _class_weight_vector,
        )

        gnn = self.cgnn
        if gnn.optimizer is None:
            raise RuntimeError("compile() the wrapped composite model before fit()")
        self._ensure_stacked(sequencer[0])
        h = {
            "sparams": self.stacked_params,
            "sstate": self.stacked_state,
            "out_p": gnn.variables["params"]["net_output"],
            "out_s": gnn.variables["state"]["net_output"],
            "opt_e": gnn.optimizer.init(self.stacked_params),
        }
        h["opt_o"] = gnn.optimizer.init(h["out_p"])
        step = self.make_train_step(h["opt_e"], h["opt_o"])
        cw_vec = _class_weight_vector(class_weight) if class_weight else None
        metric_names = [get_metric(spec)[0] for spec in gnn.metrics]
        # the engine's optimizer pair rides in the model view so Orbax
        # checkpoints carry one stable tree (restored below in _pickup)
        gnn._opt_state = {"expert": h["opt_e"], "out": h["opt_o"]}

        def _sync_model():
            """engine views -> wrapped model (checkpoints/callbacks/eval)."""
            self.stacked_params, self.stacked_state = h["sparams"], h["sstate"]
            gnn.variables["params"]["net_output"] = h["out_p"]
            gnn.variables["state"]["net_output"] = h["out_s"]
            self.sync_to_model()
            gnn._opt_state = {"expert": h["opt_e"], "out": h["opt_o"]}
            # tokens: _sync_model mutates these containers IN PLACE, so a
            # callback/restore that REPLACES them is detectable by identity
            h["var_token"], h["opt_token"] = gnn.variables, gnn._opt_state

        def _pickup():
            """wrapped model -> engine views, only when a callback or a
            checkpoint restore replaced the model view since our last sync
            (identity tokens).  Restored/copied trees come back COMMITTED to
            one device, which conflicts with the expert-mesh shard_map —
            round-trip through host numpy so the jitted step re-places them
            per its specs, exactly like the initial stacking path."""
            if (h.get("var_token") is gnn.variables
                    and h.get("opt_token") is gnn._opt_state):
                return
            host = lambda t: jax.tree_util.tree_map(np.asarray, t)
            self.stacked_params = None
            self._ensure_stacked(sequencer[0])
            h["sparams"] = host(self.stacked_params)
            h["sstate"] = host(self.stacked_state)
            h["out_p"] = host(gnn.variables["params"]["net_output"])
            h["out_s"] = host(gnn.variables["state"]["net_output"])
            h["opt_e"] = host(gnn._opt_state["expert"])
            h["opt_o"] = host(gnn._opt_state["out"])
            h["var_token"], h["opt_token"] = gnn.variables, gnn._opt_state

        def run_epoch(epoch, n):
            losses = []
            sums = {name: [0.0, 0.0] for name in metric_names}
            for i in range(len(sequencer)):
                batch = sequencer[i]
                if cw_vec is not None:
                    batch = _apply_class_weight(batch, cw_vec)
                (h["sparams"], h["sstate"], h["out_p"], h["out_s"],
                 h["opt_e"], h["opt_o"], logs) = step(
                    h["sparams"], h["sstate"], h["out_p"], h["out_s"],
                    h["opt_e"], h["opt_o"],
                    self._nodes_by_type(batch), self._type_masks(batch),
                    batch, gnn.next_rng(),
                )
                losses.append(float(logs["loss"]))
                for name in metric_names:
                    sums[name][0] += float(logs[f"{name}_sum"])
                    sums[name][1] += float(logs[f"{name}_count"])
            sequencer.on_epoch_end()
            _sync_model()
            ep_logs = {"loss": float(np.mean(losses))}
            for name in metric_names:
                ep_logs[name] = sums[name][0] / max(sums[name][1], 1.0)
            return [ep_logs]

        validate = None
        if validation_data is not None:
            validate = lambda: {
                f"val_{k}": v for k, v in self.evaluate(validation_data).items()
            }

        return run_fit_loop(
            gnn, epochs=epochs, run_chunk=run_epoch,
            validate=validate, callbacks=callbacks, verbose=verbose,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume=resume, validation_freq=validation_freq,
            on_resume=_pickup, on_weights_mutated=_pickup,
        )

    def sync_to_model(self) -> None:
        """Write the trained (sharded) expert weights and BatchNorm moments
        back into the wrapped model's per-type variable lists, so
        ``cgnn.save()/predict()/evaluate()`` and further single-device
        fine-tuning see the expert-parallel training — not the compile-time
        initial experts."""
        if self.stacked_params is None:
            return
        p_list, s_list = unstack_expert_params(
            self.cgnn.net_state, self.stacked_params, self.stacked_state,
            label_widths=self._label_widths,
        )
        self.cgnn.variables["params"]["net_state"] = p_list
        self.cgnn.variables["state"]["net_state"] = s_list

    def evaluate(self, sequencer, verbose: int = 0):
        """Loss + metrics over a sequencer with the sharded experts
        (inference mode, moving BN statistics) — mirrors trainer.evaluate."""
        gnn = self.cgnn
        if gnn.loss is None:
            raise RuntimeError("compile() the wrapped composite model before evaluate()")
        self._ensure_stacked(sequencer[0])
        from gnnkeras_tpu.training.losses import masked_mean
        from gnnkeras_tpu.training.metrics import get_metric

        loss_sum = count = 0.0
        sums = {get_metric(spec)[0]: [0.0, 0.0] for spec in gnn.metrics}
        for i in range(len(sequencer)):
            batch = sequencer[i]
            _, _, out, _ = self.forward(batch, training=False)
            per = gnn.loss(batch.targets, out)
            m = np.asarray(batch.target_mask, dtype=float)
            loss_sum += float(jnp.sum(per * batch.sample_weight * batch.target_mask))
            count += float(m.sum())
            for spec in gnn.metrics:
                name, fn = get_metric(spec)
                s, c = fn(batch.targets, out, batch.target_mask, batch.sample_weight)
                sums[name][0] += float(s)
                sums[name][1] += float(c)
        logs = {"loss": loss_sum / max(count, 1.0)}
        for name, (s, c) in sums.items():
            logs[name] = s / max(c, 1.0)
        if verbose:
            print(" - ".join(f"{k}: {v:.4f}" for k, v in logs.items()))
        return logs
