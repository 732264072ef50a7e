"""Pipeline parallelism: GPipe-style LGNN layer pipelining over a 'stage'
mesh axis (SURVEY §2 parallelism mapping, SURVEY.md:101 — "PP = LGNN layer
pipelining across stages"; no reference counterpart).

One stage per LGNN layer; M microbatches flow through S stages in
``M + S - 1`` clock ticks driven by a single ``lax.scan``.  Each tick a stage
(a) receives the previous layer's converged state/output for *its* current
microbatch over ``ppermute``, (b) rebuilds the layer input exactly as
``LGNN.update_graph`` does (prepend propagated features to the t=0 labels,
reference GNN/Models/LGNN.py:175-214), (c) runs its layer's full convergence
loop + readout and accumulates its per-layer loss (parallel training mode:
mean of per-layer losses, LGNN.py:262), and (d) forwards its own
state/output ring-wise to the next stage.

Scope (asserted): ``dim_state > 0`` (with dim_state==0 the reference's input
width grows per layer — MLP.py:109-115 — so stage parameters cannot be
homogeneous).  All three focuses are supported; arc-focused stacks propagate
the previous layer's output onto the ARC labels (update_graph, LGNN.py:211)
so the inter-stage hand-off carries a (node-rows, arc-rows) feature pair, and
need ``node_label_dim`` (net_state and the arc readout have identical input
totals, so the MLP dims alone cannot locate layer-0's padding rows).
Layer 0's smaller kernels are zero-row padded at the propagated-feature
positions, which is exact: the zero features contribute nothing forward and
their kernel rows receive zero gradient (they also stay zero under training
because their cotangent is identically zero).

Gradients: each stage's per-device loss is its PARTIAL contribution, so the
summed-over-devices objective that grad-inside-shard_map differentiates IS
the total pipeline loss — stage-sharded parameter gradients come out exact
with no grad collective (cross-stage dependencies flow through the ppermute
transpose inside the scanned reverse pass).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnkeras_tpu.graph.batch import GraphBatch
from gnnkeras_tpu.models.lgnn import LGNN
from gnnkeras_tpu.training.losses import masked_mean
from gnnkeras_tpu.utils.dtypes import floatx


def _insert_rows(v, at: int, n: int, axis: int = 0):
    if n == 0:
        return v
    shape = v.shape[:axis] + (n,) + v.shape[axis + 1:]
    pad = jnp.zeros(shape, v.dtype)
    lo = jax.lax.slice_in_dim(v, 0, at, axis=axis)
    hi = jax.lax.slice_in_dim(v, at, v.shape[axis], axis=axis)
    return jnp.concatenate([lo, pad, hi], axis=axis)


def _strip_rows(v, at: int, n: int, axis: int = 0):
    if n == 0:
        return v
    lo = jax.lax.slice_in_dim(v, 0, at, axis=axis)
    hi = jax.lax.slice_in_dim(v, at + n, v.shape[axis], axis=axis)
    return jnp.concatenate([lo, hi], axis=axis)


class _Layer0Padding:
    """Row positions (in the layers≥1 full-input coordinates) where layer 0's
    width-dependent kernel leaves are missing the propagated-feature rows.

    net_state input order is ``[state | nodes | agg_states | agg_nodes |
    agg_arcs]`` (gnn.py:221-231).  Node/graph focus prepends the propagated
    state+output inside ``nodes`` (and therefore ``agg_nodes``); arc focus
    prepends the state inside ``nodes`` and the output inside the ARC labels
    (``agg_arcs``) — reference update_graph, LGNN.py:175-214.  net_output
    input is ``[state | nodes]`` (gnn.py:239-242, dim_state>0) or
    ``[src_ext | dst_ext | arc_label]`` for arc focus (gnn.py:317-330)."""

    def __init__(self, lgnn: LGNN, prop_node: int, prop_arc: int, node_label_dim: Optional[int] = None):
        ds = lgnn.gnns[0].state_vect_dim
        gnn1 = lgnn.gnns[-1]
        s1 = gnn1.net_state.input_dim[0]  # 2·ds + 2·wn + da (full layout)
        s0 = lgnn.gnns[0].net_state.input_dim[0]
        if s1 - s0 != 2 * prop_node + prop_arc:  # ValueError: survives python -O
            raise ValueError(
                f"layer-0/layers>=1 input widths do not line up with the propagated "
                f"features: s0={s0}, s1={s1}, expected s1-s0 = 2*{prop_node}+{prop_arc} "
                f"(wrong MLP dims or node_label_dim?)"
            )
        if not lgnn._is_arc:
            # node/graph focus: net_output input = [state | nodes] gives wn
            wn = gnn1.net_output.input_dim[0] - ds
            self.state_ins = [(ds, prop_node), (2 * ds + wn, prop_node)]
            self.output_ins = [(ds, prop_node)]
        else:
            # arc focus: net_output input = 2·(ds+wn) + da — the same total as
            # net_state, so MLP dims alone cannot split node vs arc widths;
            # the raw t=0 node-label width must be given explicitly.
            if node_label_dim is None:
                raise ValueError(
                    "arc-focused pipeline stacks need node_label_dim (the raw "
                    "t=0 node-label width) to locate layer-0's padding rows"
                )
            wn = int(node_label_dim) + prop_node
            ext = ds + wn
            self.state_ins = [(ds, prop_node), (2 * ds + wn, prop_node), (2 * ds + 2 * wn, prop_arc)]
            self.output_ins = [(ds, prop_node), (ext + ds, prop_node), (2 * ext, prop_arc)]
        self.state_ins = [(at, w_) for (at, w_) in self.state_ins if w_ > 0]
        self.output_ins = [(at, w_) for (at, w_) in self.output_ins if w_ > 0]

    @staticmethod
    def _width_axis(shape, target_shape) -> int:
        """The (single) axis where the layer-0 leaf is narrower than the
        layers≥1 template — axis 0 for kernels and flat BN vectors, axis 1
        for per-iteration BN state leaves (leading (K,) iteration axis)."""
        if len(shape) != len(target_shape):
            raise ValueError(f"rank mismatch padding {shape} to {target_shape}")
        axes = [i for i, (a, b) in enumerate(zip(shape, target_shape)) if a != b]
        if len(axes) != 1:
            raise ValueError(f"expected one width axis padding {shape} to {target_shape}, got {axes}")
        return axes[0]

    def pad(self, leaf, net: str, target_shape):
        ins = self.state_ins if net == "state" else self.output_ins
        axis = self._width_axis(leaf.shape, target_shape)
        target_rows = target_shape[axis]
        v = leaf
        for at, w_ in ins:
            if v.shape[axis] == target_rows:
                break
            v = _insert_rows(v, at, w_, axis=axis)
        if v.shape[axis] != target_rows:
            raise ValueError(f"pad failed: {leaf.shape} -> {v.shape[axis]} != {target_rows} via {ins}")
        return v

    def strip(self, leaf, net: str, target_shape):
        ins = self.state_ins if net == "state" else self.output_ins
        axis = self._width_axis(leaf.shape, target_shape)
        target_rows = target_shape[axis]
        v = leaf
        for at, w_ in reversed(ins):
            if v.shape[axis] == target_rows:
                break
            v = _strip_rows(v, at, w_, axis=axis)
        if v.shape[axis] != target_rows:
            raise ValueError(f"strip failed: {leaf.shape} -> {v.shape[axis]} != {target_rows} via {ins}")
        return v


def _map_width_leaves(tree_a, tree_b, fn):
    """tree_map that applies ``fn(a, b)`` only where leaf shapes differ."""
    return jax.tree_util.tree_map(
        lambda a, b: a if a.shape == b.shape else fn(a, b), tree_a, tree_b
    )


class PipelineLGNN:
    """GPipe pipeline over an LGNN's layers (parallel training mode)."""

    def __init__(
        self,
        lgnn: LGNN,
        mesh: Optional[Mesh] = None,
        axis: str = "stage",
        node_label_dim: Optional[int] = None,
    ):
        from gnnkeras_tpu.parallel.mesh import make_mesh

        if lgnn.gnns[0].state_vect_dim <= 0:
            raise ValueError(
                "pipeline parallelism needs dim_state > 0 (dim_state==0 grows the "
                "input width per layer, MLP.py:109-115, so stages cannot share shapes)"
            )
        # per_iteration_bn composes: the layer-0 width padding finds the
        # width axis per leaf, so per-iteration BN state ((K, f) — iteration
        # axis leading) pads on axis 1 and stage stacking prepends its own
        # axis cleanly (round-4; r3 rejected this combination)
        self.lgnn = lgnn
        self.axis = axis
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.n_stages = self.mesh.shape[axis]
        if self.n_stages != lgnn.LAYERS:
            raise ValueError(
                f"mesh axis '{axis}' ({self.n_stages}) must equal LGNN layers ({lgnn.LAYERS})"
            )
        self.ds = lgnn.gnns[0].state_vect_dim
        go = lgnn.gnns[0].net_output.output_dim * lgnn.get_output
        # propagated features split by destination rows (update_graph,
        # LGNN.py:175-214): state → node labels; output → node labels for
        # node/graph focus, ARC labels for arc focus
        self.prop_node = self.ds * lgnn.get_state + (0 if lgnn._is_arc else go)
        self.prop_arc = go if lgnn._is_arc else 0
        self.proto = lgnn.gnns[-1]  # layers≥1 spec: every stage's compute shape
        self._padding = _Layer0Padding(lgnn, self.prop_node, self.prop_arc, node_label_dim)
        self._cache = {}

    # -- variables -------------------------------------------------------------
    def stack_variables(self) -> dict:
        """Per-layer variables → one stacked tree (leading stage axis), with
        layer 0 zero-padded to the layers≥1 shapes."""
        self.lgnn.build()
        variables = self.lgnn.variables
        layers = [
            {"params": variables["params"]["gnns"][i], "state": variables["state"]["gnns"][i]}
            for i in range(self.lgnn.LAYERS)
        ]
        if self.lgnn.LAYERS > 1:
            ref = layers[1]
            padded0 = {}
            for group in ("params", "state"):
                padded0[group] = {
                    net: _map_width_leaves(
                        layers[0][group][net],
                        ref[group][net],
                        lambda a, b, net=net: self._padding.pad(a, "state" if net == "net_state" else "output", b.shape),
                    )
                    for net in ("net_state", "net_output")
                }
            layers = [padded0] + layers[1:]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layers)

    def unstack_variables(self, stacked: dict) -> dict:
        """Inverse of ``stack_variables`` (drops layer-0's zero padding)."""
        out_p, out_s = [], []
        tmpl0 = self.lgnn.gnns[0].init(jax.random.PRNGKey(0))
        for i in range(self.lgnn.LAYERS):
            tree = jax.tree_util.tree_map(lambda v: v[i], stacked)
            if i == 0 and self.lgnn.LAYERS > 1:
                tree = {
                    group: {
                        net: _map_width_leaves(
                            tree[group][net],
                            tmpl0[group][net],
                            lambda a, b, net=net: self._padding.strip(a, "state" if net == "net_state" else "output", b.shape),
                        )
                        for net in ("net_state", "net_output")
                    }
                    for group in ("params", "state")
                }
            out_p.append(tree["params"])
            out_s.append(tree["state"])
        return {"params": {"gnns": out_p}, "state": {"gnns": out_s}}

    # -- device-local tick compute ---------------------------------------------
    def _augment(self, batch: GraphBatch, prop: dict, is_stage0) -> GraphBatch:
        """Layer input: [prop | t=0 labels] with grown label dims
        (update_graph, LGNN.py:175-214); stage 0 sees zeros in the prop slot
        (inert under its zero-padded kernels).  ``prop`` carries node-row and
        arc-row parts (arc focus propagates the output onto the arc labels)."""
        prop = jax.tree_util.tree_map(lambda p: jnp.where(is_stage0, 0.0, p), prop)
        changes = {}
        if self.prop_node:
            changes["nodes"] = jnp.concatenate([prop["node"], batch.nodes], axis=1)
            changes["dim_node_label"] = tuple(int(d) + self.prop_node for d in batch.dim_node_label)
            changes["agg_node_labels"] = None
        if self.prop_arc:
            changes["arc_label"] = jnp.concatenate([prop["arc"], batch.arc_label], axis=1)
            changes["agg_arc_labels"] = None
        return batch.replace(**changes)

    def _layer_tick(self, vars_local, batch, prop_in, is_stage0, rng_loop, rng_out, training):
        lgnn, proto = self.lgnn, self.proto
        cur = self._augment(batch, prop_in, is_stage0)
        k, state, bn_state = proto.unfold(vars_local, cur, training=training, rng=rng_loop)
        out, row_mask, bn_out = proto.node_level_output(
            vars_local, state, cur, training=training, rng=rng_out
        )
        out_loss = cur.readout(out) if lgnn._is_graph else out
        # next stage's prop features (update_graph concat order: state first;
        # arc focus sends the masked output to the ARC rows)
        node_pieces, arc_pieces = [], []
        if lgnn.get_state:
            node_pieces.append(state)
        if lgnn.get_output:
            scattered = jnp.where(row_mask[:, None], out, 0.0)
            (arc_pieces if lgnn._is_arc else node_pieces).append(scattered)
        n_nodes, n_arcs = batch.nodes.shape[0], batch.arc_label.shape[0]
        prop_out = {
            "node": jnp.concatenate(node_pieces, axis=1) if node_pieces else jnp.zeros((n_nodes, 0), floatx()),
            "arc": jnp.concatenate(arc_pieces, axis=1) if arc_pieces else jnp.zeros((n_arcs, 0), floatx()),
        }
        return k, out_loss, prop_out, {"net_state": bn_state, "net_output": bn_out}

    def _layer_reg(self, params) -> jax.Array:
        dummy = lambda p: {"params": p, "state": None}
        return self.proto.net_state.regularization_loss(
            dummy(params["net_state"])
        ) + self.proto.net_output.regularization_loss(dummy(params["net_output"]))

    # -- train step -------------------------------------------------------------
    def make_train_step(self, n_microbatches: int, opt_template):
        key = ("train", n_microbatches)
        if key in self._cache:
            return self._cache[key]
        lgnn, axis = self.lgnn, self.axis
        loss_fn = lgnn.loss
        if loss_fn is None:
            raise RuntimeError("compile() the LGNN before building the pipeline step")
        S, M = self.n_stages, n_microbatches
        T = M + S - 1
        perm = [(i, i + 1) for i in range(S - 1)]

        def device_step(svars_p, svars_s, opt_state, batches, rngs):
            params = jax.tree_util.tree_map(lambda v: v[0], svars_p)
            mstate = jax.tree_util.tree_map(lambda v: v[0], svars_s)
            opt_local = jax.tree_util.tree_map(lambda v: v[0], opt_state)
            my_rngs = rngs[0]  # (M, 2, key)
            s = jax.lax.axis_index(axis)
            n_nodes = batches.nodes.shape[1]
            n_arcs = batches.arc_label.shape[1]

            def objective(p):
                def tick(carry, t):
                    prop_in, num_sum, den_sum, k_sum, bn = carry
                    m = t - s
                    active = jnp.logical_and(m >= 0, m < M)
                    mc = jnp.clip(m, 0, M - 1)
                    batch_m = jax.tree_util.tree_map(
                        lambda x: jax.lax.dynamic_index_in_dim(x, mc, 0, keepdims=False),
                        batches,
                    )
                    rng_pair = my_rngs[mc]
                    k, out_loss, prop_out, new_bn = self._layer_tick(
                        {"params": p, "state": bn},
                        batch_m, prop_in, s == 0, rng_pair[0], rng_pair[1], True,
                    )
                    # accumulate masked SUMS, not per-microbatch means: the
                    # layer loss must be the full-batch masked mean even when
                    # microbatches carry unequal supervised-row counts
                    # (mean-of-means would overweight sparse microbatches)
                    msk = batch_m.target_mask.astype(floatx())
                    w = batch_m.sample_weight * msk
                    per = loss_fn(batch_m.targets, out_loss)
                    act = active.astype(floatx())
                    # masked_mean convention (losses.py): Σ(per·sw·m) / Σm —
                    # the MASK COUNT, not Σ(sw·m), or non-unit sample weights
                    # rescale the pipelined objective vs the single-device one
                    num_sum = num_sum + act * jnp.sum(per * w)
                    den_sum = den_sum + act * jnp.sum(msk)
                    k_sum = k_sum + act * k
                    bn = jax.tree_util.tree_map(lambda a, b: jnp.where(active, a, b), new_bn, bn)
                    # hand my output to the next stage for the next tick
                    prop_next = jax.tree_util.tree_map(
                        lambda p: jax.lax.ppermute(
                            jnp.where(active, p, jnp.zeros_like(p)), axis, perm
                        ),
                        prop_out,
                    )
                    return (prop_next, num_sum, den_sum, k_sum, bn), None

                prop0 = {
                    "node": jnp.zeros((n_nodes, self.prop_node), floatx()),
                    "arc": jnp.zeros((n_arcs, self.prop_arc), floatx()),
                }
                (_, num_sum, den_sum, k_sum, bn_final), _ = jax.lax.scan(
                    tick,
                    (prop0, jnp.zeros((), floatx()), jnp.zeros((), floatx()),
                     jnp.zeros((), floatx()), mstate),
                    jnp.arange(T),
                )
                # partial per-stage loss: full-batch masked mean of THIS
                # stage's layer / S; the summed-over-devices objective is the
                # parallel-mode pipeline loss → stage grads are exact as-is
                layer_loss = num_sum / jnp.maximum(den_sum, 1e-9)
                return layer_loss / S + self._layer_reg(p), (layer_loss, k_sum, bn_final)

            (_, (layer_loss, k_sum, bn_final)), grads = jax.value_and_grad(
                objective, has_aux=True
            )(params)
            if lgnn.average_st_grads:
                # reference LGNN.py:272 divides layer i's state grads by its
                # iteration count; with microbatch accumulation the stage's
                # MEAN k stands in (exact for M == 1)
                grads = self.proto.scale_state_grads(grads, k_sum / M)
            total_loss = jax.lax.psum(layer_loss, axis) / S + jax.lax.psum(
                self._layer_reg(params), axis
            )
            updates, opt_local = lgnn.optimizer.update(grads, opt_local, params)
            params = optax.apply_updates(params, updates)
            expand = lambda tr: jax.tree_util.tree_map(lambda v: v[None], tr)
            mean_k = jax.lax.psum(k_sum, axis) / (S * M)
            return expand(params), expand(bn_final), expand(opt_local), {"loss": total_loss, "k": mean_k}

        def specs(tree):
            return jax.tree_util.tree_map(
                lambda x: P(axis) if getattr(x, "ndim", 0) > 0 else P(), tree
            )

        opt_spec = specs(opt_template)
        sharded = shard_map(
            device_step,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), opt_spec, P(), P(axis)),
            out_specs=(P(axis), P(axis), opt_spec, P()),
            check_vma=False,
        )
        step = jax.jit(sharded, donate_argnums=(0, 1, 2))
        self._cache[key] = step
        return step

    def _stage_rngs(self, rng, n_microbatches: int):
        """(S, M, 2, key): the SAME per-layer (loop, out) keys the
        single-device LGNN.forward chain draws (lgnn.py:152-156), so the
        pipelined run is rng-identical to the sequential one.

        The whole table is ONE jitted dispatch — the naive host loop issues
        ~3·S·M separate split calls + device transfers per training step,
        which on a high-latency runtime costs more than the pipeline
        launch itself."""
        cache_key = ("stage_rngs", n_microbatches)
        if cache_key not in self._cache:
            S = self.n_stages

            def table(key):
                # M==1 uses the key directly — the same chain LGNN.forward
                # draws, so the pipelined step is rng-identical to the
                # sequential train step
                keys = [key] if n_microbatches == 1 else list(jax.random.split(key, n_microbatches))
                rows = []
                for m in range(n_microbatches):
                    r = keys[m]
                    row = []
                    for i in range(S):
                        r, rng_loop, rng_out = jax.random.split(r, 3)
                        if i == S - 1:
                            # the LAST layer goes through gnn.forward, which
                            # re-splits its rng internally (gnn.py:258-259);
                            # intermediate layers use the chain keys directly
                            rng_loop, rng_out = jax.random.split(rng_loop)
                        row.append(jnp.stack([rng_loop, rng_out]))
                    rows.append(jnp.stack(row))  # (S, 2, key)
                return jnp.swapaxes(jnp.stack(rows), 0, 1)  # (S, M, 2, key)

            self._cache[cache_key] = jax.jit(table)
        return self._cache[cache_key](rng)

    def train_step(self, stacked_vars_p, stacked_vars_s, opt_state, microbatches: Sequence[GraphBatch], rng):
        """Run one pipelined step over M equal-shape microbatches."""
        from gnnkeras_tpu.parallel.data_parallel import stack_batches

        M = len(microbatches)
        step = self.make_train_step(M, opt_state)
        batches = stack_batches(list(microbatches))
        rngs = self._stage_rngs(rng, M)
        return step(stacked_vars_p, stacked_vars_s, opt_state, batches, rngs)

    def fit(
        self,
        microbatch_lists,
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
        """Pipelined training: each element of ``microbatch_lists`` is a list
        of M equal-shape microbatches = one optimizer step per epoch pass.

        Carries the full single-device fit surface (one shared driver,
        training/fit_loop.py): validation (a plain sequencer scored
        single-device on the per-epoch synced LGNN weights), callbacks,
        resumable Orbax checkpoints and ``class_weight``.  Returns a History
        (dict-style ``h["loss"]``).  Checkpoints store the wrapped LGNN's
        per-layer variables (synced every epoch) plus the stage-stacked
        optimizer state in the model's ``_opt_state``; a resumed run
        restacks and continues exactly."""
        from gnnkeras_tpu.training.fit_loop import run_fit_loop
        from gnnkeras_tpu.training.trainer import (
            _apply_class_weight,
            _class_weight_vector,
        )
        from gnnkeras_tpu.training.trainer import evaluate as seq_evaluate

        lgnn = self.lgnn
        if lgnn.optimizer is None:
            raise RuntimeError("compile() before fit()")
        lgnn.build(seed=seed)
        if class_weight:
            cw_vec = _class_weight_vector(class_weight)
            microbatch_lists = [
                [_apply_class_weight(mb, cw_vec) for mb in mbs]
                for mbs in microbatch_lists
            ]
        stacked = self.stack_variables()
        h = {"svp": stacked["params"], "svs": stacked["state"]}
        h["opt"] = jax.vmap(lgnn.optimizer.init)(h["svp"])
        # the stage-stacked optimizer tree rides in the model view so Orbax
        # checkpoints carry one stable structure
        lgnn._opt_state = h["opt"]

        def _sync_model():
            lgnn.variables = self.unstack_variables({"params": h["svp"], "state": h["svs"]})
            lgnn._opt_state = h["opt"]
            # identity tokens: a callback/restore REPLACING the model view
            # (vs our own sync) is what requires a restack
            h["var_token"], h["opt_token"] = lgnn.variables, lgnn._opt_state

        def _pickup():
            # restored/copied trees come back COMMITTED to one device, which
            # conflicts with the stage-mesh shard_map — round-trip through
            # host numpy so the jitted step re-places them per its specs
            if (h.get("var_token") is lgnn.variables
                    and h.get("opt_token") is lgnn._opt_state):
                return
            host = lambda t: jax.tree_util.tree_map(np.asarray, t)
            st = self.stack_variables()
            h["svp"], h["svs"] = host(st["params"]), host(st["state"])
            h["opt"] = host(lgnn._opt_state)
            h["var_token"], h["opt_token"] = lgnn.variables, lgnn._opt_state

        def run_epoch(epoch, n):
            losses = []
            for mbs in microbatch_lists:
                h["svp"], h["svs"], h["opt"], logs = self.train_step(
                    h["svp"], h["svs"], h["opt"], mbs, lgnn.next_rng()
                )
                losses.append(float(logs["loss"]))
            _sync_model()
            return [{"loss": float(np.mean(losses))}]

        validate = None
        if validation_data is not None:
            validate = lambda: seq_evaluate(lgnn, validation_data, verbose=0, prefix="val_")

        return run_fit_loop(
            lgnn, epochs=epochs, run_chunk=run_epoch,
            validate=validate, callbacks=callbacks, verbose=verbose,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume=resume, validation_freq=validation_freq,
            on_resume=_pickup, on_weights_mutated=_pickup,
        )
