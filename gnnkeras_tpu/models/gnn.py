"""Homogeneous GNN models: the iterate-to-convergence unfolding engine.

Re-implements the reference's ``GNNnodeBased/GNNarcBased/GNNgraphBased``
(GNN/Models/GNN.py:8-346) as a jit-compiled functional core:

- the eager ``tf.while_loop`` over ``convergence`` (GNN.py:265) becomes a
  ``lax.scan`` to the static ``max_iteration`` bound with a per-step
  "still-running" predicate — identical semantics (run while any node's
  relative state change exceeds the threshold AND k < max_iteration,
  GNN.py:196-214) but reverse-differentiable, rematerialized per step
  (``jax.checkpoint``), and compiled once;
- sparse matvecs become gather + segment-sum (gnnkeras_tpu.ops.segment);
- the boolean-mask readout filter (GNN.py:239-242) becomes a static-shape
  masked computation: net_output runs on every (padded) row with BatchNorm
  statistics restricted to real masked rows, and the loss is gated by the
  same set∧output mask downstream.

A ``lax.while_loop`` fast path is used for inference, where early convergence
saves wall-clock and no reverse pass is needed.

Variables layout: ``{'params': {'net_state': ..., 'net_output': ...},
'state': {...}}`` — ``params`` is the trainable tree handed to optax/grad,
``state`` carries BatchNorm moving statistics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gnnkeras_tpu.graph.batch import GraphBatch
from gnnkeras_tpu.models.base import GraphModel
from gnnkeras_tpu.models.mlp import MLP
from gnnkeras_tpu.ops.segment import aggregate_edges
from gnnkeras_tpu.utils.dtypes import floatx

STATE_INIT_STDDEV = 0.1  # reference: tf.random.normal(..., stddev=0.1), GNN.py:257

# Plain-BCSR transposed auto-selection: engage the feature-major engine when
# the state feature width (padded to sublanes) is at most this.  Round 3
# hypothesized the state:operator byte ratio decides; the round-4 sweep
# (scripts/bench_bcsr_auto.py, BASELINE.md) REFUTED that — measured speedups
# are 1.06-1.18x at ratios 0.02-0.125 but 0.75x at the HIGHEST ratio
# (0.167, ds=64).  The decision variable is MXU lane utilization: row-major
# lane-pads a narrow state d→128 (transposed keeps features in sublanes and
# wins), while a wide state is already lane-efficient row-major and the
# transposed transition's small-sublane matmuls lose.  Measured boundary:
# win/tie through sd_pad 32; the round-5 pin (same sweep, sd_pad 40/48)
# puts the cliff immediately past 32 — 0.64x/0.74x at 40/48 on the
# state-bound 100k workload, 0.96-0.98x on the operator-bound 500k one —
# so 32 is exact, not merely conservative (BASELINE.md round 5).
_TRANSPOSED_BCSR_MAX_STATE_DIM = 32

# rematerialization policy for the unfolding scan: save ONLY the per-step
# aggregation output (tagged 'unfold_agg' in the transitions) — the backward
# recomputes the cheap MLP part from the saved carry + aggregation instead of
# either storing the whole residual tree (remat=False) or re-reading the
# multi-MB aggregation operator to recompute the aggregation (plain remat).
_AGG_POLICY = jax.checkpoint_policies.save_only_these_names("unfold_agg")


def unconverged(
    state: jax.Array,
    state_old: jax.Array,
    node_mask: jax.Array,
    threshold: float,
    feature_axis: int = 1,
) -> jax.Array:
    """True while any *real* node moved more than threshold·‖old‖₂
    (reference ``condition``, GNN.py:196-214; padding is excluded).

    ``feature_axis=0`` handles feature-major (d_pad, N) state from the
    transposed unfold engine: per-node reductions run over sublanes and the
    node mask gates lanes."""
    if threshold == 0.0:
        # ‖s−s_old‖₂ > 0 ⟺ some element changed — one comparison pass
        # instead of two sum-of-squares reductions.  (Equal up to f32
        # underflow: per-element deltas below ~1e-23 square to 0 in the
        # norm formula but still compare unequal here.)
        changed = jnp.any(state != state_old, axis=feature_axis)
        return jnp.any(jnp.logical_and(changed, node_mask))
    distance = jnp.sqrt(jnp.sum(jnp.square(state - state_old), axis=feature_axis))
    norm = jnp.sqrt(jnp.sum(jnp.square(state_old), axis=feature_axis))
    check = distance > threshold * norm
    return jnp.any(jnp.logical_and(check, node_mask))


def _select_tree(pred: jax.Array, on_true, on_false):
    return jax.tree_util.tree_map(lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def aggregate_t(state_t: jax.Array, batch: GraphBatch, sd: int) -> jax.Array:
    """Feature-major ``Adjᵀ·state`` on (sd_pad, N) state through the batch's
    block operator (compact strips when present, else dense-block BCSR),
    named 'unfold_agg' for the agg-save remat policy; sliced back to the real
    feature count.  Shared by the homogeneous and composite transposed
    engines so the operator dispatch cannot drift."""
    from jax.ad_checkpoint import checkpoint_name

    if batch.strip is not None:
        from gnnkeras_tpu.ops.strip import strip_aggregate_t

        agg = strip_aggregate_t(state_t, batch.strip)
    else:
        from gnnkeras_tpu.ops.banded import BandedOperator, banded_aggregate_t
        from gnnkeras_tpu.ops.bcsr import QuantBcsr, bcsr_aggregate_t, qbcsr_aggregate_t

        if isinstance(batch.bcsr, BandedOperator):
            agg = banded_aggregate_t(state_t, batch.bcsr)
        elif isinstance(batch.bcsr, QuantBcsr):
            agg = qbcsr_aggregate_t(state_t, batch.bcsr)
        else:
            agg = bcsr_aggregate_t(state_t, batch.bcsr)
    return checkpoint_name(agg, "unfold_agg")[:sd]


def _mesh_predicate(axis_name: Optional[str]):
    """``unconverged`` lifted over a named mesh axis: the pmax'd flag makes
    every device agree on the trip count, exactly as a single chip running
    the union batch would (one straggler shard keeps everyone iterating)."""
    if axis_name is None:
        return unconverged

    def predicate(state, state_old, node_mask, threshold, feature_axis=1):
        local = unconverged(state, state_old, node_mask, threshold, feature_axis)
        return jax.lax.pmax(local.astype(jnp.int32), axis_name) > 0

    return predicate


def run_unfold_loops(
    model,
    batch: GraphBatch,
    state0: jax.Array,
    state_old0: jax.Array,
    bn0,
    step_rngs,
    training: bool,
    transition,
    peel_agg: Optional[jax.Array] = None,
    feature_axis: int = 1,
    predicate=unconverged,
):
    """The ONE loop driver behind every unfold variant (homogeneous and
    composite models share it, so the loop semantics cannot drift):

    - training → checkpointed ``lax.scan`` to the static bound with a
      running-convergence mask (reverse-differentiable; gradients flow
      through exactly the k executed iterations as in the reference's
      backprop-through-unfolding, GNN.py:265,293-295);
    - inference → ``lax.while_loop`` with the reference's early exit;
    - ``model.per_iteration_bn`` swaps the carried BatchNorm-statistics tree
      for a per-iteration stack (scan xs/ys; dynamic indexing at inference);
    - ``peel_agg`` (the host-precomputed ``Adjᵀ·labels``) peels iteration 0
      when ``state0`` IS the node labels — one fewer on-device aggregation.

    ``transition(state, bn_state, step_rng, aggregated_states=None)`` is the
    model-specific per-step function.  Returns ``(k, state, bn_final)``.

    ``predicate`` is the convergence test (``unconverged`` signature); the
    partitioned engine passes a pmax-wrapped variant so every device agrees
    on the mesh-global trip count (parallel/partition.py).
    """
    K = model.max_iteration
    threshold = model.state_threshold
    per_iter = getattr(model, "per_iteration_bn", False) and K >= 1
    remat = model.remat
    if remat is None:
        # auto: measured best per engine AND operator storage (BASELINE.md
        # rounds 3-4).  Transposed engine: int8 mask+scale operators make
        # FULL remat fastest (0.97 vs 1.17 ms/step — recompute re-reads only
        # half the operator bytes, while the agg-save policy's stored
        # aggregations cost the same as at bf16); bf16/f32 strips keep the
        # round-3 agg-save policy (1.32 vs 1.43 plain remat there).
        # Row-major engine: store residuals (round 2: off 24% faster).
        if feature_axis == 0:
            strip = getattr(batch, "strip", None)
            int8 = strip is not None and getattr(strip, "scale", None) is not None
            remat = True if int8 else "agg"
        else:
            remat = False
    if remat == "agg":
        from functools import partial as _partial

        maybe_remat = _partial(jax.checkpoint, policy=_AGG_POLICY)
    elif remat:
        maybe_remat = jax.checkpoint
    else:
        maybe_remat = lambda f: f
    take = lambda tree, i: jax.tree_util.tree_map(lambda x: x[i], tree)
    peel = peel_agg is not None and K >= 1

    if per_iter and training:
        def step_body(carry, xs, aggregated_states=None):
            k, state, running = carry
            step_rng, bn_i = xs
            new_state, new_bn = transition(state, bn_i, step_rng, aggregated_states)
            changed = predicate(new_state, state, batch.node_mask, threshold, feature_axis)
            state_next = jnp.where(running, new_state, state)
            bn_out = _select_tree(running, new_bn, bn_i)
            return (k + running.astype(floatx()), state_next, jnp.logical_and(running, changed)), bn_out

        running0 = predicate(state0, state_old0, batch.node_mask, threshold, feature_axis)
        carry = (jnp.zeros((), floatx()), state0, running0)
        if peel:
            peeled = maybe_remat(lambda c, x: step_body(c, x, aggregated_states=peel_agg))
            carry, bn_first = peeled(carry, (step_rngs[0], take(bn0, 0)))
            xs = (step_rngs[1:], take(bn0, slice(1, None)))
        else:
            xs = (step_rngs, bn0)
        step = maybe_remat(step_body)
        (k, state, _), bn_rest = jax.lax.scan(step, carry, xs)
        if peel:
            bn_final = jax.tree_util.tree_map(
                lambda first, rest: jnp.concatenate([first[None], rest]), bn_first, bn_rest
            )
        else:
            bn_final = bn_rest
        return k, state, bn_final

    if per_iter:  # inference: index the statistics stack per iteration
        def cond_fn(carry):
            k, state, changed = carry
            return jnp.logical_and(changed, k < K)

        def body_fn(carry, aggregated_states=None):
            k, state, changed = carry
            idx = jnp.minimum(k.astype(jnp.int32), K - 1)
            new_state, _ = transition(state, take(bn0, idx), step_rngs[idx], aggregated_states)
            changed = predicate(new_state, state, batch.node_mask, threshold, feature_axis)
            return (k + 1.0, new_state, changed)

        changed0 = predicate(state0, state_old0, batch.node_mask, threshold, feature_axis)
        carry = (jnp.zeros((), floatx()), state0, changed0)
        if peel:
            carry = jax.lax.cond(
                cond_fn(carry), lambda c: body_fn(c, aggregated_states=peel_agg), lambda c: c, carry
            )
        k, state, _ = jax.lax.while_loop(cond_fn, body_fn, carry)
        return k, state, bn0

    def step_body(carry, step_rng, aggregated_states=None):
        # ``running`` carries the predicate instead of a second (N,d) state
        # copy: at step t it equals the reference's
        # condition(state_t, state_{t-1}) because it is refreshed below from
        # the just-computed transition operands (same semantics, one fewer
        # full-state select + carry per iteration).
        k, state, running, bn_state = carry
        new_state, new_bn = transition(state, bn_state, step_rng, aggregated_states)
        changed = predicate(new_state, state, batch.node_mask, threshold, feature_axis)
        state_next = jnp.where(running, new_state, state)
        bn_next = _select_tree(running, new_bn, bn_state)
        running_next = jnp.logical_and(running, changed)
        return (k + running.astype(floatx()), state_next, running_next, bn_next)

    if training or K == 0:
        running0 = predicate(state0, state_old0, batch.node_mask, threshold, feature_axis)
        carry = (jnp.zeros((), floatx()), state0, running0, bn0)
        rest = step_rngs
        length = K
        if peel:
            peeled = maybe_remat(lambda c, r: step_body(c, r, aggregated_states=peel_agg))
            carry = peeled(carry, step_rngs[0])
            rest = step_rngs[1:]
            length = K - 1
        step = maybe_remat(lambda c, r: (step_body(c, r), None))
        # K==0: xs still holds one (unused) key — slice so scan's xs length
        # matches length=0 (zero-iteration forward = state0 passthrough)
        (k, state, _, bn_final), _ = jax.lax.scan(step, carry, rest[:length], length=length)
        return k, state, bn_final

    # inference with shared statistics: the carried ``changed`` flag equals
    # the reference's condition on (state_t, state_{t-1})
    def cond_fn(carry):
        k, state, changed, _ = carry
        return jnp.logical_and(changed, k < K)

    def body_fn(carry, aggregated_states=None):
        k, state, changed, bn_state = carry
        idx = jnp.minimum(k.astype(jnp.int32), K - 1)
        new_state, new_bn = transition(state, bn_state, step_rngs[idx], aggregated_states)
        changed = predicate(new_state, state, batch.node_mask, threshold, feature_axis)
        return (k + 1.0, new_state, changed, new_bn)

    changed0 = predicate(state0, state_old0, batch.node_mask, threshold, feature_axis)
    carry = (jnp.zeros((), floatx()), state0, changed0, bn0)
    if peel:
        carry = jax.lax.cond(
            cond_fn(carry), lambda c: body_fn(c, aggregated_states=peel_agg), lambda c: c, carry
        )
    k, state, _, bn_final = jax.lax.while_loop(cond_fn, body_fn, carry)
    return k, state, bn_final


class GNNnodeBased(GraphModel):
    """Node-focused GNN (reference GNN/Models/GNN.py:8-306)."""

    name = "node"

    def __init__(
        self,
        net_state: MLP,
        net_output: MLP,
        state_vect_dim: int,
        max_iteration: int,
        state_threshold: float,
        *,
        per_iteration_bn: bool = False,
    ) -> None:
        assert state_vect_dim >= 0
        assert max_iteration >= 0
        assert state_threshold >= 0
        super().__init__()
        self.net_state = net_state
        self.net_output = net_output
        self.state_vect_dim = int(state_vect_dim)
        self.max_iteration = int(max_iteration)
        self.state_threshold = float(state_threshold)
        # BEYOND-REFERENCE OPTION (default off = reference semantics): give
        # every unfolding iteration its OWN BatchNorm statistics, as in
        # Recurrent Batch Normalization (Cooijmans et al., 2017).  The
        # reference shares one set of moving moments across all iterations,
        # so evaluation applies a single moment set to per-iteration state
        # distributions that genuinely differ — the measured eval/train-mode
        # accuracy gap (BASELINE.md).  Per-iteration statistics remove that
        # mismatch at the cost of K× the (tiny) BN state.
        self.per_iteration_bn = bool(per_iteration_bn)
        # rematerialize the unfolding steps in the backward pass.  None =
        # auto (measured best per engine, BASELINE.md): the row-major engine
        # stores the residual tree (remat off, 24% faster round 2), the
        # transposed engine saves only the per-step aggregation ('agg'
        # policy — backward recomputes the cheap MLP part and never re-reads
        # the aggregation operator for recompute).  False / True / 'agg'
        # force a mode; True trades forward recompute for memory on huge
        # graphs.
        self.remat = None
        # transposed (feature-major) unfold engine: None = auto (on when the
        # batch carries a compact-strip operator; any dim_state), False =
        # force row-major, True = require (raise when inapplicable).
        self.transposed = None

    # -- parameters -----------------------------------------------------------
    def init(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        vs, vo = self.net_state.init(k1), self.net_output.init(k2)
        if self.per_iteration_bn:
            k_iters = max(self.max_iteration, 1)
            vs["state"] = jax.tree_util.tree_map(
                lambda x: jnp.stack([x] * k_iters), vs["state"]
            )
        return {
            "params": {"net_state": vs["params"], "net_output": vo["params"]},
            "state": {"net_state": vs["state"], "net_output": vo["state"]},
        }

    def scale_state_grads(self, grads: dict, k) -> dict:
        """The reference's ``average_st_grads``: divide state-net grads by the
        iteration count (GNN.py:295)."""
        return {
            "net_state": jax.tree_util.tree_map(lambda g: g / jnp.maximum(k, 1.0), grads["net_state"]),
            "net_output": grads["net_output"],
        }

    # -- functional forward ----------------------------------------------------
    def _initial_state(self, batch: GraphBatch, rng: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
        """(state₀, aggregated_nodes).  dim_state==0 → state is the node label
        (deterministic); otherwise N(0, 0.1²) with aggregated neighbor labels
        precomputed once (reference GNN.py:254-259)."""
        n = batch.num_nodes
        if self.state_vect_dim > 0:
            if rng is None:
                raise ValueError("state_vect_dim > 0 requires an rng for the random state init")
            state = STATE_INIT_STDDEV * jax.random.normal(rng, (n, self.state_vect_dim), dtype=floatx())
            if batch.agg_node_labels is not None:
                aggregated_nodes = batch.agg_node_labels
            else:
                aggregated_nodes = batch.aggregate(batch.nodes)
        else:
            state = batch.nodes
            aggregated_nodes = jnp.zeros((n, 0), dtype=floatx())
        return state, aggregated_nodes

    def _transition_input(
        self,
        state: jax.Array,
        batch: GraphBatch,
        aggregated_states: jax.Array,
        aggregated_nodes: jax.Array,
        aggregated_arcs: jax.Array,
    ) -> jax.Array:
        """net_state input: [state | (labels if dim_state>0) | Σ_neigh state |
        Σ_neigh labels | Σ_in arcs] — exact concat order of GNN.py:221-231."""
        components = [state]
        if self.state_vect_dim > 0:
            components.append(batch.nodes)
        return jnp.concatenate(components + [aggregated_states, aggregated_nodes, aggregated_arcs], axis=1)

    def unfold(
        self,
        variables: dict,
        batch: GraphBatch,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, list]:
        """Run the state unfolding to convergence.

        Returns (k, state, new_net_state_bn).  Training uses a checkpointed
        ``lax.scan`` with a running-mask (reverse-differentiable, matching the
        reference's backprop-through-unfolding); inference a ``lax.while_loop``.

        ``axis_name`` (inside shard_map/pmap): BatchNorm moments are psum'd
        and the convergence predicate pmax'd over the named axis, so a
        device-sharded batch behaves exactly like the merged single-chip
        batch (parallel/partition.py PackedPartitionedGNN).

        When the batch carries a compact-strip operator (slot-packed batches,
        graph/batch.py ``slot_pack``), the loop runs the TRANSPOSED engine —
        state carried feature-major so the Pallas strip aggregation never
        relayouts — and transposes back before returning; semantics are
        identical up to f32 reduction order (any ``dim_state``; at
        dim_state>0 the random init is drawn in row order and transposed, so
        both engines consume identical randomness).  Set
        ``self.transposed = False`` to force the row-major engine.
        """
        if self._use_transposed(batch):
            return self._unfold_transposed(
                variables, batch, training=training, rng=rng, axis_name=axis_name
            )
        n = batch.num_nodes
        # batch-constant: precomputed host-side when the batch carries it
        # (TPU scatter is ~100x off roofline; see graph/batch.py)
        if batch.agg_arc_labels is not None:
            aggregated_arcs = batch.agg_arc_labels
        else:
            aggregated_arcs = aggregate_edges(batch.arc_label, batch.arc_dst, batch.arcnode_weight, n)
        state0, aggregated_nodes = self._initial_state(batch, rng)
        state_old0 = jnp.ones_like(state0)

        net_state_params = variables["params"]["net_state"]
        bn0 = variables["state"]["net_state"]

        n_steps = max(self.max_iteration, 1)
        if rng is not None:
            step_rngs = jax.random.split(rng, n_steps)
        else:
            step_rngs = jnp.zeros((n_steps,) + jax.random.PRNGKey(0).shape, dtype=jax.random.PRNGKey(0).dtype)

        def transition(state, bn_state, step_rng, aggregated_states=None):
            if aggregated_states is None:
                from jax.ad_checkpoint import checkpoint_name

                aggregated_states = checkpoint_name(batch.aggregate(state), "unfold_agg")
            inp = self._transition_input(state, batch, aggregated_states, aggregated_nodes, aggregated_arcs)
            new_state, new_bn = self.net_state.apply(
                {"params": net_state_params, "state": bn_state},
                inp,
                training=training,
                mask=batch.node_mask,
                rng=step_rng if rng is not None else None,
                axis_name=axis_name,
            )
            return new_state, new_bn

        peel_agg = (
            batch.agg_node_labels
            if self.state_vect_dim == 0 and batch.agg_node_labels is not None
            else None
        )
        return run_unfold_loops(
            self, batch, state0, state_old0, bn0, step_rngs, training, transition,
            peel_agg=peel_agg, predicate=_mesh_predicate(axis_name),
        )

    # -- transposed (feature-major) unfold engine --------------------------------
    def _use_transposed(self, batch: GraphBatch) -> bool:
        if self.transposed is False:
            return False
        has_strip = getattr(batch, "strip", None) is not None
        has_bcsr = getattr(batch, "bcsr", None) is not None
        ok = (has_strip or has_bcsr) and (
            self.state_vect_dim > 0 or batch.nodes.shape[1] > 0
        )
        if self.transposed and not ok:
            raise ValueError(
                "transposed unfold requires a block operator (slot_pack strips "
                "or dense_blocks BCSR)"
            )
        if self.transposed is None:
            if has_strip:
                return True  # slot-packed batches: measured always faster
            if not has_bcsr:
                return False
            # quantized operators (banded decomposition / QuantBcsr) were
            # built for the feature-major engine — the row-major fallback is
            # a transpose sandwich paying two full-state relayouts per
            # iteration, so auto always runs them transposed
            from gnnkeras_tpu.ops.banded import BandedOperator
            from gnnkeras_tpu.ops.bcsr import QuantBcsr

            if isinstance(batch.bcsr, (BandedOperator, QuantBcsr)):
                return True
            # plain BCSR: computed per-batch from the MEASURED decision
            # variable — the state feature width (see the constant's note;
            # scripts/bench_bcsr_auto.py refuted the byte-ratio hypothesis)
            sd = self.state_vect_dim if self.state_vect_dim > 0 else batch.nodes.shape[1]
            sd_pad = -(-sd // 8) * 8
            return sd_pad <= _TRANSPOSED_BCSR_MAX_STATE_DIM
        return ok

    def _unfold_transposed(
        self,
        variables: dict,
        batch: GraphBatch,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, list]:
        """The unfolding with state carried feature-major (d_pad, N): the
        compact-strip aggregation (ops/strip.py strip_aggregate_t) and the
        transition MLP (mlp.py apply_t, Wᵀ@X with lane-masked BatchNorm) run
        in the layout the TPU wants at d≪128 — nothing is lane-padded and the
        Pallas boundary never transposes.  One transpose at entry (node
        labels → state₀) and one at exit (before the readout).  Same
        reference semantics as ``unfold`` (GNN.py:217-236,254-259);
        activations match the row-major engine up to f32 reduction order."""
        n = batch.num_nodes
        d = batch.nodes.shape[1]
        ds = self.state_vect_dim
        sd = ds if ds > 0 else d  # the state's feature count
        sd_pad = -(-sd // 8) * 8
        if batch.agg_arc_labels is not None:
            agg_arcs_t = batch.agg_arc_labels.T
        else:
            agg_arcs_t = aggregate_edges(
                batch.arc_label, batch.arc_dst, batch.arcnode_weight, n
            ).T
        if ds > 0:
            # same draw as the row-major _initial_state (N(0, 0.1²) in (n, ds)
            # row order, reference GNN.py:256-259), transposed once at entry
            if rng is None:
                raise ValueError("state_vect_dim > 0 requires an rng for the random state init")
            state0_rm = STATE_INIT_STDDEV * jax.random.normal(rng, (n, ds), dtype=floatx())
            state0 = jnp.pad(state0_rm.T, ((0, sd_pad - ds), (0, 0)))
            # batch constants of the dim_state>0 transition input
            # (_transition_input: [state | labels | Σstate | Σlabels | Σarcs])
            labels_t = batch.nodes.T
            agg_nodes = (
                batch.agg_node_labels
                if batch.agg_node_labels is not None
                else batch.aggregate(batch.nodes)
            )
            agg_nodes_t = agg_nodes.T
        else:
            state0 = jnp.pad(batch.nodes.T, ((0, sd_pad - d), (0, 0)))
            labels_t = None
            agg_nodes_t = None
        # pad rows of old-state are ZERO (not one) so threshold>0 norms see
        # exactly the row-major engine's sums
        state_old0 = jnp.pad(jnp.ones((sd, n), floatx()), ((0, sd_pad - sd), (0, 0)))

        net_state_params = variables["params"]["net_state"]
        bn0 = variables["state"]["net_state"]
        n_steps = max(self.max_iteration, 1)
        if rng is not None:
            step_rngs = jax.random.split(rng, n_steps)
        else:
            step_rngs = jnp.zeros(
                (n_steps,) + jax.random.PRNGKey(0).shape, dtype=jax.random.PRNGKey(0).dtype
            )

        def transition(state_t, bn_state, step_rng, aggregated_states=None):
            if aggregated_states is None:
                aggregated_states = aggregate_t(state_t, batch, sd)
            if ds > 0:
                inp = jnp.concatenate(
                    [state_t[:sd], labels_t, aggregated_states, agg_nodes_t, agg_arcs_t],
                    axis=0,
                )
            else:
                inp = jnp.concatenate([state_t[:sd], aggregated_states, agg_arcs_t], axis=0)
            new_state, new_bn = self.net_state.apply_t(
                {"params": net_state_params, "state": bn_state},
                inp,
                training=training,
                mask=batch.node_mask,
                rng=step_rng if rng is not None else None,
                axis_name=axis_name,
            )
            if sd_pad != sd:
                new_state = jnp.pad(new_state, ((0, sd_pad - sd), (0, 0)))
            return new_state, new_bn

        peel_agg = (
            batch.agg_node_labels.T
            if ds == 0 and batch.agg_node_labels is not None
            else None
        )
        k, state_t, bn_final = run_unfold_loops(
            self, batch, state0, state_old0, bn0, step_rngs, training, transition,
            peel_agg=peel_agg, feature_axis=0, predicate=_mesh_predicate(axis_name),
        )
        return k, state_t[:sd].T, bn_final

    # -- fused whole-unfold fast path (ops/fused.py) ----------------------------
    def fold_transition(self, variables: dict):
        """Fold the state net's inference BatchNorm into its Dense layer and
        split the weight rows by the transition-input layout.

        Returns ``(w_state, w_agg, w_arc, bias, activation)`` or None when
        the net doesn't match the fusable shape (single Dense, optional
        leading BatchNorm, dropout-only in between — the reference starter
        architecture, /root/reference/starter.py:71-77) or dim_state > 0.
        """
        from gnnkeras_tpu.ops.fused import _ACTIVATIONS

        if self.state_vect_dim != 0:
            return None
        if self.per_iteration_bn:
            # one folded weight set cannot carry K different moment sets
            return None
        net = self.net_state
        program = net.program
        dense_idx = [i for i, l in enumerate(program) if l[0] == "dense"]
        if len(dense_idx) != 1 or dense_idx[0] != len(program) - 1:
            return None
        if any(l[0] not in ("batch_norm", "dropout") for l in program[:-1]):
            return None
        bn_idx = [i for i, l in enumerate(program) if l[0] == "batch_norm"]
        if len(bn_idx) > 1:
            return None
        act = program[-1][2]
        if act is None:
            act = "linear"  # the standard alias; the fused kernel supports it
        if not isinstance(act, str) or act not in _ACTIVATIONS:
            return None

        params = variables["params"]["net_state"]
        bn_state = variables["state"]["net_state"]
        w = params[-1]["kernel"]
        b = params[-1]["bias"]
        if bn_idx:
            from gnnkeras_tpu.models.mlp import _BN_EPS

            i = bn_idx[0]
            scale = params[i]["gamma"] * jax.lax.rsqrt(bn_state[i]["moving_var"] + _BN_EPS)
            shift = params[i]["beta"] - bn_state[i]["moving_mean"] * scale
            b = b + shift @ w
            w = scale[:, None] * w
        # transition input layout (``_transition_input`` at dim_state==0):
        # [state (d) | Σ_neigh state (d) | Σ_in arc labels (da)]
        d = w.shape[1]
        da = w.shape[0] - 2 * d
        if da < 0:
            return None
        return w[:d], w[d : 2 * d], w[2 * d :], b, act

    def forward_fused(self, variables: dict, batch: GraphBatch, op, n_iter: Optional[int] = None):
        """Inference forward with the whole unfolding fused into one Pallas
        kernel launch (ops/fused.py): valid for tile-packed block-diagonal
        batches, dim_state==0, threshold==0 (fixed trip count) and the
        single-Dense state net.  Returns (state, out, out_mask)."""
        from gnnkeras_tpu.ops.fused import fused_unfold

        folded = self.fold_transition(variables)
        if folded is None:
            raise ValueError("state net / model config is not fusable (see fold_transition)")
        if batch.agg_arc_labels is None:
            raise ValueError("fused forward needs the precomputed agg_arc_labels")
        w_state, w_agg, w_arc, bias, act = folded
        const = batch.agg_arc_labels @ w_arc + bias
        state = fused_unfold(
            batch.nodes, const, w_state, w_agg, op,
            self.max_iteration if n_iter is None else n_iter, act,
        )
        out, out_mask, _ = self.apply_output(variables, state, batch, training=False, rng=None)
        return state, out, out_mask

    def readout_input(self, state: jax.Array, batch: GraphBatch) -> Tuple[jax.Array, jax.Array]:
        """(net_output input rows, BN/loss row mask).  Node focus: converged
        state (| labels), one row per node (reference apply_filters,
        GNN.py:239-242)."""
        if self.state_vect_dim:
            state = jnp.concatenate([state, batch.nodes], axis=1)
        return state, batch.output_row_mask

    def node_level_output(
        self,
        variables: dict,
        state: jax.Array,
        batch: GraphBatch,
        *,
        training: bool,
        rng: Optional[jax.Array],
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, list]:
        """net_output over the readout rows WITHOUT the graph-level readout —
        the per-layer processing function LGNN uses for every focus but 'a'
        (reference LGNN.py:225).  Returns (out_rows, row_mask, new_bn)."""
        x, row_mask = self.readout_input(state, batch)
        out, new_bn = self.net_output.apply(
            {"params": variables["params"]["net_output"], "state": variables["state"]["net_output"]},
            x,
            training=training,
            mask=row_mask,
            rng=rng,
            axis_name=axis_name,
        )
        return out, row_mask, new_bn

    def apply_output(self, variables, state, batch, *, training, rng, axis_name=None):
        """Focus-specific final output.  Overridden by the graph-focused model
        to add the NodeGraph readout."""
        return self.node_level_output(
            variables, state, batch, training=training, rng=rng, axis_name=axis_name
        )

    def forward(
        self,
        variables: dict,
        batch: GraphBatch,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, dict]:
        """Full forward pass (reference ``Loop``, GNN.py:245-274).

        Returns (k, state, out, out_mask, new_model_state) where ``out`` is
        row-aligned with the focus entity and gated by ``out_mask``, and
        ``new_model_state`` is the updated BatchNorm-statistics tree.
        """
        if rng is not None:
            rng_loop, rng_out = jax.random.split(rng)
        else:
            rng_loop = rng_out = None
        k, state, bn_state = self.unfold(
            variables, batch, training=training, rng=rng_loop, axis_name=axis_name
        )
        out, out_mask, bn_out = self.apply_output(
            variables, state, batch, training=training, rng=rng_out, axis_name=axis_name
        )
        new_model_state = {"net_state": bn_state, "net_output": bn_out}
        return k, state, out, out_mask, new_model_state

    def regularization_loss(self, params: dict) -> jax.Array:
        dummy = lambda p: {"params": p, "state": None}
        return self.net_state.regularization_loss(dummy(params["net_state"])) + self.net_output.regularization_loss(
            dummy(params["net_output"])
        )

    # -- config / io ------------------------------------------------------------
    def get_config(self) -> dict:
        return {
            "net_state": self.net_state,
            "net_output": self.net_output,
            "state_vect_dim": self.state_vect_dim,
            "max_iteration": self.max_iteration,
            "state_threshold": self.state_threshold,
            "per_iteration_bn": self.per_iteration_bn,
        }

    def _json_config(self) -> dict:
        return {
            "model_class": type(self).__name__,
            "net_state": self.net_state.get_config(),
            "net_output": self.net_output.get_config(),
            "state_vect_dim": self.state_vect_dim,
            "max_iteration": self.max_iteration,
            "state_threshold": self.state_threshold,
            "per_iteration_bn": self.per_iteration_bn,
        }

    @classmethod
    def from_config(cls, config: dict, **kwargs) -> "GNNnodeBased":
        return cls(**config)

    @classmethod
    def load(cls, path: str) -> "GNNnodeBased":
        import json
        import os

        if path[-1] != "/":
            path += "/"
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        cfg.pop("model_class", None)
        model = cls(
            net_state=MLP.from_config(cfg.pop("net_state")),
            net_output=MLP.from_config(cfg.pop("net_output")),
            **cfg,
        )
        model._load_variables(path)
        return model

    def copy(self, copy_weights: bool = True) -> "GNNnodeBased":
        """Deep copy; fresh parameter init unless ``copy_weights``
        (reference GNN.py:44-61)."""
        clone = type(self)(
            net_state=MLP.from_config(self.net_state.get_config()),
            net_output=MLP.from_config(self.net_output.get_config()),
            state_vect_dim=self.state_vect_dim,
            max_iteration=self.max_iteration,
            state_threshold=self.state_threshold,
            per_iteration_bn=self.per_iteration_bn,
        )
        if copy_weights and self.variables is not None:
            clone.variables = jax.tree_util.tree_map(lambda x: x, self.variables)
        return clone

    def __repr__(self):
        return (
            f"GNN(type={self.name}, state_dim={self.state_vect_dim}, "
            f"threshold={self.state_threshold}, max_iter={self.max_iteration}, "
            f"avg={self.average_st_grads})"
        )

    __str__ = __repr__

    def summary(self) -> None:
        print(repr(self))
        self.net_state.summary(None)
        self.net_output.summary(None)


class GNNarcBased(GNNnodeBased):
    """Arc-focused GNN: readout rows are [src_state | dst_state | arc_label]
    (reference GNN.py:312-330)."""

    name = "arc"

    def readout_input(self, state: jax.Array, batch: GraphBatch) -> Tuple[jax.Array, jax.Array]:
        if self.state_vect_dim:
            state = jnp.concatenate([state, batch.nodes], axis=1)
        if batch.arc_inc is not None and state.dtype == jnp.float32:
            # scatter-free backward: the gather VJP's per-index scatter was
            # ~85% of the arc train step (BASELINE.md round 5); the one-hot
            # incidence-pair cotangent reduction runs on the MXU instead.
            # f32 only: the kernels' bf16x3/bf16 planes are exact for f32 —
            # a floatx('float64') state keeps the (exact) gather + scatter
            from gnnkeras_tpu.ops.incidence import incidence_gather

            s_rows, d_rows = incidence_gather(
                state, batch.arc_src, batch.arc_dst, batch.arc_inc,
            )
        else:
            s_rows, d_rows = state[batch.arc_src], state[batch.arc_dst]
        arc_rows = jnp.concatenate([s_rows, d_rows, batch.arc_label], axis=1)
        return arc_rows, batch.output_row_mask


class GNNgraphBased(GNNnodeBased):
    """Graph-focused GNN: node outputs averaged per graph through the
    NodeGraph weights (reference GNN.py:336-346)."""

    name = "graph"

    def apply_output(self, variables, state, batch, *, training, rng, axis_name=None):
        out_nodes, _, new_bn = self.node_level_output(
            variables, state, batch, training=training, rng=rng, axis_name=axis_name
        )
        out_graph = batch.readout(out_nodes)
        return out_graph, batch.graph_mask, new_bn
