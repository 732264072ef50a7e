"""Data parallelism over merged graph batches.

Each device trains on its own padded disjoint-union batch; gradients (and
BatchNorm statistic updates) are averaged over the ``data`` mesh axis with
``psum``-backed collectives inside ``shard_map``, then the (replicated) optax
update is applied identically everywhere.  No reference counterpart — the
reference is strictly single-device (SURVEY §2, "Parallelism statement").
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnkeras_tpu.graph.batch import GraphBatch


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack equal-shape batches along a new leading device axis."""
    metas = {(b.focus, b.dim_node_label) for b in batches}
    if len(metas) != 1:
        raise ValueError("all stacked batches must share focus/dim_node_label")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def shard_batches(stacked: GraphBatch, mesh: Mesh, axis: str = "data") -> GraphBatch:
    """Place a stacked batch so its leading axis is sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), stacked)


def _make_dp_sharded_step(model, mesh: Mesh, axis: str = "data"):
    """The un-jitted shard_map DP step (shared by the per-step and the
    scanned whole-epoch entry points)."""
    from gnnkeras_tpu.training.trainer import _metric_sums, _objective

    def device_step(params, mstate, opt_state, batch, rng, real):
        # shard_map hands us a leading axis of size 1 (this device's shard).
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = rng[0]
        w = real[0]  # 1.0 for a real batch, 0.0 for a partial-group filler

        (loss, aux), grads = jax.value_and_grad(
            lambda p: _objective(model, p, mstate, batch, rng, training=True), has_aux=True
        )(params)
        if model.average_st_grads:
            grads = model.scale_state_grads(grads, aux["k"])

        # average over the REAL batches only: a plain pmean would weight
        # filler devices as group members — attenuating the data gradients
        # by n_real/D, averaging the duplicated filler's BatchNorm moments
        # in twice, and folding zero losses into the group loss
        denom = jnp.maximum(jax.lax.psum(w, axis), 1.0)
        wmean = lambda t: jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x * w, axis) / denom, t
        )
        grads = wmean(grads)
        new_mstate = wmean(aux["new_state"])
        loss = jax.lax.psum(loss * w, axis) / denom

        updates, opt_state = model.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        count = jnp.maximum(jnp.sum(batch.target_mask.astype(jnp.float32)), 1.0) * w
        logs = {"loss_sum": loss * count, "count": count}
        for name, (s, c) in _metric_sums(model, aux["y_pred"], batch).items():
            logs[f"{name}_sum"] = s * w
            logs[f"{name}_count"] = c * w
        logs = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), logs)
        return params, new_mstate, opt_state, logs

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return sharded


def make_dp_train_step(model, mesh: Mesh, axis: str = "data"):
    """Build a jitted data-parallel train step.

    Signature: ``(params, mstate, opt_state, stacked_batch, rngs) ->
    (params, mstate, opt_state, logs)`` where ``stacked_batch`` has a leading
    device axis of size ``mesh.shape[axis]`` and ``rngs`` one PRNG key per
    device.  Params/opt-state are replicated; the loss/grads/BN updates are
    mesh-averaged so every replica applies the identical update.
    """
    return jax.jit(_make_dp_sharded_step(model, mesh, axis), donate_argnums=(0, 1, 2))


def make_dp_epoch_step(model, mesh: Mesh, axis: str = "data"):
    """Whole DP epoch in one launch: ``lax.scan`` of the sharded step over a
    steps axis stacked AHEAD of the device axis — one dispatch + one host
    sync per epoch (mirrors training/trainer.py's scan_batches path)."""
    sharded_step = _make_dp_sharded_step(model, mesh, axis)

    def epoch(params, mstate, opt_state, stacked_groups, rngs, reals):
        def body(carry, xs):
            p, m, o = carry
            group, rng, real = xs
            p, m, o, logs = sharded_step(p, m, o, group, rng, real)
            return (p, m, o), logs

        (params, mstate, opt_state), logs = jax.lax.scan(
            body, (params, mstate, opt_state), (stacked_groups, rngs, reals)
        )
        return params, mstate, opt_state, logs

    return jax.jit(epoch, donate_argnums=(0, 1, 2))


class DataParallelTrainer:
    """fit/evaluate over a mesh: slices the sequencer's batches into
    per-device groups of equal padded shape and drives the DP train step."""

    def __init__(self, model, mesh: Optional[Mesh] = None, axis: str = "data"):
        from gnnkeras_tpu.parallel.mesh import make_mesh

        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.axis = axis
        self.n_devices = self.mesh.shape[axis]
        self._step = None
        self._epoch_step = None

    def _device_groups(self, sequencer, place: bool = True):
        """Per-device step groups + a (D,) real-batch indicator per group
        (1.0 real, 0.0 filler — the step averages over real batches only).
        ``place=False`` skips the per-group mesh placement (the scanned epoch
        path re-places the whole stacked epoch once — placing twice would
        transfer the dataset twice)."""
        batches = [sequencer[i] for i in range(len(sequencer))]
        groups, reals = [], []
        for i in range(0, len(batches), self.n_devices):
            group = batches[i : i + self.n_devices]
            real = np.zeros(self.n_devices, np.float32)
            real[: len(group)] = 1.0
            while len(group) < self.n_devices:
                # pad the group by repeating the last batch with zeroed masks
                filler = group[-1].replace(
                    target_mask=jnp.zeros_like(group[-1].target_mask),
                    sample_weight=jnp.zeros_like(group[-1].sample_weight),
                )
                group.append(filler)
            stacked = stack_batches(group)
            groups.append(shard_batches(stacked, self.mesh, self.axis) if place else stacked)
            reals.append(jnp.asarray(real))
        return groups, reals

    def fit(
        self,
        sequencer,
        epochs: int = 1,
        validation_data=None,
        callbacks: Optional[list] = None,
        verbose: int = 1,
        seed: int = 0,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
        resume: bool = False,
        scan_batches: Optional[bool] = None,
        class_weight: Optional[dict] = None,
        validation_freq: int = 1,
    ):
        """Data-parallel fit with the full single-device surface: validation
        data (every ``validation_freq`` epochs), callbacks
        (History/EarlyStopping), class_weight, and resumable checkpointing —
        scaling up must not cost early stopping or resume (one shared driver
        with training/trainer.py fit, training/fit_loop.py).

        ``scan_batches`` (default auto): run the whole epoch — every
        per-device step group — as one scanned launch instead of one dispatch
        per group; exact same trajectory, silent fallback on mixed batch
        structures."""
        from gnnkeras_tpu.training.fit_loop import run_fit_loop
        from gnnkeras_tpu.training.trainer import (
            _apply_class_weight,
            _class_weight_vector,
            _reduce_logs,
            _try_stack,
            _unstack_logs,
            evaluate,
        )

        model = self.model
        if model.optimizer is None:
            raise RuntimeError("call compile() before fit()")
        model.build(seed=seed)
        if model._opt_state is None:
            model._opt_state = model.optimizer.init(model.variables["params"])

        if self._step is None:
            self._step = make_dp_train_step(model, self.mesh, self.axis)
        cw_vec = _class_weight_vector(class_weight) if class_weight else None

        # the step needs mesh-replicated trees; callbacks/validation use the
        # model's single-device view — convert at epoch granularity
        rep = NamedSharding(self.mesh, P())
        dev0 = jax.devices()[0]
        to_rep = lambda t: jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), t)
        to_dev0 = lambda t: jax.tree_util.tree_map(lambda x: jax.device_put(x, dev0), t)

        def run_epoch(epoch, n):
            params, mstate, opt_state = to_rep((
                model.variables["params"], model.variables["state"], model._opt_state,
            ))
            # one group build per epoch, shared by both paths (the scanned
            # path re-places the whole stacked epoch; the per-step fallback
            # places group-by-group below)
            groups, reals = self._device_groups(sequencer, place=False)
            if cw_vec is not None:
                groups = [_apply_class_weight(g, cw_vec) for g in groups]
            n_steps = len(groups)
            stacked_epoch = None
            if scan_batches in (None, True) and n_steps > 1:
                stacked_epoch = _try_stack(groups)
                if stacked_epoch is not None:
                    sharding = NamedSharding(self.mesh, P(None, self.axis))
                    stacked_epoch = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), stacked_epoch
                    )
            if stacked_epoch is not None:
                if self._epoch_step is None:
                    self._epoch_step = make_dp_epoch_step(model, self.mesh, self.axis)
                rngs = jnp.stack(
                    [jax.random.split(model.next_rng(), self.n_devices) for _ in range(n_steps)]
                )
                params, mstate, opt_state, logs = self._epoch_step(
                    params, mstate, opt_state, stacked_epoch, rngs, jnp.stack(reals)
                )
                accum = _unstack_logs(logs)
            else:
                accum = []
                for stacked, real in zip(groups, reals):
                    stacked = shard_batches(stacked, self.mesh, self.axis)
                    rngs = jax.random.split(model.next_rng(), self.n_devices)
                    params, mstate, opt_state, logs = self._step(
                        params, mstate, opt_state, stacked, rngs, real
                    )
                    accum.append(logs)
            sequencer.on_epoch_end()
            model.variables = {"params": to_dev0(params), "state": to_dev0(mstate)}
            model._opt_state = to_dev0(opt_state)
            return [_reduce_logs(accum)]

        validate = None
        if validation_data is not None:
            validate = lambda: evaluate(model, validation_data, verbose=0, prefix="val_")

        return run_fit_loop(
            model, epochs=epochs, run_chunk=run_epoch,
            validate=validate, callbacks=callbacks, verbose=verbose,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume=resume, validation_freq=validation_freq,
        )

    def evaluate(self, sequencer, **kwargs):
        """Evaluation is cheap relative to training — delegate to the model's
        single-device eval step on the synchronized (replicated) weights."""
        return self.model.evaluate(sequencer, **kwargs)

    def predict(self, sequencer, **kwargs):
        """Predictions on the synchronized weights (single-device step)."""
        return self.model.predict(sequencer, **kwargs)
