"""Jit-compiled training runtime.

Replaces the reference's forced-eager Keras ``Model.fit``/``train_step``
(GNN/Models/GNN.py:148-162,277-306): one XLA-compiled program per batch
*shape* covers the whole training step — forward unfolding, loss, backprop
through the unfolding, the optional ``average_st_grads`` grads/k division
(GNN.py:295), the optax update and the metric sums.  Static padded batch
shapes (gnnkeras_tpu.graph.batch) mean the first batch compiles and every
subsequent one replays.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnnkeras_tpu.training.callbacks import Callback, History
from gnnkeras_tpu.training.losses import masked_mean
from gnnkeras_tpu.training.metrics import get_metric


def _is_lgnn(model) -> bool:
    from gnnkeras_tpu.models.lgnn import LGNN

    return isinstance(model, LGNN)


def _objective(model, params, mstate, batch, rng, training: bool):
    """loss + aux for one batch.  Handles both single GNNs and LGNN stacks
    (parallel: mean of per-layer losses, LGNN.py:262; residual: loss of the
    mean output, LGNN.py:263; evaluation scores the last layer only,
    LGNN.py:167)."""
    variables = {"params": params, "state": mstate}
    loss_fn = model.loss
    y, mask, sw = batch.targets, batch.target_mask, batch.sample_weight

    if _is_lgnn(model):
        ks, _, outs, _, new_state = model.forward(variables, batch, training=training, rng=rng)
        if training and model.training_mode == "parallel":
            data_loss = sum(masked_mean(loss_fn(y, out), mask, sw) for out in outs) / len(outs)
        elif training and model.training_mode == "residual":
            mean_out = sum(outs) / len(outs)
            data_loss = masked_mean(loss_fn(y, mean_out), mask, sw)
        else:
            data_loss = masked_mean(loss_fn(y, outs[-1]), mask, sw)
        loss = data_loss + model.regularization_loss(params)
        aux = {"y_pred": outs[-1], "k": ks, "new_state": new_state}
    else:
        k, _, out, _, new_state = model.forward(variables, batch, training=training, rng=rng)
        loss = masked_mean(loss_fn(y, out), mask, sw) + model.regularization_loss(params)
        aux = {"y_pred": out, "k": k, "new_state": new_state}
    return loss, aux


def _metric_sums(model, y_pred, batch):
    sums = {}
    for spec in model.metrics:
        name, fn = get_metric(spec)
        s, c = fn(batch.targets, y_pred, batch.target_mask, batch.sample_weight)
        sums[name] = (s, c)
    return sums


def _train_step_body(model):
    """The ONE training-step function — used directly (jitted per-batch) and
    as the scan body of the epoch launch, so the two paths cannot drift."""

    def step(params, mstate, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: _objective(model, p, mstate, batch, rng, training=True), has_aux=True
        )(params)
        if model.average_st_grads:
            grads = model.scale_state_grads(grads, aux["k"])
        updates, opt_state = model.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        count = jnp.maximum(jnp.sum(batch.target_mask.astype(jnp.float32)), 1.0)
        logs = {"loss_sum": loss * count, "count": count}
        for name, (s, c) in _metric_sums(model, aux["y_pred"], batch).items():
            logs[f"{name}_sum"] = s
            logs[f"{name}_count"] = c
        return params, aux["new_state"], opt_state, logs

    return step


def _eval_step_body(model):
    def step(params, mstate, batch, rng):
        loss, aux = _objective(model, params, mstate, batch, rng, training=False)
        count = jnp.maximum(jnp.sum(batch.target_mask.astype(jnp.float32)), 1.0)
        logs = {"loss_sum": loss * count, "count": count}
        for name, (s, c) in _metric_sums(model, aux["y_pred"], batch).items():
            logs[f"{name}_sum"] = s
            logs[f"{name}_count"] = c
        return logs

    return step


def _get_train_step(model):
    cache = getattr(model, "_compiled_cache", None)
    if cache is None:
        model._compiled_cache = cache = {}
    if "train_step" not in cache:
        cache["train_step"] = jax.jit(_train_step_body(model), donate_argnums=(0, 1, 2))
    return cache["train_step"]


def _get_epoch_step(model):
    """One XLA launch per EPOCH: ``lax.scan`` of the train step over a stacked
    batch axis.  Per-step host dispatch+sync (~30 ms each through a tunneled
    runtime, still µs-scale locally) collapses to one round-trip per epoch.
    Requires every batch in the sequencer to share one pytree structure —
    which the sequencers guarantee via monotonic pads + uniform block counts."""
    cache = getattr(model, "_compiled_cache", None)
    if cache is None:
        model._compiled_cache = cache = {}
    if "epoch_step" not in cache:
        step = _train_step_body(model)

        def body(carry, xs):
            params, mstate, opt_state = carry
            batch, rng = xs
            params, mstate, opt_state, logs = step(params, mstate, opt_state, batch, rng)
            return (params, mstate, opt_state), logs

        def epoch(params, mstate, opt_state, stacked, rngs):
            (params, mstate, opt_state), logs = jax.lax.scan(
                body, (params, mstate, opt_state), (stacked, rngs)
            )
            return params, mstate, opt_state, logs

        cache["epoch_step"] = jax.jit(epoch, donate_argnums=(0, 1, 2))
    return cache["epoch_step"]


def _get_eval_epoch(model):
    """Scanned evaluate: all batches of a sequencer in one launch."""
    cache = getattr(model, "_compiled_cache", None)
    if cache is None:
        model._compiled_cache = cache = {}
    if "eval_epoch" not in cache:
        step = _eval_step_body(model)

        def body(carry, xs):
            batch, rng = xs
            return carry, step(carry["params"], carry["state"], batch, rng)

        def epoch(params, mstate, stacked, rngs):
            _, logs = jax.lax.scan(body, {"params": params, "state": mstate}, (stacked, rngs))
            return logs

        cache["eval_epoch"] = jax.jit(epoch)
    return cache["eval_epoch"]


def _try_stack(batches, cache_host=None):
    """Stack same-structure batches for the scanned paths; None if the
    sequencer emitted mixed pytree structures (fall back to per-step).

    With ``cache_host`` (the sequencer), the stacked tree is reused across
    epochs while the sequencer serves the same batch objects in the same
    order (shuffle=False / between rebuilds) — skipping a full re-stack and
    device copy of the dataset per epoch.  The cache keeps references to the
    source batches so the id-tuple key stays valid.

    A sequencer can opt out with ``scan_stack_ok = False`` — e.g. the
    single-graph sequencer, whose batches SHARE one topology and differ only
    in masks: stacking would duplicate the whole graph per batch on device."""
    if len(batches) < 2:
        return None
    if cache_host is not None and not getattr(cache_host, "scan_stack_ok", True):
        return None
    key = tuple(id(b) for b in batches)
    if cache_host is not None:
        cached = getattr(cache_host, "_scan_stack_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
    from gnnkeras_tpu.parallel.data_parallel import stack_batches

    try:
        if len({jax.tree_util.tree_structure(b) for b in batches}) != 1:
            return None
        stacked = stack_batches(batches)
    except (ValueError, TypeError):
        return None
    if cache_host is not None:
        cache_host._scan_stack_cache = (key, stacked, list(batches))
    return stacked


def _unstack_logs(logs) -> list:
    host = {k: np.asarray(v) for k, v in logs.items()}
    n = next(iter(host.values())).shape[0] if host else 0
    return [{k: v[i] for k, v in host.items()} for i in range(n)]


def _get_eval_step(model):
    cache = getattr(model, "_compiled_cache", None)
    if cache is None:
        model._compiled_cache = cache = {}
    if "eval_step" not in cache:
        cache["eval_step"] = jax.jit(_eval_step_body(model))
    return cache["eval_step"]


def _reduce_logs(accum: list, prefix: str = "") -> dict:
    total = {}
    for logs in accum:
        for key, value in logs.items():
            total[key] = total.get(key, 0.0) + float(value)
    out = {prefix + "loss": total.get("loss_sum", 0.0) / max(total.get("count", 1.0), 1.0)}
    for key in list(total):
        if key.endswith("_sum") and key != "loss_sum":
            name = key[:-4]
            out[prefix + name] = total[key] / max(total.get(f"{name}_count", 1.0), 1e-9)
    return out


def _class_weight_vector(class_weight):
    """dict {class index: weight} → dense lookup vector (missing classes
    weight 1.0), the stock ``Model.fit(class_weight=...)`` convention the
    reference inherits from Keras."""
    from gnnkeras_tpu.utils.dtypes import floatx

    n = max(int(k) for k in class_weight) + 1
    vec = np.ones(n, dtype=floatx())
    for k, v in class_weight.items():
        vec[int(k)] = float(v)
    return jnp.asarray(vec)


def _apply_class_weight(batch, cw_vec):
    """Scale each supervised row's sample weight by the weight of its TRUE
    class (argmax of the one-hot target row).  Rows outside target_mask are
    already excluded by the masked loss.  Composes multiplicatively with
    per-graph sample_weight, as in Keras."""
    cls = jnp.clip(jnp.argmax(batch.targets, axis=-1), 0, cw_vec.shape[0] - 1)
    return batch.replace(sample_weight=batch.sample_weight * cw_vec[cls])


def fit(
    model,
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
    """Keras-like fit loop over a graph sequencer.  Returns a History.

    ``class_weight`` ({class index: weight}) scales each supervised row's
    TRAINING loss by the weight of its true class — the stock Keras ``fit``
    behavior the reference gets for free (GNN models inherit keras.Model);
    validation/evaluate are unaffected, as in Keras.

    ``validation_freq`` runs validation only every N epochs (Keras semantics:
    epoch numbers 1-based, validated when ``(epoch+1) % N == 0``) — epochs
    without validation produce no ``val_*`` log entries, so monitors like
    EarlyStopping see the last validated value through History's dict.

    With ``checkpoint_dir`` every ``checkpoint_every`` epochs a full resumable
    checkpoint (params + BN state + optimizer state + PRNG) is written;
    ``resume=True`` restores the latest one and continues from the following
    epoch — interrupted runs pick up where they stopped.

    ``scan_batches`` (default: auto) runs the whole epoch as ONE compiled
    launch — ``lax.scan`` of the train step over the stacked batches — instead
    of one dispatch per batch; it engages automatically when the sequencer's
    batches share a pytree structure and falls back silently otherwise."""
    from gnnkeras_tpu.training.fit_loop import run_fit_loop

    if model.optimizer is None:
        raise RuntimeError("call compile() before fit()")
    model.build(seed=seed)
    if model._opt_state is None:
        model._opt_state = model.optimizer.init(model.variables["params"])

    cw_vec = _class_weight_vector(class_weight) if class_weight else None
    train_step = _get_train_step(model)

    def run_epoch(epoch, n):
        params, mstate = model.variables["params"], model.variables["state"]
        opt_state = model._opt_state
        batches = [sequencer[i] for i in range(len(sequencer))]
        stacked = _try_stack(batches, cache_host=sequencer) if scan_batches in (None, True) else None
        if stacked is not None:
            if cw_vec is not None:
                # applied AFTER stacking so the sequencer's cached stack stays
                # weight-free (argmax over the trailing class axis broadcasts)
                stacked = _apply_class_weight(stacked, cw_vec)
            rngs = jnp.stack([model.next_rng() for _ in batches])
            params, mstate, opt_state, logs = _get_epoch_step(model)(
                params, mstate, opt_state, stacked, rngs
            )
            accum = _unstack_logs(logs)
        else:
            accum = []
            for batch in batches:
                if cw_vec is not None:
                    batch = _apply_class_weight(batch, cw_vec)
                params, mstate, opt_state, logs = train_step(
                    params, mstate, opt_state, batch, model.next_rng()
                )
                accum.append(logs)
        sequencer.on_epoch_end()
        model.variables = {"params": params, "state": mstate}
        model._opt_state = opt_state
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


def evaluate(
    model, sequencer, verbose: int = 0, prefix: str = "",
    scan_batches: Optional[bool] = None,
):
    """Loss + metrics over a sequencer (reference ``Model.evaluate``).
    ``scan_batches`` as in ``fit``: all batches in one compiled launch when
    the sequencer's batches share a pytree structure."""
    if model.loss is None:
        raise RuntimeError("call compile() before evaluate() (loaded models need recompiling, as in the reference)")
    model.build()
    batches = [sequencer[i] for i in range(len(sequencer))]
    stacked = _try_stack(batches, cache_host=sequencer) if scan_batches in (None, True) else None
    if stacked is not None:
        rngs = jnp.stack([model.next_rng() for _ in batches])
        logs = _get_eval_epoch(model)(
            model.variables["params"], model.variables["state"], stacked, rngs
        )
        accum = _unstack_logs(logs)
    else:
        eval_step = _get_eval_step(model)
        accum = [
            eval_step(model.variables["params"], model.variables["state"], batch, model.next_rng())
            for batch in batches
        ]
    logs = _reduce_logs(accum, prefix=prefix)
    if verbose:
        print(" - ".join(f"{k}: {v:.4f}" for k, v in logs.items()))
    return logs


def predict(model, sequencer, seed: Optional[int] = None):
    """Model outputs for every supervised row, concatenated over batches
    (the reference's ``call(training=False)`` path, GNN.py:176-177)."""
    model.build()
    cache = getattr(model, "_compiled_cache", None)
    if cache is None:
        model._compiled_cache = cache = {}
    if "predict_step" not in cache:

        def step(params, mstate, batch, rng):
            variables = {"params": params, "state": mstate}
            if _is_lgnn(model):
                _, _, outs, out_mask, _ = model.forward(variables, batch, training=False, rng=rng)
                return outs[-1], out_mask
            _, _, out, out_mask, _ = model.forward(variables, batch, training=False, rng=rng)
            return out, out_mask

        cache["predict_step"] = jax.jit(step)

    # seeded prediction uses a LOCAL key stream: reproducible across calls
    # and it does not advance the model's training rng
    rng = jax.random.PRNGKey(seed) if seed is not None else None
    outs = []
    for i in range(len(sequencer)):
        batch = sequencer[i]
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = model.next_rng()
        out, _ = cache["predict_step"](
            model.variables["params"], model.variables["state"], batch, sub
        )
        out = np.asarray(out)
        # tile-packed batches permute rows; host_pred_rows (graph/batch.py)
        # restores the caller's (graph, entity) order
        rows = getattr(batch, "host_pred_rows", None)
        outs.append(out[rows] if rows is not None else out[np.asarray(batch.target_mask)])
    return np.concatenate(outs, axis=0)
