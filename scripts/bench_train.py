"""Training-step throughput on the current accelerator.

Times K full training steps (forward unfolding + backprop through it +
optax update) chained inside one jit — the carried params create the data
dependence, so nothing can be hoisted and the tunneled host-sync latency
amortizes away.  Reports steps/s and transition-iteration edges/s including
the backward pass."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench import ITERS, build_workload

K_STEPS = 20


def main(label: str = ""):
    gnn, batch, n_arcs = build_workload()
    gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy")
    if os.environ.get("RAW_OPT"):
        # bypass the inject_hyperparams wrapper (training/optimizers.py) to
        # price its per-step cost
        gnn.optimizer = optax.adam(0.01)
        label += " [raw adam]"
    if os.environ.get("REMAT"):
        # override the auto remat policy ('agg' for the transposed engine)
        gnn.remat = {"off": False, "on": True, "agg": "agg"}[os.environ["REMAT"]]
        label += f" [remat={os.environ['REMAT']}]"
    gnn.build(seed=0)
    opt_state = gnn.optimizer.init(gnn.variables["params"])

    from gnnkeras_tpu.training.trainer import _objective

    @jax.jit
    def train_k(params, mstate, opt_state, batch, rng):
        def body(i, carry):
            params, mstate, opt_state = carry
            step_rng = jax.random.fold_in(rng, i)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: _objective(gnn, p, mstate, batch, step_rng, training=True), has_aux=True
            )(params)
            updates, opt_state = gnn.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, aux["new_state"], opt_state)

        params, mstate, opt_state = jax.lax.fori_loop(
            0, K_STEPS, body, (params, mstate, opt_state)
        )
        return jnp.sum(params["net_state"][1]["kernel"]), params, mstate, opt_state

    rng = jax.random.PRNGKey(0)
    s, params, mstate, opt_state = train_k(
        gnn.variables["params"], gnn.variables["state"], opt_state, batch, rng
    )
    _ = float(s)

    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(batch.graph_mask))
    t0 = time.perf_counter()
    _ = float(sync_probe(batch.graph_mask))
    floor = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, params, mstate, opt_state = train_k(params, mstate, opt_state, batch, rng)
        _ = float(s)
        times.append(time.perf_counter() - t0)
    dt_step = (float(np.median(times)) - floor) / K_STEPS

    print(
        f"train step{label}: {dt_step * 1e3:.2f} ms  ->  {1.0 / dt_step:.1f} steps/s, "
        f"{ITERS * n_arcs / dt_step / 1e6:.0f}M transition-edges/s (fwd+bwd+update)"
    )


def decompose():
    """Backward-byte decomposition: where the step's time beyond the forward
    goes.  Variants are timed with the same chained-K methodology; each row
    isolates one component by construction (not by profiler attribution)."""
    gnn, batch, n_arcs = build_workload()
    gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy")
    gnn.build(seed=0)
    opt_state = gnn.optimizer.init(gnn.variables["params"])

    from gnnkeras_tpu.training.trainer import _objective

    def timed(fn, args, label):
        s, *_ = fn(*args)
        _ = float(jnp.sum(s))
        sync = jax.jit(lambda x: jnp.sum(x))
        _ = float(sync(batch.graph_mask))
        t0 = time.perf_counter()
        _ = float(sync(batch.graph_mask))
        floor = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, *_ = fn(*args)
            _ = float(jnp.sum(s))
            times.append(time.perf_counter() - t0)
        dt = (float(np.median(times)) - floor) / K_STEPS
        print(f"{label:44s} {dt * 1e3:7.3f} ms")
        return dt

    rng = jax.random.PRNGKey(0)
    params0, mstate0 = gnn.variables["params"], gnn.variables["state"]

    @jax.jit
    def fwd_only(params, mstate):
        def body(i, acc):
            step_rng = jax.random.fold_in(rng, i)
            loss, aux = _objective(gnn, jax.tree_util.tree_map(lambda x: x + acc * 1e-30, params),
                                   mstate, batch, step_rng, training=True)
            return acc + loss
        return (jax.lax.fori_loop(0, K_STEPS, body, jnp.zeros(())),)

    @jax.jit
    def grad_full(params, mstate):
        def body(i, carry):
            acc, params = carry
            step_rng = jax.random.fold_in(rng, i)
            p_dep = jax.tree_util.tree_map(lambda x: x + acc * 1e-30, params)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: _objective(gnn, p, mstate, batch, step_rng, training=True), has_aux=True
            )(p_dep)
            leaves = jax.tree_util.tree_leaves(grads)
            return (acc + loss + sum(jnp.sum(g) * 1e-30 for g in leaves), params)
        return jax.lax.fori_loop(0, K_STEPS, body, (jnp.zeros(()), params))

    @jax.jit
    def grad_output_only(params, mstate):
        # unfolding treated constant: isolates the readout/output-net backward
        def body(i, carry):
            acc, params = carry
            step_rng = jax.random.fold_in(rng, i)
            p_dep = jax.tree_util.tree_map(lambda x: x + acc * 1e-30, params)
            k, state, _ = gnn.unfold({"params": p_dep, "state": mstate}, batch, training=True)
            state = jax.lax.stop_gradient(state)
            def out_loss(p):
                out, mask, _ = gnn.apply_output({"params": p, "state": mstate}, state, batch,
                                                training=True, rng=None)
                from gnnkeras_tpu.training.losses import get_loss
                loss_fn = get_loss("categorical_crossentropy")
                per_row = loss_fn(batch.targets, out)
                w = batch.target_mask.astype(per_row.dtype) * batch.sample_weight
                return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
            loss, grads = jax.value_and_grad(out_loss)(p_dep)
            leaves = jax.tree_util.tree_leaves(grads)
            return (acc + loss + sum(jnp.sum(g) * 1e-30 for g in leaves), params)
        return jax.lax.fori_loop(0, K_STEPS, body, (jnp.zeros(()), params))

    @jax.jit
    def full_step(params, mstate, opt_state):
        def body(i, carry):
            params, mstate_, opt_state = carry
            step_rng = jax.random.fold_in(rng, i)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: _objective(gnn, p, mstate_, batch, step_rng, training=True), has_aux=True
            )(params)
            updates, opt_state = gnn.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, aux["new_state"], opt_state)
        params, mstate_, opt_state = jax.lax.fori_loop(0, K_STEPS, body, (params, mstate, opt_state))
        return (jnp.sum(params["net_state"][1]["kernel"]), params, mstate_, opt_state)

    t_fwd = timed(fwd_only, (params0, mstate0), "forward only (loss, no grad)")
    t_out = timed(grad_output_only, (params0, mstate0), "fwd + output-net grad (unfold const)")
    t_grad = timed(grad_full, (params0, mstate0), "fwd + full grad (no optimizer)")
    t_full = timed(full_step, (params0, mstate0, opt_state), "full step (+ Adam update)")
    print(f"{'-> unfolding backward (full - output-only)':44s} {(t_grad - t_out) * 1e3:7.3f} ms")
    print(f"{'-> readout/output backward (output - fwd)':44s} {(t_out - t_fwd) * 1e3:7.3f} ms")
    print(f"{'-> optimizer (full - grad)':44s} {(t_full - t_grad) * 1e3:7.3f} ms")


if __name__ == "__main__":
    if os.environ.get("DECOMPOSE"):
        decompose()
    elif os.environ.get("STRIP_SWEEP"):
        # training-step effect of the strip operator storage dtype (the
        # backward's strip VJP re-reads the operator: int8 mask+scale halves
        # those bytes vs bf16)
        for dt in ("float32", "bfloat16", "int8"):
            os.environ["GNNK_BENCH_STRIP_DTYPE"] = dt
            main(label=f" [strip={dt}]")
    else:
        main()
