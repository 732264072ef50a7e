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


def main():
    gnn, batch, n_arcs = build_workload()
    gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy")
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
        f"train step: {dt_step * 1e3:.2f} ms  ->  {1.0 / dt_step:.1f} steps/s, "
        f"{ITERS * n_arcs / dt_step / 1e6:.0f}M transition-edges/s (fwd+bwd+update)"
    )


if __name__ == "__main__":
    main()
