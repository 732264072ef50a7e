"""Ablation: where does the flagship forward's time go?

bench.py measures ~1.0 ms per 5-iteration forward while the raw transition
step (agg + concat + BN + dense + selu) measures 5 x 0.116 = 0.58 ms
(scripts/bench_transition.py) — this script splits the rest between the
unfold machinery (predicate + selects + BN threading) and the output path
(net_output on all nodes + NodeGraph readout)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPEATS = 100


def timeit(fn, args, label):
    @jax.jit
    def rep(args):
        def body(i, carry):
            acc, a0 = carry
            out = fn(a0 + acc * 1e-30, *args[1:])
            return (acc + out.ravel()[0] * 1e-30, a0)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), args[0]))

    args = tuple(args)
    acc, _ = rep(args)
    _ = float(acc)
    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:8]))
    _ = float(probe(args[0]))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(probe(args[0]))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc, _ = rep(args)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-9) / REPEATS
    print(f"{label:24s} {dt*1e3:8.3f} ms")
    return dt


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench as benchmod

    gnn, batch, n_arcs = benchmod.build_workload()
    variables = gnn.variables

    def full_forward(nodes, batch_rest):
        b = batch.replace(nodes=nodes)
        k, state, bn = gnn.unfold(variables, b, training=True)
        out, mask, _ = gnn.apply_output(variables, state, b, training=False, rng=None)
        return out

    def unfold_only(nodes, _):
        b = batch.replace(nodes=nodes)
        k, state, bn = gnn.unfold(variables, b, training=True)
        return state

    def unfold_eval(nodes, _):
        b = batch.replace(nodes=nodes)
        k, state, bn = gnn.unfold(variables, b, training=False)
        return state

    state0 = jnp.asarray(np.random.default_rng(0).standard_normal(batch.nodes.shape).astype(np.float32))

    def output_only(state, _):
        out, mask, _ = gnn.apply_output(variables, state, batch, training=False, rng=None)
        return out

    def node_out_only(state, _):
        out, mask, _ = gnn.node_level_output(variables, state, batch, training=False, rng=None)
        return out

    def readout_only(state, _):
        # NodeGraph readout alone, on 2-wide node outputs
        return batch.readout(state[:, :2])

    z = jnp.zeros(())
    timeit(full_forward, (batch.nodes, z), "full_forward (5 it)")
    timeit(unfold_only, (batch.nodes, z), "unfold train-path")
    timeit(unfold_eval, (batch.nodes, z), "unfold eval-path")
    timeit(output_only, (state0, z), "output+readout")
    timeit(node_out_only, (state0, z), "net_output only")
    timeit(readout_only, (state0, z), "readout only")


if __name__ == "__main__":
    main()
