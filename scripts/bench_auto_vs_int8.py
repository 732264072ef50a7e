"""agg_dtype='auto' vs explicit 'int8' on the 500k banded workload — the
clean re-measure VERDICT r4 asked for (next-step #7): the round-4 session's
absolute times were inflated ~2x by a concurrently running CPU test suite
(only the 1.02x ratio was valid).  Run this on an otherwise idle host.

Protocol: both batches built once, unfold timed with REPEATS inside one jit
(threaded data dependence), sync-floor subtracted, SIX alternating runs per
engine in one process, medians reported with the absolute ms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from bench_large_graph import ITERS, N_NODES, build  # noqa: E402

REPEATS = int(os.environ.get("REPEATS", "20"))


def timed_unfold(gnn, batch):
    @jax.jit
    def forward_k(variables, batch):
        def body(i, carry):
            acc, _ = carry
            b = batch.replace(nodes=batch.nodes + acc * 1e-30)
            k, state, bn = gnn.unfold(variables, b, training=True,
                                      rng=jax.random.PRNGKey(0))
            return (acc + jnp.sum(state), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))

    acc, _ = forward_k(gnn.variables, batch)
    _ = float(acc)
    sync = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync(batch.node_mask))
    floors = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(sync(batch.node_mask))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    t0 = time.perf_counter()
    acc, _ = forward_k(gnn.variables, batch)
    _ = float(acc)
    return (time.perf_counter() - t0 - floor) / REPEATS


def main():
    print("building auto batch...", flush=True)
    gnn_a, batch_a, n_arcs = build(agg_dtype="auto")
    print("building int8 batch...", flush=True)
    gnn_b, batch_b, _ = build(agg_dtype="int8")
    print("batches built", flush=True)
    gnn_b.transposed = True
    from gnnkeras_tpu.ops.banded import BandedOperator

    assert isinstance(batch_a.bcsr, BandedOperator), "auto must quantize here"
    assert isinstance(batch_b.bcsr, BandedOperator)

    t_auto, t_int8 = [], []
    for i in range(6):
        t_auto.append(timed_unfold(gnn_a, batch_a))
        t_int8.append(timed_unfold(gnn_b, batch_b))
        print(f"round {i}: auto {t_auto[-1]*1e3:.3f} ms  int8 {t_int8[-1]*1e3:.3f} ms",
              flush=True)
    ma, mi = float(np.median(t_auto)), float(np.median(t_int8))
    print(f"median: auto {ma*1e3:.3f} ms  int8 {mi*1e3:.3f} ms  ratio {ma/mi:.3f}  "
          f"({ITERS * n_arcs / ma / 1e9:.2f} B edges/s auto)")


if __name__ == "__main__":
    main()
