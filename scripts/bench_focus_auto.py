"""Node- and arc-focused merged Mutagenicity batches: does the flagship
strip/transposed engine beat plain BCSR there too (VERDICT r4 next-step #1)?

The auto rule (config.py build_sequencer, sequencers.py tile_pack default)
has so far gated slot-packed strips to graph focus with no measurement.
Node- and arc-focused sequencers are first-class in the reference
(GraphSequencers.py:12-127, GNN.py:317-330), so the gate needs numbers:
for focus in ('n', 'a') this times the full forward (unfold + readout) and
the train step under

- plain BCSR, no tile packing (the current node/arc default path),
- slot_pack=128 + int8 strips, transposed unfold (the flagship engine).

Methodology as bench.py: REPEATS inside one jit with a threaded data
dependence, sync-floor subtraction, median of 5 (honest timing through the
tunneled TPU).  Engines are interleaved in ONE process so ratios survive
host contention.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.data.mutag import load_mutag
from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNarcBased, GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.training.trainer import _train_step_body

ITERS = 5
REPEATS = int(os.environ.get("REPEATS", "100"))
T = 2


def refocus(graphs, focus):
    """Mutagenicity graphs re-targeted per node/arc (synthetic one-hot
    targets — the benchmark needs the shapes, not the labels)."""
    rng = np.random.default_rng(0)
    out = []
    for g in graphs:
        rows = g.nodes.shape[0] if focus == "n" else g.arcs.shape[0]
        t = np.eye(T, dtype=np.float32)[rng.integers(0, T, rows)]
        out.append(GraphObject(nodes=g.nodes, arcs=g.arcs, targets=t, focus=focus,
                               aggregation_mode="average", arcs_canonical=True))
    return out


def build_model(focus):
    cls = {"n": GNNnodeBased, "a": GNNarcBased}[focus]
    inp_s, layers_s = get_inout_dims("state", 14, 3, T, focus, 0)
    inp_o, layers_o = get_inout_dims("output", 14, 3, T, focus, 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = cls(net_st, net_out, 0, ITERS, 0.0)
    gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy")
    gnn.build(seed=0)
    gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
    return gnn


def _sync_floor(probe):
    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(probe))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(sync_probe(probe))
        floors.append(time.perf_counter() - t0)
    return float(np.median(floors))


def timed_forward(gnn, batch, n_arcs, label):
    @jax.jit
    def forward_k(variables, batch):
        def body(i, carry):
            acc, _ = carry
            b = batch.replace(nodes=batch.nodes + acc * 1e-30)
            k, state, bn = gnn.unfold(variables, b, training=True)
            out, mask, _ = gnn.apply_output(variables, state, b, training=False, rng=None)
            return (acc + jnp.sum(out), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))

    acc, _ = forward_k(gnn.variables, batch)
    _ = float(acc)
    floor = _sync_floor(batch.node_mask)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc, _ = forward_k(gnn.variables, batch)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-9) / REPEATS
    print(f"  fwd   {label:34s} {dt * 1e3:8.3f} ms  "
          f"{ITERS * n_arcs / dt / 1e9:6.2f} B edges/s", flush=True)
    return dt


def timed_train(gnn, batch, label):
    step = _train_step_body(gnn)  # un-jitted: we jit the K-step loop

    @jax.jit
    def train_k(params, mstate, opt_state, batch, rng):
        def body(i, carry):
            p, m, o = carry
            p, m, o, _ = step(p, m, o, batch, rng)
            return (p, m, o)

        return jax.lax.fori_loop(0, REPEATS, body, (params, mstate, opt_state))

    rng = jax.random.PRNGKey(0)
    v = gnn.variables
    out = train_k(v["params"], v["state"], gnn._opt_state, batch, rng)
    jax.block_until_ready(out)
    floor = _sync_floor(batch.node_mask)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = train_k(v["params"], v["state"], gnn._opt_state, batch, rng)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-9) / REPEATS
    print(f"  train {label:34s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    graphs = load_mutag()
    for focus in ("n", "a"):
        gs = refocus(graphs, focus)
        merged = GraphObject.merge(gs, focus=focus, aggregation_mode="average")
        n_arcs = merged.arcs.shape[0]
        gnn = build_model(focus)
        print(f"focus={focus}: {merged.nodes.shape[0]} nodes, {n_arcs} arcs", flush=True)

        # current default path: plain BCSR, no tile packing, row-major
        plain = from_graph_object(merged)
        # flagship engine: slot-packed int8 strips, transposed unfold
        strip = from_graph_object(merged, slot_pack=128, strip_dtype="int8")
        assert strip.strip is not None and strip.strip.scale is not None

        # correctness canary: order-independent masked state norm
        gnn.transposed = False
        _, st_ref, _ = gnn.unfold(gnn.variables, plain, training=True)
        ref = float(jnp.linalg.norm(jnp.sort(jnp.abs(st_ref[plain.node_mask]), axis=None)))
        gnn.transposed = None
        _, st, _ = gnn.unfold(gnn.variables, strip, training=True)
        got = float(jnp.linalg.norm(jnp.sort(jnp.abs(st[strip.node_mask]), axis=None)))
        rel = abs(got - ref) / ref
        print(f"  state-norm rel dev (strip vs plain): {rel:.2e}", flush=True)

        # interleaved A/B, forward then train
        for _ in range(2):
            gnn.transposed = False
            gnn._compiled_cache = {}
            f_plain = timed_forward(gnn, plain, n_arcs, "plain BCSR row-major")
            gnn.transposed = None
            gnn._compiled_cache = {}
            f_strip = timed_forward(gnn, strip, n_arcs, "slot128 int8 transposed")
        print(f"  forward ratio plain/strip: {f_plain / f_strip:.2f}x", flush=True)

        for _ in range(2):
            gnn.transposed = False
            gnn._compiled_cache = {}
            t_plain = timed_train(gnn, plain, "plain BCSR row-major")
            gnn.transposed = None
            gnn._compiled_cache = {}
            t_strip = timed_train(gnn, strip, "slot128 int8 transposed")
        print(f"  train ratio plain/strip: {t_plain / t_strip:.2f}x", flush=True)


if __name__ == "__main__":
    main()
