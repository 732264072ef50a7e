"""Arc-focused merged-Mutagenicity train step with the SHIPPED engine
(slot128 int8 strips, transposed unfold, incidence-pair readout).

Tracks the round-5 arc-step ladder: 10.49 ms (gather VJP scatter) →
4.06 ms (dense-block BCSR incidence backward) → this code.  Methodology
as bench.py: REPEATS inside one jit, sync-floor subtraction, median of 5.
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
from gnnkeras_tpu.models.gnn import GNNarcBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.training.trainer import _train_step_body

ITERS = 5
REPEATS = int(os.environ.get("REPEATS", "50"))
T_CLS = 2


def main():
    graphs = load_mutag()
    rng = np.random.default_rng(0)
    gs = []
    for g in graphs:
        t = np.eye(T_CLS, dtype=np.float32)[rng.integers(0, T_CLS, g.arcs.shape[0])]
        gs.append(GraphObject(nodes=g.nodes, arcs=g.arcs, targets=t, focus="a",
                              aggregation_mode="average", arcs_canonical=True))
    merged = GraphObject.merge(gs, focus="a", aggregation_mode="average")
    batch = from_graph_object(merged, slot_pack=128, strip_dtype="int8")
    print(f"{batch.nodes.shape[0]} nodes, {batch.arc_src.shape[0]} arcs, "
          f"incidence pairs: {batch.arc_inc.n_pairs}", flush=True)

    inp_s, layers_s = get_inout_dims("state", 14, 3, T_CLS, "a", 0)
    inp_o, layers_o = get_inout_dims("output", 14, 3, T_CLS, "a", 0)
    gnn = GNNarcBased(
        MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, ITERS, 0.0,
    )
    gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy")
    gnn.build(seed=0)
    gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])

    step = _train_step_body(gnn)

    @jax.jit
    def train_k(params, mstate, opt_state, batch, rng_k):
        def body(i, carry):
            p, m, o = carry
            p, m, o, _ = step(p, m, o, batch, rng_k)
            return (p, m, o)

        return jax.lax.fori_loop(0, REPEATS, body, (params, mstate, opt_state))

    rng_k = jax.random.PRNGKey(0)
    v = gnn.variables
    print("compiling train step...", flush=True)
    out = train_k(v["params"], v["state"], gnn._opt_state, batch, rng_k)
    _ = float(jax.tree_util.tree_leaves(out[0])[0].ravel()[0])

    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(batch.node_mask))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(sync_probe(batch.node_mask))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = train_k(v["params"], v["state"], gnn._opt_state, batch, rng_k)
        _ = float(jax.tree_util.tree_leaves(out[0])[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-9) / REPEATS
    print(f"arc train step: {dt * 1e3:.3f} ms "
          f"(ladder: 10.49 scatter -> 4.06 BCSR-incidence)", flush=True)


if __name__ == "__main__":
    main()
