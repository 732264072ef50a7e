"""Composite + dim_state>0 transposed-engine benchmark.

The round-3 transposed engine initially covered dim_state==0 homogeneous
models only; this measures its extension to

- the homogeneous model at dim_state=10 (random state init, the wider
  [state | labels | Σstate | Σlabels | Σarcs] transition input), and
- the composite model in the starter_composite config family
  (1-type composite Mutagenicity, dim_state=10, per-type nets via apply_t),

each vs the forced row-major engine on the same slot-packed batch.
Methodology as bench.py: repeats inside one jit with a threaded data
dependence, sync-floor subtraction.
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
from gnnkeras_tpu.graph.graph import CompositeGraphObject, GraphObject
from gnnkeras_tpu.models.composite import CompositeGNNgraphBased
from gnnkeras_tpu.models.gnn import GNNgraphBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

ITERS = 5
DS = 10
REPEATS = int(os.environ.get("REPEATS", "100"))


def build_homogeneous():
    inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", DS)
    inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", DS)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = GNNgraphBased(net_st, net_out, DS, ITERS, 0.0)
    gnn.build(seed=0)
    return gnn


def build_composite():
    inp_s, layers_s = get_inout_dims("state", (14,), 3, 2, "g", DS)
    nets = [MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal")]
    net_out = MLP(input_dim=(DS,), layers=[2], activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    cgnn = CompositeGNNgraphBased(nets, net_out, DS, ITERS, 0.0)
    cgnn.build(seed=0)
    return cgnn


def timed_forward(gnn, batch, n_arcs, label):
    rng0 = jax.random.PRNGKey(17)

    @jax.jit
    def forward_k(variables, batch):
        def body(i, carry):
            acc, _ = carry
            b = batch.replace(nodes=batch.nodes + acc * 1e-30)
            rng = jax.random.fold_in(rng0, i)
            k, state, bn = gnn.unfold(variables, b, training=True, rng=rng)
            out, mask, _ = gnn.apply_output(variables, state, b, training=False, rng=None)
            return (acc + jnp.sum(out), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))

    acc, k = forward_k(gnn.variables, batch)
    _ = float(acc)
    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(batch.graph_mask))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(sync_probe(batch.graph_mask))
        floors.append(time.perf_counter() - t0)
    sync_floor = float(np.median(floors))

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc, k = forward_k(gnn.variables, batch)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - sync_floor, 1e-9) / REPEATS
    edges = ITERS * n_arcs / dt
    print(f"{label:48s} {dt * 1e3:8.3f} ms/fwd  {edges / 1e9:6.2f} B edges/s")
    return dt, edges


def canary(gnn, batch, rng):
    _, st, _ = gnn.unfold(gnn.variables, batch, training=True, rng=rng)
    return float(jnp.linalg.norm(jnp.sort(jnp.abs(st[batch.node_mask]), axis=None)))


def run_family(tag, gnn, merged, strip_dtype):
    n_arcs = merged.arcs.shape[0]
    batch = from_graph_object(merged, slot_pack=128, strip_dtype=strip_dtype)
    rng = jax.random.PRNGKey(17)
    gnn.transposed = False
    norm_ref = canary(gnn, batch, rng)
    timed_forward(gnn, batch, n_arcs, f"{tag} row-major (slot batch)")
    gnn.transposed = True
    norm = canary(gnn, batch, rng)
    rel = abs(norm - norm_ref) / norm_ref
    timed_forward(gnn, batch, n_arcs, f"{tag} transposed {strip_dtype} (rel {rel:.1e})")
    if rel > 2e-2:
        print(f"{tag}: STATE MISMATCH rel={rel:.3e}")
    gnn.transposed = None
    del batch


def main():
    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    run_family("homog ds=10", build_homogeneous(), merged, "bfloat16")

    cgraphs = load_mutag(composite=True)
    cmerged = CompositeGraphObject.merge(cgraphs, focus="g", aggregation_mode="average")
    run_family("composite ds=10", build_composite(), cmerged, "bfloat16")


if __name__ == "__main__":
    main()
