"""Serial-LGNN baking pass wall-clock: per-graph (reference-faithful,
one launch + host sync per graph) vs chunked (fit_serial's
``bake_batch_size`` fast path, training/serial.py _bake_graphs).

The bake is the host↔device round-trip hot spot of serial training
(reference LGNN.py:328-338 does it per graph with batch_size=1); through the
tunneled TPU runtime every sync costs ~30 ms, so the per-graph loop is
sync-bound — the chunked path amortizes launches AND syncs.
"""

import time

import numpy as np


def main():
    from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.lgnn import LGNN
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
    from gnnkeras_tpu.training.serial import _bake_graphs

    graphs = load_mutag()
    for g in graphs:
        g.setAggregation("average")
    gTr, _, _ = mutag_splits(graphs, seed=42)
    print(f"{len(gTr)} training graphs")

    def build():
        gnns = []
        for layer in range(2):
            ins, ls = get_inout_dims("state", 14, 3, 2, "g", 0, layer=layer,
                                     get_state=True, get_output=True)
            ino, lo = get_inout_dims("output", 14, 3, 2, "g", 0, layer=layer,
                                     get_state=True, get_output=True)
            st = MLP(input_dim=ins[0], layers=ls, activations="selu",
                     kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
            ot = MLP(input_dim=ino[0], layers=lo, activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
            gnns.append(GNNgraphBased(st, ot, 0, 5, 0.0))
        lgnn = LGNN(gnns, True, True)
        lgnn.build(seed=0)
        return lgnn

    for chunk in (1, 64, 256):
        lgnn = build()
        lgnn.pull_layer_variables(0)
        gnn = lgnn.gnns[0]
        # first full pass warms the compile for the exact pad shapes
        _bake_graphs(lgnn, gnn, gTr, gTr, chunk_size=chunk)
        t0 = time.perf_counter()
        baked = _bake_graphs(lgnn, gnn, gTr, gTr, chunk_size=chunk)
        dt = time.perf_counter() - t0
        assert len(baked) == len(gTr)
        print(f"bake_batch_size={chunk:4d}: {dt:7.2f} s "
              f"({dt / len(gTr) * 1e3:6.2f} ms/graph)")


if __name__ == "__main__":
    import signal

    def _w(s, f):
        raise TimeoutError("watchdog")

    signal.signal(signal.SIGALRM, _w)
    signal.alarm(3000)
    main()
