"""fit() epoch wall-clock: tile-packed (row-major engine) vs slot-packed
(transposed engine) sequencer batches — the standard training surface.

Protocol as BASELINE.md's epoch-in-one-launch table: full MUTAG training set
(2,837 graphs, 3 batches/epoch, starter GNN config), shuffle_mode='batches'
(no host rebuild), scan_batches epoch launch, warm timings (median of the
epochs after the first).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
from gnnkeras_tpu.models.gnn import GNNgraphBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

EPOCHS = int(os.environ.get("EPOCHS", "12"))


def build_model():
    inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0)
    inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = GNNgraphBased(net_st, net_out, 0, 5, 0.0)
    gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
    return gnn


class _Timer:
    def __init__(self):
        self.times = []

    def wrap(self, fit, *args, **kwargs):
        import gnnkeras_tpu.training.trainer as trainer

        times = self.times
        orig = time.perf_counter
        marks = []

        # fit prints per-epoch dt already; capture via History-side timing
        class Spy:
            stop_training = False

            def set_model(self, m):
                pass

            def on_train_begin(self):
                marks.append(orig())

            def on_epoch_end(self, epoch, logs=None):
                now = orig()
                times.append(now - marks[-1])
                marks.append(now)

            def on_train_end(self):
                pass

        kwargs.setdefault("callbacks", []).append(Spy())
        return fit(*args, **kwargs)


def run(label, **seq_kwargs):
    graphs = load_mutag()
    for g in graphs:
        g.setAggregation("average")
    gTr, _, _ = mutag_splits(graphs, seed=42)
    gnn = build_model()
    seq = MultiGraphSequencer(gTr, "g", "average", batch_size=1000,
                              shuffle_mode="batches", **seq_kwargs)
    t = _Timer()
    t.wrap(gnn.fit, seq, epochs=EPOCHS, verbose=0, seed=0)
    warm = t.times[2:]
    print(f"{label:42s} {np.median(warm) * 1e3:8.1f} ms/epoch (warm median of {len(warm)})")


def main():
    run("tile_pack (row-major engine)", tile_pack=True)
    run("slot_pack=128 bf16 (transposed engine)", slot_pack=128)


if __name__ == "__main__":
    main()
