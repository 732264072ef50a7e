"""Composite starter: MUTAG with heterogeneous (single-type) graphs, composite
GNN + layered CLGNN — the reference's starter_composite.py surface (with its
``dim_node_features`` constructor typo fixed; see load_MUTAG.py:59).

    python examples/starter_composite.py [--epochs N] [--fit gnn|lgnn]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root import without install

from gnnkeras_tpu import (
    CompositeGNNgraphBased,
    CompositeLGNN,
    CompositeMultiGraphSequencer,
    MLP,
    get_inout_dims,
)
from gnnkeras_tpu.data.mutag import load_mutag

# SCRIPT OPTIONS — starter_composite.py:14-46
aggregation_mode = "average"
focus = "g"

activations_net_state = "selu"
kernel_init_net_state = "lecun_normal"
bias_init_net_state = "lecun_normal"
activations_net_output = "softmax"
kernel_init_net_output = "glorot_normal"
bias_init_net_output = "glorot_normal"

dim_state = 10
max_iter = 5
state_threshold = 0.01

layers = 5
get_state = True
get_output = True
training_mode = "parallel"

epochs = 5
batch_size = 500
loss_function = "categorical_crossentropy"
optimizer = "adam:0.01"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=epochs)
    parser.add_argument("--fit", choices=["gnn", "lgnn", "none"], default="gnn")
    parser.add_argument("--mode", choices=["serial", "parallel", "residual"], default=training_mode)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    graphs = load_mutag(composite=True, verbose=True)
    for g in graphs:
        g.setAggregation(aggregation_mode)

    rng = np.random.default_rng(args.seed)
    rng.shuffle(graphs)
    gTr, gTe, gVa = graphs[:-1500], graphs[-1500:-750], graphs[-750:]
    gGen = gTr[0]

    # NETS — STATE (one per node type per layer)
    nets_st = []
    for i in range(layers):
        inp_s, layers_s = get_inout_dims(
            "state", gGen.DIM_NODE_LABEL, gGen.DIM_ARC_LABEL, gGen.DIM_TARGET,
            focus, dim_state, layer=i, get_state=get_state, get_output=get_output,
        )
        nets_st.append(
            [MLP(input_dim=shape, layers=layers_s, activations=activations_net_state,
                 kernel_initializer=kernel_init_net_state, bias_initializer=bias_init_net_state,
                 name=f"state_{i}_{t}") for t, shape in enumerate(inp_s)]
        )

    # NETS — OUTPUT: composite readout consumes the converged state only
    # (CompositeGNN.py:237-239), so input dim = dim_state as in
    # starter_composite.py:82.
    def make_net_out(i):
        return MLP(input_dim=(dim_state,), layers=[gGen.DIM_TARGET], activations=activations_net_output,
                   kernel_initializer=kernel_init_net_output, bias_initializer=bias_init_net_output,
                   name=f"out_{i}")

    gnn = CompositeGNNgraphBased(nets_st[0], make_net_out(0), dim_state, max_iter, state_threshold)
    gnn.compile(optimizer=optimizer, loss=loss_function, average_st_grads=False, metrics=["accuracy", "mse"])

    lgnn = CompositeLGNN(
        [CompositeGNNgraphBased(s, make_net_out(i), dim_state, max_iter, state_threshold)
         for i, s in enumerate(nets_st)],
        get_state, get_output,
    )
    lgnn.compile(optimizer=optimizer, loss=loss_function, average_st_grads=True,
                 metrics=["accuracy", "mse"], training_mode=args.mode)

    gTr_seq = CompositeMultiGraphSequencer(gTr, focus, aggregation_mode, batch_size)
    gVa_seq = CompositeMultiGraphSequencer(gVa, focus, aggregation_mode, batch_size, shuffle=False)
    gTe_seq = CompositeMultiGraphSequencer(gTe, focus, aggregation_mode, batch_size, shuffle=False)

    if args.fit == "gnn":
        gnn.fit(gTr_seq, epochs=args.epochs, validation_data=gVa_seq)
        print("test:", gnn.evaluate(gTe_seq, verbose=1))
    elif args.fit == "lgnn":
        lgnn.fit(gTr_seq, epochs=args.epochs, validation_data=gVa_seq)
        print("test:", lgnn.evaluate(gTe_seq, verbose=1))


if __name__ == "__main__":
    main()
