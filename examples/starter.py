"""Homogeneous starter: MUTAG graph classification with GNN + LGNN.

One-to-one port of the reference's starter.py (same script options, same
model wiring, same data split) on the TPU-native stack.  Run:

    python examples/starter.py [--epochs N] [--fit gnn|lgnn]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root import without install

from gnnkeras_tpu import (
    GNNgraphBased,
    LGNN,
    MLP,
    MultiGraphSequencer,
    get_inout_dims,
)
from gnnkeras_tpu.data.mutag import load_mutag

#######################################################################################################################
# SCRIPT OPTIONS — the reference's starter.py:14-47 surface
#######################################################################################################################

aggregation_mode = "average"
addressed_problem = "c"
focus = "g"

activations_net_state = "selu"
kernel_init_net_state = "lecun_normal"
bias_init_net_state = "lecun_normal"

activations_net_output = "softmax"
kernel_init_net_output = "glorot_normal"
bias_init_net_output = "glorot_normal"

dim_state = 0
max_iter = 5
state_threshold = 0.01

layers = 3
get_state = True
get_output = True
training_mode = "serial"

epochs = 10
batch_size = 1000
loss_function = "categorical_crossentropy"
optimizer = "adam:0.01"

#######################################################################################################################
# SCRIPT
#######################################################################################################################


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=epochs)
    parser.add_argument("--fit", choices=["gnn", "lgnn", "none"], default="gnn")
    parser.add_argument("--mode", choices=["serial", "parallel", "residual"], default=training_mode)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    ### LOAD DATASET
    graphs = load_mutag(verbose=True)
    for g in graphs:
        g.setAggregation(aggregation_mode)

    ### PREPROCESSING — split as starter.py:63-66
    rng = np.random.default_rng(args.seed)
    rng.shuffle(graphs)
    gTr, gTe, gVa = graphs[:-1500], graphs[-1500:-750], graphs[-750:]
    gGen = gTr[0]

    ### MODELS
    nets_st, nets_out = [], []
    for i in range(layers):
        inp_s, layers_s = get_inout_dims(
            "state", gGen.DIM_NODE_LABEL, gGen.DIM_ARC_LABEL, gGen.DIM_TARGET,
            focus, dim_state, layer=i, get_state=get_state, get_output=get_output,
        )
        inp_o, layers_o = get_inout_dims(
            "output", gGen.DIM_NODE_LABEL, gGen.DIM_ARC_LABEL, gGen.DIM_TARGET,
            focus, dim_state, layer=i, get_state=get_state, get_output=get_output,
        )
        nets_st.append(
            MLP(input_dim=inp_s[0], layers=layers_s, activations=activations_net_state,
                kernel_initializer=kernel_init_net_state, bias_initializer=bias_init_net_state,
                name=f"state_{i}")
        )
        nets_out.append(
            MLP(input_dim=inp_o[0], layers=layers_o, activations=activations_net_output,
                kernel_initializer=kernel_init_net_output, bias_initializer=bias_init_net_output,
                name=f"out_{i}")
        )

    gnn = GNNgraphBased(nets_st[0], nets_out[0], dim_state, max_iter, state_threshold)
    gnn.compile(optimizer=optimizer, loss=loss_function, average_st_grads=False, metrics=["accuracy"])

    lgnn = LGNN(
        [GNNgraphBased(s, o, dim_state, max_iter, state_threshold) for s, o in zip(nets_st, nets_out)],
        get_state, get_output,
    )
    lgnn.compile(optimizer=optimizer, loss=loss_function, average_st_grads=True,
                 metrics=["accuracy"], training_mode=args.mode)

    ### DATA PROCESSING
    gTr_seq = MultiGraphSequencer(gTr, focus, aggregation_mode, batch_size)
    gVa_seq = MultiGraphSequencer(gVa, focus, aggregation_mode, batch_size, shuffle=False)
    gTe_seq = MultiGraphSequencer(gTe, focus, aggregation_mode, batch_size, shuffle=False)

    ### LEARNING PROCEDURE
    if args.fit == "gnn":
        gnn.fit(gTr_seq, epochs=args.epochs, validation_data=gVa_seq)
        print("test:", gnn.evaluate(gTe_seq, verbose=1))
    elif args.fit == "lgnn":
        lgnn.fit(gTr_seq, epochs=args.epochs, validation_data=gVa_seq)
        print("test:", lgnn.evaluate(gTe_seq, verbose=1))


if __name__ == "__main__":
    main()
