"""LGNN 'serial' training mode.

Each layer is trained standalone, then its converged state/output are baked
into a rebuilt dataset feeding the next layer — always concatenated onto the
*original* t=0 features (reference LGNN.fit, LGNN.py:290-359).  The baking
pass runs the freshly trained layer over every graph with ``training=True``
(LGNN.py:332), exactly as the reference does — BatchNorm moving statistics are
committed sequentially across graphs.

TPU adaptation: the reference retrieves per-graph states by mutating the
sequencer to batch_size=1 and round-tripping tensors to numpy
(LGNN.py:328-338).  Here every graph is padded to a dataset-wide bucket so the
per-graph baking forward is a single compiled program replayed per graph.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import CompositeGraphObject, GraphObject


def _update_host_graph(
    model, g0: GraphObject, state: np.ndarray, out: np.ndarray,
    mask_graph: Optional[GraphObject] = None,
) -> GraphObject:
    """Host-side mirror of LGNN.update_graph (LGNN.py:175-214): prepend state
    and/or masked-scattered output to the t=0 node (or arc-label) features.

    ``mask_graph``: the graph the layer actually PROCESSED — its set∧output
    mask gates the scatter (reference update_graph, LGNN.py:185).  For
    transductive bakes this differs from ``g0``: the transduction removes
    output supervision from transductive nodes, whose baked output rows must
    stay zero.  Defaults to ``g0`` (the plain path, where they are equal)."""
    nodeplus: List[np.ndarray] = []
    arcplus: List[np.ndarray] = []
    if model.get_state:
        nodeplus.append(state)
    if model.get_output:
        mg = g0 if mask_graph is None else mask_graph
        mask = np.logical_and(mg.set_mask, mg.output_mask)
        scattered = np.zeros((len(mask), out.shape[1]), dtype=g0.dtype)
        scattered[mask] = out[mask]
        (arcplus if model._is_arc else nodeplus).append(scattered)

    nodes_new = np.concatenate(nodeplus + [g0.nodes], axis=1) if nodeplus else g0.nodes.copy()
    if arcplus:
        arcs_new = np.concatenate([g0.arcs[:, :2]] + arcplus + [g0.arcs[:, 2:]], axis=1)
    else:
        arcs_new = g0.arcs.copy()
    grow = sum(p.shape[1] for p in nodeplus)

    common = dict(
        nodes=nodes_new,
        arcs=arcs_new,
        targets=g0.targets.copy(),
        focus=g0.focus,
        set_mask=g0.set_mask.copy(),
        output_mask=g0.output_mask.copy(),
        sample_weight=g0.sample_weight.copy(),
        NodeGraph=(g0.graph_of_node, g0.nodegraph_weight) if g0.focus == "g" else None,
        aggregation_mode=g0.aggregation_mode,
        # ALWAYS keep the t=0 arc-row ORDER: for arc focus the targets and
        # set/output masks are arc-indexed, and a constructor re-sort keyed
        # on the inserted output columns could swap parallel arcs (same
        # src,dst, different labels) out from under them.  The t=0 rows are
        # unique (full-row dedup at construction), and adding columns cannot
        # create duplicates, so skipping the re-sort is safe.
        arcs_canonical=True,
    )
    if isinstance(g0, CompositeGraphObject):
        return CompositeGraphObject(
            type_mask=g0.getTypeMask(), dim_node_label=g0.DIM_NODE_LABEL + grow, **common
        )
    return GraphObject(**common)


def _bake_graphs(model, gnn, graphs, t0_graphs, chunk_size: int = 1):
    """Run the trained layer over every graph (training=True, per reference
    LGNN.py:332) and return new host graphs: t=0 features + this layer's
    (state, output) prepended.

    ``chunk_size=1`` (default) replays one compiled per-graph program,
    committing BatchNorm moving statistics sequentially graph-by-graph —
    bit-faithful to the reference's batch_size=1 baking loop (LGNN.py:328).
    ``chunk_size>1`` is the TPU fast path: graphs are disjoint-union merged
    ``chunk_size`` at a time so the bake costs ~len/chunk_size launches and
    host syncs instead of len.  BatchNorm statistics then update once per
    CHUNK (moments over all chunk nodes) — with no BatchNorm in the nets the
    baked features are identical; with BatchNorm the EMA commit granularity
    differs from the reference's per-graph order (documented deviation)."""

    # one compiled program per LAYER, reused across the train and validation
    # bakes (a fresh jit per _bake_graphs call would recompile even for
    # identical shapes)
    cache = getattr(gnn, "_compiled_cache", None)
    if cache is None:
        gnn._compiled_cache = cache = {}
    if "bake_step" not in cache:

        def bake_step(params, mstate, batch, rng):
            variables = {"params": params, "state": mstate}
            rng_loop, rng_out = jax.random.split(rng)
            k, state, bn_state = gnn.unfold(variables, batch, training=True, rng=rng_loop)
            out, row_mask, bn_out = gnn.node_level_output(variables, state, batch, training=True, rng=rng_out)
            return state, out, {"net_state": bn_state, "net_output": bn_out}

        cache["bake_step"] = jax.jit(bake_step)
    bake_step = cache["bake_step"]

    chunk_size = max(int(chunk_size), 1)
    chunks = [graphs[i : i + chunk_size] for i in range(0, len(graphs), chunk_size)]
    pad_n = max(sum(g.nodes.shape[0] for g in ch) for ch in chunks)
    pad_a = max(sum(g.arcs.shape[0] for g in ch) for ch in chunks)
    pad_n = ((pad_n + 127) // 128) * 128
    pad_a = ((pad_a + 127) // 128) * 128
    # uniform graph-row pad: the tail chunk would otherwise change G and
    # recompile the bake program once per distinct chunk length
    pad_g = ((max(len(ch) for ch in chunks) + 7) // 8) * 8

    new_graphs = []
    variables = gnn.variables
    t0_iter = iter(t0_graphs)
    for ch in chunks:
        if len(ch) > 1:
            cls = type(ch[0])
            g_dev = cls.merge(list(ch), focus=ch[0].focus, aggregation_mode=ch[0].aggregation_mode)
        else:
            g_dev = ch[0]
        from gnnkeras_tpu.graph.batch import pad_operators_to_cap

        batch = pad_operators_to_cap(from_graph_object(g_dev, pad_n, pad_a, pad_graphs=pad_g))
        state, out, new_bn = bake_step(variables["params"], variables["state"], batch, gnn.next_rng())
        variables = {"params": variables["params"], "state": new_bn}
        state_np = np.asarray(state)
        out_np = np.asarray(out)
        # split the merged rows back per graph (merge preserves per-graph
        # node/arc contiguity: arc keys are offset per graph before the sort)
        off_n = off_r = 0
        for g in ch:
            n_i = g.nodes.shape[0]
            n_rows = g.arcs.shape[0] if model._is_arc else n_i
            row0 = off_r if model._is_arc else off_n
            new_graphs.append(
                _update_host_graph(
                    model, next(t0_iter), state_np[off_n : off_n + n_i],
                    out_np[row0 : row0 + n_rows], mask_graph=g,
                )
            )
            off_n += n_i
            off_r += g.arcs.shape[0]
    gnn.variables = variables
    return new_graphs


def _bake_layer(model, gnn, sequence, t0_sequence, chunk_size: int = 1):
    """Rebuild ``sequence``'s dataset with the trained layer's features.

    Transductive sequencers hold HOMOGENEOUS source graphs and re-transduce
    per epoch (TransductiveGraphSequencers.py:56-59); baking therefore runs
    the layer on one fresh transduction of the current graphs, prepends the
    (state, output) onto the ORIGINAL homogeneous t=0 features, and returns a
    new transductive sequencer over the updated homogeneous graphs — which
    keeps re-transducing (appending targets to the new wider labels) for the
    next layer."""
    from gnnkeras_tpu.data.transductive import (
        TransductiveMultiGraphSequencer,
        TransductiveSingleGraphSequencer,
        get_transduction,
    )

    if isinstance(sequence, TransductiveMultiGraphSequencer):
        cur = sequence.graph_objects
        t0 = t0_sequence.graph_objects
        transduced = [get_transduction(g, sequence.transductive_rate, sequence.focus) for g in cur]
        new_graphs = _bake_graphs(model, gnn, transduced, t0, chunk_size)
        cfg = sequence.get_config()
        cfg["graphs"] = new_graphs
        cfg["shuffle"] = t0_sequence.shuffle
        return type(sequence)(**cfg)
    if isinstance(sequence, TransductiveSingleGraphSequencer):
        cur = [sequence.graph_object]
        t0 = [t0_sequence.graph_object]
        transduced = [get_transduction(cur[0], sequence.transductive_rate, sequence.focus)]
        new_graphs = _bake_graphs(model, gnn, transduced, t0, chunk_size)
        cfg = sequence.get_config()
        cfg["graph"] = new_graphs[0]
        cfg["shuffle"] = t0_sequence.shuffle
        return type(sequence)(**cfg)

    graphs = sequence.data if isinstance(sequence.data, list) else [sequence.data]
    t0_graphs = t0_sequence.data if isinstance(t0_sequence.data, list) else [t0_sequence.data]
    new_graphs = _bake_graphs(model, gnn, graphs, t0_graphs, chunk_size)
    return t0_sequence.with_graphs(new_graphs)


def fit_serial(
    model,
    sequencer,
    epochs: int = 1,
    validation_data=None,
    callbacks: Optional[list] = None,
    verbose: int = 1,
    seed: int = 0,
    bake_batch_size: int = 1,
):
    """Serial-mode LGNN fit (reference LGNN.py:292-359).  ``callbacks``, if
    given, must be one list per layer (LGNN.py:300-304).  Transductive
    sequencers are supported: each bake runs the layer on a fresh transduction
    and re-wraps the updated homogeneous graphs (see ``_bake_layer``).

    ``bake_batch_size>1`` merges that many graphs per baking launch (the TPU
    fast path — ~N/bake_batch_size device round-trips instead of N); BatchNorm
    moving statistics then commit per chunk instead of per graph (see
    ``_bake_graphs``)."""
    model.build(seed=seed)
    if callbacks is not None:
        assert len(callbacks) == model.LAYERS, "serial mode needs one callback list per layer"
    else:
        callbacks = [[] for _ in range(model.LAYERS)]

    training_data_t0 = sequencer
    training_sequence = sequencer.copy()
    valid_t0 = validation_data
    valid_sequence = validation_data.copy() if validation_data is not None else None

    histories = []
    for idx, gnn in enumerate(model.gnns[:-1]):
        if verbose:
            print(f"\n--- GNN {idx + 1}/{model.LAYERS} ---")
        model.pull_layer_variables(idx)
        h = gnn.fit(
            training_sequence.copy(),
            epochs=epochs,
            validation_data=valid_sequence.copy() if valid_sequence is not None else None,
            callbacks=callbacks[idx],
            verbose=verbose,
        )
        model.push_layer_variables(idx)
        histories.append(h)

        training_sequence = _bake_layer(model, gnn, training_sequence, training_data_t0, bake_batch_size)
        model.push_layer_variables(idx)  # commit baking-pass BatchNorm updates
        if valid_sequence is not None:
            valid_sequence = _bake_layer(model, gnn, valid_sequence, valid_t0, bake_batch_size)
            model.push_layer_variables(idx)

    if verbose:
        print(f"\n--- GNN {model.LAYERS}/{model.LAYERS} ---")
    gnn = model.gnns[-1]
    model.pull_layer_variables(model.LAYERS - 1)
    h = gnn.fit(
        training_sequence.copy(),
        epochs=epochs,
        validation_data=valid_sequence.copy() if valid_sequence is not None else None,
        callbacks=callbacks[-1],
        verbose=verbose,
    )
    model.push_layer_variables(model.LAYERS - 1)
    histories.append(h)
    return histories
