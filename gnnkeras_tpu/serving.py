"""Serving and export: fixed-shape AOT inference endpoints and portable
compiled artifacts.

The reference has no serving story: inference is ``Model.evaluate`` /
``Model.predict`` in eager TF on whatever shapes arrive (GNN/Models/GNN.py:
165-177), recompiling nothing because nothing is compiled.  A TPU deployment
needs the opposite: one ahead-of-time compiled executable for a fixed padded
request shape, reused for every request.

Two tiers:

- :class:`Predictor` — in-process endpoint.  Merges incoming ``GraphObject``
  requests into the fixed template shape, runs the AOT-compiled eval forward
  (optionally the fused whole-unfold Pallas kernel, ops/fused.py, which
  collapses the entire convergence loop into one kernel launch — the
  latency-optimal path for small requests), and returns per-entity outputs
  in the caller's row order.
- :func:`export_forward` / :func:`load_exported` — portable artifact: the
  eval forward serialized as versioned StableHLO via ``jax.export`` plus the
  trained parameters and serving metadata.  The artifact is loadable in a
  process that never imports the model classes and runs on any JAX backend
  that can compile it (the TPU-serving analog of the reference's SavedModel
  directories, GNN/Models/GNN.py:94-137).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.graph.batch import GraphBatch, from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject


def _round_up(x: int, m: int) -> int:
    return max(((x + m - 1) // m) * m, m)


_FOCUS_OF_NAME = {"node": "n", "arc": "a", "graph": "g"}


class Predictor:
    """Fixed-shape compiled inference endpoint around a trained model.

    ``max_nodes`` / ``max_arcs`` / ``max_graphs`` define the padded request
    template; every request is merged + padded to it, so the forward is
    compiled exactly once (call :meth:`warmup` to pay that cost ahead of the
    first request).  Requests that overflow the template raise.

    ``fused=True`` routes the unfolding through the whole-unfold Pallas
    kernel (one kernel launch per request instead of one op-graph walk) —
    valid for dim_state==0, threshold==0, single-Dense state nets and
    requests whose graphs each fit inside a 128-node tile; requests that
    don't fall back to the XLA path with identical output contract
    (``fused='auto'`` never raises; ``fused=True`` raises when the MODEL is
    not fusable).
    """

    def __init__(
        self,
        model,
        max_nodes: int,
        max_arcs: int,
        max_graphs: int,
        aggregation_mode: str = "average",
        # 'auto' (default): serve through the transposed whole-unfold Pallas
        # kernel whenever the model is fusable — measured faster than the
        # XLA path at every request size (BASELINE.md) — and fall back
        # silently otherwise.  True requires fusability; False forces XLA.
        fused: object = "auto",
        tiles_per_step: int = 8,  # legacy row-major fused_unfold knob; the
        # transposed production kernel blocks at ops/fused.py K_TILES
        dims: Optional[Tuple[int, int, int]] = None,
        warmup_graph: Optional[GraphObject] = None,
    ) -> None:
        model.build()
        self.model = model
        # LGNN stacks expose the focus through their first layer
        named = model.gnns[0] if hasattr(model, "gnns") else model
        self.focus = _FOCUS_OF_NAME.get(getattr(named, "name", "node"), "n")
        self.aggregation_mode = aggregation_mode
        self.max_nodes = _round_up(int(max_nodes), 128)
        self.max_arcs = _round_up(int(max_arcs), 8)
        self.max_graphs = int(max_graphs)
        self.tiles_per_step = int(tiles_per_step)
        self.dims = dims  # (dim_node_label, dim_arc_label, dim_target), for warmup
        self._warmup_graph = warmup_graph  # a real sample (composite models need one)

        self._folded = None
        if fused:
            folded = getattr(model, "fold_transition", lambda v: None)(model.variables)
            ok = folded is not None and float(model.state_threshold) == 0.0
            if not ok and fused is True:
                raise ValueError(
                    "fused=True requires dim_state==0, threshold==0 and a single-Dense state net"
                )
            # no template-size gate: the transposed whole-unfold kernel
            # (ops/fused.py fused_unfold_t) beats the XLA path at every
            # measured request size (3.9-7.6x, BASELINE.md round-3 serving
            # table) — the round-2 >16-tile inversion was the row-major
            # kernel's d=14→128 lane padding
            self._folded = folded if ok else None
        self.fused = self._folded is not None

        self._xla_step = None
        self._fused_step = None

    @classmethod
    def for_graphs(
        cls, model, sample_graphs: Sequence[GraphObject], batch_size: int,
        headroom: float = 1.0, **kwargs,
    ) -> "Predictor":
        """Size the template from representative graphs: the ``batch_size``
        largest sample graphs define the node/arc budget (× ``headroom``)."""
        nodes = sorted((g.nodes.shape[0] for g in sample_graphs), reverse=True)
        arcs = sorted((g.arcs.shape[0] for g in sample_graphs), reverse=True)
        n = int(sum(nodes[:batch_size]) * headroom)
        a = int(sum(arcs[:batch_size]) * headroom)
        agg = kwargs.pop("aggregation_mode", sample_graphs[0].aggregation_mode)
        g0 = sample_graphs[0]
        dims = kwargs.pop("dims", (g0.nodes.shape[1], g0.DIM_ARC_LABEL, g0.DIM_TARGET))
        kwargs.setdefault("warmup_graph", g0)
        return cls(model, n, a, batch_size, aggregation_mode=agg, dims=dims, **kwargs)

    # -- request batching ------------------------------------------------------
    def _merge(self, graphs: Sequence[GraphObject]) -> GraphObject:
        if len(graphs) > self.max_graphs:
            raise ValueError(f"request has {len(graphs)} graphs > template {self.max_graphs}")
        # dispatch on the request's class: CompositeGraphObject.merge keeps
        # the type_mask the composite models' forward requires
        merged = type(graphs[0]).merge(list(graphs), focus=self.focus, aggregation_mode=self.aggregation_mode)
        n, a = merged.nodes.shape[0], merged.arcs.shape[0]
        if n > self.max_nodes or a > self.max_arcs:
            raise ValueError(
                f"request ({n} nodes, {a} arcs) overflows template ({self.max_nodes}, {self.max_arcs})"
            )
        return merged

    # -- compiled steps ----------------------------------------------------------
    def _xla(self):
        if self._xla_step is None:
            from gnnkeras_tpu.training.trainer import _is_lgnn

            model = self.model
            lgnn = _is_lgnn(model)

            def step(params, mstate, batch, rng):
                variables = {"params": params, "state": mstate}
                # dim_state>0 draws the random state init from ``rng``
                # (reference GNN.py:257); dim_state==0 ignores it
                _, _, out, out_mask, _ = model.forward(variables, batch, training=False, rng=rng)
                if lgnn:  # LGNN forward returns per-layer outputs; serve the last
                    out = out[-1]
                return out, out_mask

            self._xla_step = jax.jit(step)
        return self._xla_step

    def _fused(self):
        if self._fused_step is None:
            from gnnkeras_tpu.ops.fused import FusedDiagOperator, fused_unfold_t

            model = self.model
            act = self._folded[4]  # architecture-static; weights ride as args

            def step(params, mstate, batch, blocks, nodes_t, agg_arcs_t):
                variables = {"params": params, "state": mstate}
                # fold the live weights INSIDE the trace: serves post-
                # construction weight updates like the XLA path, without the
                # ~6 un-jitted per-request device launches a host-side fold
                # would dispatch on this latency-critical path
                w_state, w_agg, w_arc, bias, _ = model.fold_transition(variables)
                op = FusedDiagOperator(blocks=blocks, tile=128)
                # transposed whole-unfold (ops/fused.py round 3): state rides
                # feature-major so every MXU pass is lane-full — the row-major
                # kernel's d=14→128 lane padding was why it inverted vs XLA
                # above ~16 tiles (BASELINE.md round-2 serving table).
                # nodes_t / agg_arcs_t arrive HOST-pre-transposed (built per
                # request anyway); padding the tiny (da, h) folded weight
                # instead of the (N, h) const keeps the in-jit prologue to
                # two d×d-scale ops (~1 us off the 1-molecule latency).
                h = bias.shape[0]
                d_pad = nodes_t.shape[0]
                w_arc_p = jnp.pad(w_arc, ((0, 0), (0, d_pad - h)))
                bias_p = jnp.pad(bias, (0, d_pad - h))
                const_t = w_arc_p.T @ agg_arcs_t + bias_p[:, None]
                state_t = fused_unfold_t(
                    nodes_t, const_t, w_state, w_agg, op, model.max_iteration, act,
                )
                state = state_t.T[:, :h]
                out, out_mask, _ = model.apply_output(variables, state, batch, training=False, rng=None)
                return out, out_mask

            self._fused_step = jax.jit(step)
        return self._fused_step

    def _uniform_operators(self, batch):
        """Pad the request's data-dependent BCSR block counts to the
        template-wide caps so the jitted steps compile once, not per request
        topology (see graph/batch.py pad_operators_to_cap)."""
        from gnnkeras_tpu.graph.batch import pad_operators_to_cap

        return pad_operators_to_cap(batch)

    # -- inference ---------------------------------------------------------------
    def __call__(self, graphs) -> np.ndarray:
        """Outputs for every supervised (set∧output) entity, rows in the
        caller's (graph, entity) order — the contract of
        ``training.trainer.predict``."""
        if isinstance(graphs, GraphObject):
            graphs = [graphs]
        merged = self._merge(graphs)
        if self.fused:
            res = self._predict_fused(merged)
            if res is not None:
                return res
        return self._predict_xla(merged)

    def _predict_xla(self, merged: GraphObject) -> np.ndarray:
        batch = self._uniform_operators(from_graph_object(
            merged, pad_nodes=self.max_nodes, pad_arcs=self.max_arcs,
            # always the TEMPLATE graph count: per-request counts would vary
            # the padded shapes and recompile the step per request size
            pad_graphs=self.max_graphs,
        ))
        out, _ = self._xla()(
            self.model.variables["params"], self.model.variables["state"], batch,
            self.model.next_rng(),
        )
        return np.asarray(out)[batch.host_pred_rows]

    def _predict_fused(self, merged: GraphObject) -> Optional[np.ndarray]:
        from gnnkeras_tpu.ops.fused import build_fused_diag_t

        try:
            batch = from_graph_object(
                merged, pad_nodes=self.max_nodes, pad_arcs=self.max_arcs,
                # compact slot rows when tile-packing applies (focus 'g');
                # otherwise the template graph count keeps shapes uniform
                pad_graphs=None if self.focus == "g" else self.max_graphs,
                tile_pack=True,
                # template-uniform compact metadata: without these the slot
                # width / span count (STATIC shapes) vary per request mix and
                # every new composition pays a fresh XLA compile
                compact_gmax=self.max_graphs,
                compact_nspan=self.max_nodes // 128 + 1,
            )
        except ValueError:  # packing gaps overflow the template → XLA path
            return None
        batch = self._uniform_operators(batch)
        a = merged.arcs.shape[0]
        op = build_fused_diag_t(
            np.asarray(batch.arc_src)[:a], np.asarray(batch.arc_dst)[:a],
            np.asarray(batch.arcnode_weight)[:a], batch.num_nodes,
            dtype=jnp.bfloat16,
        )
        if op is None:  # an edge crosses tiles → XLA fallback (same contract)
            return None
        from gnnkeras_tpu.ops.fused import D_SUB

        # host-side transposed/padded inputs for the transposed kernel (the
        # batch is freshly built per request anyway, so this is free)
        d = batch.nodes.shape[1]
        h = self._folded[3].shape[0]  # folded bias width = state width
        d_pad = -(-max(d, h) // D_SUB) * D_SUB
        nodes_t = np.zeros((d_pad, batch.num_nodes), dtype=np.asarray(batch.nodes).dtype)
        nodes_t[:d] = np.asarray(batch.nodes).T
        agg_arcs_t = np.ascontiguousarray(np.asarray(batch.agg_arc_labels).T)
        # the step folds the live variables inside the trace, so weight
        # updates after construction are served (like the XLA path)
        out, _ = self._fused()(
            self.model.variables["params"], self.model.variables["state"], batch, op.blocks,
            nodes_t, agg_arcs_t,
        )
        # host_pred_rows undoes the tile-pack permutation (graph/batch.py)
        return np.asarray(out)[batch.host_pred_rows]

    # -- warmup ------------------------------------------------------------------
    def _synthetic_graph(self, dn: int, da: int, dt: int) -> GraphObject:
        """A minimal 2-node, 2-arc, tile-local graph with the template's
        feature dims — valid for both the XLA and the fused path."""
        nodes = np.zeros((2, dn), dtype=np.float32)
        nodes[:, 0] = 1.0
        arcs = np.zeros((2, 2 + da), dtype=np.float32)
        arcs[0, :2] = [0, 1]
        arcs[1, :2] = [1, 0]
        n_t = 1 if self.focus == "g" else 2
        return GraphObject(
            nodes=nodes, arcs=arcs, targets=np.zeros((n_t, dt), dtype=np.float32),
            focus=self.focus, aggregation_mode=self.aggregation_mode,
        )

    def _warm_with(self, g: GraphObject) -> None:
        merged = self._merge([g])
        fused_compiled = self.fused and self._predict_fused(merged) is not None
        # ALWAYS compile the XLA path: it is the only path when fused is off
        # and the fallback for fused-ineligible requests when it is on
        self._predict_xla(merged)
        if self.fused and not fused_compiled:
            # the warmup graph itself was fused-INELIGIBLE (tile-crossing
            # edge / packing overflow) — warm the kernel with a synthetic
            # tile-local graph so no production request pays its compile
            dn = g.nodes.shape[1]
            tiny = self._synthetic_graph(dn, int(g.DIM_ARC_LABEL), int(g.DIM_TARGET))
            self._predict_fused(self._merge([tiny]))

    def warmup(self) -> "Predictor":
        """Trigger compilation for the template shape with a synthetic
        request — BOTH the primary and the fallback path when the fused
        kernel is enabled — so the first real request pays no compile
        latency.  A ``warmup_graph`` (auto-set by ``for_graphs``) is used
        when available — composite models need one for the type layout."""
        if self._warmup_graph is not None:
            self._warm_with(self._warmup_graph)
            return self
        named = self.model.gnns[0] if hasattr(self.model, "gnns") else self.model
        if isinstance(named.net_state, list):
            raise ValueError("composite Predictor warmup needs warmup_graph (use for_graphs)")
        if self.dims is None:
            raise ValueError("warmup needs dims=(dn, da, dt) — or build via for_graphs")
        dn, da, dt = self.dims
        self._warm_with(self._synthetic_graph(dn, da, dt))
        return self


# -----------------------------------------------------------------------------
# Portable export (jax.export / StableHLO)
# -----------------------------------------------------------------------------


def export_forward(model, template_batch: GraphBatch, path: str) -> None:
    """Serialize the eval forward for ``template_batch``'s shapes as a
    versioned StableHLO artifact + trained parameters + metadata.

    Layout: ``forward.jaxexport`` (serialized ``jax.export`` bytes),
    ``params.npz`` (flattened variables), ``serving.json``.  Load via
    :func:`load_exported`; call with any same-shape ``GraphBatch``."""
    from jax import export as jexport

    model.build()
    flat_v, vtd = jax.tree_util.tree_flatten(model.variables)
    flat_b, btd = jax.tree_util.tree_flatten(template_batch)

    def fn(fv, fb):
        v = jax.tree_util.tree_unflatten(vtd, fv)
        b = jax.tree_util.tree_unflatten(btd, fb)
        _, _, out, out_mask, _ = model.forward(v, b, training=False, rng=None)
        if isinstance(out, (list, tuple)):  # LGNN: serve the last layer
            out = out[-1]
        return out, out_mask

    exported = jexport.export(jax.jit(fn))(flat_v, flat_b)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "forward.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    np.savez(
        os.path.join(path, "params.npz"),
        **{f"p{i}": np.asarray(x) for i, x in enumerate(flat_v)},
    )
    meta = {
        "n_params": len(flat_v),
        "model_class": type(model).__name__,
        "focus": _FOCUS_OF_NAME.get(getattr(model, "name", "node"), "n"),
        "batch_shapes": [list(np.shape(x)) for x in flat_b],
    }
    with open(os.path.join(path, "serving.json"), "w") as f:
        json.dump(meta, f)


class ExportedForward:
    """A deserialized forward: ``call(batch)`` → (out, out_mask) for any
    batch with the template shapes; parameters baked in from the artifact."""

    def __init__(self, exported, params: List[np.ndarray], meta: dict):
        self._exported = exported
        self._params = [jnp.asarray(p) for p in params]
        self.meta = meta

    def call(self, batch: GraphBatch):
        flat_b, _ = jax.tree_util.tree_flatten(batch)
        return self._exported.call(self._params, flat_b)


def load_exported(path: str) -> ExportedForward:
    from jax import export as jexport

    with open(os.path.join(path, "forward.jaxexport"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(path, "serving.json")) as f:
        meta = json.load(f)
    z = np.load(os.path.join(path, "params.npz"))
    params = [z[f"p{i}"] for i in range(meta["n_params"])]
    return ExportedForward(exported, params, meta)


# -----------------------------------------------------------------------------
# Request coalescing (micro-batching)
# -----------------------------------------------------------------------------


class MicroBatcher:
    """Coalesces CONCURRENT requests in front of a :class:`Predictor`.

    Production serving sends many small independent requests; dispatching each
    as its own device launch wastes the accelerator (per-program dispatch
    dominates at small sizes — see BASELINE.md serving-latency table).  A
    background worker drains the request queue, merges up to ``max_graphs``
    graphs (never splitting a request) or waits at most ``max_delay_ms`` after
    the first queued request, and serves the whole micro-batch in ONE
    compiled launch; each caller gets back exactly its own rows.

    Thread-safe: call :meth:`submit` (returns a ``Future``) or ``__call__``
    (blocks) from any number of client threads.  Requests that overflow the
    predictor template individually still fail with their own exception
    without poisoning the rest of the batch.
    """

    def __init__(self, predictor: Predictor, max_delay_ms: float = 2.0,
                 max_graphs: Optional[int] = None):
        import queue
        import threading

        self.predictor = predictor
        self.max_delay = float(max_delay_ms) / 1e3
        self.max_graphs = int(max_graphs or predictor.max_graphs)
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        # serializes the closed-check-then-put in submit() against close()'s
        # closed-set-then-sentinel: every accepted request is enqueued BEFORE
        # the shutdown sentinel (FIFO), so the worker or close()'s drain
        # always resolves it — no put can land after the final drain
        self._submit_lock = threading.Lock()
        self.launches = 0  # served micro-batches (telemetry / tests)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side -----------------------------------------------------------
    def submit(self, graphs):
        """Enqueue a request (one GraphObject or a list); returns a Future
        resolving to the per-entity output rows in the request's order."""
        from concurrent.futures import Future

        if isinstance(graphs, GraphObject):
            graphs = [graphs]
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.put((list(graphs), fut))
        return fut

    def __call__(self, graphs):
        return self.submit(graphs).result()

    def close(self) -> None:
        with self._submit_lock:
            self._closed = True
            self._queue.put(None)
        self._worker.join(timeout=10)
        # a submit() that won the lock race is enqueued ahead of the sentinel;
        # anything the exiting worker left behind is failed here
        import queue as _q

        while True:
            try:
                item = self._queue.get_nowait()
            except _q.Empty:
                return
            if item is not None:
                self._deliver(item[1], exc=RuntimeError("MicroBatcher is closed"))

    # -- worker side -----------------------------------------------------------
    def _collect(self):
        """One micro-batch: [(graphs, future), ...] within the size budget."""
        import queue as _q
        import time

        item = self._queue.get()
        if item is None:
            return None
        batch = [item]
        total = len(item[0])
        deadline = time.monotonic() + self.max_delay
        while total < self.max_graphs:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._queue.get(timeout=timeout)
            except _q.Empty:
                break
            if item is None:
                self._queue.put(None)  # keep the shutdown signal
                break
            if total + len(item[0]) > self.max_graphs:
                self._queue.put(item)  # doesn't fit — next micro-batch
                break
            batch.append(item)
            total += len(item[0])
        return batch

    def _rows_per_request(self, batch):
        focus = self.predictor.focus
        counts = []
        for graphs, _ in batch:
            if focus == "g":
                counts.append(sum(g.targets.shape[0] for g in graphs))
            else:
                counts.append(int(sum(
                    np.logical_and(g.set_mask, g.output_mask).sum() for g in graphs
                )))
        return counts

    @staticmethod
    def _deliver(fut, result=None, exc=None) -> None:
        """Resolve a future without letting a client-side ``cancel()`` kill
        the worker (set_result on a cancelled future raises)."""
        if not fut.set_running_or_notify_cancel():
            return  # client cancelled — drop the result
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                break
            # skip requests the client already cancelled (also claims the
            # future so a late cancel cannot race the delivery below)
            batch = [(g, f) for g, f in batch if f.set_running_or_notify_cancel()]
            if not batch:
                continue
            all_graphs = [g for graphs, _ in batch for g in graphs]
            try:
                out = self.predictor(all_graphs)
                self.launches += 1
                counts = self._rows_per_request(batch)
                off = 0
                for (graphs, fut), n in zip(batch, counts):
                    fut.set_result(out[off: off + n])
                    off += n
            except Exception:
                # one oversized/bad request must not poison the others:
                # serve each request alone, failing only its own future
                for graphs, fut in batch:
                    try:
                        fut.set_result(self.predictor(graphs))
                        self.launches += 1
                    except Exception as exc:  # noqa: BLE001
                        fut.set_exception(exc)
        # drain anything enqueued behind the shutdown sentinel (a submit
        # racing close()) so no caller blocks on an unresolved future
        import queue as _q

        while True:
            try:
                item = self._queue.get_nowait()
            except _q.Empty:
                return
            if item is not None:
                self._deliver(item[1], exc=RuntimeError("MicroBatcher is closed"))
