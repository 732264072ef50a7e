"""Molecule-granular ('packed') partitioning for merged graph-focused batches.

The flagship workload (a merged molecule batch, focus='g') is a DISJOINT
UNION: no edge ever connects two member graphs.  Partitioning it at graph
granularity therefore has ZERO halo — each device holds whole molecules and
runs the unmodified single-chip engine (slot packing, compact-strip Pallas
aggregation, transposed unfold, CompactReadout) on its shard.  The only
cross-device traffic is three scalars-per-leaf worth of psums: BatchNorm
moments (so training statistics span the union batch), the convergence
predicate (so the mesh agrees on the trip count), and the loss sums.

This is the TPU-native answer to the reference's single-process
``NodeGraphᵀ·out`` readout (GNN/Models/GNN.py:341-346) at multi-chip scale:
range-sharding a disjoint union (parallel/partition.py) pays exchanges it
never needed.  ``partition_graph`` remains the tool for graphs that are NOT
disjoint unions (one huge connected graph).

Exactness: the union of per-device masked BN sums equals the merged batch's
sums, the pmax'd predicate equals the merged predicate, and the psum'd
masked loss sums equal the merged loss — so training here IS single-chip
training on the merged batch, up to f32 reduction order
(``TestPackedPartitionedEqualsSingle``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gnnkeras_tpu.graph.batch import GraphBatch, from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.utils.dtypes import floatx


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def balance_graphs(sizes: np.ndarray, n_parts: int) -> List[np.ndarray]:
    """Greedy LPT: assign graphs (largest first) to the least-loaded part.
    Returns per-part graph-id arrays in ascending id order (deterministic)."""
    sizes = np.asarray(sizes, dtype=np.int64)
    order = np.argsort(-sizes, kind="stable")
    loads = np.zeros(n_parts, dtype=np.int64)
    groups: List[list] = [[] for _ in range(n_parts)]
    for g in order:
        p = int(np.argmin(loads))
        groups[p].append(int(g))
        loads[p] += sizes[g]
    return [np.array(sorted(grp), dtype=np.int64) for grp in groups]


def split_merged_by_graph(g: GraphObject, graph_ids: np.ndarray) -> GraphObject:
    """The sub-GraphObject holding exactly ``graph_ids``'s molecules (nodes,
    arcs, per-graph targets), with graph ids relabeled 0..len(ids)-1.
    Node relative order (and hence within-graph arc structure) is preserved;
    ``arcnode_weight`` values are identical because every weight is a
    function of within-graph structure only (disjoint union).  Composite
    merged batches keep their node-type structure (type_mask rows travel
    with the selected nodes; per-type label dims are global)."""
    if g.focus != "g":
        raise ValueError("split_merged_by_graph is for merged graph-focused batches")
    graph_ids = np.asarray(graph_ids, dtype=np.int64)
    gid_new = np.full(int(g.graph_of_node.max()) + 1, -1, dtype=np.int64)
    gid_new[graph_ids] = np.arange(len(graph_ids))
    node_sel = gid_new[g.graph_of_node] >= 0
    node_new = np.cumsum(node_sel) - 1  # new id of each kept node

    src = g.arcs[:, 0].astype(np.int64)
    arc_sel = node_sel[src]  # disjoint union: src kept ⟺ dst kept
    arcs = g.arcs[arc_sel].copy()
    arcs[:, 0] = node_new[arcs[:, 0].astype(np.int64)]
    arcs[:, 1] = node_new[arcs[:, 1].astype(np.int64)]

    kwargs = dict(
        nodes=g.nodes[node_sel],
        arcs=arcs,
        targets=g.targets[graph_ids],
        focus="g",
        set_mask=g.set_mask[node_sel],
        output_mask=g.output_mask[node_sel],
        sample_weight=g.sample_weight[graph_ids],
        NodeGraph=(gid_new[g.graph_of_node[node_sel]], g.nodegraph_weight[node_sel]),
        aggregation_mode=g.aggregation_mode,
    )
    if getattr(g, "type_mask", None) is not None:
        from gnnkeras_tpu.graph.graph import CompositeGraphObject

        return CompositeGraphObject(
            type_mask=g.type_mask[node_sel],
            dim_node_label=tuple(int(d) for d in g.DIM_NODE_LABEL),
            **kwargs,
        )
    return GraphObject(**kwargs)


@dataclasses.dataclass(frozen=True)
class PackedPartitionMeta:
    """Host-side bookkeeping for mapping device-sharded outputs back to the
    caller's graph order."""

    groups: List[np.ndarray]  # per-device original graph ids
    pred_rows: List[np.ndarray]  # per-device host_pred_rows (slot rows of its graphs)
    n_graphs: int


def partition_packed(
    g: GraphObject,
    n_parts: int,
    slot_pack: int = 128,
    strip_dtype: str = "int8",
) -> Tuple[GraphBatch, PackedPartitionMeta]:
    """Split a merged focus-'g' batch into ``n_parts`` balanced groups of
    WHOLE graphs and build the per-device single-chip batches (slot packing +
    strip operator + CompactReadout), stacked along a leading device axis.

    ``strip_dtype`` defaults to ``'int8'`` — the flagship single-chip
    storage (GNNConfig default; BASELINE.md round 4).  Per-device
    factorability differences downgrade COLLECTIVELY to dense storage below
    so the stacked pytree keeps one structure.

    Shapes are made uniform across devices (max-tile node pad, max arc pad,
    shared compact g_max/span caps) so the stacked pytree shard_maps cleanly.
    Raises when any group's packing produces cross-tile residual edges with
    differing structure — use ``partition_graph`` (range sharding) for
    non-disjoint workloads."""
    if g.focus != "g":
        raise ValueError("partition_packed is for merged graph-focused batches")
    n_graphs = max(g.num_graphs, 1)
    if n_graphs < n_parts:
        raise ValueError(f"{n_graphs} graphs cannot fill {n_parts} devices")
    sizes = np.bincount(g.graph_of_node.astype(np.int64), minlength=n_graphs)
    groups = balance_graphs(sizes, n_parts)
    subs = [split_merged_by_graph(g, ids) for ids in groups]

    # uniform caps: every device's batch must share ONE padded shape
    from gnnkeras_tpu.graph.packing import pack_slots

    tiles, arcs, gmaxes = [], [], []
    for sub in subs:
        s_sizes = np.bincount(sub.graph_of_node.astype(np.int64), minlength=sub.num_graphs)
        _, rows = pack_slots(s_sizes, slot=slot_pack, tile=128)
        tiles.append(_round_up(max(rows, 128), 128) // 128)
        arcs.append(sub.arcs.shape[0])
        from gnnkeras_tpu.graph.packing import graph_slots_from_starts

        starts, _ = pack_slots(s_sizes, slot=slot_pack, tile=128)
        _, _, _, g_max, spanning = graph_slots_from_starts(starts, s_sizes, 128)
        gmaxes.append((g_max, int(np.sum(spanning)) if spanning is not None else 0))
    t_uniform = max(tiles)
    a_uniform = _round_up(max(arcs), 8)
    gmax_uniform = max(gm for gm, _ in gmaxes)
    nspan_uniform = max(sp for _, sp in gmaxes) + 1

    batches = [
        from_graph_object(
            sub,
            pad_nodes=t_uniform * 128,
            pad_arcs=a_uniform,
            slot_pack=slot_pack,
            strip_dtype=strip_dtype,
            compact_gmax=gmax_uniform,
            compact_nspan=nspan_uniform,
        )
        for sub in subs
    ]
    for b in batches:
        if b.strip is None or b.compact_readout is None:
            raise ValueError("packed partition requires the strip + compact-readout path")
    r0 = batches[0].strip.residual
    if any((b.strip.residual is None) != (r0 is None) for b in batches):
        raise ValueError(
            "inconsistent cross-tile residual structure across devices — "
            "use partition_graph (range sharding) for this workload"
        )
    # int8 mask+scale factorability can differ per device group (parallel
    # arcs land on one shard only); stacking needs ONE pytree — downgrade all
    if any(b.strip.scale is None for b in batches) and any(
        b.strip.scale is not None for b in batches
    ):
        from gnnkeras_tpu.ops.strip import strip_to_dense

        for i, b in enumerate(batches):
            if b.strip.scale is not None:
                rows = b.host_pred_rows
                nb = b.replace(strip=strip_to_dense(b.strip))
                object.__setattr__(nb, "host_pred_rows", rows)
                batches[i] = nb

    pred_rows = [np.asarray(b.host_pred_rows) for b in batches]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    meta = PackedPartitionMeta(groups=groups, pred_rows=pred_rows, n_graphs=n_graphs)
    return stacked, meta


class PackedPartitionedGNN:
    """Runs a single-GNN model (node/arc/graph focused, homogeneous or
    composite) over a ``partition_packed`` batch: the unmodified single-chip
    forward per device under ``shard_map``, with BN moments / convergence
    predicate / loss sums psum'd over the mesh axis (models/gnn.py
    ``axis_name`` threading)."""

    def __init__(self, gnn, mesh, axis: str = "graph"):
        from gnnkeras_tpu.parallel.mesh import make_mesh

        if hasattr(gnn, "gnns"):
            raise ValueError(
                "PackedPartitionedGNN wraps single GNN models — use "
                "PackedPartitionedLGNN for layered stacks"
            )
        self.gnn = gnn
        self.axis = axis
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.n_devices = self.mesh.shape[axis]
        self._cache = {}

    # -- local (per-device) compute --------------------------------------------
    def _local_forward(self, params, mstate, batch, rng, training):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # strip device axis
        # per-device dropout/state-init keys must differ; BN moments and the
        # predicate are psum'd inside, so this is the ONLY per-device rng use
        rng = jax.random.fold_in(rng, jax.lax.axis_index(self.axis))
        k, state, out, out_mask, new_mstate = self.gnn.forward(
            {"params": params, "state": mstate}, batch,
            training=training, rng=rng, axis_name=self.axis,
        )
        return k, state, out, out_mask, new_mstate, batch

    def _metric_sums(self, b, out):
        """Per-metric (sum, count) pairs psum'd over the mesh — the union of
        per-device masked sums equals the merged batch's metric exactly."""
        from gnnkeras_tpu.training.metrics import get_metric

        sums = {}
        for spec in self.gnn.metrics:
            name, fn = get_metric(spec)
            s, c = fn(b.targets, out, b.target_mask, b.sample_weight)
            sums[name] = (jax.lax.psum(s, self.axis), jax.lax.psum(c, self.axis))
        return sums

    def _local_loss(self, params, mstate, batch, rng, loss_fn, training):
        k, state, out, out_mask, new_mstate, b = self._local_forward(
            params, mstate, batch, rng, training
        )
        per_row = loss_fn(b.targets, out)
        m = b.target_mask.astype(per_row.dtype)
        loss_sum = jax.lax.psum(jnp.sum(per_row * b.sample_weight * m), self.axis)
        count = jax.lax.psum(jnp.sum(m), self.axis)
        loss = loss_sum / jnp.maximum(count, 1.0) + self.gnn.regularization_loss(params)
        return loss, (k, out, new_mstate, count, self._metric_sums(b, out))

    # -- jitted entry points -----------------------------------------------------
    def make_forward(self, training: bool = False):
        key = f"fwd_{training}"
        if key in self._cache:
            return self._cache[key]
        axis = self.axis

        def device_fwd(params, mstate, batch, rng):
            k, state, out, out_mask, new_mstate, _ = self._local_forward(
                params, mstate, batch, rng, training
            )
            return k, state[None], out[None], out_mask[None], new_mstate

        fn = jax.jit(shard_map(
            device_fwd,
            mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(axis), P(axis), P(axis), P()),
            check_vma=False,
        ))
        self._cache[key] = fn
        return fn

    def forward(self, batch, training: bool = False, rng=None):
        """(k, state (D,N,d), out (D,R,T), out_mask (D,R), new_mstate)."""
        self.gnn.build()
        if rng is None:
            rng = self.gnn.next_rng()
        return self.make_forward(training)(
            self.gnn.variables["params"], self.gnn.variables["state"], batch, rng
        )

    def _make_sharded_step(self):
        if "sharded_train" in self._cache:
            return self._cache["sharded_train"]
        gnn, axis = self.gnn, self.axis
        loss_fn = gnn.loss
        if loss_fn is None:
            raise RuntimeError("call gnn.compile() before building the packed train step")

        def device_step(params, mstate, opt_state, batch, rng):
            (loss, (k, out, new_mstate, count, msums)), grads = jax.value_and_grad(
                lambda p: self._local_loss(p, mstate, batch, rng, loss_fn, True), has_aux=True
            )(params)
            # same structure as parallel/partition.py device_step: every
            # device's loss is the (psum'd) global L, so pmean of the
            # per-device grads recovers the exact single-device gradient
            grads = jax.lax.pmean(grads, axis)
            if gnn.average_st_grads:
                grads = gnn.scale_state_grads(grads, k)
            updates, opt_state = gnn.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # LGNN stacks carry one trip count per layer — log the mean
            # (identity for the single-model scalar)
            logs = {"loss": loss, "k": jnp.mean(jnp.asarray(k))}
            for name, (s, c) in msums.items():
                logs[f"{name}_sum"] = s
                logs[f"{name}_count"] = c
            return params, new_mstate, opt_state, logs

        sharded = shard_map(
            device_step,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(self.axis), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        self._cache["sharded_train"] = sharded
        return sharded

    def make_train_step(self):
        if "train" in self._cache:
            return self._cache["train"]
        step = jax.jit(self._make_sharded_step(), donate_argnums=(0, 1, 2))
        self._cache["train"] = step
        return step

    def make_multi_step(self):
        """K epochs in ONE launch (full-batch training runs one step per
        epoch) — same dispatch amortization as PartitionedGNN.make_multi_step."""
        if "train_multi" in self._cache:
            return self._cache["train_multi"]
        sharded = self._make_sharded_step()

        def multi(params, mstate, opt_state, batch, rngs):
            def body(carry, rng):
                p, m, o = carry
                p, m, o, logs = sharded(p, m, o, batch, rng)
                return (p, m, o), logs

            (params, mstate, opt_state), logs = jax.lax.scan(
                body, (params, mstate, opt_state), rngs
            )
            return params, mstate, opt_state, logs

        step = jax.jit(multi, donate_argnums=(0, 1, 2))
        self._cache["train_multi"] = step
        return step

    @staticmethod
    def _epoch_logs(step_logs) -> dict:
        """Device step logs → user-facing epoch logs (metric sums reduced)."""
        out = {"loss": float(step_logs["loss"]), "k": float(step_logs["k"])}
        for key in step_logs:
            if key.endswith("_sum") and key != "loss_sum":
                name = key[:-4]
                out[name] = float(step_logs[key]) / max(
                    float(step_logs.get(f"{name}_count", 1.0)), 1e-9
                )
        return out

    def _validation_logs(self, validation_data) -> dict:
        """Validation on a packed stacked batch (this engine's evaluate) or an
        ordinary sequencer (the single-device evaluate — gnn.variables are
        synced each epoch, so both views score the same weights)."""
        if isinstance(validation_data, GraphBatch):
            logs = self.evaluate(validation_data)
        else:
            from gnnkeras_tpu.training.trainer import evaluate as seq_evaluate

            logs = seq_evaluate(self.gnn, validation_data, verbose=0)
        return {f"val_{k}": v for k, v in logs.items()}

    def fit(
        self,
        batch,
        epochs: int,
        steps_per_launch: int = 1,
        verbose: int = 0,
        *,
        validation_data=None,
        callbacks: Optional[list] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
        resume: bool = False,
        class_weight: Optional[dict] = None,
        validation_freq: int = 1,
        seed: int = 0,
    ):
        """Full-batch training on the packed partition; one step per epoch
        (the flagship protocol), with the full single-device fit surface:
        validation (a packed stacked batch or a plain sequencer), callbacks
        (History/EarlyStopping/...), resumable checkpoints and class_weight —
        same semantics as training/trainer.py fit.  Returns a History.

        ``steps_per_launch`` amortizes launches by scanning K epochs per
        dispatch; per-epoch weights then exist only at chunk boundaries, so
        requesting validation/callbacks forces it back to 1 (checkpoints
        compose with chunks: they save at cadence crossings)."""
        from gnnkeras_tpu.training.fit_loop import run_fit_loop

        gnn = self.gnn
        if gnn.loss is None:
            raise RuntimeError("call gnn.compile() before fit()")
        gnn.build(seed=seed)
        if gnn._opt_state is None:
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])

        if class_weight:
            from gnnkeras_tpu.training.trainer import (
                _apply_class_weight,
                _class_weight_vector,
            )

            # targets are (D, R, T); the class argmax broadcasts over the
            # leading device axis, so the stacked batch weights in place
            batch = _apply_class_weight(batch, _class_weight_vector(class_weight))

        # the step wants mesh-replicated trees; checkpoint restores and
        # callback mutations come back committed to one device — re-replicate
        # whenever the model view is picked up (no-op when already replicated)
        from jax.sharding import NamedSharding

        rep = NamedSharding(self.mesh, P())
        to_rep = lambda t: jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), t)

        def run_chunk(epoch, n):
            params, mstate, opt_state = to_rep((
                gnn.variables["params"], gnn.variables["state"], gnn._opt_state,
            ))
            rngs = jnp.stack([gnn.next_rng() for _ in range(n)])
            if n == 1:
                params, mstate, opt_state, logs = self.make_train_step()(
                    params, mstate, opt_state, batch, rngs[0]
                )
                chunk = [logs]
            else:
                params, mstate, opt_state, logs = self.make_multi_step()(
                    params, mstate, opt_state, batch, rngs
                )
                host = {k: np.asarray(v) for k, v in logs.items()}
                chunk = [{k: v[i] for k, v in host.items()} for i in range(n)]
            gnn.variables = {"params": params, "state": mstate}
            gnn._opt_state = opt_state
            return [self._epoch_logs(step_logs) for step_logs in chunk]

        validate = None
        if validation_data is not None:
            validate = lambda: self._validation_logs(validation_data)

        return run_fit_loop(
            gnn, epochs=epochs, run_chunk=run_chunk, chunk_size=steps_per_launch,
            validate=validate, callbacks=callbacks, verbose=verbose,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume=resume, validation_freq=validation_freq, label="epoch",
        )

    def evaluate(self, batch, meta: Optional[PackedPartitionMeta] = None):
        """Loss + compiled-metric logs over the packed partition (inference
        mode), matching trainer.evaluate's dict shape.  LGNN stacks
        (PackedPartitionedLGNN) score the last layer only (LGNN.py:167)."""
        gnn = self.gnn
        if gnn.loss is None:
            raise RuntimeError("call compile() before evaluate()")
        gnn.build()
        from gnnkeras_tpu.training.metrics import get_metric

        k, state, out, out_mask, _ = self.forward(batch, training=False)
        out = np.asarray(out)
        tm = np.asarray(batch.target_mask)
        y = np.asarray(batch.targets)[tm]
        y_pred = out[tm]
        sw = np.asarray(batch.sample_weight)[tm]
        loss = float(
            np.sum(np.asarray(gnn.loss(jnp.asarray(y), jnp.asarray(y_pred))) * sw)
            / max(tm.sum(), 1)
        ) + float(gnn.regularization_loss(gnn.variables["params"]))
        logs = {"loss": loss}
        ones = np.ones(len(y), np.float32)
        for spec in gnn.metrics:
            name, fn = get_metric(spec)
            s_, c_ = fn(jnp.asarray(y), jnp.asarray(y_pred), jnp.asarray(ones), jnp.asarray(sw))
            logs[name] = float(s_) / max(float(c_), 1.0)
        return logs

class PackedPartitionedLGNN(PackedPartitionedGNN):
    """LGNN / CompositeLGNN stacks over a ``partition_packed`` batch.

    Each device runs the UNMODIFIED layered forward (per-layer unfolding +
    ``update_graph`` feature propagation, reference LGNN.py:217-249) on its
    whole-molecule shard — feature propagation is node-local, so packing
    keeps the zero-halo property layer by layer.  Cross-device traffic stays
    the three psum families (per-layer BatchNorm moments, per-layer
    convergence predicates, the loss sums).

    Training modes follow the reference (LGNN.py:261-263): 'parallel' = mean
    of per-layer masked losses, 'residual' = loss of the mean layer output —
    each masked mean formed from psum'd sums so it equals the merged
    single-chip objective exactly.  'serial' is the reference's OUTER
    orchestration (per-layer standalone fits + host-side feature baking,
    LGNN.py:290-359) — it is not a sharded program; wrap each layer's fit in
    its own packed engine via ``training.serial.fit_serial`` instead.
    Evaluation scores the last layer only (LGNN.py:167).
    """

    def __init__(self, lgnn, mesh, axis: str = "graph"):
        from gnnkeras_tpu.parallel.mesh import make_mesh

        if not hasattr(lgnn, "gnns"):
            raise ValueError(
                "PackedPartitionedLGNN wraps LGNN stacks — use "
                "PackedPartitionedGNN for single models"
            )
        self.gnn = lgnn
        self.axis = axis
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.n_devices = self.mesh.shape[axis]
        self._cache = {}

    def _check_mode(self) -> str:
        mode = getattr(self.gnn, "training_mode", "parallel")
        if mode == "serial":
            raise ValueError(
                "serial training is the reference's outer per-layer orchestration "
                "(LGNN.py:290-359), not one sharded program — run fit_serial and "
                "wrap each layer's fit in its own packed engine"
            )
        return mode

    def _local_forward(self, params, mstate, batch, rng, training):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(self.axis))
        ks, states, outs, out_mask, new_mstate = self.gnn.forward(
            {"params": params, "state": mstate}, batch,
            training=training, rng=rng, axis_name=self.axis,
        )
        return ks, states, outs, out_mask, new_mstate, batch

    def _local_loss(self, params, mstate, batch, rng, loss_fn, training):
        mode = self._check_mode()
        ks, states, outs, out_mask, new_mstate, b = self._local_forward(
            params, mstate, batch, rng, training
        )
        m = b.target_mask.astype(floatx())
        count = jax.lax.psum(jnp.sum(m), self.axis)

        def masked(out):
            per_row = loss_fn(b.targets, out)
            s = jax.lax.psum(jnp.sum(per_row * b.sample_weight * m), self.axis)
            return s / jnp.maximum(count, 1.0)

        if training and mode == "parallel":
            data_loss = sum(masked(out) for out in outs) / len(outs)
        elif training and mode == "residual":
            data_loss = masked(sum(outs) / len(outs))
        else:
            data_loss = masked(outs[-1])
        loss = data_loss + self.gnn.regularization_loss(params)
        # metrics score the last layer's output (reference LGNN.py:279)
        return loss, (jnp.stack(ks), outs[-1], new_mstate, count,
                      self._metric_sums(b, outs[-1]))

    def make_forward(self, training: bool = False):
        key = f"fwd_{training}"
        if key in self._cache:
            return self._cache[key]
        axis = self.axis

        def device_fwd(params, mstate, batch, rng):
            ks, states, outs, out_mask, new_mstate, _ = self._local_forward(
                params, mstate, batch, rng, training
            )
            return jnp.stack(ks), states[-1][None], outs[-1][None], out_mask[None], new_mstate

        fn = jax.jit(shard_map(
            device_fwd,
            mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(axis), P(axis), P(axis), P()),
            check_vma=False,
        ))
        self._cache[key] = fn
        return fn
