"""Host-side batchers ("sequencers") feeding padded device batches.

Capability-equivalent to the reference's six ``tf.keras.utils.Sequence``
subclasses (GNN/Sequencers/GraphSequencers.py):

- multi-graph: each batch is the disjoint-union merge of a slice of graphs
  (GraphSequencers.py:42-46), shuffled and re-merged per epoch (123-127);
- single-graph: one big graph whose supervised nodes are mini-batched through
  boolean set-masks (162-166).

TPU adaptation: every emitted batch is padded to sequencer-wide bucket sizes
(monotonic across epochs), so the jitted train step compiles once and replays
for every batch and epoch.  Composite variants only change the graph class —
the padded batch carries the extra type information transparently.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence

import numpy as np

from gnnkeras_tpu.graph.batch import GraphBatch, from_graph_object
from gnnkeras_tpu.graph.graph import CompositeGraphObject, GraphObject


def _round_up(x: int, m: int) -> int:
    # clamps to at least one multiple (unlike graph/batch.py's plain
    # round-up): sequencer pads must never be zero even for empty inputs
    return max(((x + m - 1) // m) * m, m)


class MultiGraphSequencer:
    """Batches a list of GraphObjects by merging each slice into one
    disjoint-union graph (reference MultiGraphSequencer,
    GraphSequencers.py:12-127)."""

    graph_class = GraphObject

    def __init__(
        self,
        graphs: Sequence[GraphObject],
        focus: str,
        aggregation_mode: str,
        batch_size: int = 32,
        shuffle: bool = True,
        *,
        pad_multiple: int = 128,
        agg_dtype: str = None,
        shuffle_mode: str = "graphs",
        tile_pack: Optional[bool] = None,
        slot_pack: Optional[int] = None,
        strip_dtype: str = "int8",
    ):
        """``shuffle_mode='graphs'`` re-shuffles graphs into new merged batches
        each epoch (the reference's behavior, GraphSequencers.py:123-127, at
        the cost of re-merging + re-uploading); ``'batches'`` shuffles the
        order of the prebuilt batches only — no host rebuild, no re-upload.

        ``slot_pack=128`` builds each batch with the compact-strip operator
        (``strip_dtype`` storage), routing training through the transposed
        (feature-major) unfold engine — the flagship kernel stack
        (BASELINE.md round 3).  Residual/readout structure is made uniform
        across batches so the compiled step and the scanned-epoch launch see
        ONE pytree.  Sub-128 slot widths have batch-composition-dependent
        mixed-format layouts; build those via graph.batch.from_graph_object."""
        assert shuffle_mode in ("graphs", "batches")
        if slot_pack is not None and slot_pack != 128:
            raise ValueError(
                "sequencers support slot_pack=128 (uniform per-batch layout); "
                "use from_graph_object for 32/64-slot mixed formats"
            )
        # tile packing permutes node rows (loss/metric-invariant;
        # ``predict`` restores the caller's row order via host_pred_rows) —
        # default on for every focus: the packed layout is what the fast
        # BCSR/strip operators want (BASELINE.md round 5 focus sweep).
        self.tile_pack = True if tile_pack is None else bool(tile_pack)
        if slot_pack is not None:
            self.tile_pack = True  # slot packing subsumes tile packing
        self.slot_pack = slot_pack
        self.strip_dtype = strip_dtype
        self.data: List[GraphObject] = list(graphs) if isinstance(graphs, (list, tuple)) else [graphs]
        self.focus = focus
        self.aggregation_mode = aggregation_mode
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.pad_multiple = int(pad_multiple)
        self.agg_dtype = agg_dtype
        self.shuffle_mode = shuffle_mode
        self._pad_nodes = 0
        self._pad_arcs = 0
        self._pad_graphs = 0
        self.build_batches()

    # -- batching -------------------------------------------------------------
    def build_batches(self) -> None:
        merged = [
            self.graph_class.merge(
                self.data[i * self.batch_size : (i + 1) * self.batch_size],
                focus=self.focus,
                aggregation_mode=self.aggregation_mode,
            )
            for i in range(len(self))
        ]
        # monotonic sequencer-wide pads: one compiled step for all epochs.
        # the compact readout engages only when node pads stay 128-aligned
        # (from_graph_object requires N % 128 == 0) — otherwise keep the
        # uniform _pad_graphs so batch shapes never vary.
        compact = self.tile_pack and self.focus == "g" and self.pad_multiple % 128 == 0
        if self.tile_pack:
            from gnnkeras_tpu.graph.packing import (
                graph_slots_from_starts,
                pack_slots,
                packed_graph_slots,
                packed_node_positions,
            )

            slot = getattr(self, "slot_pack", None)
            if slot is not None:
                # the slot-packed layout from_graph_object will use — the
                # pad must cover ITS row count, not tile packing's
                needed = 0
                for g in merged:
                    sizes = np.bincount(g.graph_of_node.astype(np.int64), minlength=g.num_graphs)
                    needed = max(needed, pack_slots(sizes, slot=slot, tile=128)[1])
            else:
                needed = max(packed_node_positions(g.graph_of_node)[1] for g in merged)
            if compact:
                # uniform compact-readout slot width (graph rows = tile·Gmax+rank)
                # and span-slot count: both are STATIC batch metadata
                g_max, n_span = 0, 1
                for g in merged:
                    sizes = np.bincount(g.graph_of_node.astype(np.int64), minlength=g.num_graphs)
                    if slot is not None:
                        starts, _ = pack_slots(sizes, slot=slot, tile=128)
                        slots = graph_slots_from_starts(starts, sizes, 128)
                    else:
                        slots = packed_graph_slots(sizes)
                    g_max = max(g_max, slots[3])
                    n_span = max(n_span, int(np.sum(slots[4])) + 1)
                self._compact_gmax = max(getattr(self, "_compact_gmax", 0), g_max)
                self._compact_nspan = max(getattr(self, "_compact_nspan", 0), n_span)
        else:
            needed = max(g.nodes.shape[0] for g in merged)
        self._pad_nodes = max(self._pad_nodes, _round_up(needed, self.pad_multiple))
        self._pad_arcs = max(
            self._pad_arcs, _round_up(max(g.arcs.shape[0] for g in merged), self.pad_multiple)
        )
        self._pad_graphs = max(self._pad_graphs, _round_up(max(g.num_graphs for g in merged), 8))
        self.batches: List[GraphBatch] = [
            from_graph_object(
                g, self._pad_nodes, self._pad_arcs,
                None if compact else self._pad_graphs,
                agg_dtype=self.agg_dtype, tile_pack=self.tile_pack,
                slot_pack=getattr(self, "slot_pack", None),
                strip_dtype=getattr(self, "strip_dtype", "int8"),
                compact_gmax=self._compact_gmax if compact else None,
                compact_nspan=self._compact_nspan if compact else None,
            )
            for g in merged
        ]
        self._uniform_block_counts()
        if getattr(self, "slot_pack", None) is not None:
            self._uniform_strip()

    def _uniform_block_counts(self) -> None:
        """BCSR block counts are data-dependent STATIC shapes; pad them to a
        sequencer-wide (monotonic) maximum so every batch shares one pytree
        structure — stacking for data parallelism and the compile-once step
        both require it.  Mixed present/absent operators (the band-factor
        fallback) degrade ALL batches to the consistent scatter path."""
        from gnnkeras_tpu.ops.banded import BandedOperator
        from gnnkeras_tpu.ops.bcsr import QuantBcsr, build_bcsr, pad_bcsr

        def _n_blocks(op):
            # IncidencePairs counts pairs; BCSR-family operators count blocks
            if hasattr(op, "n_pairs"):
                return op.n_pairs
            return int(op.blocks.shape[0])

        def _rebuild_float(b):
            import numpy as _np

            m = build_bcsr(
                _np.asarray(b.arc_src), _np.asarray(b.arc_dst),
                _np.asarray(b.arcnode_weight), b.num_nodes,
                max_band_factor=10**9,
            )
            return replace_keep_host(b, bcsr=m)

        def replace_keep_host(b, **kw):
            # batch.replace rebuilds the dataclass; re-attach the host-only
            # caller-order row index that predict/serving consume
            rows = getattr(b, "host_pred_rows", None)
            nb = b.replace(**kw)
            if rows is not None:
                object.__setattr__(nb, "host_pred_rows", rows)
            return nb

        degraded = getattr(self, "_bcsr_degraded", None)
        if degraded is None:
            degraded = self._bcsr_degraded = set()
        for name, attr in (
            ("bcsr", "_pad_blocks"),
            ("nodegraph_bcsr", "_pad_ng_blocks"),
            # arc focus: the readout-backward incidence pair list is a
            # data-dependent structure too (ops/incidence.py)
            ("arc_inc", "_pad_inc_pairs"),
        ):
            ops = [getattr(b, name) for b in self.batches]
            if name in degraded or any(op is None for op in ops):
                # LATCH the degrade across epoch rebuilds: a later epoch whose
                # reshuffled merges all pass build_bcsr would otherwise flip
                # the batch pytree structure back (bcsr None → present) and
                # retrace the compiled step mid-training
                degraded.add(name)
                if any(op is not None for op in ops):
                    self.batches = [replace_keep_host(b, **{name: None}) for b in self.batches]
                continue
            if name == "bcsr" and any(
                isinstance(op, (BandedOperator, QuantBcsr)) for op in ops
            ):
                # quantized operators are per-merge shaped (diagonal offsets,
                # mask+scale presence) and cannot share one treedef across
                # reshuffled merges — rebuild FLOAT blocks (still the MXU
                # path, not the scatter fallback) and LATCH agg_dtype off so
                # later epoch rebuilds construct float operators directly.
                # Multi-graph batches should quantize via slot_pack strips.
                if self.agg_dtype is not None:
                    import warnings

                    warnings.warn(
                        "quantized aggregation operators (agg_dtype="
                        f"{self.agg_dtype!r}) are per-merge shaped and not "
                        "usable across a multi-graph sequencer's batches; "
                        "rebuilding float block operators (use slot_pack "
                        "strips for the quantized multi-graph engine)",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    self.agg_dtype = None
                self.batches = [
                    _rebuild_float(b)
                    if isinstance(getattr(b, name), (BandedOperator, QuantBcsr))
                    else b
                    for b in self.batches
                ]
                ops = [getattr(b, name) for b in self.batches]
                if any(op is None for op in ops):  # block-dense merges declined
                    degraded.add(name)
                    self.batches = [replace_keep_host(b, **{name: None}) for b in self.batches]
                    continue
            need = max(_n_blocks(op) for op in ops)
            need = max(need, getattr(self, attr, 0))
            setattr(self, attr, need)
            if all(_n_blocks(op) == need for op in ops):
                continue  # already uniform — keep the original batch objects
            if name == "arc_inc":
                from gnnkeras_tpu.ops.incidence import pad_incidence_pairs as _pad_op
            else:
                _pad_op = pad_bcsr
            self.batches = [
                replace_keep_host(b, **{name: _pad_op(getattr(b, name), need)})
                for b in self.batches
            ]

    def _uniform_strip(self) -> None:
        """Make the compact-strip operators share ONE pytree structure across
        batches: the strip tensors are already uniform (they are shaped by the
        sequencer-wide node pad), but the cross-tile RESIDUAL is data-dependent
        — a merge whose big graphs span tile boundaries carries one, a merge of
        small graphs does not.  Give every batch a residual padded to the
        monotonic block maximum (an absent residual becomes the all-zero
        operator — the identity of block aggregation), latched across epoch
        rebuilds so the treedef never flips mid-training."""
        import dataclasses as _dc

        from gnnkeras_tpu.ops.bcsr import empty_bcsr, pad_bcsr

        ops = [b.strip for b in self.batches]
        if any(op is None for op in ops):
            if any(op is not None for op in ops):
                raise ValueError("mixed strip presence across batches")
            return

        # int8 mask+scale storage is per-merge factorable: a reshuffled epoch
        # whose merge contains parallel arcs falls back to dense bf16, which
        # would flip the pytree (scale present → None) and retrace the step —
        # LATCH on ANY absence (like _bcsr_degraded above): even an
        # all-absent rebuild must pin the structure, or a later
        # all-factorable rebuild would flip scale back to present
        if any(op.scale is None for op in ops):
            self._strip_scale_degraded = True
        if getattr(self, "_strip_scale_degraded", False):
            from gnnkeras_tpu.ops.strip import strip_to_dense

            new = []
            for b in self.batches:
                if b.strip.scale is None:
                    new.append(b)
                    continue
                rows = getattr(b, "host_pred_rows", None)
                nb = b.replace(strip=strip_to_dense(b.strip))
                if rows is not None:
                    object.__setattr__(nb, "host_pred_rows", rows)
                new.append(nb)
            self.batches = new
            ops = [b.strip for b in self.batches]

        have = [op.residual for op in ops if op.residual is not None]
        need = max([int(r.blocks.shape[0]) for r in have], default=0)
        need = max(need, getattr(self, "_pad_strip_res", 0))
        self._pad_strip_res = need
        if need == 0:
            return  # no batch has ever produced cross-tile edges
        n_tiles = self._pad_nodes // 128
        new_batches = []
        for b in self.batches:
            op = b.strip
            res = op.residual
            res_t = op.residual_t
            if res is None:
                res = empty_bcsr(n_tiles, n_tiles, need)
                res_t = empty_bcsr(n_tiles, n_tiles, need)
            else:
                res = pad_bcsr(res, need)
                res_t = pad_bcsr(res_t, need)
            if res is op.residual and res_t is op.residual_t:
                new_batches.append(b)
                continue
            rows = getattr(b, "host_pred_rows", None)
            nb = b.replace(strip=_dc.replace(op, residual=res, residual_t=res_t))
            if rows is not None:
                object.__setattr__(nb, "host_pred_rows", rows)
            new_batches.append(nb)
        self.batches = new_batches

    def __len__(self) -> int:
        return int(np.ceil(len(self.data) / self.batch_size))

    def _join_pending(self) -> None:
        pending = getattr(self, "_pending_build", None)
        if pending is not None:
            pending.join()
            self._pending_build = None
            exc = getattr(self, "_pending_exc", None)
            if exc is not None:
                self._pending_exc = None
                raise RuntimeError("background batch rebuild failed") from exc

    def _spawn_build(self) -> None:
        """Run build_batches in a background thread, capturing any exception
        so the next access re-raises it instead of silently serving the
        previous epoch's (already-shuffled-out-from-under) batches."""
        self._pending_exc = None

        def run():
            try:
                self.build_batches()
            except BaseException as exc:  # noqa: BLE001 — re-raised at join
                self._pending_exc = exc

        self._pending_build = threading.Thread(target=run, daemon=True)
        self._pending_build.start()

    def __getitem__(self, index: int) -> GraphBatch:
        self._join_pending()
        return self.batches[index]

    def on_epoch_end(self) -> None:
        """Shuffle then rebuild the merged/padded batches in a background
        thread, overlapping the host-side work with validation/compute (the
        reference rebuilds synchronously, GraphSequencers.py:123-127)."""
        if not self.shuffle:
            return
        if self.shuffle_mode == "batches":
            self._join_pending()
            order = np.random.permutation(len(self.batches))
            self.batches = [self.batches[i] for i in order]
            return
        self._join_pending()  # never race two rebuilds over shared pads
        np.random.shuffle(self.data)
        self._spawn_build()

    # -- config / copy ---------------------------------------------------------
    def set_batch_size(self, new_batch_size: int) -> None:
        self._join_pending()
        self.batch_size = int(new_batch_size)
        self.build_batches()

    def get_config(self) -> dict:
        return {
            "graphs": self.data,
            "focus": self.focus,
            "aggregation_mode": self.aggregation_mode,
            "batch_size": self.batch_size,
            "shuffle": self.shuffle,
            "pad_multiple": self.pad_multiple,
            "agg_dtype": self.agg_dtype,
            "shuffle_mode": self.shuffle_mode,
            "tile_pack": self.tile_pack,
            "slot_pack": getattr(self, "slot_pack", None),
            "strip_dtype": getattr(self, "strip_dtype", "int8"),
        }

    @classmethod
    def from_config(cls, config: dict):
        return cls(**config)

    def copy(self):
        config = self.get_config()
        config["graphs"] = [g.copy() for g in config["graphs"]]
        return self.from_config(config)

    def with_graphs(self, graphs: Sequence[GraphObject]):
        """Same sequencer settings over a new graph list (used by LGNN serial
        mode to re-bake features between layers, reference LGNN.py:335-338)."""
        config = self.get_config()
        config["graphs"] = list(graphs)
        return self.from_config(config)

    def __repr__(self):
        problem = {"a": "edge", "n": "node", "g": "graph"}[self.focus]
        return (
            f"graph_sequencer(type=multiple {problem}-focused, len={len(self)}, "
            f"aggregation='{self.aggregation_mode}', batch_size={self.batch_size}, shuffle={self.shuffle})"
        )

    __str__ = __repr__


class SingleGraphSequencer(MultiGraphSequencer):
    """Mini-batches one big graph through boolean masks over its supervised
    nodes (reference SingleGraphSequencer, GraphSequencers.py:133-208)."""

    # every batch SHARES the one graph's topology; stacking them for the
    # scanned-epoch path would duplicate the whole padded graph (and its
    # BCSR blocks) per batch on device — opt out (trainer._try_stack)
    scan_stack_ok = False

    def __init__(
        self,
        graph: GraphObject,
        focus: str,
        batch_size: int = 32,
        shuffle: bool = True,
        *,
        pad_multiple: int = 128,
        agg_dtype: str = None,
    ):
        self.graph = graph
        self.focus = focus
        self.aggregation_mode = graph.aggregation_mode
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.pad_multiple = int(pad_multiple)
        self.agg_dtype = agg_dtype
        self.set_mask_idx = np.flatnonzero(graph.set_mask)
        self._pad_nodes = _round_up(graph.nodes.shape[0], pad_multiple)
        self._pad_arcs = _round_up(graph.arcs.shape[0], pad_multiple)
        self.build_batches()

    @property
    def data(self):
        return self.graph

    def build_batches(self) -> None:
        import jax.numpy as jnp

        n_batches = len(self)
        self.batch_masks = np.zeros((n_batches, len(self.graph.set_mask)), dtype=bool)
        for i in range(n_batches):
            self.batch_masks[i, self.set_mask_idx[i * self.batch_size : (i + 1) * self.batch_size]] = True

        # the topology (and its BCSR operators) is shared by every batch —
        # build it ONCE (incl. across epoch-end shuffles: only the masks
        # change) and vary the set/target masks per batch.
        base = getattr(self, "_base_batch", None)
        if base is None:
            self._base_batch = base = from_graph_object(
                self.graph, self._pad_nodes, self._pad_arcs,
                set_mask_override=self.batch_masks[0] if n_batches else None,
                agg_dtype=self.agg_dtype,
            )
        self.batches = []
        m_rows = base.set_mask.shape[0]
        out_idx = np.flatnonzero(self.graph.output_mask)
        for i in range(0, n_batches):
            bm = self.batch_masks[i]
            sm = np.zeros(m_rows, dtype=bool)
            sm[: len(bm)] = bm
            tm = np.zeros(base.target_mask.shape[0], dtype=bool)
            tm[out_idx] = bm[out_idx]
            self.batches.append(
                base.replace(set_mask=jnp.asarray(sm), target_mask=jnp.asarray(tm))
            )

    def __len__(self) -> int:
        return int(np.ceil(np.sum(self.graph.set_mask) / self.batch_size))

    def on_epoch_end(self) -> None:
        if self.shuffle:
            self._join_pending()
            np.random.shuffle(self.set_mask_idx)
            self._spawn_build()

    def get_config(self) -> dict:
        return {
            "graph": self.graph,
            "focus": self.focus,
            "batch_size": self.batch_size,
            "shuffle": self.shuffle,
            "pad_multiple": self.pad_multiple,
            "agg_dtype": self.agg_dtype,
        }

    def copy(self):
        config = self.get_config()
        config["graph"] = config["graph"].copy()
        return self.from_config(config)

    def with_graphs(self, graphs):
        config = self.get_config()
        config["graph"] = graphs[0] if isinstance(graphs, (list, tuple)) else graphs
        return self.from_config(config)

    def __repr__(self):
        problem = {"a": "edge", "n": "node", "g": "graph"}[self.focus]
        return (
            f"graph_sequencer(type=single {problem}-focused, len={len(self)}, "
            f"batch_size={self.batch_size}, shuffle={self.shuffle})"
        )

    __str__ = __repr__


class CompositeMultiGraphSequencer(MultiGraphSequencer):
    """Multi-graph sequencer over heterogeneous graphs (reference
    GraphSequencers.py:214-245)."""

    graph_class = CompositeGraphObject

    def __repr__(self):
        return f"composite_{super().__repr__()}"

    __str__ = __repr__


class CompositeSingleGraphSequencer(SingleGraphSequencer):
    """Single heterogeneous graph sequencer (reference
    GraphSequencers.py:252-266)."""

    graph_class = CompositeGraphObject

    def __repr__(self):
        return f"composite_{super().__repr__()}"

    __str__ = __repr__
