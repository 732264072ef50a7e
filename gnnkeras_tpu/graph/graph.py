"""Host-side graph data model (NumPy).

Capability-equivalent to the reference's ``GraphObject`` /
``CompositeGraphObject`` (GNN/graph_class.py, GNN/composite_graph_class.py)
with one structural difference: the three sparse operators the reference
materializes as scipy COO matrices — ArcNode (graph_class.py:91-124),
Adjacency (graph_class.py:82-88) and NodeGraph (graph_class.py:127-138) — are
represented as *index + per-edge-weight arrays*.  On TPU the corresponding
matvecs become gather + segment-sum with static shapes (see
gnnkeras_tpu.ops.segment); nothing sparse ever needs to be materialized or
reordered on device.

Field names and on-disk formats (npz / txt folders) are kept compatible with
the reference so datasets can be moved between the two frameworks.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Sequence

import numpy as np

from gnnkeras_tpu.utils.dtypes import floatx

_HOMOGENEOUS_MODES = ("sum", "normalized", "average")
_COMPOSITE_MODES = _HOMOGENEOUS_MODES + ("composite_average",)


def arcnode_weights(
    arcs: np.ndarray,
    aggregation_mode: str,
    type_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-edge aggregation weights: the data vector of the reference's
    ArcNode/Adjacency matrices (both share values — graph_class.py:86-87).

    - 'sum':        w = 1                                (graph_class.py:108)
    - 'normalized': w = 1/num_arcs                       (graph_class.py:113-114;
      NB the code divides by the arc count, not the node count the docstring
      claims — we follow the code)
    - 'average':    w = 1/indegree(dst)                  (graph_class.py:119-121)
    - 'composite_average': w = 1/|{e': dst(e')=dst(e), type(src(e'))=type(src(e))}|
      (composite_graph_class.py:92-101)
    """
    n_arcs = arcs.shape[0]
    dst = arcs[:, 1].astype(np.int64)
    w = np.ones(n_arcs, dtype=np.float64)

    if aggregation_mode == "sum":
        pass
    elif aggregation_mode == "normalized":
        w *= 1.0 / n_arcs
    elif aggregation_mode == "average":
        if n_arcs:
            counts = np.bincount(dst)  # integer indegrees — same values as
            w /= counts[dst]  # the reference's per-unique-dst count
    elif aggregation_mode == "composite_average":
        if type_mask is None:
            raise ValueError("'composite_average' requires a type_mask")
        src = arcs[:, 0].astype(np.int64)
        for t in type_mask.T:
            sel = t[src] if n_arcs else np.zeros(0, dtype=bool)
            if not np.any(sel):
                continue
            sel_dst = dst[sel]
            counts = np.bincount(sel_dst)
            w[sel] /= counts[sel_dst]
    else:
        raise ValueError(f"Unknown aggregation mode: {aggregation_mode!r}")
    return w.astype(floatx())


class GraphObject:
    """Homogeneous graph: node labels, arcs ``[src, dst, label...]``, targets,
    set/output masks and sample weights.  Mirrors reference
    GNN/graph_class.py:13-199 in capability.

    Derived (recomputed, never stored on disk):
      - ``arcnode_weight`` (A,):  aggregation weights per arc,
      - ``graph_of_node`` (N,) + ``nodegraph_weight`` (N,):  row/ value view of
        the reference's NodeGraph readout matrix (graph_class.py:127-138).
    """

    def __init__(
        self,
        nodes: np.ndarray,
        arcs: np.ndarray,
        targets: np.ndarray,
        focus: str = "n",
        set_mask: Optional[np.ndarray] = None,
        output_mask: Optional[np.ndarray] = None,
        sample_weight=1,
        NodeGraph=None,
        aggregation_mode: str = "sum",
        arcs_canonical: bool = False,
    ):
        self.dtype = floatx()
        self.focus = str(focus)

        self.nodes = np.asarray(nodes).astype(self.dtype)
        # dedup + lexicographic sort, as the reference does (graph_class.py:47).
        # ``arcs_canonical=True`` skips the O(A log A) re-sort when the caller
        # guarantees the rows are already unique and sorted (e.g. they came
        # from another GraphObject unchanged — the serial-bake rebuild path).
        if arcs_canonical:
            self.arcs = np.array(arcs, dtype=self.dtype)
        else:
            from gnnkeras_tpu import native

            arr = np.asarray(arcs)
            # native key-packed row sort+dedup (bit-identical; None when the
            # input needs NumPy's general semantics — NaN/-0.0/huge ids)
            canon = native.canonical_arcs(arr)
            if canon is None:
                canon = np.unique(arr, axis=0)
            self.arcs = canon.astype(self.dtype)
        self.targets = np.atleast_2d(np.asarray(targets)).astype(self.dtype)
        self.sample_weight = (np.asarray(sample_weight) * np.ones(self.targets.shape[0])).astype(self.dtype)

        self.DIM_NODE_LABEL = np.array(self.nodes.shape[1], ndmin=1, dtype=int)
        self.DIM_ARC_LABEL = self.arcs.shape[1] - 2
        self.DIM_TARGET = self.targets.shape[1]

        len_mask = {"n": self.nodes.shape[0], "a": self.arcs.shape[0], "g": self.nodes.shape[0]}[focus]
        self.set_mask = (
            np.ones(len_mask, dtype=bool) if set_mask is None else np.asarray(set_mask).astype(bool).reshape(-1)
        )
        self.output_mask = (
            np.ones(len(self.set_mask), dtype=bool)
            if output_mask is None
            else np.asarray(output_mask).astype(bool).reshape(-1)
        )
        if len(self.set_mask) != len(self.output_mask):
            raise ValueError("len(set_mask) != len(output_mask)")
        if len(self.set_mask) != len_mask:
            # NOTE for arc focus: masks/targets row-correspond to the arcs
            # AFTER the constructor's dedup+sort (as in the reference, which
            # re-sorts identically, graph_class.py:47) — pass rows aligned
            # with the canonical order.
            raise ValueError(
                f"set_mask length {len(self.set_mask)} != "
                f"{'arc' if focus == 'a' else 'node'} count {len_mask}"
            )

        self.aggregation_mode = str(aggregation_mode)
        self._check_mode(self.aggregation_mode)
        self.arcnode_weight = self._build_weights(self.aggregation_mode)

        # NodeGraph: graph membership + 1/N_g weights (focus == 'g' only).
        if NodeGraph is not None:
            graph_of_node, w = self._nodegraph_from_coo(NodeGraph)
            self.graph_of_node, self.nodegraph_weight = graph_of_node, w
        elif focus == "g":
            n = self.nodes.shape[0]
            self.graph_of_node = np.zeros(n, dtype=np.int64)
            self.nodegraph_weight = np.full(n, 1.0 / n, dtype=self.dtype)
        else:
            self.graph_of_node = np.zeros(self.nodes.shape[0], dtype=np.int64)
            self.nodegraph_weight = np.zeros(self.nodes.shape[0], dtype=self.dtype)

    # -- helpers ------------------------------------------------------------
    @staticmethod
    def _check_mode(mode: str) -> None:
        if mode not in _HOMOGENEOUS_MODES:
            raise ValueError(f"Unknown aggregation mode: {mode!r}")

    def _build_weights(self, mode: str) -> np.ndarray:
        return arcnode_weights(self.arcs, mode)

    def _nodegraph_from_coo(self, NodeGraph):
        """Accept a scipy coo_matrix / (data,(row,col)) NodeGraph of shape
        (N, G) — or directly a ``(graph_of_node, weight)`` array pair (the
        internal representation; no scipy round-trip)."""
        if (
            isinstance(NodeGraph, tuple)
            and len(NodeGraph) == 2
            and isinstance(NodeGraph[1], np.ndarray)
            and NodeGraph[1].ndim == 1
        ):
            return (
                np.asarray(NodeGraph[0], dtype=np.int64).copy(),
                np.asarray(NodeGraph[1], dtype=self.dtype).copy(),
            )
        try:
            ng = NodeGraph.tocoo()
        except AttributeError:
            from scipy.sparse import coo_matrix

            ng = coo_matrix(NodeGraph, dtype=self.dtype)
        n = self.nodes.shape[0]
        graph_of_node = np.zeros(n, dtype=np.int64)
        weight = np.zeros(n, dtype=self.dtype)
        graph_of_node[ng.row] = ng.col
        weight[ng.row] = ng.data.astype(self.dtype)
        return graph_of_node, weight

    @property
    def num_graphs(self) -> int:
        return int(self.graph_of_node.max()) + 1 if self.nodes.shape[0] else 0

    # -- scipy interop (tests / reference parity) ---------------------------
    def ArcNode_coo(self):
        from scipy.sparse import coo_matrix

        a = self.arcs.shape[0]
        row = np.arange(a)
        col = self.arcs[:, 1].astype(np.int64)
        return coo_matrix((self.arcnode_weight, (row, col)), shape=(a, self.nodes.shape[0]), dtype=self.dtype)

    def Adjacency_coo(self):
        from scipy.sparse import coo_matrix

        row = self.arcs[:, 0].astype(np.int64)
        col = self.arcs[:, 1].astype(np.int64)
        n = self.nodes.shape[0]
        return coo_matrix((self.arcnode_weight, (row, col)), shape=(n, n), dtype=self.dtype)

    def NodeGraph_coo(self):
        from scipy.sparse import coo_matrix

        if self.focus != "g" and not np.any(self.nodegraph_weight):
            return coo_matrix(np.zeros((0, 0), dtype=self.dtype))
        row = np.arange(self.nodes.shape[0])
        return coo_matrix(
            (self.nodegraph_weight, (row, self.graph_of_node)),
            shape=(self.nodes.shape[0], self.num_graphs),
            dtype=self.dtype,
        )

    # -- setters / getters ---------------------------------------------------
    def setAggregation(self, aggregation_mode: str) -> None:
        """Recompute aggregation weights (reference graph_class.py:164-168)."""
        self._check_mode(aggregation_mode)
        self.aggregation_mode = aggregation_mode
        self.arcnode_weight = self._build_weights(aggregation_mode)

    def copy(self) -> "GraphObject":
        return GraphObject(
            nodes=self.nodes.copy(),
            arcs=self.arcs.copy(),
            targets=self.targets.copy(),
            focus=self.focus,
            set_mask=self.set_mask.copy(),
            output_mask=self.output_mask.copy(),
            sample_weight=self.sample_weight.copy(),
            # preserve graph membership for ANY focus: merged non-'g' graphs
            # carry real graph_of_node ids (merge sets them); dropping them on
            # copy() would silently disable tile packing downstream
            NodeGraph=(self.graph_of_node.copy(), self.nodegraph_weight.copy()),
            aggregation_mode=self.aggregation_mode,
        )

    def __repr__(self):
        set_mask_type = "all" if np.all(self.set_mask) else "mixed"
        return (
            f"graph(n={self.nodes.shape[0]}, a={self.arcs.shape[0]}, "
            f"ndim={self.DIM_NODE_LABEL}, adim={self.DIM_ARC_LABEL}, tdim={self.DIM_TARGET}, "
            f"set={set_mask_type}, mode={self.aggregation_mode})"
        )

    __str__ = __repr__

    # -- persistence (reference-compatible formats) --------------------------
    def get_dict_data(self) -> dict:
        """npz payload; matches reference graph_class.py:201-216 key-for-key."""
        data = {"nodes": self.nodes, "arcs": self.arcs, "targets": self.targets}
        if not np.all(self.set_mask):
            data["set_mask"] = self.set_mask
        if not np.all(self.output_mask):
            data["output_mask"] = self.output_mask
        if np.any(self.sample_weight != 1):
            data["sample_weight"] = self.sample_weight
        ng = self.NodeGraph_coo()
        if ng.size > 0 and ng.shape[1] > 1:
            data["NodeGraph"] = np.stack([ng.data, ng.row, ng.col]).transpose()
        return data

    def save(self, graph_npz_path: str, **kwargs) -> None:
        self.save_graph(graph_npz_path, self, False, **kwargs)

    def save_compressed(self, graph_npz_path: str, **kwargs) -> None:
        self.save_graph(graph_npz_path, self, True, **kwargs)

    def savetxt(self, graph_folder_path: str, format: str = "%.10g", **kwargs) -> None:
        self.save_txt(graph_folder_path, self, format, **kwargs)

    @staticmethod
    def save_graph(graph_npz_path: str, g, compressed: bool = False, **kwargs) -> None:
        data = g.get_dict_data()
        (np.savez_compressed if compressed else np.savez)(graph_npz_path, **data, **kwargs)

    @staticmethod
    def save_txt(graph_folder_path: str, g, fmt: str = "%.10g", **kwargs) -> None:
        if graph_folder_path[-1] != "/":
            graph_folder_path += "/"
        if os.path.exists(graph_folder_path):
            shutil.rmtree(graph_folder_path)
        os.makedirs(graph_folder_path)
        data = g.get_dict_data()
        for key in data:
            np.savetxt(f"{graph_folder_path}{key}.txt", data[key], fmt=fmt, **kwargs)

    @staticmethod
    def save_dataset(folder: str, glist: Sequence["GraphObject"], compressed=False, **kwargs) -> None:
        if folder[-1] != "/":
            folder += "/"
        if os.path.exists(folder):
            shutil.rmtree(folder)
        os.makedirs(folder)
        for idx, g in enumerate(glist):
            GraphObject.save_graph(f"{folder}g{idx}", g, compressed, **kwargs)

    @staticmethod
    def save_dataset_txt(folder: str, glist: Sequence["GraphObject"], **kwargs) -> None:
        if folder[-1] != "/":
            folder += "/"
        if os.path.exists(folder):
            shutil.rmtree(folder)
        os.makedirs(folder)
        for idx, g in enumerate(glist):
            GraphObject.save_txt(f"{folder}g{idx}", g, **kwargs)

    @classmethod
    def load(cls, graph_npz_path: str, focus: str, aggregation_mode: str, **kwargs):
        if not graph_npz_path.endswith(".npz"):
            graph_npz_path += ".npz"
        data = dict(np.load(graph_npz_path, **kwargs))
        nodegraph = data.pop("NodeGraph", None)
        if nodegraph is not None:
            from scipy.sparse import coo_matrix

            data["NodeGraph"] = coo_matrix(
                (nodegraph[:, 0], (nodegraph[:, 1].astype(int), nodegraph[:, 2].astype(int)))
            )
        return cls(focus=focus, aggregation_mode=aggregation_mode, **data)

    @classmethod
    def load_txt(cls, graph_folder_path: str, focus: str, aggregation_mode: str, **kwargs):
        if graph_folder_path[-1] != "/":
            graph_folder_path += "/"
        files = os.listdir(graph_folder_path)
        keys = [f.rsplit(".")[0] for f in files]
        vals = [np.loadtxt(graph_folder_path + f, ndmin=2, **kwargs) for f in files]
        data = dict(zip(keys, vals))
        data["focus"] = focus
        data["aggregation_mode"] = aggregation_mode
        nodegraph = data.pop("NodeGraph", None)
        if nodegraph is not None:
            from scipy.sparse import coo_matrix

            data["NodeGraph"] = coo_matrix(
                (nodegraph[:, 0], (nodegraph[:, 1].astype(int), nodegraph[:, 2].astype(int)))
            )
        for key in ("set_mask", "output_mask"):
            if key in data:
                data[key] = data[key].reshape(-1)
        if "sample_weight" in data:
            data["sample_weight"] = data["sample_weight"].reshape(-1)
        return cls(**data)

    @classmethod
    def load_dataset(cls, folder: str, focus: str, aggregation_mode: str, **kwargs):
        return [cls.load(f"{folder}/{g}", focus, aggregation_mode, **kwargs) for g in sorted(os.listdir(folder))]

    @classmethod
    def load_dataset_txt(cls, folder: str, focus: str, aggregation_mode: str, **kwargs):
        return [cls.load_txt(f"{folder}/{g}", focus, aggregation_mode, **kwargs) for g in sorted(os.listdir(folder))]

    # -- merge (disjoint-union batching) -------------------------------------
    @classmethod
    def merge(cls, glist: Sequence["GraphObject"], focus: str, aggregation_mode: str, dtype="float32"):
        """Disjoint-union merge with arc index offsetting; the reference's
        batching primitive (graph_class.py:385-413).  NodeGraph becomes the
        block-diagonal of per-graph readout columns."""
        nodes_list, arcs_list, targets_list = [], [], []
        set_list, out_list, sw_list = [], [], []
        graph_of_node, nodegraph_weight = [], []
        offset, graph_offset = 0, 0
        for g in glist:
            arcs = g.arcs.copy()
            arcs[:, :2] += offset
            arcs_list.append(arcs)
            nodes_list.append(g.nodes)
            targets_list.append(g.targets)
            set_list.append(g.set_mask)
            out_list.append(g.output_mask)
            sw_list.append(g.sample_weight)
            graph_of_node.append(g.graph_of_node + graph_offset)
            nodegraph_weight.append(g.nodegraph_weight)
            offset += g.nodes.shape[0]
            graph_offset += max(g.num_graphs, 1)

        merged = cls.__new__(cls)
        GraphObject.__init__(
            merged,
            nodes=np.concatenate(nodes_list, axis=0),
            arcs=np.concatenate(arcs_list, axis=0),
            targets=np.concatenate(targets_list, axis=0),
            focus=focus,
            set_mask=np.concatenate(set_list, axis=0),
            output_mask=np.concatenate(out_list, axis=0),
            sample_weight=np.concatenate(sw_list, axis=0),
            aggregation_mode=aggregation_mode,
            # per-graph arcs are already unique + sorted (ctor canonicalized)
            # and the strictly increasing node offsets keep the concatenation
            # globally unique/ordered — skip the O(A log A) re-sort per merge
            arcs_canonical=True,
        )
        merged.graph_of_node = np.concatenate(graph_of_node, axis=0)
        merged.nodegraph_weight = np.concatenate(nodegraph_weight, axis=0).astype(merged.dtype)
        return merged


class CompositeGraphObject(GraphObject):
    """Heterogeneous graph with per-node-type label dimensions.  Mirrors the
    reference's CompositeGraphObject (composite_graph_class.py:14-182); the
    per-type CompositeAdjacencies (composite_graph_class.py:57-70) are never
    materialized — the model gates the shared edge weights with the source
    node's type on the fly."""

    def __init__(self, nodes, arcs, targets, type_mask, dim_node_label, *args, **kwargs):
        self.type_mask = np.asarray(type_mask).astype(bool)
        super().__init__(nodes, arcs, targets, *args, **kwargs)
        self.DIM_NODE_LABEL = np.array(dim_node_label, ndmin=1, dtype=int)

    @staticmethod
    def _check_mode(mode: str) -> None:
        if mode not in _COMPOSITE_MODES:
            raise ValueError(f"Unknown aggregation mode: {mode!r}")

    def _build_weights(self, mode: str) -> np.ndarray:
        return arcnode_weights(self.arcs, mode, type_mask=self.type_mask)

    @property
    def num_types(self) -> int:
        return self.type_mask.shape[1]

    def getTypeMask(self):
        return self.type_mask.copy()

    def CompositeAdjacencies_coo(self):
        """Per-type adjacency matrices: the shared Adjacency restricted to
        edges whose SOURCE node carries the type (reference
        composite_graph_class.py:57-70; the per-type composite_average
        renormalization already lives in ``arcnode_weight``).  Used by the
        device-form (GraphTensor) archive writer."""
        from scipy.sparse import coo_matrix

        n = self.nodes.shape[0]
        src = self.arcs[:, 0].astype(int)
        dst = self.arcs[:, 1].astype(int)
        mats = []
        for t in range(self.num_types):
            sel = self.type_mask[src, t]
            mats.append(
                coo_matrix(
                    (self.arcnode_weight[sel], (src[sel], dst[sel])),
                    shape=(n, n),
                    dtype=self.dtype,
                )
            )
        return mats

    def copy(self) -> "CompositeGraphObject":
        return CompositeGraphObject(
            nodes=self.nodes.copy(),
            arcs=self.arcs.copy(),
            targets=self.targets.copy(),
            type_mask=self.type_mask.copy(),
            dim_node_label=self.DIM_NODE_LABEL.copy(),
            focus=self.focus,
            set_mask=self.set_mask.copy(),
            output_mask=self.output_mask.copy(),
            sample_weight=self.sample_weight.copy(),
            # preserve graph membership for ANY focus: merged non-'g' graphs
            # carry real graph_of_node ids (merge sets them); dropping them on
            # copy() would silently disable tile packing downstream
            NodeGraph=(self.graph_of_node.copy(), self.nodegraph_weight.copy()),
            aggregation_mode=self.aggregation_mode,
        )

    def __repr__(self):
        return f"composite_{super().__repr__()}"

    __str__ = __repr__

    def get_dict_data(self) -> dict:
        data = super().get_dict_data()
        data["type_mask"] = self.type_mask
        data["dim_node_label"] = self.DIM_NODE_LABEL
        return data

    @classmethod
    def merge(cls, glist, focus: str, aggregation_mode: str, dtype="float32"):
        """composite_graph_class.py:141-167: homogeneous merge + type_mask
        concat; per-type label dims must agree across graphs."""
        dims = {tuple(g.DIM_NODE_LABEL) for g in glist}
        if len(dims) != 1:
            raise AssertionError("DIM_NODE_LABEL not unique among graphs in glist")

        base = GraphObject.merge(glist, focus, "sum")
        type_mask = np.concatenate([g.type_mask for g in glist], axis=0)

        merged = cls.__new__(cls)
        merged.type_mask = type_mask
        GraphObject.__init__(
            merged,
            nodes=base.nodes,
            arcs=base.arcs,
            targets=base.targets,
            focus=focus,
            set_mask=base.set_mask,
            output_mask=base.output_mask,
            sample_weight=base.sample_weight,
            aggregation_mode=aggregation_mode,
        )
        merged.DIM_NODE_LABEL = np.array(dims.pop(), ndmin=1, dtype=int)
        merged.graph_of_node = base.graph_of_node
        merged.nodegraph_weight = base.nodegraph_weight
        return merged

    @classmethod
    def load(cls, graph_npz_path: str, focus: str, aggregation_mode: str, **kwargs):
        if not graph_npz_path.endswith(".npz"):
            graph_npz_path += ".npz"
        data = dict(np.load(graph_npz_path, **kwargs))
        nodegraph = data.pop("NodeGraph", None)
        if nodegraph is not None:
            from scipy.sparse import coo_matrix

            data["NodeGraph"] = coo_matrix(
                (nodegraph[:, 0], (nodegraph[:, 1].astype(int), nodegraph[:, 2].astype(int)))
            )
        return cls(focus=focus, aggregation_mode=aggregation_mode, **data)
