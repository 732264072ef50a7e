"""Native host tier: ctypes bindings over the C++ kernels in ``src/``.

Compiled on demand with the system ``g++`` into a content-hashed shared
library cached next to the source (or in ``$GNNKERAS_TPU_CACHE``), so the
package needs no build step and no pybind11.  Every entry point has a NumPy
fallback — ``available()`` reports whether the native path is active, and
``GNNKERAS_TPU_NO_NATIVE=1`` disables it outright (used by tests to compare
both paths).

The reference has no native code (SURVEY.md §2); this tier is the new-build
native data-loader/runtime mandated for the framework, covering the host hot
paths measured in graph/batch.py (scatter accumulations) and data/mutag.py
(TU text parsing).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "host_ops.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _cache_dir() -> str:
    # per-user, 0700: a world-writable shared dir with a predictable .so name
    # would let another local user plant a library that ctypes would load
    path = os.environ.get("GNNKERAS_TPU_CACHE")
    if path:
        return path
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    if not os.path.isabs(base):  # no resolvable home
        base = os.path.join(tempfile.gettempdir(), f"gnnkeras_tpu-uid{os.getuid()}")
    return os.path.join(base, "gnnkeras_tpu_native")


def _secure_dir(path: str) -> bool:
    os.makedirs(path, mode=0o700, exist_ok=True)
    st = os.stat(path)
    if st.st_uid != os.getuid():
        return False
    if st.st_mode & 0o022:  # group/other-writable: refuse to trust it
        os.chmod(path, st.st_mode & ~0o022)
    return True


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = _cache_dir()
    try:
        if not _secure_dir(out_dir):
            return None
    except OSError:
        return None
    so_path = os.path.join(out_dir, f"host_ops-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except (subprocess.SubprocessError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GNNKERAS_TPU_NO_NATIVE"):
            return None
        so_path = _build()
        if so_path is None:
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.agg_label_sums.restype = None
        lib.agg_label_sums.argtypes = [
            _i32p, _i32p, _f32p, ctypes.c_int64,
            _f32p, ctypes.c_int64, _f32p, ctypes.c_int64, _f64p, _f64p,
        ]
        lib.agg_component_sums.restype = None
        lib.agg_component_sums.argtypes = [
            _i32p, _i32p, _f32p, ctypes.c_int64,
            _f32p, ctypes.c_int64, _i32p, _i64p, _i64p, ctypes.c_int64, _f64p,
        ]
        lib.scatter_add_f32.restype = None
        lib.scatter_add_f32.argtypes = [_i64p, _f64p, ctypes.c_int64, _f32p]
        _i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lib.factor_mask_scale.restype = ctypes.c_int32
        lib.factor_mask_scale.argtypes = [
            _f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i8p, _f32p,
        ]
        lib.factor_mask_scale_f32.restype = ctypes.c_int32
        lib.factor_mask_scale_f32.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _i8p, _f32p,
        ]
        lib.unique_i64.restype = ctypes.c_int64
        lib.unique_i64.argtypes = [_i64p, ctypes.c_int64, _i64p]
        lib.unique_i64_inverse.restype = ctypes.c_int64
        lib.unique_i64_inverse.argtypes = [_i64p, ctypes.c_int64, _i64p, _i64p]
        lib.scatter_add_f32_idx3.restype = None
        lib.scatter_add_f32_idx3.argtypes = [
            _i64p, _i64p, _i64p, _f64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _f32p,
        ]
        lib.canonical_arcs_f64.restype = ctypes.c_int64
        lib.canonical_arcs_f64.argtypes = [
            _f64p, ctypes.c_int64, ctypes.c_int64, _f64p,
        ]
        lib.canonical_arcs_f32.restype = ctypes.c_int64
        lib.canonical_arcs_f32.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p,
        ]
        lib.parse_ints.restype = ctypes.c_int64
        lib.parse_ints.argtypes = [ctypes.c_char_p, _i64p, ctypes.c_int64]
        lib.count_ints.restype = ctypes.c_int64
        lib.count_ints.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def agg_label_sums(src, dst, w, arc_label, nodes, n_rows):
    """(agg_arc, agg_node) f64 accumulations of the batch-constant neighbor
    sums (graph/batch.py).  src/dst int32 (A,), w f32 (A,), arc_label f32
    (A, da), nodes f32 (N, dn); returns ((n_rows, da), (n_rows, dn)) f64."""
    lib = _load()
    da, dn = arc_label.shape[1], nodes.shape[1]
    # the C++ kernel is f32-in/f64-accumulate; under floatx='float64' the
    # inputs must NOT be downcast (it would silently change the sums vs the
    # documented bit-identical contract) — take the NumPy path instead
    f32_inputs = all(
        np.asarray(x).dtype == np.float32 for x in (w, arc_label, nodes)
    )
    if lib is None or not f32_inputs:
        acc_arc = np.zeros((n_rows, da), np.float64)
        np.add.at(acc_arc, dst, arc_label.astype(np.float64) * w[:, None].astype(np.float64))
        acc_node = np.zeros((n_rows, dn), np.float64)
        np.add.at(acc_node, dst, nodes[src].astype(np.float64) * w[:, None].astype(np.float64))
        return acc_arc, acc_node
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    arc_label = np.ascontiguousarray(arc_label, np.float32)
    nodes = np.ascontiguousarray(nodes, np.float32)
    acc_arc = np.zeros((n_rows, da), np.float64)
    acc_node = np.zeros((n_rows, dn), np.float64)
    lib.agg_label_sums(src, dst, w, len(src), arc_label, da, nodes, dn, acc_arc, acc_node)
    return acc_arc, acc_node


def agg_component_sums(src, dst, w, nodes, type_mask, dims, n_rows):
    """Concatenated per-type gated neighbor-label sums (composite batches,
    reference CompositeGNN.py:251-253).  ``type_mask`` bool (N, T) source-node
    types, ``dims`` per-type widths; returns (n_rows, sum(dims)) f64.

    The C++ path assumes at most one type per node (the reference's
    invariant); multi-hot masks take the general NumPy gate path, where a
    node contributes under every flagged type as the reference's per-type
    boolean_mask loop does.  Note: with NON-FINITE node labels the gate
    path's 0·NaN spreads NaN into every type slice while the C++ selection
    only taints the matching slice — identical on finite inputs."""
    dims = np.asarray(dims, np.int64)
    offsets = np.concatenate([[0], np.cumsum(dims)[:-1]]).astype(np.int64)
    width = int(dims.sum())
    lib = _load()
    one_hot = not np.any(np.count_nonzero(type_mask, axis=1) > 1)
    f32_inputs = all(np.asarray(x).dtype == np.float32 for x in (w, nodes))
    if lib is None or not one_hot or not f32_inputs:
        acc = np.zeros((n_rows, width), np.float64)
        w64 = w.astype(np.float64)
        for t, (d_t, off) in enumerate(zip(dims, offsets)):
            gate = type_mask[src, t].astype(np.float64)
            part = np.zeros((n_rows, int(d_t)), np.float64)
            np.add.at(part, dst, nodes[src, : int(d_t)].astype(np.float64) * (w64 * gate)[:, None])
            acc[:, off : off + int(d_t)] = part
        return acc
    type_of = np.where(type_mask.any(axis=1), np.argmax(type_mask, axis=1), -1).astype(np.int32)
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    nodes = np.ascontiguousarray(nodes, np.float32)
    type_of = np.ascontiguousarray(type_of, np.int32)
    acc = np.zeros((n_rows, width), np.float64)
    lib.agg_component_sums(
        src, dst, w, len(src), nodes, nodes.shape[1],
        type_of, dims, np.ascontiguousarray(offsets), len(dims), acc,
    )
    return acc


def scatter_add_3d(out, i0, i1, i2, w):
    """``np.add.at(out, (i0, i1, i2), w)`` for a 3-D float32 array — one C++
    pass when available (the hot host path of the block/strip operator
    builders), bit-identical ``np.add.at`` fallback otherwise (NumPy's
    mixed-dtype loop computes ``float(double(out) + double(w))`` per element,
    exactly what the C++ kernel does; for all-f32 inputs the double
    intermediate is the same correctly-rounded sum)."""
    lib = _load()
    if lib is None or out.dtype != np.float32 or not out.flags.c_contiguous:
        np.add.at(out, (i0, i1, i2), w)
        return out
    d0, d1, d2 = out.shape
    i0 = np.asarray(i0, np.int64)
    i1 = np.asarray(i1, np.int64)
    i2 = np.asarray(i2, np.int64)
    w = np.asarray(w)
    # the C++ kernel iterates len(w) reading idx[e] unchecked — it needs
    # 1-D index/value arrays of ONE shared length; np.add.at additionally
    # accepts broadcasting (scalar w, mixed shapes), so route any such
    # caller to the NumPy path instead of reading past the index buffers
    if not (i0.ndim == i1.ndim == i2.ndim == w.ndim == 1
            and i0.size == i1.size == i2.size == w.size):
        np.add.at(out, (i0, i1, i2), w)
        return out
    # np.add.at index semantics: negatives wrap per dimension, out-of-range
    # raises — the raw C++ write must never see either (heap corruption)
    for i, d in ((i0, d0), (i1, d1), (i2, d2)):
        if i.size and (int(i.min()) < -d or int(i.max()) >= d):
            np.add.at(out, (i0, i1, i2), w)  # raises NumPy's IndexError
            raise AssertionError("np.add.at accepted an index the wrapper rejected")
    # flattening + negative wrap fused into the C++ pass (no 3x modulo +
    # flatten NumPy temporaries — measured on the 500k-node batch build)
    w64 = np.ascontiguousarray(np.asarray(w, np.float64))
    lib.scatter_add_f32_idx3(
        np.ascontiguousarray(i0), np.ascontiguousarray(i1),
        np.ascontiguousarray(i2), w64, len(w64), d0, d1, d2, out.reshape(-1),
    )
    return out


def unique_i64(keys: np.ndarray, return_inverse: bool = False):
    """``np.unique`` for a 1-D int64 array (optionally with
    ``return_inverse``) — one C++ sort pass; exact for any int64 values.
    Falls back to np.unique when the native tier is unavailable or the
    input is not 1-D int64 (identical results either way)."""
    a = np.asarray(keys)
    lib = _load()
    if lib is None or a.dtype != np.int64 or a.ndim != 1:
        return np.unique(a, return_inverse=return_inverse)
    a = np.ascontiguousarray(a)
    out = np.empty_like(a)
    if return_inverse:
        inv = np.empty(a.shape[0], np.int64)
        m = int(lib.unique_i64_inverse(a, a.shape[0], out, inv))
        return out[:m], inv
    m = int(lib.unique_i64(a, a.shape[0], out))
    return out[:m]


def canonical_arcs(arcs: np.ndarray) -> Optional[np.ndarray]:
    """``np.unique(arcs, axis=0)`` for an (A, C>=2) float arc matrix whose
    first two columns are integral node ids — the GraphObject constructor's
    canonicalization (reference graph_class.py:47), one C++ key-packed sort
    instead of NumPy's structured row sort (measured 3.8 s of the 500k-node
    batch build; an np.lexsort swap was refuted, BASELINE.md round 4).

    Returns the sorted-unique rows, or None when unavailable or the input
    is ineligible for guaranteed bit-identity with np.unique (any NaN, any
    -0.0, or non-integral/out-of-range endpoints) — callers fall back to
    np.unique."""
    lib = _load()
    a = np.asarray(arcs)
    if (lib is None or a.ndim != 2 or a.shape[1] < 2
            or a.dtype not in (np.float32, np.float64)):
        return None
    a = np.ascontiguousarray(a)
    out = np.empty_like(a)
    fn = lib.canonical_arcs_f64 if a.dtype == np.float64 else lib.canonical_arcs_f32
    m = int(fn(a, a.shape[0], a.shape[1], out))
    if m < 0:
        return None
    return out[:m]


def factor_mask_scale(arr: np.ndarray):
    """Factor ``arr == mask * scale[:, None, :]`` with a 0/1 mask: every
    column's nonzeros must share one exact value (the reference's
    per-destination aggregation weight, graph_class.py:105-121).  Returns
    (mask int8, scale f32) or None when not factorable (duplicate arcs
    accumulated, per-arc weights, or any NaN).  C++ single pass when
    available; the NumPy fallback reconstructs and compares."""
    lib = _load()
    if lib is not None and arr.dtype in (np.float32, np.float64):
        a = np.ascontiguousarray(arr)
        B, R, C = a.shape
        mask = np.empty((B, R, C), np.int8)
        scale = np.empty((B, C), np.float32)
        fn = lib.factor_mask_scale if a.dtype == np.float64 else lib.factor_mask_scale_f32
        if not fn(a, B, R, C, mask, scale):
            return None
        return mask, scale
    mask = arr != 0
    first = np.argmax(mask, axis=1)  # first nonzero row per (tile, col)
    t_idx = np.arange(arr.shape[0])[:, None]
    c_idx = np.arange(arr.shape[2])[None, :]
    scale = arr[t_idx, first, c_idx] * mask.any(axis=1)
    if not np.array_equal(arr, mask * scale[:, None, :]):
        return None
    return mask.astype(np.int8), scale.astype(np.float32)


def load_ints(path: str) -> Optional[np.ndarray]:
    """All integers in a TU-format text file as one int64 vector, or None
    when the native library is unavailable (caller falls back to np.loadtxt).

    Single read pass: the buffer is sized from the file size (an integer
    token needs ≥2 bytes incl. its separator) rather than a counting
    pre-pass, which would double the I/O and race against concurrent file
    changes."""
    lib = _load()
    if lib is None:
        return None
    try:
        size = os.stat(path).st_size
    except OSError:
        raise FileNotFoundError(path)
    out = np.empty(size // 2 + 2, np.int64)
    got = lib.parse_ints(os.fsencode(path), out, len(out))
    if got < 0:
        raise ValueError(f"malformed integer file: {path} (code {got})")
    return out[:got].copy()
