"""ctypes bindings for the graphkit native library (``native/graphkit.cpp``).

Zero-copy calls on NumPy buffers; every entry point has a NumPy fallback, so
the framework works identically without the compiled library (``available()``
reports which path is active). The library is built on demand with g++ via
``native/build.sh``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraphkit.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f32p = ctypes.POINTER(ctypes.c_float)


def _needs_build() -> bool:
    """True when the .so is absent or older than graphkit.cpp (stale)."""
    if not os.path.exists(_LIB_PATH):
        return True
    src = os.path.join(_NATIVE_DIR, "graphkit.cpp")
    try:
        return os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    except OSError:
        return False


def _build() -> bool:
    build = os.path.join(_NATIVE_DIR, "build.sh")
    if not os.path.exists(build):
        return False
    try:
        subprocess.run(["sh", build], check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError):
        return False
    return os.path.exists(_LIB_PATH)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if _needs_build() and not _build():
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    # a stale pre-built .so (source updated, mtimes unhelpful — e.g. a fresh
    # checkout) may lack newer symbols: rebuild once, else fall back to NumPy
    if not hasattr(lib, "gk_sample_layer"):
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if not hasattr(lib, "gk_sample_layer"):
            return None
    lib.gk_sort_edges_by_row.argtypes = [_i64p, _i64p, ctypes.c_int64, _i64p]
    lib.gk_coo_to_csr.argtypes = [_i64p, ctypes.c_int64, ctypes.c_int64, _i64p]
    lib.gk_build_ell_count.argtypes = [_i64p, ctypes.c_int64, _i64p, ctypes.c_int64, _i64p]
    lib.gk_build_ell_fill.argtypes = [
        _i64p, _i64p, _f32p, ctypes.c_int64, _i64p, ctypes.c_int64,
        ctypes.POINTER(_i32p), ctypes.POINTER(_f32p), ctypes.POINTER(_i32p),
    ]
    lib.gk_parse_edge_list.argtypes = [ctypes.c_char_p, _i64p, _i64p, ctypes.c_int64]
    lib.gk_parse_edge_list.restype = ctypes.c_int64
    lib.gk_label_propagation.argtypes = [
        _i64p, _i64p, _f32p, ctypes.c_int64, ctypes.c_int64, _i64p,
    ]
    lib.gk_label_propagation.restype = ctypes.c_int64
    lib.gk_unique_inverse.argtypes = [_i64p, ctypes.c_int64, _i64p, _i64p]
    lib.gk_unique_inverse.restype = ctypes.c_int64
    lib.gk_unique_inverse_bounded.argtypes = [
        _i64p, ctypes.c_int64, ctypes.c_int64, _i32p, _i64p, _i64p,
    ]
    lib.gk_unique_inverse_bounded.restype = ctypes.c_int64
    lib.gk_sample_layer.argtypes = [
        _i64p, _i64p, _f32p, _i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int32, _i64p, _f32p,
    ]
    if hasattr(lib, "gk_sample_layer_mt"):
        lib.gk_sample_layer_mt.argtypes = [
            _i64p, _i64p, _f32p, _i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int32, ctypes.c_int64, _i64p, _f32p,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctype)


def sort_edges_by_row(senders: np.ndarray, receivers: np.ndarray) -> Optional[np.ndarray]:
    """Permutation sorting edges by (receiver, sender); None → use NumPy."""
    lib = _load()
    if lib is None:
        return None
    s = np.ascontiguousarray(senders, np.int64)
    r = np.ascontiguousarray(receivers, np.int64)
    out = np.empty(s.size, np.int64)
    lib.gk_sort_edges_by_row(_ptr(s, _i64p), _ptr(r, _i64p), s.size, _ptr(out, _i64p))
    return out


def coo_to_csr(receivers_sorted: np.ndarray, n_rows: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    r = np.ascontiguousarray(receivers_sorted, np.int64)
    out = np.empty(n_rows + 1, np.int64)
    lib.gk_coo_to_csr(_ptr(r, _i64p), r.size, n_rows, _ptr(out, _i64p))
    return out


def build_ell_layout(
    indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
    ks: Sequence[int],
) -> Optional[Tuple[list, list, list]]:
    """Per-bucket (cols [Nb,K], vals [Nb,K], rows [Nb]) arrays; None → NumPy."""
    lib = _load()
    if lib is None:
        return None
    n_rows = indptr.size - 1
    indptr64 = np.ascontiguousarray(indptr, np.int64)
    indices64 = np.ascontiguousarray(indices, np.int64)
    data32 = np.ascontiguousarray(data, np.float32)
    ks64 = np.ascontiguousarray(ks, np.int64)

    counts = np.zeros(len(ks), np.int64)
    lib.gk_build_ell_count(_ptr(indptr64, _i64p), n_rows, _ptr(ks64, _i64p),
                           len(ks), _ptr(counts, _i64p))
    cols, vals, rows = [], [], []
    col_ptrs = (_i32p * len(ks))()
    val_ptrs = (_f32p * len(ks))()
    row_ptrs = (_i32p * len(ks))()
    for b, k in enumerate(ks):
        nb = max(int(counts[b]), 1)
        cols.append(np.zeros((nb, k), np.int32))
        vals.append(np.zeros((nb, k), np.float32))
        rows.append(np.zeros(nb, np.int32))
        col_ptrs[b] = cols[b].ctypes.data_as(_i32p)
        val_ptrs[b] = vals[b].ctypes.data_as(_f32p)
        row_ptrs[b] = rows[b].ctypes.data_as(_i32p)
    lib.gk_build_ell_fill(
        _ptr(indptr64, _i64p), _ptr(indices64, _i64p), _ptr(data32, _f32p),
        n_rows, _ptr(ks64, _i64p), len(ks), col_ptrs, val_ptrs, row_ptrs,
    )
    return cols, vals, rows


def label_propagation(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: Optional[np.ndarray] = None,
    max_iters: int = 20,
) -> np.ndarray:
    """Community labels via weighted asynchronous label propagation over CSR.

    Uses the native kernel when available; otherwise a NumPy sweep with the
    same deterministic semantics (natural node order; switch only on a
    strictly larger vote; among non-current ties prefer the smaller label).
    """
    n_rows = indptr.size - 1
    lib = _load()
    if lib is not None:
        indptr64 = np.ascontiguousarray(indptr, np.int64)
        indices64 = np.ascontiguousarray(indices, np.int64)
        labels = np.empty(n_rows, np.int64)
        wp = (
            _ptr(np.ascontiguousarray(weights, np.float32), _f32p)
            if weights is not None else None
        )
        lib.gk_label_propagation(
            _ptr(indptr64, _i64p), _ptr(indices64, _i64p), wp,
            n_rows, max_iters, _ptr(labels, _i64p),
        )
        return labels

    labels = np.arange(n_rows, dtype=np.int64)
    w = (np.ones(indices.size, np.float32) if weights is None
         else np.asarray(weights, np.float32))
    for _ in range(max_iters):
        changed = 0
        for u in range(n_rows):
            lo, hi = int(indptr[u]), int(indptr[u + 1])
            if lo == hi:
                continue
            labs = labels[indices[lo:hi]]
            votes: dict = {}
            for lab, wt in zip(labs, w[lo:hi]):
                lab = int(lab)
                votes[lab] = np.float32(votes.get(lab, np.float32(0.0)) + np.float32(wt))
            cur = int(labels[u])
            best, best_v = cur, votes.get(cur, np.float32(0.0))
            best_h = 0
            for lab, v in votes.items():
                if v < best_v or lab == best:
                    continue
                h = _mix64(lab)
                if v > best_v or (best != cur and h > best_h):
                    best, best_v, best_h = lab, v, h
            if best != cur:
                labels[u] = best
                changed += 1
        if changed == 0:
            break
    return labels


_M64 = (1 << 64) - 1


def _mix64(x: int) -> int:
    """splitmix64 — must match ``gk_mix64`` in native/graphkit.cpp exactly."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def unique_inverse(
    vals: np.ndarray,
    n_max: Optional[int] = None,
    scratch: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """``np.unique(vals, return_inverse=True)`` — native fast path.

    Bit-identical to the NumPy fallback (sorted unique values, int64 inverse).
    This is the hot dedup/relabel step of minibatch neighborhood sampling.
    When the value range is known (``n_max``: node ids in ``[0, n_max)``) a
    dense rank table replaces the sort — pass a zeroed int32 ``scratch`` of
    size ``n_max`` to reuse the table across calls (it is returned zeroed).
    Without ``n_max`` a hash-based kernel is used (only the unique keys get
    sorted). Both native kernels release the GIL, so prefetch-threaded
    sampling overlaps with device compute.
    """
    v = np.ascontiguousarray(vals, np.int64)
    lib = _load()
    if lib is None or v.size == 0:
        uniq, inv = np.unique(v, return_inverse=True)
        return uniq, inv.astype(np.int64, copy=False)
    uniq = np.empty(v.size, np.int64)
    inv = np.empty(v.size, np.int64)
    if n_max is not None:
        # the dense-rank kernel indexes scratch by value with no bounds check
        # (np.unique would accept, e.g., negative ids silently)
        lo, hi = int(v.min()), int(v.max())
        if lo < 0 or hi >= n_max:
            raise ValueError(
                f"unique_inverse: values in [{lo}, {hi}] outside [0, {n_max})"
            )
        if scratch is None:
            scratch = np.zeros(n_max, np.int32)
        n_uniq = lib.gk_unique_inverse_bounded(
            _ptr(v, _i64p), v.size, n_max, _ptr(scratch, _i32p),
            _ptr(uniq, _i64p), _ptr(inv, _i64p),
        )
    else:
        n_uniq = lib.gk_unique_inverse(
            _ptr(v, _i64p), v.size, _ptr(uniq, _i64p), _ptr(inv, _i64p)
        )
    return uniq[:n_uniq], inv


_U64 = np.uint64


def _mix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 array — matches ``gk_mix64``."""
    x = x + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _auto_sample_threads(m: int, k: int) -> int:
    """Draws-per-thread heuristic for the threaded sampling kernel.

    The per-draw cost is dominated by the random CSR gather (~15 ns), so
    extra threads only pay once each owns enough draws to amortize spawn
    AND the shared memory bandwidth (measured on a 2-core host: 2 threads
    lose below ~200K draws, win 1.5x at 650K). Any thread count is
    bit-identical (counter-based RNG), so this is purely a speed knob.
    """
    cores = os.cpu_count() or 1
    return max(1, min(cores, (m * k) // 131072))


def sample_layer(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    out_nodes: np.ndarray,
    k: int,
    base: int,
    mode: str = "gcn",
    threads: "int | None" = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-fanout neighbor picks + CSR gather + aggregation weights.

    One fused native pass when the library is available; the NumPy fallback
    is bit-identical (both draw pick ``(i, j)`` as
    ``splitmix64(base + i*k + j) % deg``). ``mode='gcn'`` scales gathered
    edge weights by ``deg/k`` (unbiased ``A_hat`` row estimator);
    ``'mean'`` uses ``1/k``. Zero-degree rows emit the node itself with
    weight 0. The native call releases the GIL, so prefetch-threaded
    sampling overlaps with device compute.

    ``threads``: native row-parallelism (None = auto by batch size; results
    are bit-identical for ANY thread count — the RNG is a pure counter hash
    and rows own disjoint output slots).
    """
    m = int(out_nodes.size)
    mode_i = 0 if mode == "gcn" else 1
    lib = _load()
    if lib is not None:
        nodes = np.ascontiguousarray(out_nodes, np.int64)
        cols = np.empty((m, k), np.int64)
        wts = np.empty((m, k), np.float32)
        n_threads = (
            _auto_sample_threads(m, k) if threads is None else max(1, threads)
        )
        if n_threads > 1 and hasattr(lib, "gk_sample_layer_mt"):
            lib.gk_sample_layer_mt(
                _ptr(np.ascontiguousarray(indptr, np.int64), _i64p),
                _ptr(np.ascontiguousarray(indices, np.int64), _i64p),
                _ptr(np.ascontiguousarray(data, np.float32), _f32p),
                _ptr(nodes, _i64p), m, k, ctypes.c_uint64(base & _M64),
                mode_i, n_threads, _ptr(cols, _i64p), _ptr(wts, _f32p),
            )
        else:
            lib.gk_sample_layer(
                _ptr(np.ascontiguousarray(indptr, np.int64), _i64p),
                _ptr(np.ascontiguousarray(indices, np.int64), _i64p),
                _ptr(np.ascontiguousarray(data, np.float32), _f32p),
                _ptr(nodes, _i64p), m, k, ctypes.c_uint64(base & _M64),
                mode_i, _ptr(cols, _i64p), _ptr(wts, _f32p),
            )
        return cols, wts

    nodes = np.asarray(out_nodes, np.int64)
    deg = indptr[nodes + 1] - indptr[nodes]
    counters = (
        _U64(base & _M64)
        + (np.arange(m, dtype=np.uint64) * _U64(k))[:, None]
        + np.arange(k, dtype=np.uint64)[None, :]
    )
    picks = (_mix64_np(counters) % np.maximum(deg, 1).astype(np.uint64)[:, None]).astype(np.int64)
    if indices.size == 0:  # edgeless graph: every row is the deg==0 case
        return nodes[:, None].repeat(k, 1), np.zeros((m, k), np.float32)
    # zero-degree rows may index past the end of their (empty) CSR row; the
    # clamp keeps the gather in bounds — their values are overwritten below
    flat = np.minimum(indptr[nodes][:, None] + picks, indices.size - 1)
    cols = indices[flat].astype(np.int64, copy=False)
    w = data[flat].astype(np.float32, copy=False)
    if mode_i == 0:
        wts = w * (deg[:, None].astype(np.float32) / np.float32(k))
    else:
        wts = np.full((m, k), 1.0 / k, np.float32)
    has_edges = deg > 0
    wts = np.where(has_edges[:, None], wts, 0.0).astype(np.float32)
    cols = np.where(has_edges[:, None], cols, nodes[:, None])
    return cols, wts


def parse_edge_list(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    n = lib.gk_parse_edge_list(path.encode(), None, None, 0)
    if n < 0:
        raise FileNotFoundError(path)
    a = np.empty(n, np.int64)
    b = np.empty(n, np.int64)
    got = lib.gk_parse_edge_list(path.encode(), _ptr(a, _i64p), _ptr(b, _i64p), n)
    return a[:got], b[:got]
