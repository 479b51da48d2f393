"""Native (C++) runtime components, bound via ctypes.

The reference is pure Julia with NNlib supplying native kernels from outside
the repo (SURVEY §0); here the host-side hot loops — neighbor sampling for
the minibatch pipeline — are C++ (sampler.cc), compiled on first use with
the system toolchain and cached next to the source. The TPU compute path
itself is JAX/XLA/Pallas and needs no host kernels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["sample_layers", "available"]

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_sampler.so")
_SRC = os.path.join(_HERE, "sampler.cc")
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            fn = lib.gnn_sample_layers
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            fn.restype = ctypes.c_int64
            fn.argtypes = [i32p, i32p, i64p, i64p, ctypes.c_int64, i64p,
                           ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64,
                           ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                           i64p, i32p, i32p, i64p, i64p, i64p]
            _lib = lib
        except Exception:
            _failed = True
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def sample_layers(csr_send: np.ndarray, csr_eid: np.ndarray,
                  ptr: np.ndarray, seeds: np.ndarray,
                  fanouts, replace: bool, seed: int):
    """C++ layered neighbor expansion; see sampler.cc.

    ``csr_send``/``csr_eid`` are int32 CSR-position-ordered sender ids and
    original edge ids (= senders[order] and order for the receiver sort) —
    the latency-friendly layout the kernel expects. Raises if the native
    library is unavailable (callers fall back to the numpy path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native sampler unavailable")
    csr_send = np.ascontiguousarray(csr_send, np.int32)
    csr_eid = np.ascontiguousarray(csr_eid, np.int32)
    ptr = np.ascontiguousarray(ptr, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    fanouts = np.ascontiguousarray(fanouts, np.int64)

    cap_nodes = len(seeds)
    cap_edges = 0
    frontier = len(seeds)
    for k in fanouts:
        cap_edges += frontier * int(k)
        frontier *= int(k)
        cap_nodes += frontier
    cap_nodes = max(cap_nodes, 1)
    cap_edges = max(cap_edges, 1)

    nid = np.empty(cap_nodes, np.int64)
    es = np.empty(cap_edges, np.int32)
    er = np.empty(cap_edges, np.int32)
    eid = np.empty(cap_edges, np.int64)
    n_nodes = np.zeros(1, np.int64)
    n_edges = np.zeros(1, np.int64)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    rc = lib.gnn_sample_layers(
        p32(csr_send), p32(csr_eid), p64(ptr), p64(seeds),
        ctypes.c_int64(len(seeds)), p64(fanouts),
        ctypes.c_int64(len(fanouts)), ctypes.c_int32(int(replace)),
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
        ctypes.c_int64(len(ptr) - 1),
        ctypes.c_int64(cap_nodes), ctypes.c_int64(cap_edges),
        p64(nid), p32(es), p32(er), p64(eid), p64(n_nodes), p64(n_edges))
    if rc != 0:
        raise RuntimeError(f"native sampler overflow/err rc={rc}")
    nn, ne = int(n_nodes[0]), int(n_edges[0])
    return nid[:nn], es[:ne], er[:ne], eid[:ne]
