"""ctypes bindings for the native extraction engine (native/extract.cpp).

Drop-in accelerated backend for SubgraphExtractor: same outputs as the
numpy oracle path (gmeta_tpu/data/extract.py), but the h-hop BFS + induced
subgraph runs in C++ with a thread pool — the rebuild of the capability the
reference gets from DGL's C++ graph store (subgraph_data_processing.py:
300-319). Build with `make -C native`; loading falls back gracefully when
the .so is absent (extract.py remains the oracle/fallback).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

from gmeta_tpu.data.extract import Subgraph
from gmeta_tpu.data.graph import CSRGraph

_SO = os.path.join(os.path.dirname(__file__), "_native_extract.so")

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.gx_new.restype = ctypes.c_void_p
    lib.gx_free.argtypes = [ctypes.c_void_p]
    lib.gx_add_graph.argtypes = [ctypes.c_void_p, _i64p, _i32p,
                                 ctypes.c_int64, ctypes.c_int64]
    lib.gx_extract_batch.argtypes = [
        ctypes.c_void_p, _i64p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32,
        _i64p]
    lib.gx_result_sizes.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    _i64p, _i64p, _i64p]
    lib.gx_result_fetch.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    _i64p, _i32p, _i32p, _i32p]
    lib.gx_clear_results.argtypes = [ctypes.c_void_p]
    return lib


_LIB = _load()


def available() -> bool:
    return _LIB is not None


class NativeEngine:
    """Owns a C++ engine with the graph set loaded once."""

    def __init__(self, graphs: Sequence[CSRGraph], n_threads: int = 0):
        assert _LIB is not None, "native engine not built (make -C native)"
        self._lib = _LIB
        self._h = self._lib.gx_new()
        self.n_threads = n_threads or (os.cpu_count() or 4)
        self._keepalive = []
        for g in graphs:
            indptr = np.ascontiguousarray(g.indptr, dtype=np.int64)
            indices = np.ascontiguousarray(g.indices, dtype=np.int32)
            self._keepalive.append((indptr, indices))
            self._lib.gx_add_graph(
                self._h, indptr.ctypes.data_as(_i64p),
                indices.ctypes.data_as(_i32p),
                ctypes.c_int64(g.num_nodes), ctypes.c_int64(g.num_edges))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.gx_free(self._h)
            self._h = None

    def extract_batch(self, items: np.ndarray, hops: int, sample_nodes: int,
                      seed: int = 222,
                      cap_strategy: str = "uniform") -> List[Subgraph]:
        """items: (N, 3) int64 rows (graph, center1, center2 or -1)."""
        items = np.ascontiguousarray(items, dtype=np.int64)
        n = len(items)
        ids = np.zeros(n, dtype=np.int64)
        self._lib.gx_extract_batch(
            self._h, items.ctypes.data_as(_i64p), ctypes.c_int64(n),
            ctypes.c_int32(hops), ctypes.c_int64(sample_nodes),
            ctypes.c_uint64(seed),
            ctypes.c_int32(1 if cap_strategy == "degree" else 0),
            ctypes.c_int32(self.n_threads),
            ids.ctypes.data_as(_i64p))
        out = []
        nn = np.zeros(1, np.int64)
        ne = np.zeros(1, np.int64)
        nc = np.zeros(1, np.int64)
        for i in range(n):
            self._lib.gx_result_sizes(
                self._h, ctypes.c_int64(ids[i]),
                nn.ctypes.data_as(_i64p), ne.ctypes.data_as(_i64p),
                nc.ctypes.data_as(_i64p))
            parents = np.zeros(int(nn[0]), np.int64)
            centers = np.zeros(int(nc[0]), np.int32)
            esrc = np.zeros(int(ne[0]), np.int32)
            edst = np.zeros(int(ne[0]), np.int32)
            self._lib.gx_result_fetch(
                self._h, ctypes.c_int64(ids[i]),
                parents.ctypes.data_as(_i64p),
                centers.ctypes.data_as(_i32p),
                esrc.ctypes.data_as(_i32p), edst.ctypes.data_as(_i32p))
            out.append(Subgraph(parents=parents, centers=centers,
                                edge_src=esrc, edge_dst=edst))
        self._lib.gx_clear_results(self._h)
        return out


class NativeSubgraphExtractor:
    """API-compatible with extract.SubgraphExtractor, C++-backed, memoized."""

    def __init__(self, graphs: Sequence[CSRGraph], h: int, sample_nodes: int,
                 seed: int = 222, n_threads: int = 0,
                 cap_strategy: str = "uniform"):
        assert cap_strategy in ("uniform", "degree"), cap_strategy
        self.engine = NativeEngine(graphs, n_threads=n_threads)
        self.h = h
        self.sample_nodes = sample_nodes
        self.seed = seed
        self.cap_strategy = cap_strategy
        self.cache = {}

    def extract(self, name: str) -> Subgraph:
        return self.extract_many([name])[0]

    def extract_node(self, g: int, i: int, name: str) -> Subgraph:
        return self.extract_many([f"{g}_{i}"])[0]

    def extract_link(self, g: int, i: int, j: int, name: str) -> Subgraph:
        return self.extract_many([f"{g}_{i}_{j}"])[0]

    def extract_many(self, names: Sequence[str]) -> List[Subgraph]:
        # sorted: set iteration order depends on PYTHONHASHSEED; the engine's
        # per-item RNG is content-derived so order no longer changes results,
        # but a deterministic batch order keeps thread scheduling replayable.
        missing = sorted(n for n in set(names) if n not in self.cache)
        if missing:
            items = np.full((len(missing), 3), -1, dtype=np.int64)
            for k, n in enumerate(missing):
                parts = [int(p) for p in n.split("_")]
                items[k, :len(parts)] = parts
            subs = self.engine.extract_batch(items, self.h, self.sample_nodes,
                                             seed=self.seed,
                                             cap_strategy=self.cap_strategy)
            for n, s in zip(missing, subs):
                self.cache[n] = s
        return [self.cache[n] for n in names]
