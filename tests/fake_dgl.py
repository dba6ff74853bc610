"""Pickle-stable stand-in for a DGL graph object.

The real-data path starts from `graph_dgl.pkl` — a pickled list of
`dgl.DGLGraph`s (G-Meta/README.md:190-201). dgl is not installable in this
environment, so this module provides an object with the exact attribute
surface `convert_dgl_pickle` consumes (`all_edges()` returning torch
tensors, `number_of_nodes()` — gmeta_tpu/data/io.py:91-105), living in an
importable module so pickle round-trips it like the real download would.
"""

import numpy as np
import torch


class FakeDGLGraph:
    """Duck-typed dgl.DGLGraph: directed edge list + node count."""

    def __init__(self, src, dst, num_nodes):
        self._src = np.asarray(src, dtype=np.int64)
        self._dst = np.asarray(dst, dtype=np.int64)
        self._n = int(num_nodes)

    def all_edges(self):
        # dgl 0.4 returns a (src, dst) pair of torch LongTensors
        return torch.from_numpy(self._src), torch.from_numpy(self._dst)

    def number_of_nodes(self):
        return self._n
