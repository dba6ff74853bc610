"""Episodic task sampling.

Replicates the reference's pre-sampling of ALL `batchsz` tasks at dataset
construction (subgraph_data_processing.py:150-292) for the three regimes:

- Disjoint (create_batch_disjoint :150-182): sample n_way classes globally,
  k_shot + k_query items per class, split, shuffle class order.
- Shared   (create_batch_shared :184-247): sample ONE graph, use all of its
  classes (n_way is ignored), k_shot + k_query items per class; a fallback
  path pads short classes with random borrow (stated "not used in practice",
  :218-240).
- LinkPred (create_batch_LinkPred :249-292): one graph; k_shot edges per
  class from the support pool and k_query from the query pool.

Uses a self-contained numpy RandomState instead of the reference's global
np.random/random state; §6 reproduction is statistical, not bitwise.
"""

from __future__ import annotations

from typing import List

import numpy as np

from gmeta_tpu.data.io import SplitIndex


class EpisodeSampler:
    def __init__(self, task_setup: str, link_pred_mode: bool,
                 n_way: int, k_shot: int, k_query: int, batchsz: int,
                 index: SplitIndex, index_spt: SplitIndex = None,
                 index_qry: SplitIndex = None, seed: int = 222):
        self.task_setup = task_setup
        self.link_pred_mode = link_pred_mode
        self.n_way = n_way
        self.k_shot = k_shot
        self.k_query = k_query
        self.batchsz = batchsz
        self.rng = np.random.RandomState(seed)

        # support_x_batch / query_x_batch: [batchsz][n_classes][k] name strings
        self.support_x_batch: List[List[List[str]]] = []
        self.query_x_batch: List[List[List[str]]] = []

        if task_setup == "Disjoint":
            self.data = list(index.dictLabels.values())
            self.cls_num = len(self.data)
            self._create_batch_disjoint()
        elif task_setup == "Shared" and not link_pred_mode:
            # graph -> [per-label name lists], in dict insertion order
            # (subgraph_data_processing.py:98-116)
            graph_keys = list(index.dictGraphs.keys())
            rel = {k: i for i, k in enumerate(graph_keys)}
            self.data_label = [[] for _ in graph_keys]
            for k, v in index.dictGraphsLabels.items():
                for names in v.values():
                    self.data_label[rel[k]].append(names)
            self.graph_num = len(graph_keys)
            self.cls_num = len(self.data_label[0])
            self._create_batch_shared()
        elif task_setup == "Shared" and link_pred_mode:
            assert index_spt is not None and index_qry is not None
            def per_graph(ix):
                keys = list(ix.dictGraphs.keys())
                rel = {k: i for i, k in enumerate(keys)}
                data = [[] for _ in keys]
                for k, v in ix.dictGraphsLabels.items():
                    for names in v.values():
                        data[rel[k]].append(names)
                return data
            self.data_label_spt = per_graph(index_spt)
            self.data_label_qry = per_graph(index_qry)
            self.graph_num = len(self.data_label_spt)
            self.cls_num = len(self.data_label_spt[0])
            self._create_batch_link_pred()
        else:
            raise ValueError(task_setup)

    # --- regimes -----------------------------------------------------------

    def _create_batch_disjoint(self):
        for _ in range(self.batchsz):
            selected_cls = self.rng.choice(self.cls_num, self.n_way, replace=False)
            self.rng.shuffle(selected_cls)
            support_x, query_x = [], []
            for cls in selected_cls:
                pool = self.data[cls]
                idx = self.rng.choice(len(pool), self.k_shot + self.k_query,
                                      replace=False)
                self.rng.shuffle(idx)
                support_x.append([pool[i] for i in idx[:self.k_shot]])
                query_x.append([pool[i] for i in idx[self.k_shot:]])
            self._shuffle_sets(support_x, query_x)

    def _create_batch_shared(self):
        for _ in range(self.batchsz):
            g = self.rng.choice(self.graph_num)
            data = self.data_label[g]
            selected_cls = np.arange(len(data))
            self.rng.shuffle(selected_cls)
            support_x, query_x = [], []
            for cls in selected_cls:
                pool = data[cls]
                if len(pool) >= self.k_shot + self.k_query:
                    idx = self.rng.choice(len(pool), self.k_shot + self.k_query,
                                          replace=False)
                    self.rng.shuffle(idx)
                    support_x.append([pool[i] for i in idx[:self.k_shot]])
                    query_x.append([pool[i] for i in idx[self.k_shot:]])
                elif len(pool) >= self.k_shot:
                    # Reference fallback (:218-240): take k_shot for support,
                    # the rest for query, then pad the query with random
                    # borrows from the graph's classes.
                    idx = np.arange(len(pool))
                    self.rng.shuffle(idx)
                    support_x.append([pool[i] for i in idx[:self.k_shot]])
                    query_tmp = [pool[i] for i in idx[self.k_shot:]]
                    while len(query_tmp) < self.k_query:
                        sub_cls = self.rng.choice(len(data))
                        j = self.rng.choice(len(data[sub_cls]))
                        query_tmp.append(data[sub_cls][j])
                    query_x.append(query_tmp[:self.k_query])
                else:
                    raise ValueError(
                        "each class in a graph must have at least k_shot items")
            self._shuffle_sets(support_x, query_x)

    def _create_batch_link_pred(self):
        for _ in range(self.batchsz):
            g = self.rng.choice(self.graph_num)
            data_spt, data_qry = self.data_label_spt[g], self.data_label_qry[g]
            cls_spt = np.arange(len(data_spt)); self.rng.shuffle(cls_spt)
            cls_qry = np.arange(len(data_qry)); self.rng.shuffle(cls_qry)
            support_x, query_x = [], []
            for cls in cls_spt:
                pool = data_spt[cls]
                idx = self.rng.choice(len(pool), self.k_shot, replace=False)
                self.rng.shuffle(idx)
                support_x.append([pool[i] for i in idx])
            for cls in cls_qry:
                pool = data_qry[cls]
                idx = self.rng.choice(len(pool), self.k_query, replace=False)
                self.rng.shuffle(idx)
                query_x.append([pool[i] for i in idx])
            self._shuffle_sets(support_x, query_x)

    def _shuffle_sets(self, support_x, query_x):
        # random.shuffle of the class rows (subgraph_data_processing.py:177-178)
        self.rng.shuffle(support_x)
        self.rng.shuffle(query_x)
        self.support_x_batch.append(support_x)
        self.query_x_batch.append(query_x)

    def __len__(self) -> int:
        return self.batchsz
