"""Checkpoint / resume.

The reference has none — its one torch.save is commented out
(G-Meta/train.py:143) and the best model lives only in RAM via deepcopy, so
a crash loses the run (SURVEY.md §5.4). Here the full training state —
params, Adam state, epoch / in-epoch batch position / global step counters,
and the early-stopping best snapshot with its val acc — is serialized so
resume restores the exact protocol state. Data order needs no RNG blob: the
epoch's task order is a pure function of (config seed, epoch), so the saved
in-epoch position alone pins the remaining stream (pipeline.batches
`seed` + `skip_batches`).

Format: a pickle of a numpy-ified pytree (params are a flat tuple of
arrays; optax states are namedtuple pytrees that pickle cleanly). Writes
are atomic (tmp + rename); `latest` symlink tracks the newest checkpoint.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import numpy as np


def _to_numpy(tree):
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(ckpt_dir: str, step: int, state: Dict[str, Any]) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(state), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    latest = os.path.join(ckpt_dir, "latest")
    tmp_link = latest + ".tmp"
    if os.path.islink(tmp_link) or os.path.exists(tmp_link):
        os.remove(tmp_link)
    os.symlink(os.path.basename(path), tmp_link)
    os.replace(tmp_link, latest)
    return path


def latest_path(ckpt_dir: str) -> Optional[str]:
    p = os.path.join(ckpt_dir, "latest")
    if os.path.exists(p):
        return os.path.join(ckpt_dir, os.readlink(p)) if os.path.islink(p) else p
    cands = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_")) if os.path.isdir(ckpt_dir) else []
    return os.path.join(ckpt_dir, cands[-1]) if cands else None


def restore(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
