"""Two-process jax.distributed bring-up + sharded train step (VERDICT r2
item 6; SURVEY.md §4 tier 4, §2.4).

Spawns two REAL processes (2 virtual CPU devices each) that meet at a
jax.distributed coordinator through gmeta_tpu.parallel.mesh.init_multihost,
run two task-DP sharded meta-train steps over the global 4-device mesh, and
must produce the exact params of the same run in a single 4-device process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO  # drop the axon sitecustomize; pure CPU run
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.timeout(600)
@pytest.mark.parametrize("mode", ["dp", "edgepart"])
def test_two_process_distributed_matches_single_process(tmp_path, mode):
    """mode 'dp': task-DP mesh(task=4). mode 'edgepart': the edge-
    partitioned engine over ('task','edge') = (2,2) — each process owns one
    row of the mesh, so the halo all_to_all AND the task psum cross the
    process boundary (VERDICT r4 item 6)."""
    port = _free_port()
    out2 = str(tmp_path / "two.npz")
    out1 = str(tmp_path / "one.npz")

    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port), out2, mode],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)

    r = subprocess.run(
        [sys.executable, _WORKER, "0", "1", str(port), out1, mode],
        env=_env(), capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr

    two, one = np.load(out2), np.load(out1)
    assert np.isfinite(float(two["loss"]))
    np.testing.assert_allclose(float(two["loss"]), float(one["loss"]),
                               rtol=1e-5, atol=1e-6)
    arrs = [k for k in two.files if k != "loss"]
    assert arrs
    # The head bias's true gradient is exactly zero (uniform logit shifts
    # cancel in prototype distances), so Adam amplifies reduction-order
    # float noise to ~1e-4 there; every other parameter must match tightly.
    last = f"arr_{len(arrs) - 1}"
    for k in arrs:
        atol = 5e-4 if k == last else 1e-6
        np.testing.assert_allclose(two[k], one[k], rtol=1e-5, atol=atol)
