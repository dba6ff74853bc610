"""Tests run on a virtual 8-device CPU mesh (the JAX substitute for a pod,
SURVEY.md §4 item 4).

The container's sitecustomize imports jax at interpreter boot and registers
the axon TPU plugin, so env vars set here are too late for backend
*registration* — but backend *selection* is lazy, so forcing
`jax_platforms=cpu` through jax.config before the first jax.devices() call
still wins. XLA_FLAGS must also precede first backend init.
"""

import os
import subprocess
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

# Build the native extraction engine up front (one ~2s g++ invocation) so the
# 7 C++==oracle equivalence tests run instead of silently skipping on a fresh
# clone. A failed build falls through: those tests then skip with a reason.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "gmeta_tpu", "data", "_native_extract.so")
if not os.path.exists(_SO):
    r = subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(f"conftest: native engine build failed:\n{r.stderr}",
              file=sys.stderr)
