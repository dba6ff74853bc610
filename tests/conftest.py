"""Tests run on a virtual 8-device CPU mesh (the JAX substitute for a pod,
SURVEY.md §4 item 4).

The container's sitecustomize imports jax at interpreter boot and registers
the axon TPU plugin, so env vars set here are too late for backend
*registration* — but backend *selection* is lazy, so forcing
`jax_platforms=cpu` through jax.config before the first jax.devices() call
still wins. XLA_FLAGS must also precede first backend init.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
