"""Test harness: force an 8-device virtual CPU mesh before JAX loads.

This is the TPU-world substitute for multi-chip hardware (SURVEY §4): all
sharding/collective paths compile and run on 8 host-platform devices.
"""

import os

# FORCE cpu: the dev box's sitecustomize registers the tunneled-TPU 'axon'
# backend and sets jax_platforms='axon,cpu' via jax.config — overriding both
# the env var and in-process os.environ. Tests must run on the local virtual
# 8-device CPU mesh, so override the CONFIG after import, before any backend
# is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices share ONE physical core here; XLA:CPU collectives
    # hard-CHECK (SIGABRT) if a rendezvous doesn't fully assemble within
    # 40 s, which a concurrent compile/bench on the same host can trigger.
    # Raise the termination timeout so load spikes surface as slow tests,
    # never as a crashed interpreter (observed: all-to-all rendezvous
    # termination at rendezvous.cc:127 under a parallel TPU-compile job).
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: XLA:CPU compiles are minutes-slow on the 1-core
# CI host; cache across runs so only the first run pays. The directory is
# scoped by host machine features (utils/cache.py): XLA:CPU AOT entries are
# host-ISA-specific, and loading another machine's entries silently shifted
# numerics by ~0.6% in round 1 — a foreign cache now just misses.
from cstp_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache("/root/repo/.jax_cache")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
