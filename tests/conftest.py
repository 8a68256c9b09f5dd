"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (SURVEY §4: multi-device tests via
xla_force_host_platform_device_count so N-way sharding runs without a pod).
"""

import os

# Force, don't setdefault: this machine globally sets JAX_PLATFORMS=axon (the
# tunneled TPU); tests must run on the virtual CPU mesh.  The axon
# sitecustomize imports jax at interpreter start, so env vars alone are too
# late — jax.config.update is required (works as long as no backend has been
# initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC01B37)


def random_docs(rng, num_docs, lo=30, hi=120, alphabet=b"ACGT", mutate_from=None):
    """Random DNA-like documents; if mutate_from is set, documents are noisy
    copies of one ancestor (realistic pangenome shape: long shared MUMs)."""
    docs = []
    if mutate_from is not None:
        base = mutate_from
        for _ in range(num_docs):
            arr = bytearray(base)
            n_mut = max(1, len(arr) // 20)
            for _ in range(n_mut):
                p = int(rng.integers(0, len(arr)))
                arr[p] = alphabet[int(rng.integers(0, len(alphabet)))]
            docs.append(bytes(arr))
    else:
        for _ in range(num_docs):
            m = int(rng.integers(lo, hi))
            docs.append(bytes(alphabet[int(i)] for i in rng.integers(0, len(alphabet), m)))
    return docs
