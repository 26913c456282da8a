"""Test env: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4 "distributed-without-a-cluster": tests force the CPU platform
with 8 virtual devices so the pjit/mesh code paths run in CI exactly as they
would on a v4-8/v5e-8; the same tests run unchanged on real TPU.
Must set env BEFORE jax is imported anywhere.
"""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the machine presets
# JAX_PLATFORMS=axon for the real TPU; tests must use the virtual mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The machine's sitecustomize force-registers the axon TPU platform even when
# JAX_PLATFORMS=cpu is in the env; the config update (pre-backend-init) wins.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the scan-heavy model paths dominate test wall
# time.  Must be config.update, NOT env vars — sitecustomize imports jax at
# interpreter startup, so env set here is read too late and silently ignored
# (measured: the r3-era env lines never wrote a single entry during a suite
# run).  See mmtraj/utils/compile_cache.py.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """Small deterministic synthetic dataset shared by the whole session."""
    from mmtraj.data.synthetic import write_synthetic_dataset

    d = tmp_path_factory.mktemp("data")
    write_synthetic_dataset(str(d), seed=0, n_frames=120)
    return str(d)
