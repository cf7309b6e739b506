"""Test harness config: run JAX on CPU with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 test plan)."""

import os

# Must be set before jax is imported anywhere. Forced (not setdefault): the host
# environment pins JAX_PLATFORMS=axon (real TPU), but tests run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter startup (before this file),
# so the env var alone is too late — jax already read JAX_PLATFORMS=axon. The
# config update below is what actually forces CPU; without it the whole suite
# silently runs on the relay'd TPU chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compile cache: repeated pytest runs skip recompiling identical programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def tmp_cwd(tmp_path, monkeypatch):
    """Run a test inside an empty temp directory (artifact files are cwd-relative,
    matching the reference's working-directory contract)."""
    monkeypatch.chdir(tmp_path)
    return tmp_path
