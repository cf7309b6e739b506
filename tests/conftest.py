"""Test harness config: run JAX on CPU with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 test plan)."""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
