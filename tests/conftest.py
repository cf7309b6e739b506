"""Test harness config: run JAX on CPU with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 test plan).

Set AIIS_TEST_PLATFORM=tpu to instead run against the environment's real device
(the axon-relayed TPU chip): single device, so the in-process multi-device tests
(the `_NEEDS_8_DEVICES` list below; the subprocess-isolated distributed tests pin
their own CPU env) auto-skip. The FULL suite passes on the chip (~20 min warm
cache; 343 passed / 2 skipped) — running it there caught a real TPU-only bug (reciprocal-multiply
division fabricating elbow flags at exact score ties; ops/fused_query.py
max_normalize) that the virtual CPU mesh structurally could not.
"""

import os

_TEST_PLATFORM = os.environ.get("AIIS_TEST_PLATFORM", "cpu")

# Must be set before jax is imported anywhere. Forced (not setdefault): the host
# environment pins JAX_PLATFORMS=axon (real TPU), but tests run on the virtual CPU mesh.
if _TEST_PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter startup (before this file),
# so the env var alone is too late — jax already read JAX_PLATFORMS=axon. The
# config update below is what actually forces CPU; without it the whole suite
# silently runs on the relay'd TPU chip.
import jax  # noqa: E402

if _TEST_PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compile cache: repeated pytest runs skip recompiling identical programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# In-process tests that require an 8-device mesh (the subprocess-isolated
# distributed tests pin their own CPU env and are unaffected).
_NEEDS_8_DEVICES = (
    "test_rerank_diffs_learned_metric_on_mesh",
    "test_cross_mode_checkpoint_refused",
    "test_same_mode_dp_snapshot_resumes",
    "test_cross_dp_mode_never_reuses",
)


def pytest_collection_modifyitems(config, items):
    if _TEST_PLATFORM == "cpu" or len(jax.devices()) >= 8:
        return
    marker = pytest.mark.skip(
        reason="needs 8 local devices; run on the default CPU virtual mesh"
    )
    for item in items:
        if any(name in item.nodeid for name in _NEEDS_8_DEVICES):
            item.add_marker(marker)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def tmp_cwd(tmp_path, monkeypatch):
    """Run a test inside an empty temp directory (artifact files are cwd-relative,
    matching the reference's working-directory contract)."""
    monkeypatch.chdir(tmp_path)
    return tmp_path
