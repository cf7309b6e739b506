"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The axon TPU sitecustomize in this image pins the process to one device, so these
tests run the mesh code in a subprocess with a scrubbed environment (the standard
``xla_force_host_platform_device_count`` technique then works).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_in_clean_env(code: str, timeout: int = 900) -> str:
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",           # disable the axon TPU plugin
        "PYTHONPATH": REPO,
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    return out.stdout


def test_virtual_mesh_available():
    out = run_in_clean_env("import jax; print(len(jax.devices()))")
    assert out.strip().splitlines()[-1] == "8"


def test_dryrun_multichip_8():
    out = run_in_clean_env(
        "import sys; sys.path.insert(0, %r);"
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)" % REPO
    )
    assert "doc2vec dp train step OK" in out
    assert "vit dp+tp forward OK" in out
    assert "sharded index top-k OK" in out


def test_dryrun_multichip_2():
    out = run_in_clean_env(
        "import sys; sys.path.insert(0, %r);"
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(2)" % REPO
    )
    assert "sharded index top-k OK" in out


def test_sharded_index_matches_unsharded():
    code = """
import numpy as np, jax
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh
from anime_illust_image_searcher_tpu.parallel.sharded_index import ShardedSimilarityIndex

rng = np.random.RandomState(0)
matrix = rng.randn(103, 32).astype(np.float32)   # deliberately not divisible by 8
matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
q = matrix[17]
mesh = make_mesh(n_data=8)
idx = ShardedSimilarityIndex(matrix, mesh)
scores = idx.scores(q)
expected = matrix @ q
np.testing.assert_allclose(scores, expected, rtol=1e-5, atol=1e-6)
vals, ids = idx.top_k(q, k=10)
order = np.argsort(-expected)[:10]
np.testing.assert_array_equal(ids, order)
np.testing.assert_allclose(vals, expected[order], rtol=1e-5)
print("SHARDED_OK")
"""
    out = run_in_clean_env(code)
    assert "SHARDED_OK" in out
