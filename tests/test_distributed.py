"""Distributed init helper: single-process no-op path, info shape, and a real
2-process CPU smoke test (coordinator on localhost) asserting process_count==2
and a cross-process psum (VERDICT r1 #8; SURVEY §2.3 multi-host story)."""

import os
import socket
import subprocess
import sys

from anime_illust_image_searcher_tpu.parallel import distributed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
import numpy as np
from anime_illust_image_searcher_tpu.parallel import distributed

mode = sys.argv[1]
if mode == "args":
    ok = distributed.initialize(coordinator_address=sys.argv[2],
                                num_processes=2, process_id=int(sys.argv[3]))
else:  # env-var path
    ok = distributed.initialize()
assert ok is True

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

info = distributed.process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info

# psum across processes: a global array row-sharded over all 4 devices
# (2 per process), summed to a replicated scalar.
mesh = jax.make_mesh((4,), ("d",))
sharding = NamedSharding(mesh, P("d"))
local = np.full((2,), 1.0 + jax.process_index(), np.float32)  # proc0: 1s, proc1: 2s
garr = jax.make_array_from_process_local_data(sharding, local, global_shape=(4,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
assert float(np.asarray(total.addressable_data(0))) == 6.0  # 2*1 + 2*2

from jax.experimental import multihost_utils
ranks = multihost_utils.process_allgather(
    np.array([jax.process_index()], np.int32))
assert sorted(np.ravel(ranks).tolist()) == [0, 1], ranks
print(f"DIST_OK_{jax.process_index()}")
"""


def test_single_process_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert distributed.initialize() is False


def test_process_info_keys():
    info = distributed.process_info()
    assert set(info) == {
        "process_index", "process_count", "local_devices", "global_devices"
    }
    assert info["process_count"] >= 1


_ENGINE_WORKER = """
import sys
import numpy as np
from anime_illust_image_searcher_tpu.parallel import distributed
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh
from anime_illust_image_searcher_tpu.search.engine import SearchEngine

art_dir, coord, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
assert distributed.initialize(coordinator_address=coord, num_processes=2,
                              process_id=pid) is True
import jax
assert len(jax.devices()) == 4  # 2 local per process

# Disable the elbow tail cut for this comparison: its position is defined by
# consecutive score diffs crossing 1e-6, so GSPMD's ulp-level reduction noise
# can legitimately move it at a near-tie — this test pins the SPMD plumbing,
# not the elbow's tie behavior (which tests/test_filters.py covers).
import dataclasses
from anime_illust_image_searcher_tpu.config import DEFAULT_CONFIG
cfg = dataclasses.replace(
    DEFAULT_CONFIG,
    search=dataclasses.replace(DEFAULT_CONFIG.search, diff_filter_thresh=0.0))

single = SearchEngine(art_dir, config=cfg)
expected = single.find_similar_documents("1girl smile", topn=50)

mesh = make_mesh(n_data=4)
sharded = SearchEngine(art_dir, config=cfg, mesh=mesh)
got = sharded.find_similar_documents("1girl smile", topn=50)

# GSPMD's different reduction order can flip ulp-level score ties; any id
# mismatch must be such a tie (same multiset, near-equal scores at the
# swapped positions) — a real ranking divergence still fails
ids_g, ids_e = [d for d, _ in got], [d for d, _ in expected]
if ids_g != ids_e:
    assert sorted(ids_g) == sorted(ids_e), (ids_g, ids_e)
    for (dg, vg), (de, ve) in zip(got, expected):
        if dg != de:
            assert abs(vg - ve) <= 1e-5 + 1e-4 * abs(ve), (dg, de, vg, ve)
np.testing.assert_allclose([v for _, v in got], [v for _, v in expected],
                           rtol=1e-4, atol=1e-5)
print(f"DIST_ENGINE_OK_{jax.process_index()}")
"""


def test_two_process_sharded_engine(tmp_path):
    """Multi-host serving: every process loads the artifacts, contributes its
    index shards (mesh.put_global), and runs the same SPMD fused query — results
    must match the single-device engine."""
    import numpy as np

    from anime_illust_image_searcher_tpu.cli import genmodel
    from anime_illust_image_searcher_tpu.index import artifacts

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rng = np.random.RandomState(7)
        pools = [["1girl", "solo", "smile", "black_hair", "dress"],
                 ["1boy", "male_focus", "sword", "armor", "standing"]]
        lines = []
        for i in range(48):
            tags = list(rng.choice(pools[i % 2], size=rng.randint(3, 5),
                                   replace=False))
            lines.append(f"/img/{i:03d}.png,{','.join(tags)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "8"])
    finally:
        os.chdir(cwd)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": REPO,
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _ENGINE_WORKER, str(tmp_path), coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"stdout:\n{out}\nstderr:\n{err}"
    assert "DIST_ENGINE_OK_0" in outs[0][0]
    assert "DIST_ENGINE_OK_1" in outs[1][0]


_TRAIN_WORKER = """
import sys
import numpy as np
from anime_illust_image_searcher_tpu.parallel import distributed
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh
from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel

coord, pid = sys.argv[1], int(sys.argv[2])
assert distributed.initialize(coordinator_address=coord, num_processes=2,
                              process_id=pid) is True
import jax

rng = np.random.RandomState(5)
pools = [[f"a{i}" for i in range(10)], [f"b{i}" for i in range(10)]]
corpus = [list(rng.choice(pools[i % 2], size=6, replace=False)) for i in range(32)]
cfg = Doc2VecConfig(vector_size=16, epochs=4, max_doc_len=8, sample=0.0)

single = Doc2VecModel.train(corpus, cfg, batch_size=8)
dp = Doc2VecModel.train(corpus, cfg, batch_size=8, mesh=make_mesh(n_data=4))
np.testing.assert_allclose(dp.docvecs, single.docvecs, rtol=1e-4, atol=1e-5)
np.testing.assert_allclose(dp.syn1neg, single.syn1neg, rtol=1e-4, atol=1e-5)
print(f"DIST_TRAIN_OK_{jax.process_index()}")
"""


def test_two_process_dp_training():
    """genmodel --data-parallel across hosts: PV-DBOW training over a
    process-spanning mesh must reproduce the single-device run."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": REPO,
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    procs = [
        subprocess.Popen([sys.executable, "-c", _TRAIN_WORKER, coord, str(i)],
                         env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"stdout:\n{out}\nstderr:\n{err}"
    assert "DIST_TRAIN_OK_0" in outs[0][0]
    assert "DIST_TRAIN_OK_1" in outs[1][0]


def test_two_process_psum():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    base_env = dict(os.environ)
    base_env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": REPO,
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    # proc 0 initializes via explicit args, proc 1 via the env-var path — covers
    # both branches of distributed.initialize.
    env1 = dict(base_env)
    env1.update({"JAX_COORDINATOR_ADDRESS": coord, "JAX_NUM_PROCESSES": "2",
                 "JAX_PROCESS_ID": "1"})
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, "args", coord, "0"],
                         env=base_env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True),
        subprocess.Popen([sys.executable, "-c", _WORKER, "env"],
                         env=env1, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True),
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"stdout:\n{out}\nstderr:\n{err}"
    assert "DIST_OK_0" in outs[0][0]
    assert "DIST_OK_1" in outs[1][0]
