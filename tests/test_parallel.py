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


def test_sharded_engine_matches_single_device(tmp_path):
    """The fused query over a row-sharded 8-device mesh must return exactly what the
    single-device engine returns (GSPMD partitioning is semantics-preserving)."""
    code = f"""
import os
os.chdir({str(tmp_path)!r})
import numpy as np
from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.search.engine import SearchEngine
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

rng = np.random.RandomState(0)
pools = [
    ["1girl", "solo", "smile", "black_hair", "dress"],
    ["1boy", "male_focus", "sword", "armor", "standing"],
    ["no_humans", "white_background", "still_life", "bottle", "flower"],
]
lines = []
for i in range(45):   # deliberately not divisible by 8
    tags = list(rng.choice(pools[i % 3], size=rng.randint(3, 5), replace=False))
    lines.append(f"/img/{{i:03d}}.png,{{','.join(tags)}}")
with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
    f.write("\\n".join(lines) + "\\n")
genmodel.main(["--epochs", "10"])

# elbow disabled for the comparison: its cut position keys on consecutive
# diffs crossing 1e-6, so GSPMD's ulp-level reduction noise can move it at a
# near-tie (this test pins SPMD plumbing; test_filters pins elbow behavior)
import dataclasses
from anime_illust_image_searcher_tpu.config import DEFAULT_CONFIG
cfg = dataclasses.replace(
    DEFAULT_CONFIG,
    search=dataclasses.replace(DEFAULT_CONFIG.search, diff_filter_thresh=0.0))

single = SearchEngine(".", config=cfg)
mesh = make_mesh(n_data=8)
sharded = SearchEngine(".", config=cfg, mesh=mesh)
for q in ["1girl", "sword black_hair", "1girl smile:2", "no_humans bottle:+1"]:
    a = single.find_similar_documents(q, topn=800)
    b = sharded.find_similar_documents(q, topn=800)
    ids_a, ids_b = [d for d, _ in a], [d for d, _ in b]
    if ids_a != ids_b:  # any order difference must be an ulp-level score tie
        assert sorted(ids_a) == sorted(ids_b), (q, ids_a, ids_b)
        for (da, va), (db, vb) in zip(a, b):
            if da != db:
                assert abs(va - vb) <= 1e-5 + 1e-4 * abs(va), (q, da, db, va, vb)
    np.testing.assert_allclose([s for _, s in a], [s for _, s in b], rtol=1e-4, atol=1e-5)
print("SHARDED_ENGINE_OK")
"""
    out = run_in_clean_env(code)
    assert "SHARDED_ENGINE_OK" in out


def test_dp_tagger_matches_single_device(tmp_path):
    """Batch-sharded tagging over the mesh must produce the same tag lines."""
    code = f"""
import os
os.chdir({str(tmp_path)!r})
import numpy as np
from PIL import Image
from anime_illust_image_searcher_tpu.config import TaggerConfig
from anime_illust_image_searcher_tpu.models.eva02 import tiny_test_config
from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

TINY = tiny_test_config()
cfg = TaggerConfig(batch_size=8, image_size=TINY.img_size)
rng = np.random.RandomState(0)
batch = rng.randint(0, 255, (8, TINY.img_size, TINY.img_size, 3), dtype=np.uint8)

single = TaggerPredictor(config=cfg, model_cfg=TINY, use_pallas=False)
lines_a = single.predict(batch, 0.3, True, 0.3, True)

mesh = make_mesh(n_data=8)
dp = TaggerPredictor(config=cfg, model_cfg=TINY, use_pallas=False, mesh=mesh)
lines_b = dp.predict(batch, 0.3, True, 0.3, True)
assert lines_a == lines_b, (lines_a[:2], lines_b[:2])
print("DP_TAGGER_OK")
"""
    out = run_in_clean_env(code)
    assert "DP_TAGGER_OK" in out


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


def test_sharded_character_stage_a_matches_single_device():
    """The character-mode stage A program (fused scores + device top-k) must
    return identical top-k ids/values from a row-sharded 8-device mesh as from
    one device, padding rows masked (the same GSPMD plumbing contract as the
    normal fused program)."""
    code = """
import numpy as np, jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from anime_illust_image_searcher_tpu.ops.fused_query import (
    fused_character_top, pack_query)
from anime_illust_image_searcher_tpu.parallel.mesh import (
    DATA_AXIS, make_mesh, pad_to_multiple)

rng = np.random.RandomState(3)
D, F, V, W = 203, 24, 50, 6      # deliberately not divisible by 8
matrix = rng.randn(D, F).astype(np.float32)
matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
term_mat = rng.randint(0, V, (D, W)).astype(np.int32)
contrib = np.abs(rng.randn(D, W)).astype(np.float32)
packed = pack_query(rng.randn(F).astype(np.float32),
                    {3: 1.0, 7: 2.0, 11: -1.0}, V, magic=1000, max_terms=8)

single = np.asarray(fused_character_top(
    jnp.asarray(matrix), jnp.asarray(term_mat), jnp.asarray(contrib),
    packed, 0.5, 0.5, vocab_size=V, num_docs=D, k=10, num_real=D))

mesh = make_mesh(n_data=8)
mat_p, _ = pad_to_multiple(matrix, 8)
tm_p, _ = pad_to_multiple(term_mat, 8)
tm_p = tm_p.copy(); tm_p[D:] = V          # sentinel ids on padding rows
cb_p, _ = pad_to_multiple(contrib, 8)
rs = NamedSharding(mesh, P(DATA_AXIS, None))
sharded = np.asarray(fused_character_top(
    jax.device_put(mat_p, rs), jax.device_put(tm_p, rs),
    jax.device_put(cb_p, rs), packed, 0.5, 0.5,
    vocab_size=V, num_docs=mat_p.shape[0], k=10, num_real=D))

np.testing.assert_array_equal(single[10:], sharded[10:])     # ids exact
np.testing.assert_allclose(single[:10], sharded[:10], rtol=1e-5, atol=1e-6)
print("SHARDED_CHAR_OK")
"""
    out = run_in_clean_env(code)
    assert "SHARDED_CHAR_OK" in out


def test_sharded_character_one_dispatch_matches_single_device(tmp_path):
    """The WHOLE-query one-dispatch character program over a mesh engine
    (doc arrays row-sharded, cfeature arrays row-sharded, doc→row map
    replicated, padding masked) must return what the single-device engine
    returns — and must actually dispatch as one call on BOTH engines."""
    code = f"""
import os
os.chdir({str(tmp_path)!r})
import numpy as np
from PIL import Image
from anime_illust_image_searcher_tpu.cli import gen_cfeatures, genmodel
from anime_illust_image_searcher_tpu.config import CCIPConfig, DEFAULT_CONFIG
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.models.caformer import tiny_test_config
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh
from anime_illust_image_searcher_tpu.search.engine import SearchEngine
from anime_illust_image_searcher_tpu.search.rerank_ccip import CCIPReranker

TINY = tiny_test_config()
CFG = CCIPConfig(image_size=TINY.img_size, feature_dim=TINY.feature_dim,
                 batch_size=4, decode_workers=2)
rng = np.random.RandomState(3)
os.makedirs("imgs")
pools = [["1girl", "solo", "smile", "black_hair"],
         ["1boy", "sword", "armor", "standing"]]
lines = []
for i in range(27):   # deliberately not divisible by 8
    p = os.path.abspath(f"imgs/{{i:02d}}.png")
    Image.fromarray(rng.randint(
        0, 255, (TINY.img_size, TINY.img_size, 3), dtype=np.uint8)).save(p)
    tags = list(rng.choice(pools[i % 2], size=3, replace=False))
    lines.append(f"{{p}},{{','.join(tags)}}")
with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
    f.write("\\n".join(lines) + "\\n")
genmodel.main(["--epochs", "5"])
# absolute dir: the gather map keys on EXACT path equality between the tag
# file and the cfeature CSV
gen_cfeatures.Predictor(config=CFG, model_cfg=TINY,
                        use_pallas=False).process_directory(
                            os.path.abspath("imgs"))

def build(mesh):
    eng = SearchEngine(".", mesh=mesh)
    eng.cfeature_reranker = CCIPReranker(
        directory=".", engine=eng,
        predictor=gen_cfeatures.Predictor(config=CFG, model_cfg=TINY,
                                          use_pallas=False))
    assert eng._character_one_dispatch_inputs() is not None
    return eng

single = build(None)
sharded = build(make_mesh(n_data=8))
mode = "character oriented"
for q in ["1girl", "solo smile", "1boy:+1", "smile:-1 1girl"]:
    a = single.find_similar_documents(q, 800, mode)
    b = sharded.find_similar_documents(q, 800, mode)
    ids_a, ids_b = [d for d, _ in a], [d for d, _ in b]
    if ids_a != ids_b:  # any order difference must be an ulp-level tie swap
        assert sorted(ids_a) == sorted(ids_b), (q, ids_a, ids_b)
        for (da, va), (db, vb) in zip(a, b):
            if da != db:
                assert abs(va - vb) <= 1e-5 + 1e-4 * abs(va), (q, da, db)
    np.testing.assert_allclose([s for _, s in a], [s for _, s in b],
                               rtol=1e-4, atol=1e-5, err_msg=q)
assert single.character_one_dispatch_queries == 4
assert sharded.character_one_dispatch_queries == 4
assert single.cfeature_reranker.one_dispatch_fallbacks == 0
assert sharded.cfeature_reranker.one_dispatch_fallbacks == 0
print("SHARDED_CHAR_ONE_DISPATCH_OK")
"""
    out = run_in_clean_env(code)
    assert "SHARDED_CHAR_ONE_DISPATCH_OK" in out


def test_sharded_query_with_bm25_overflow_matches_single_device():
    """The fused query with a COO BM25 overflow (capped dense width; scatter
    into the row-sharded score vector) must match single-device results over
    the 8-device mesh — the scatter's GSPMD placement is the only new moving
    part vs the plain sharded test above. The overflow triple rides
    replicated, like the packed query buffer."""
    code = """
import numpy as np, jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from anime_illust_image_searcher_tpu.ops.fused_query import (
    fused_normal_query, pack_query, unpack_result)
from anime_illust_image_searcher_tpu.parallel.mesh import (
    DATA_AXIS, make_mesh, pad_to_multiple)

rng = np.random.RandomState(4)
D, F, V, W = 203, 24, 90, 8      # deliberately not divisible by 8
matrix = rng.randn(D, F).astype(np.float32)
matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
norms = np.abs(rng.randn(D)).astype(np.float32) + 0.5
term_mat = rng.randint(0, 60, (D, W)).astype(np.int32)
contrib = np.abs(rng.randn(D, W)).astype(np.float32)
# doc 7 spills ids 60..79 (nowhere in the dense region) to the overflow
ov_doc = np.full(20, 7, np.int32)
ov_term = np.arange(60, 80, dtype=np.int32)
ov_contrib = np.abs(rng.randn(20)).astype(np.float32)
ov = (jnp.asarray(ov_doc), jnp.asarray(ov_term), jnp.asarray(ov_contrib))

for tw in [{3: 1.0, 70: 2.0},               # weight in the overflow region
           {3: 1.0, 70: -1.0},              # exclude via overflow
           {70: 1001.0, 3: 1.0}]:           # require via overflow
    packed = pack_query(rng.randn(F).astype(np.float32), tw, V,
                        magic=1000, max_terms=8)
    single = np.asarray(fused_normal_query(
        jnp.asarray(matrix), jnp.asarray(norms), jnp.asarray(term_mat),
        jnp.asarray(contrib), packed, 0.5, 0.5, 0.7, 0.3,
        vocab_size=V, num_docs=D, topn=50, k=10, num_real=D,
        overflow=ov, ov_max_len=28))

    mesh = make_mesh(n_data=8)
    mat_p, _ = pad_to_multiple(matrix, 8)
    nm_p, _ = pad_to_multiple(norms, 8)
    tm_p, _ = pad_to_multiple(term_mat, 8)
    tm_p = tm_p.copy(); tm_p[D:] = V          # sentinel ids on padding rows
    cb_p, _ = pad_to_multiple(contrib, 8)
    rs = NamedSharding(mesh, P(DATA_AXIS, None))
    rs1 = NamedSharding(mesh, P(DATA_AXIS))
    sharded = np.asarray(fused_normal_query(
        jax.device_put(mat_p, rs), jax.device_put(nm_p, rs1),
        jax.device_put(tm_p, rs), jax.device_put(cb_p, rs),
        packed, 0.5, 0.5, 0.7, 0.3,
        vocab_size=V, num_docs=mat_p.shape[0], topn=50, k=10, num_real=D,
        overflow=ov, ov_max_len=28))

    tv_s, ti_s, rv_s, ri_s, _ = unpack_result(single, 10)
    tv_m, ti_m, rv_m, ri_m, _ = unpack_result(sharded, 10)
    np.testing.assert_array_equal(ti_s, ti_m)
    np.testing.assert_array_equal(ri_s, ri_m)
    np.testing.assert_allclose(tv_s, tv_m, rtol=1e-5, atol=1e-6)
    finite = np.isfinite(rv_s)
    np.testing.assert_array_equal(finite, np.isfinite(rv_m))
    np.testing.assert_allclose(rv_s[finite], rv_m[finite], rtol=1e-5, atol=1e-6)
print("SHARDED_OVERFLOW_OK")
"""
    out = run_in_clean_env(code)
    assert "SHARDED_OVERFLOW_OK" in out


def test_dp_doc2vec_training_matches_single_device():
    """genmodel --data-parallel: mesh-sharded PV-DBOW training must reproduce the
    single-device run (same batches, same keys; GSPMD only re-tiles the math)."""
    code = """
import numpy as np
from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

rng = np.random.RandomState(5)
pools = [[f"a{i}" for i in range(10)], [f"b{i}" for i in range(10)]]
corpus = [list(rng.choice(pools[i % 2], size=6, replace=False)) for i in range(40)]
cfg = Doc2VecConfig(vector_size=24, epochs=8, max_doc_len=16, sample=0.0)

single = Doc2VecModel.train(corpus, cfg, batch_size=16)
mesh = make_mesh(n_data=8)
dp = Doc2VecModel.train(corpus, cfg, batch_size=16, mesh=mesh)

np.testing.assert_allclose(dp.docvecs, single.docvecs, rtol=1e-4, atol=1e-5)
np.testing.assert_allclose(dp.syn1neg, single.syn1neg, rtol=1e-4, atol=1e-5)
print("DP_D2V_OK")
"""
    out = run_in_clean_env(code)
    assert "DP_D2V_OK" in out


def test_put_global_single_process():
    """Single-process meshes take the device_put fast path; content and sharding
    must match a plain device_put (the multi-process make_array_from_callback
    branch is exercised end-to-end by tests/test_distributed.py)."""
    code = """
import numpy as np, jax
from jax.sharding import NamedSharding, PartitionSpec as P
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh, put_global

mesh = make_mesh(n_data=8)
arr = np.arange(64, dtype=np.float32).reshape(16, 4)
sharding = NamedSharding(mesh, P('data', None))
a = put_global(arr, sharding)
b = jax.device_put(arr, sharding)
assert a.sharding == b.sharding, (a.sharding, b.sharding)
np.testing.assert_array_equal(np.asarray(a), arr)
print("PUT_GLOBAL_OK")
"""
    out = run_in_clean_env(code)
    assert "PUT_GLOBAL_OK" in out


def test_dp_doc2vec_inference_matches_single_device():
    """genmodel --data-parallel also shards the index-build inference pass; the
    per-doc math is independent along the sharded axis, so vectors must match
    the single-device scan (to GSPMD retiling ulps)."""
    code = """
import numpy as np
from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

rng = np.random.RandomState(5)
pools = [[f"a{i}" for i in range(10)], [f"b{i}" for i in range(10)]]
corpus = [list(rng.choice(pools[i % 2], size=6, replace=False)) for i in range(40)]
cfg = Doc2VecConfig(vector_size=24, epochs=8, infer_epochs=8, max_doc_len=16, sample=0.0)

model = Doc2VecModel.train(corpus, cfg, batch_size=16)
ids = [[model.vocab.token2id[t] for t in d] for d in corpus[:16]]
single = model._infer_group_scan(ids, chunk=8, epochs=8, len_bucket=8)
model.mesh = make_mesh(n_data=8)
model._infer_cache.pop("device_consts", None)
dp = model._infer_group_scan(ids, chunk=8, epochs=8, len_bucket=8)
np.testing.assert_allclose(single, dp, rtol=1e-5, atol=1e-7)
print("DP_D2V_INFER_OK")
"""
    out = run_in_clean_env(code)
    assert "DP_D2V_INFER_OK" in out


def test_dp_ccip_features_match_single_device():
    """gen_cfeatures --data-parallel: batch-sharded CCIP extraction must equal
    the single-device features."""
    code = """
import numpy as np
from anime_illust_image_searcher_tpu.config import CCIPConfig
from anime_illust_image_searcher_tpu.models.caformer import tiny_test_config
from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

TINY = tiny_test_config()
cfg = CCIPConfig(image_size=TINY.img_size, feature_dim=TINY.feature_dim, batch_size=8)
rng = np.random.RandomState(0)
imgs = rng.randint(0, 255, (8, TINY.img_size, TINY.img_size, 3), dtype=np.uint8)

single = CCIPPredictor(config=cfg, model_cfg=TINY, use_pallas=False)
a = single.ccip_batch_extract_features(imgs)
mesh = make_mesh(n_data=8)
dp = CCIPPredictor(config=cfg, model_cfg=TINY, use_pallas=False, mesh=mesh)
b = dp.ccip_batch_extract_features(imgs)
np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
print("DP_CCIP_OK")
"""
    out = run_in_clean_env(code)
    assert "DP_CCIP_OK" in out


def test_sharded_index_1m_rows_shard_count_invariance():
    """Scale proof (VERDICT r2 #8): a 1M-row sharded index is buildable and
    queryable on the virtual mesh, and the top-k is invariant to the shard
    count — 2-device and 8-device layouts return identical ids/scores, which
    also match the single-device numpy reference."""
    code = """
import numpy as np
from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh
from anime_illust_image_searcher_tpu.parallel.sharded_index import ShardedSimilarityIndex

rng = np.random.default_rng(0)
N, F, K = 1_000_003, 32, 100   # deliberately not divisible by any mesh size
matrix = rng.standard_normal((N, F), dtype=np.float32)
matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
q = matrix[123_457]

results = {}
for n_data in (2, 8):
    idx = ShardedSimilarityIndex(matrix, make_mesh(n_data=n_data))
    results[n_data] = idx.top_k(q, k=K)
    del idx

(v2, i2), (v8, i8) = results[2], results[8]
assert list(i2) == list(i8), (i2[:5], i8[:5])
np.testing.assert_allclose(v2, v8, rtol=0, atol=0)  # same math, same bits

scores = matrix @ q
order = np.argsort(-scores, kind="stable")[:K]
overlap = len(set(i8.tolist()) & set(order.tolist()))
assert overlap >= K - 1, overlap   # numpy f64 accumulation may flip one tail tie
np.testing.assert_allclose(v8, scores[i8], rtol=1e-5, atol=1e-6)
assert i8[0] == 123_457 and v8[0] > 0.999
print("SHARD_COUNT_INVARIANCE_1M_OK")
"""
    out = run_in_clean_env(code, timeout=1200)
    assert "SHARD_COUNT_INVARIANCE_1M_OK" in out
