"""int8 quantized inference path (ops/quant.py, VERDICT r1 #3 / ROADMAP #4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from anime_illust_image_searcher_tpu.models.eva02 import (
    Eva02, forward_probs, init_params, tiny_test_config,
)
from anime_illust_image_searcher_tpu.ops.quant import (
    Int8Dense, int8_dot, int8_quantize_rows,
)


def test_int8_dot_close_to_f32(rng):
    x = rng.randn(5, 64).astype(np.float32)
    w = (rng.randn(64, 32) * 0.1).astype(np.float32)
    got = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(w)))
    ref = x @ w
    # int8 with per-row/per-col scales: relative error ~1/127 per factor
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 0.03


def test_int8_quantize_rows_reconstruction(rng):
    x = rng.randn(4, 128).astype(np.float32)
    q, s = int8_quantize_rows(jnp.asarray(x))
    rec = np.asarray(q).astype(np.float32) * np.asarray(s)
    assert np.max(np.abs(rec - x)) <= np.max(np.abs(x)) / 127.0 + 1e-6
    assert np.asarray(q).dtype == np.int8


def test_int8_dense_param_tree_matches_nn_dense(rng):
    """The whole point: one checkpoint serves both paths."""
    cfg = tiny_test_config()
    cfg_q = dataclasses.replace(cfg, quant="int8")
    p_f = init_params(cfg, seed=0, use_pallas=False)
    p_q = init_params(cfg_q, seed=0, use_pallas=False)
    flat_f = jax.tree_util.tree_leaves_with_path(p_f)
    flat_q = jax.tree_util.tree_leaves_with_path(p_q)
    assert [jax.tree_util.keystr(k) for k, _ in flat_f] == \
        [jax.tree_util.keystr(k) for k, _ in flat_q]
    for (_, a), (_, b) in zip(flat_f, flat_q):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_int8_forward_close_and_deterministic(rng):
    cfg = tiny_test_config()
    cfg_q = dataclasses.replace(cfg, quant="int8")
    params = init_params(cfg, seed=0, use_pallas=False)
    imgs = jnp.asarray(rng.rand(2, cfg.img_size, cfg.img_size, 3).astype(np.float32))
    p_f = np.asarray(forward_probs(params, imgs, cfg, False))
    p_q = np.asarray(forward_probs(params, imgs, cfg_q, False))
    p_q2 = np.asarray(forward_probs(params, imgs, cfg_q, False))
    np.testing.assert_array_equal(p_q, p_q2)
    # random tiny net: probabilities must track closely (real-weight deltas are
    # measured by tools/quant_report.py)
    assert np.max(np.abs(p_f - p_q)) < 0.05, np.max(np.abs(p_f - p_q))


def test_int8_dense_module_standalone(rng):
    x = jnp.asarray(rng.randn(3, 16).astype(np.float32))
    mod = Int8Dense(8, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    ref = x @ params["params"]["kernel"] + params["params"]["bias"]
    assert np.max(np.abs(np.asarray(y) - np.asarray(ref))) < 0.05
