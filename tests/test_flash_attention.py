"""Pallas attention kernel vs the XLA reference oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anime_illust_image_searcher_tpu.ops.flash_attention import (
    attention_reference, mha_attention,
)


@pytest.mark.parametrize("b,h,s,dh", [
    (1, 2, 128, 64),
    (2, 2, 256, 64),
    (1, 1, 100, 64),   # non-multiple seq -> padding path
    (2, 4, 257, 32),   # cls-token-style odd length
])
def test_matches_reference(b, h, s, dh, rng):
    q = jnp.asarray(rng.randn(b, h, s, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, s, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, dh).astype(np.float32))
    got = mha_attention(q, k, v, interpret=True)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_padding_keys_do_not_leak(rng):
    """Scores for real tokens must be independent of what padding contains."""
    b, h, s, dh = 1, 1, 130, 64
    q = jnp.asarray(rng.randn(b, h, s, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, s, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, dh).astype(np.float32))
    out = mha_attention(q, k, v, interpret=True)
    assert out.shape == (b, h, s, dh)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_bf16_path(rng):
    q = jnp.asarray(rng.randn(1, 2, 128, 64)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 2, 128, 64)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 2, 128, 64)).astype(jnp.bfloat16)
    got = mha_attention(q, k, v, interpret=True)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=5e-2, atol=5e-2
    )
