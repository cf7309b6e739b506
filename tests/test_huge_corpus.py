"""Id exactness BEYOND 2^24 docs/terms (VERDICT r4 #4).

The fused one-dispatch programs pack ids into f32 result/query buffers; round
4 encoded them as f32 VALUES (exact only below 2^24) and the engine silently
degraded to the ~18x multi-call path for corpora/vocabs at 16M+. Ids now ride
as int32 BIT PATTERNS (ops.fused_query.encode_ids_f32 / pack_query), exact at
any 32-bit id. These tests pin that with ids that the old encode provably
corrupted: adjacent integers >= 2^24 are indistinguishable as f32.

The doc-id test allocates a real (2^24 + 64)-row corpus (~200 MB at dim 2) —
big enough that top-k indices land beyond the old ceiling, small enough for CI.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from anime_illust_image_searcher_tpu.ops.fused_query import (
    decode_ids, encode_ids_f32, fused_character_top, pack_query,
)

TWO24 = 2 ** 24


def test_encode_decode_roundtrip_large_ids():
    import jax

    from anime_illust_image_searcher_tpu.ops.fused_query import ID_ENCODE_LIMIT

    ids = np.array([-1, 0, 1, TWO24 - 1, TWO24, TWO24 + 1,
                    ID_ENCODE_LIMIT - 1], np.int32)
    out = np.asarray(jax.jit(encode_ids_f32)(jnp.asarray(ids)))
    np.testing.assert_array_equal(decode_ids(out), ids)
    # every encoded lane is a NORMAL f32: raw (unbiased) patterns of small
    # ids are denormals that XLA:TPU flushes to ZERO on the output path
    # (caught on-chip round 5: every small doc id decoded as 0), and raw -1
    # is a NaN the transport may canonicalize — the bias prevents both
    lanes = out.view(np.int32) & 0x7FFFFFFF
    assert np.all(lanes >= 0x00800000) and np.all(lanes < 0x7F800000)
    # the f32 VALUE encode these replaced cannot tell 2^24 and 2^24+1 apart
    assert np.float32(TWO24) == np.float32(TWO24 + 1)


def test_term_ids_exact_beyond_2p24():
    """Two docs carrying ADJACENT term ids >= 2^24 (f32-indistinguishable):
    a weighted query for one of them must score only that doc. The old
    f32-value term compare matched both."""
    vocab = TWO24 + 10
    dim = 4
    t_a, t_b = TWO24, TWO24 + 1  # np.float32(t_a) == np.float32(t_b)
    matrix = np.zeros((4, dim), np.float32)
    term_mat = np.full((4, 2), vocab, np.int32)  # sentinel padding
    contrib = np.zeros((4, 2), np.float32)
    term_mat[1, 0] = t_a
    term_mat[2, 0] = t_b
    contrib[1, 0] = contrib[2, 0] = 1.0

    packed = pack_query(np.zeros(dim, np.float32), {t_b: 1.0}, vocab,
                        magic=1000, max_terms=8)
    out = np.asarray(fused_character_top(
        jnp.asarray(matrix), jnp.asarray(term_mat), jnp.asarray(contrib),
        jnp.asarray(packed), 0.5, 0.5,
        vocab_size=vocab, num_docs=4, k=2))
    vals, ids = out[:2], decode_ids(out[2:])
    assert ids[0] == 2 and vals[0] == pytest.approx(0.5)  # only doc 2 matches
    assert vals[1] == 0.0  # the f32-colliding doc 1 must NOT score


def test_doc_ids_exact_beyond_2p24():
    """Top-k doc ids past 16,777,216 come back EXACT through the one-dispatch
    buffer. The old value-encode rounded 2^24+1 -> 2^24 (a different doc)."""
    import jax

    dim = 2
    n_docs = TWO24 + 64
    # winners at adjacent indices beyond 2^24 (and one below, mixed in), with
    # strictly decreasing cosine so the expected order is unambiguous
    winners = np.array([TWO24 + 1, TWO24 + 2, TWO24 + 33, 5, TWO24 + 63],
                       np.int64)
    angles = np.arange(len(winners), dtype=np.float32) * 0.05

    @jax.jit
    def gen():
        m = jnp.zeros((n_docs, dim), jnp.float32)
        rows = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=1)
        return m.at[jnp.asarray(winners)].set(rows)

    matrix = gen()
    vocab = 100
    term_mat = jnp.zeros((n_docs, 1), jnp.int32) + vocab  # sentinel: no terms
    contrib = jnp.zeros((n_docs, 1), jnp.float32)
    qvec = np.array([1.0, 0.0], np.float32)
    packed = pack_query(qvec, {}, vocab, magic=1000, max_terms=8)

    out = np.asarray(fused_character_top(
        matrix, term_mat, contrib, jnp.asarray(packed), 0.5, 0.5,
        vocab_size=vocab, num_docs=n_docs, k=len(winners)))
    ids = decode_ids(out[len(winners):])
    np.testing.assert_array_equal(ids, winners)
