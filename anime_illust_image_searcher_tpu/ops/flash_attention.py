"""Pallas TPU attention kernel for the ViT encoders.

The tagger's hot op is self-attention over ~1025 patch tokens ×16 heads ×24 blocks
(reference delegates this to timm/PyTorch — tagging.py:174). At S≈1k the right TPU
shape is a *single-pass blocked* attention: each program owns one (BQ, Dh) query block
plus the full K/V for its (batch, head) — 1152×64 f32 K and V are ~300 KB each, far
under the ~16 MB VMEM budget — so no online-softmax streaming is needed; one MXU matmul
builds the (BQ, S) score tile, the VPU does a fused softmax, and a second matmul yields
the output tile. Padding keys are masked with -inf via an iota comparison (SURVEY.md
§5.7: blockwise for memory efficiency; the scaling axis is batch, not sequence).

Inputs are bf16 (MXU-native); softmax and accumulation run in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    # Keep q/k in their native (bf16) dtype so the MXU runs a bf16 pass; the
    # preferred_element_type gives f32 accumulation, which is all softmax needs.
    q = q_ref[0, 0]                              # (BQ, Dh)
    k = k_ref[0, 0]                              # (S, Dh)
    v = v_ref[0, 0]                              # (S, Dh) bf16
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                    # (BQ, S) f32
    key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(key_ids < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret")
)
def mha_attention(
    q: jax.Array,  # (B, H, S, Dh)
    k: jax.Array,
    v: jax.Array,
    block_q: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention over padded sequences.

    S is padded up to a lane multiple internally; padding keys are masked out and
    padding query rows are sliced off, so callers can pass the raw token count
    (e.g. 1025 for a 448²/14 ViT with cls token).

    block_q=0 picks the largest q block that keeps the (BQ, S) f32 score tile and its
    exp within VMEM — fewer, bigger programs keep the MXU busy (one small program per
    (b, h, q-block) was measured slower than XLA's fused attention at B=128).
    """
    b, h, s, dh = q.shape
    scale = dh ** -0.5
    if block_q == 0:
        s_lane = _round_up(s, LANE)
        # budget ~10 MB for the two (BQ, S) f32 tiles (scores + softmax temps)
        block_q = max(LANE, min(s_lane, (10 * 2 ** 20 // (2 * 4 * s_lane)) // LANE * LANE))
    s_pad = _round_up(s, max(block_q, LANE))
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    grid = (b, h, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, valid_len=s),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * dh,
            bytes_accessed=b * h * s_pad * dh * 2 * 4,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :s, :]


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain XLA attention — numerical oracle for the Pallas kernel."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
