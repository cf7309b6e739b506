"""Pallas TPU attention kernel for the ViT encoders.

The tagger's hot op is self-attention over ~1025 patch tokens ×16 heads ×24 blocks
(reference delegates this to timm/PyTorch — tagging.py:174). At S≈1k the right TPU
shape is a *single-pass blocked* attention: K/V for a head fit comfortably in VMEM
(~150 KB each in bf16), so no online-softmax streaming is needed — one MXU matmul
builds the (BQ, S) score tile, the VPU does a fused softmax, a second matmul yields
the output tile (SURVEY.md §5.7: blockwise for memory efficiency; the scaling axis is
batch, not sequence).

Measured design choices (v5e, B=128 H=16 S=1025 Dh=64):
  - inputs flattened to (B·H, S, Dh) with G heads per program — G=4/BQ=256 ran 1.5×
    faster than one-(b,h)-per-program (14.4 vs 9.5 TF/s) and on par with XLA's fused
    attention (16.3 TF/s);
  - padding keys masked by ADDING a precomputed 0/-inf bias row (cheaper than an
    iota+where per tile);
  - q/k/v stay bf16 into the MXU with f32 accumulation; softmax in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_GROUP = 4
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[...]                               # (G, BQ, Dh)
    k = k_ref[...]                               # (G, S, Dh)
    v = v_ref[...]                               # (G, S, Dh)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                    # (G, BQ, S) f32
    s = s + bias_ref[...]                        # 0 / -inf padding-key mask
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "group", "interpret")
)
def mha_attention(
    q: jax.Array,  # (B, H, S, Dh)
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    group: int = DEFAULT_GROUP,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention over padded sequences.

    S is padded up to a lane multiple internally; padding keys are masked out and
    padding query rows are sliced off, so callers can pass the raw token count
    (e.g. 1025 for a 448²/14 ViT with cls token). ``group`` heads are processed per
    program; B·H must divide by it (it is clamped otherwise).
    """
    b, h, s, dh = q.shape
    scale = dh ** -0.5
    n = b * h
    while group > 1 and n % group:
        group //= 2
    s_pad = _round_up(s, max(block_q, LANE))
    block_q = min(block_q, s_pad)

    def flat(x):
        x = x.reshape(n, s, dh)
        if s_pad != s:
            x = jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)])
        return x

    qf, kf, vf = flat(q), flat(k), flat(v)
    bias = jnp.where(jnp.arange(s_pad) < s, 0.0, -jnp.inf).astype(jnp.float32)

    grid = (n // group, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, s_pad, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, block_q, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * s_pad * s_pad * dh,
            bytes_accessed=n * s_pad * dh * 4 * 2,
            transcendentals=n * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, bias)
    return out[:, :s, :].reshape(b, h, s, dh)


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain XLA attention — numerical oracle for the Pallas kernel and the
    alternative production path (bf16 MXU passes, f32 softmax)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
