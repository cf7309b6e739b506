"""Pallas TPU attention kernel for the ViT encoders.

The tagger's hot op is self-attention over ~1025 patch tokens ×16 heads ×24 blocks
(reference delegates this to timm/PyTorch — tagging.py:174). At S≈1k the right TPU
shape is a *single-pass blocked* attention: K/V for a head group fit comfortably in
VMEM, so no online-softmax streaming is needed — one MXU matmul builds the (BQ, S)
score tile, the VPU does a fused softmax, a second matmul yields the output tile
(SURVEY.md §5.7: blockwise for memory efficiency; the scaling axis is batch, not
sequence).

Profile-driven design (v5e, B=64, EVA02-L):
  - the kernel body itself costs ~5.8 ms/layer — faster than XLA's fused attention —
    but an earlier wrapper (flatten-reshape + pad-to-block + slice-back) added ~256 ms
    of pure data movement per forward. This version keeps the native (B, H, S, Dh)
    layout with G heads per program (no reshape copies) and pads S only to the lane
    multiple (1025 → 1152, not 1280);
  - padding keys are masked by ADDING a precomputed 0/-inf bias row (cheaper than an
    iota+where per tile);
  - q/k/v stay bf16 into the MXU with f32 accumulation; softmax in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_GROUP = 4
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]                                 # (G, BQ, Dh)
    k = k_ref[0]                                 # (G, S, Dh)
    v = v_ref[0]                                 # (G, S, Dh)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                    # (G, BQ, S) f32
    s = s + bias_ref[...]                        # 0 / -inf padding-key mask
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
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
    block_q: int = 0,
    group: int = DEFAULT_GROUP,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention over padded sequences.

    S is padded up to a lane multiple internally; padding keys are masked out and
    padding query rows are sliced off, so callers can pass the raw token count
    (e.g. 1025 for a 448²/14 ViT with cls token). ``group`` heads are processed per
    program (clamped to divide H); block_q=0 picks the largest divisor of the padded
    sequence that keeps the (G, BQ, S) f32 score tile within ~8 MB of VMEM.
    """
    b, h, s, dh = q.shape
    scale = dh ** -0.5
    while group > 1 and h % group:
        group //= 2
    s_pad = _round_up(s, LANE)

    if block_q == 0:
        # largest LANE-multiple divisor of s_pad whose (G, BQ, S) f32 score tile
        # stays within ~8 MB of VMEM
        budget_rows = max(LANE, (8 * 2 ** 20) // (4 * s_pad * group))
        m = s_pad // LANE
        block_q = LANE
        for d in range(m, 0, -1):
            if m % d == 0 and LANE * d <= budget_rows:
                block_q = LANE * d
                break
    elif s_pad % block_q:
        # a non-dividing explicit block_q would truncate the grid and leave
        # the tail query rows of the output unwritten (garbage, not an error)
        raise ValueError(
            f"block_q={block_q} must divide the padded sequence {s_pad} "
            f"(s={s} rounded up to {LANE}); pass block_q=0 to auto-pick")

    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    bias = jnp.where(jnp.arange(s_pad) < s, 0.0, -jnp.inf).astype(jnp.float32)

    grid = (b, h // group, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, group, block_q, dh), lambda bi, gi, qi: (bi, gi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, s_pad, dh), lambda bi, gi, qi: (bi, gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, s_pad, dh), lambda bi, gi, qi: (bi, gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad,), lambda bi, gi, qi: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, block_q, dh),
                               lambda bi, gi, qi: (bi, gi, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * dh,
            bytes_accessed=b * h * s_pad * dh * 4 * 2,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :, :s, :]


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain XLA attention — numerical oracle for the Pallas kernel and the
    alternative production path (bf16 MXU passes, f32 softmax)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
