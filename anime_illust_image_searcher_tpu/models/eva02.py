"""EVA02 vision transformer in Flax — the WD-EVA02-Large tagger backbone.

Re-implements (TPU-first, not a port) the timm ``Eva`` architecture instantiated by
``timm.create_model("hf-hub:SmilingWolf/wd-eva02-large-tagger-v3")`` (reference:
tagging.py:146-148): patch embed 14×14 → 1024-d, 24 blocks × 16 heads, learned absolute
position embedding + 2D axial cat-RoPE on q/k (cls token excluded), SwiGLU MLP with
sub-LN (EVA02 paper's extra LayerNorm on the FFN hidden), final norm + linear
multi-label head.

TPU mapping:
  - attention runs through the Pallas blocked-attention kernel (ops/flash_attention);
  - all matmuls execute in bf16 on the MXU with f32 accumulation; LayerNorms and
    softmax stay f32;
  - the forward is shape-static (448² → 1025 tokens) so XLA compiles exactly one
    program per batch bucket, and pjit shards the batch over the ``data`` mesh axis.

Weight conversion from the HF safetensors checkpoint is in models/weights.py. The
architecture + conversion (including the rope half-split q/k permutation) are
numerically validated in-env against a vendored PyTorch replica of timm's Eva forward
semantics (tests/test_eva02_oracle.py: logits <= 1e-5 at f32, per-block activations
checked, and an identity permutation is off by O(1) — the oracle discriminates).
The published weights themselves need network access (zero egress here);
tools/parity_harness.py carries the per-layer diff harness to run where they are
available (SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.flash_attention import attention_reference, mha_attention
from ..ops.quant import Int8Dense


def _dense(cfg: "Eva02Config"):
    """The block-level Dense factory: bf16 MXU or the int8 double-rate path."""
    if cfg.quant == "int8":
        return partial(Int8Dense, dtype=cfg.dtype)
    return partial(nn.Dense, dtype=cfg.dtype)


@dataclasses.dataclass(frozen=True)
class Eva02Config:
    img_size: int = 448
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    # EVA02's SwiGLU ratio: hidden = int(dim * 4 * 2/3)
    mlp_hidden_dim: int = 2730
    num_classes: int = 10861
    use_rope: bool = True
    rope_temperature: float = 10000.0
    ref_feat_shape: Tuple[int, int] = (16, 16)  # pretraining grid (224/14)
    use_abs_pos_emb: bool = True
    # sub-LN inside the attention (before out-proj). EVA02-L uses it only in the MLP;
    # the weight converter flips this if the checkpoint carries attn.norm weights.
    scale_attn_inner: bool = False
    use_layer_scale: bool = False
    # Head style. timm's Eva classification models default to global_pool='avg':
    # mean over patch tokens -> fc_norm -> head (the final pre-pool norm is Identity).
    # 'token' is the cls-token -> norm -> head variant. The weight converter detects
    # which one a checkpoint uses by its fc_norm/norm keys.
    global_pool: str = "avg"
    # Effectively a no-op on current flax: nn.LayerNorm computes statistics in
    # f32 regardless of ``dtype`` (verified: flipping this leaves tiny-model
    # outputs bit-identical and B=128 timing unchanged). Kept for config-surface
    # stability; both settings are parity-safe.
    norm_in_f32: bool = True
    # How the cls token is exempted from rope. "sliced": rope rows 1..N then
    # concat row 0 back. "idrow": sin/cos carry an identity row 0 (sin=0,
    # cos=1) and rope applies to all N rows with no row slice/concat —
    # BIT-IDENTICAL outputs (row 0: x·1 + rot·0 = x exactly, rot is finite),
    # pinned by tests/test_eva02.py. Measured IN-MODEL on v5e at B=128
    # (round 4): sliced 147.2 img/s vs idrow 75.4 — the unaligned 1025-row
    # rope multiply forces relayouts XLA avoids in the lane-aligned 1024-row
    # sliced form, even though STANDALONE the idrow span times ~0.9 ms/tensor
    # FASTER (ARCHITECTURE §7: standalone piece timing measures materialized
    # boundaries, not in-model fusion — it can invert the verdict).
    rope_variant: str = "sliced"
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16  # compute dtype; params stay f32
    # "none" (bf16 MXU) or "int8" (v5e double-rate MXU via ops/quant.Int8Dense;
    # identical param tree, so any checkpoint serves both paths)
    quant: str = "none"

    @property
    def grid_size(self) -> Tuple[int, int]:
        g = self.img_size // self.patch_size
        return (g, g)

    @property
    def num_patches(self) -> int:
        g = self.grid_size
        return g[0] * g[1]

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def tiny_test_config(num_classes: int = 32) -> Eva02Config:
    """Small config for CPU tests."""
    return Eva02Config(
        img_size=56, patch_size=14, embed_dim=64, depth=2, num_heads=2,
        mlp_hidden_dim=112, num_classes=num_classes, ref_feat_shape=(4, 4),
        dtype=jnp.float32,
    )


# ---------------------------------------------------------------------------
# RoPE (timm RotaryEmbeddingCat semantics: lang-mode freq bands, axial 2D).
#
# timm applies the rotation to INTERLEAVED (even, odd) pairs. On TPU that
# formulation costs ~11 ms/block at B=128 (stride-2 slices + stack force
# sublane relayouts); the mathematically equivalent HALF-SPLIT layout
# (rotate_half on contiguous halves, as in GPT-NeoX) measures 5.4 ms/block.
# q·kᵀ is exactly invariant under any fixed permutation applied to both q and
# k within a head, so this model stores q/k projections in the half-split dim
# order: new dim i holds timm dim 2i, new dim head_dim/2+i holds timm dim
# 2i+1 (``rope_half_permutation``). The weight converter applies that column
# permutation to checkpoint q/k projections (models/weights.py); attention
# scores and all downstream activations match timm exactly — only the
# internal q/k activation layout differs (noted in tools/parity_harness.py).
# ---------------------------------------------------------------------------


def rope_half_permutation(head_dim: int):
    """Index map interleaved -> half-split: new[..., j] = old[..., perm[j]]."""
    import numpy as np

    return np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])


def build_rope_cat(
    grid: Tuple[int, int],
    head_dim: int,
    temperature: float,
    ref_shape: Optional[Tuple[int, int]],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (sin, cos), each (grid_h*grid_w, head_dim), f32, half-split layout."""
    num_bands = head_dim // 4
    exp = jnp.arange(num_bands, dtype=jnp.float32) / num_bands
    bands = 1.0 / (temperature ** exp)                       # (num_bands,)

    coords = []
    for axis, size in enumerate(grid):
        t = jnp.arange(size, dtype=jnp.float32)
        if ref_shape is not None:
            t = t / size * ref_shape[axis]
        coords.append(t)
    yy, xx = jnp.meshgrid(coords[0], coords[1], indexing="ij")
    pos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)   # (N, 2)

    angles = pos[:, :, None] * bands[None, None, :]              # (N, 2, num_bands)
    angles = angles.reshape(pos.shape[0], 2 * num_bands)         # [y bands | x bands]
    # each band appears once per half (the two elements of its rotation pair)
    angles = jnp.concatenate([angles, angles], axis=-1)          # (N, head_dim)
    return jnp.sin(angles), jnp.cos(angles)


def apply_rope_cat(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """x: (..., N, head_dim) in half-split dim order. rotate_half: (a, b) -> (-b, a)."""
    h = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)
    return x * cos + rot * sin


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class EvaAttention(nn.Module):
    cfg: Eva02Config
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]]):
        cfg = self.cfg
        b, n, c = x.shape
        h, dh = cfg.num_heads, cfg.head_dim

        dense = _dense(cfg)
        q = dense(c, use_bias=True, name="q_proj")(x)
        k = dense(c, use_bias=False, name="k_proj")(x)
        v = dense(c, use_bias=True, name="v_proj")(x)

        def split_heads(t):
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)  # (B, H, N, Dh)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        if rope is not None:
            sin, cos = rope
            sin = sin.astype(q.dtype)
            cos = cos.astype(q.dtype)
            if sin.shape[0] == n:
                # identity-row layout: row 0 is (sin=0, cos=1), so the cls
                # token passes through exactly — no row slice/concat.
                q = apply_rope_cat(q, sin, cos)
                k = apply_rope_cat(k, sin, cos)
            else:
                # cls token (index 0) is exempt from rotation
                q = jnp.concatenate([q[:, :, :1], apply_rope_cat(q[:, :, 1:], sin, cos)], axis=2)
                k = jnp.concatenate([k[:, :, :1], apply_rope_cat(k[:, :, 1:], sin, cos)], axis=2)

        if self.use_pallas:
            out = mha_attention(q, k, v)
        else:
            out = attention_reference(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)

        if cfg.scale_attn_inner:
            out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm",
                               dtype=jnp.float32 if cfg.norm_in_f32 else cfg.dtype)(out)
        out = dense(c, use_bias=True, name="proj")(out)
        return out


class SwiGLU(nn.Module):
    """EVA02 MLP: silu(w1(x)) * w2(x) -> sub-LN -> w3 (timm SwiGLU: fc1_g/fc1_x/norm/fc2)."""

    cfg: Eva02Config

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cfg = self.cfg
        dense = _dense(cfg)
        g = dense(cfg.mlp_hidden_dim, name="w1")(x)
        u = dense(cfg.mlp_hidden_dim, name="w2")(x)
        hidden = nn.silu(g) * u
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm",
                              dtype=jnp.float32 if cfg.norm_in_f32 else cfg.dtype)(hidden)
        return dense(cfg.embed_dim, name="w3")(hidden)


class EvaBlock(nn.Module):
    cfg: Eva02Config
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, rope):
        cfg = self.cfg
        attn_in = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm1",
                               dtype=jnp.float32 if cfg.norm_in_f32 else cfg.dtype)(x)
        attn_out = EvaAttention(cfg, self.use_pallas, name="attn")(attn_in, rope)
        if cfg.use_layer_scale:
            gamma_1 = self.param("gamma_1", nn.initializers.ones, (cfg.embed_dim,))
            attn_out = attn_out * gamma_1
        x = x + attn_out

        mlp_in = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm2",
                              dtype=jnp.float32 if cfg.norm_in_f32 else cfg.dtype)(x)
        mlp_out = SwiGLU(cfg, name="mlp")(mlp_in)
        if cfg.use_layer_scale:
            gamma_2 = self.param("gamma_2", nn.initializers.ones, (cfg.embed_dim,))
            mlp_out = mlp_out * gamma_2
        return x + mlp_out


class Eva02(nn.Module):
    """Full tagger network: images (B, H, W, 3) f32 -> logits (B, num_classes) f32."""

    cfg: Eva02Config
    use_pallas: bool = True

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = images.shape[0]

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed",
            dtype=cfg.dtype,
        )(images.astype(cfg.dtype))
        x = x.reshape(b, cfg.num_patches, cfg.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim)).astype(x.dtype), x], axis=1)

        if cfg.use_abs_pos_emb:
            pos_embed = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02),
                (1, cfg.num_patches + 1, cfg.embed_dim),
            )
            x = x + pos_embed.astype(x.dtype)

        rope = None
        if cfg.use_rope:
            if cfg.rope_variant not in ("sliced", "idrow"):
                # a typo'd variant must not silently measure "sliced" — this
                # knob exists to reproduce an A/B result (ARCHITECTURE §7)
                raise ValueError(
                    f"unknown rope_variant {cfg.rope_variant!r}; "
                    "expected 'sliced' or 'idrow'")
            sin, cos = build_rope_cat(
                cfg.grid_size, cfg.head_dim, cfg.rope_temperature, cfg.ref_feat_shape
            )
            if cfg.rope_variant == "idrow":
                sin = jnp.concatenate([jnp.zeros((1, cfg.head_dim), sin.dtype), sin], axis=0)
                cos = jnp.concatenate([jnp.ones((1, cfg.head_dim), cos.dtype), cos], axis=0)
            rope = (sin, cos)

        for i in range(cfg.depth):
            x = EvaBlock(cfg, self.use_pallas, name=f"blocks_{i}")(x, rope)

        if cfg.global_pool == "avg":
            # timm Eva 'avg': pre-pool norm is Identity; mean over PATCH tokens
            # (cls excluded), then fc_norm, then head.
            pooled = jnp.mean(x[:, 1:].astype(jnp.float32), axis=1)
            pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="fc_norm",
                                  dtype=jnp.float32)(pooled)
        else:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm",
                             dtype=jnp.float32)(x)
            pooled = x[:, 0].astype(jnp.float32)
        logits = nn.Dense(cfg.num_classes, name="head", dtype=jnp.float32)(pooled)
        return logits


def init_params(cfg: Eva02Config, seed: int = 0, use_pallas: bool = True):
    model = Eva02(cfg, use_pallas=use_pallas)
    dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    # jit the init: eager op-by-op dispatch is ~100x slower than one compiled program
    return jax.jit(model.init)(jax.random.PRNGKey(seed), dummy)


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def forward_logits(params, images: jnp.ndarray, cfg: Eva02Config, use_pallas: bool = True):
    return Eva02(cfg, use_pallas=use_pallas).apply(params, images)


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def forward_probs(params, images: jnp.ndarray, cfg: Eva02Config, use_pallas: bool = True):
    """sigmoid(logits) — the reference applies the activation outside the model
    (tagging.py:176)."""
    return jax.nn.sigmoid(forward_logits(params, images, cfg, use_pallas))
