"""CCIP character-feature encoder: a CAFormer backbone in Flax + a batched metric op.

Replaces the reference's ONNX black boxes (gen_cfeatures.py:112-130: ``model_feat.onnx``
and ``model_metrics.onnx`` from deepghs/ccip_onnx, model
``ccip-caformer-24-randaug-pruned``). CAFormer ("MetaFormer Baselines for Vision") is a
4-stage hierarchical net: depthwise-conv token mixers in the first two stages,
self-attention in the last two — the attention stages run through the same Pallas
kernel as the tagger.

The architecture follows the official MetaFormer reference implementation
(sail-sg/metaformer) so that weights converted from the published ONNX export
reproduce its outputs layer for layer:
  - Downsampling: stem conv 7x7/4 pad 2 with a post-LayerNorm (scale-only);
    stage 1-3 downsamples are pre-LayerNorm (scale-only) + conv 3x3/2 pad 1.
  - Block: x = x*res_scale1 + mixer(LN(x)); x = x*res_scale2 + mlp(LN(x)).
    caformer uses res_scale only in the last two stages.
  - SepConv mixer: pw-expand(2x) -> StarReLU -> dw 7x7 -> pw-project (all bias-free
    in the official weights; biases exist in the tree and are zero-filled by the
    converter when absent).
  - Attention mixer: head_dim 32, qkv bias-free, scale = head_dim**-0.5.
  - Head: mean-pool over HxW, final LayerNorm, then MlpHead
    (fc1 -> SquaredReLU -> LN -> fc2) to feature_dim.
Per-block hidden widths can be overridden via config (``mlp_hidden`` /
``sepconv_hidden``) because the published CCIP model is channel-pruned; the
converter derives them from the ONNX initializer shapes (models/ccip_weights.py).

The metric op computes the full pairwise difference matrix as ONE batched matmul
(1 - cosine over unit features, consistent with the published CCIP examples where the
diagonal is ~1e-8), replacing the reference's one-ONNX-call-per-image loop
(webui.py:306-309 — the worst query-time hot spot in SURVEY.md §3.3).

The exact published ONNX weights cannot be fetched in this environment (zero egress);
``init_params`` gives seeded weights so the pipeline runs end-to-end, and
models/ccip_weights.py converts the real ONNX files where they are available.
Features are deterministic for fixed weights, so index build + rerank semantics
are fully exercised.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.flash_attention import attention_reference, mha_attention


@dataclasses.dataclass(frozen=True)
class CAFormerConfig:
    img_size: int = 384
    # "caformer-24": depths sum to 24 (pruned s36-family geometry; the real
    # numbers are derived from the ONNX graph by models/ccip_weights.py)
    depths: Tuple[int, int, int, int] = (3, 3, 15, 3)
    dims: Tuple[int, int, int, int] = (64, 128, 320, 512)
    num_heads: Tuple[int, int, int, int] = (0, 0, 10, 16)  # dim // 32 where attn
    feature_dim: int = 768
    mlp_ratio: int = 4
    sepconv_ratio: int = 2
    layer_norm_eps: float = 1e-6
    # official caformer: res_scale only in the attention stages
    res_scale_stages: Tuple[bool, bool, bool, bool] = (False, False, True, True)
    stem_post_norm: bool = True
    downsample_pre_norm: bool = True
    head_mlp: bool = True            # MlpHead (fc1/SquaredReLU/LN/fc2) vs one Dense
    head_hidden: Optional[int] = None  # None -> mlp_ratio * dims[-1]
    # per-block hidden widths for pruned checkpoints; None -> ratio * dim
    mlp_hidden: Optional[Tuple[Tuple[int, ...], ...]] = None
    sepconv_hidden: Optional[Tuple[Tuple[int, ...], ...]] = None
    dtype: Any = jnp.bfloat16
    # LayerNorm variance path. Round-5 on-chip attribution found the f32
    # two-pass LN was THE stage-0 cost (5.55 ms per LN at 96²x64; ~39 ms of
    # the 78 ms stage-0, tools/probe_caformer_stage0.py) — one-pass
    # E[x²]−E[x]² (flax use_fast_variance) trades ~1e-6-relative activation
    # drift (well inside the 1e-4 converted-weight oracle gate) for the
    # second reduction pass. Measured in-model before flipping the default —
    # see ARCHITECTURE §8.
    fast_variance: bool = False

    def mlp_hidden_of(self, stage: int, blk: int) -> int:
        if self.mlp_hidden is not None:
            return self.mlp_hidden[stage][blk]
        return self.mlp_ratio * self.dims[stage]

    def sepconv_hidden_of(self, stage: int, blk: int) -> int:
        if self.sepconv_hidden is not None:
            return self.sepconv_hidden[stage][blk]
        return self.sepconv_ratio * self.dims[stage]


def tiny_test_config() -> CAFormerConfig:
    return CAFormerConfig(
        img_size=64, depths=(1, 1, 1, 1), dims=(16, 32, 48, 64),
        num_heads=(0, 0, 2, 2), feature_dim=32, dtype=jnp.float32,
    )


class StarReLU(nn.Module):
    """MetaFormer's activation: s * relu(x)^2 + b (learned scalars)."""

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(0.8944), ())
        b = self.param("bias", nn.initializers.constant(-0.4472), ())
        r = nn.relu(x)
        return s * r * r + b


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        h = StarReLU(name="act")(h)
        return nn.Dense(self.dim, name="fc2", dtype=self.dtype)(h)


class SepConvMixer(nn.Module):
    """ConvFormer token mixer: pw expand -> StarReLU -> dw 7x7 -> pw project."""

    dim: int
    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        h = nn.Dense(self.hidden, name="pw1", dtype=self.dtype)(x)
        h = StarReLU(name="act")(h)
        h = nn.Conv(self.hidden, kernel_size=(7, 7), feature_group_count=self.hidden,
                    padding=((3, 3), (3, 3)), name="dw", dtype=self.dtype)(h)
        return nn.Dense(self.dim, name="pw2", dtype=self.dtype)(h)


class AttentionMixer(nn.Module):
    dim: int
    heads: int
    dtype: Any
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, hh, ww, c = x.shape
        n = hh * ww
        t = x.reshape(b, n, c)
        head_dim = c // self.heads
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv", dtype=self.dtype)(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(b, n, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if self.use_pallas:
            o = mha_attention(q, k, v)
        else:
            o = attention_reference(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        o = nn.Dense(c, name="proj", dtype=self.dtype)(o)
        return o.reshape(b, hh, ww, c)


class MetaFormerBlock(nn.Module):
    dim: int
    heads: int  # 0 -> conv mixer
    mixer_hidden: int  # SepConv mid width (ignored for attention)
    mlp_hidden: int
    use_res_scale: bool
    cfg: CAFormerConfig
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=cfg.fast_variance, name="norm1", dtype=jnp.float32)(x)
        if self.heads:
            y = AttentionMixer(self.dim, self.heads, cfg.dtype, self.use_pallas,
                               name="mixer")(y)
        else:
            y = SepConvMixer(self.dim, self.mixer_hidden, cfg.dtype, name="mixer")(y)
        if self.use_res_scale:
            res_scale1 = self.param("res_scale1", nn.initializers.ones, (self.dim,))
            x = x * res_scale1 + y
        else:
            x = x + y

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=cfg.fast_variance, name="norm2", dtype=jnp.float32)(x)
        y = Mlp(self.dim, self.mlp_hidden, cfg.dtype, name="mlp")(y)
        if self.use_res_scale:
            res_scale2 = self.param("res_scale2", nn.initializers.ones, (self.dim,))
            return x * res_scale2 + y
        return x + y


class SquaredReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        r = nn.relu(x)
        return r * r


class CAFormer(nn.Module):
    """images (B, H, W, 3) f32 -> character features (B, feature_dim) f32."""

    cfg: CAFormerConfig
    use_pallas: bool = True

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = images.astype(cfg.dtype)
        for stage in range(4):
            if stage == 0:
                x = nn.Conv(cfg.dims[0], kernel_size=(7, 7), strides=(4, 4),
                            padding=((2, 2), (2, 2)), name="stem", dtype=cfg.dtype)(x)
                if cfg.stem_post_norm:
                    x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=cfg.fast_variance, name="stem_norm",
                                     dtype=jnp.float32)(x)
            else:
                if cfg.downsample_pre_norm:
                    x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=cfg.fast_variance,
                                     name=f"downsample_{stage}_norm",
                                     dtype=jnp.float32)(x)
                x = nn.Conv(cfg.dims[stage], kernel_size=(3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name=f"downsample_{stage}",
                            dtype=cfg.dtype)(x)
            for blk in range(cfg.depths[stage]):
                x = MetaFormerBlock(
                    cfg.dims[stage], cfg.num_heads[stage],
                    cfg.sepconv_hidden_of(stage, blk), cfg.mlp_hidden_of(stage, blk),
                    cfg.res_scale_stages[stage], cfg, self.use_pallas,
                    name=f"stage{stage}_block{blk}",
                )(x)
        # official metaformer: mean-pool over HxW, THEN the final norm
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=cfg.fast_variance, name="norm",
                              dtype=jnp.float32)(pooled)
        if cfg.head_mlp:
            hidden = cfg.head_hidden or cfg.mlp_ratio * cfg.dims[-1]
            h = nn.Dense(hidden, name="head_fc1", dtype=jnp.float32)(pooled)
            h = SquaredReLU(name="head_act")(h)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=cfg.fast_variance, name="head_norm",
                             dtype=jnp.float32)(h)
            feat = nn.Dense(cfg.feature_dim, name="head_fc2", dtype=jnp.float32)(h)
        else:
            feat = nn.Dense(cfg.feature_dim, name="head", dtype=jnp.float32)(pooled)
        return feat


def init_params(cfg: CAFormerConfig, seed: int = 0, use_pallas: bool = True):
    model = CAFormer(cfg, use_pallas=use_pallas)
    dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    # jit the init: eager op-by-op dispatch is ~100x slower than one compiled program
    return jax.jit(model.init)(jax.random.PRNGKey(seed), dummy)


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def extract_features(
    params,
    images_u8: jax.Array,   # (B, S, S, 3) uint8 RGB
    mean: jax.Array,
    std: jax.Array,
    cfg: CAFormerConfig,
    use_pallas: bool = True,
) -> jax.Array:
    """Fused CLIP-normalize preprocess (gen_cfeatures.py:100-110) + forward."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    return CAFormer(cfg, use_pallas=use_pallas).apply(params, x)


# ---------------------------------------------------------------------------
# Metric ops (replace model_metrics.onnx)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def ccip_rerank_diffs_op(
    params,
    images_u8: jax.Array,     # (k, S, S, 3) uint8 RGB, zero-padded to k rows
    valid: jax.Array,         # (k,) bool — which rows are real decoded images
    mean: jax.Array,
    std: jax.Array,
    index_matrix: jax.Array,  # (D, F) indexed features (device-resident)
    cfg: CAFormerConfig,
    use_pallas: bool = True,
) -> jax.Array:
    """The whole character-rerank device stage in ONE program: top-k feature
    extraction + valid-masked mean + all-rows 1−cosine matvec (webui.py:292-309
    semantics). One dispatch per character query instead of extract + metric."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    feats = CAFormer(cfg, use_pallas=use_pallas).apply(params, x)  # (k, F) f32
    w = valid.astype(jnp.float32)
    mean_feat = jnp.sum(w[:, None] * feats, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    # index rows are unit by construction (SimilarityIndex stores unitvec rows;
    # zero rows stay zero and correctly score diff 1.0) — renormalizing them
    # here would add two full (D, F) HBM passes to every character query
    m = index_matrix.astype(jnp.float32)
    q = mean_feat / jnp.maximum(jnp.linalg.norm(mean_feat), 1e-12)
    return 1.0 - jnp.dot(m, q, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def _rerank_diffs_from_rows(
    index_matrix: jax.Array,  # (D, F) unit rows (device-resident)
    norms: jax.Array,         # (D,) pre-normalization norms
    row_ids: jax.Array,       # (k,) int32 — cfeature rows of the top-k files
    valid: jax.Array,         # (k,) bool
) -> jax.Array:
    """Row-gather variant of ``ccip_rerank_diffs_op``: when every top-k file's
    feature already sits in the cfeature index (the common case — the index was
    built by the same deterministic pipeline), the raw features are
    ``matrix[row] * norms[row]``; the query ships k int32 ids instead of
    4.4 MB of pixels. Through this VM's relay that turns a ~150 ms image H2D
    into a no-op (ARCHITECTURE §4); math is identical to the live op with
    ``feats`` replaced by the reconstruction (f32 round-trip ≤1e-7 relative)."""
    raw = index_matrix[row_ids] * norms[row_ids][:, None]  # (k, F)
    w = valid.astype(jnp.float32)
    mean_feat = jnp.sum(w[:, None] * raw, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    # rows are unit by construction (see ccip_rerank_diffs_op note)
    m = index_matrix.astype(jnp.float32)
    q = mean_feat / jnp.maximum(jnp.linalg.norm(mean_feat), 1e-12)
    return 1.0 - jnp.dot(m, q, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


ccip_rerank_diffs_from_rows_op = jax.jit(_rerank_diffs_from_rows)


def _matches_from_rows(
    index_matrix: jax.Array,  # (D, F)
    norms: jax.Array,         # (D,)
    row_ids: jax.Array,       # (k,) int32
    valid: jax.Array,         # (k,) bool
    thresh: jax.Array,        # f32 scalar, rounded UP from the f64 threshold
    cap: int,
    num_real: int = 0,
) -> jax.Array:
    """Row-gather rerank returning only the threshold CANDIDATES instead of
    the corpus-length diff vector: [count(1) | idx(cap) | diff(cap)], where
    idx/diff are the cap smallest diffs in (diff asc, index asc) order and
    count is the number of rows with diff < thresh. The full-diffs D2H costs
    4 MB at 1M rows (~270 ms through a ~15 MB/s relay); candidates cost
    ~33 KB at cap=4096. ``thresh`` must be rounded UP (next f32 above the f64
    threshold) so count over-approximates the host's f64 compare — when
    count <= cap every true match is among the candidates; the caller falls
    back to the full-diffs op otherwise. Values are the same f32 diffs the
    full op returns (same computation, then a top-k gather). Candidate row
    ids ride as int32 bit patterns (ops.fused_query.encode_ids_f32 — exact at
    any index size); hosts decode with decode_ids."""
    from ..ops.fused_query import encode_ids_f32, exact_top_k

    diffs = _rerank_diffs_from_rows(index_matrix, norms, row_ids, valid)
    if num_real and num_real < index_matrix.shape[0]:
        # mesh layouts pad the row dim to the shard multiple; padding rows
        # (zero vectors -> diff exactly 1.0) must neither count nor surface
        # as candidate indices (``cap <= num_real`` by the caller's contract,
        # so +inf rows can never enter the top-cap)
        diffs = jnp.where(jnp.arange(diffs.shape[0]) < num_real,
                          diffs, jnp.inf)
    count = jnp.sum((diffs < thresh).astype(jnp.int32)).astype(jnp.float32)
    vals, idx = exact_top_k(-diffs, cap)  # smallest diffs, lowest-index ties
    return jnp.concatenate([count[None], encode_ids_f32(idx), -vals])


ccip_rerank_matches_from_rows_op = partial(
    jax.jit, static_argnames=("cap", "num_real"))(_matches_from_rows)


def _character_query_matches_impl(
    doc_matrix: jax.Array,    # (D, F) doc2vec unit rows
    term_mat: jax.Array,      # (D, W) BM25 dense term ids
    contrib_mat: jax.Array,   # (D, W) BM25 contributions
    packed: jax.Array,        # ops.fused_query.pack_query buffer
    bm25_weight: float,
    doc2vec_weight: float,
    cf_matrix: jax.Array,     # (C, Fc) cfeature unit rows
    cf_norms: jax.Array,      # (C,) pre-normalization norms
    docid_to_row: jax.Array,  # (D,) int32: doc id -> cfeature row, -1 = not gatherable
    thresh: jax.Array,        # f32 scalar, rounded UP from the f64 threshold
    vocab_size: int,
    num_docs: int,
    k: int,
    cap: int,
    num_real: int = 0,
    overflow=None,
    ov_max_len: int = 0,
    cf_num_real: int = 0,
) -> jax.Array:
    """The WHOLE common-case character query in ONE device call: stage A
    (fused BM25+Doc2Vec scores + exact top-k, ops.fused_query semantics)
    feeding the row-gather CCIP rerank (gather + masked mean + all-rows
    1−cos metric + capped candidates) without returning to the host between
    stages. The two-dispatch form pays a host round trip just to map the
    top-k doc ids to cfeature rows — that map is a static (D,) int32 array,
    so it lives on device and the query becomes one H2D / one exec / one D2H
    (through a relay that charges ~30 ms per round trip this halves the
    character-query wall; reference hot spot: webui.py:255-342).

    Returns [top_vals(k) | top_ids(k) | ok(1) | count(1) | cand_idx(cap) |
    cand_diffs(cap)]. ``ok``=1 iff every top-k doc id mapped to a gatherable
    row (present, unique, reconstructible); the host must ALSO validate file
    freshness (mtime vs row stamps) before consuming the candidates — on any
    failure it falls back to the classic second dispatch, reusing the top-k
    from this one. Candidate semantics match ccip_rerank_matches_from_rows_op
    (count over-approximates via the rounded-up threshold; (diff asc, index
    asc) order)."""
    from ..ops.fused_query import _fused_final, encode_ids_f32, exact_top_k

    final = _fused_final(doc_matrix, term_mat, contrib_mat, packed,
                         bm25_weight, doc2vec_weight, num_docs, num_real,
                         overflow=overflow, ov_max_len=ov_max_len)
    top_vals, top_idx = exact_top_k(final, k)
    rows = docid_to_row[top_idx]                       # (k,) int32
    ok = jnp.all(rows >= 0).astype(jnp.float32)
    # clamp so the gather stays in range when !ok (result is discarded then)
    body = _matches_from_rows(cf_matrix, cf_norms, jnp.maximum(rows, 0),
                              jnp.ones((k,), bool), thresh, cap,
                              num_real=cf_num_real)
    return jnp.concatenate([
        top_vals, encode_ids_f32(top_idx), ok[None], body])


ccip_character_query_matches_op = partial(jax.jit, static_argnames=(
    "vocab_size", "num_docs", "k", "cap", "num_real", "ov_max_len",
    "cf_num_real",
))(_character_query_matches_impl)


@partial(jax.jit, static_argnames=(
    "vocab_size", "num_docs", "k", "cap", "num_real", "ov_max_len",
    "cf_num_real",
))
def ccip_character_query_matches_batch_op(
    doc_matrix: jax.Array,
    term_mat: jax.Array,
    contrib_mat: jax.Array,
    packed_batch: jax.Array,  # (B, buflen)
    bm25_weight: float,
    doc2vec_weight: float,
    cf_matrix: jax.Array,
    cf_norms: jax.Array,
    docid_to_row: jax.Array,
    thresh: jax.Array,
    vocab_size: int,
    num_docs: int,
    k: int,
    cap: int,
    num_real: int = 0,
    overflow=None,
    ov_max_len: int = 0,
    cf_num_real: int = 0,
) -> jax.Array:
    """B concurrent whole-character-queries in ONE device program (vmapped
    over the packed buffers; every index array broadcasts): (B, 2k+2+2·cap).
    A burst previously cost two relay round trips (batched stage A, then the
    batched gather rerank after a host hop to map rows); this is the batched
    counterpart of ``ccip_character_query_matches_op`` — one round trip per
    burst. Same per-query semantics; XLA may schedule the batched matvecs'
    reductions differently, so last-ulp diffs vs single-query are possible
    (the standing batched-program caveat)."""

    def one(p):
        return _character_query_matches_impl(
            doc_matrix, term_mat, contrib_mat, p, bm25_weight, doc2vec_weight,
            cf_matrix, cf_norms, docid_to_row, thresh,
            vocab_size=vocab_size, num_docs=num_docs, k=k, cap=cap,
            num_real=num_real, overflow=overflow, ov_max_len=ov_max_len,
            cf_num_real=cf_num_real)

    return jax.vmap(one)(packed_batch)


@partial(jax.jit, static_argnames=("cap",))
def ccip_rerank_matches_from_rows_batch_op(
    index_matrix: jax.Array,  # (D, F)
    norms: jax.Array,         # (D,)
    row_ids: jax.Array,       # (B, k) int32
    valid: jax.Array,         # (B, k) bool
    thresh: jax.Array,        # f32 scalar
    cap: int,
) -> jax.Array:
    """Batched ``ccip_rerank_matches_from_rows_op``: (B, 1 + 2*cap)."""
    return jax.vmap(
        lambda ids, v: _matches_from_rows(
            index_matrix, norms, ids, v, thresh, cap)
    )(row_ids, valid)


@jax.jit
def ccip_rerank_diffs_from_rows_batch_op(
    index_matrix: jax.Array,  # (D, F)
    norms: jax.Array,         # (D,)
    row_ids: jax.Array,       # (B, k) int32 — one row-id set per query
    valid: jax.Array,         # (B, k) bool
) -> jax.Array:
    """B concurrent character queries' row-gather rerank in ONE dispatch:
    vmapped over the per-query row ids (the index broadcasts; the per-query
    matvecs batch into one (B, F) × (F, D) matmul). Returns (B, D) diffs. Same
    ops as the single-query dispatch; XLA may schedule the batched matmul's
    reductions differently, so last-ulp differences vs single-query are
    possible (the same caveat the batched normal-mode program carries)."""
    return jax.vmap(_rerank_diffs_from_rows, in_axes=(None, None, 0, 0))(
        index_matrix, norms, row_ids, valid)


@jax.jit
def ccip_mean_feature_from_rows_op(
    index_matrix: jax.Array, norms: jax.Array,
    row_ids: jax.Array, valid: jax.Array,
) -> jax.Array:
    """Just the valid-masked raw-feature mean from gathered rows — the learned-
    metric branch feeds this into its own vmapped metric program."""
    raw = index_matrix[row_ids] * norms[row_ids][:, None]
    w = valid.astype(jnp.float32)
    return jnp.sum(w[:, None] * raw, axis=0) / jnp.maximum(jnp.sum(w), 1.0)


@jax.jit
def ccip_batch_differences_op(feats: jax.Array) -> jax.Array:
    """(N, F) features -> (N, N) pairwise difference matrix = 1 - cosine.

    Full-f32 MXU precision: TPU matmuls default to bf16 passes, which costs ~1e-3 on
    the diagonal — too coarse against a 0.119 match threshold."""
    f = feats.astype(jnp.float32)
    n = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    return 1.0 - jnp.dot(n, n.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


@jax.jit
def ccip_differences_vs_index_op(index_matrix: jax.Array, query: jax.Array) -> jax.Array:
    """Differences of ONE query feature vs every indexed row — a single matvec
    (replaces the reference's per-row ONNX loop, webui.py:306-309). Index rows
    must be unit (SimilarityIndex invariant; see ccip_rerank_diffs_op note)."""
    m = index_matrix.astype(jnp.float32)
    q = query.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    return 1.0 - jnp.dot(m, q, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
