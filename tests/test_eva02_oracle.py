"""EVA02 conversion validated against a vendored PyTorch oracle (VERDICT r2 #1).

The torch replica below mirrors timm's ``Eva`` forward semantics exactly as
instantiated by ``timm.create_model("hf-hub:SmilingWolf/wd-eva02-large-tagger-v3")``
(reference: tagging.py:146-148): patch embed -> cls token + learned abs pos embed ->
pre-norm blocks with split-qkv attention (q/v biased, k bias-free, q scaled), 2D
axial cat-RoPE applied to INTERLEAVED (even, odd) head-dim pairs with the cls token
exempt, SwiGLU MLP (silu(fc1_g) * fc1_x -> sub-LN -> fc2), and the 'avg' head
(mean over patch tokens -> fc_norm -> linear). State-dict keys use timm's naming so
``detect_config_from_state_dict`` + ``convert_timm_eva02`` (models/weights.py) see a
real-world-shaped checkpoint, including the rope half-split q/k column permutation
(models/eva02.py rope notes) — the one piece with no in-JAX cross-check.

This is the same oracle pattern tests/test_ccip_convert.py established for CAFormer;
with both in place, real-weight runs reduce to downloads (tools/convert_checkpoint.py
+ tools/parity_harness.py on a networked machine).
"""

import dataclasses
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from anime_illust_image_searcher_tpu.models.eva02 import Eva02, Eva02Config
from anime_illust_image_searcher_tpu.models.weights import (
    convert_timm_eva02, detect_config_from_state_dict,
)


@pytest.fixture(autouse=True, scope="module")
def _true_f32_matmuls():
    """These are CONVERSION-parity oracles against true-f32 torch math. On TPU,
    an f32 matmul at DEFAULT precision runs as one bf16-multiply MXU pass
    (~1e-3 relative) — the production model computes bf16 by design, but that
    arithmetic would drown the 1e-4/1e-5 conversion tolerances. Force true-f32
    matmul lowering for this module (no-op on CPU, where DEFAULT is already
    f32), so AIIS_TEST_PLATFORM=tpu validates the conversion on hardware."""
    import jax

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)

# ------------------------------------------------------------- torch replica
# timm.layers.pos_embed_sincos semantics (RotaryEmbeddingCat, in_pixels=False).

IMG = 56
PATCH = 14
DIM = 64
HEADS = 2
DEPTH = 2
MLP_HIDDEN = 112
CLASSES = 32
REF_SHAPE = (16, 16)
TEMP = 10000.0


def build_timm_rope_cat(grid, head_dim, temperature, ref_shape):
    """RotaryEmbeddingCat.pos_embed: cat([sin, cos], -1), interleaved-pair bands."""
    num_bands = head_dim // 4
    exp = torch.arange(num_bands, dtype=torch.float32) / num_bands
    bands = 1.0 / (temperature ** exp)
    t = [torch.arange(s, dtype=torch.float32) / s * r
         for s, r in zip(grid, ref_shape)]
    grid_yx = torch.stack(torch.meshgrid(t[0], t[1], indexing="ij"), dim=-1)
    pos = grid_yx.unsqueeze(-1) * bands                      # (H, W, 2, nb)
    n = grid[0] * grid[1]
    sin = pos.sin().reshape(n, -1).repeat_interleave(2, -1)  # (n, head_dim)
    cos = pos.cos().reshape(n, -1).repeat_interleave(2, -1)
    return torch.cat([sin, cos], dim=-1)                     # (n, 2*head_dim)


def rot(x):
    """timm's interleaved rotation: out[2i] = -x[2i+1], out[2i+1] = x[2i]."""
    return torch.stack([-x[..., 1::2], x[..., ::2]], -1).reshape(x.shape)


def apply_rot_embed_cat(x, emb):
    sin_emb, cos_emb = emb.tensor_split(2, -1)
    return x * cos_emb + rot(x) * sin_emb


class TEvaAttention(nn.Module):
    """timm EvaAttention, split-qkv path: q/v biased, k bias-free, q scaled."""

    def __init__(self, dim, heads, scale_norm):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.scale = self.head_dim ** -0.5
        self.q_proj = nn.Linear(dim, dim, bias=True)
        self.k_proj = nn.Linear(dim, dim, bias=False)
        self.v_proj = nn.Linear(dim, dim, bias=True)
        self.norm = (nn.LayerNorm(dim, eps=1e-6) if scale_norm else nn.Identity())
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x, rope):
        b, n, c = x.shape

        def heads(t):
            return t.reshape(b, n, self.heads, self.head_dim).transpose(1, 2)

        q, k, v = heads(self.q_proj(x)), heads(self.k_proj(x)), heads(self.v_proj(x))
        if rope is not None:
            npt = 1  # num_prefix_tokens: cls exempt from rotation
            q = torch.cat(
                [q[:, :, :npt], apply_rot_embed_cat(q[:, :, npt:], rope)], dim=2
            ).type_as(v)
            k = torch.cat(
                [k[:, :, :npt], apply_rot_embed_cat(k[:, :, npt:], rope)], dim=2
            ).type_as(v)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(self.norm(x))


class TSwiGLU(nn.Module):
    """timm.layers.SwiGLU: silu(fc1_g(x)) * fc1_x(x) -> norm -> fc2."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1_g = nn.Linear(dim, hidden, bias=True)
        self.fc1_x = nn.Linear(dim, hidden, bias=True)
        self.act = nn.SiLU()
        self.norm = nn.LayerNorm(hidden, eps=1e-6)
        self.fc2 = nn.Linear(hidden, dim, bias=True)

    def forward(self, x):
        return self.fc2(self.norm(self.act(self.fc1_g(x)) * self.fc1_x(x)))


class TEvaBlock(nn.Module):
    def __init__(self, dim, heads, hidden, scale_attn_inner, layer_scale):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TEvaAttention(dim, heads, scale_attn_inner)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TSwiGLU(dim, hidden)
        if layer_scale:
            self.gamma_1 = nn.Parameter(torch.ones(dim))
            self.gamma_2 = nn.Parameter(torch.ones(dim))
        else:
            self.gamma_1 = self.gamma_2 = None

    def forward(self, x, rope):
        if self.gamma_1 is None:
            x = x + self.attn(self.norm1(x), rope)
            x = x + self.mlp(self.norm2(x))
        else:
            x = x + self.gamma_1 * self.attn(self.norm1(x), rope)
            x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x


class TEva(nn.Module):
    """timm Eva (tiny by default; geometry overridable up to the real EVA02-L);
    module names == timm state-dict names."""

    def __init__(self, scale_attn_inner=False, layer_scale=False,
                 global_pool="avg", heads=HEADS, img=IMG, patch=PATCH,
                 dim=DIM, depth=DEPTH, mlp_hidden=MLP_HIDDEN, classes=CLASSES):
        super().__init__()
        grid = img // patch
        self.grid = (grid, grid)
        self.global_pool = global_pool
        # timm PatchEmbed saves conv as patch_embed.proj.*
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(3, dim, patch, stride=patch)})
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, dim))
        self.blocks = nn.ModuleList([
            TEvaBlock(dim, heads, mlp_hidden, scale_attn_inner, layer_scale)
            for _ in range(depth)
        ])
        if global_pool == "avg":
            self.fc_norm = nn.LayerNorm(dim, eps=1e-6)
        else:
            self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, classes)
        self.register_buffer(
            "rope_embed",
            build_timm_rope_cat(self.grid, dim // heads, TEMP, REF_SHAPE),
            persistent=False,
        )

    def forward(self, x, return_block_acts=False):
        b = x.shape[0]
        x = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        acts = []
        for blk in self.blocks:
            x = blk(x, self.rope_embed)
            acts.append(x)
        if self.global_pool == "avg":
            pooled = self.fc_norm(x[:, 1:].mean(dim=1))
        else:
            pooled = self.norm(x)[:, 0]
        logits = self.head(pooled)
        return (logits, acts) if return_block_acts else logits


def timm_state_dict(model, mlp_naming="fc1_g"):
    """State dict in timm naming; ``mlp_naming='w1'`` remaps the SwiGLU keys to
    the original-EVA02 w1/w2/w3 naming the converter also accepts."""
    sd = {}
    for name, p in model.state_dict().items():
        if mlp_naming == "w1":
            name = (name.replace("mlp.fc1_g", "mlp.w1")
                        .replace("mlp.fc1_x", "mlp.w2")
                        .replace("mlp.fc2", "mlp.w3"))
        sd[name] = p.detach().numpy().astype(np.float32)
    return sd


def _randomize(model, seed=7):
    """Structure-aware randomization: LayerNorm scales stay near 1 (a flat 0.05
    scale squashes block inputs 20x, collapsing attention scores to ~0 and uniform
    softmax — which silently makes the whole oracle rope-INSENSITIVE), and linear
    weights get fan-in scaling so attention scores are O(1) and the softmax is
    genuinely peaked. Verified discriminative: an identity rope permutation fails
    the block tolerance by >100x (test_rope_permutation_is_load_bearing)."""
    g = torch.Generator().manual_seed(seed)

    def rand(shape, scale):
        return torch.randn(shape, generator=g) * scale

    with torch.no_grad():
        for name, p in model.named_parameters():
            if ("norm" in name or name.endswith("gamma_1")
                    or name.endswith("gamma_2")):
                if name.endswith("weight") or "gamma" in name:
                    p.copy_(1.0 + rand(p.shape, 0.1))
                else:  # norm biases
                    p.copy_(rand(p.shape, 0.1))
            elif name.endswith("bias"):
                p.copy_(rand(p.shape, 0.1))
            elif p.ndim >= 2:
                fan_in = p.shape[1] if p.ndim == 2 else int(np.prod(p.shape[1:]))
                scale = 2.0 / np.sqrt(fan_in)  # 2x glorot: peaked but stable
                p.copy_(rand(p.shape, scale))
            else:  # cls_token / pos_embed squeeze to 1-D? (they are >=2-D) — scalars
                p.copy_(rand(p.shape, 0.1))


F32_BASE = Eva02Config(dtype=np.float32)  # detect fills everything else in


def convert(sd):
    cfg = detect_config_from_state_dict(sd, base=F32_BASE)
    assert cfg.img_size == IMG and cfg.depth == DEPTH
    assert cfg.embed_dim == DIM and cfg.mlp_hidden_dim == MLP_HIDDEN
    cfg = dataclasses.replace(cfg, num_heads=HEADS)
    return cfg, convert_timm_eva02(sd, cfg)


def forward_flax(cfg, params, x_nchw, intermediates=False):
    import jax.numpy as jnp

    model = Eva02(cfg, use_pallas=False)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    if not intermediates:
        return np.asarray(model.apply(params, x))
    logits, state = model.apply(params, x, capture_intermediates=True,
                                mutable=["intermediates"])
    inter = state["intermediates"]
    acts = [np.asarray(inter[f"blocks_{i}"]["__call__"][0])
            for i in range(cfg.depth)]
    return np.asarray(logits), acts


@pytest.fixture(scope="module")
def oracle_input():
    rng = np.random.RandomState(11)
    return rng.rand(2, 3, IMG, IMG).astype(np.float32)


@pytest.mark.parametrize("mlp_naming", ["fc1_g", "w1"])
def test_convert_matches_timm_oracle(oracle_input, mlp_naming):
    """Logits AND per-block activations match the torch replica <= ~1e-5 at f32,
    through the rope half-split q/k column permutation (which has no other
    independent check)."""
    m = TEva().eval()
    _randomize(m)
    with torch.no_grad():
        y_ref, acts_ref = m(torch.from_numpy(oracle_input),
                            return_block_acts=True)
    cfg, params = convert(timm_state_dict(m, mlp_naming))
    assert cfg.global_pool == "avg" and not cfg.scale_attn_inner
    assert not cfg.use_layer_scale
    y, acts = forward_flax(cfg, params, oracle_input, intermediates=True)
    # Cross-platform ulp headroom: TPU f32 (HIGHEST matmuls, different
    # exp/rsqrt implementations) accumulates ~1.2e-4 absolute on these
    # O(1-10)-scale activations vs the torch CPU replica — ~1e-5 relative,
    # while a real conversion bug (e.g. a wrong rope permutation — see the
    # canary test) costs 0.1+. 1e-4 stays the CPU bound.
    import jax

    on_cpu = jax.devices()[0].platform == "cpu"
    act_tol, logit_atol = (1e-4, 1e-5) if on_cpu else (5e-4, 5e-5)
    for i, (a, a_ref) in enumerate(zip(acts, acts_ref)):
        d = np.abs(a - a_ref.numpy()).max()
        assert d < act_tol, f"block {i} activation max|d|={d}"
    np.testing.assert_allclose(y, y_ref.numpy(), atol=logit_atol, rtol=1e-4)
    # probs (what MCut thresholds see, tagging.py:176) match even tighter
    probs = 1 / (1 + np.exp(-y))
    probs_ref = 1 / (1 + np.exp(-y_ref.numpy()))
    np.testing.assert_allclose(probs, probs_ref, atol=logit_atol)


def test_convert_matches_oracle_attn_norm_layer_scale_token_pool(oracle_input):
    """Converter auto-detection of the optional pieces: attention sub-LN
    (attn.norm.*), layer scale (gamma_1/2), and the 'token' head (final norm +
    cls token) — all numerically validated against the replica."""
    m = TEva(scale_attn_inner=True, layer_scale=True, global_pool="token").eval()
    _randomize(m, seed=13)
    # layer-scale gammas: small non-unit values so the path is actually exercised
    with torch.no_grad():
        for blk in m.blocks:
            blk.gamma_1.copy_(torch.full((DIM,), 0.7))
            blk.gamma_2.copy_(torch.full((DIM,), 1.3))
    with torch.no_grad():
        y_ref = m(torch.from_numpy(oracle_input)).numpy()
    cfg, params = convert(timm_state_dict(m))
    assert cfg.scale_attn_inner and cfg.use_layer_scale
    assert cfg.global_pool == "token"
    y = forward_flax(cfg, params, oracle_input)
    np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-4)


def test_rope_permutation_is_load_bearing(oracle_input):
    """Skipping the half-split q/k column permutation must BREAK parity — guards
    against the permutation silently becoming a no-op (e.g. identity map)."""
    import anime_illust_image_searcher_tpu.models.eva02 as eva02_mod

    m = TEva().eval()
    _randomize(m, seed=17)
    with torch.no_grad():
        y_ref = m(torch.from_numpy(oracle_input)).numpy()
    sd = timm_state_dict(m)
    cfg = dataclasses.replace(detect_config_from_state_dict(sd, base=F32_BASE),
                              num_heads=HEADS)

    real_perm = eva02_mod.rope_half_permutation
    try:
        eva02_mod.rope_half_permutation = lambda hd: np.arange(hd)
        params_noperm = convert_timm_eva02(sd, cfg)
    finally:
        eva02_mod.rope_half_permutation = real_perm
    y_noperm = forward_flax(cfg, params_noperm, oracle_input)
    # measured ~2.2 absolute at logits scale ~5 (vs ~2e-6 for the correct
    # conversion): the oracle discriminates the rope layout by ~10^6x
    assert np.abs(y_noperm - y_ref).max() > 0.1, (
        "identity-permuted conversion matched the oracle — the rope layout "
        "equivalence test has lost its teeth (attention scores too flat?)")


def test_checkpoint_dir_roundtrip(tmp_path, oracle_input):
    """safetensors + selected_tags.csv on disk -> load_tagger_checkpoint -> same
    oracle logits (the tagging --model-dir path, models/weights.py:223)."""
    safetensors = pytest.importorskip("safetensors.numpy")

    from anime_illust_image_searcher_tpu.models.weights import (
        load_tagger_checkpoint,
    )

    # load_tagger_checkpoint keeps the base num_heads=16 (the real EVA02-L value;
    # head count is not recoverable from state-dict shapes), so this replica runs
    # 16 heads / head_dim 4 — the rope permutation [0,2,1,3] per head is still
    # non-trivial, so the --model-dir path is exercised end-to-end including it.
    m = TEva(heads=16).eval()
    _randomize(m, seed=19)
    with torch.no_grad():
        y_ref = m(torch.from_numpy(oracle_input)).numpy()
    sd = timm_state_dict(m)
    safetensors.save_file(sd, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "selected_tags.csv", "w", encoding="utf-8") as f:
        f.write("tag_id,name,category\n")
        for i in range(CLASSES):
            cat = 9 if i < 2 else (4 if i >= CLASSES - 4 else 0)
            f.write(f"{i},tag_{i},{cat}\n")
    params, cfg, labels = load_tagger_checkpoint(str(tmp_path))
    assert len(labels.names) == CLASSES
    assert cfg.num_heads == 16
    cfg = dataclasses.replace(cfg, dtype=np.float32)
    y = forward_flax(cfg, params, oracle_input)
    np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-4)


@pytest.mark.skipif(os.environ.get("AIIS_FULLSCALE_ORACLE", "0") != "1",
                    reason="~4 GB RAM + minutes of CPU; run explicitly with "
                           "AIIS_FULLSCALE_ORACLE=1 (result recorded in "
                           "ARCHITECTURE.md)")
def test_convert_matches_oracle_at_full_eva02_l_geometry():
    """The tiny oracle could in principle miss a bug that only manifests at the
    production geometry (head_dim 64 -> 16 rope bands, 32x32 grid with the
    16x16 ref rescale, 1025 tokens, 24 blocks). This runs the SAME oracle at
    the real wd-eva02-large-tagger-v3 shape on one image."""
    m = TEva(heads=16, img=448, patch=14, dim=1024, depth=24,
             mlp_hidden=2730, classes=10861).eval()
    _randomize(m, seed=23)
    rng = np.random.RandomState(29)
    x = rng.rand(1, 3, 448, 448).astype(np.float32)
    with torch.no_grad():
        y_ref = m(torch.from_numpy(x)).numpy()
    sd = timm_state_dict(m)
    cfg = detect_config_from_state_dict(sd, base=F32_BASE)
    assert (cfg.img_size, cfg.embed_dim, cfg.depth) == (448, 1024, 24)
    assert cfg.num_heads == 16 and cfg.mlp_hidden_dim == 2730
    params = convert_timm_eva02(sd, cfg)
    y = forward_flax(cfg, params, x)
    # f32 CPU through 24 blocks: allow a little more accumulation drift than
    # the 2-block tiny case, still far below any tag-flip-relevant scale
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-4)
    probs = 1 / (1 + np.exp(-y))
    probs_ref = 1 / (1 + np.exp(-y_ref))
    assert np.abs(probs - probs_ref).max() < 1e-4


def test_env_model_dir_fallback(tmp_path, monkeypatch, oracle_input):
    """AIIS_MODEL_DIR mirrors CCIP's AIIS_CCIP_MODEL_DIR: a TaggerPredictor
    built without --model-dir (webui-style call sites, the release checklist's
    real-weight suite step) picks the converted checkpoint from the env."""
    safetensors = pytest.importorskip("safetensors.numpy")

    from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor

    m = TEva(heads=16).eval()
    _randomize(m, seed=31)
    sd = timm_state_dict(m)
    safetensors.save_file(sd, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "selected_tags.csv", "w", encoding="utf-8") as f:
        f.write("tag_id,name,category\n")
        for i in range(CLASSES):
            f.write(f"{i},tag_{i},{9 if i < 2 else 0}\n")

    monkeypatch.setenv("AIIS_MODEL_DIR", str(tmp_path))
    pred = TaggerPredictor()
    assert pred.model_dir == str(tmp_path)
    pred.load_model()
    assert pred.model_cfg.num_classes == CLASSES  # real checkpoint, not random

    with torch.no_grad():
        y_ref = m(torch.from_numpy(oracle_input)).numpy()
    import dataclasses as dc

    cfg = dc.replace(pred.model_cfg, dtype=np.float32)
    y = forward_flax(cfg, pred.params, oracle_input)
    np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-4)
