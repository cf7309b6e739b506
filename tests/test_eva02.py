"""EVA02 model structure, rope math, weight converter, and tagger assembly."""

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.models.eva02 import (
    Eva02Config, apply_rope_cat, build_rope_cat, forward_logits, init_params,
    tiny_test_config,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    params = init_params(cfg, seed=0, use_pallas=False)
    return cfg, params


def test_forward_shape_and_dtype(tiny, rng):
    cfg, params = tiny
    x = rng.rand(2, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    logits = forward_logits(params, x, cfg, use_pallas=False)
    assert logits.shape == (2, cfg.num_classes)
    assert logits.dtype == np.float32
    assert np.all(np.isfinite(np.asarray(logits)))


def test_forward_deterministic(tiny, rng):
    cfg, params = tiny
    x = rng.rand(1, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    a = np.asarray(forward_logits(params, x, cfg, use_pallas=False))
    b = np.asarray(forward_logits(params, x, cfg, use_pallas=False))
    np.testing.assert_array_equal(a, b)


def test_rope_shapes_and_norm_preservation(rng):
    sin, cos = build_rope_cat((4, 4), 64, 10000.0, (4, 4))
    assert sin.shape == (16, 64) and cos.shape == (16, 64)
    # rotation preserves vector norms
    x = rng.randn(1, 16, 64).astype(np.float32)
    out = np.asarray(apply_rope_cat(x, np.asarray(sin), np.asarray(cos)))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )


def test_rope_zero_position_is_identity(rng):
    sin, cos = build_rope_cat((2, 2), 32, 10000.0, None)
    x = rng.randn(1, 1, 32).astype(np.float32)
    out = np.asarray(apply_rope_cat(x, np.asarray(sin[:1]), np.asarray(cos[:1])))
    np.testing.assert_allclose(out, x, rtol=1e-6)


def test_rope_half_split_matches_timm_interleaved(rng):
    """The half-split rotate_half rope + per-head q/k permutation must produce
    attention scores identical to timm's interleaved-pair formulation on the
    unpermuted vectors (the weight converter relies on this equivalence)."""
    from anime_illust_image_searcher_tpu.models.eva02 import rope_half_permutation

    head_dim, n = 32, 16
    sin_h, cos_h = build_rope_cat((4, 4), head_dim, 100.0, None)
    sin_h, cos_h = np.asarray(sin_h), np.asarray(cos_h)
    perm = rope_half_permutation(head_dim)

    # timm layout: interleaved band duplication + (x0, x1) -> (-x1, x0)
    sin_i, cos_i = sin_h[:, perm.argsort()], cos_h[:, perm.argsort()]

    def timm_rope(x):
        x1, x2 = x[..., 0::2], x[..., 1::2]
        rot = np.stack([-x2, x1], axis=-1).reshape(x.shape)
        return x * cos_i + rot * sin_i

    q = rng.randn(n, head_dim).astype(np.float32)
    k = rng.randn(n, head_dim).astype(np.float32)
    scores_timm = timm_rope(q) @ timm_rope(k).T
    ours_q = np.asarray(apply_rope_cat(q[:, perm], sin_h, cos_h))
    ours_k = np.asarray(apply_rope_cat(k[:, perm], sin_h, cos_h))
    np.testing.assert_allclose(ours_q @ ours_k.T, scores_timm, rtol=1e-5, atol=1e-5)
    # sanity: the half-layout sin table is the permuted interleaved table
    np.testing.assert_allclose(sin_h, sin_i[:, perm], rtol=0, atol=0)


def test_rope_variant_idrow_bit_identical(tiny, rng):
    """The 'idrow' cls-row handling (identity sin/cos row 0, no row
    slice/concat) must produce BIT-IDENTICAL logits to the 'sliced' form:
    row 0 computes x·1 + rot·0 = x exactly, every other row evaluates the
    same per-element expression. Both variants share one param tree, so the
    measured winner (ARCHITECTURE §7) can be the default without regolding."""
    import dataclasses

    cfg, params = tiny
    x = rng.rand(2, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    out = {}
    for variant in ("sliced", "idrow"):
        vcfg = dataclasses.replace(cfg, rope_variant=variant)
        out[variant] = np.asarray(forward_logits(params, x, vcfg, use_pallas=False))
    np.testing.assert_array_equal(out["sliced"], out["idrow"])


def test_rope_ref_shape_rescales():
    sin_a, _ = build_rope_cat((8, 8), 32, 10000.0, (4, 4))
    sin_b, _ = build_rope_cat((4, 4), 32, 10000.0, (4, 4))
    # grid position (2, 2) in the 8x8/ref4 grid == position (1, 1) in the 4x4 grid
    np.testing.assert_allclose(
        np.asarray(sin_a).reshape(8, 8, 32)[2, 2],
        np.asarray(sin_b).reshape(4, 4, 32)[1, 1],
        rtol=1e-6,
    )


def test_weight_converter_roundtrip(tiny):
    """Synthesize a timm-style state dict for the tiny config, convert it, and verify
    the converted model runs."""
    from anime_illust_image_searcher_tpu.models.weights import (
        convert_timm_eva02, detect_config_from_state_dict,
    )

    cfg = tiny_test_config()
    rng = np.random.RandomState(0)
    d, hid, ncls, p = cfg.embed_dim, cfg.mlp_hidden_dim, cfg.num_classes, cfg.patch_size

    sd = {
        "patch_embed.proj.weight": rng.randn(d, 3, p, p).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(d).astype(np.float32),
        "cls_token": rng.randn(1, 1, d).astype(np.float32),
        "pos_embed": rng.randn(1, cfg.num_patches + 1, d).astype(np.float32),
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": np.zeros(d, np.float32),
        "head.weight": rng.randn(ncls, d).astype(np.float32),
        "head.bias": np.zeros(ncls, np.float32),
    }
    for i in range(cfg.depth):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm1.bias": np.zeros(d, np.float32),
            f"blocks.{i}.norm2.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm2.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.q_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.q_proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.k_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.v_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.v_proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.mlp.w1.weight": rng.randn(hid, d).astype(np.float32),
            f"blocks.{i}.mlp.w1.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.w2.weight": rng.randn(hid, d).astype(np.float32),
            f"blocks.{i}.mlp.w2.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.norm.weight": np.ones(hid, np.float32),
            f"blocks.{i}.mlp.norm.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.w3.weight": rng.randn(d, hid).astype(np.float32),
            f"blocks.{i}.mlp.w3.bias": np.zeros(d, np.float32),
        })

    detected = detect_config_from_state_dict(sd, base=cfg)
    assert detected.embed_dim == d
    assert detected.depth == cfg.depth
    assert detected.num_classes == ncls
    assert detected.img_size == cfg.img_size
    assert not detected.scale_attn_inner

    params = convert_timm_eva02(sd, detected)
    x = np.zeros((1, cfg.img_size, cfg.img_size, 3), np.float32)
    import dataclasses
    import jax.numpy as jnp

    run_cfg = dataclasses.replace(detected, dtype=jnp.float32)
    logits = forward_logits(params, x, run_cfg, use_pallas=False)
    assert logits.shape == (1, ncls)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_converter_detects_avg_pool_variant():
    """A checkpoint with fc_norm keys maps to the avg-pool head (timm Eva default)."""
    import dataclasses

    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.weights import (
        convert_timm_eva02, detect_config_from_state_dict,
    )

    cfg = tiny_test_config()
    rng = np.random.RandomState(1)
    d, hid, ncls, p = cfg.embed_dim, cfg.mlp_hidden_dim, cfg.num_classes, cfg.patch_size
    sd = {
        "patch_embed.proj.weight": rng.randn(d, 3, p, p).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(d, np.float32),
        "cls_token": rng.randn(1, 1, d).astype(np.float32),
        "pos_embed": rng.randn(1, cfg.num_patches + 1, d).astype(np.float32),
        "fc_norm.weight": np.ones(d, np.float32),
        "fc_norm.bias": np.zeros(d, np.float32),
        "head.weight": rng.randn(ncls, d).astype(np.float32),
        "head.bias": np.zeros(ncls, np.float32),
    }
    for i in range(cfg.depth):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm1.bias": np.zeros(d, np.float32),
            f"blocks.{i}.norm2.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm2.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.q_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.q_proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.k_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.v_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.v_proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.mlp.w1.weight": rng.randn(hid, d).astype(np.float32),
            f"blocks.{i}.mlp.w1.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.w2.weight": rng.randn(hid, d).astype(np.float32),
            f"blocks.{i}.mlp.w2.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.norm.weight": np.ones(hid, np.float32),
            f"blocks.{i}.mlp.norm.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.w3.weight": rng.randn(d, hid).astype(np.float32),
            f"blocks.{i}.mlp.w3.bias": np.zeros(d, np.float32),
        })
    detected = detect_config_from_state_dict(sd, base=cfg)
    assert detected.global_pool == "avg"
    params = convert_timm_eva02(sd, detected)
    assert "fc_norm" in params["params"]
    run_cfg = dataclasses.replace(detected, dtype=jnp.float32)
    x = np.zeros((1, cfg.img_size, cfg.img_size, 3), np.float32)
    logits = forward_logits(params, x, run_cfg, use_pallas=False)
    assert logits.shape == (1, ncls)


def test_checkpoint_dir_roundtrip(tmp_path, tiny):
    """Full --model-dir flow: safetensors state dict + selected_tags.csv on disk ->
    load_tagger_checkpoint -> TaggerPredictor tags a batch. Also pins that the
    converter applied the rope half-split q/k permutation."""
    import safetensors.numpy

    from anime_illust_image_searcher_tpu.models.eva02 import rope_half_permutation
    from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor
    from anime_illust_image_searcher_tpu.models.weights import _t

    cfg = tiny_test_config(num_classes=6)
    rng = np.random.RandomState(2)
    d, hid, ncls, p = cfg.embed_dim, cfg.mlp_hidden_dim, cfg.num_classes, cfg.patch_size
    sd = {
        "patch_embed.proj.weight": rng.randn(d, 3, p, p).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(d, np.float32),
        "cls_token": rng.randn(1, 1, d).astype(np.float32),
        "pos_embed": rng.randn(1, cfg.num_patches + 1, d).astype(np.float32),
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": np.zeros(d, np.float32),
        "head.weight": rng.randn(ncls, d).astype(np.float32),
        "head.bias": np.zeros(ncls, np.float32),
    }
    for i in range(cfg.depth):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm1.bias": np.zeros(d, np.float32),
            f"blocks.{i}.norm2.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm2.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.q_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.q_proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.k_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.v_proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.v_proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.proj.weight": rng.randn(d, d).astype(np.float32),
            f"blocks.{i}.attn.proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.mlp.w1.weight": rng.randn(hid, d).astype(np.float32),
            f"blocks.{i}.mlp.w1.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.w2.weight": rng.randn(hid, d).astype(np.float32),
            f"blocks.{i}.mlp.w2.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.norm.weight": np.ones(hid, np.float32),
            f"blocks.{i}.mlp.norm.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.w3.weight": rng.randn(d, hid).astype(np.float32),
            f"blocks.{i}.mlp.w3.bias": np.zeros(d, np.float32),
        })
    safetensors.numpy.save_file(sd, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "selected_tags.csv", "w", encoding="utf-8") as f:
        f.write("tag_id,name,category,count\n")
        f.write("1,general,9,10\n")  # rating row (category 9)
        for j in range(ncls - 3):
            f.write(f"{10+j},gen_tag_{j},0,5\n")
        f.write("90,char_a,4,3\n")
        f.write("91,char_b,4,2\n")

    # model_cfg seeds detection with the tiny geometry's num_heads — detection
    # refuses to guess head counts outside the published EVA02 sizes
    pred = TaggerPredictor(model_dir=str(tmp_path), model_cfg=cfg)
    pred.load_model()
    # rope permutation applied to the q kernel (per-head half-split column order)
    head_dim = pred.model_cfg.head_dim
    perm = rope_half_permutation(head_dim)
    full = np.concatenate(
        [h * head_dim + perm for h in range(pred.model_cfg.num_heads)])
    got_q = np.asarray(pred.params["params"]["blocks_0"]["attn"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(got_q, _t(sd["blocks.0.attn.q_proj.weight"])[:, full])

    imgs = rng.randint(0, 255, (2, pred.model_cfg.img_size,
                                pred.model_cfg.img_size, 3), dtype=np.uint8)
    lines = pred.predict(imgs, 0.3, True, 0.3, True)
    assert len(lines) == 2 and all(isinstance(s, str) for s in lines)


def test_head_weight_transposed_correctly(tiny):
    """Converter must transpose torch (out,in) Linear weights."""
    from anime_illust_image_searcher_tpu.models.weights import _t

    w = np.arange(6, dtype=np.float32).reshape(2, 3)  # (out=2, in=3)
    assert _t(w).shape == (3, 2)
    np.testing.assert_array_equal(_t(w)[0], [0.0, 3.0])


def _fake_sd(embed_dim=128, depth=1, heads_dim_ok=True, pos_embed=True,
             num_classes=7, patch=14, grid=4):
    """Minimal timm-shaped state dict for config detection tests."""
    sd = {
        "cls_token": np.zeros((1, 1, embed_dim), np.float32),
        "head.weight": np.zeros((num_classes, embed_dim), np.float32),
        "head.bias": np.zeros((num_classes,), np.float32),
        "patch_embed.proj.weight": np.zeros((embed_dim, 3, patch, patch), np.float32),
        "blocks.0.mlp.w1.weight": np.zeros((embed_dim * 2, embed_dim), np.float32),
    }
    for i in range(depth):
        sd[f"blocks.{i}.norm1.weight"] = np.zeros((embed_dim,), np.float32)
    if pos_embed:
        sd["pos_embed"] = np.zeros((1, grid * grid + 1, embed_dim), np.float32)
    return sd


def test_detect_config_rejects_unknown_head_geometry():
    """num_heads is not stored in a timm state dict and a wrong value passes
    every shape check while scrambling heads — unknown embed_dims must be
    rejected, not guessed."""
    from anime_illust_image_searcher_tpu.models.weights import (
        detect_config_from_state_dict,
    )

    with pytest.raises(ValueError, match="num_heads"):
        # indivisible by the base head count and not a published size
        detect_config_from_state_dict(_fake_sd(embed_dim=136),
                                      base=Eva02Config(num_heads=16))

    # known published geometry resolves (EVA02-B: 768 -> 12 heads)
    cfg = detect_config_from_state_dict(_fake_sd(embed_dim=768))
    assert cfg.num_heads == 12

    # an explicit base config with matching embed_dim wins
    base = Eva02Config(embed_dim=136, num_heads=8)
    cfg = detect_config_from_state_dict(_fake_sd(embed_dim=136), base=base)
    assert cfg.num_heads == 8


def test_detect_config_rope_only_checkpoint():
    """A checkpoint without pos_embed (timm use_abs_pos_emb=False) must detect
    cleanly instead of raising KeyError, with the flag flipped off."""
    from anime_illust_image_searcher_tpu.models.weights import (
        detect_config_from_state_dict,
    )

    base = Eva02Config(embed_dim=128, num_heads=4, img_size=56)
    cfg = detect_config_from_state_dict(_fake_sd(pos_embed=False), base=base)
    assert not cfg.use_abs_pos_emb
    assert cfg.img_size == 56  # not recoverable from weights: base wins


def test_forward_batch_fallback_on_compile_memory_error(tiny, monkeypatch):
    """A compile-time memory rejection of the configured batch must degrade to
    half-width dispatches with identical concatenated output — and must NOT
    retry the rejected width on later batches (seen live: the relay's AOT
    compiler rejects fresh B=256 EVA02 compiles on memory)."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.config import TaggerConfig
    from anime_illust_image_searcher_tpu.models import tagger
    from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor

    cfg, params = tiny
    predictor = TaggerPredictor(config=TaggerConfig(batch_size=64),
                                use_pallas=False, model_cfg=cfg)
    predictor.load_model()
    predictor.params = params  # shared fixture weights

    images = (np.random.RandomState(0)
              .randint(0, 255, size=(64, cfg.img_size, cfg.img_size, 3))
              .astype(np.uint8))
    # expected = two real half-width forwards (the fallback's dispatch plan);
    # a B=64 forward can differ in final ulps from B=32 halves (different
    # vectorization of the same reductions), so exactness is pinned against
    # the plan, not across program widths
    expected = np.concatenate([
        np.asarray(tagger._predict_probs(
            params, jnp.asarray(images[i:i + 32]), predictor._mean,
            predictor._std, cfg, False))
        for i in (0, 32)
    ])

    real = tagger._predict_probs
    calls = []

    def flaky(params_, images_, mean_, std_, cfg_, use_pallas_):
        calls.append(int(images_.shape[0]))
        if images_.shape[0] >= 64:
            raise RuntimeError(
                "INTERNAL: AOT PJRT error: Allocation (size=19478347776) "
                "would exceed memory (size=17179869184)")
        return real(params_, images_, mean_, std_, cfg_, use_pallas_)

    monkeypatch.setattr(tagger, "_predict_probs", flaky)
    got = predictor.predict_probs(images)
    np.testing.assert_array_equal(got, expected)
    assert predictor._max_device_batch == 32
    assert calls == [64, 32, 32]

    calls.clear()
    predictor.predict_probs(images)  # the rejected width is not retried
    assert calls == [32, 32]

    # a genuine program bug must still surface, not silently halve the batch
    def broken(*a, **k):
        raise RuntimeError("something unrelated")

    monkeypatch.setattr(tagger, "_predict_probs", broken)
    predictor._max_device_batch = None
    with pytest.raises(RuntimeError, match="unrelated"):
        predictor.predict_probs(images)


def test_category_thresholds_tolerates_tiny_categories():
    """<2 tags in a category must not crash the device program when mcut is
    disabled (the reference only evaluates mcut when enabled)."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.tagger import _category_thresholds

    probs = jnp.asarray(np.random.RandomState(0).rand(3, 5).astype(np.float32))
    g = jnp.asarray(np.asarray([0, 1, 2], np.int32))
    c = jnp.asarray(np.asarray([3], np.int32))  # single character tag
    g_t, c_t = _category_thresholds(probs, g, c, 0.15)
    assert g_t.shape == (3,) and c_t.shape == (3,)
    assert np.all(np.asarray(c_t) == 1.0)  # placeholder: selects nothing
