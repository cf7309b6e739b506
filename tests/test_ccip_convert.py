"""CCIP ONNX conversion: onnx_pb round-trip, config derivation, weight mapping
numerically validated against a PyTorch CAFormer replica (official metaformer
semantics), structural recovery of constant-folded Linear weights, and the
metric-graph analyzer (VERDICT r1 #2; reference gen_cfeatures.py:112-130)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from anime_illust_image_searcher_tpu.models import onnx_pb as opb
from anime_illust_image_searcher_tpu.models.ccip_weights import (
    analyze_metric_graph, convert_feat_graph, derive_config, execute_graph,
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

# --------------------------------------------------------------- torch replica
# Mirrors sail-sg/metaformer's CAFormer (the lineage of ccip-caformer-*): same
# module names as its state dict, so the exported initializer names are the
# real-world fixture for the converter's mapping table.


class TStarReLU(nn.Module):
    def __init__(self):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(0.8944))
        self.bias = nn.Parameter(torch.tensor(-0.4472))

    def forward(self, x):
        return self.scale * F.relu(x) ** 2 + self.bias


class TSquaredReLU(nn.Module):
    def forward(self, x):
        return F.relu(x) ** 2


class TLayerNormNoBias(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        return F.layer_norm(x, (x.shape[-1],), self.weight, None, self.eps)


class TScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.scale


class TSepConv(nn.Module):
    def __init__(self, dim):
        super().__init__()
        mid = 2 * dim
        self.pwconv1 = nn.Linear(dim, mid, bias=False)
        self.act1 = TStarReLU()
        self.dwconv = nn.Conv2d(mid, mid, 7, padding=3, groups=mid, bias=False)
        self.pwconv2 = nn.Linear(mid, dim, bias=False)

    def forward(self, x):  # (B, H, W, C)
        x = self.act1(self.pwconv1(x))
        x = x.permute(0, 3, 1, 2)
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        return self.pwconv2(x)


class TAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        qkv = self.qkv(t).reshape(b, -1, 3, self.heads, self.head_dim)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        o = (a.softmax(-1) @ v).transpose(1, 2).reshape(b, h * w, c)
        return self.proj(o).reshape(b, h, w, c)


class TMlp(nn.Module):
    def __init__(self, dim, ratio=4):
        super().__init__()
        self.fc1 = nn.Linear(dim, ratio * dim, bias=False)
        self.act = TStarReLU()
        self.fc2 = nn.Linear(ratio * dim, dim, bias=False)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TBlock(nn.Module):
    def __init__(self, dim, heads, res_scale):
        super().__init__()
        self.norm1 = TLayerNormNoBias(dim)
        self.token_mixer = TAttention(dim, heads) if heads else TSepConv(dim)
        self.norm2 = TLayerNormNoBias(dim)
        self.mlp = TMlp(dim)
        self.res_scale1 = TScale(dim) if res_scale else nn.Identity()
        self.res_scale2 = TScale(dim) if res_scale else nn.Identity()

    def forward(self, x):
        x = self.res_scale1(x) + self.token_mixer(self.norm1(x))
        return self.res_scale2(x) + self.mlp(self.norm2(x))


class TDownsampling(nn.Module):
    def __init__(self, cin, cout, k, stride, pad, pre_norm, post_norm):
        super().__init__()
        self.pre_norm = TLayerNormNoBias(cin) if pre_norm else nn.Identity()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=pad)
        self.post_norm = TLayerNormNoBias(cout) if post_norm else nn.Identity()

    def forward(self, x):  # (B, H, W, C) -> (B, H', W', C')
        x = self.pre_norm(x)
        x = self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        return self.post_norm(x)


DIMS = (16, 32, 48, 64)
DEPTHS = (1, 1, 1, 1)
HEADS = (0, 0, 2, 2)
FEATURE_DIM = 24
IMG = 32


class TCAFormer(nn.Module):
    def __init__(self):
        super().__init__()
        self.downsample_layers = nn.ModuleList(
            [TDownsampling(3, DIMS[0], 7, 4, 2, False, True)]
            + [TDownsampling(DIMS[i - 1], DIMS[i], 3, 2, 1, True, False)
               for i in (1, 2, 3)]
        )
        self.stages = nn.ModuleList([
            nn.Sequential(*[TBlock(DIMS[s], HEADS[s], s >= 2)
                            for _ in range(DEPTHS[s])])
            for s in range(4)
        ])
        self.norm = TLayerNormNoBias(DIMS[-1])
        self.head = nn.ModuleDict()  # plain Module so names are head.fc1 etc.
        self.head["fc1"] = nn.Linear(DIMS[-1], 4 * DIMS[-1])
        self.head["norm"] = nn.LayerNorm(4 * DIMS[-1], eps=1e-6)
        self.head["fc2"] = nn.Linear(4 * DIMS[-1], FEATURE_DIM)

    def forward(self, x):  # (B, 3, H, W) -> (B, FEATURE_DIM)
        x = x.permute(0, 2, 3, 1)
        for i in range(4):
            x = self.downsample_layers[i](x)
            x = self.stages[i](x)
        x = self.norm(x.mean((1, 2)))
        h = F.relu(self.head["fc1"](x)) ** 2
        return self.head["fc2"](self.head["norm"](h))


def _randomize(model: nn.Module, seed: int = 3) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)


def _state_dict_graph(model: TCAFormer) -> opb.GraphP:
    g = opb.GraphP(name="model_feat")
    for name, p in model.state_dict().items():
        g.initializers[name] = p.detach().numpy().astype(np.float32)
    g.inputs.append(("input", (None, 3, IMG, IMG)))
    g.outputs.append(("output", (None, FEATURE_DIM)))
    return g


def _export_style_graph(model: TCAFormer) -> opb.GraphP:
    """Mimic a real torch export: Linear weights on >2-D activations are
    constant-folded into pre-transposed ``onnx::MatMul_N`` initializers fed to
    MatMul nodes (in forward order); 2-D Linears (the head) become Gemm nodes
    keeping their names; everything else keeps state-dict names. Attention's
    two activation-activation MatMuls appear as weight-less distractors."""
    g = opb.GraphP(name="model_feat")
    counter = [100]
    lin_re = (".pwconv1.weight", ".pwconv2.weight", ".qkv.weight",
              ".proj.weight", ".fc1.weight", ".fc2.weight")
    for name, p in model.state_dict().items():
        arr = p.detach().numpy().astype(np.float32)
        if name.startswith("head."):
            g.initializers[name] = arr
            continue
        if any(name.endswith(s) for s in lin_re):
            folded = f"onnx::MatMul_{counter[0]}"
            counter[0] += 1
            g.initializers[folded] = arr.T.copy()  # pre-transposed to (in, out)
            g.nodes.append(opb.NodeP(op_type="MatMul",
                                     inputs=[f"act_{counter[0]}", folded],
                                     outputs=[f"out_{counter[0]}"]))
            if name.endswith(".qkv.weight"):  # distractor q@k^T and p@v matmuls
                for _ in range(2):
                    g.nodes.append(opb.NodeP(
                        op_type="MatMul",
                        inputs=[f"a_{counter[0]}", f"b_{counter[0]}"],
                        outputs=[f"c_{counter[0]}_{_}"]))
        else:
            g.initializers[name] = arr
    for name in ("head.fc1", "head.fc2"):
        g.nodes.append(opb.NodeP(
            op_type="Gemm", inputs=[f"act_{name}", f"{name}.weight",
                                    f"{name}.bias"],
            outputs=[f"out_{name}"],
            attributes={"transB": opb.AttrP.make("transB", 1)}))
    g.inputs.append(("input", (None, 3, IMG, IMG)))
    g.outputs.append(("output", (None, FEATURE_DIM)))
    return g


@pytest.fixture(scope="module")
def torch_model():
    m = TCAFormer().eval()
    _randomize(m)
    return m


@pytest.fixture(scope="module")
def oracle(torch_model):
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        y = torch_model(torch.from_numpy(x)).numpy()
    return x, y


# ------------------------------------------------------------------ onnx_pb


def test_onnx_pb_roundtrip(tmp_path, torch_model):
    g = _state_dict_graph(torch_model)
    n = opb.NodeP(op_type="Conv", inputs=["input", "w"], outputs=["y"],
                  attributes={
                      "strides": opb.AttrP.make("strides", [4, 4]),
                      "pads": opb.AttrP.make("pads", [2, 2, 2, 2]),
                      "alpha": opb.AttrP.make("alpha", 0.5),
                      "mode": opb.AttrP.make("mode", "notset"),
                  })
    g.nodes.append(n)
    path = str(tmp_path / "m.onnx")
    opb.save_model(opb.ModelP(graph=g), path)
    m2 = opb.load_model(path)
    g2 = m2.graph
    assert set(g2.initializers) == set(g.initializers)
    for k in g.initializers:
        np.testing.assert_array_equal(g2.initializers[k], g.initializers[k])
    n2 = g2.nodes[-1]
    assert n2.attr("strides") == [4, 4] and n2.attr("pads") == [2, 2, 2, 2]
    assert n2.attr("alpha") == 0.5 and n2.attr("mode") == b"notset"
    assert g2.inputs[0] == ("input", (None, 3, IMG, IMG))


# ------------------------------------------------------------------ converter


def test_derive_config(torch_model):
    cfg = derive_config(_state_dict_graph(torch_model))
    assert cfg.depths == DEPTHS and cfg.dims == DIMS
    assert cfg.num_heads == (0, 0, 48 // 32, 64 // 32)
    assert cfg.feature_dim == FEATURE_DIM
    assert cfg.res_scale_stages == (False, False, True, True)
    assert cfg.stem_post_norm and cfg.downsample_pre_norm
    assert cfg.head_mlp and cfg.head_hidden == 4 * DIMS[-1]
    assert cfg.img_size == IMG
    assert cfg.mlp_hidden == tuple((4 * d,) for d in DIMS)
    assert cfg.sepconv_hidden[0] == (2 * DIMS[0],) and cfg.sepconv_hidden[1] == (2 * DIMS[1],)


def _flax_forward(cfg, params, x_nchw):
    import dataclasses

    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.caformer import CAFormer

    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    # num_heads derivation assumes head_dim 32; the tiny replica uses dim//24
    # and dim//32 — override to the replica's head counts
    cfg = dataclasses.replace(cfg, num_heads=HEADS)
    model = CAFormer(cfg, use_pallas=False)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    return np.asarray(model.apply(params, x))


def test_convert_matches_torch_oracle(torch_model, oracle):
    x, y_ref = oracle
    cfg, params, report = convert_feat_graph(_state_dict_graph(torch_model))
    y = _flax_forward(cfg, params, x)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)
    assert not report.structural  # everything resolved by name
    assert not report.unclaimed, report.unclaimed


def test_convert_export_style_structural_recovery(torch_model, oracle):
    x, y_ref = oracle
    cfg, params, report = convert_feat_graph(_export_style_graph(torch_model))
    y = _flax_forward(cfg, params, x)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)
    # every in-block Linear (pw1, pw2, fc1, fc2 in conv stages; qkv, proj, fc1,
    # fc2 in attention stages) was recovered from folded MatMul weights
    assert len(report.structural) == 16
    assert not report.unclaimed, report.unclaimed


def test_convert_report_zero_fills(torch_model):
    _cfg, _params, report = convert_feat_graph(_state_dict_graph(torch_model))
    # bias-free Linears and scale-only LayerNorms get zero-filled biases
    assert "stage0_block0.mixer.pw1.bias" in report.zero_filled
    assert "stage0_block0.norm1.bias" in report.zero_filled
    assert "norm.bias" in report.zero_filled


# ------------------------------------------------------------------ executor


def test_executor_depthwise_conv_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 6, 9, 9).astype(np.float32)
    w = rng.rand(6, 1, 3, 3).astype(np.float32)
    g = opb.GraphP()
    g.initializers["w"] = w
    g.nodes.append(opb.NodeP(
        op_type="Conv", inputs=["x", "w"], outputs=["y"],
        attributes={"strides": opb.AttrP.make("strides", [2, 2]),
                    "pads": opb.AttrP.make("pads", [1, 1, 1, 1]),
                    "group": opb.AttrP.make("group", 6)}))
    g.inputs.append(("x", (None, 6, 9, 9)))
    g.outputs.append(("y", (None, 6, 5, 5)))
    got = execute_graph(g, {"x": x})[0]
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2,
                   padding=1, groups=6).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def _metric_graph(scale_after: float = 1.0) -> opb.GraphP:
    """1 - cosine over unit-normalized rows, optionally scaled (!= 1 -> not
    the hypothesis)."""
    g = opb.GraphP(name="model_metrics")
    g.initializers["one"] = np.float32(1.0)
    g.initializers["k"] = np.float32(scale_after)
    g.nodes.extend([
        opb.NodeP(op_type="ReduceL2", inputs=["feats"], outputs=["nrm"],
                  attributes={"axes": opb.AttrP.make("axes", [1]),
                              "keepdims": opb.AttrP.make("keepdims", 1)}),
        opb.NodeP(op_type="Div", inputs=["feats", "nrm"], outputs=["unit"]),
        opb.NodeP(op_type="Transpose", inputs=["unit"], outputs=["unitT"],
                  attributes={"perm": opb.AttrP.make("perm", [1, 0])}),
        opb.NodeP(op_type="MatMul", inputs=["unit", "unitT"], outputs=["sim"]),
        opb.NodeP(op_type="Sub", inputs=["one", "sim"], outputs=["raw"]),
        opb.NodeP(op_type="Mul", inputs=["raw", "k"], outputs=["diff"]),
    ])
    g.inputs.append(("feats", (None, 768)))
    g.outputs.append(("diff", (None, None)))
    return g


def test_analyze_metric_confirms_one_minus_cosine():
    verdict = analyze_metric_graph(_metric_graph())
    assert verdict["is_one_minus_cosine"] is True
    assert verdict["max_abs_diff"] < 1e-5


def test_analyze_metric_rejects_different_metric():
    verdict = analyze_metric_graph(_metric_graph(scale_after=2.0))
    assert verdict["is_one_minus_cosine"] is False


def test_analyze_metric_names_unsupported_op():
    g = _metric_graph()
    g.nodes.append(opb.NodeP(op_type="EyeLike", inputs=["diff"], outputs=["z"]))
    g.outputs[0] = ("z", (None, None))
    with pytest.raises(NotImplementedError, match="EyeLike"):
        analyze_metric_graph(g)


# ------------------------------------------------------------- checkpoint IO


def test_checkpoint_roundtrip_through_predictor(tmp_path, torch_model, oracle):
    """save_ccip_checkpoint -> CCIPPredictor(model_dir=...) reproduces the
    torch oracle end-to-end (the gen_cfeatures --model-dir path)."""
    import dataclasses

    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.config import CCIPConfig
    from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor
    from anime_illust_image_searcher_tpu.models.ccip_weights import (
        load_ccip_checkpoint, save_ccip_checkpoint,
    )

    x, y_ref = oracle
    cfg, params, _ = convert_feat_graph(_state_dict_graph(torch_model))
    cfg = dataclasses.replace(cfg, num_heads=HEADS)
    save_ccip_checkpoint(str(tmp_path / "ckpt"), cfg, params, threshold=0.119)

    cfg2, params2, thr = load_ccip_checkpoint(str(tmp_path / "ckpt"))
    assert thr == 0.119
    assert cfg2.depths == cfg.depths and cfg2.mlp_hidden == cfg.mlp_hidden
    y = _flax_forward(cfg2, params2, x)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)

    pred = CCIPPredictor(config=CCIPConfig(image_size=IMG),
                         model_dir=str(tmp_path / "ckpt"), use_pallas=False)
    assert pred.ccip_default_threshold() == 0.119
    # predictor takes uint8 and CLIP-normalizes on device; rescale the oracle
    # input into uint8 space and compare against torch on the same pixels
    u8 = (x * 255.0).astype(np.uint8)
    mean = np.asarray(pred.config.mean, np.float32)
    std = np.asarray(pred.config.std, np.float32)
    xn = ((u8.astype(np.float32) / 255.0).transpose(0, 2, 3, 1) - mean) / std
    with torch.no_grad():
        y_t = torch_model(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    # predictor's model_cfg came from config.json: num_heads derived as dim//32
    # differs from the tiny replica's heads — rebuild with the replica's heads
    pred.load_model()
    pred.model_cfg = dataclasses.replace(pred.model_cfg, num_heads=HEADS)
    feats = pred.ccip_batch_extract_features(u8.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(feats, y_t, atol=2e-3, rtol=1e-2)


def test_convert_ccip_tool_end_to_end(tmp_path, torch_model):
    """tools/convert_ccip.py over serialized synthetic feat+metric models."""
    import sys

    sys.path.insert(0, "tools")
    try:
        import convert_ccip
    finally:
        sys.path.pop(0)

    feat_path = str(tmp_path / "model_feat.onnx")
    opb.save_model(opb.ModelP(graph=_export_style_graph(torch_model)), feat_path)
    metric_path = str(tmp_path / "model_metrics.onnx")
    opb.save_model(opb.ModelP(graph=_metric_graph()), metric_path)
    mj = tmp_path / "metrics.json"
    mj.write_text('{"threshold": 0.1944}')

    rc = convert_ccip.main([
        "--feat", feat_path, "--metrics", metric_path,
        "--metrics-json", str(mj), "--dest", str(tmp_path / "out"),
        "--skip-forward-check",  # tiny replica heads != dim//32 derivation
    ])
    assert rc == 0
    assert (tmp_path / "out" / "params.npz").exists()
    assert (tmp_path / "out" / "config.json").exists()

    import json
    cfg = json.loads((tmp_path / "out" / "config.json").read_text())
    assert cfg["threshold"] == 0.1944
    assert tuple(cfg["dims"]) == DIMS


@pytest.mark.parametrize("count_include_pad", [0, 1])
def test_executor_average_pool_matches_torch(count_include_pad):
    rng = np.random.RandomState(4)
    x = rng.rand(2, 3, 11, 9).astype(np.float32)
    g = opb.GraphP()
    g.nodes.append(opb.NodeP(
        op_type="AveragePool", inputs=["x"], outputs=["y"],
        attributes={
            "kernel_shape": opb.AttrP.make("kernel_shape", [3, 3]),
            "strides": opb.AttrP.make("strides", [2, 2]),
            "pads": opb.AttrP.make("pads", [1, 1, 1, 1]),
            "count_include_pad": opb.AttrP.make("count_include_pad",
                                                count_include_pad),
        }))
    g.inputs.append(("x", (None, 3, 11, 9)))
    g.outputs.append(("y", (None, 3, 6, 5)))
    from anime_illust_image_searcher_tpu.models.ccip_weights import execute_graph
    got = execute_graph(g, {"x": x})[0]
    ref = F.avg_pool2d(torch.from_numpy(x), 3, stride=2, padding=1,
                       count_include_pad=bool(count_include_pad)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_executor_average_pool_rejects_non_2d_kernel():
    """A 1D/3D kernel_shape must raise the advertised NotImplementedError naming
    the op, not a bare tuple-unpack ValueError (ADVICE r3)."""
    g = opb.GraphP()
    g.nodes.append(opb.NodeP(
        op_type="AveragePool", inputs=["x"], outputs=["y"],
        attributes={"kernel_shape": opb.AttrP.make("kernel_shape", [3])}))
    g.inputs.append(("x", (None, 3, 11)))
    g.outputs.append(("y", (None, 3, 9)))
    from anime_illust_image_searcher_tpu.models.ccip_weights import execute_graph
    x = np.zeros((1, 3, 11), dtype=np.float32)
    with pytest.raises(NotImplementedError, match="AveragePool"):
        execute_graph(g, {"x": x})


def test_executor_average_pool_all_padding_window_is_finite():
    """pads >= kernel creates corner windows made entirely of padding; with
    count_include_pad=0 the non-pad divisor is 0 — must yield 0, not nan/inf
    (ADVICE r3)."""
    x = np.ones((1, 1, 2, 2), dtype=np.float32)
    g = opb.GraphP()
    g.nodes.append(opb.NodeP(
        op_type="AveragePool", inputs=["x"], outputs=["y"],
        attributes={
            "kernel_shape": opb.AttrP.make("kernel_shape", [2, 2]),
            "strides": opb.AttrP.make("strides", [2, 2]),
            "pads": opb.AttrP.make("pads", [2, 2, 2, 2]),
            "count_include_pad": opb.AttrP.make("count_include_pad", 0),
        }))
    g.inputs.append(("x", (None, 1, 2, 2)))
    g.outputs.append(("y", (None, 1, 3, 3)))
    from anime_illust_image_searcher_tpu.models.ccip_weights import execute_graph
    got = execute_graph(g, {"x": x})[0]
    assert np.all(np.isfinite(got))
    assert got[0, 0, 0, 0] == 0.0  # all-padding corner window
    assert got[0, 0, 1, 1] == 1.0  # the real 2x2 block
