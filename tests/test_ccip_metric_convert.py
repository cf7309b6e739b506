"""Learned CCIP metric conversion (VERDICT r2 #3).

The reference's character mode runs a second ONNX model, ``model_metrics.onnx``
(gen_cfeatures.py:124-130,248-274). Round 2 bet it computes 1-cosine and
dead-ended otherwise; these tests cover the other branch: synthetic learned
metric heads (abs-diff MLP with Shape/Concat/Reshape plumbing, bilinear-sigmoid)
are analyzed, converted into jitted JAX metric functions (``metric_fn_from_graph``),
checked against hand-computed numpy oracles, and wired end-to-end through
``CCIPPredictor`` (which picks them up from a checkpoint dir's model_metrics.onnx
— the file tools/convert_ccip.py ships when the real graph is not 1-cosine).
"""

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.models import onnx_pb as opb
from anime_illust_image_searcher_tpu.models.ccip_weights import (
    analyze_metric_graph, execute_graph, metric_fn_from_graph,
    metric_vs_index_fn,
)

F = 24  # tiny feature dim
H = 16  # MLP hidden


def _w(rng, *shape):
    return rng.randn(*shape).astype(np.float32) * 0.3


def absdiff_mlp_graph(rng):
    """diff[i,j] = relu(|a_i - a_j| @ W1 + b1) @ W2 + b2 — plus Shape/Gather/
    Concat/Reshape plumbing for the final squeeze, exercising the converter's
    concrete shape-arithmetic path."""
    g = opb.GraphP(name="model_metrics")
    g.initializers["W1"] = _w(rng, F, H)
    g.initializers["b1"] = _w(rng, H)
    g.initializers["W2"] = _w(rng, H, 1)
    g.initializers["b2"] = _w(rng, 1)
    g.initializers["ax0"] = np.asarray([1], np.int64)
    g.initializers["ax1"] = np.asarray([0], np.int64)
    g.initializers["i0"] = np.asarray(0, np.int64)
    g.initializers["i1"] = np.asarray(1, np.int64)
    g.nodes.extend([
        opb.NodeP(op_type="Unsqueeze", inputs=["feats", "ax0"], outputs=["a"]),
        opb.NodeP(op_type="Unsqueeze", inputs=["feats", "ax1"], outputs=["b"]),
        opb.NodeP(op_type="Sub", inputs=["a", "b"], outputs=["d"]),
        opb.NodeP(op_type="Abs", inputs=["d"], outputs=["ad"]),
        opb.NodeP(op_type="MatMul", inputs=["ad", "W1"], outputs=["h0"]),
        opb.NodeP(op_type="Add", inputs=["h0", "b1"], outputs=["h1"]),
        opb.NodeP(op_type="Relu", inputs=["h1"], outputs=["h2"]),
        opb.NodeP(op_type="MatMul", inputs=["h2", "W2"], outputs=["m0"]),
        opb.NodeP(op_type="Add", inputs=["m0", "b2"], outputs=["m1"]),
        # squeeze (N,N,1) -> (N,N) via Shape plumbing
        opb.NodeP(op_type="Shape", inputs=["m1"], outputs=["shp"]),
        opb.NodeP(op_type="Gather", inputs=["shp", "i0"], outputs=["n0"],
                  attributes={"axis": opb.AttrP.make("axis", 0)}),
        opb.NodeP(op_type="Gather", inputs=["shp", "i1"], outputs=["n1"],
                  attributes={"axis": opb.AttrP.make("axis", 0)}),
        opb.NodeP(op_type="Unsqueeze", inputs=["n0", "ax1"], outputs=["n0u"]),
        opb.NodeP(op_type="Unsqueeze", inputs=["n1", "ax1"], outputs=["n1u"]),
        opb.NodeP(op_type="Concat", inputs=["n0u", "n1u"], outputs=["tgt"],
                  attributes={"axis": opb.AttrP.make("axis", 0)}),
        opb.NodeP(op_type="Reshape", inputs=["m1", "tgt"], outputs=["diff"]),
    ])
    g.inputs.append(("feats", (None, F)))
    g.outputs.append(("diff", (None, None)))
    return g


def absdiff_mlp_oracle(feats, g):
    d = np.abs(feats[:, None, :] - feats[None, :, :])
    h = np.maximum(d @ g.initializers["W1"] + g.initializers["b1"], 0)
    return (h @ g.initializers["W2"] + g.initializers["b2"])[:, :, 0]


def bilinear_graph(rng):
    """diff[i,j] = 1 - sigmoid(a_i @ W @ a_j^T * k)."""
    g = opb.GraphP(name="model_metrics")
    g.initializers["W"] = _w(rng, F, F)
    g.initializers["k"] = np.float32(0.5)
    g.initializers["one"] = np.float32(1.0)
    g.nodes.extend([
        opb.NodeP(op_type="MatMul", inputs=["feats", "W"], outputs=["p"]),
        opb.NodeP(op_type="Transpose", inputs=["feats"], outputs=["ft"],
                  attributes={"perm": opb.AttrP.make("perm", [1, 0])}),
        opb.NodeP(op_type="MatMul", inputs=["p", "ft"], outputs=["s"]),
        opb.NodeP(op_type="Mul", inputs=["s", "k"], outputs=["sk"]),
        opb.NodeP(op_type="Sigmoid", inputs=["sk"], outputs=["sig"]),
        opb.NodeP(op_type="Sub", inputs=["one", "sig"], outputs=["diff"]),
    ])
    g.inputs.append(("feats", (None, F)))
    g.outputs.append(("diff", (None, None)))
    return g


def bilinear_oracle(feats, g):
    s = feats @ g.initializers["W"] @ feats.T * g.initializers["k"]
    return 1.0 - 1.0 / (1.0 + np.exp(-s))


ARCHES = [
    ("absdiff_mlp", absdiff_mlp_graph, absdiff_mlp_oracle),
    ("bilinear", bilinear_graph, bilinear_oracle),
]


@pytest.mark.parametrize("name,builder,oracle", ARCHES, ids=[a[0] for a in ARCHES])
def test_learned_metric_converts_and_matches_oracle(name, builder, oracle):
    rng = np.random.RandomState(0)
    g = builder(rng)
    feats = rng.randn(6, F).astype(np.float32)
    want = oracle(feats, g)

    # numpy executor agrees with the hand oracle (it is the semantics baseline)
    got_np = execute_graph(g, {"feats": feats})[0]
    np.testing.assert_allclose(got_np, want, atol=1e-5, rtol=1e-5)

    verdict = analyze_metric_graph(g, feature_dim=F)
    assert verdict["is_one_minus_cosine"] is False
    assert verdict["convertible"] is True
    assert verdict["converted_max_diff"] < 1e-4

    import jax

    fn = jax.jit(metric_fn_from_graph(g))
    got = np.asarray(fn(feats))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name,builder,oracle", ARCHES, ids=[a[0] for a in ARCHES])
def test_metric_vs_index_matches_pairwise(name, builder, oracle):
    rng = np.random.RandomState(1)
    g = builder(rng)
    index = rng.randn(32, F).astype(np.float32)
    query = rng.randn(F).astype(np.float32)
    import jax

    fn = jax.jit(metric_vs_index_fn(g))
    got = np.asarray(fn(index, query))
    stacked = np.concatenate([query[None], index])
    want = oracle(stacked, g)[0, 1:]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def one_minus_cos_graph():
    g = opb.GraphP(name="model_metrics")
    g.initializers["one"] = np.float32(1.0)
    g.nodes.extend([
        opb.NodeP(op_type="ReduceL2", inputs=["feats"], outputs=["nrm"],
                  attributes={"axes": opb.AttrP.make("axes", [1]),
                              "keepdims": opb.AttrP.make("keepdims", 1)}),
        opb.NodeP(op_type="Div", inputs=["feats", "nrm"], outputs=["unit"]),
        opb.NodeP(op_type="Transpose", inputs=["unit"], outputs=["unitT"],
                  attributes={"perm": opb.AttrP.make("perm", [1, 0])}),
        opb.NodeP(op_type="MatMul", inputs=["unit", "unitT"], outputs=["sim"]),
        opb.NodeP(op_type="Sub", inputs=["one", "sim"], outputs=["diff"]),
    ])
    g.inputs.append(("feats", (None, F)))
    g.outputs.append(("diff", (None, None)))
    return g


def _checkpoint_dir(tmp_path, metric_graph=None):
    """Tiny CAFormer checkpoint dir (+ optional model_metrics.onnx)."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.caformer import (
        CAFormerConfig, init_params,
    )
    from anime_illust_image_searcher_tpu.models.ccip_weights import (
        save_ccip_checkpoint,
    )

    cfg = CAFormerConfig(img_size=32, dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                         num_heads=(0, 0, 1, 1), feature_dim=F,
                         mlp_hidden=((32,), (64,), (96,), (128,)),
                         sepconv_hidden=((16,), (32,), (48,), (64,)),
                         dtype=jnp.float32)
    params = init_params(cfg, seed=0, use_pallas=False)
    dest = str(tmp_path / "ckpt")
    save_ccip_checkpoint(dest, cfg, params, threshold=0.2)
    if metric_graph is not None:
        opb.save_model(opb.ModelP(graph=metric_graph),
                       str(tmp_path / "ckpt" / "model_metrics.onnx"))
    return dest


def test_predictor_uses_learned_metric(tmp_path):
    from anime_illust_image_searcher_tpu.config import CCIPConfig
    from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor

    rng = np.random.RandomState(2)
    g = absdiff_mlp_graph(rng)
    dest = _checkpoint_dir(tmp_path, metric_graph=g)
    pred = CCIPPredictor(config=CCIPConfig(image_size=32, feature_dim=F),
                         model_dir=dest, use_pallas=False)
    feats = [rng.randn(F).astype(np.float32) for _ in range(5)]
    got = pred.ccip_batch_differences(feats)
    want = absdiff_mlp_oracle(np.stack(feats), g)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    assert pred._metric_fn is not None  # learned path active

    index = rng.randn(12, F).astype(np.float32)
    got_vi = pred.ccip_differences_vs_index(index, feats[0])
    stacked = np.concatenate([feats[0][None], index])
    want_vi = absdiff_mlp_oracle(stacked, g)[0, 1:]
    np.testing.assert_allclose(got_vi, want_vi, atol=1e-4, rtol=1e-4)


def test_predictor_keeps_fused_ops_for_one_minus_cos(tmp_path):
    from anime_illust_image_searcher_tpu.config import CCIPConfig
    from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor

    dest = _checkpoint_dir(tmp_path, metric_graph=one_minus_cos_graph())
    pred = CCIPPredictor(config=CCIPConfig(image_size=32, feature_dim=F),
                         model_dir=dest, use_pallas=False)
    rng = np.random.RandomState(3)
    feats = [rng.randn(F).astype(np.float32) for _ in range(4)]
    got = pred.ccip_batch_differences(feats)
    assert pred._metric_fn is None  # 1-cos keeps the exact fused matmul ops
    m = np.stack(feats)
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    np.testing.assert_allclose(got, 1 - n @ n.T, atol=1e-5)


def test_unconvertible_metric_raises_with_op_name(tmp_path):
    g = one_minus_cos_graph()
    g.nodes.append(opb.NodeP(op_type="EyeLike", inputs=["diff"], outputs=["z"]))
    g.outputs[0] = ("z", (None, None))
    with pytest.raises(NotImplementedError, match="EyeLike"):
        analyze_metric_graph(g, feature_dim=F)


def test_rerank_diffs_with_learned_metric(tmp_path):
    """The one-dispatch character rerank falls back to extract + vmapped metric
    when a learned metric is active; diffs must match the oracle on the
    valid-masked mean feature (webui.py:292-309 semantics)."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.config import CCIPConfig
    from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor

    rng = np.random.RandomState(5)
    g = absdiff_mlp_graph(rng)
    dest = _checkpoint_dir(tmp_path, metric_graph=g)
    pred = CCIPPredictor(config=CCIPConfig(image_size=32, feature_dim=F),
                         model_dir=dest, use_pallas=False)

    class StubIndex:
        def __init__(self, m):
            self._m = jnp.asarray(m)

        def _device(self):
            return self._m

    index_rows = rng.randn(9, F).astype(np.float32)
    imgs = rng.randint(0, 255, (4, 32, 32, 3), np.uint8)
    n_valid = 3
    diffs = pred.rerank_diffs(imgs, n_valid, StubIndex(index_rows))

    feats = pred.ccip_batch_extract_features(imgs)
    mean_feat = feats[:n_valid].mean(axis=0)
    stacked = np.concatenate([mean_feat[None], index_rows])
    want = absdiff_mlp_oracle(stacked, g)[0, 1:]
    np.testing.assert_allclose(diffs, want, atol=1e-4, rtol=1e-4)


def test_rerank_diffs_learned_metric_on_mesh(tmp_path):
    """Mesh mode + learned metric: the k-image top-k batch (k not divisible by
    the data axis) must replicate rather than dp-shard, and results must match
    the single-device path."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.config import CCIPConfig
    from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor
    from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(6)
    g = absdiff_mlp_graph(rng)
    dest = _checkpoint_dir(tmp_path, metric_graph=g)

    class StubIndex:
        def __init__(self, m):
            self._m = jnp.asarray(m)

        def _device(self):
            return self._m

    index_rows = rng.randn(7, F).astype(np.float32)
    imgs = rng.randint(0, 255, (10, 32, 32, 3), np.uint8)  # k=10, n_data=8

    single = CCIPPredictor(config=CCIPConfig(image_size=32, feature_dim=F),
                           model_dir=dest, use_pallas=False)
    want = single.rerank_diffs(imgs, 4, StubIndex(index_rows))

    meshed = CCIPPredictor(config=CCIPConfig(image_size=32, feature_dim=F),
                           model_dir=dest, use_pallas=False,
                           mesh=make_mesh(n_data=8))
    got = meshed.rerank_diffs(imgs, 4, StubIndex(index_rows))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_np_and_jnp_interpreters_stay_in_lockstep(rng):
    """The numpy executor (analysis probe) and the jnp interpreter (shipped
    metric) are two implementations of the same op semantics; any divergence
    means 'probe says crash, converter says fine' inconsistencies. Exercise
    the shared-op surface, including bidirectional Expand broadcast (a past
    drift: fixed in the jnp copy only)."""
    feats = rng.randn(3, F).astype(np.float32)

    def lockstep(graph):
        got_np = execute_graph(graph, {"feats": feats})[0]
        got_jnp = np.asarray(metric_fn_from_graph(graph)(feats))
        np.testing.assert_allclose(got_np, got_jnp, rtol=1e-5, atol=1e-6)
        return got_np

    # bidirectional Expand: input (3,1) vs target (2,1,F) -> (2,3,F)
    g = opb.GraphP(name="model_metrics")
    g.inputs = [("feats", (3, F))]
    g.initializers = {
        "ax1": np.asarray([1], np.int64),
        "target": np.asarray([2, 1, F], np.int64),
        "axes_all": np.asarray([0, 1, 2], np.int64),
    }
    g.nodes = [
        opb.NodeP(op_type="ReduceSum", inputs=["feats"], outputs=["s"],
                  attributes={"axes": opb.AttrP.make("axes", [1]), "keepdims": opb.AttrP.make("keepdims", 1)}),            # (3, 1)
        opb.NodeP(op_type="Expand", inputs=["s", "target"], outputs=["e"]),
        opb.NodeP(op_type="Tanh", inputs=["e"], outputs=["t"]),
        opb.NodeP(op_type="ReduceSum", inputs=["t"], outputs=["out"],
                  attributes={"axes": opb.AttrP.make("axes", [0, 2]), "keepdims": opb.AttrP.make("keepdims", 0)}),
    ]
    g.outputs = [("out", ())]
    out = lockstep(g)
    assert out.shape == (3,)

    # elementwise / Gemm / transpose mix
    g2 = opb.GraphP(name="model_metrics")
    g2.inputs = [("feats", (3, F))]
    W = _w(rng, F, F)
    g2.initializers = {"W": W, "b": _w(rng, F)}
    g2.nodes = [
        opb.NodeP(op_type="Gemm", inputs=["feats", "W", "b"], outputs=["h"],
                  attributes={"alpha": opb.AttrP.make("alpha", 1.0), "beta": opb.AttrP.make("beta", 1.0)}),
        opb.NodeP(op_type="Sigmoid", inputs=["h"], outputs=["s"]),
        opb.NodeP(op_type="Transpose", inputs=["s"], outputs=["st"],
                  attributes={"perm": opb.AttrP.make("perm", [1, 0])}),
        opb.NodeP(op_type="MatMul", inputs=["s", "st"], outputs=["out"]),
    ]
    g2.outputs = [("out", ())]
    out2 = lockstep(g2)
    assert out2.shape == (3, 3)
