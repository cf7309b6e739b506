"""CCIP: caformer forward, metric ops, gen_cfeatures CLI, character reranker."""

import os

import numpy as np
import pytest
from PIL import Image

from anime_illust_image_searcher_tpu.config import CCIPConfig
from anime_illust_image_searcher_tpu.models.caformer import (
    ccip_batch_differences_op, ccip_differences_vs_index_op, tiny_test_config,
)
from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor

TINY = tiny_test_config()
CFG = CCIPConfig(image_size=TINY.img_size, feature_dim=TINY.feature_dim,
                 batch_size=4, decode_workers=2)


def make_predictor():
    return CCIPPredictor(config=CFG, model_cfg=TINY, use_pallas=False)


@pytest.fixture(scope="module")
def predictor():
    return make_predictor()


def test_feature_shape_and_determinism(predictor, rng):
    imgs = rng.randint(0, 255, (3, TINY.img_size, TINY.img_size, 3), dtype=np.uint8)
    f1 = predictor.ccip_batch_extract_features(imgs)
    f2 = predictor.ccip_batch_extract_features(imgs)
    assert f1.shape == (3, TINY.feature_dim)
    np.testing.assert_array_equal(f1, f2)


def test_batch_differences_matrix(predictor, rng):
    imgs = rng.randint(0, 255, (3, TINY.img_size, TINY.img_size, 3), dtype=np.uint8)
    feats = predictor.ccip_batch_extract_features(imgs)
    d = predictor.ccip_batch_differences(list(feats))
    assert d.shape == (3, 3)
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)
    np.testing.assert_allclose(d, d.T, atol=1e-6)
    assert np.all(d >= -1e-5) and np.all(d <= 2.0 + 1e-5)


def test_difference_is_one_minus_cosine(rng):
    feats = rng.randn(4, 16).astype(np.float32)
    d = np.asarray(ccip_batch_differences_op(feats))
    n = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    np.testing.assert_allclose(d, 1.0 - n @ n.T, atol=1e-5)


def test_vs_index_matches_pairwise(rng):
    raw = rng.randn(8, 16).astype(np.float32)
    # the op's contract: index rows are UNIT (SimilarityIndex invariant) —
    # the renormalization was hoisted off the per-query hot path
    index = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    q = rng.randn(16).astype(np.float32)
    got = np.asarray(ccip_differences_vs_index_op(index, q))
    full = np.asarray(ccip_batch_differences_op(np.vstack([q[None], raw])))
    np.testing.assert_allclose(got, full[0, 1:], atol=1e-5)


def make_images(directory, n, size=48, prefix="img"):
    rng = np.random.RandomState(7)
    os.makedirs(directory, exist_ok=True)
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, size=(size, size, 3), dtype=np.uint8)
        p = os.path.join(directory, f"{prefix}_{i:02d}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_gen_cfeatures_cli(tmp_cwd):
    from anime_illust_image_searcher_tpu.cli import gen_cfeatures
    from anime_illust_image_searcher_tpu.index import artifacts
    from anime_illust_image_searcher_tpu.index.similarity import SimilarityIndex

    make_images(tmp_cwd / "imgs", 6)
    pred = gen_cfeatures.Predictor(config=CFG, model_cfg=TINY, use_pallas=False)
    pred.process_directory(str(tmp_cwd / "imgs"))

    with open(artifacts.CFEATURES_CSV, encoding="utf-8") as f:
        csv_paths = [l.strip() for l in f if l.strip()]
    assert len(csv_paths) == 6
    idx = SimilarityIndex.load(artifacts.cfeatures_index_name(0))
    assert len(idx) == 6
    assert idx.num_features == TINY.feature_dim


def test_gen_cfeatures_after_creates_revision(tmp_cwd):
    import datetime

    from anime_illust_image_searcher_tpu.cli import gen_cfeatures
    from anime_illust_image_searcher_tpu.index import artifacts
    from anime_illust_image_searcher_tpu.index.similarity import SimilarityIndex

    make_images(tmp_cwd / "imgs", 3)
    pred = gen_cfeatures.Predictor(config=CFG, model_cfg=TINY, use_pallas=False)
    pred.process_directory(str(tmp_cwd / "imgs"))

    make_images(tmp_cwd / "imgs", 2, prefix="new")
    pred2 = gen_cfeatures.Predictor(config=CFG, model_cfg=TINY, use_pallas=False)
    pred2.process_directory(str(tmp_cwd / "imgs"), datetime.date.today())

    assert artifacts.get_current_cfeature_number() == 1
    idx = SimilarityIndex.load(artifacts.cfeatures_index_name(1))
    assert len(idx) == 3 + 5  # old rows + all files re-extracted today

    # copied rows carry their ORIGINAL pre-normalization norms (not 1.0) so
    # the reranker's row-gather path reconstructs the same raw features, and
    # the freshness stamp stays at the old build's start for those rows
    idx0 = SimilarityIndex.load(artifacts.cfeatures_index_name(0))
    np.testing.assert_allclose(np.asarray(idx.norms[:3]), np.asarray(idx0.norms),
                               rtol=1e-6)
    assert float(np.min(np.asarray(idx.norms))) > 0
    assert idx.build_started() <= idx0.build_started()
    # copied rows keep the OLD build's extraction stamps; re-extracted rows
    # get the new build's (so fresh files stay eligible for the gather path)
    np.testing.assert_array_equal(np.asarray(idx.stamps[:3]),
                                  np.asarray(idx0.stamps))
    assert float(np.min(np.asarray(idx.stamps[3:]))) >= idx0.build_started()


def test_ccip_reranker_end_to_end(tmp_cwd):
    """Character-mode rerank over a real (random-weight) feature index."""
    from anime_illust_image_searcher_tpu.cli import gen_cfeatures
    from anime_illust_image_searcher_tpu.search.rerank_ccip import CCIPReranker

    paths = make_images(tmp_cwd / "imgs", 12)
    pred = gen_cfeatures.Predictor(config=CFG, model_cfg=TINY, use_pallas=False)
    pred.process_directory(str(tmp_cwd / "imgs"))

    tags_arr = [f"{p},1girl,smile,tag_{i}" for i, p in enumerate(paths)]
    file_tag_index = {p: {"1girl": True, "smile": True, f"tag_{i}": True}
                      for i, p in enumerate(paths)}
    filepath_docid = {p: i for i, p in enumerate(paths)}

    reranker = CCIPReranker(
        tags_arr, file_tag_index, filepath_docid, directory=str(tmp_cwd),
        predictor=make_predictor(),
    )
    scores = np.linspace(1.0, 0.1, 12)
    out = reranker(scores, topn=800, required_tags=[], exclude_tags=[])
    # top10 passthrough with original scores
    assert [d for d, _ in out[:10]] == list(range(10))
    assert out[0][1] == pytest.approx(1.0)
    # matches (if any) have 1-diff scores and valid doc ids
    for doc_id, score in out[10:]:
        assert 0 <= doc_id < 12
        assert score == pytest.approx(1.0 - (1.0 - score))

    # required tag filters: nothing has 'nonexistent'
    out2 = reranker(scores, topn=800, required_tags=["nonexistent"], exclude_tags=[])
    assert len(out2) == 10  # only the passthrough top10

    # exclude tag kills everything (all docs have 1girl)
    out3 = reranker(scores, topn=800, required_tags=[], exclude_tags=["1girl"])
    assert len(out3) == 10


def test_ccip_reranker_few_results_branch(tmp_cwd):
    from anime_illust_image_searcher_tpu.search.rerank_ccip import CCIPReranker

    reranker = CCIPReranker([], {}, {}, directory=str(tmp_cwd))
    scores = np.array([0.9, 0.5, 0.1])
    out = reranker(scores, topn=10, required_tags=[], exclude_tags=[])
    assert [d for d, _ in out] == [0, 1, 2]
    assert out[0][1] == pytest.approx(1.0)
