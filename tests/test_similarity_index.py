import numpy as np

from anime_illust_image_searcher_tpu.index.similarity import SimilarityIndex, unitvec


def test_cosine_scores_match_numpy(rng):
    mat = rng.randn(20, 32).astype(np.float32)
    idx = SimilarityIndex("x", num_features=32)
    idx.add_documents(list(mat))
    q = rng.randn(32).astype(np.float32)
    got = idx[q]
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    expected = normed @ (q / np.linalg.norm(q))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_sparse_tuple_input():
    idx = SimilarityIndex("x", num_features=4)
    idx.add_documents([[(0, 1.0), (2, 1.0)]])
    np.testing.assert_allclose(idx.vector_by_id(0), unitvec(np.array([1, 0, 1, 0], np.float32)))


def test_incremental_append_and_roundtrip(tmp_path, rng):
    p = str(tmp_path / "doc2vec_index")
    idx = SimilarityIndex(p, num_features=8)
    a = rng.randn(3, 8).astype(np.float32)
    b = rng.randn(2, 8).astype(np.float32)
    idx.add_documents(list(a))
    idx.add_documents(list(b))
    assert len(idx) == 5
    idx.save()
    idx2 = SimilarityIndex.load(p)
    assert len(idx2) == 5
    np.testing.assert_allclose(idx2.vector_by_id(3), unitvec(b[0]), rtol=1e-6)
    assert SimilarityIndex.exists(p)


def test_zero_vector_is_kept_zero():
    idx = SimilarityIndex("x", num_features=4)
    idx.add_documents([np.zeros(4, np.float32)])
    assert np.all(idx.vector_by_id(0) == 0)


def test_extend_from_preserves_norms_and_meta_roundtrip(tmp_path, rng):
    """extend_from copies unit rows AND their original pre-normalization
    norms verbatim — add_documents(unit rows) would re-derive 1.0 and break
    raw-feature reconstruction (row * norm) in the CCIP reranker."""
    src = SimilarityIndex("src", num_features=8)
    raw = (rng.randn(4, 8) * 25.0).astype(np.float32)
    src.add_documents(list(raw))

    dst = SimilarityIndex(str(tmp_path / "dst"), num_features=8)
    dst.extend_from(src)
    dst.add_documents([raw[0] * 2])
    assert len(dst) == 5
    np.testing.assert_allclose(np.asarray(dst.norms[:4]), np.asarray(src.norms),
                               rtol=1e-6)
    recon = np.asarray(dst.matrix[:4]) * np.asarray(dst.norms[:4])[:, None]
    np.testing.assert_allclose(recon, raw, rtol=1e-4, atol=1e-4)

    # free-form meta (the build_started stamp) survives a save/load round-trip
    dst.meta["build_started"] = 12345.5
    dst.save()
    back = SimilarityIndex.load(str(tmp_path / "dst"))
    assert back.meta["build_started"] == 12345.5
    assert back.build_started() == 12345.5
    np.testing.assert_allclose(np.asarray(back.norms[:4]), np.asarray(src.norms),
                               rtol=1e-6)

    import pytest

    with pytest.raises(ValueError):
        SimilarityIndex("y", num_features=4).extend_from(src)
