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
