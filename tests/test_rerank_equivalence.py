"""The device-top-k rerank path must produce exactly what the naive full-sort
implementation of webui.py:189-253 semantics (with the intended PRF math) produces."""

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.search.filters import filter_searched_result


def naive_rerank(final_scores, reranked_scores, topn, k=10,
                 w_orig=0.7, w_rerank=0.3):
    sims = sorted(enumerate(final_scores), key=lambda it: -it[1])
    top10 = sims[:k]
    top10_ids = [d for d, _ in top10]
    top10_set = set(top10_ids)
    rf = w_orig * np.asarray(final_scores) + w_rerank * np.asarray(reranked_scores)
    if rf.max() > 0:
        rf = rf / rf.max()
    rest = [it for it in enumerate(rf) if it[0] not in top10_set]
    final = [(d, 1.0) for d in top10_ids] + rest

    def key(it):
        d, s = it
        if d in top10_set:
            return (-2, top10_ids.index(d))
        return (-1, -s)

    final = sorted(final, key=key)
    final = filter_searched_result(final)
    return final[: min(topn, len(final))]


def fast_rerank(final_scores, reranked_scores, topn, k=10,
                w_orig=0.7, w_rerank=0.3):
    """Mirror of SearchEngine.doc2vec_rerank's candidate selection (device top-k)."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.ops.cosine import top_k_scores

    n = len(final_scores)
    tv, ti = top_k_scores(jnp.asarray(np.asarray(final_scores, np.float32)), k)
    top10_ids = [int(i) for i in np.asarray(ti)]
    top10_set = set(top10_ids)
    rf = w_orig * np.asarray(final_scores) + w_rerank * np.asarray(reranked_scores)
    m = float(rf.max())
    if m > 0:
        rf = rf / m
    kk = min(topn + k, n)
    rv, ri = top_k_scores(jnp.asarray(rf.astype(np.float32)), kk)
    out = [(d, 1.0) for d in top10_ids]
    for d, s in zip(np.asarray(ri), np.asarray(rv)):
        if int(d) not in top10_set:
            out.append((int(d), float(s)))
    out = filter_searched_result(out)
    return out[: min(topn, len(out))]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,topn", [(200, 50), (1000, 800), (40, 800)])
def test_fast_matches_naive(seed, n, topn):
    rng = np.random.RandomState(seed)
    final = rng.rand(n).astype(np.float32)
    rerank = rng.rand(n).astype(np.float32)
    a = naive_rerank(final, rerank, topn)
    b = fast_rerank(final, rerank, topn)
    assert [d for d, _ in a] == [d for d, _ in b]
    np.testing.assert_allclose([s for _, s in a], [s for _, s in b], rtol=1e-5)


def test_with_neg_inf_exclusions():
    rng = np.random.RandomState(3)
    final = rng.rand(300).astype(np.float64)
    final[::7] = -np.inf  # excluded docs
    rerank = rng.rand(300)
    a = naive_rerank(final, rerank, 100)
    b = fast_rerank(final, rerank, 100)
    assert [d for d, _ in a] == [d for d, _ in b]
