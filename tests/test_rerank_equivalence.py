"""PRF result assembly must reproduce the reference's full-list semantics exactly
(webui.py:189-253 with the intended PRF math), including elbow cuts whose position
depends on scores far beyond topn."""

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.search.engine import assemble_prf_results
from anime_illust_image_searcher_tpu.search.filters import filter_searched_result


def naive_reference(top10_ids, reranked_final, topn):
    """Line-by-line naive form of webui.py:214-246."""
    top10_set = set(top10_ids)
    rest = [it for it in enumerate(reranked_final) if it[0] not in top10_set]
    final = [(d, 1.0) for d in top10_ids] + rest

    def key(it):
        d, s = it
        if d in top10_set:
            return (-2, top10_ids.index(d))
        return (-1, -s)

    final = sorted(final, key=key)
    final = filter_searched_result(final)
    return final[: min(topn, len(final))]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,topn", [(200, 50), (2000, 800), (40, 800)])
def test_assembly_matches_naive(seed, n, topn):
    rng = np.random.RandomState(seed)
    rf = rng.rand(n)
    top10 = list(rng.choice(n, size=10, replace=False))
    a = naive_reference(top10, rf, topn)
    b = assemble_prf_results(top10, rf, topn)
    assert a == b


def controlled_scores(n, elbows):
    """Descending scores with uniform 1e-3 spacing except 5e-7 gaps at ``elbows``."""
    gaps = np.full(n - 1, 1e-3)
    for e in elbows:
        gaps[e] = 5e-7
    return np.concatenate([[0.9], 0.9 - np.cumsum(gaps)])


def test_elbow_beyond_topn_matters():
    """One sub-threshold diff before topn and one far beyond: the reference cuts at
    the SECOND (deep) point, so all topn results must be returned — a pre-truncated
    implementation would wrongly cut at the first point."""
    n, topn = 2000, 100
    rf = controlled_scores(n, elbows=[30, 1500])
    top10 = list(range(10))
    a = naive_reference(top10, rf, topn)
    b = assemble_prf_results(top10, rf, topn)
    assert a == b
    assert len(b) == topn  # NOT cut at the first elbow


def test_single_elbow_cuts_short():
    n, topn = 500, 100
    rf = controlled_scores(n, elbows=[40])  # only sub-threshold diff in the list
    top10 = list(range(10))
    a = naive_reference(top10, rf, topn)
    b = assemble_prf_results(top10, rf, topn)
    assert a == b
    assert len(b) < topn


@pytest.mark.parametrize("elbows,expect", [
    ([], None),           # no cut -> full length
    ([40], 40 + 10),      # single cut at its index (list offset by 10 pinned scores)
    ([30, 200], 200 + 10),  # second point preferred
])
def test_device_elbow_cut_matches_host(elbows, expect):
    """ops.fused_query.elbow_cut_index == the host filter's cut position."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.ops.fused_query import elbow_cut_index

    rest = controlled_scores(400, elbows=elbows)
    full = np.concatenate([np.ones(10), rest]).astype(np.float32)
    cut = int(np.asarray(elbow_cut_index(jnp.asarray(full))))
    assert cut == (expect if expect is not None else len(full))
    # cross-check against the host elbow semantics
    host = filter_searched_result(list(enumerate(full.astype(np.float64))))
    assert len(host) == min(cut, len(full))  # all scores positive here


def test_with_neg_inf_exclusions():
    rng = np.random.RandomState(5)
    rf = rng.rand(300)
    rf[::7] = -np.inf
    top10 = list(np.argsort(-rf)[:10])
    a = naive_reference(top10, rf, 100)
    b = assemble_prf_results(top10, rf, 100)
    assert a == b
