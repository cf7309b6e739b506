"""Adversarial boundary tests for the capped-candidate character rerank.

The capped path's correctness argument (models/ccip.py::rerank_matches_from_rows,
search/rerank_ccip.py) rests on three claims that generic randomized data rarely
exercises:

  1. the device count compares against the f64 threshold rounded UP one f32 ulp
     (``CCIPReranker._thresh_up``), so it over-approximates the host's f64
     compare — ``count <= cap`` must PROVE every true match is among the
     returned candidates even when diffs sit exactly AT the threshold;
  2. when the true match count exceeds the cap, the device count must say so
     (the caller falls back to full diffs) — including when a TIE GROUP of
     identical diffs straddles the cap boundary;
  3. candidates arrive in (diff asc, index asc) order — exactly the order the
     host filter produces from full diffs — with bit-identical f32 diff values.

This file crafts an index whose diffs are controlled to the ulp (top-k rows are
e1, so the mean query vector is e1 and diff_i = 1 - row_i[0] in f32) and drives
both device programs plus the reranker's host filters through the boundaries.

Reference behavior under test: webui.py:306-335 (threshold compare + tag
filters + sort by 1-diff) — the capped path must be observationally identical.
"""

import os

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.config import CCIPConfig
from anime_illust_image_searcher_tpu.index.similarity import SimilarityIndex
from anime_illust_image_searcher_tpu.models.caformer import tiny_test_config
from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor
from anime_illust_image_searcher_tpu.search.rerank_ccip import CCIPReranker

TINY = tiny_test_config()
CFG = CCIPConfig(image_size=TINY.img_size, feature_dim=TINY.feature_dim,
                 batch_size=4, decode_workers=2)

K = 10          # top-k rows
N_TIE = 40      # size of the crafted tie group
CAP = 32        # test cap (tie group deliberately larger)


def _craft_index(tmp_path) -> SimilarityIndex:
    """Rows whose diffs vs the top-k mean (= e1) are exact f32 values:
    row_i = [c_i, sqrt(1 - c_i^2), 0, ...] -> diff_i = f32(1) - c_i.

    Layout (row: diff):
      0..9    top-k rows = e1 (diff 0)
      10..49  tie group: all diff == TIE_DIFF           (40 rows)
      50..149 ascending distinct diffs near 0.4         (100 rows)
      150..   far non-matches at diff ~0.9
    """
    F = TINY.feature_dim
    n = 300
    m = np.zeros((n, F), np.float32)
    m[:K, 0] = 1.0
    c_tie = np.float32(0.8)
    m[K : K + N_TIE, 0] = c_tie
    m[K : K + N_TIE, 1] = np.sqrt(np.float32(1.0) - c_tie * c_tie)
    ramp = (np.float32(0.6) - np.arange(100, dtype=np.float32) * np.float32(1e-4))
    m[K + N_TIE : K + N_TIE + 100, 0] = ramp
    m[K + N_TIE : K + N_TIE + 100, 1] = np.sqrt(1.0 - ramp.astype(np.float64) ** 2).astype(np.float32)
    m[K + N_TIE + 100 :, 0] = np.float32(0.1)
    m[K + N_TIE + 100 :, 1] = np.sqrt(np.float32(1.0) - np.float32(0.01))

    si = SimilarityIndex(str(tmp_path / "crafted-idx"), num_features=F)
    si._matrix = m
    si._norms = np.ones(n, np.float32)
    si._stamps = np.full(n, 4e9, np.float64)
    si._n = n
    si.meta["build_started"] = 4e9
    return si


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("capped_boundaries")
    si = _craft_index(tmp)
    pred = CCIPPredictor(config=CFG, model_cfg=TINY, use_pallas=False)
    paths = [f"/crafted/{i:03d}.png" for i in range(len(si))]
    # every third matching row is missing from the tag dict (filter must drop it)
    tag_dict = {p: {"a": True, "b": True} for i, p in enumerate(paths)
                if i % 3 != 2}
    docid = {p: i for i, p in enumerate(paths)}
    rr = CCIPReranker(
        image_files_name_tags_arr=[f"{p},a,b" for p in paths],
        file_tag_index_dict=tag_dict,
        filepath_docid_dict=docid,
        directory=str(tmp),
        predictor=pred,
    )
    rr.cfeature_filepath_idx = paths
    rr.cfeatures_idx = si

    ids = np.arange(K, dtype=np.int32)
    full = np.asarray(pred.rerank_diffs_from_rows(ids, K, si))
    return si, pred, rr, ids, full


def _host_matches(rr, full, thresh, req=(), exc=()):
    return rr._matches_from_diffs(full, thresh, list(req), list(exc))


def _capped_matches(pred, rr, si, ids, thresh, cap, req=(), exc=()):
    res = pred.rerank_matches_from_rows(
        ids, K, si, CCIPReranker._thresh_up(thresh), cap)
    assert res is not None
    count, cand_idx, cand_diffs = res
    return count, rr._matches_from_candidates(
        cand_idx, cand_diffs, thresh, list(req), list(exc))


def test_crafted_diffs_are_controlled(setup):
    si, pred, rr, ids, full = setup
    assert full.dtype == np.float32
    # top-k rows: diff 0; tie group: one exact f32 value, 40 times
    assert np.all(full[:K] == 0.0)
    tie = full[K : K + N_TIE]
    assert len(np.unique(tie)) == 1
    # ramp strictly ascending (crafted with 1e-4 spacing, far above f32 ulp)
    ramp = full[K + N_TIE : K + N_TIE + 100]
    assert np.all(np.diff(ramp) > 0)


def test_count_exactly_at_cap_uses_candidates(setup):
    """Host count == cap (boundary): candidates path must produce the exact
    full-path list. cap=64 places the boundary inside the distinct-diff ramp
    (positions 50..149 of the sorted order), and the threshold sits mid-gap
    (~5e-5 from either neighbor, far above f32 ulp), so the device
    over-approximation cannot change the count."""
    si, pred, rr, ids, full = setup
    cap = 64
    sorted_d = np.sort(full.astype(np.float64))
    t = (sorted_d[cap - 1] + sorted_d[cap]) / 2.0  # host count == cap
    assert int(np.sum(full.astype(np.float64) < t)) == cap
    count, got = _capped_matches(pred, rr, si, ids, t, cap)
    assert count <= cap
    assert got == _host_matches(rr, full, t)


def test_count_one_over_cap_reports_overflow(setup):
    si, pred, rr, ids, full = setup
    cap = 64
    sorted_d = np.sort(full.astype(np.float64))
    t = (sorted_d[cap] + sorted_d[cap + 1]) / 2.0  # host count == cap + 1
    assert int(np.sum(full.astype(np.float64) < t)) == cap + 1
    res = pred.rerank_matches_from_rows(
        ids, K, si, CCIPReranker._thresh_up(t), cap)
    count = res[0]
    assert count > cap  # caller must fall back to full diffs


def test_threshold_exactly_at_a_diff_value(setup):
    """threshold == float(diff_f32) of the tie group: host strict < excludes
    all 40 tie rows; the device count INCLUDES them (thresh_up rounds up), but
    as long as count <= cap the host filter breaks at them and the final list
    is identical to the full path."""
    si, pred, rr, ids, full = setup
    tie_val = float(full[K])          # f64 of the tie group's exact f32 diff
    cap = 128                          # room for K zeros + 40 ties + slack
    count, got = _capped_matches(pred, rr, si, ids, tie_val, cap)
    # device count over-approximates: it must see at least the K+N_TIE rows
    assert count >= K + N_TIE
    assert count <= cap
    want = _host_matches(rr, full, tie_val)
    assert got == want
    # and the host list really excluded the tie rows (strict <): every match's
    # diff (= 1 - score) is strictly below the tie value
    assert want and all(1.0 - s < tie_val for _, s in want)
    assert not any(K <= d < K + N_TIE for d, _ in want)


def test_threshold_one_f64_ulp_above_a_diff_value(setup):
    """threshold = nextafter(diff, inf) in f64: host INCLUDES the tie rows by
    one f64 ulp. thresh_up (next f32 above) must make the device include them
    too — an under-approximating device count here would wrongly certify
    candidates that miss 40 true matches."""
    si, pred, rr, ids, full = setup
    t = np.nextafter(float(full[K]), np.inf)
    cap = 128
    count, got = _capped_matches(pred, rr, si, ids, t, cap)
    want = _host_matches(rr, full, t)
    assert count >= K + N_TIE
    assert got == want
    got_ids = {d for d, _ in got}
    assert all(d in got_ids for d in range(K, K + N_TIE)
               if (K <= d < K + N_TIE) and d % 3 != 2)


def test_tie_group_straddling_cap_overflows(setup):
    """Tie group (40 equal diffs) with cap=32 and a threshold above the tie
    value: true matches (K + 40) exceed the cap, so the device must report
    overflow rather than return an arbitrary 32-subset of the ties."""
    si, pred, rr, ids, full = setup
    t = float(full[K]) + 1e-4          # above ties, below the ramp
    res = pred.rerank_matches_from_rows(
        ids, K, si, CCIPReranker._thresh_up(t), CAP)
    assert res[0] > CAP


def test_candidate_order_and_values_match_full_path(setup):
    """(diff asc, index asc) candidate order with bit-identical f32 values —
    including inside the tie group (order there is purely index asc)."""
    si, pred, rr, ids, full = setup
    cap = 128
    t = float(full[K]) + 1e-4
    res = pred.rerank_matches_from_rows(
        ids, K, si, CCIPReranker._thresh_up(t), cap)
    count, cand_idx, cand_diffs = res
    assert count <= cap
    # expected order: stable sort of (diff, index)
    order = np.lexsort((np.arange(len(full)), full))[:cap]
    np.testing.assert_array_equal(cand_idx, order)
    np.testing.assert_array_equal(cand_diffs, full[order])


def test_tag_filters_apply_identically_on_candidates(setup):
    """required/excluded tag filters and missing-from-tag-dict drops must act
    identically on the candidate list and the full-diffs list."""
    si, pred, rr, ids, full = setup
    t = float(full[K]) + 1e-4
    cap = 128
    for req, exc in [(["a"], []), ([], ["b"]), (["a"], ["zzz"]), (["missing"], [])]:
        count, got = _capped_matches(pred, rr, si, ids, t, cap, req, exc)
        assert count <= cap
        assert got == _host_matches(rr, full, t, req, exc)


def test_batched_capped_matches_single(setup):
    """The batched candidate op must agree with per-query calls element-wise
    on the same crafted boundary data (shared threshold, different row sets
    and valid counts)."""
    si, pred, rr, ids, full = setup
    t = float(full[K]) + 1e-4
    tup = CCIPReranker._thresh_up(t)
    cap = 128
    rows_b = np.stack([ids, np.flip(ids)]).astype(np.int32)
    nvalid = np.asarray([K, K - 3])
    counts, idxs, diffs = pred.rerank_matches_from_rows_batch(
        rows_b, nvalid, si, tup, cap)
    for j in range(2):
        c1, i1, d1 = pred.rerank_matches_from_rows(
            rows_b[j], int(nvalid[j]), si, tup, cap)
        assert counts[j] == c1
        np.testing.assert_array_equal(idxs[j], i1)
        np.testing.assert_array_equal(diffs[j], d1)
