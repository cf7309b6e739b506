"""Elbow filter parity with webui.py:63-80 and NG-word filter."""

import numpy as np

from anime_illust_image_searcher_tpu.search.filters import (
    filter_searched_result, is_include_ng_word,
)


def test_no_flat_region_keeps_all_positive():
    scores = [(0, 1.0), (1, 0.8), (2, 0.5), (3, 0.1)]
    out = filter_searched_result(scores)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    assert out[0][1] == 1.0  # normalized by max


def test_zero_diffs_are_ignored():
    # equal consecutive scores (diff == 0) must NOT trigger the cut
    scores = [(0, 1.0), (1, 1.0), (2, 0.5), (3, 0.4)]
    out = filter_searched_result(scores)
    assert len(out) == 4


def test_single_elbow_cuts_at_its_index():
    # one tiny-but-nonzero diff at position i → keep exactly i items (range(t));
    # an elbow at index 0 therefore keeps nothing — reference semantics.
    scores = [(0, 1.0), (1, 0.9999999995), (2, 0.5)]
    assert filter_searched_result(scores) == []
    scores = [(0, 1.0), (1, 0.8), (2, 0.7999999999), (3, 0.5)]
    out = filter_searched_result(scores)
    assert [i for i, _ in out] == [0]


def test_second_elbow_preferred():
    # two sub-threshold diffs → cut at the second one (webui.py:72-77)
    scores = [(0, 1.0), (1, 0.9999999995), (2, 0.999999999), (3, 0.5)]
    out = filter_searched_result(scores)
    assert [i for i, _ in out] == [0]


def test_nonpositive_scores_dropped():
    scores = [(0, 1.0), (1, 0.5), (2, 0.0), (3, -np.inf)]
    out = filter_searched_result(scores)
    assert [i for i, _ in out] == [0, 1]


def test_normalization_by_max():
    scores = [(0, 4.0), (1, 2.0), (2, 1.0)]
    out = filter_searched_result(scores)
    assert [s for _, s in out] == [1.0, 0.5, 0.25]


def test_ng_words():
    assert is_include_ng_word(["1girl", "english_text"])
    assert is_include_ng_word(["pixcel_art"])  # reference spelling
    assert not is_include_ng_word(["1girl", "smile"])
