"""Result post-filters: the elbow cut and the NG-word filter.

``filter_searched_result`` reproduces webui.py:63-80 exactly: on the descending score
list, zero diffs are masked to +inf, the cut point is the *second* index where the
consecutive diff falls below 1e-6 (first if only one exists), scores are normalized by
the max, and non-positive scores are dropped.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

DIFF_FILTER_THRESH = 1e-6  # webui.py:58
NG_WORDS: Tuple[str, ...] = ("language", "english_text", "pixcel_art")  # webui.py:38


def filter_searched_result(
    sorted_scores: Sequence[Tuple[int, float]],
    thresh: float = DIFF_FILTER_THRESH,
) -> List[Tuple[int, float]]:
    scores_ndarr = np.array([s for _, s in sorted_scores], dtype=np.float64)
    if len(scores_ndarr) == 0:
        return []
    with np.errstate(invalid="ignore"):
        # -inf - -inf = nan for excluded docs; nan never compares < thresh, which is
        # exactly the reference's (implicit) behavior.
        diff_arr = scores_ndarr[:-1] - scores_ndarr[1:]
    diff_arr = np.where(diff_arr == 0, np.inf, diff_arr)
    t = len(sorted_scores)
    found_points = np.where(diff_arr < thresh)[0]
    if len(found_points) == 1:
        t = found_points[0]
    elif len(found_points) >= 2:
        t = found_points[1]
    max_val = scores_ndarr.max()
    if not np.isfinite(max_val) or max_val == 0:
        # degenerate lists (NaN from the reference's -inf-weighted PRF mean, or empty
        # positives) would otherwise poison every score — QUIRKS.md #15
        max_val = 1.0
    return [
        (sorted_scores[idx][0], float(sorted_scores[idx][1] / max_val))
        for idx in range(int(t))
        if sorted_scores[idx][1] > 0
    ]


def is_include_ng_word(tags: Sequence[str], ng_words: Sequence[str] = NG_WORDS) -> bool:
    """webui.py:175-179 — drop results whose tag list contains any NG word."""
    for ng_word in ng_words:
        if ng_word in tags:
            return True
    return False
