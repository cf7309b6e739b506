"""Byte-level tag-line parity over crafted prob matrices (QUIRKS.md #17/#18).

The reference assembles each ``tags-wd-tagger.txt`` line as
``",".join(general)`` + (``"," + ",".join(character)`` if any character tag),
with tags dict-deduplicated by name (tagging.py:194-227). These tests pin the
edge cases the VERDICT r2 review flagged: leading-comma lines when the general
set is empty, the all-empty line, and duplicate-name dedup semantics — each
asserted byte-for-byte against an inline oracle implementing the reference's
exact dict/sort pipeline.
"""

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor
from anime_illust_image_searcher_tpu.models.weights import LabelSet


def reference_line(names, general_idx, character_idx, preds, g_t, c_t):
    """Inline oracle: the reference's selection pipeline verbatim
    (tagging.py:184-227 semantics, dict comprehension + stable sorted)."""
    labels = list(zip(names, preds.astype(float)))
    general_names = [labels[i] for i in general_idx]
    general_res = {x[0]: x[1] for x in general_names if x[1] > g_t}
    character_names = [labels[i] for i in character_idx]
    character_res = {x[0]: x[1] for x in character_names if x[1] > c_t}
    sorted_general = sorted(general_res.items(), key=lambda x: x[1], reverse=True)
    ret = ",".join(x[0].replace(" ", "_") for x in sorted_general)
    if len(character_res) > 0:
        sorted_char = sorted(character_res.items(), key=lambda x: x[1], reverse=True)
        ret += ","
        ret += ",".join(x[0].replace(" ", "_") for x in sorted_char)
    return ret


def make_predictor(names, categories):
    pred = TaggerPredictor()
    cats = np.asarray(categories)
    pred.labels = LabelSet(
        names=list(names),
        rating_index=list(np.where(cats == 9)[0]),
        general_index=list(np.where(cats == 0)[0]),
        character_index=list(np.where(cats == 4)[0]),
    )
    pred._general_names = [names[i] for i in pred.labels.general_index]
    pred._character_names = [names[i] for i in pred.labels.character_index]
    return pred


NAMES = ["rating_safe", "long hair", "smile", "sword", "hatsune miku", "cirno"]
CATS = [9, 0, 0, 0, 4, 4]


def line_for(pred, preds, g_t, c_t):
    general = preds[np.asarray(pred.labels.general_index, dtype=np.int64)]
    character = preds[np.asarray(pred.labels.character_index, dtype=np.int64)]
    return pred._assemble_line(general, g_t, character, c_t)


@pytest.mark.parametrize(
    "preds,g_t,c_t",
    [
        # empty general, one character tag -> leading comma (",hatsune_miku")
        (np.array([0.9, 0.1, 0.2, 0.05, 0.8, 0.1], np.float32), 0.3, 0.5),
        # both populated
        (np.array([0.9, 0.7, 0.6, 0.05, 0.8, 0.9], np.float32), 0.3, 0.5),
        # all empty -> ""
        (np.array([0.9, 0.1, 0.1, 0.1, 0.1, 0.1], np.float32), 0.3, 0.5),
        # general only
        (np.array([0.9, 0.7, 0.4, 0.35, 0.1, 0.1], np.float32), 0.3, 0.5),
        # threshold is strictly exclusive (x > t, not >=)
        (np.array([0.9, 0.3, 0.5, 0.1, 0.5, 0.2], np.float32), 0.3, 0.5),
    ],
)
def test_line_matches_reference_oracle(preds, g_t, c_t):
    pred = make_predictor(NAMES, CATS)
    got = line_for(pred, preds, g_t, c_t)
    want = reference_line(NAMES, pred.labels.general_index,
                          pred.labels.character_index, preds, g_t, c_t)
    assert got == want


def test_empty_general_has_leading_comma_and_full_file_line():
    pred = make_predictor(NAMES, CATS)
    preds = np.array([0.9, 0.1, 0.2, 0.05, 0.8, 0.1], np.float32)
    line = line_for(pred, preds, 0.3, 0.5)
    assert line == ",hatsune_miku"
    # the CLI writes path + "," + line — the on-disk bytes carry the empty token
    assert ("/img/x.png," + line) == "/img/x.png,,hatsune_miku"
    # and genmodel's reader keeps '' as a tag, so the doc still has >= 3 tokens
    # with only two real tags (reference genmodel.py:29-36 behavior)
    row = ("/img/x.png," + line + ",cirno").split(",")[1:]
    assert row == ["", "hatsune_miku", "cirno"] and len(row) >= 3


def test_all_empty_line_is_empty_string():
    pred = make_predictor(NAMES, CATS)
    preds = np.zeros(6, np.float32)
    assert line_for(pred, preds, 0.3, 0.5) == ""


def test_duplicate_name_dedup_last_prob_first_position():
    # duplicate general name "smile" at two label rows: dict keeps the LAST
    # occurrence's prob (0.9 not 0.4) under the FIRST occurrence's insertion
    # position; sort is by that surviving prob
    names = ["smile", "long hair", "smile", "sword"]
    cats = [0, 0, 0, 0]
    pred = make_predictor(names, cats)
    preds = np.array([0.4, 0.6, 0.9, 0.5], np.float32)
    got = line_for(pred, preds, 0.3, 0.5)
    want = reference_line(names, pred.labels.general_index,
                          pred.labels.character_index, preds, 0.3, 0.5)
    assert got == want == "smile,long_hair,sword"


def test_duplicate_dedup_tie_keeps_insertion_order():
    # equal probs: Python's stable sort keeps dict insertion order (first
    # occurrence position), even though the value came from the last occurrence
    names = ["b tag", "a tag", "b tag"]
    cats = [0, 0, 0]
    pred = make_predictor(names, cats)
    preds = np.array([0.7, 0.7, 0.7], np.float32)
    got = line_for(pred, preds, 0.3, 0.5)
    want = reference_line(names, pred.labels.general_index,
                          pred.labels.character_index, preds, 0.3, 0.5)
    assert got == want == "b_tag,a_tag"
