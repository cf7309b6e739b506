r"""Query-parser parity tests against webui.py:82-101 and webui.py:354-371 semantics."""

import pytest

from anime_illust_image_searcher_tpu.index.dictionary import TagDictionary
from anime_illust_image_searcher_tpu.search.parser import (
    REQUIRE_TAG_MAGIC_NUMBER, parse_bm25_query, parse_doc2vec_query,
)


@pytest.fixture
def dictionary():
    return TagDictionary([
        ["1girl", "smile", "sword", "black_hair", "k-on!_(series)", "a:b"],
    ])


# ---- doc2vec side ----------------------------------------------------------

def test_plain_tags_weight_one():
    lst, total = parse_doc2vec_query("1girl smile")
    assert lst == [("1girl", 1), ("smile", 1)]
    assert total == 2


def test_weighted_tag():
    lst, total = parse_doc2vec_query("1girl:3 smile")
    assert lst == [("1girl", 3), ("smile", 1)]
    assert total == 4


def test_negative_and_plus_weights_sum_into_total():
    lst, total = parse_doc2vec_query("1girl:+2 sword:-1")
    assert lst == [("1girl", 2), ("sword", -1)]
    assert total == 1  # 2 + (-1)


def test_zero_total_weight_guard():
    lst, total = parse_doc2vec_query("1girl:1 sword:-1")
    assert total == 1  # guarded from 0 to 1


def test_paren_normalization_to_escaped_form():
    # both escaped and unescaped input normalize to the escaped form
    lst1, _ = parse_doc2vec_query(r"k-on!_\(series\)")
    lst2, _ = parse_doc2vec_query("k-on!_(series)")
    assert lst1 == lst2 == [(r"k-on!_\(series\)", 1)]


def test_colon_tag_without_weight_suffix():
    lst, _ = parse_doc2vec_query("a:b")
    assert lst == [("a:b", 1)]


def test_colon_tag_with_weight():
    lst, _ = parse_doc2vec_query("a:b:5")
    assert lst == [("a:b", 5)]


# ---- bm25 side -------------------------------------------------------------

def test_bm25_plain(dictionary):
    q = parse_bm25_query("1girl smile", dictionary)
    assert q.term_weights == {
        dictionary.token2id["1girl"]: 1,
        dictionary.token2id["smile"]: 1,
    }
    assert q.required_tags == [] and q.exclude_tags == []


def test_bm25_require(dictionary):
    q = parse_bm25_query("1girl:+2", dictionary)
    assert q.term_weights[dictionary.token2id["1girl"]] == REQUIRE_TAG_MAGIC_NUMBER + 2
    assert q.required_tags == ["1girl"]


def test_bm25_exclude(dictionary):
    q = parse_bm25_query("sword:-1", dictionary)
    assert q.term_weights[dictionary.token2id["sword"]] == -1
    assert q.exclude_tags == ["sword"]


def test_bm25_numeric_weight_lands_in_exclude_list_quirk(dictionary):
    # QUIRKS.md #11: plain numeric weights share the '-' branch and are appended to
    # exclude_tags (only the character-oriented reranker reads that list).
    q = parse_bm25_query("smile:3", dictionary)
    assert q.term_weights[dictionary.token2id["smile"]] == 3
    assert q.exclude_tags == ["smile"]


def test_bm25_unknown_tag_raises_keyerror(dictionary):
    # QUIRKS.md #7 — user-facing reference behavior.
    with pytest.raises(KeyError):
        parse_bm25_query("not_a_tag", dictionary)
