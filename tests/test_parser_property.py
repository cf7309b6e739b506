"""Randomized property tests of the query parsers against an inline reference
oracle (SURVEY.md §4 test plan: "property tests of the query parser").

The oracle functions below transliterate the reference's two parse passes
(webui.py:82-101 and webui.py:354-371) independently of the package code; 500
randomized queries over tags with parens/escapes/embedded colons and +N/-N/N
weight suffixes must parse identically through both — including the KeyError on
unknown tags and the numeric-weight-goes-to-exclude quirk (QUIRKS #7/#11).
"""

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.index.dictionary import TagDictionary
from anime_illust_image_searcher_tpu.search.parser import (
    REQUIRE_TAG_MAGIC_NUMBER, parse_bm25_query, parse_doc2vec_query,
)

# -------------------------------------------------------------------- oracles


def oracle_doc2vec(new_doc):
    """webui.py:82-101, verbatim semantics."""
    tags = new_doc.split(" ")
    out = []
    all_weight = 0
    for tag in tags:
        sp = tag.split(":")
        if len(sp) >= 2 and (sp[-1].startswith("+") or sp[-1].startswith("-")
                             or sp[-1].isdigit()):
            el = ":".join(sp[0:len(sp) - 1]).replace("\\(", "(").replace("\\)", ")")
            out.append((el.replace("(", "\\(").replace(")", "\\)"), int(sp[-1])))
            all_weight += int(sp[-1])
        else:
            el = ":".join(sp[0:len(sp)]).replace("\\(", "(").replace("\\)", ")")
            out.append((el.replace("(", "\\(").replace(")", "\\)"), 1))
            all_weight += 1
    if all_weight == 0:
        all_weight = 1
    return out, all_weight


def oracle_bm25(new_doc, token2id):
    """webui.py:354-371, verbatim semantics (incl. KeyError on unknown tags)."""
    tw = {}
    required, exclude = [], []
    for term in new_doc.split(" "):
        sp = term.split(":")
        if len(sp) >= 2 and (sp[-1].startswith("+") or sp[-1].startswith("-")
                             or sp[-1].isdigit()):
            if sp[-1].startswith("+"):
                tag = ":".join(sp[0:len(sp) - 1])
                tw[token2id[tag]] = REQUIRE_TAG_MAGIC_NUMBER + int(sp[-1])
                required.append(tag)
            else:
                tag = ":".join(sp[0:len(sp) - 1])
                tw[token2id[tag]] = int(sp[-1])
                exclude.append(tag)
        else:
            tw[token2id[":".join(sp[0:len(sp)])]] = 1
    return tw, required, exclude


# ----------------------------------------------------------------- generators

BASE_TAGS = [
    "1girl", "solo", "smile", "hatsune_miku", "k-on!", "m:m_colon_tag",
    "ranma_1/2", "xx:yy:zz", "tag_\\(cosplay\\)", "spy_\\(two\\)_x",
    "plain(paren)", "45", "+plus_start",
]


def random_query(rng):
    n = rng.randint(1, 6)
    parts = []
    for _ in range(n):
        tag = BASE_TAGS[rng.randint(len(BASE_TAGS))]
        r = rng.rand()
        if r < 0.25:
            parts.append(f"{tag}:{rng.randint(1, 9)}")
        elif r < 0.45:
            parts.append(f"{tag}:+{rng.randint(1, 4)}")
        elif r < 0.6:
            parts.append(f"{tag}:-{rng.randint(1, 4)}")
        else:
            parts.append(tag)
    return " ".join(parts)


@pytest.fixture(scope="module")
def dictionary():
    # every raw-text form a generated query can look up must be a token
    docs = [[t] for t in BASE_TAGS] + [[t] for t in BASE_TAGS]
    return TagDictionary(docs)


def test_doc2vec_parser_matches_oracle_randomized():
    rng = np.random.RandomState(0)
    for _ in range(500):
        q = random_query(rng)
        assert parse_doc2vec_query(q) == oracle_doc2vec(q), q


def test_bm25_parser_matches_oracle_randomized(dictionary):
    rng = np.random.RandomState(1)
    for _ in range(500):
        q = random_query(rng)
        got = parse_bm25_query(q, dictionary)
        want_tw, want_req, want_exc = oracle_bm25(q, dictionary.token2id)
        assert got.term_weights == want_tw, q
        assert got.required_tags == want_req, q
        assert got.exclude_tags == want_exc, q


def test_bm25_unknown_tag_raises_like_reference(dictionary):
    rng = np.random.RandomState(2)
    for _ in range(50):
        q = random_query(rng) + " definitely_not_a_tag"
        with pytest.raises(KeyError):
            parse_bm25_query(q, dictionary)
        with pytest.raises(KeyError):
            oracle_bm25(q, dictionary.token2id)


def test_edge_queries_match():
    """Hand-picked edges: empty-string tokens, bare weights, double spaces,
    escaped parens carrying weights, all-negative totals."""
    cases = [
        "1girl  smile",          # double space -> empty token
        ":3",                    # weight with empty tag
        "tag_\\(cosplay\\):2",
        "smile:-1 solo:-1",      # all_weight < 0 stays (no zero guard)
        "smile:-1 solo:1",       # all_weight == 0 -> guarded to 1
        "45",                    # tag that IS a number (no colon -> plain tag)
        "xx:yy:zz:3",            # multi-colon tag with weight
        "+plus_start",           # leading + without colon is a plain tag
    ]
    for q in cases:
        assert parse_doc2vec_query(q) == oracle_doc2vec(q), q
