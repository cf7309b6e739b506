"""BM25 build + device scoring vs an independent numpy oracle of the Okapi formula
with the reference's weight/require/exclude semantics (webui.py:119-172)."""

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.index.bm25_index import (
    BM25DeviceIndex, build_bm25_stats, load_bm25_artifacts, save_bm25_artifacts,
)
from anime_illust_image_searcher_tpu.index.dictionary import TagDictionary
from anime_illust_image_searcher_tpu.ops.bm25 import (
    REQUIRE_TAG_MAGIC_NUMBER, bm25_scores_device, build_query_vectors,
)

CORPUS = [
    ["1girl", "solo", "smile", "black_hair"],
    ["1boy", "solo", "sword", "smile"],
    ["no_humans", "white_background", "simple_background"],
    ["1girl", "1boy", "smile", "holding_hands", "smile"],  # duplicate tag
    ["1girl", "black_hair", "sword"],
]

K1, B = 1.5, 0.75


def oracle_scores(stats, query_weights):
    """Line-by-line reimplementation of the reference's scoring loop semantics."""
    scores = np.zeros(stats.num_docs)
    for term_id, weight in query_weights.items():
        idf = stats.idf.get(term_id, 0)
        tfs = np.array([doc.get(term_id, 0) for doc in stats.corpus], dtype=float)
        dl = stats.doc_lengths
        denom = tfs + K1 * (1 - B + B * (dl / stats.avgdl))
        numer = tfs * (K1 + 1)
        score = idf * (numer / denom)
        if weight < 0:
            for i, doc in enumerate(stats.corpus):
                if term_id in doc:
                    scores[i] = -np.inf
        elif weight > REQUIRE_TAG_MAGIC_NUMBER:
            miss = [i for i, doc in enumerate(stats.corpus) if term_id not in doc]
            scores += (weight - REQUIRE_TAG_MAGIC_NUMBER) * score
            scores[miss] = -np.inf
        else:
            scores += weight * score
    return scores


@pytest.fixture(scope="module")
def built():
    d = TagDictionary(CORPUS)
    stats = build_bm25_stats(CORPUS, d)
    dev = BM25DeviceIndex.from_stats(stats, vocab_size=len(d))
    return d, stats, dev


def run_device(dev, query_weights):
    eff, excl, req, n_req = build_query_vectors(query_weights, dev.vocab_size)
    doc_ids, term_ids, contrib = dev.to_device()
    import jax.numpy as jnp

    out = bm25_scores_device(
        doc_ids, term_ids, contrib,
        jnp.asarray(eff), jnp.asarray(excl), jnp.asarray(req),
        jnp.asarray(n_req), num_docs=dev.num_docs,
    )
    return np.asarray(out)


def test_stats_match_formula(built):
    d, stats, _ = built
    assert stats.num_docs == 5
    assert stats.doc_lengths.tolist() == [4, 4, 3, 5, 3]
    assert stats.avgdl == pytest.approx(np.mean([4, 4, 3, 5, 3]))
    tid = d.token2id["1girl"]
    df = 3
    assert stats.idf[tid] == pytest.approx(np.log(1 + (5 - df + 0.5) / (df + 0.5)))
    # duplicate tag counted twice in doc 3
    smile = d.token2id["smile"]
    assert stats.corpus[3][smile] == 2


@pytest.mark.parametrize("query", [
    {"1girl": 1.0},
    {"1girl": 1.0, "smile": 3.0},
    {"1girl": 1.0, "sword": -1.0},                                  # exclude
    {"smile": REQUIRE_TAG_MAGIC_NUMBER + 2, "black_hair": 1.0},     # require
    {"1girl": REQUIRE_TAG_MAGIC_NUMBER + 1, "sword": -1.0, "smile": 2.0},
])
def test_device_matches_oracle(built, query):
    d, stats, dev = built
    qw = {d.token2id[t]: w for t, w in query.items()}
    expected = oracle_scores(stats, qw)
    got = run_device(dev, qw)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_artifact_roundtrip(built, tmp_cwd):
    d, stats, _ = built
    save_bm25_artifacts(stats)
    loaded = load_bm25_artifacts()
    assert loaded.num_docs == stats.num_docs
    assert loaded.corpus == stats.corpus
    assert loaded.idf == pytest.approx(stats.idf)
    np.testing.assert_array_equal(loaded.doc_lengths, stats.doc_lengths)
