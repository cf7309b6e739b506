"""Bug-compat PRF mode (AIIS_REFERENCE_PRF / SearchConfig.reference_prf).

The default engine implements the PRF rerank's *intended* math (QUIRKS #5).
The compat mode reproduces the reference AS BUILT — webui.py:189-253 including
the tuple-array bug (webui.py:198-211): (index, value) pairs, Frobenius
normalization over BOTH columns, round() collapsing every feature id to 0, and
gensim's sparse-query chain (unitvec over all pairs, then dict-collapse where
the LAST duplicate wins). The oracle below is a verbatim numpy transliteration
of that path, gensim emulation included, and the engine must match it —
closing BASELINE.md's "identical ranking order" for as-built normal mode
(VERDICT r3 #2).
"""

import dataclasses
import math

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.config import DEFAULT_CONFIG
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.search.engine import SearchEngine

from test_engine_pipeline_oracle import (
    POOL, oracle_bm25_scores, oracle_bm25_stats, oracle_doc2vec_vector,
    oracle_elbow, oracle_parse, random_queries, unitvec,
)

REFERENCE_PRF_CONFIG = dataclasses.replace(
    DEFAULT_CONFIG,
    search=dataclasses.replace(DEFAULT_CONFIG.search, reference_prf=True),
)


# ------------------------------------------------------------------- oracle


def oracle_gensim_sparse_scores(matrix_f32, pairs, num_features):
    """gensim SimilarityABC.__getitem__ -> unitvec (sparse branch) ->
    sparse2full (dict: duplicate ids keep the LAST value) -> dense f32 matvec."""
    length = 1.0 * math.sqrt(sum(val ** 2 for _, val in pairs))
    assert length > 0.0, "sparse documents must not contain any explicit zero entries"
    normalized = [(tid, val / length) for tid, val in pairs]
    collapsed = dict(normalized)
    dense = np.zeros(num_features, dtype=np.float32)
    dense[list(collapsed)] = list(collapsed.values())
    return matrix_f32 @ dense


def oracle_reference_prf_rerank(engine, matrix_f32, final_scores, topn):
    """webui.py:189-253 verbatim, bug included."""
    sims = sorted(enumerate(final_scores), key=lambda item: -item[1])
    if len(sims) <= 10:
        out = oracle_elbow(sims)
        return out[: min(topn, len(out))]

    top10_sims = sims[:10]
    top10_doc_ids = [doc_id for doc_id, _ in top10_sims]
    top10_set = set(top10_doc_ids)
    docs = [engine.image_files_name_tags_arr[d].split(",")[1:]
            for d in top10_doc_ids]
    inferred = engine.model.infer_vectors(docs)
    # the reference's List[List[Tuple[int, float]]] — np.average sees (10, D, 2)
    top10_doc_vectors = [
        [(ii, float(val)) for ii, val in enumerate(vec)] for vec in inferred
    ]
    weighted_mean_vec = np.average(
        top10_doc_vectors, axis=0, weights=[score for _, score in top10_sims])
    weighted_mean_vec = weighted_mean_vec / np.linalg.norm(weighted_mean_vec)
    pairs = [(round(docid), val) for docid, val in weighted_mean_vec.tolist()]
    reranked = oracle_gensim_sparse_scores(matrix_f32, pairs,
                                           matrix_f32.shape[1])
    rf = 0.7 * final_scores + 0.3 * reranked
    if rf.max() > 0:
        rf = rf / rf.max()
    tail = [(d, float(rf[d])) for d in range(len(rf)) if d not in top10_set]

    def sorting_key(item):
        doc_id, score = item
        if doc_id in top10_set:
            return (-2, top10_doc_ids.index(doc_id))
        return (-1, -score)

    full = sorted([(d, 1.0) for d in top10_doc_ids] + tail, key=sorting_key)
    out = oracle_elbow(full)
    return out[: min(topn, len(out))]


def oracle_fused_scores(engine, matrix_f64, bm25_pack, query):
    """webui.py:345-383 fusion (shared with the pipeline oracle)."""
    corpus, dl, avgdl, idf, D = bm25_pack
    vec = oracle_doc2vec_vector(engine, query)
    sims = matrix_f64 @ unitvec(vec.astype(np.float64))
    tw = oracle_parse(query, engine.dictionary.token2id)
    bm25 = oracle_bm25_scores(tw, corpus, dl, avgdl, idf, D)
    if sims.max() > 0:
        sims = sims / sims.max()
    if bm25.max() > 0:
        bm25 = bm25 / bm25.max()
    return 0.5 * bm25 + 0.5 * sims


# ------------------------------------------------------------------ fixture


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("reference_prf")
    import os

    rng = np.random.RandomState(13)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        lines = []
        for i in range(80):
            k = rng.randint(3, 8)
            tags = list(rng.choice(POOL, size=k, replace=False))
            lines.append(f"/img/{i:03d}.png,{','.join(tags)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "15"])
        engine = SearchEngine(str(tmp), config=REFERENCE_PRF_CONFIG)
    finally:
        os.chdir(cwd)
    docs = [l.split(",")[1:] for l in lines]
    matrix = np.asarray(engine.index.matrix[: len(docs)], dtype=np.float32)
    bm25_pack = oracle_bm25_stats(docs, engine.dictionary.token2id)
    return engine, matrix, bm25_pack


def test_flag_disables_fused_path(setup):
    engine, _, _ = setup
    assert engine._reference_prf
    assert not engine.fused_path_available("tag00 tag01")


def test_rerank_bitmatches_verbatim_oracle_on_shared_scores(setup):
    """Same final_scores array into both implementations: doc ids must match
    exactly, scores to f32 matvec tolerance."""
    engine, matrix, _ = setup
    rng = np.random.RandomState(3)
    for trial in range(20):
        final = rng.rand(len(matrix)).astype(np.float64)
        if trial % 4 == 0:
            # heavy ties: the stable sort + elbow zero-diff masking both engage
            final = np.round(final, 1)
        want = oracle_reference_prf_rerank(engine, matrix, final, topn=800)
        got = engine.doc2vec_rerank(final, topn=800)
        assert [d for d, _ in got] == [d for d, _ in want], trial
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], atol=1e-6)


def test_end_to_end_matches_reference_as_built(setup):
    """Full find_similar_documents under the flag vs the complete as-built
    oracle (fusion + buggy rerank), randomized queries."""
    engine, matrix, bm25_pack = setup
    matrix_f64 = matrix.astype(np.float64)
    rng = np.random.RandomState(7)
    for query in random_queries(rng, 20):
        final = oracle_fused_scores(engine, matrix_f64, bm25_pack, query)
        want = oracle_reference_prf_rerank(engine, matrix, final, topn=800)
        got = engine.find_similar_documents(query, topn=800)
        want_ids = [d for d, _ in want]
        got_ids = [d for d, _ in got]
        assert got_ids[:10] == want_ids[:10], query
        assert len(got) == len(want), (query, len(got), len(want))
        # tail may swap only at f32-vs-f64 near-ties
        assert len(set(got_ids) & set(want_ids)) >= len(want) - 1, query
        want_map = dict(want)
        for d, s in got:
            if d in want_map:
                assert abs(s - want_map[d]) < 5e-4, (query, d)


@pytest.mark.filterwarnings("ignore::RuntimeWarning")  # faithful NaN arithmetic
def test_compat_mode_crashes_where_the_reference_crashes(setup):
    """As-built failure parity: zero-sum top-10 weights hit np.average's
    ZeroDivisionError; -inf scores reaching the top-10 turn the mean NaN and
    round(nan) raises ValueError (the fixed path handles both — QUIRKS #15)."""
    engine, matrix, _ = setup
    with pytest.raises(ZeroDivisionError):
        engine.doc2vec_rerank(np.zeros(len(matrix)), topn=800)
    final = np.full(len(matrix), -np.inf)
    final[:5] = 1.0
    with pytest.raises(ValueError):
        engine.doc2vec_rerank(final, topn=800)


def test_compat_tail_is_feature0_perturbation(setup):
    """The net effect of the bug: the rescan equals unit_rows[:, 0] scaled by
    mean[-1]/||mean|| — assert the engine's tail ordering matches that closed
    form (independent derivation, not the transliteration)."""
    engine, matrix, _ = setup
    rng = np.random.RandomState(9)
    final = rng.rand(len(matrix)).astype(np.float64)
    sims = sorted(enumerate(final), key=lambda it: -it[1])
    top10 = sims[:10]
    ids = [d for d, _ in top10]
    vecs = engine.model.infer_vectors(
        [engine.image_files_name_tags_arr[d].split(",")[1:] for d in ids])
    w = np.array([s for _, s in top10])
    mean = (w[:, None] * vecs).sum(0) / w.sum()
    # the Frobenius norm (index column included) cancels against gensim's
    # sparse unitvec; the surviving scale is mean[-1] / ||mean|| (values only)
    scale = np.float32(mean[-1] / np.linalg.norm(mean))
    rer = matrix[:, 0] * scale
    rf = 0.7 * final + 0.3 * rer
    if rf.max() > 0:
        rf = rf / rf.max()
    got = engine.doc2vec_rerank(final, topn=800)
    tail_got = [d for d, _ in got[10:]]
    order = [int(d) for d in np.argsort(-rf, kind="stable")
             if int(d) not in set(ids)]
    # elbow may cut the tail; the kept prefix must agree
    assert tail_got == order[: len(tail_got)]
