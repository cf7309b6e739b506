"""Gensim-artifact importer (tools/import_gensim_artifacts.py, VERDICT r1 #6).

gensim is not installed here, so the gensim unpickling layer is exercised on a
networked machine; these tests cover everything below it: the pure converters
(dictionary mapping, PV-DBOW state transfer, Similarity densification), the
no-gensim fallback paths of ``run()``, and an end-to-end query over a fully
imported artifact directory."""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
import import_gensim_artifacts as imp  # noqa: E402

from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.index.bm25_index import (
    build_bm25_stats, save_bm25_artifacts,
)
from anime_illust_image_searcher_tpu.index.dictionary import TagDictionary
from anime_illust_image_searcher_tpu.index.similarity import SimilarityIndex


DOCS = [
    ["1girl", "solo", "smile"],
    ["1boy", "sword", "armor", "solo"],
    ["1girl", "dress", "smile", "long_hair"],
    ["no_humans", "bottle", "still_life"],
]


def make_reference_dir(tmp_path):
    """A source dir shaped like the reference's output: tag file, idx csv, and
    the five BM25 pickles in the reference's exact plain-pickle formats
    (genmodel.py:84-97)."""
    src = tmp_path / "ref"
    src.mkdir()
    lines = [f"/img/{i}.png,{','.join(d)}" for i, d in enumerate(DOCS)]
    (src / artifacts.TAGS_FILE).write_text("\n".join(lines) + "\n")
    (src / artifacts.DOC2VEC_IDX_CSV).write_text("\n".join(lines) + "\n")
    dictionary = TagDictionary(DOCS)
    stats = build_bm25_stats(DOCS, dictionary)
    save_bm25_artifacts(stats, str(src))
    return src, dictionary


def test_dictionary_from_mapping_preserves_ids():
    token2id = {"zzz": 0, "aaa": 1, "mmm": 2}
    d = imp.dictionary_from_mapping(token2id, {0: 3, 1: 1}, num_docs=5)
    assert d.token2id == token2id
    assert d.id2token == ["zzz", "aaa", "mmm"]
    assert d.dfs == {0: 3, 1: 1} and d.num_docs == 5
    assert d.doc2bow(["aaa", "zzz", "aaa"]) == [(0, 1), (1, 2)]


def test_doc2vec_from_arrays_infers_and_saves(tmp_path):
    rng = np.random.RandomState(0)
    tokens = ["common", "mid", "rare"]  # gensim order: descending count
    counts = np.array([50, 10, 2], np.int64)
    syn1 = rng.randn(3, 16).astype(np.float32) * 0.2
    docvecs = rng.randn(5, 16).astype(np.float32)
    model = imp.doc2vec_from_arrays(tokens, counts, syn1, docvecs)

    assert model.vocab.tokens == tokens
    expected_noise = counts.astype(np.float64) ** model.cfg.ns_exponent
    np.testing.assert_allclose(
        model.vocab.cum_table,
        (np.cumsum(expected_noise) / expected_noise.sum()).astype(np.float32))
    v1 = model.infer_vector(["common", "rare"])
    v2 = model.infer_vector(["common", "rare"])
    np.testing.assert_array_equal(v1, v2)  # deterministic inference works
    assert v1.shape == (16,) and np.any(v1)

    from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel
    model.save(str(tmp_path / "m"))
    again = Doc2VecModel.load(str(tmp_path / "m"))
    np.testing.assert_array_equal(again.docvecs, docvecs)
    np.testing.assert_array_equal(again.tag_vector("mid"), model.tag_vector("mid"))


def test_doc2vec_from_arrays_shape_mismatch():
    with pytest.raises(ValueError, match="row count"):
        imp.doc2vec_from_arrays(["a"], np.array([1]), np.zeros((2, 8), np.float32),
                                np.zeros((1, 8), np.float32))


def test_similarity_from_matrix_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    mat = rng.randn(6, 8).astype(np.float32)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    path = str(tmp_path / "idx")
    imp.similarity_from_matrix(unit, path)  # gensim stores unit rows
    idx = SimilarityIndex.load(path)
    assert len(idx) == 6
    np.testing.assert_allclose(idx.matrix, unit, atol=1e-6)
    np.testing.assert_allclose(idx.norms, np.ones(6), atol=1e-5)


def test_run_without_gensim_copies_and_rebuilds(tmp_path):
    src, ref_dict = make_reference_dir(tmp_path)
    dest = tmp_path / "out"
    status = imp.run(str(src), str(dest))

    for name in (artifacts.TAGS_FILE, artifacts.DOC2VEC_IDX_CSV,
                 artifacts.BM25_CORPUS, artifacts.BM25_IDF, artifacts.BM25_AVGDL,
                 artifacts.BM25_D, artifacts.BM25_DOC_LENGTHS):
        assert status[name] == "copied"
        assert (dest / name).exists()
    # BM25 pickles byte-identical
    assert (dest / artifacts.BM25_CORPUS).read_bytes() == \
        (src / artifacts.BM25_CORPUS).read_bytes()

    # dictionary rebuilt from the idx csv with identical ids
    assert "rebuilt" in status[artifacts.DOC2VEC_DICTIONARY]
    d = TagDictionary.load(str(dest / artifacts.DOC2VEC_DICTIONARY))
    assert d.token2id == ref_dict.token2id


def test_imported_directory_serves_queries(tmp_path):
    """Simulate the full import (as if gensim had been present): pure converters
    produce the model/index; the copied pickles produce BM25 — then SearchEngine
    must answer queries over the result."""
    src, _ = make_reference_dir(tmp_path)
    dest = tmp_path / "served"
    imp.run(str(src), str(dest))

    rng = np.random.RandomState(2)
    dictionary = TagDictionary(DOCS)
    tokens = sorted({t for d in DOCS for t in d})
    counts = np.array([sum(t in d for d in DOCS) for t in tokens], np.int64)
    order = np.argsort(-counts, kind="stable")
    tokens = [tokens[i] for i in order]
    dim = 32
    model = imp.doc2vec_from_arrays(
        tokens, counts[order],
        rng.randn(len(tokens), dim).astype(np.float32) * 0.3,
        rng.randn(len(DOCS), dim).astype(np.float32),
        cfg=Doc2VecConfig(vector_size=dim),
    )
    model.save(str(dest / artifacts.DOC2VEC_MODEL))
    mat = rng.randn(len(DOCS), dim).astype(np.float32)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    imp.similarity_from_matrix(unit, str(dest / artifacts.DOC2VEC_INDEX))

    from anime_illust_image_searcher_tpu.search.engine import SearchEngine
    engine = SearchEngine(str(dest))
    # the imported doc vectors are random (4-doc toy corpus), so assert the
    # query *pipeline* works: results come back, the sword doc is among them,
    # and a +require query pins BM25 exactly
    results = engine.find_similar_documents("sword", topn=10)
    assert results
    hit_tags = [engine.image_files_name_tags_arr[i].split(",")[1:]
                for i, _ in results]
    assert any("sword" in t for t in hit_tags)
    required = engine.find_similar_documents("sword:+1", topn=10)
    req_tags = [engine.image_files_name_tags_arr[i].split(",")[1:]
                for i, _ in required]
    assert req_tags and all("sword" in t for t in req_tags)
