"""BM25 serving cache (mmap'd device-form sidecars) + lazy engine tag dicts.

The five reference-named pickles stay canonical (genmodel.py:84-97 payloads);
``bm25_servecache/`` holds the derived term/contrib arrays keyed by a
fingerprint of the pickles + scoring config. These tests pin: bit-identity of
the cached arrays vs a fresh ``from_stats``, staleness invalidation when a
pickle or the config changes, best-effort behavior on read-only dirs, and the
lazy construction of the engine's per-file tag dicts (VERDICT r3 #3).
"""

import os
import pickle

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.config import BM25Config
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.index.bm25_index import (
    BM25DeviceIndex,
    build_bm25_stats,
    load_bm25_artifacts,
    save_bm25_artifacts,
)
from anime_illust_image_searcher_tpu.index.dictionary import TagDictionary

CORPUS = [
    ["1girl", "solo", "smile"],
    ["1boy", "sword", "armor", "sword"],
    ["no_humans", "bottle", "still_life", "smile"],
    ["1girl", "long_hair", "dress", "smile", "solo"],
]


@pytest.fixture()
def artifact_dir(tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        dictionary = TagDictionary(CORPUS)
        stats = build_bm25_stats(CORPUS, dictionary)
        save_bm25_artifacts(stats)
    finally:
        os.chdir(cwd)
    return str(tmp_path), dictionary


def _assert_same(a: BM25DeviceIndex, b: BM25DeviceIndex) -> None:
    for name in BM25DeviceIndex._CACHE_ARRAYS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), err_msg=name)
    assert a.vocab_size == b.vocab_size
    assert a.num_docs == b.num_docs


def test_cache_roundtrip_bit_identical(artifact_dir):
    d, dictionary = artifact_dir
    vs = len(dictionary)
    assert BM25DeviceIndex.load_cached(d, vs) is None  # cold: no cache yet
    built = BM25DeviceIndex.load_or_build(d, vs)       # builds + writes
    cached = BM25DeviceIndex.load_cached(d, vs)
    assert cached is not None
    _assert_same(built, cached)
    direct = BM25DeviceIndex.from_stats(load_bm25_artifacts(d), vocab_size=vs)
    _assert_same(direct, cached)


def test_cache_invalidated_by_pickle_change(artifact_dir):
    d, dictionary = artifact_dir
    vs = len(dictionary)
    BM25DeviceIndex.load_or_build(d, vs)
    assert BM25DeviceIndex.load_cached(d, vs) is not None

    # rebuild the pickles from a different corpus -> fingerprint mismatch
    cwd = os.getcwd()
    os.chdir(d)
    try:
        corpus2 = CORPUS + [["new_tag", "1girl", "hat"]]
        dict2 = TagDictionary(corpus2)
        save_bm25_artifacts(build_bm25_stats(corpus2, dict2))
    finally:
        os.chdir(cwd)
    assert BM25DeviceIndex.load_cached(d, len(dict2)) is None
    rebuilt = BM25DeviceIndex.load_or_build(d, len(dict2))
    assert rebuilt.num_docs == len(corpus2)
    # and the fresh cache now matches
    _assert_same(rebuilt, BM25DeviceIndex.load_cached(d, len(dict2)))


def test_cache_invalidated_by_config_and_vocab(artifact_dir):
    d, dictionary = artifact_dir
    vs = len(dictionary)
    BM25DeviceIndex.load_or_build(d, vs, cfg=BM25Config())
    assert BM25DeviceIndex.load_cached(d, vs, cfg=BM25Config(k1=2.0)) is None
    assert BM25DeviceIndex.load_cached(d, vs + 1, cfg=BM25Config()) is None


def test_unwritable_cache_serves_anyway(artifact_dir):
    """write_cache failures (read-only artifact dirs) must not break serving.
    A plain chmod test is useless under root, so squat the cache path with a
    file — os.makedirs then raises and load_or_build swallows it."""
    d, dictionary = artifact_dir
    vs = len(dictionary)
    with open(BM25DeviceIndex.cache_dir(d), "w", encoding="utf-8") as f:
        f.write("not a directory")
    built = BM25DeviceIndex.load_or_build(d, vs)  # must not raise
    assert built.num_docs == len(CORPUS)
    assert os.path.isfile(BM25DeviceIndex.cache_dir(d))  # untouched


def test_engine_tag_dicts_are_lazy_and_correct(tmp_path):
    from anime_illust_image_searcher_tpu.cli import genmodel
    from anime_illust_image_searcher_tpu.search.engine import SearchEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        lines = [
            "/img/a.png,1girl,solo,smile",
            "/img/b.png,1boy,sword,armor",
            "/img/c.png,no_humans,bottle,still_life",
        ]
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "2"])
        # genmodel pre-derives the serving cache
        assert os.path.isfile(os.path.join(
            BM25DeviceIndex.cache_dir("."), "manifest.json"))
        eng = SearchEngine(str(tmp_path))
        assert eng._file_tag_index_dict is None  # not built at init
        assert eng.filepath_docid_dict["/img/b.png"] == 1
        assert eng.file_tag_index_dict["/img/a.png"] == {
            "1girl": True, "solo": True, "smile": True}
    finally:
        os.chdir(cwd)


def test_doc2vec_serve_cache_bit_identical(tmp_path):
    """load_for_serving must return exactly what load returns — syn1neg,
    docvecs (mmap'd), tag-vector table, vocab, cfg — and must fall back +
    rewrite when the pickle changes underneath the sidecar."""
    from anime_illust_image_searcher_tpu.models.doc2vec import (
        Doc2VecConfig, Doc2VecModel,
    )

    path = str(tmp_path / "doc2vec_model")
    cfg = Doc2VecConfig(vector_size=16, epochs=3, min_count=1)
    model = Doc2VecModel.train(CORPUS, cfg)
    model.save(path)

    # cold: no sidecar -> full unpickle, then cache written
    served = Doc2VecModel.load_for_serving(path)
    assert os.path.isfile(os.path.join(
        Doc2VecModel.serve_cache_dir(path), "manifest.json"))
    # warm: mmap path
    served2 = Doc2VecModel.load_for_serving(path)
    loaded = Doc2VecModel.load(path)
    for m in (served, served2):
        np.testing.assert_array_equal(np.asarray(m.docvecs), loaded.docvecs)
        np.testing.assert_array_equal(m.syn1neg, loaded.syn1neg)
        np.testing.assert_array_equal(
            m._infer_cache["tag_vectors"], loaded._infer_cache["tag_vectors"])
        assert m.vocab.tokens == loaded.vocab.tokens
        np.testing.assert_array_equal(m.vocab.counts, loaded.vocab.counts)
        assert m.cfg == loaded.cfg
        assert m.corpus_count == loaded.corpus_count

    # staleness: retrain + re-save -> fingerprint mismatch -> fresh values
    model2 = Doc2VecModel.train(CORPUS + [["hat", "1girl"]],
                                Doc2VecConfig(vector_size=16, epochs=2, min_count=1))
    model2.save(path)
    served3 = Doc2VecModel.load_for_serving(path)
    np.testing.assert_array_equal(np.asarray(served3.docvecs), model2.docvecs)
    assert served3.corpus_count == model2.corpus_count


def test_reranker_lazy_engine_wiring(tmp_path):
    """CCIPReranker(engine=...) resolves the tag structures lazily from the
    engine without the webui passing the built dicts at startup."""
    from anime_illust_image_searcher_tpu.search.rerank_ccip import CCIPReranker

    class FakeEngine:
        image_files_name_tags_arr = ["/img/a.png,1girl", "/img/b.png,1boy"]
        file_tag_index_dict = {"/img/a.png": {"1girl": True},
                               "/img/b.png": {"1boy": True}}
        filepath_docid_dict = {"/img/a.png": 0, "/img/b.png": 1}

    rr = CCIPReranker(directory=str(tmp_path), engine=FakeEngine())
    assert rr.filepath_docid_dict["/img/b.png"] == 1
    assert rr.file_tag_index_dict["/img/a.png"] == {"1girl": True}
    assert rr.image_files_name_tags_arr[0].startswith("/img/a.png")
