"""End-to-end genmodel CLI: fresh build and --update incremental path
(reference behavior: genmodel.py:109-177)."""

import os

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.index.dictionary import TagDictionary
from anime_illust_image_searcher_tpu.index.similarity import SimilarityIndex

LINES = [
    "/img/a.png,1girl,solo,smile,black_hair",
    "/img/b.png,1boy,solo,sword",
    "/img/short.png,solo",                      # < 3 tags: must be dropped
    "/img/c.png,no_humans,white_background,simple_background",
]

NEW_LINES = [
    "/img/d.png,1girl,sword,smile",
]


def write_tags(lines):
    with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
        for line in lines:
            f.write(line + "\n")


@pytest.fixture
def fresh_build(tmp_cwd):
    write_tags(LINES)
    genmodel.main(["--epochs", "5"])
    return tmp_cwd


def test_fresh_build_artifacts(fresh_build):
    for name in [
        artifacts.DOC2VEC_IDX_CSV, artifacts.DOC2VEC_DICTIONARY, artifacts.DOC2VEC_MODEL,
        artifacts.BM25_CORPUS, artifacts.BM25_IDF, artifacts.BM25_AVGDL,
        artifacts.BM25_D, artifacts.BM25_DOC_LENGTHS,
    ]:
        assert os.path.exists(name), name
    assert SimilarityIndex.exists(artifacts.DOC2VEC_INDEX)

    # idx csv excludes the <3-tag doc, preserves order and full original lines
    with open(artifacts.DOC2VEC_IDX_CSV, encoding="utf-8") as f:
        rows = [l.strip() for l in f]
    assert rows == [LINES[0], LINES[1], LINES[3]]

    idx = SimilarityIndex.load(artifacts.DOC2VEC_INDEX)
    assert len(idx) == 3

    d = TagDictionary.load(artifacts.DOC2VEC_DICTIONARY)
    assert "1girl" in d and "solo" in d
    assert "nonexistent" not in d


def test_update_appends_only_new_docs(fresh_build):
    write_tags(LINES + NEW_LINES)
    genmodel.main(["--update", "--epochs", "5"])

    assert os.path.exists(artifacts.DOC2VEC_IDX_CSV_BAK)
    idx = SimilarityIndex.load(artifacts.DOC2VEC_INDEX)
    assert len(idx) == 4  # 3 old + 1 new

    # BM25 is rebuilt over the FULL corpus (genmodel.py:177)
    import pickle

    with open(artifacts.BM25_D, "rb") as f:
        assert pickle.load(f) == 4

    # dictionary is NOT extended on update (QUIRKS.md) — 'd.png' introduces no new tag
    # here, but the file must be byte-identical to the fresh one
    d = TagDictionary.load(artifacts.DOC2VEC_DICTIONARY)
    assert "holding_hands" not in d


def test_update_vectors_match_fresh_inference(fresh_build):
    """Appended vectors must come from the same (frozen) model as a direct infer."""
    from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel

    write_tags(LINES + NEW_LINES)
    genmodel.main(["--update", "--epochs", "5"])
    model = Doc2VecModel.load(artifacts.DOC2VEC_MODEL)
    expected = model.infer_vectors([NEW_LINES[0].split(",")[1:]])[0]
    expected = expected / np.linalg.norm(expected)
    idx = SimilarityIndex.load(artifacts.DOC2VEC_INDEX)
    np.testing.assert_allclose(idx.vector_by_id(3), expected, rtol=1e-5, atol=1e-6)


def test_rerun_after_post_training_crash_reuses_model(fresh_build, capsys):
    """A build that crashed AFTER training (inference/BM25 stages) must not
    retrain on rerun: the finished model pickle is fingerprint-matched and
    reused, the untouched pickle keeps its bytes/mtime, and the downstream
    artifacts are rebuilt identically (training is deterministic)."""
    index_before = open(artifacts.DOC2VEC_INDEX, "rb").read()
    model_stat = os.stat(artifacts.DOC2VEC_MODEL)
    # simulate the crash window: post-training artifacts are gone/partial
    os.remove(artifacts.DOC2VEC_INDEX)
    os.remove("bm25_corpus")

    capsys.readouterr()
    genmodel.main(["--epochs", "5"])
    out = capsys.readouterr().out
    assert "reusing finished model" in out
    after = os.stat(artifacts.DOC2VEC_MODEL)
    assert (after.st_mtime_ns, after.st_size) == (
        model_stat.st_mtime_ns, model_stat.st_size)
    assert open(artifacts.DOC2VEC_INDEX, "rb").read() == index_before
    assert os.path.exists("bm25_corpus")


def test_rerun_with_changed_corpus_retrains(fresh_build, capsys):
    write_tags(LINES + NEW_LINES)
    capsys.readouterr()
    genmodel.main(["--epochs", "5"])
    assert "reusing finished model" not in capsys.readouterr().out


def test_no_reuse_model_flag_retrains(fresh_build, capsys):
    capsys.readouterr()
    genmodel.main(["--epochs", "5", "--no-reuse-model"])
    assert "reusing finished model" not in capsys.readouterr().out


def test_checkpoint_every_zero_disables_snapshots(tmp_cwd):
    """--checkpoint-every 0 must train without writing (or needing) the
    .ckpt.npz snapshot — at production scale a snapshot D2H-copies the full
    doc-vector table (~1.2 GB at 1M docs), which slow device links can't
    afford every 10 epochs."""
    write_tags(LINES)
    genmodel.main(["--epochs", "25", "--checkpoint-every", "0"])
    assert not os.path.exists(artifacts.DOC2VEC_MODEL + ".ckpt.npz")
    assert os.path.exists(artifacts.DOC2VEC_MODEL)
