"""Finished-model reuse: a rebuild on identical (cfg, corpus, batch) loads the
finished ``doc2vec_model`` instead of retraining.

Sound because training is seeded and deterministic — retraining would
reproduce the pickle bit-for-bit — and it closes the crash window the mid-run
snapshots can't: a 1M-doc ``genmodel`` dying AFTER its ~52-min training stage
(during whole-corpus inference or BM25; exactly where the relay's
long-dispatch crash class lived) no longer pays the training bill again on
rerun. The reference always retrains, but its gensim training is hogwild
(nondeterministic) so it has no equivalent cache to be sound.
"""

import os
import shutil

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.models import doc2vec as d2v
from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel

CORPUS = [["a", "b", "c"], ["b", "c", "d"], ["a", "d", "e"]] * 4
CFG = Doc2VecConfig(vector_size=16, epochs=8, infer_epochs=8, max_doc_len=8, sample=0)


def _train_and_save(path="doc2vec_model", corpus=CORPUS, cfg=CFG, batch_size=8):
    m = Doc2VecModel.train(corpus, cfg, batch_size=batch_size,
                           checkpoint_path=path, checkpoint_every=0)
    m.save(path)
    return m


def test_reuse_skips_training_and_is_bit_identical(tmp_cwd, monkeypatch):
    first = _train_and_save()
    assert os.path.exists("doc2vec_model.trained_fp")

    def boom(*a, **k):
        raise AssertionError("training ran despite a reusable finished model")

    monkeypatch.setattr(d2v, "_train_epochs", boom)
    again = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                               checkpoint_path="doc2vec_model",
                               checkpoint_every=0)
    assert getattr(again, "reused_finished", False)
    np.testing.assert_array_equal(again.syn1neg, first.syn1neg)
    np.testing.assert_array_equal(again.docvecs, first.docvecs)
    assert again.corpus_count == first.corpus_count


@pytest.mark.parametrize("change", ["corpus", "epochs", "batch"])
def test_any_identity_change_retrains(tmp_cwd, change):
    _train_and_save()
    corpus, cfg, batch = CORPUS, CFG, 8
    if change == "corpus":
        corpus = CORPUS + [["x", "y", "z"]]
    elif change == "epochs":
        cfg = Doc2VecConfig(vector_size=16, epochs=12, infer_epochs=12,
                            max_doc_len=8, sample=0)
    else:
        batch = 4
    m = Doc2VecModel.train(corpus, cfg, batch_size=batch,
                           checkpoint_path="doc2vec_model", checkpoint_every=0)
    assert not getattr(m, "reused_finished", False)


def test_reuse_finished_false_forces_retrain(tmp_cwd):
    _train_and_save()
    m = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                           checkpoint_path="doc2vec_model", checkpoint_every=0,
                           reuse_finished=False)
    assert not getattr(m, "reused_finished", False)


def test_pre_reuse_pickle_without_sidecar_retrains(tmp_cwd):
    _train_and_save()
    os.remove("doc2vec_model.trained_fp")
    m = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                           checkpoint_path="doc2vec_model", checkpoint_every=0)
    assert not getattr(m, "reused_finished", False)


def test_torn_sidecar_pickle_pair_cannot_smuggle_stale_model(tmp_cwd):
    """A sidecar endorsing fp X next to a pickle trained from Y (a crash
    between the two writes, or a copied-over artifact) must retrain: the
    in-pickle train_fp is the authority."""
    _train_and_save("m_right")
    _train_and_save("doc2vec_model", corpus=CORPUS + [["p", "q", "r"]])
    # graft the RIGHT sidecar onto the WRONG pickle
    shutil.copy("m_right.trained_fp", "doc2vec_model.trained_fp")
    m = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                           checkpoint_path="doc2vec_model", checkpoint_every=0)
    assert not getattr(m, "reused_finished", False)


def test_cross_dp_mode_never_reuses(tmp_cwd):
    """dp and single-device training agree only to GSPMD-reduction ulps, so a
    single-device finished model must not satisfy a --data-parallel rebuild
    (or vice versa) — the reuse fingerprint pins the mode."""
    from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

    single = _train_and_save()
    assert ":dp" not in single.train_fp
    mesh = make_mesh(n_data=8)
    dp = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                            checkpoint_path="doc2vec_model", checkpoint_every=0,
                            mesh=mesh)
    assert not getattr(dp, "reused_finished", False)
    assert dp.train_fp.endswith(":dp8")
    dp.save("doc2vec_model")  # mesh is runtime-only; save() serializes keys
    # same dp shape now reuses; a single-device rerun must retrain again
    dp2 = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                             checkpoint_path="doc2vec_model",
                             checkpoint_every=0, mesh=mesh)
    assert getattr(dp2, "reused_finished", False)
    back = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                              checkpoint_path="doc2vec_model",
                              checkpoint_every=0)
    assert not getattr(back, "reused_finished", False)


def test_train_fp_survives_pickle_roundtrip(tmp_cwd):
    m = _train_and_save()
    assert m.train_fp
    loaded = Doc2VecModel.load("doc2vec_model")
    assert loaded.train_fp == m.train_fp
