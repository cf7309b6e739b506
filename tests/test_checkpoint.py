"""Doc2Vec training checkpoint/resume (SURVEY.md §5.4 — new capability, the reference
only has .bak-file recovery)."""

import os

import numpy as np

from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel

CORPUS = [["a", "b", "c"], ["b", "c", "d"], ["a", "d", "e"]] * 4
CFG = Doc2VecConfig(vector_size=16, epochs=8, infer_epochs=8, max_doc_len=8, sample=0)


def test_checkpoint_written_and_cleaned(tmp_cwd):
    Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                       checkpoint_path="doc2vec_model", checkpoint_every=4)
    # completed training removes the snapshot
    assert not os.path.exists("doc2vec_model.ckpt.npz")


def test_resume_matches_uninterrupted(tmp_cwd, monkeypatch):
    from anime_illust_image_searcher_tpu.models import doc2vec as d2v

    full = Doc2VecModel.train(CORPUS, CFG, batch_size=8)

    # crash mid-run: let the first 4-epoch run finish (snapshot written), die
    # during the second run (train dispatches one _train_epochs per
    # checkpoint_every boundary)
    real_epochs = d2v._train_epochs
    calls = {"n": 0}

    def crashing_epochs(*a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real_epochs(*a, **kw)

    monkeypatch.setattr(d2v, "_train_epochs", crashing_epochs)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                           checkpoint_path="m", checkpoint_every=4)
    monkeypatch.setattr(d2v, "_train_epochs", real_epochs)
    assert os.path.exists("m.ckpt.npz")  # crash artifact survives

    resumed = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                                 checkpoint_path="m", checkpoint_every=100)
    np.testing.assert_allclose(resumed.syn1neg, full.syn1neg, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(resumed.docvecs, full.docvecs, rtol=1e-6, atol=1e-7)
    assert not os.path.exists("m.ckpt.npz")  # cleaned after completion


def test_stale_checkpoint_shape_mismatch_ignored(tmp_cwd):
    np.savez("m.ckpt.npz", docvecs=np.zeros((99, 3)), syn1=np.zeros((2, 3)), epoch=2)
    model = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                               checkpoint_path="m", checkpoint_every=0)
    fresh = Doc2VecModel.train(CORPUS, CFG, batch_size=8)
    np.testing.assert_array_equal(model.syn1neg, fresh.syn1neg)


def _crash_after_first_segment(monkeypatch, d2v):
    real_epochs = d2v._train_epochs
    calls = {"n": 0}

    def crashing(*a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real_epochs(*a, **kw)

    monkeypatch.setattr(d2v, "_train_epochs", crashing)
    return real_epochs


def test_foreign_config_checkpoint_ignored(tmp_cwd, monkeypatch, capsys):
    """A snapshot from a run with a DIFFERENT cfg (here: epoch target) must not
    resume — shape-only validation used to return a 16-epoch run's snapshot as
    the 'finished' 4-epoch model without training at all."""
    import dataclasses

    import pytest as _pytest

    from anime_illust_image_searcher_tpu.models import doc2vec as d2v

    big = dataclasses.replace(CFG, epochs=16)
    real = _crash_after_first_segment(monkeypatch, d2v)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        Doc2VecModel.train(CORPUS, big, batch_size=8,
                           checkpoint_path="m", checkpoint_every=4)
    monkeypatch.setattr(d2v, "_train_epochs", real)
    assert os.path.exists("m.ckpt.npz")

    # same shapes, different cfg.epochs -> fingerprint mismatch -> fresh run
    model = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                               checkpoint_path="m", checkpoint_every=4)
    assert "ignoring m.ckpt.npz" in capsys.readouterr().out
    fresh = Doc2VecModel.train(CORPUS, CFG, batch_size=8)
    np.testing.assert_array_equal(model.syn1neg, fresh.syn1neg)
    np.testing.assert_array_equal(model.docvecs, fresh.docvecs)


def test_cross_mode_checkpoint_refused(tmp_cwd, monkeypatch, capsys):
    """A snapshot written under a dp mesh must NOT resume a single-device run
    (and vice versa): dp and single-device training agree only to
    GSPMD-reduction ulps, so a mixed-mode model would be stamped with the
    finishing run's mode-pinned train_fp and later reused as 'bit-identical'
    to a pure retrain it does not match (ADVICE r4). Snapshot fingerprints are
    mode-pinned; a cross-mode resume retrains from scratch instead."""
    import pytest as _pytest

    from anime_illust_image_searcher_tpu.models import doc2vec as d2v
    from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8)
    real = _crash_after_first_segment(monkeypatch, d2v)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        Doc2VecModel.train(CORPUS, CFG, batch_size=8, mesh=mesh,
                           checkpoint_path="m", checkpoint_every=4)
    monkeypatch.setattr(d2v, "_train_epochs", real)
    assert os.path.exists("m.ckpt.npz")  # dp-mode snapshot on disk

    # single-device resume over a dp snapshot: refused, trains from scratch
    model = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                               checkpoint_path="m", checkpoint_every=4)
    assert "ignoring m.ckpt.npz" in capsys.readouterr().out
    fresh = Doc2VecModel.train(CORPUS, CFG, batch_size=8)
    np.testing.assert_array_equal(model.syn1neg, fresh.syn1neg)
    np.testing.assert_array_equal(model.docvecs, fresh.docvecs)

    # and the mirror: a single-device snapshot must not resume a dp run
    real = _crash_after_first_segment(monkeypatch, d2v)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                           checkpoint_path="m2", checkpoint_every=4)
    monkeypatch.setattr(d2v, "_train_epochs", real)
    Doc2VecModel.train(CORPUS, CFG, batch_size=8, mesh=mesh,
                       checkpoint_path="m2", checkpoint_every=4)
    assert "ignoring m2.ckpt.npz" in capsys.readouterr().out


def test_same_mode_dp_snapshot_resumes(tmp_cwd, monkeypatch, capsys):
    """Mode-pinning must not break the legitimate case: a dp-mode snapshot
    resumed under the SAME dp mesh still resumes (and matches the
    uninterrupted dp run bit-for-bit)."""
    import pytest as _pytest

    from anime_illust_image_searcher_tpu.models import doc2vec as d2v
    from anime_illust_image_searcher_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8)
    full = Doc2VecModel.train(CORPUS, CFG, batch_size=8, mesh=mesh)

    real = _crash_after_first_segment(monkeypatch, d2v)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        Doc2VecModel.train(CORPUS, CFG, batch_size=8, mesh=mesh,
                           checkpoint_path="m", checkpoint_every=4)
    monkeypatch.setattr(d2v, "_train_epochs", real)

    resumed = Doc2VecModel.train(CORPUS, CFG, batch_size=8, mesh=mesh,
                                 checkpoint_path="m", checkpoint_every=4)
    assert "resumed from m.ckpt.npz" in capsys.readouterr().out
    np.testing.assert_array_equal(resumed.syn1neg, full.syn1neg)
    np.testing.assert_array_equal(resumed.docvecs, full.docvecs)


def test_foreign_corpus_checkpoint_ignored(tmp_cwd, monkeypatch, capsys):
    """Same cfg and SAME array shapes but different corpus content: resume
    must be refused (the old check silently trained doc vectors from another
    dataset's snapshot)."""
    import pytest as _pytest

    from anime_illust_image_searcher_tpu.models import doc2vec as d2v

    other = [["x", "y", "z"], ["y", "z", "w"], ["x", "w", "v"]] * 4  # same shape
    real = _crash_after_first_segment(monkeypatch, d2v)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        Doc2VecModel.train(other, CFG, batch_size=8,
                           checkpoint_path="m", checkpoint_every=4)
    monkeypatch.setattr(d2v, "_train_epochs", real)

    model = Doc2VecModel.train(CORPUS, CFG, batch_size=8,
                               checkpoint_path="m", checkpoint_every=4)
    assert "ignoring m.ckpt.npz" in capsys.readouterr().out
    fresh = Doc2VecModel.train(CORPUS, CFG, batch_size=8)
    np.testing.assert_array_equal(model.syn1neg, fresh.syn1neg)
