"""Checkpointed whole-corpus inference (genmodel._infer_vectors_resumable).

Per-doc inference is deterministic and batch-invariant, so slicing + persisting
finished slices must be result-identical to one infer_vectors call, and a
crash mid-pass must resume from completed slices instead of re-inferring
everything (the ~11-min window of a 1M-doc build that remains after
finished-model reuse).
"""

import json
import os

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel

CORPUS = [[f"t{i}", f"t{i + 1}", f"t{i + 2}", "common"] for i in range(40)]
CFG = Doc2VecConfig(vector_size=8, epochs=4, infer_epochs=4, max_doc_len=8,
                    sample=0)


@pytest.fixture
def model(tmp_cwd):
    return Doc2VecModel.train(CORPUS, CFG, batch_size=8)


def test_sliced_is_identical_to_one_call(model, monkeypatch):
    monkeypatch.setenv("AIIS_INFER_RESUME_SLICE", "16")
    whole = model.infer_vectors(CORPUS)
    sliced = genmodel._infer_vectors_resumable(model, CORPUS)
    np.testing.assert_array_equal(sliced, whole)
    assert os.path.exists(genmodel._infer_progress_dir())  # caller clears it


def test_resume_after_crash_skips_completed_slices(model, monkeypatch, capsys):
    monkeypatch.setenv("AIIS_INFER_RESUME_SLICE", "16")
    whole = model.infer_vectors(CORPUS)

    real = Doc2VecModel.infer_vectors
    calls = {"n": 0}

    def crash_on_second(self, docs, epochs=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated device crash")
        return real(self, docs, epochs=epochs)

    monkeypatch.setattr(Doc2VecModel, "infer_vectors", crash_on_second)
    with pytest.raises(RuntimeError, match="simulated device crash"):
        genmodel._infer_vectors_resumable(model, CORPUS)

    monkeypatch.setattr(Doc2VecModel, "infer_vectors", real)
    calls_after = []

    def counting(self, docs, epochs=None):
        calls_after.append(len(docs))
        return real(self, docs, epochs=epochs)

    monkeypatch.setattr(Doc2VecModel, "infer_vectors", counting)
    capsys.readouterr()
    out = genmodel._infer_vectors_resumable(model, CORPUS)
    assert "resumed inference" in capsys.readouterr().out
    np.testing.assert_array_equal(out, whole)
    # slice 0 (16 docs) came from disk; only slices 1 and 2 recomputed
    assert calls_after == [16, 8]


def test_stale_progress_is_recomputed(model, monkeypatch, capsys):
    monkeypatch.setenv("AIIS_INFER_RESUME_SLICE", "16")
    whole = genmodel._infer_vectors_resumable(model, CORPUS)

    # a different corpus with the same doc count/slices must not reuse slices
    other = [[f"x{i}", f"x{i + 1}", f"x{i + 2}", "common"] for i in range(40)]
    capsys.readouterr()
    out = genmodel._infer_vectors_resumable(model, other)
    assert "different model/corpus" in capsys.readouterr().out
    assert not np.array_equal(out, whole)


def test_stale_slices_are_deleted_on_fp_mismatch(model, monkeypatch):
    """On a fingerprint mismatch the whole progress dir is dropped BEFORE the
    new pass starts — repeated crashed builds over changing corpora must not
    accumulate orphaned slice files (multi-hundred-MB each at 1M-doc scale;
    ADVICE r4). A shrunken corpus makes the orphan visible: the old corpus
    wrote 3 slices, the new one only ever writes 2."""
    monkeypatch.setenv("AIIS_INFER_RESUME_SLICE", "16")
    genmodel._infer_vectors_resumable(model, CORPUS)  # 40 docs -> slices 0..2
    d = genmodel._infer_progress_dir()
    assert os.path.exists(os.path.join(d, "slice_2.npy"))

    other = [[f"x{i}", f"x{i + 1}", f"x{i + 2}", "common"] for i in range(32)]
    genmodel._infer_vectors_resumable(model, other)  # 32 docs -> slices 0..1
    assert not os.path.exists(os.path.join(d, "slice_2.npy"))  # orphan gone
    names = sorted(f for f in os.listdir(d) if f.startswith("slice_"))
    assert names == ["slice_0.npy", "slice_1.npy"]


def test_corrupt_slice_and_manifest_are_recomputed(model, monkeypatch):
    monkeypatch.setenv("AIIS_INFER_RESUME_SLICE", "16")
    whole = model.infer_vectors(CORPUS)
    genmodel._infer_vectors_resumable(model, CORPUS)
    d = genmodel._infer_progress_dir()
    with open(os.path.join(d, "slice_1.npy"), "wb") as f:
        f.write(b"garbage")
    out = genmodel._infer_vectors_resumable(model, CORPUS)
    np.testing.assert_array_equal(out, whole)

    with open(os.path.join(d, "manifest.json"), "w") as f:
        f.write("{not json")
    out = genmodel._infer_vectors_resumable(model, CORPUS)
    np.testing.assert_array_equal(out, whole)


def test_small_corpus_bypasses_progress(model, monkeypatch):
    monkeypatch.setenv("AIIS_INFER_RESUME_SLICE", "131072")
    out = genmodel._infer_vectors_resumable(model, CORPUS)
    np.testing.assert_array_equal(out, model.infer_vectors(CORPUS))
    assert not os.path.exists(genmodel._infer_progress_dir())


def test_build_clears_progress_on_success(tmp_cwd, monkeypatch):
    monkeypatch.setenv("AIIS_INFER_RESUME_SLICE", "2")
    lines = [f"/img/{i}.png,a{i},b{i},c{i}" for i in range(8)]
    with open("tags-wd-tagger.txt", "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    genmodel.main(["--epochs", "2"])
    assert not os.path.exists(genmodel._infer_progress_dir())
