"""MCut batch op vs the reference formula (tagging.py:61-66)."""

import numpy as np

from anime_illust_image_searcher_tpu.ops.mcut import mcut_threshold, mcut_threshold_batch


def reference_mcut(probs):
    sorted_probs = probs[probs.argsort()[::-1]]
    difs = sorted_probs[:-1] - sorted_probs[1:]
    t = difs.argmax()
    return (sorted_probs[t] + sorted_probs[t + 1]) / 2


def test_batch_matches_reference(rng):
    probs = rng.rand(16, 100).astype(np.float32)
    got = np.asarray(mcut_threshold_batch(probs))
    expected = np.array([reference_mcut(p) for p in probs])
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_host_version_matches_reference(rng):
    p = rng.rand(50).astype(np.float32)
    assert mcut_threshold(p) == float(reference_mcut(p))


def test_clear_gap():
    probs = np.array([[0.9, 0.85, 0.1, 0.05]], dtype=np.float32)
    t = float(np.asarray(mcut_threshold_batch(probs))[0])
    assert abs(t - (0.85 + 0.1) / 2) < 1e-6


def test_tie_takes_first_gap():
    # two exactly-equal max gaps (binary-representable) -> argmax picks the first
    probs = np.array([[1.0, 0.75, 0.5]], dtype=np.float32)
    t = float(np.asarray(mcut_threshold_batch(probs))[0])
    assert abs(t - 0.875) < 1e-6
