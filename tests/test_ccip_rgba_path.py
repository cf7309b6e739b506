"""CCIP decode path parity: RGBA flattens onto white WITHOUT square padding
(gen_cfeatures.py:285-295 — the reference resizes directly to 384² after flatten)."""

import numpy as np
from PIL import Image

from anime_illust_image_searcher_tpu.data.ingest import load_rgb_square


def test_rgba_no_pad_is_stretched_not_padded(tmp_path):
    # tall image, left half opaque red, right half fully transparent
    arr = np.zeros((64, 32, 4), dtype=np.uint8)
    arr[:, :16, 0] = 200
    arr[:, :16, 3] = 255
    p = str(tmp_path / "t.png")
    Image.fromarray(arr, "RGBA").save(p)

    out = load_rgb_square(p, 32, resample=Image.BILINEAR, pad_to_square=False)
    # stretched: left half red-ish, right half white (transparent -> white)
    assert np.all(out[:, :12, 0] > 150)
    assert np.all(out[:, :12, 1] < 50)
    assert np.all(out[:, -12:] > 250)
    # padded-to-square behavior would have put white bands on BOTH sides; the left
    # column must NOT be white
    assert out[:, 0, 1].mean() < 50


def test_rgb_no_pad_unchanged(tmp_path, rng):
    arr = rng.randint(0, 255, (40, 20, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    out = load_rgb_square(p, 20, resample=Image.BILINEAR, pad_to_square=False)
    expected = np.asarray(
        Image.fromarray(arr).resize((20, 20), resample=Image.BILINEAR), np.uint8
    )
    np.testing.assert_array_equal(out, expected)
