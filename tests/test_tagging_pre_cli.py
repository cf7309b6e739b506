"""tagging_pre CLI end-to-end: make_tensor_files output -> main() -> tag file
('w'-mode colab semantics, .npy suffix stripping)."""

import argparse
import os

import numpy as np
import pytest
from PIL import Image

from anime_illust_image_searcher_tpu.cli import tagging_pre
from anime_illust_image_searcher_tpu.cli.utility import make_tensor_files
from anime_illust_image_searcher_tpu.models.eva02 import tiny_test_config

TINY = tiny_test_config()


def test_main_end_to_end(tmp_cwd, monkeypatch):
    rng = np.random.RandomState(0)
    os.makedirs("raw", exist_ok=True)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)).save(
            f"raw/x{i}.png"
        )
    mt = make_tensor_files.Predictor()
    mt.size = TINY.img_size
    mt.args = argparse.Namespace(dirbase=["raw"], dest=["pre"])
    mt.process_directory("raw")

    # route the CLI's full-size default config onto the tiny test model
    from anime_illust_image_searcher_tpu.models import tagger as tagger_mod

    orig_init = tagger_mod.TaggerPredictor.__init__

    def tiny_init(self, config, model_dir=None, **kw):
        orig_init(self, config=config, model_dir=None, model_cfg=TINY,
                  use_pallas=False)

    monkeypatch.setattr(tagger_mod.TaggerPredictor, "__init__", tiny_init)

    import dataclasses

    monkeypatch.setattr(
        tagging_pre, "DEFAULT_CONFIG",
        dataclasses.replace(
            tagging_pre.DEFAULT_CONFIG,
            tagger=dataclasses.replace(
                tagging_pre.DEFAULT_CONFIG.tagger, image_size=TINY.img_size
            ),
        ),
    )

    # pre-existing tag file must be TRUNCATED ('w' mode, colab semantics)
    with open("tags-wd-tagger.txt", "w", encoding="utf-8") as f:
        f.write("stale_line\n")

    tagging_pre.main(["--dir", "pre", "--batch-size", "2"])

    with open("tags-wd-tagger.txt", encoding="utf-8") as f:
        lines = [l.strip() for l in f if l.strip()]
    assert len(lines) == 3
    assert all("stale_line" not in l for l in lines)
    for l in lines:
        assert l.split(",")[0].endswith(".png")  # .npy suffix stripped


def test_reference_pt_tensor_files(tmp_cwd, monkeypatch):
    """Reference-made torch tensor files (transformed f32 CHW, BGR, saved under
    the IMAGE path name — utility/make_tensor_files.py:165-188) tag identically
    to the equivalent .npy files: the u8 round trip through the saved transform
    is exact, so the tag lines match byte-for-byte."""
    torch = pytest.importorskip("torch")

    rng = np.random.RandomState(1)
    os.makedirs("pt", exist_ok=True)
    os.makedirs("npy", exist_ok=True)
    size = TINY.img_size
    for i in range(3):
        u8 = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)  # RGB HWC
        # reference transform: f32 CHW, (x/255 - .5)/.5, then BGR swap
        chw = u8.astype(np.float32).transpose(2, 0, 1) / 255.0
        chw = (chw - 0.5) / 0.5
        torch.save(torch.from_numpy(np.ascontiguousarray(chw[::-1])),
                   f"pt/img{i}.jpg")
        np.save(f"npy/img{i}.jpg.npy", u8)

    from anime_illust_image_searcher_tpu.models import tagger as tagger_mod

    orig_init = tagger_mod.TaggerPredictor.__init__

    def tiny_init(self, config, model_dir=None, **kw):
        orig_init(self, config=config, model_dir=None, model_cfg=TINY,
                  use_pallas=False)

    monkeypatch.setattr(tagger_mod.TaggerPredictor, "__init__", tiny_init)
    import dataclasses

    monkeypatch.setattr(
        tagging_pre, "DEFAULT_CONFIG",
        dataclasses.replace(
            tagging_pre.DEFAULT_CONFIG,
            tagger=dataclasses.replace(
                tagging_pre.DEFAULT_CONFIG.tagger, image_size=size
            ),
        ),
    )

    tagging_pre.main(["--dir", "pt", "--batch-size", "2"])
    with open("tags-wd-tagger.txt", encoding="utf-8") as f:
        pt_lines = sorted(l.strip() for l in f if l.strip())
    tagging_pre.main(["--dir", "npy", "--batch-size", "2"])
    with open("tags-wd-tagger.txt", encoding="utf-8") as f:
        npy_lines = sorted(l.strip() for l in f if l.strip())

    assert len(pt_lines) == 3
    # identical tags; paths differ only by directory (pt keeps the image name)
    assert [l.split(",", 1)[1] for l in pt_lines] == \
           [l.split(",", 1)[1] for l in npy_lines]
    assert all(l.split(",")[0].startswith("pt/img") for l in pt_lines)
