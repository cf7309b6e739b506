"""tagging_pre CLI end-to-end: make_tensor_files output -> main() -> tag file
('w'-mode colab semantics, .npy suffix stripping)."""

import argparse
import os

import numpy as np
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
