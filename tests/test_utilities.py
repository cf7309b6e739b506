"""Utility tools: counttag, tag repair, unique taglist, make_tensor_files + tagging_pre."""

import os

import numpy as np
from PIL import Image

from anime_illust_image_searcher_tpu.cli.utility import (
    counttag, last_elem_replace_and_gen_list, make_tensor_files, make_unique_taglist,
)
from anime_illust_image_searcher_tpu.models.weights import LabelSet


def labels():
    # names chosen so character tags are recognizable suffixes
    return LabelSet(
        names=["rating_x", "1girl", "smile", "hatsune_miku", "hakurei_reimu"],
        rating_index=[0], general_index=[1, 2], character_index=[3, 4],
    )


def test_counttag(tmp_cwd, capsys):
    with open("tags-wd-tagger.txt", "w", encoding="utf-8") as f:
        f.write("/a.png,1girl,smile,last_dropped\n")
        f.write("/b.png,1girl,solo,other_last\n")
    counttag.main()
    out = capsys.readouterr().out
    # reference slice tags[1:-1] drops path AND last tag: unique = {1girl, smile, solo}
    assert "3 unique tags found" in out


def test_last_elem_replace(tmp_cwd):
    with open("tags.txt", "w", encoding="utf-8") as f:
        f.write("/a.png,1girl,smile\\hatsune_miku\n")   # concatenated character tag
        f.write("/b.png,smile,hatsune_miku\n")           # clean character tag
        f.write("/a.png,dup,line\n")                      # duplicate path -> dropped
    last_elem_replace_and_gen_list.Replacer(labels()).replace_and_etc("tags.txt")

    with open("tags_replaced.csv", encoding="utf-8") as f:
        lines = [l.strip() for l in f]
    assert lines == [
        "/a.png,1girl,smile,hatsune_miku",  # suffix split into its own column
        "/b.png,smile,hatsune_miku",
    ]
    with open("tags_tag_chet_sheet.csv", encoding="utf-8") as f:
        cheat = [l.strip() for l in f]
    assert cheat == ["hatsune_miku"]


def test_make_unique_taglist(tmp_cwd):
    with open("tags.txt", "w", encoding="utf-8") as f:
        f.write("/a.png,1girl,smile\\hakurei_reimu\n")
    make_unique_taglist.Replacer(labels()).replace_and_etc("tags.txt")
    with open("tags_unique_tags.csv", encoding="utf-8") as f:
        out = [l.strip() for l in f]
    assert "hakurei_reimu" in out
    assert "smile" in out  # prefix with suffix stripped ('smile\' -> 'smile')


def test_make_tensor_files_and_tagging_pre(tmp_cwd):
    from anime_illust_image_searcher_tpu.cli import tagging_pre
    from anime_illust_image_searcher_tpu.config import TaggerConfig
    from anime_illust_image_searcher_tpu.models.eva02 import tiny_test_config

    rng = np.random.RandomState(0)
    os.makedirs("raw/sub", exist_ok=True)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)).save(
            f"raw/sub/x{i}.png"
        )

    tiny = tiny_test_config()
    mt = make_tensor_files.Predictor()
    mt.size = tiny.img_size
    import argparse

    mt.args = argparse.Namespace(dirbase=["raw"], dest=["pre"])
    mt.process_directory("raw")

    npys = tagging_pre.list_npy_recursive("pre")
    assert len(npys) == 3
    arr = np.load(npys[0])
    assert arr.shape == (tiny.img_size, tiny.img_size, 3) and arr.dtype == np.uint8

    # now tag from the precomputed arrays with a tiny random model
    from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor

    cfg = TaggerConfig(batch_size=2, image_size=tiny.img_size, decode_workers=2)
    pred = TaggerPredictor(config=cfg, model_cfg=tiny, use_pallas=False)
    pred.load_model()

    from anime_illust_image_searcher_tpu.data.ingest import PrefetchLoader

    loader = PrefetchLoader(npys, size=cfg.image_size, batch_size=2, workers=2,
                            decode_fn=tagging_pre.load_npy(cfg.image_size))
    n = 0
    with open("tags-wd-tagger.txt", "w", encoding="utf-8") as out:
        for batch in loader:
            results = pred.predict(batch.images, 0.3, True, 0.3, True)
            for path, line in zip(batch.paths, results[: batch.valid]):
                out.write(path[:-4] + "," + line + "\n")
                n += 1
    assert n == 3
    with open("tags-wd-tagger.txt", encoding="utf-8") as f:
        lines = [l.strip() for l in f]
    assert all(l.split(",")[0].endswith(".png") for l in lines)
