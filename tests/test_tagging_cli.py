"""Tagging CLI end-to-end with a tiny random model: format parity, append semantics,
--after filtering, tail-batch processing, decode-failure skipping."""

import datetime
import os

import numpy as np
import pytest
from PIL import Image

from anime_illust_image_searcher_tpu.cli import tagging
from anime_illust_image_searcher_tpu.config import TaggerConfig
from anime_illust_image_searcher_tpu.models.eva02 import tiny_test_config

TINY = tiny_test_config()
CFG = TaggerConfig(batch_size=4, image_size=TINY.img_size, decode_workers=2)


def make_images(directory, n, prefix="img"):
    rng = np.random.RandomState(0)
    paths = []
    os.makedirs(directory, exist_ok=True)
    for i in range(n):
        arr = rng.randint(0, 255, size=(32, 24, 3), dtype=np.uint8)
        p = os.path.join(directory, f"{prefix}_{i:02d}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def run_dir(dir_path, added_date=None):
    pred = tagging.Predictor(config=CFG, model_cfg=TINY, use_pallas=False)
    pred.process_directory(dir_path, added_date)


def read_lines():
    with open("tags-wd-tagger.txt", encoding="utf-8") as f:
        return [l.strip() for l in f if l.strip()]


def test_all_files_tagged_including_tail(tmp_cwd):
    """7 files with batch 4: reference would drop the tail; we must not (QUIRKS.md #1)."""
    paths = make_images(tmp_cwd / "imgs", 7)
    run_dir(str(tmp_cwd / "imgs"))
    lines = read_lines()
    assert len(lines) == 7
    assert {l.split(",")[0] for l in lines} == set(paths)
    # output follows listing order deterministically (QUIRKS.md #13)
    from anime_illust_image_searcher_tpu.data.ingest import list_files_recursive

    assert [l.split(",")[0] for l in lines] == list_files_recursive(str(tmp_cwd / "imgs"))


def test_line_format(tmp_cwd):
    make_images(tmp_cwd / "imgs", 2)
    run_dir(str(tmp_cwd / "imgs"))
    for line in read_lines():
        parts = line.split(",")
        assert parts[0].endswith(".png")
        assert len(parts) >= 1
        for tag in parts[1:]:
            assert " " not in tag  # spaces -> underscores


def test_append_mode(tmp_cwd):
    make_images(tmp_cwd / "imgs", 2)
    run_dir(str(tmp_cwd / "imgs"))
    run_dir(str(tmp_cwd / "imgs"))
    assert len(read_lines()) == 4  # QUIRKS.md #2: append even on rerun


def test_deterministic_output(tmp_cwd):
    make_images(tmp_cwd / "imgs", 5)
    run_dir(str(tmp_cwd / "imgs"))
    first = read_lines()
    os.remove("tags-wd-tagger.txt")
    run_dir(str(tmp_cwd / "imgs"))
    assert read_lines() == first


def test_decode_failure_skipped(tmp_cwd):
    make_images(tmp_cwd / "imgs", 3)
    bad = tmp_cwd / "imgs" / "zz_broken.png"
    bad.write_bytes(b"not a png at all")
    run_dir(str(tmp_cwd / "imgs"))
    lines = read_lines()
    assert len(lines) == 3
    assert all("zz_broken" not in l for l in lines)


def test_after_requires_existing_tagfile(tmp_cwd):
    make_images(tmp_cwd / "imgs", 1)
    with pytest.raises(SystemExit):
        run_dir(str(tmp_cwd / "imgs"), datetime.date(2000, 1, 1))


def test_after_backs_up_and_filters(tmp_cwd):
    make_images(tmp_cwd / "imgs", 2)
    run_dir(str(tmp_cwd / "imgs"))
    before = read_lines()
    # all files were just created, so --after today re-tags all of them
    run_dir(str(tmp_cwd / "imgs"), datetime.date.today())
    assert os.path.exists("tags-wd-tagger.txt.bak")
    with open("tags-wd-tagger.txt.bak", encoding="utf-8") as f:
        assert [l.strip() for l in f if l.strip()] == before
    assert len(read_lines()) == 4
    # --after in the future filters everything out
    run_dir(str(tmp_cwd / "imgs"), datetime.date.today() + datetime.timedelta(days=2))
    assert len(read_lines()) == 4


def test_extension_filter(tmp_cwd):
    make_images(tmp_cwd / "imgs", 2)
    (tmp_cwd / "imgs" / "notes.txt").write_text("hi")
    (tmp_cwd / "imgs" / "raw.webp").write_bytes(b"x")
    run_dir(str(tmp_cwd / "imgs"))
    assert len(read_lines()) == 2


def test_decode_workers_flag_validated(tmp_cwd):
    """--decode-workers rejects non-positive values before any model work."""
    from anime_illust_image_searcher_tpu.cli import gen_cfeatures as gcf

    with pytest.raises(SystemExit):
        tagging.main(["--dir", str(tmp_cwd), "--decode-workers", "0"])
    with pytest.raises(SystemExit):
        gcf.main(["--dir", str(tmp_cwd), "--decode-workers", "-2"])
