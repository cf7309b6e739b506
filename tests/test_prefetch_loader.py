"""PrefetchLoader: batching, tail padding, failure handling — native and PIL paths."""

import os

import numpy as np
import pytest
from PIL import Image

from anime_illust_image_searcher_tpu.data import native_ingest
from anime_illust_image_searcher_tpu.data.ingest import PrefetchLoader


def make_images(directory, n):
    rng = np.random.RandomState(0)
    os.makedirs(directory, exist_ok=True)
    paths = []
    for i in range(n):
        p = os.path.join(directory, f"{i:02d}.png")
        Image.fromarray(rng.randint(0, 255, (20, 24, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    return paths


@pytest.mark.parametrize("use_native", [False, True])
def test_batching_and_tail(tmp_path, use_native):
    if use_native and not native_ingest.available():
        pytest.skip("native runtime unavailable")
    paths = make_images(tmp_path / "i", 7)
    loader = PrefetchLoader(paths, size=16, batch_size=3, workers=2,
                            use_native=use_native)
    batches = list(loader)
    assert [b.valid for b in batches] == [3, 3, 1]
    assert all(b.images.shape == (3, 16, 16, 3) for b in batches)
    got = [p for b in batches for p in b.paths]
    assert got == paths
    assert loader.failed_count == 0


@pytest.mark.parametrize("use_native", [False, True])
def test_failures_skipped(tmp_path, use_native):
    if use_native and not native_ingest.available():
        pytest.skip("native runtime unavailable")
    paths = make_images(tmp_path / "i", 4)
    bad = str(tmp_path / "i" / "00_bad.png")
    with open(bad, "wb") as f:
        f.write(b"junk")
    all_paths = [bad] + paths
    loader = PrefetchLoader(all_paths, size=16, batch_size=2, workers=2,
                            use_native=use_native)
    batches = list(loader)
    got = [p for b in batches for p in b.paths[: b.valid]]
    assert got == paths
    assert loader.failed_count == 1


def test_native_and_pil_paths_agree_on_counts(tmp_path):
    if not native_ingest.available():
        pytest.skip("native runtime unavailable")
    paths = make_images(tmp_path / "i", 5)
    a = list(PrefetchLoader(paths, size=16, batch_size=2, workers=2, use_native=True))
    b = list(PrefetchLoader(paths, size=16, batch_size=2, workers=2, use_native=False))
    assert sum(x.valid for x in a) == sum(x.valid for x in b) == 5


def test_empty_file_list():
    loader = PrefetchLoader([], size=16, batch_size=4, workers=2)
    assert list(loader) == []
