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


def test_producer_crash_raises_not_truncates(tmp_path):
    """A decode_fn crash must surface to the consumer — the old pipeline put
    the end-of-stream sentinel in a finally, so the run 'succeeded' with
    silently truncated output."""
    paths = make_images(tmp_path / "i", 6)

    def decode_fn(p):
        if p == paths[3]:
            raise RuntimeError("decoder exploded")
        import numpy as np

        return np.zeros((16, 16, 3), np.uint8)

    loader = PrefetchLoader(paths, size=16, batch_size=2, workers=2,
                            decode_fn=decode_fn)
    with pytest.raises(RuntimeError, match="decoder exploded"):
        list(loader)


def test_consumer_abandon_stops_producer(tmp_path):
    """Breaking out of iteration must stop the producer thread promptly (the
    native decoder pool is destroyed only after the producer exits)."""
    import threading

    paths = make_images(tmp_path / "i", 12)
    loader = PrefetchLoader(paths, size=16, batch_size=2, workers=2,
                            queue_depth=1, use_native=False)
    before = set(threading.enumerate())
    it = iter(loader)
    next(it)
    it.close()  # consumer abandons mid-stream (GeneratorExit -> finally)
    import time

    deadline = time.time() + 10
    while time.time() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer threads still alive: {leaked}"


def test_decode_window_is_bounded(tmp_path):
    """In-flight decodes are capped: a slow consumer must not let decoded
    frames pile up without bound ahead of it."""
    import threading
    import time

    paths = make_images(tmp_path / "i", 64)
    live = []
    peak = [0]
    lock = threading.Lock()

    def decode_fn(p):
        import numpy as np

        with lock:
            live.append(p)
            peak[0] = max(peak[0], len(live))
        return np.zeros((16, 16, 3), np.uint8)

    loader = PrefetchLoader(paths, size=16, batch_size=4, workers=2,
                            queue_depth=1, decode_fn=decode_fn)
    it = iter(loader)
    next(it)
    time.sleep(1.0)  # consumer stalls; producer must throttle
    # window = workers + 2*batch_size = 10 submitted-but-unconsumed decodes,
    # plus queue_depth+1 packed batches (4 each) the producer already drained
    assert peak[0] <= 2 + 2 * 4 + (1 + 1 + 1) * 4, peak[0]
    for _ in it:
        pass


def test_cmyk_jpeg_falls_back_to_pil(tmp_path):
    """The native decoder handles baseline RGB/gray JPEGs; a CMYK JPEG (which
    PIL — the reference path — decodes fine) must retry through PIL instead of
    being silently dropped from the corpus."""
    if not native_ingest.available():
        pytest.skip("native runtime unavailable")
    paths = make_images(tmp_path / "i", 3)
    cmyk = str(tmp_path / "i" / "cmyk.jpg")
    Image.new("CMYK", (32, 24), (10, 200, 30, 5)).save(cmyk)
    # native alone fails it...
    assert native_ingest.decode_resize(cmyk, 16) is None
    # ...but the loader indexes it via the PIL retry
    loader = PrefetchLoader([cmyk] + paths, size=16, batch_size=2, workers=2,
                            use_native=True)
    got = [p for b in loader for p in b.paths[: b.valid]]
    assert got == [cmyk] + paths
    assert loader.failed_count == 0
