"""Process-isolated decode pool (data/ingest_proc.py, VERDICT r4 #2).

The subprocess pool must be BIT-IDENTICAL to the in-process producers — same
decoder chain, same order, same skip semantics — because tags-wd-tagger.txt
bytes depend on it. These tests drain PrefetchLoader in both modes over the
same corpus (including corrupt and alpha images) and compare every batch.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from PIL import Image

from anime_illust_image_searcher_tpu.data.ingest import PrefetchLoader


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(11):
        p = tmp_path / f"img_{i:02d}.png"
        if i == 4:
            p.write_bytes(b"not an image at all")  # decode failure -> skipped
        elif i == 7:
            arr = rng.randint(0, 255, (40, 30, 4), np.uint8)
            Image.fromarray(arr, "RGBA").save(p)  # alpha flatten path
        else:
            arr = rng.randint(0, 255, (48 + i, 36, 3), np.uint8)
            Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def _drain(paths, batch_size=4, **kw):
    loader = PrefetchLoader(paths, size=32, batch_size=batch_size, workers=2,
                            **kw)
    batches = [(b.paths, b.valid, b.images.copy()) for b in loader]
    return batches, loader.failed_count


@pytest.mark.parametrize("use_native", [True, False])
def test_proc_pool_bit_identical_to_in_process(corpus, monkeypatch,
                                               use_native, capsys):
    monkeypatch.delenv("AIIS_DECODE_PROC", raising=False)
    base, base_failed = _drain(corpus, use_native=use_native)

    monkeypatch.setenv("AIIS_DECODE_PROC", "2")
    proc, proc_failed = _drain(corpus, use_native=use_native)

    assert proc_failed == base_failed == 1
    # the in-process python producer repacks across chunk boundaries while
    # the native/proc producers emit per-chunk batches — compare the flat
    # row streams (what the CLIs actually consume), which must be identical
    def flat(batches):
        rows, paths = [], []
        for p, valid, images in batches:
            paths += p
            rows += [images[i] for i in range(valid)]
        return paths, rows

    bp, br = flat(base)
    pp, pr = flat(proc)
    assert pp == bp
    assert len(pr) == len(br)
    for a, b in zip(br, pr):
        np.testing.assert_array_equal(a, b)


def test_proc_pool_chunk_layout_matches_native_producer(corpus, monkeypatch):
    """Batch boundaries (not just the row stream) must match the native
    producer's per-chunk layout — valid counts feed the progress meter."""
    monkeypatch.delenv("AIIS_DECODE_PROC", raising=False)
    base, _ = _drain(corpus, use_native=True)
    monkeypatch.setenv("AIIS_DECODE_PROC", "3")
    proc, _ = _drain(corpus, use_native=True)
    from anime_illust_image_searcher_tpu.data import native_ingest

    if not native_ingest.available():
        pytest.skip("native decoder unavailable; base is the repacking "
                    "python producer")
    assert [(p, v) for p, v, _ in base] == [(p, v) for p, v, _ in proc]
    for (_, _, a), (_, _, b) in zip(base, proc):
        np.testing.assert_array_equal(a, b)


def test_proc_pool_worker_env_is_scrubbed():
    from anime_illust_image_searcher_tpu.data.ingest_proc import _scrubbed_env

    os.environ.setdefault("PYTHONPATH", "")
    prev = os.environ["PYTHONPATH"]
    os.environ["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    try:
        env = _scrubbed_env()
        assert ".axon_site" not in env["PYTHONPATH"]
        assert "/root/repo" in env["PYTHONPATH"]
        assert env["JAX_PLATFORMS"] == "cpu"
    finally:
        os.environ["PYTHONPATH"] = prev


def test_proc_pool_worker_death_surfaces_as_error(tmp_path, monkeypatch):
    """A decode worker dying mid-run must raise through the loader (the
    producer forwards it to the consumer), never hang the iteration or
    silently truncate the stream."""
    import time

    from anime_illust_image_searcher_tpu.data.ingest_proc import (
        ProcessDecodePool,
    )

    rng = np.random.RandomState(2)
    paths = []
    for i in range(8):
        p = tmp_path / f"k_{i}.png"
        Image.fromarray(rng.randint(0, 255, (20, 20, 3), np.uint8)).save(p)
        paths.append(str(p))

    pool = ProcessDecodePool(1, batch_size=2, size=16, pad_to_square=True,
                             bilinear=False)
    try:
        it = pool.iter_chunks(paths)
        next(it)  # worker alive and delivering
        pool.procs[0].kill()
        pool.procs[0].wait(timeout=10)
        # must raise the worker-death RuntimeError — StopIteration here would
        # mean the stream silently truncated, which is exactly the failure
        # mode this path exists to prevent
        with pytest.raises(RuntimeError, match="decode worker died"):
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline:
                next(it)
    finally:
        pool.close()


def test_proc_pool_many_chunks_in_order(tmp_path, monkeypatch):
    """More chunks than workers/slots: results must come back in file order
    (out-of-order completions are re-ordered, slots recycled)."""
    rng = np.random.RandomState(1)
    paths = []
    for i in range(23):
        p = tmp_path / f"x_{i:02d}.jpg"
        Image.fromarray(rng.randint(0, 255, (30 + (i % 5), 40, 3),
                                    np.uint8)).save(p, quality=90)
        paths.append(str(p))
    monkeypatch.setenv("AIIS_DECODE_PROC", "2")
    batches, failed = _drain(paths, batch_size=2)
    assert failed == 0
    got = [p for b in batches for p in b[0]]
    assert got == paths