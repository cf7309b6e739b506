"""Host-side image ingest: listing, date filtering, decode, and batching.

Reference behavior covered here:
  - recursive listing by case-sensitive extension suffix (tagging.py:91-98)
  - ``--after`` filtering by st_ctime *date* (tagging.py:266-274; the reference's help
    text says mtime, the code uses ctime — we keep the code's behavior, see QUIRKS.md)
  - RGBA/LA → white-background flatten + center pad-to-square on a white canvas
    (tagging.py:100-120)
  - threaded decode pipeline that keeps the accelerator fed (tagging.py:304-338),
    redesigned as a bounded-queue prefetcher with fixed-size batches so the jitted
    forward is compiled exactly once (static shapes) and the tail batch is padded, not
    dropped (the reference silently drops up to BATCH_SIZE-1 trailing files —
    tagging.py:309; fixed here, see QUIRKS.md).
"""

from __future__ import annotations

import concurrent.futures
import datetime
import os
import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..utils.errors import format_error

DEFAULT_EXTENSIONS: Tuple[str, ...] = (".png", ".jpg", ".jpeg", ".PNG", ".JPG", ".JPEG")


def list_files_recursive(dir_path: str, extensions: Sequence[str] = DEFAULT_EXTENSIONS) -> List[str]:
    """os.walk order, suffix-matched against the literal extension list
    (reference: tagging.py:91-98)."""
    file_list: List[str] = []
    for root, _, files in os.walk(dir_path):
        for file in files:
            file_path = os.path.join(root, file)
            if any(file_path.endswith(ext) for ext in extensions):
                file_list.append(file_path)
    return file_list


def filter_files_by_date(file_list: Sequence[str], added_date: datetime.date) -> List[str]:
    """Keep files whose st_ctime date >= added_date (reference: tagging.py:266-274)."""
    filtered: List[str] = []
    for file_path in file_list:
        stat = os.stat(file_path)
        ctime = datetime.date.fromtimestamp(stat.st_ctime)
        if ctime >= added_date:
            filtered.append(file_path)
    return filtered


def flatten_to_rgb(image: Image.Image) -> Image.Image:
    """Alpha → white-background composite, else plain RGB conversion. The one
    home of the flatten used by BOTH the tagger path (prepare_image) and the
    CCIP path (load_rgb_square's pad_to_square=False branch)."""
    if image.mode in ("RGBA", "LA"):
        background = Image.new("RGB", image.size, (255, 255, 255))
        background.paste(image, mask=image.split()[-1])
        return background
    return image.convert("RGB") if image.mode != "RGB" else image


def prepare_image(image: Image.Image) -> Image.Image:
    """Flatten alpha onto white and center-pad to square on a white canvas
    (reference: tagging.py:100-120)."""
    image = flatten_to_rgb(image)
    w, h = image.size
    max_dim = max(w, h)
    pad_left = (max_dim - w) // 2
    pad_top = (max_dim - h) // 2
    padded = Image.new("RGB", (max_dim, max_dim), (255, 255, 255))
    padded.paste(image, (pad_left, pad_top))
    return padded


def load_rgb_square(file_path: str, size: int, resample: int = Image.BICUBIC,
                    pad_to_square: bool = True) -> Optional[np.ndarray]:
    """Decode one image to an HWC uint8 array of shape (size, size, 3).

    ``pad_to_square=True`` gives the tagger path (pad then resize; the timm transform
    the reference resolves for the WD tagger is a square resize — tagging.py:154);
    ``False`` gives the CCIP path (direct bilinear resize — gen_cfeatures.py:104-110).
    Returns None on decode failure (per-image skip semantics, tagging.py:245-252).
    """
    img: Optional[Image.Image] = None
    try:
        img = Image.open(file_path)
        img.load()
        if pad_to_square:
            prepared = prepare_image(img)
        else:
            # CCIP path: flatten alpha onto white WITHOUT padding (the
            # reference's imgutils loader composites on white and resizes
            # directly, gen_cfeatures.py:285-295)
            prepared = flatten_to_rgb(img)
        resized = prepared.resize((size, size), resample=resample)
        return np.asarray(resized, dtype=np.uint8)
    except Exception as e:  # noqa: BLE001 — skip-and-continue is the contract
        if img is not None:
            img.close()
        print(format_error(e))
        return None


def decode_rgb_square(file_path: str, size: int, resample: int = Image.BICUBIC,
                      pad_to_square: bool = True) -> Optional[np.ndarray]:
    """``load_rgb_square`` through the native decoder when available — the
    single-image analog of PrefetchLoader's native path. Output is
    bit-identical to the PIL loader (tests/test_native_ingest.py) at ~1.7x
    the speed; images the native path declines (CMYK JPEG, 16-bit gray PNG)
    and genuine failures fall through to PIL, which keeps the per-image
    skip semantics."""
    if resample in (Image.BILINEAR, Image.BICUBIC):
        from . import native_ingest

        if native_ingest.available():
            arr = native_ingest.decode_resize(
                file_path, size, pad_to_square=pad_to_square,
                bilinear=resample == Image.BILINEAR)
            if arr is not None:
                return arr
    return load_rgb_square(file_path, size, resample=resample,
                           pad_to_square=pad_to_square)


@dataclass
class Batch:
    """A fixed-size host batch. ``valid`` marks real rows; the rest is padding."""

    images: np.ndarray        # (B, size, size, 3) uint8
    paths: List[str]          # len == valid
    valid: int


class PrefetchLoader:
    """Threaded decode → bounded queue of fixed-size uint8 batches.

    Replaces the reference's ThreadPoolExecutor/as_completed tangle
    (tagging.py:304-338) with a simple pipeline: N decoder threads pull file paths,
    a collector packs successful decodes into full batches, and the consumer (the
    jitted TPU forward) overlaps with decoding automatically. Failed decodes are
    skipped and counted, never crash the run.
    """

    def __init__(
        self,
        file_list: Sequence[str],
        size: int,
        batch_size: int,
        workers: int = 8,
        pad_to_square: bool = True,
        resample: int = Image.BICUBIC,
        decode_fn: Optional[Callable[[str], Optional[np.ndarray]]] = None,
        queue_depth: int = 4,
        use_native: Optional[bool] = None,
    ) -> None:
        self.file_list = list(file_list)
        self.size = size
        self.batch_size = batch_size
        # More threads than cores just adds contention; decode is CPU-bound.
        self.workers = max(1, min(workers, os.cpu_count() or workers))
        self.pad_to_square = pad_to_square
        self.resample = resample
        self.decode_fn = decode_fn or (
            lambda p: load_rgb_square(p, size, resample=resample, pad_to_square=pad_to_square)
        )
        self.queue_depth = queue_depth
        self.failed_count = 0
        # The C++ ingest runtime (runtime/ingest.cpp) handles the default PIL-shaped
        # decode path; custom decode_fn (e.g. .npy loading) stays in Python.
        self._default_decode = decode_fn is None
        if use_native is None:
            use_native = decode_fn is None
        self.use_native = bool(use_native) and decode_fn is None

    def report_failures(self) -> None:
        """One-line skip summary, shared by every CLI that drains a loader."""
        if self.failed_count:
            print(f"{self.failed_count} files failed to decode and were skipped")

    def _native_producer(self, put: Callable[[Batch], bool], decoder) -> None:
        bilinear = self.resample == Image.BILINEAR
        for start in range(0, len(self.file_list), self.batch_size):
            chunk = self.file_list[start : start + self.batch_size]
            images, ok = decoder.decode_batch(
                chunk, self.size, pad_to_square=self.pad_to_square, bilinear=bilinear
            )
            for i in np.where(~ok)[0]:
                # the native decoder handles baseline JPEG/PNG; anything it
                # can't (CMYK/YCCK JPEGs, progressive edge cases, odd formats)
                # retries through PIL like the reference path — only genuine
                # failures are skipped, so switching loaders never silently
                # drops corpus images the reference would index
                arr = self.decode_fn(chunk[i])
                if arr is not None:
                    images[i] = arr
                    ok[i] = True
            self.failed_count += int((~ok).sum())
            good = np.where(ok)[0]
            if len(good) == 0:
                continue
            paths = [chunk[i] for i in good]
            if len(good) == self.batch_size:
                batch = Batch(images, paths, self.batch_size)
            else:
                packed = np.zeros(
                    (self.batch_size, self.size, self.size, 3), dtype=np.uint8
                )
                packed[: len(good)] = images[good]
                batch = Batch(packed, paths, len(good))
            if not put(batch):
                return  # consumer gone

    def _proc_producer(self, put: Callable[[Batch], bool], pool) -> None:
        """Subprocess-pool producer (data/ingest_proc.py): decode runs in
        jax-free worker processes, so the relay client's GIL/CPU time in THIS
        process no longer serializes with it (ARCHITECTURE §6; opt-in via
        AIIS_DECODE_PROC). Batch semantics identical to _native_producer."""
        for paths, images in pool.iter_chunks(self.file_list):
            good = len(paths)
            packed = np.zeros(
                (self.batch_size, self.size, self.size, 3), dtype=np.uint8)
            packed[:good] = images
            if not put(Batch(packed, paths, good)):
                return  # consumer gone
        self.failed_count += pool.failed_count

    def _python_producer(self, put: Callable[[Batch], bool],
                         stop: threading.Event) -> None:
        from collections import deque

        images: List[np.ndarray] = []
        paths: List[str] = []
        # Bounded decode window: in-flight futures are capped so decoded
        # frames can't pile up unboundedly ahead of a slow consumer (the
        # queue only bounds PACKED batches; each pending future holds a full
        # decoded frame). Order stays deterministic (FIFO), and refilling
        # after each result keeps the pool busy with no window-boundary
        # bubble.
        window = self.workers + 2 * self.batch_size
        files = iter(self.file_list)
        inflight: "deque[Tuple[str, concurrent.futures.Future]]" = deque()
        with concurrent.futures.ThreadPoolExecutor(max_workers=self.workers) as ex:
            def refill() -> None:
                while len(inflight) < window:
                    try:
                        p = next(files)
                    except StopIteration:
                        return
                    inflight.append((p, ex.submit(self.decode_fn, p)))

            try:
                refill()
                while inflight:
                    if stop.is_set():
                        return
                    path, fut = inflight.popleft()
                    arr = fut.result()
                    refill()
                    if arr is None:
                        self.failed_count += 1
                        continue
                    images.append(arr)
                    paths.append(path)
                    if len(images) == self.batch_size:
                        if not put(Batch(np.stack(images), paths, len(paths))):
                            return  # consumer gone
                        images, paths = [], []
                if images:
                    # Pad the tail batch to the fixed shape: one compiled program.
                    valid = len(images)
                    pad = self.batch_size - valid
                    tail = np.stack(images + [np.zeros_like(images[0])] * pad)
                    put(Batch(tail, paths, valid))
            finally:
                for _, fut in inflight:
                    fut.cancel()  # don't decode the window's tail after a stop

    def __iter__(self) -> Iterator[Batch]:
        out_q: "queue.Queue[object]" = queue.Queue(maxsize=self.queue_depth)
        stop = threading.Event()

        pool = None
        if self._default_decode:
            from .ingest_proc import ProcessDecodePool, proc_workers_requested

            n_procs = proc_workers_requested()
            if n_procs and self.resample in (Image.BILINEAR, Image.BICUBIC):
                pool = ProcessDecodePool(
                    n_procs, self.batch_size, self.size,
                    pad_to_square=self.pad_to_square,
                    bilinear=self.resample == Image.BILINEAR,
                    threads_per_proc=max(1, self.workers // n_procs),
                    use_native=self.use_native)

        decoder = None
        if self.use_native and pool is None:
            from . import native_ingest

            if native_ingest.available():
                try:
                    decoder = native_ingest.NativeBatchDecoder(self.workers)
                except Exception:  # noqa: BLE001 — fall back to PIL
                    decoder = None

        def put(item: object) -> bool:
            """Enqueue unless the consumer is gone; never block forever."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                if pool is not None:
                    self._proc_producer(put, pool)
                elif decoder is not None:
                    self._native_producer(put, decoder)
                else:
                    self._python_producer(put, stop)
            except BaseException as e:  # noqa: BLE001
                # surface the failure to the consumer — a swallowed producer
                # crash would end the stream early and the run would report
                # success over silently truncated output
                put(e)
            else:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Orderly teardown even when the CONSUMER dies mid-iteration: tell
            # the producer to stop, wait for any in-flight decode_batch call to
            # return, and only then destroy the native pool — closing it under
            # an in-flight ctypes call would free the pool out from under it.
            stop.set()
            t.join()
            if decoder is not None:
                decoder.close()
            if pool is not None:
                pool.close()


def iter_fixed_batches(arrays: Iterable[np.ndarray], batch_size: int) -> Iterator[Tuple[np.ndarray, int]]:
    """Pack an iterable of same-shape arrays into padded fixed-size batches."""
    buf: List[np.ndarray] = []
    for a in arrays:
        buf.append(a)
        if len(buf) == batch_size:
            yield np.stack(buf), batch_size
            buf = []
    if buf:
        valid = len(buf)
        buf = buf + [np.zeros_like(buf[0])] * (batch_size - valid)
        yield np.stack(buf), valid
