"""Process-isolated decode pool: subprocess workers feeding shared memory.

Why (VERDICT r4 #2, ARCHITECTURE §6): with the TPU relay client loaded
IN-PROCESS, host decode drops from 57-66 to ~30 img/s/core — the relay
client's Python-side work serializes with the decode pool on the GIL even
though the native decoder releases it around C work. Moving decode into
subprocess workers removes the shared interpreter entirely: each worker is a
jax-free Python process (env scrubbed of the axon plugin, so importing the
ingest stack cannot drag a relay client in) that decodes whole batches into a
SharedMemory ring and reports per-row status over a newline-JSON pipe
protocol. Pixels never ride the pipe.

Semantics are IDENTICAL to the in-process producers: same decoder chain
(native batch decode -> PIL retry for declined rows -> genuine failures
skipped and counted), same chunking as PrefetchLoader._native_producer
(per-chunk batches, good rows compacted to the front, original order kept),
so tags-wd-tagger.txt bytes cannot change (pinned by
tests/test_ingest_proc.py). Opt-in via AIIS_DECODE_PROC=<n_workers>.

Protocol (one JSON object per line):
  parent -> worker, first line:  {"shm", "slot_bytes", "size", "pad",
                                  "bilinear", "threads", "use_native"}
  parent -> worker, per task:    {"slot": int, "chunk": int, "paths": [...]}
  worker -> parent, per task:    {"chunk": int, "slot": int, "ok": [...]}
Worker prints (decode-failure messages) go to stderr; stdout is protocol-only.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
from multiprocessing import shared_memory
from typing import Iterator, List, Sequence

import numpy as np

from ..utils.errors import format_error


def _scrubbed_env() -> dict:
    """Worker env: no axon site (its sitecustomize imports jax + the relay
    plugin at interpreter start — exactly the in-process cost this pool
    exists to escape), jax pinned to cpu if anything still imports it."""
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and ".axon_site" not in p]
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if repo not in parts:
        parts.insert(0, repo)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return env


def proc_workers_requested() -> int:
    """AIIS_DECODE_PROC=<n> opts into the subprocess pool (0/unset: off)."""
    try:
        return max(0, int(os.environ.get("AIIS_DECODE_PROC", "0")))
    except ValueError:
        return 0


class ProcessDecodePool:
    """P worker subprocesses decoding path-chunks into a SharedMemory ring.

    One outstanding task per worker; results are re-ordered to chunk order by
    the caller (`iter_chunks` handles both). Slots are freed when the caller
    signals consumption (`iter_chunks` copies out before yielding)."""

    def __init__(self, n_procs: int, batch_size: int, size: int,
                 pad_to_square: bool, bilinear: bool,
                 threads_per_proc: int = 2, use_native: bool = True) -> None:
        self.batch_size = batch_size
        self.size = size
        self.n_procs = max(1, n_procs)
        self.slot_bytes = batch_size * size * size * 3
        self.n_slots = 2 * self.n_procs + 2
        self.shm = shared_memory.SharedMemory(
            create=True, size=self.slot_bytes * self.n_slots)
        hello = json.dumps({
            "shm": self.shm.name, "slot_bytes": self.slot_bytes,
            "size": size, "batch": batch_size, "pad": pad_to_square,
            "bilinear": bilinear, "threads": threads_per_proc,
            "use_native": use_native,
        })
        env = _scrubbed_env()
        self.procs: List[subprocess.Popen] = []
        try:
            for _ in range(self.n_procs):
                p = subprocess.Popen(
                    [sys.executable, "-m",
                     "anime_illust_image_searcher_tpu.data.ingest_proc"],
                    stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                    env=env, text=True, bufsize=1)
                p.stdin.write(hello + "\n")
                p.stdin.flush()
                self.procs.append(p)
        except BaseException:
            self.close()
            raise
        self.failed_count = 0

    def slot_view(self, slot: int) -> np.ndarray:
        return np.ndarray((self.batch_size, self.size, self.size, 3),
                          np.uint8, buffer=self.shm.buf,
                          offset=slot * self.slot_bytes)

    def iter_chunks(self, file_list: Sequence[str]) -> Iterator[tuple]:
        """Yield (paths_of_good_rows, images (valid, S, S, 3) copy) per chunk,
        in file order. Failures are counted on self.failed_count."""
        chunks = [list(file_list[i:i + self.batch_size])
                  for i in range(0, len(file_list), self.batch_size)]
        free_slots = list(range(self.n_slots))
        results: dict = {}
        lock = threading.Lock()
        ready = threading.Condition(lock)
        reader_errors: List[BaseException] = []

        def reader(p: subprocess.Popen) -> None:
            try:
                for line in p.stdout:
                    msg = json.loads(line)
                    with ready:
                        results[msg["chunk"]] = msg
                        idle_workers.append(p)
                        ready.notify_all()
            except BaseException as e:  # noqa: BLE001 — surface to consumer
                with ready:
                    reader_errors.append(e)
                    ready.notify_all()

        idle_workers: List[subprocess.Popen] = []
        readers = [threading.Thread(target=reader, args=(p,), daemon=True)
                   for p in self.procs]
        for t in readers:
            t.start()

        def send(p: subprocess.Popen, chunk_id: int) -> None:
            slot = free_slots.pop()
            p.stdin.write(json.dumps({
                "slot": slot, "chunk": chunk_id,
                "paths": chunks[chunk_id]}) + "\n")
            p.stdin.flush()

        next_send = 0
        next_yield = 0
        with ready:
            for p in self.procs:
                if next_send < len(chunks):
                    send(p, next_send)
                    next_send += 1
        while next_yield < len(chunks):
            with ready:
                while next_yield not in results and not reader_errors:
                    # a worker death closes its stdout -> reader exits without
                    # delivering; detect instead of waiting forever
                    if any(p.poll() is not None for p in self.procs) \
                            and next_yield not in results:
                        dead = [p for p in self.procs if p.poll() is not None]
                        raise RuntimeError(
                            f"decode worker died (rc={dead[0].returncode})")
                    ready.wait(timeout=0.5)
                if reader_errors:
                    raise reader_errors[0]
                msg = results.pop(next_yield)
                while idle_workers and next_send < len(chunks):
                    send(idle_workers.pop(), next_send)
                    next_send += 1
            ok = np.asarray(msg["ok"], bool)
            slot = msg["slot"]
            good = int(ok.sum())
            self.failed_count += int((~ok).sum())
            paths = [p for p, o in zip(chunks[next_yield], ok) if o]
            images = self.slot_view(slot)[:good].copy()  # copy-out frees slot
            with ready:
                free_slots.append(slot)
            next_yield += 1
            if good:
                yield paths, images

    def close(self) -> None:
        for p in getattr(self, "procs", []):
            try:
                if p.stdin:
                    p.stdin.close()
            except OSError:
                pass
        for p in getattr(self, "procs", []):
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait(timeout=10)
        if getattr(self, "shm", None) is not None:
            self.shm.close()
            try:
                self.shm.unlink()
            except FileNotFoundError:
                pass  # already gone (e.g. a dying worker's tracker raced us)
            self.shm = None


# ---------------------------------------------------------------------------
# worker side (run as: python -m anime_illust_image_searcher_tpu.data.ingest_proc)
# ---------------------------------------------------------------------------


def _worker_main() -> int:
    import contextlib

    from PIL import Image

    # decode prints (skip messages) must not corrupt the stdout protocol
    proto_out = sys.stdout
    sys.stdout = sys.stderr

    hello = json.loads(sys.stdin.readline())
    shm = shared_memory.SharedMemory(name=hello["shm"])
    # CPython wart: attaching registers the segment with THIS process's
    # resource tracker, which unlinks it at worker exit — destroying the
    # parent's ring under the remaining workers. The parent owns the segment;
    # unregister our attachment.
    try:
        from multiprocessing import resource_tracker

        resource_tracker.unregister(shm._name, "shared_memory")
    except Exception:  # noqa: BLE001 — tracker internals vary by version
        pass
    size, batch = hello["size"], hello["batch"]
    resample = Image.BILINEAR if hello["bilinear"] else Image.BICUBIC

    from .ingest import load_rgb_square

    decoder = None
    if hello["use_native"]:
        from . import native_ingest

        if native_ingest.available():
            try:
                decoder = native_ingest.NativeBatchDecoder(hello["threads"])
            except Exception:  # noqa: BLE001 — PIL path below
                decoder = None

    try:
        for line in sys.stdin:
            task = json.loads(line)
            paths = task["paths"]
            slot = np.ndarray((batch, size, size, 3), np.uint8,
                              buffer=shm.buf,
                              offset=task["slot"] * hello["slot_bytes"])
            if decoder is not None:
                images, ok = decoder.decode_batch(
                    paths, size, pad_to_square=hello["pad"],
                    bilinear=hello["bilinear"])
                for i in np.where(~ok)[0]:
                    # native-declined rows retry through PIL — identical to
                    # PrefetchLoader._native_producer's fallback chain
                    arr = load_rgb_square(paths[i], size, resample=resample,
                                          pad_to_square=hello["pad"])
                    if arr is not None:
                        images[i] = arr
                        ok[i] = True
            else:
                images = np.zeros((len(paths), size, size, 3), np.uint8)
                ok = np.zeros(len(paths), bool)
                for i, p in enumerate(paths):
                    arr = load_rgb_square(p, size, resample=resample,
                                          pad_to_square=hello["pad"])
                    if arr is not None:
                        images[i] = arr
                        ok[i] = True
            good = np.where(ok)[0]
            slot[:len(good)] = images[good]
            proto_out.write(json.dumps(
                {"chunk": task["chunk"], "slot": task["slot"],
                 "ok": ok.tolist()}) + "\n")
            proto_out.flush()
    except BrokenPipeError:
        pass
    except Exception as e:  # noqa: BLE001 — parent sees worker death via rc
        print(format_error(e), file=sys.stderr)
        return 1
    finally:
        with contextlib.suppress(Exception):
            if decoder is not None:
                decoder.close()
        shm.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(_worker_main())
