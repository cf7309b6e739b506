"""ctypes binding for the native ingest runtime (runtime/ingest.cpp).

The native path fuses JPEG/PNG decode + alpha flatten + pad-to-square + antialiased
resize in a C++ thread pool, cutting Python out of the per-image hot loop. It is the
data-loader half of the TPU runtime (SURVEY.md §7: "at ≥100 images/s/chip, PIL decode
becomes the bottleneck the reference never faced").

Selection:
  - built automatically on first use if g++ and libjpeg/libpng are present
    (set AIIS_NATIVE_INGEST=0 to force the PIL path)
  - falls back silently to the PIL loader otherwise
  - full-decode output is BIT-IDENTICAL to the PIL loader (the C++ replicates
    Pillow's fixed-point Resample.c and paste-mask blend exactly, and both
    link the same libjpeg62/libpng16 families; pinned by
    tests/test_native_ingest.py), so either loader serves golden runs. Images
    the native path can't reproduce exactly (CMYK JPEG, 16-bit gray PNG) are
    declined per-image and decoded through PIL. Only the opt-in
    AIIS_SCALED_DECODE=1 DCT-domain path changes pixels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "runtime")
_SO_PATH = os.path.join(_RUNTIME_DIR, "libaiis_ingest.so")
# must match aiis_abi_version() in runtime/ingest.cpp
_ABI_VERSION = 2

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _materialize_runtime() -> None:
    """Zipapp support: when the package is imported from an archive (zipimport),
    the runtime sources are not on a real filesystem, so g++ cannot build the
    decode pool in place. Extract ingest.cpp + build.sh into a per-ABI user
    cache dir and repoint the build/load paths there. No-op for normal
    (directory) installs."""
    global _RUNTIME_DIR, _SO_PATH
    if os.path.isdir(_RUNTIME_DIR):
        return
    cache_root = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    try:
        import hashlib
        from importlib import resources

        pkg = resources.files("anime_illust_image_searcher_tpu.runtime")
        sources = {name: (pkg / name).read_bytes()
                   for name in ("ingest.cpp", "build.sh")}
        # Key the cache dir by source content, not just the ABI number: a new
        # archive shipping changed sources under the same ABI must extract and
        # build fresh, not keep executing last release's cached .so forever.
        digest = hashlib.sha256(b"\0".join(sources[n] for n in sorted(sources)))
        cache = os.path.join(cache_root, "aiis_runtime",
                             f"abi{_ABI_VERSION}-{digest.hexdigest()[:12]}")
        os.makedirs(cache, exist_ok=True)
        for name, data in sources.items():
            dst = os.path.join(cache, name)
            if not os.path.exists(dst):
                tmp = f"{dst}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.rename(tmp, dst)  # atomic vs concurrent extractors
    except Exception as e:  # noqa: BLE001
        print(f"native ingest: cannot materialize runtime sources: {e}")
        return
    _RUNTIME_DIR = cache
    _SO_PATH = os.path.join(cache, "libaiis_ingest.so")


def _build() -> bool:
    script = os.path.join(_RUNTIME_DIR, "build.sh")
    try:
        out = subprocess.run(["sh", script], capture_output=True, text=True, timeout=180)
        if out.returncode != 0:
            print(f"native ingest build failed:\n{out.stderr}")
            return False
        return True
    except Exception as e:  # noqa: BLE001
        print(f"native ingest build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("AIIS_NATIVE_INGEST", "1") == "0":
        _load_failed = True
        return None
    _materialize_runtime()
    src = os.path.join(_RUNTIME_DIR, "ingest.cpp")
    stale = (os.path.exists(_SO_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
    if stale:
        # source changed since the .so was linked (the ABI guard below only
        # catches signature changes, not behavior fixes) — rebuild; on failure
        # keep the old build rather than dropping to PIL
        _build()
    if not os.path.exists(_SO_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        print(f"native ingest load failed: {e}")
        _load_failed = True
        return None
    # ABI guard: a .so built before a C-ABI change must never be called with
    # the new signatures (stale builds survive checkouts; mtime is unreliable).
    # Missing symbol or version mismatch -> rebuild once, else disable.
    try:
        lib.aiis_abi_version.restype = ctypes.c_int
        so_abi = lib.aiis_abi_version()
    except AttributeError:
        so_abi = -1
    if so_abi != _ABI_VERSION:
        del lib
        if not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.aiis_abi_version.restype = ctypes.c_int
            so_abi = lib.aiis_abi_version()
        except (OSError, AttributeError):
            so_abi = -1
        if so_abi != _ABI_VERSION:
            print(f"native ingest ABI mismatch (want {_ABI_VERSION}, "
                  f"got {so_abi}) even after rebuild; using PIL path")
            _load_failed = True
            return None
    lib.aiis_decode_resize.restype = ctypes.c_int
    lib.aiis_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.aiis_pool_create.restype = ctypes.c_void_p
    lib.aiis_pool_create.argtypes = [ctypes.c_int]
    lib.aiis_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.aiis_pool_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def scaled_decode_default() -> bool:
    """libjpeg DCT-domain scaled decode (decode near the target size directly).
    Off by default: output pixels differ slightly from a full decode + resize,
    and the golden tagger fixtures pin the full-decode path. Enable with
    AIIS_SCALED_DECODE=1 for throughput (bench_ingest.py quantifies both)."""
    return os.environ.get("AIIS_SCALED_DECODE", "0") == "1"


def decode_resize(path: str, size: int, pad_to_square: bool = True,
                  bilinear: bool = False,
                  scaled: Optional[bool] = None) -> Optional[np.ndarray]:
    """Single-image native decode -> (size, size, 3) uint8 RGB, or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    if scaled is None:
        scaled = scaled_decode_default()
    out = np.empty((size, size, 3), dtype=np.uint8)
    ok = lib.aiis_decode_resize(
        path.encode(), size, int(pad_to_square), int(bilinear), int(scaled),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if ok else None


class NativeBatchDecoder:
    """Thread-pooled batch decoder. decode_batch returns (images, ok_mask)."""

    def __init__(self, workers: int = 8) -> None:
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ingest runtime unavailable")
        self._lib = lib
        self._pool = lib.aiis_pool_create(workers)

    def decode_batch(
        self, paths: Sequence[str], size: int,
        pad_to_square: bool = True, bilinear: bool = False,
        scaled: Optional[bool] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(paths)
        if scaled is None:
            scaled = scaled_decode_default()
        out = np.empty((n, size, size, 3), dtype=np.uint8)
        ok = np.zeros(n, dtype=np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        self._lib.aiis_pool_decode_batch(
            self._pool, arr, n, size, int(pad_to_square), int(bilinear),
            int(scaled),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out, ok.astype(bool)

    def close(self) -> None:
        if self._pool:
            self._lib.aiis_pool_destroy(self._pool)
            self._pool = None

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
