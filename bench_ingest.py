"""Host-ingest scaling benchmark: how many CPU cores feed one TPU chip?

The device side tags ~144 img/s/chip (BENCH_r02); the reference never faced
this because its GPU ran at 2 img/s (README.md:37-43). This benchmark sizes
the host requirement (VERDICT r2 weak #4 / ROADMAP #5): synthetic JPEGs at
representative illustration resolutions are decoded through

  - the PIL loader (data/ingest.py's fallback path),
  - the native C++ pool (runtime/ingest.cpp), full decode,
  - the native pool with libjpeg DCT-domain scaled decode
    (scale_num/8 chosen so the long side stays >= the 448 target),

across a worker-count sweep. Prints ONE JSON line with img/s per config, the
per-core rate, and cores needed for 144 img/s; plus the scaled-vs-full pixel
delta (scaled decode changes pixels slightly — quantified, not assumed).

    python bench_ingest.py [--n 64] [--size 448] [--workers 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

DEVICE_RATE = 144.0  # img/s/chip, BENCH_r02

# representative illustration sizes (danbooru-style corpora: long side 1-2k)
RESOLUTIONS = [(1024, 1448), (1536, 2048), (868, 1228)]


def make_corpus(directory: str, n: int, ext: str = "jpg") -> list:
    """Synthetic JPEGs/PNGs with smooth structure (noise images decode
    unrealistically slowly — real illustrations are mostly smooth regions +
    edges)."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        w, h = RESOLUTIONS[i % len(RESOLUTIONS)]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([
            127 + 120 * np.sin(xx / (30 + 10 * (i % 5)) + i),
            127 + 120 * np.cos(yy / (40 + 5 * (i % 7))),
            127 + 120 * np.sin((xx + yy) / 60),
        ], axis=-1)
        img += rng.randn(h, w, 3) * 8  # mild texture
        path = os.path.join(directory, f"img_{i:04d}.{ext}")
        arr = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
        arr.save(path, **({"quality": 92} if ext == "jpg" else {}))
        paths.append(path)
    return paths


def bench_pil(paths, size: int) -> float:
    from anime_illust_image_searcher_tpu.data.ingest import load_rgb_square

    t0 = time.perf_counter()
    for p in paths:
        load_rgb_square(p, size)
    return len(paths) / (time.perf_counter() - t0)


def bench_native(paths, size: int, workers: int, scaled: bool) -> float:
    from anime_illust_image_searcher_tpu.data.native_ingest import (
        NativeBatchDecoder,
    )

    dec = NativeBatchDecoder(workers=workers)
    try:
        dec.decode_batch(paths[:4], size, scaled=scaled)  # warm (page cache etc.)
        t0 = time.perf_counter()
        _, ok = dec.decode_batch(paths, size, scaled=scaled)
        dt = time.perf_counter() - t0
        assert ok.all(), "native decode failures during bench"
        return len(paths) / dt
    finally:
        dec.close()


def scaled_delta(paths, size: int) -> dict:
    """Pixel delta of scaled vs full decode over a few images."""
    import numpy as np

    from anime_illust_image_searcher_tpu.data.native_ingest import decode_resize

    deltas = []
    for p in paths[: min(8, len(paths))]:
        full = decode_resize(p, size, scaled=False)
        fast = decode_resize(p, size, scaled=True)
        d = np.abs(full.astype(np.int16) - fast.astype(np.int16))
        deltas.append((float(d.mean()), float(d.max())))
    return {
        "mean_abs": round(float(sum(d[0] for d in deltas) / len(deltas)), 3),
        "max_abs": int(max(d[1] for d in deltas)),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--size", type=int, default=448)
    parser.add_argument("--workers", default="1,2,4,8")
    args = parser.parse_args()
    workers = [int(w) for w in args.workers.split(",")]

    from anime_illust_image_searcher_tpu.data import native_ingest

    directory = tempfile.mkdtemp(prefix="aiis_ingest_bench_")
    paths = make_corpus(directory, args.n)
    print(f"{args.n} synthetic JPEGs in {directory}")

    ncores = os.cpu_count() or 1
    result = {
        "metric": "ingest_throughput",
        "unit": "images/sec (host decode to %d^2)" % args.size,
        "host_cores": ncores,
        "device_rate_img_s": DEVICE_RATE,
        "pil_img_s": round(bench_pil(paths, args.size), 1),
        "native": {},
        "native_scaled": {},
        "vs_baseline": None,
    }
    if native_ingest.available():
        for w in workers:
            result["native"][str(w)] = round(
                bench_native(paths, args.size, w, scaled=False), 1)
            result["native_scaled"][str(w)] = round(
                bench_native(paths, args.size, w, scaled=True), 1)
        result["scaled_vs_full_pixel_delta"] = scaled_delta(paths, args.size)
        # PNG sizing (anime corpora are heavily PNG; no scaled-decode analog
        # exists — zlib inflate must run in full). Single worker: the sizing
        # number is per-core.
        png_paths = make_corpus(directory, max(8, args.n // 4), ext="png")
        result["native_png_img_s_per_core"] = round(
            bench_native(png_paths, args.size, 1, scaled=False), 1)
        # per-core rate from the smallest measured worker count (thread sweeps
        # saturate at the machine's core count; per-core is the sizing number)
        for key, label in (("native", "cores_needed_full"),
                           ("native_scaled", "cores_needed_scaled")):
            smallest = str(min(int(w) for w in result[key]))
            per_core = result[key][smallest] / int(smallest)
            result[label] = (round(DEVICE_RATE / per_core, 1)
                             if per_core > 0 else None)
    else:
        result["native_error"] = "native ingest runtime unavailable"
    scaled = result.get("native_scaled") or {}
    result["value"] = (scaled[str(min(int(w) for w in scaled))]
                       if scaled else result["pil_img_s"])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
