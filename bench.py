"""Headline benchmark: WD-EVA02-Large tagging throughput on one TPU chip.

Measures the full device-side tagging step (uint8 preprocess + ViT forward + sigmoid
+ MCut thresholds) at the flagship 448²/24-block/1024-d configuration with seeded
weights — weights don't change FLOPs, so throughput is representative.

Prints ONE JSON line:
  {"metric": "wd_vit_tagging_throughput", "value": N, "unit": "images/sec/chip",
   "vs_baseline": N / 2.0}
vs_baseline divides by the reference's GPU rate (~0.5 s/file ≈ 2 images/s on a GTX
1660 SUPER, README.md:37-43 — the stronger of its two published numbers; its CPU rate
is ≈0.59 images/s).
"""

from __future__ import annotations

import json
import time

REFERENCE_GPU_IMAGES_PER_SEC = 2.0  # reference README.md:37-43
BATCH = 128
WARMUP_STEPS = 2
MEASURE_STEPS = 8


def main() -> None:
    from anime_illust_image_searcher_tpu.utils.jax_setup import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anime_illust_image_searcher_tpu.models.eva02 import Eva02Config, init_params
    from anime_illust_image_searcher_tpu.models.tagger import (
        _category_thresholds, _predict_probs,
    )
    from anime_illust_image_searcher_tpu.models.weights import LabelSet

    cfg = Eva02Config()
    params = init_params(cfg, seed=0)
    labels = LabelSet.synthetic(cfg.num_classes)
    general = jnp.asarray(np.asarray(labels.general_index, np.int32))
    character = jnp.asarray(np.asarray(labels.character_index, np.int32))
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randint(0, 255, size=(BATCH, cfg.img_size, cfg.img_size, 3), dtype=np.uint8)
    )

    import os

    use_pallas = os.environ.get("AIIS_USE_PALLAS", "0") == "1"

    def step(images):
        probs = _predict_probs(params, images, mean, std, cfg, use_pallas)
        g, c = _category_thresholds(probs, general, character, 0.15)
        return probs, g, c

    for _ in range(WARMUP_STEPS):
        jax.block_until_ready(step(images))
        _ = [np.asarray(x) for x in step(images)]

    # Depth-1 pipeline, exactly like the tagging CLI: dispatch batch N, then sync
    # batch N-1 to host — device compute overlaps the D2H + host work.
    t0 = time.perf_counter()
    pending = None
    for _ in range(MEASURE_STEPS):
        out = step(images)
        if pending is not None:
            _ = [np.asarray(x) for x in pending]
        pending = out
    _ = [np.asarray(x) for x in pending]
    dt = (time.perf_counter() - t0) / MEASURE_STEPS
    images_per_sec = BATCH / dt

    # Secondary metric: end-to-end query latency on the 100k-doc index
    # (VERDICT r1 #4: the driver artifact must carry both numbers). Printed
    # BEFORE the headline line; failures here never hide the headline metric.
    query_line = None
    try:
        from bench_query import run_query_bench

        query = run_query_bench(directory="/tmp/aiis_bench_100k")
        query_line = json.dumps(query)
    except Exception as exc:  # pragma: no cover - defensive
        print(f"query bench failed: {exc!r}")
        query = None
    if query_line:
        print(query_line)

    # Tertiary metric: host-ingest rate (CPU-only, ~1 min) — how many decode
    # cores feed this chip (ARCHITECTURE §6 sizing).
    ingest = None
    try:
        import io
        from contextlib import redirect_stdout

        from bench_ingest import bench_native, make_corpus

        import tempfile

        with tempfile.TemporaryDirectory(prefix="aiis_bench_ingest_") as d, \
                redirect_stdout(io.StringIO()):
            paths = make_corpus(d, 24)
            ingest = {
                "native_img_s_per_core": round(
                    bench_native(paths, 448, 1, scaled=False), 1),
                "native_scaled_img_s_per_core": round(
                    bench_native(paths, 448, 1, scaled=True), 1),
            }
    except Exception as exc:  # pragma: no cover - defensive
        print(f"ingest bench failed: {exc!r}")

    headline = {
        "metric": "wd_vit_tagging_throughput",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REFERENCE_GPU_IMAGES_PER_SEC, 2),
    }
    if ingest is not None:
        headline["ingest_img_s_per_core"] = ingest["native_img_s_per_core"]
        headline["ingest_scaled_img_s_per_core"] = (
            ingest["native_scaled_img_s_per_core"])
    if query is not None:
        headline["query_latency_p50_ms_100k"] = query["value"]
        headline["query_device_ms_estimate_100k"] = query["device_ms_estimate"]
        # direct measurement (one serialized-scan dispatch / N), not a subtraction
        headline["query_device_ms_measured_100k"] = query.get(
            "device_query_ms_measured")
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
