"""On-chip attribution probe for CCIP/CAFormer bulk feature extraction.

Answers VERDICT r4 #1's attribution question — where the 384² CAFormer forward
spends its time (conv-mixer stages vs attention stages vs stem/head) — and
measures the candidate optimizations (batch width, pallas attention).

Methodology: prefix models. depths=(3,3,15,3) is the full flagship geometry;
truncating the depths tuple stage by stage (downsamples kept) and timing each
prefix on the chip attributes per-stage cost by subtraction. Interleaved A/B
within one process (CLAUDE.md: relay timing is only trustworthy interleaved),
fresh jit per variant (the cached-trace trap), np.asarray sync.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_caformer.py
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from anime_illust_image_searcher_tpu.models.caformer import (
    CAFormer, CAFormerConfig, init_params,
)
from anime_illust_image_searcher_tpu.utils.jax_setup import (
    enable_persistent_compile_cache,
)

BATCH = 64
REPS = 6


def time_forward(cfg: CAFormerConfig, batch: int, use_pallas: bool = False,
                 reps: int = REPS) -> float:
    """Seconds per batch for a fresh-jitted fused preprocess+forward."""
    params = init_params(cfg, seed=0, use_pallas=use_pallas)
    mean = jnp.asarray([0.48, 0.46, 0.41], jnp.float32)
    std = jnp.asarray([0.27, 0.26, 0.28], jnp.float32)

    model = CAFormer(cfg, use_pallas=use_pallas)

    @jax.jit
    def step(p, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        return model.apply(p, x)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(
        0, 255, (batch, cfg.img_size, cfg.img_size, 3), np.uint8))
    _ = np.asarray(step(params, images))  # compile
    _ = np.asarray(step(params, images))
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(step(params, images))
    return (time.perf_counter() - t0) / reps


def main() -> None:
    enable_persistent_compile_cache()
    full = CAFormerConfig()
    prefixes = {
        "stem+s0 (3 conv blocks @96²x64)": (3, 0, 0, 0),
        "+s1 (3 conv blocks @48²x128)": (3, 3, 0, 0),
        "+s2 (15 attn blocks @24²x320)": (3, 3, 15, 0),
        "full (+3 attn blocks @12²x512)": (3, 3, 15, 3),
    }
    times = {}
    for name, depths in prefixes.items():
        cfg = dataclasses.replace(full, depths=depths)
        dt = time_forward(cfg, BATCH)
        times[name] = dt
        print(f"{name:42s} {dt * 1e3:8.1f} ms/batch  "
              f"{BATCH / dt:7.1f} img/s")
    keys = list(prefixes)
    print("\nper-stage increments (ms/batch):")
    prev = 0.0
    for name in keys:
        inc = (times[name] - prev) * 1e3
        print(f"  {name:42s} +{inc:7.1f}")
        prev = times[name]

    print("\nbatch sweep (full model):")
    for b in (20, 64, 128, 256):
        try:
            dt = time_forward(full, b)
            print(f"  B={b:4d}  {dt * 1e3:8.1f} ms/batch  {b / dt:7.1f} img/s")
        except Exception as exc:  # noqa: BLE001 — e.g. compile-memory reject
            print(f"  B={b:4d}  FAILED: {exc!r}")

    print("\npallas attention A/B (full model, B=64):")
    dt_x = time_forward(full, BATCH, use_pallas=False)
    dt_p = time_forward(full, BATCH, use_pallas=True)
    print(f"  xla:    {dt_x * 1e3:8.1f} ms/batch  {BATCH / dt_x:7.1f} img/s")
    print(f"  pallas: {dt_p * 1e3:8.1f} ms/batch  {BATCH / dt_p:7.1f} img/s")


if __name__ == "__main__":
    main()
