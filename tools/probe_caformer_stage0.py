"""Piece-time CAFormer stage-0 ops standalone (ARCHITECTURE methodology: op
timing standalone beats subtractive in-model ablation). Each op runs inside a
10-step lax.scan so one dispatch amortizes the ~34 ms relay RTT.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_caformer_stage0.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from anime_illust_image_searcher_tpu.utils.jax_setup import (
    enable_persistent_compile_cache,
)

B = 64
REPS_IN_SCAN = 10
TIMED = 4


def timed_scan(fn, *args) -> float:
    """ms per single application, via a 10-step scan in one dispatch."""

    @jax.jit
    def run(*a):
        def step(carry, _):
            out = fn(*a)
            # fold a scalar of the output back so the loop can't be DCE'd
            return carry + jnp.sum(out[..., :1]).astype(jnp.float32), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS_IN_SCAN)
        return acc

    _ = np.asarray(run(*args))  # compile
    walls = []
    for _ in range(TIMED):
        t0 = time.perf_counter()
        _ = np.asarray(run(*args))
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls)) / REPS_IN_SCAN * 1e3


def main() -> None:
    enable_persistent_compile_cache()
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    x64 = jnp.asarray(rng.randn(B, 96, 96, 64).astype(np.float32), dt)
    x128 = jnp.asarray(rng.randn(B, 96, 96, 128).astype(np.float32), dt)
    img = jnp.asarray(rng.randn(B, 384, 384, 3).astype(np.float32), dt)
    w_stem = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.02, dt)
    w_pw1 = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.1, dt)
    w_pw2 = jnp.asarray(rng.randn(128, 64).astype(np.float32) * 0.1, dt)
    w_dw = jnp.asarray(rng.randn(7, 7, 1, 128).astype(np.float32) * 0.1, dt)
    w_mlp1 = jnp.asarray(rng.randn(64, 256).astype(np.float32) * 0.1, dt)
    w_mlp2 = jnp.asarray(rng.randn(256, 64).astype(np.float32) * 0.1, dt)

    def stem(img):
        return jax.lax.conv_general_dilated(
            img, w_stem, (4, 4), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dw(x):
        return jax.lax.conv_general_dilated(
            x, w_dw, (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=128)

    def pw1(x):
        return jnp.dot(x, w_pw1)

    def pw2(x):
        return jnp.dot(x, w_pw2)

    def mlp(x):
        return jnp.dot(jnp.dot(x, w_mlp1), w_mlp2)

    def ln(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        d = xf - mu
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        return (d / jnp.sqrt(var + 1e-6)).astype(x.dtype)

    print(f"stem conv 7x7s4 (B={B})  {timed_scan(stem, img):7.2f} ms")
    print(f"dw conv 7x7 @96²x128     {timed_scan(dw, x128):7.2f} ms")
    print(f"pw1 64->128 @96²         {timed_scan(pw1, x64):7.2f} ms")
    print(f"pw2 128->64 @96²         {timed_scan(pw2, x128):7.2f} ms")
    print(f"mlp 64->256->64 @96²     {timed_scan(mlp, x64):7.2f} ms")
    print(f"layernorm f32 @96²x64    {timed_scan(ln, x64):7.2f} ms")
    # stage-0 totals: 3 blocks x (ln + dw-mixer(pw1+dw+pw2) + ln + mlp) + stem


if __name__ == "__main__":
    main()
