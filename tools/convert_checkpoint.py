"""Convert a downloaded HF/timm tagger checkpoint into a ``--model-dir``.

Run on a machine WITH network access (this deployment environment has none):

    # 1. download (needs huggingface_hub)
    python -c "from huggingface_hub import snapshot_download; \
               print(snapshot_download('SmilingWolf/wd-eva02-large-tagger-v3'))"
    # 2. convert + validate
    python tools/convert_checkpoint.py --src <snapshot_dir> --dest ./wd-eva02-v3

The destination directory is what ``tagging.py --model-dir`` consumes:
    model.safetensors   (validated timm state dict, f32)
    selected_tags.csv   (copied verbatim)

Validation: config autodetection, full parameter-tree conversion with shape checks,
and a forward smoke test on zeros. Pair with tools/parity_harness.py for numerical
parity against the timm oracle.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys


def main(argv) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help="HF snapshot dir (model.safetensors + selected_tags.csv)")
    parser.add_argument("--dest", required=True, help="output model dir")
    parser.add_argument("--skip-forward-check", action="store_true")
    args = parser.parse_args(argv)

    src_model = os.path.join(args.src, "model.safetensors")
    src_tags = os.path.join(args.src, "selected_tags.csv")
    for p in (src_model, src_tags):
        if not os.path.exists(p):
            print(f"missing: {p}")
            return 1

    os.makedirs(args.dest, exist_ok=True)
    shutil.copy2(src_model, os.path.join(args.dest, "model.safetensors"))
    shutil.copy2(src_tags, os.path.join(args.dest, "selected_tags.csv"))

    from anime_illust_image_searcher_tpu.models.weights import load_tagger_checkpoint

    params, cfg, labels = load_tagger_checkpoint(args.dest)
    print(f"converted: {cfg.depth} blocks, dim {cfg.embed_dim}, img {cfg.img_size}, "
          f"{cfg.num_classes} classes, pool={cfg.global_pool}, "
          f"attn sub-LN={cfg.scale_attn_inner}")
    print(f"labels: {len(labels.general_index)} general, "
          f"{len(labels.character_index)} character, {len(labels.rating_index)} rating")

    if not args.skip_forward_check:
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        from anime_illust_image_searcher_tpu.models.eva02 import forward_logits

        run_cfg = dataclasses.replace(cfg, dtype=jnp.float32)
        x = np.zeros((1, cfg.img_size, cfg.img_size, 3), np.float32)
        logits = forward_logits(params, x, run_cfg, use_pallas=False)
        assert logits.shape == (1, cfg.num_classes)
        assert np.all(np.isfinite(np.asarray(logits)))
        print("forward smoke test OK")
    print(f"model dir ready: {args.dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
