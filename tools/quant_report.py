"""int8 vs bf16 accuracy-delta report for the tagger (gate for AIIS_INT8).

    python tools/quant_report.py [--model-dir DIR] [--dir IMAGES] [--batch 32]

Runs the SAME weights through both MXU paths and reports, over the batch:
  - logit / probability delta distribution (max, p99, mean)
  - MCut tag-set flip rate: fraction of images whose general/character tag set
    differs between paths (the user-visible metric — thresholds sit on a prob
    cliff, tagging.py:61-66 semantics)

With --model-dir absent it uses seeded random weights: the numbers then
characterize the arithmetic, not the real model — run against the converted
checkpoint before enabling int8 in production (VERDICT r1 #3 gate).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def main(argv) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", default=None)
    parser.add_argument("--dir", default=None, help="image directory (default: random pixels)")
    parser.add_argument("--batch", type=int, default=32)
    args = parser.parse_args(argv)

    from anime_illust_image_searcher_tpu.utils.jax_setup import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    import numpy as np

    from anime_illust_image_searcher_tpu.config import TaggerConfig
    from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor

    pred_f = TaggerPredictor(config=TaggerConfig(quant="none"),
                             model_dir=args.model_dir, use_pallas=False)
    pred_f.load_model()
    cfg = pred_f.model_cfg
    pred_q = TaggerPredictor(config=TaggerConfig(quant="int8"),
                             model_dir=args.model_dir, use_pallas=False,
                             model_cfg=dataclasses.replace(cfg, quant="int8"))
    # identical param tree serves both paths; share the weights exactly
    # (no second full checkpoint read / transient second param tree)
    pred_q.adopt_weights(pred_f)

    if args.dir:
        from anime_illust_image_searcher_tpu.data.ingest import (
            list_files_recursive, load_rgb_square,
        )

        files = list_files_recursive(args.dir)[: args.batch]
        imgs = np.stack([load_rgb_square(f, cfg.img_size) for f in files])
        print(f"{len(imgs)} images from {args.dir}")
    else:
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (args.batch, cfg.img_size, cfg.img_size, 3),
                           dtype=np.uint8)
        print(f"{args.batch} random-pixel images "
              "(arithmetic characterization only)")

    th = (TaggerConfig().general_thresh, TaggerConfig().general_mcut_enabled,
          TaggerConfig().character_thresh, TaggerConfig().character_mcut_enabled)
    out_f = pred_f.predict_device(imgs)
    out_q = pred_q.predict_device(imgs)
    tags_f = pred_f.finalize(out_f, *th)
    tags_q = pred_q.finalize(out_q, *th)

    p_f, p_q = np.asarray(out_f[0]), np.asarray(out_q[0])
    d = np.abs(p_f - p_q)
    print(f"prob delta: max={d.max():.4g} p99={np.percentile(d, 99):.4g} "
          f"mean={d.mean():.4g}")

    flips = sum(1 for a, b in zip(tags_f, tags_q) if a != b)
    print(f"tag-set flips: {flips}/{len(tags_f)} images "
          f"({100.0 * flips / max(len(tags_f), 1):.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
