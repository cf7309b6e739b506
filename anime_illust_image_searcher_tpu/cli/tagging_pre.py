"""Tagging from precomputed arrays — the "offload tagging" variant.

The reference's workflow for weak local machines is: preprocess images locally into
tensor files, upload, and batch-tag them on a rented accelerator (colab_env/tagging.py,
README "Tips: when you can not prepare GPU machine"). This is that second stage,
reading ``.npy`` arrays produced by ``cli.utility.make_tensor_files``:

    python -m anime_illust_image_searcher_tpu.cli.tagging_pre --dir TENSOR_DIR [--model-dir M]

Parity notes: batch defaults large like the colab variant (BATCH_SIZE=200,
colab_env/tagging.py:48); output opens in 'w' mode — the colab variant truncates
instead of appending (colab_env/tagging.py:278, QUIRKS.md #2 contrast); output lines
carry the .npy path with the suffix stripped, matching the reference's convention that
tensor files mirror the original image paths.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import numpy as np

from ..config import DEFAULT_CONFIG, TaggerConfig
from ..data.ingest import PrefetchLoader
from ..models.tagger import TaggerPredictor
from ..utils.progress import ProgressMeter

DEFAULT_BATCH = 200  # colab_env/tagging.py:48


def list_npy_recursive(dir_path: str) -> List[str]:
    out: List[str] = []
    for root, _, files in os.walk(dir_path):
        for f in files:
            if f.endswith(".npy"):
                out.append(os.path.join(root, f))
    return out


def load_npy(size: int):
    def f(path: str) -> Optional[np.ndarray]:
        try:
            arr = np.load(path)
            if arr.shape != (size, size, 3) or arr.dtype != np.uint8:
                print(f"bad array {path}: {arr.shape} {arr.dtype}")
                return None
            return arr
        except Exception as e:  # noqa: BLE001
            print(f"{type(e)}: {e}")
            return None
    return f


def main(arg_str: List[str]) -> None:
    from ..utils.jax_setup import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", nargs=1, required=True, help="precomputed tensor directory")
    parser.add_argument("--model-dir", default=None, help="local converted checkpoint dir")
    parser.add_argument("--batch-size", type=int, default=DEFAULT_BATCH)
    args = parser.parse_args(arg_str)

    import dataclasses

    cfg: TaggerConfig = dataclasses.replace(
        DEFAULT_CONFIG.tagger, batch_size=args.batch_size
    )
    predictor = TaggerPredictor(config=cfg, model_dir=args.model_dir)
    predictor.load_model()

    file_list = list_npy_recursive(args.dir[0])
    print(f"{len(file_list)} files found")

    meter = ProgressMeter(cfg.progress_interval)
    loader = PrefetchLoader(
        file_list, size=cfg.image_size, batch_size=cfg.batch_size,
        workers=cfg.decode_workers, decode_fn=load_npy(cfg.image_size),
    )
    with open(cfg.output_file, "w", encoding="utf-8") as out:  # 'w': colab semantics
        for batch in loader:
            results = predictor.predict(
                batch.images,
                cfg.general_thresh, cfg.general_mcut_enabled,
                cfg.character_thresh, cfg.character_mcut_enabled,
            )
            for path, line in zip(batch.paths, results[: batch.valid]):
                out.write(path[: -len(".npy")] + "," + line + "\n")
            meter.add(batch.valid)
    meter.report(final=True)


if __name__ == "__main__":
    main(sys.argv[1:])
