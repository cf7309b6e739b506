"""Stage a local directory shaped like the two HF repos the release fetches.

The real-weight day (tools/release_checklist.py) starts from two network
downloads this environment cannot make:

  SmilingWolf/wd-eva02-large-tagger-v3  -> model.safetensors + selected_tags.csv
  deepghs/ccip_onnx                     -> <model>/model_feat.onnx,
                                           model_metrics.onnx, metrics.json

This tool fabricates BOTH repo shapes offline — a tiny-but-PUBLISHED-geometry
EVA02 state dict (384-d/6-head so config autodetection runs exactly as it will
on the real checkpoint, with no base-config crutch) and a synthetic torch
CAFormer replica exported through the same export-style ONNX graph shape as
the published model (constant-folded ``onnx::MatMul_N`` initializers + Gemm
head; tests/test_ccip_convert fixtures) plus a 1-cosine metric graph and
metrics.json. `release_checklist.py --offline-rehearsal` then drives the whole
convert→validate→test chain against the staged repos (VERDICT r4 #5).

Usage:
    python tools/stage_synthetic_release.py --dest <dir>
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TAGGER_SUBDIR = "SmilingWolf__wd-eva02-large-tagger-v3"
CCIP_SUBDIR = os.path.join("deepghs__ccip_onnx",
                           "ccip-caformer-24-randaug-pruned")


def stage_tagger(dest: str, embed_dim: int = 384, depth: int = 2,
                 patch: int = 14, n_patches_side: int = 4,
                 num_classes: int = 12, seed: int = 7) -> str:
    """Synthetic timm EVA02 snapshot: SwiGLU blocks, rope-era keys, a published
    embed_dim (so ``detect_config_from_state_dict`` infers the head count the
    same way it will for the real 1024-d checkpoint) and a matching
    selected_tags.csv with rating/general/character rows."""
    import safetensors.numpy

    os.makedirs(dest, exist_ok=True)
    rng = np.random.RandomState(seed)
    d, ncls = embed_dim, num_classes
    hid = int(d * 8 / 3) // 8 * 8  # SwiGLU hidden, timm-style rounding
    n_tokens = n_patches_side ** 2 + 1
    sd = {
        "patch_embed.proj.weight": rng.randn(d, 3, patch, patch).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(d, np.float32),
        "cls_token": rng.randn(1, 1, d).astype(np.float32) * 0.02,
        "pos_embed": rng.randn(1, n_tokens, d).astype(np.float32) * 0.02,
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": np.zeros(d, np.float32),
        "head.weight": rng.randn(ncls, d).astype(np.float32) * 0.02,
        "head.bias": np.zeros(ncls, np.float32),
    }
    for i in range(depth):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm1.bias": np.zeros(d, np.float32),
            f"blocks.{i}.norm2.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm2.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.q_proj.weight": rng.randn(d, d).astype(np.float32) * 0.02,
            f"blocks.{i}.attn.q_proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.k_proj.weight": rng.randn(d, d).astype(np.float32) * 0.02,
            f"blocks.{i}.attn.v_proj.weight": rng.randn(d, d).astype(np.float32) * 0.02,
            f"blocks.{i}.attn.v_proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.attn.proj.weight": rng.randn(d, d).astype(np.float32) * 0.02,
            f"blocks.{i}.attn.proj.bias": np.zeros(d, np.float32),
            f"blocks.{i}.mlp.w1.weight": rng.randn(hid, d).astype(np.float32) * 0.02,
            f"blocks.{i}.mlp.w1.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.w2.weight": rng.randn(hid, d).astype(np.float32) * 0.02,
            f"blocks.{i}.mlp.w2.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.norm.weight": np.ones(hid, np.float32),
            f"blocks.{i}.mlp.norm.bias": np.zeros(hid, np.float32),
            f"blocks.{i}.mlp.w3.weight": rng.randn(d, hid).astype(np.float32) * 0.02,
            f"blocks.{i}.mlp.w3.bias": np.zeros(d, np.float32),
        })
    safetensors.numpy.save_file(sd, os.path.join(dest, "model.safetensors"))
    with open(os.path.join(dest, "selected_tags.csv"), "w", encoding="utf-8") as f:
        f.write("tag_id,name,category,count\n")
        f.write("1,general,9,10\n")  # rating row (category 9)
        for j in range(ncls - 3):
            f.write(f"{10 + j},gen_tag_{j},0,5\n")
        f.write("90,char_a,4,3\n")
        f.write("91,char_b,4,2\n")
    return dest


def stage_ccip(dest: str, seed: int = 3) -> str:
    """Synthetic ccip_onnx repo: the torch CAFormer replica exported through
    the export-style graph (the shape the real converter faces), a 1-cosine
    model_metrics.onnx (the published model's suspected metric; the analyzer
    must return is_one_minus_cosine and keep the fused ops), metrics.json."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    try:
        from test_ccip_convert import TCAFormer, _export_style_graph, _randomize
        from test_ccip_metric_convert import one_minus_cos_graph
    finally:
        sys.path.pop(0)
    from anime_illust_image_searcher_tpu.models import onnx_pb as opb

    os.makedirs(dest, exist_ok=True)
    m = TCAFormer().eval()
    _randomize(m, seed=seed)
    opb.save_model(opb.ModelP(graph=_export_style_graph(m)),
                   os.path.join(dest, "model_feat.onnx"))
    opb.save_model(opb.ModelP(graph=one_minus_cos_graph()),
                   os.path.join(dest, "model_metrics.onnx"))
    with open(os.path.join(dest, "metrics.json"), "w", encoding="utf-8") as f:
        json.dump({"threshold": 0.17847511429108218}, f)
    return dest


def stage(dest: str) -> dict:
    tagger = stage_tagger(os.path.join(dest, TAGGER_SUBDIR))
    ccip = stage_ccip(os.path.join(dest, CCIP_SUBDIR))
    return {"tagger": tagger, "ccip": ccip}


def main(argv) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dest", required=True)
    args = parser.parse_args(argv)
    paths = stage(args.dest)
    for k, v in paths.items():
        print(f"staged {k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
