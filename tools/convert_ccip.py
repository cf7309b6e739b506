"""Convert the published CCIP ONNX models into a CAFormer/Flax checkpoint dir.

Run on a machine WITH network access (this deployment environment has none):

    # 1. download (needs huggingface_hub)
    python -c "from huggingface_hub import hf_hub_download as d; \
      [print(d('deepghs/ccip_onnx', 'ccip-caformer-24-randaug-pruned/' + f)) \
       for f in ('model_feat.onnx', 'model_metrics.onnx', 'metrics.json')]"
    # 2. convert + self-check (no onnx/onnxruntime needed — models/onnx_pb.py
    #    parses the protobuf directly)
    python tools/convert_ccip.py --feat model_feat.onnx \
        --metrics model_metrics.onnx --metrics-json metrics.json --dest ./ccip

The destination dir is what ``gen_cfeatures --model-dir`` (or
``AIIS_CCIP_MODEL_DIR`` for the webui character mode) consumes:
    params.npz config.json

Self-checks:
  - conversion audit (structurally recovered weights, zero-filled biases,
    unclaimed initializers) is printed — review before trusting
  - the converted Flax forward is compared against the ONNX graph executed by
    the pure-numpy interpreter (models/ccip_weights.execute_graph) on random
    inputs; an op outside the interpreter's subset aborts the check with its
    name (then verify with onnxruntime on the networked machine instead)
  - model_metrics.onnx is analyzed empirically against the 1-cosine hypothesis
    that ops/caformer.ccip_batch_differences_op implements
    (reference: gen_cfeatures.py:248-274)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main(argv) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--feat", required=True, help="model_feat.onnx")
    parser.add_argument("--metrics", default=None, help="model_metrics.onnx")
    parser.add_argument("--metrics-json", default=None, help="metrics.json (threshold)")
    parser.add_argument("--dest", required=True, help="output checkpoint dir")
    parser.add_argument("--skip-forward-check", action="store_true")
    args = parser.parse_args(argv)

    import numpy as np

    from anime_illust_image_searcher_tpu.models import onnx_pb
    from anime_illust_image_searcher_tpu.models.ccip_weights import (
        analyze_metric_graph, convert_feat_graph, execute_graph,
        save_ccip_checkpoint,
    )

    feat_graph = onnx_pb.load_model(args.feat).graph
    cfg, params, report = convert_feat_graph(feat_graph)
    print(f"config: depths={cfg.depths} dims={cfg.dims} heads={cfg.num_heads} "
          f"feature_dim={cfg.feature_dim} img={cfg.img_size}")
    print("audit:", report.summary())
    for line in report.structural:
        print("  structural:", line)
    for name in report.unclaimed:
        print("  UNCLAIMED:", name)

    if not args.skip_forward_check:
        import jax.numpy as jnp

        from anime_illust_image_searcher_tpu.models.caformer import CAFormer

        rng = np.random.RandomState(0)
        x = rng.rand(1, 3, cfg.img_size, cfg.img_size).astype(np.float32)
        try:
            ref = execute_graph(feat_graph, {feat_graph.inputs[0][0]: x})[0]
        except NotImplementedError as e:
            print(f"forward self-check skipped: {e}")
            print("verify with onnxruntime on this machine instead")
            ref = None
        except KeyError as e:
            # a structurally-convertible graph whose node program isn't a
            # complete executable dataflow (e.g. a hand-staged initializer
            # dump) — the conversion itself already succeeded above
            print(f"forward self-check skipped: graph is not executable by "
                  f"the numpy interpreter (dangling tensor {e})")
            print("verify with onnxruntime on this machine instead")
            ref = None
        if ref is not None:
            fcfg = dataclasses.replace(cfg, dtype=jnp.float32)
            got = np.asarray(CAFormer(fcfg, use_pallas=False).apply(
                params, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
            diff = float(np.max(np.abs(got - ref)))
            print(f"forward self-check: max |flax - onnx| = {diff:.2e}")
            if diff > 1e-2:
                print("FAILED: conversion does not reproduce the ONNX forward")
                return 1

    threshold = None
    if args.metrics_json:
        with open(args.metrics_json, encoding="utf-8") as f:
            metrics = json.load(f)
        threshold = float(metrics.get("threshold", metrics.get("val_threshold", -1)))
        print(f"threshold: {threshold}")

    ship_metrics = False
    if args.metrics:
        metric_graph = onnx_pb.load_model(args.metrics).graph
        try:
            verdict = analyze_metric_graph(metric_graph, cfg.feature_dim)
            # drop the carried jitted callable before any print/serialization
            verdict.pop("_converted_fn", None)
            print(f"metric analysis: {verdict}")
            if not verdict["is_one_minus_cosine"]:
                if verdict.get("convertible"):
                    # learned metric head: ship the graph with the checkpoint —
                    # CCIPPredictor converts it to a jitted JAX metric at load
                    # (models/ccip.py:_load_learned_metric)
                    ship_metrics = True
                    print("model_metrics.onnx is a learned metric; it will be "
                          "copied into the checkpoint and converted at load "
                          f"(converted_max_diff={verdict['converted_max_diff']:.2e})")
                else:
                    print("FAILED: model_metrics.onnx is neither 1-cosine nor "
                          f"convertible: {verdict.get('convert_error', verdict)}")
                    return 1
        except NotImplementedError as e:
            print(f"metric analysis inconclusive: {e}")
            print("WARNING: character mode will assume 1-cosine; verify with "
                  "onnxruntime on this machine")

    save_ccip_checkpoint(args.dest, cfg, params, threshold)
    if ship_metrics:
        import shutil

        shutil.copyfile(args.metrics,
                        __import__("os").path.join(args.dest,
                                                   "model_metrics.onnx"))
    print(f"saved checkpoint to {args.dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
