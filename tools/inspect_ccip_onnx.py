"""Dump the structure of the CCIP ONNX models (deepghs/ccip_onnx) to plan the
weight mapping onto models/caformer.py.

This environment has no network access and no onnx package, so the conversion cannot
be built blind; run this where both exist:

    pip install onnx huggingface_hub
    python -c "from huggingface_hub import hf_hub_download; \
      print(hf_hub_download('deepghs/ccip_onnx', 'ccip-caformer-24-randaug-pruned/model_feat.onnx'))"
    python tools/inspect_ccip_onnx.py --onnx <path>

It prints every initializer (name, shape) and the node op histogram — enough to write
the name→param-tree mapping in models/weights.py style. Until then, CCIP runs with
seeded weights (index/rerank semantics fully functional; see PARITY.md #12/#13).
"""

from __future__ import annotations

import argparse
import collections
import sys


def main(argv) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--onnx", required=True)
    args = parser.parse_args(argv)

    try:
        import onnx
    except ImportError:
        print("SKIP: the onnx package is not installed in this environment.")
        return 0

    model = onnx.load(args.onnx)
    graph = model.graph
    print(f"inputs:  {[(i.name,) for i in graph.input]}")
    print(f"outputs: {[(o.name,) for o in graph.output]}")
    ops = collections.Counter(n.op_type for n in graph.node)
    print("op histogram:", dict(ops.most_common()))
    print(f"{len(graph.initializer)} initializers:")
    for init in graph.initializer:
        print(f"  {init.name}  {list(init.dims)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
