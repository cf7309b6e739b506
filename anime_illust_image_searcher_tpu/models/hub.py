"""Runtime model fetch from the HuggingFace Hub (networked deployments).

The reference self-bootstraps its weights at runtime (tagging.py:146-148 pulls
``SmilingWolf/wd-eva02-large-tagger-v3`` through timm; gen_cfeatures.py:112-118
pulls ``deepghs/ccip_onnx``). This framework's equivalent: ``--model-repo`` on
the tagging / gen_cfeatures CLIs resolves a repo id to a local model dir,
downloading (and for CCIP, converting) on first use.

Zero-egress environments fail fast with instructions for the offline path
(tools/convert_checkpoint.py / tools/convert_ccip.py on a networked machine,
then --model-dir).
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_TAGGER_REPO = "SmilingWolf/wd-eva02-large-tagger-v3"
DEFAULT_CCIP_REPO = "deepghs/ccip_onnx"
DEFAULT_CCIP_MODEL = "ccip-caformer-24-randaug-pruned"


def _cache_root() -> str:
    return os.environ.get(
        "AIIS_MODEL_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "aiis-tpu", "models"),
    )


def _offline_error(repo_id: str, tool: str, exc: Exception) -> RuntimeError:
    return RuntimeError(
        f"could not download {repo_id} from the HuggingFace Hub "
        f"({type(exc).__name__}: {exc}). In offline/zero-egress environments, "
        f"run {tool} on a networked machine and pass --model-dir instead."
    )


def fetch_tagger_repo(repo_id: str = DEFAULT_TAGGER_REPO,
                      cache_dir: Optional[str] = None) -> str:
    """Download the tagger checkpoint files; returns a --model-dir-compatible
    directory (model.safetensors + selected_tags.csv)."""
    dest = cache_dir or os.path.join(_cache_root(), repo_id.replace("/", "__"))
    needed = ("model.safetensors", "selected_tags.csv")
    if all(os.path.exists(os.path.join(dest, f)) for f in needed):
        return dest
    try:
        from huggingface_hub import snapshot_download

        snapshot_download(repo_id, local_dir=dest, allow_patterns=list(needed))
    except Exception as e:  # noqa: BLE001 — any hub/network failure
        raise _offline_error(repo_id, "tools/convert_checkpoint.py", e)
    missing = [f for f in needed if not os.path.exists(os.path.join(dest, f))]
    if missing:
        raise RuntimeError(f"{repo_id} snapshot is missing {missing}")
    return dest


def fetch_ccip_repo(repo_id: str = DEFAULT_CCIP_REPO,
                    model: str = DEFAULT_CCIP_MODEL,
                    cache_dir: Optional[str] = None) -> str:
    """Download the CCIP ONNX files and convert them into a CAFormer checkpoint
    dir (params.npz + config.json) consumable via --model-dir /
    AIIS_CCIP_MODEL_DIR."""
    dest = cache_dir or os.path.join(
        _cache_root(), f"{repo_id.replace('/', '__')}__{model}")
    if all(os.path.exists(os.path.join(dest, f))
           for f in ("params.npz", "config.json")):
        return dest
    import json
    import tempfile

    try:
        from huggingface_hub import hf_hub_download

        with tempfile.TemporaryDirectory() as tmp:
            feat = hf_hub_download(repo_id, f"{model}/model_feat.onnx",
                                   local_dir=tmp)
            try:
                metrics_json = hf_hub_download(repo_id, f"{model}/metrics.json",
                                               local_dir=tmp)
            except Exception:  # noqa: BLE001 — threshold is optional
                metrics_json = None
            threshold = None
            if metrics_json:
                # local parse failures are NOT download failures — don't let
                # them fall into the offline/zero-egress wrap below
                try:
                    with open(metrics_json, encoding="utf-8") as f:
                        m = json.load(f)
                    threshold = float(m.get("threshold",
                                            m.get("val_threshold", -1)))
                except (OSError, ValueError, TypeError) as e:
                    raise RuntimeError(
                        f"downloaded {repo_id} metrics.json is unreadable: {e}")
            from .ccip_weights import convert_feat_file, save_ccip_checkpoint

            cfg, params, report = convert_feat_file(feat)
            print(f"ccip conversion: {report.summary()}")
            save_ccip_checkpoint(dest, cfg, params, threshold)
    except RuntimeError:
        raise
    except Exception as e:  # noqa: BLE001
        raise _offline_error(repo_id, "tools/convert_ccip.py", e)
    return dest
