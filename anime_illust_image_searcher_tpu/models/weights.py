"""Weight conversion (HF/timm checkpoint -> Flax params) and label loading.

The reference pulls ``SmilingWolf/wd-eva02-large-tagger-v3`` weights + labels from the
HF Hub at runtime (tagging.py:146-151). This environment has zero egress, so the
converter takes a *local* checkpoint directory:

    model_dir/
      model.safetensors     (timm state dict)
      selected_tags.csv     (tag_id,name,category — category 9=rating, 0=general, 4=character)

``convert_timm_eva02`` maps timm parameter names onto models/eva02.py's module tree
with hard shape checks, auto-detecting optional pieces (attention sub-LN, layer
scale, SwiGLU naming variants). Only split q/k/v projections are supported — the
layout every published EVA02 tagger checkpoint uses; a fused-qkv checkpoint is
rejected with a clear error rather than guessed at (timm has several fused-bias
variants and a wrong guess converts cleanly but scrambles attention). When no
checkpoint is given the
tagger falls back to seeded random weights + synthetic labels so the full pipeline
still runs end-to-end (format parity, benchmarks); a loud warning marks the output as
non-semantic.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .eva02 import Eva02Config


@dataclasses.dataclass
class LabelSet:
    names: List[str]
    rating_index: List[int]
    general_index: List[int]
    character_index: List[int]

    @staticmethod
    def from_csv(csv_path: str) -> "LabelSet":
        """Parse selected_tags.csv (columns name, category) like tagging.py:122-140."""
        import csv

        names: List[str] = []
        categories: List[int] = []
        with open(csv_path, "r", encoding="utf-8") as f:
            reader = csv.DictReader(f)
            for row in reader:
                names.append(row["name"])
                categories.append(int(row["category"]))
        cats = np.asarray(categories)
        return LabelSet(
            names=names,
            rating_index=list(np.where(cats == 9)[0]),
            general_index=list(np.where(cats == 0)[0]),
            character_index=list(np.where(cats == 4)[0]),
        )

    @staticmethod
    def synthetic(num_classes: int, seed: int = 0) -> "LabelSet":
        """Deterministic fake label set: 4 ratings, 80% general, rest character."""
        rng = np.random.RandomState(seed)
        n_rating = min(4, num_classes)
        n_general = int((num_classes - n_rating) * 0.8)
        n_character = num_classes - n_rating - n_general
        names = (
            [f"rating_{i}" for i in range(n_rating)]
            + [f"general_tag_{i}" for i in range(n_general)]
            + [f"character_{i}" for i in range(n_character)]
        )
        order = rng.permutation(num_classes)
        names = [names[i] for i in order]
        cats = np.concatenate([
            np.full(n_rating, 9), np.full(n_general, 0), np.full(n_character, 4)
        ])[order]
        return LabelSet(
            names=names,
            rating_index=list(np.where(cats == 9)[0]),
            general_index=list(np.where(cats == 0)[0]),
            character_index=list(np.where(cats == 4)[0]),
        )


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def load_timm_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    import safetensors.numpy

    path = os.path.join(model_dir, "model.safetensors")
    return dict(safetensors.numpy.load_file(path))


# Published timm EVA02 geometries (S/B/L all use head_dim 64). Head count is
# NOT stored in a timm state dict, and every q/k/v kernel is (D, D) regardless
# of head count — a wrong value passes all shape checks while the rope
# permutation and head splits silently scramble channels across heads. So the
# converter only accepts embed_dims whose head count it knows (or a caller-
# supplied base config carrying an explicit num_heads).
_EVA02_NUM_HEADS = {384: 6, 768: 12, 1024: 16}


def detect_config_from_state_dict(sd: Dict[str, np.ndarray],
                                  base: Optional[Eva02Config] = None) -> Eva02Config:
    """Infer depth/dims/options from checkpoint shapes."""
    base = base or Eva02Config()
    embed_dim = sd["cls_token"].shape[-1]
    if embed_dim == base.embed_dim:
        num_heads = base.num_heads  # caller's (or default) geometry
    elif embed_dim in _EVA02_NUM_HEADS:
        num_heads = _EVA02_NUM_HEADS[embed_dim]  # published geometry
    elif embed_dim % base.num_heads == 0:
        # non-published geometry: keep the base head count, but say so — if
        # it's wrong the converted model is numerically garbage yet passes
        # every shape check
        num_heads = base.num_heads
        print(f"weights: embed_dim={embed_dim} is not a published EVA02 size; "
              f"assuming num_heads={num_heads} from the base config — pass an "
              "explicit Eva02Config(num_heads=...) if that is wrong")
    else:
        raise ValueError(
            f"cannot infer num_heads for embed_dim={embed_dim}: pass a "
            "base Eva02Config with explicit num_heads (a wrong head count "
            "passes every shape check but scrambles attention heads)")
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    num_classes = sd["head.weight"].shape[0]
    patch_w = sd["patch_embed.proj.weight"]
    patch_size = patch_w.shape[-1]
    use_abs_pos_emb = "pos_embed" in sd
    if use_abs_pos_emb:
        num_patches = sd["pos_embed"].shape[1] - 1
        grid = int(round(num_patches ** 0.5))
        img_size = grid * patch_size
    else:
        # rope-only checkpoint (timm use_abs_pos_emb=False): the input size is
        # not recoverable from the weights; keep the base config's
        img_size = base.img_size
    mlp_key = "blocks.0.mlp.w1.weight" if "blocks.0.mlp.w1.weight" in sd else "blocks.0.mlp.fc1_g.weight"
    mlp_hidden = sd[mlp_key].shape[0]
    return dataclasses.replace(
        base,
        img_size=img_size,
        patch_size=patch_size,
        embed_dim=embed_dim,
        num_heads=num_heads,
        depth=depth,
        mlp_hidden_dim=mlp_hidden,
        num_classes=num_classes,
        use_abs_pos_emb=use_abs_pos_emb,
        scale_attn_inner="blocks.0.attn.norm.weight" in sd,
        use_layer_scale="blocks.0.gamma_1" in sd,
        # timm Eva: 'avg' pooling ships fc_norm weights; 'token' ships a final norm
        global_pool="avg" if "fc_norm.weight" in sd else "token",
    )


def convert_timm_eva02(sd: Dict[str, np.ndarray], cfg: Eva02Config) -> dict:
    """timm Eva state dict -> flax param tree for models.eva02.Eva02."""

    def ln(prefix: str) -> dict:
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def dense(prefix: str, bias: bool = True) -> dict:
        out = {"kernel": _t(sd[f"{prefix}.weight"])}
        if bias:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    p: dict = {}
    pw = sd["patch_embed.proj.weight"]  # (D, 3, P, P) -> (P, P, 3, D)
    p["patch_embed"] = {
        "kernel": np.ascontiguousarray(pw.transpose(2, 3, 1, 0)),
        "bias": sd["patch_embed.proj.bias"],
    }
    p["cls_token"] = sd["cls_token"]
    if "pos_embed" in sd:
        p["pos_embed"] = sd["pos_embed"]

    def mlp_names(i: int) -> Tuple[str, str, str, str]:
        if f"blocks.{i}.mlp.w1.weight" in sd:
            return (f"blocks.{i}.mlp.w1", f"blocks.{i}.mlp.w2",
                    f"blocks.{i}.mlp.norm", f"blocks.{i}.mlp.w3")
        return (f"blocks.{i}.mlp.fc1_g", f"blocks.{i}.mlp.fc1_x",
                f"blocks.{i}.mlp.norm", f"blocks.{i}.mlp.fc2")

    # The model's rope uses the half-split head-dim layout (rotate_half) instead
    # of timm's interleaved pairs — a per-head column permutation of the q/k
    # projections makes the two exactly equivalent (q·k is permutation-invariant;
    # see models/eva02.py rope notes). v/proj are untouched.
    def qk_permute(arr: np.ndarray) -> np.ndarray:
        if not cfg.use_rope:
            return arr
        from .eva02 import rope_half_permutation

        head_dim = cfg.embed_dim // cfg.num_heads
        perm = rope_half_permutation(head_dim)
        full = np.concatenate(
            [h * head_dim + perm for h in range(cfg.num_heads)])
        return np.ascontiguousarray(arr[..., full])

    if "blocks.0.attn.qkv.weight" in sd:
        raise ValueError(
            "fused-qkv Eva checkpoint: only split q_proj/k_proj/v_proj layouts "
            "are supported (all published EVA02 tagger checkpoints); convert "
            "the checkpoint to split projections first")

    for i in range(cfg.depth):
        blk: dict = {
            "norm1": ln(f"blocks.{i}.norm1"),
            "norm2": ln(f"blocks.{i}.norm2"),
        }
        q = dense(f"blocks.{i}.attn.q_proj")
        k = dense(f"blocks.{i}.attn.k_proj", bias=False)
        q = {"kernel": qk_permute(q["kernel"]), "bias": qk_permute(q["bias"])}
        k = {"kernel": qk_permute(k["kernel"])}
        attn: dict = {
            "q_proj": q,
            "k_proj": k,
            "v_proj": dense(f"blocks.{i}.attn.v_proj"),
            "proj": dense(f"blocks.{i}.attn.proj"),
        }
        if cfg.scale_attn_inner:
            attn["norm"] = ln(f"blocks.{i}.attn.norm")
        blk["attn"] = attn
        w1, w2, norm, w3 = mlp_names(i)
        blk["mlp"] = {
            "w1": dense(w1), "w2": dense(w2), "norm": ln(norm), "w3": dense(w3),
        }
        if cfg.use_layer_scale:
            blk["gamma_1"] = sd[f"blocks.{i}.gamma_1"]
            blk["gamma_2"] = sd[f"blocks.{i}.gamma_2"]
        p[f"blocks_{i}"] = blk

    if cfg.global_pool == "avg":
        p["fc_norm"] = ln("fc_norm")
    else:
        p["norm"] = ln("norm")
    p["head"] = dense("head")

    _validate_shapes(p, cfg)
    import jax

    return {"params": jax.tree.map(lambda a: np.asarray(a, dtype=np.float32), p)}


def _validate_shapes(p: dict, cfg: Eva02Config) -> None:
    d = cfg.embed_dim
    checks = [
        (p["patch_embed"]["kernel"].shape, (cfg.patch_size, cfg.patch_size, 3, d)),
        (p["cls_token"].shape, (1, 1, d)),
        (p["blocks_0"]["attn"]["q_proj"]["kernel"].shape, (d, d)),
        (p["blocks_0"]["mlp"]["w1"]["kernel"].shape, (d, cfg.mlp_hidden_dim)),
        (p["head"]["kernel"].shape, (d, cfg.num_classes)),
    ]
    if "pos_embed" in p:
        checks.append((p["pos_embed"].shape, (1, cfg.num_patches + 1, d)))
    for got, want in checks:
        if tuple(got) != tuple(want):
            raise ValueError(f"shape mismatch: got {got}, want {want}")


def load_tagger_checkpoint(
    model_dir: str, base: Optional[Eva02Config] = None,
) -> Tuple[dict, Eva02Config, LabelSet]:
    """Load params + config + labels from a local checkpoint directory.

    ``base``: optional config whose num_heads/img_size seed detection — needed
    for geometries outside the published EVA02 sizes (detection refuses to
    guess a head count; see detect_config_from_state_dict)."""
    sd = load_timm_state_dict(model_dir)
    cfg = detect_config_from_state_dict(sd, base=base)
    params = convert_timm_eva02(sd, cfg)
    labels_csv = os.path.join(model_dir, "selected_tags.csv")
    labels = LabelSet.from_csv(labels_csv)
    if len(labels.names) != cfg.num_classes:
        raise ValueError(
            f"label count {len(labels.names)} != head size {cfg.num_classes}"
        )
    return params, cfg, labels
