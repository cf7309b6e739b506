"""The WD tagger predictor: batched ViT forward + MCut thresholding + CSV assembly.

TPU-native rebuild of the reference ``Predictor`` (tagging.py:81-359). Differences by
design (SURVEY.md §7):
  - preprocessing (scale, normalize, RGB→BGR swap) is fused on device in the same jit
    as the forward, so the host only ships uint8 pixels over PCIe;
  - MCut runs vectorized on device for the whole batch × both tag categories;
  - per-image tag selection/ordering semantics match tagging.py:184-227 exactly
    (general: MCut threshold; character: max(0.15, MCut); sort desc; spaces→underscores;
    general tags then character tags, comma-joined).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TaggerConfig
from ..ops.mcut import mcut_threshold_batch
from .eva02 import Eva02, Eva02Config, init_params
from .weights import LabelSet, load_tagger_checkpoint


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def _predict_probs(
    params,
    images_u8: jax.Array,   # (B, S, S, 3) uint8, RGB, already resized
    mean: jax.Array,        # (3,)
    std: jax.Array,         # (3,)
    cfg: Eva02Config,
    use_pallas: bool = True,
) -> jax.Array:
    """Fused preprocess + forward + sigmoid. Returns (B, num_classes) f32."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    x = x[..., ::-1]  # RGB -> BGR channel swap (tagging.py:243)
    logits = Eva02(cfg, use_pallas=use_pallas).apply(params, x)
    return jax.nn.sigmoid(logits)


@partial(jax.jit, static_argnames=())
def _category_thresholds(
    probs: jax.Array,            # (B, C)
    general_gather: jax.Array,   # (G,) int32
    character_gather: jax.Array, # (K,) int32
    character_floor: float,
) -> Tuple[jax.Array, jax.Array]:
    def mcut_or_none(cat: jax.Array) -> jax.Array:
        # MCut needs >= 2 probabilities (it thresholds at the largest GAP).
        # A checkpoint with 0/1 tags in a category must still run with mcut
        # DISABLED (the reference only evaluates mcut when enabled); the
        # placeholder 1.0 selects nothing if such a category's mcut flag is
        # ever turned on. Shapes are static, so this branch is trace-time.
        if cat.shape[1] < 2:
            return jnp.ones((cat.shape[0],), jnp.float32)
        return mcut_threshold_batch(cat)

    g_thresh = mcut_or_none(probs[:, general_gather])
    c_thresh = jnp.maximum(character_floor,
                           mcut_or_none(probs[:, character_gather]))
    return g_thresh, c_thresh


def _is_compile_memory_error(exc: BaseException) -> bool:
    """A device compile that failed on MEMORY (not on a bad program). Seen in
    the wild: the axon relay's AOT compiler rejects the fresh B=256 EVA02
    program with 'Allocation (size=19478347776) would exceed memory' during
    buffer assignment (an XLA auto-remat regression — the same program
    compiled and ran in earlier sessions and still runs from the persistent
    cache). Matching on the message keeps genuine program bugs loud."""
    msg = str(exc)
    return ("would exceed memory" in msg
            or "RESOURCE_EXHAUSTED" in msg
            or "Resource exhausted" in msg
            or "Out of memory" in msg)


class TaggerPredictor:
    """Predictor facade: loads weights/labels once, then tags uint8 batches."""

    def __init__(
        self,
        config: TaggerConfig = TaggerConfig(),
        model_dir: Optional[str] = None,
        use_pallas: Optional[bool] = None,
        model_cfg: Optional[Eva02Config] = None,
        mesh=None,
    ) -> None:
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis — batches shard
        across chips and params replicate (pjit data parallelism, SURVEY.md §2.3).
        batch_size must divide by the data-axis size."""
        import os

        if use_pallas is None:
            # Measured on v5e (B=128, EVA02-L): XLA's fused attention beats the
            # Pallas kernel in-model (ARCHITECTURE.md §7 ablation: XLA is at the
            # Dh=64 MXU floor) — XLA is the production default. Opt in with
            # AIIS_USE_PALLAS=1.
            use_pallas = os.environ.get("AIIS_USE_PALLAS", "0") == "1"
        if os.environ.get("AIIS_INT8", "0") == "1" and config.quant == "none":
            import dataclasses

            config = dataclasses.replace(config, quant="int8")
        self.config = config
        # env fallback mirrors CCIP's AIIS_CCIP_MODEL_DIR: call sites without a
        # --model-dir flag (and the release checklist's real-weight test-suite
        # step) pick up converted weights from the environment
        self.model_dir = model_dir or os.environ.get("AIIS_MODEL_DIR") or None
        self.use_pallas = use_pallas
        self._model_cfg = model_cfg
        self.mesh = mesh
        self.params = None
        self.labels: Optional[LabelSet] = None
        # Set after a compile-memory failure: forward dispatches split into
        # chunks of this size (see _forward_probs_dev).
        self._max_device_batch: Optional[int] = None

    def load_model(self) -> None:
        if self.params is not None:
            return
        if self.model_dir:
            self.params, self.model_cfg, self.labels = load_tagger_checkpoint(
                self.model_dir, base=self._model_cfg)
            if self.config.quant != "none":
                import dataclasses

                # same param tree serves both paths (ops/quant.Int8Dense)
                self.model_cfg = dataclasses.replace(self.model_cfg,
                                                     quant=self.config.quant)
        else:
            if self._model_cfg is not None:
                self.model_cfg = self._model_cfg
                if self.config.quant != "none" and self.model_cfg.quant == "none":
                    import dataclasses

                    # an explicit model_cfg must not silently discard a quant
                    # request (config.quant / AIIS_INT8=1)
                    self.model_cfg = dataclasses.replace(
                        self.model_cfg, quant=self.config.quant)
            else:
                self.model_cfg = Eva02Config(
                    img_size=self.config.image_size,
                    dtype=jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32,
                    quant=self.config.quant,
                )
            print(
                "WARNING: no --model-dir given; using seeded RANDOM weights and "
                "synthetic labels. Output format is real, tag semantics are not."
            )
            self.params = init_params(self.model_cfg, seed=0, use_pallas=self.use_pallas)
            self.labels = LabelSet.synthetic(self.model_cfg.num_classes)
        self._finalize_load()

    def adopt_weights(self, other: "TaggerPredictor") -> None:
        """Share another predictor's loaded param tree and labels (e.g. the
        int8 A/B gate comparing two compute paths over ONE set of weights)
        without a second checkpoint read. The adopting predictor keeps its own
        model_cfg when one was passed explicitly (quant/dtype overrides)."""
        other.load_model()
        self.params = other.params
        self.labels = other.labels
        self.model_cfg = self._model_cfg or other.model_cfg
        if self.config.quant != "none" and self.model_cfg.quant == "none":
            import dataclasses

            # same invariant as load_model: a quant request (config.quant /
            # AIIS_INT8=1) must not be silently discarded by adoption
            self.model_cfg = dataclasses.replace(self.model_cfg,
                                                 quant=self.config.quant)
        self._finalize_load()

    def _finalize_load(self) -> None:
        if self.mesh is not None:
            # dp layout: params replicated across the mesh, batches row-sharded
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS, put_global

            if len(self.mesh.devices.flatten()) > len(jax.local_devices()):
                # Multi-host tagging is deliberately per-host (ARCHITECTURE §5:
                # embarrassingly parallel over directories); the dp batch path
                # device_puts host arrays and would fail obscurely on a
                # process-spanning mesh.
                raise ValueError(
                    "TaggerPredictor's data-parallel mesh must be single-host; "
                    "for multi-host tagging run the CLI per host on disjoint "
                    "directories and concatenate the tag files")

            replicated = NamedSharding(self.mesh, P())
            self.params = jax.tree.map(lambda a: put_global(a, replicated),
                                       self.params)
            self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        else:
            self._batch_sharding = None
        self._general_gather = jnp.asarray(np.asarray(self.labels.general_index, np.int32))
        self._character_gather = jnp.asarray(np.asarray(self.labels.character_index, np.int32))
        # mean/std 0.5 is the WD-v3 timm data config; overridable per checkpoint later.
        self._mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
        self._std = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
        self._general_names = [self.labels.names[i] for i in self.labels.general_index]
        self._character_names = [self.labels.names[i] for i in self.labels.character_index]
        # host-side gather indices, built once (finalize runs per batch on the
        # CSV-assembly path that overlaps device compute)
        self._general_idx_np = np.asarray(self.labels.general_index, np.int64)
        self._character_idx_np = np.asarray(self.labels.character_index, np.int64)

    # ------------------------------------------------------------------ predict

    def predict_probs(self, images_u8: np.ndarray) -> np.ndarray:
        self.load_model()
        return np.asarray(self._forward_probs_dev(jnp.asarray(images_u8)))

    def _forward_probs_dev(self, images_dev) -> jax.Array:
        """``_predict_probs`` with a one-time halved-batch fallback.

        If the device cannot COMPILE the configured batch width (compile-time
        memory rejection — see _is_compile_memory_error), the batch is split
        into half-width dispatches from then on; outputs concatenate lazily
        on device so callers and the depth-1 pipeline are unaffected. The
        fallback only engages for even batches >= 64 so tiny custom batches
        still surface real errors."""
        b = images_dev.shape[0]
        cap = self._max_device_batch
        if cap is None or b <= cap:
            try:
                return _predict_probs(
                    self.params, images_dev, self._mean, self._std,
                    self.model_cfg, self.use_pallas,
                )
            except Exception as exc:
                if b < 64 or b % 2 or not _is_compile_memory_error(exc):
                    raise
                self._max_device_batch = b // 2
                print(
                    f"WARNING: device rejected the B={b} program at compile "
                    f"time ({type(exc).__name__}); splitting into B={b // 2} "
                    "dispatches from here on")
        cap = self._max_device_batch
        parts = [self._forward_probs_dev(images_dev[i:i + cap])
                 for i in range(0, b, cap)]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    def predict_device(self, images_u8: np.ndarray):
        """Dispatch the device part (forward + thresholds) WITHOUT syncing — lets the
        CLI overlap host-side CSV assembly of batch N-1 with TPU compute of batch N
        (replaces the reference's decode/inference future overlap, tagging.py:304-330)."""
        self.load_model()
        if self._batch_sharding is not None:
            import jax

            images_dev = jax.device_put(np.asarray(images_u8), self._batch_sharding)
        else:
            images_dev = jnp.asarray(images_u8)
        probs_dev = self._forward_probs_dev(images_dev)
        g_thresh_dev, c_thresh_dev = _category_thresholds(
            probs_dev, self._general_gather, self._character_gather,
            self.config.character_thresh_floor,
        )
        return probs_dev, g_thresh_dev, c_thresh_dev

    def predict(
        self,
        images_u8: np.ndarray,
        general_thresh: float,
        general_mcut_enabled: bool,
        character_thresh: float,
        character_mcut_enabled: bool,
    ) -> List[str]:
        """Batch -> per-image comma-joined tag strings (tagging.py:156-229 semantics)."""
        return self.finalize(
            self.predict_device(images_u8),
            general_thresh, general_mcut_enabled,
            character_thresh, character_mcut_enabled,
        )

    def finalize(
        self,
        device_outputs,
        general_thresh: float,
        general_mcut_enabled: bool,
        character_thresh: float,
        character_mcut_enabled: bool,
    ) -> List[str]:
        probs_dev, g_thresh_dev, c_thresh_dev = device_outputs
        probs = np.asarray(probs_dev)
        g_mcut = np.asarray(g_thresh_dev)
        c_mcut = np.asarray(c_thresh_dev)

        general = probs[:, self._general_idx_np]
        character = probs[:, self._character_idx_np]

        ret_strings: List[str] = []
        for idx in range(probs.shape[0]):
            g_t = g_mcut[idx] if general_mcut_enabled else general_thresh
            c_t = c_mcut[idx] if character_mcut_enabled else character_thresh

            ret_strings.append(
                self._assemble_line(general[idx], g_t, character[idx], c_t)
            )
        return ret_strings

    @staticmethod
    def _select_sorted(names: List[str], probs: np.ndarray, thresh: float) -> List[str]:
        """Reference tag selection, byte-exact (tagging.py:194,203-226): tags above
        the threshold are dict-deduplicated BY NAME (last occurrence's prob wins, the
        first occurrence's position orders equal-prob ties via Python's stable sort),
        sorted by prob descending, spaces -> underscores.

        The f64 upcast is load-bearing: the reference compares ``astype(float)``
        probs against the f64 threshold (tagging.py:186,194), so an f32 prob of
        0.3 (0.30000001... in f64) PASSES a ``> 0.3`` test that it would fail in
        f32 arithmetic."""
        probs = probs.astype(np.float64)
        sel = np.where(probs > thresh)[0]
        res: dict = {}
        for i in sel:
            res[names[i]] = probs[i]
        ordered = sorted(res.items(), key=lambda x: x[1], reverse=True)
        return [name.replace(" ", "_") for name, _ in ordered]

    def _assemble_line(self, general: np.ndarray, g_t: float,
                       character: np.ndarray, c_t: float) -> str:
        ret = ",".join(self._select_sorted(self._general_names, general, g_t))
        c_parts = self._select_sorted(self._character_names, character, c_t)
        if c_parts:
            # The reference always prefixes the character block with a comma
            # (tagging.py:224) — with an empty general set the full file line
            # becomes ``path,,chartag`` (leading empty token). Kept byte-exact;
            # genmodel's reader keeps the empty token as a corpus "tag" exactly
            # like the reference does (QUIRKS.md #17).
            ret += "," + ",".join(c_parts)
        return ret
