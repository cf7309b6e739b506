"""CCIP predictor facade: feature extraction, thresholds, pairwise metrics.

Mirrors the reference's ``Predictor`` surface (gen_cfeatures.py:68-335) so downstream
code (index build CLI, webui character reranker) keeps the same call shapes:
``ccip_batch_extract_features``, ``ccip_extract_feature``, ``ccip_difference``,
``ccip_batch_differences``, ``ccip_default_threshold``, ``get_image_feature``.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..config import CCIPConfig
from ..data.ingest import load_rgb_square
from .caformer import (
    CAFormerConfig, ccip_batch_differences_op, ccip_differences_vs_index_op,
    ccip_mean_feature_from_rows_op, ccip_rerank_diffs_from_rows_op,
    ccip_rerank_diffs_op, extract_features, init_params,
)

FeatureOrImage = Union[np.ndarray, str]


class CCIPPredictor:
    def __init__(
        self,
        config: CCIPConfig = CCIPConfig(),
        model_cfg: Optional[CAFormerConfig] = None,
        use_pallas: Optional[bool] = None,
        seed: int = 0,
        model_dir: Optional[str] = None,
        mesh=None,
    ) -> None:
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis — feature
        batches shard across chips, params replicate (same dp layout as the
        tagger; SURVEY.md §2.3)."""
        import os

        if use_pallas is None:
            # Same default rationale as TaggerPredictor: measured XLA > Pallas here.
            use_pallas = os.environ.get("AIIS_USE_PALLAS", "0") == "1"
        # converted real weights (tools/convert_ccip.py); env var reaches call
        # sites that don't take CLI flags (the webui character reranker)
        self.model_dir = model_dir or os.environ.get("AIIS_CCIP_MODEL_DIR") or None
        self.config = config
        self.model_cfg = model_cfg or (
            None if self.model_dir else CAFormerConfig(
                img_size=config.image_size, feature_dim=config.feature_dim,
            )
        )
        self.use_pallas = use_pallas
        self.seed = seed
        self.mesh = mesh
        self._batch_sharding = None
        self.params = None
        # Working threshold, mutable like the reference Predictor's attribute
        # (get_image_feature's lazy default/1.5 write, gen_cfeatures.py:299).
        self.threshold: float = -1.0
        # The checkpoint's own metrics.json threshold — the DEFAULT the
        # reference re-reads each time. Kept separate so the lazy /1.5 write
        # to self.threshold can't contaminate ccip_default_threshold() (which
        # would compound to default/2.25 in the reranker).
        self._checkpoint_threshold: Optional[float] = None
        self._mean = jnp.asarray(config.mean, jnp.float32)
        self._std = jnp.asarray(config.std, jnp.float32)
        # learned-metric path (VERDICT r2 #3): set lazily when the checkpoint
        # dir carries a model_metrics.onnx that is NOT 1-cosine
        self._metric_fn = None
        self._metric_vs_index = None
        self._metric_checked = False

    def _ensure_metric(self) -> None:
        """Metric-only load: pure-feature metric calls must not force a full
        (possibly random-weight) encoder init just to pick the metric fn."""
        if self._metric_checked:
            return
        self._metric_checked = True
        if self.model_dir:
            self._load_learned_metric()

    def _load_learned_metric(self) -> None:
        """If the checkpoint dir ships ``model_metrics.onnx`` (tools/convert_ccip
        copies it there when the published metric is NOT 1-cosine), convert it
        into jitted metric functions; 1-cosine graphs keep the fused matmul ops
        (reference: gen_cfeatures.py:124-130,248-274)."""
        import os

        path = os.path.join(self.model_dir, "model_metrics.onnx")
        if not os.path.exists(path):
            return
        import jax

        from .ccip_weights import analyze_metric_graph, metric_vs_index_fn
        from .onnx_pb import load_model as load_onnx

        graph = load_onnx(path).graph
        # probe with the CHECKPOINT's feature dim, not the CCIPConfig default —
        # the checkpoint is authoritative (config.json carries it even before
        # load_model builds model_cfg)
        feature_dim = self.config.feature_dim
        if self.model_cfg is not None:
            feature_dim = self.model_cfg.feature_dim
        else:
            import json

            cfg_path = os.path.join(self.model_dir, "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path, encoding="utf-8") as f:
                    feature_dim = json.load(f).get("feature_dim", feature_dim)
        try:
            verdict = analyze_metric_graph(graph, feature_dim)
        except Exception as e:  # noqa: BLE001 — a weird metric graph must not
            # brick feature extraction; the fused 1-cos ops keep working
            print(
                "WARNING: model_metrics.onnx analysis failed; falling back to "
                f"the fused 1-cosine metric. {type(e).__name__}: {e}"
            )
            return
        if verdict["is_one_minus_cosine"]:
            return  # the fused 1-cos ops are exact; keep the one-dispatch paths
        jitted = verdict.pop("_converted_fn", None)
        if not verdict.get("pairwise", False):
            # the batched ops (and metric_vs_index_fn's [0,1]-cell read) assume
            # a pairwise (N, N) metric matrix; any other output layout would be
            # silently misread — keep the fused 1-cos paths instead
            jitted = None
        if not verdict.get("convertible", False) or jitted is None:
            # A hand-placed metric file outside the converter's subset must not
            # brick feature extraction (convert_ccip's inconclusive branch warns
            # the same way); metric values then use the fused 1-cosine ops.
            print(
                "WARNING: model_metrics.onnx is neither 1-cosine nor "
                "convertible; falling back to the fused 1-cosine metric. "
                f"Verdict: {verdict.get('convert_error', verdict)}"
            )
            return
        # reuse the fn analyze_metric_graph already jitted (and traced) rather
        # than re-converting + re-compiling the same graph
        self._metric_fn = jitted
        self._metric_vs_index = jax.jit(metric_vs_index_fn(graph))
        print(f"CCIP: using converted learned metric (verdict: {verdict})")

    def load_model(self) -> None:
        if self.params is not None:
            return
        if self.model_dir:
            from .ccip_weights import load_ccip_checkpoint

            explicit_cfg = self.model_cfg
            self.model_cfg, self.params, thr = load_ccip_checkpoint(self.model_dir)
            if explicit_cfg is not None and explicit_cfg.dtype != self.model_cfg.dtype:
                import dataclasses

                # the checkpoint's geometry is authoritative, but an explicit
                # compute-dtype request must not be silently discarded
                self.model_cfg = dataclasses.replace(
                    self.model_cfg, dtype=explicit_cfg.dtype)
            if thr is not None:
                self._checkpoint_threshold = thr
                if self.threshold <= 0:
                    self.threshold = thr
            self._ensure_metric()
        else:
            print(
                "WARNING: no CCIP model dir (set AIIS_CCIP_MODEL_DIR or pass "
                "--model-dir); using seeded RANDOM weights. Feature format is "
                "real, character semantics are not."
            )
            self.params = init_params(self.model_cfg, seed=self.seed,
                                      use_pallas=self.use_pallas)
        if self.mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS, put_global

            if len(self.mesh.devices.flatten()) > len(jax.local_devices()):
                # Same rationale as the tagger: cfeature extraction is
                # per-host-parallel (every process would re-decode the same
                # directory); the dp batch device_put needs local devices.
                raise ValueError(
                    "CCIPPredictor's data-parallel mesh must be single-host; "
                    "for multi-host extraction run gen_cfeatures per host on "
                    "disjoint directories")
            replicated = NamedSharding(self.mesh, P())
            self.params = jax.tree.map(lambda a: put_global(a, replicated),
                                       self.params)
            self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))

    def uses_learned_metric(self) -> bool:
        """True when the checkpoint ships a converted non-cosine metric graph —
        callers with 1−cos-only fused programs must take the per-query metric
        path instead (same gate the rerank_matches_* methods apply)."""
        self.load_model()
        self._ensure_metric()
        return self._metric_vs_index is not None

    def ccip_default_threshold(self) -> float:
        """Published metrics.json threshold of ccip-caformer-24-randaug-pruned
        (gen_cfeatures.py:183-202); a converted checkpoint carries its own.
        Reads the checkpoint constant, never the mutable working
        ``self.threshold`` — the reference re-reads metrics.json each call."""
        self.load_model()
        if self._checkpoint_threshold is not None and self._checkpoint_threshold > 0:
            return self._checkpoint_threshold
        return self.config.default_threshold

    # ---- features ------------------------------------------------------------

    def ccip_extract_device(self, images_u8: np.ndarray):
        """Dispatch the feature forward WITHOUT syncing — callers (gen_cfeatures'
        depth-1 pipeline) overlap host work with device compute; sync with
        np.asarray on the returned array."""
        self.load_model()
        if self._batch_sharding is not None:
            import jax

            images_dev = jax.device_put(np.asarray(images_u8), self._batch_sharding)
        else:
            images_dev = jnp.asarray(images_u8)
        return extract_features(
            self.params, images_dev, self._mean, self._std,
            self.model_cfg, self.use_pallas,
        )

    def ccip_batch_extract_features(self, images_u8: np.ndarray) -> np.ndarray:
        """(B, S, S, 3) uint8 RGB -> (B, feature_dim) f32."""
        return np.asarray(self.ccip_extract_device(images_u8))

    def ccip_extract_feature(self, image_u8: np.ndarray) -> np.ndarray:
        return self.ccip_batch_extract_features(image_u8[None])[0]

    def gen_image_ndarray(self, file_path: str) -> Optional[np.ndarray]:
        """Decode one file to the CCIP input: white-flattened RGB, bilinear 384²
        (gen_cfeatures.py:285-295). Returns uint8 HWC; normalization is on device.
        Native decoder when available (bit-identical, faster) with PIL fallback."""
        from PIL import Image

        from ..data.ingest import decode_rgb_square

        return decode_rgb_square(
            file_path, self.config.image_size, resample=Image.BILINEAR,
            pad_to_square=False,
        )

    def get_image_feature(self, file_path: str) -> np.ndarray:
        if self.threshold == -1.0:
            self.threshold = self.ccip_default_threshold() / 1.5  # webui lazy path (gen_cfeatures.py:299)
        img = self.gen_image_ndarray(file_path)
        if img is None:
            raise ValueError(f"failed to load {file_path}")
        return self.ccip_extract_feature(img)

    # ---- metrics ---------------------------------------------------------------

    def _p_feature(self, x: FeatureOrImage) -> np.ndarray:
        if isinstance(x, np.ndarray) and x.ndim == 1:
            return x
        if isinstance(x, str):
            return self.get_image_feature(x)
        return self.ccip_extract_feature(np.asarray(x))

    def ccip_difference(self, x: FeatureOrImage, y: FeatureOrImage) -> float:
        return float(self.ccip_batch_differences([x, y])[0, 1])

    def ccip_batch_differences(self, images: List[FeatureOrImage]) -> np.ndarray:
        feats = np.stack([self._p_feature(i) for i in images]).astype(np.float32)
        self._ensure_metric()
        if self._metric_fn is not None:
            return np.asarray(self._metric_fn(jnp.asarray(feats)))
        return np.asarray(ccip_batch_differences_op(jnp.asarray(feats)))

    def ccip_differences_vs_index(self, index_matrix: np.ndarray,
                                  query_feat: np.ndarray) -> np.ndarray:
        """All-rows difference in one device call."""
        self._ensure_metric()
        if self._metric_vs_index is not None:
            return np.asarray(self._metric_vs_index(
                jnp.asarray(index_matrix), jnp.asarray(query_feat)))
        return np.asarray(
            ccip_differences_vs_index_op(jnp.asarray(index_matrix), jnp.asarray(query_feat))
        )

    def rerank_diffs(self, images_u8: np.ndarray, n_valid: int,
                     index) -> np.ndarray:
        """One-dispatch character rerank stage: (k, S, S, 3) zero-padded top-k
        images -> diffs of their valid-mean feature vs every indexed row. The
        index rides its cached device copy (``SimilarityIndex._device``), so a
        warm character query costs one small H2D + one exec + one D2H.

        With a converted learned metric the stage is two dispatches (feature
        extraction + vmapped metric) — still batched, never per-row calls."""
        self.load_model()
        valid = np.arange(images_u8.shape[0]) < n_valid
        if self._metric_vs_index is not None:
            imgs = np.asarray(images_u8)
            if self._batch_sharding is not None:
                # the top-k batch (k=10) rarely divides the data axis —
                # replicate the tiny batch instead of dp-sharding it
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.mesh import put_global

                images_dev = put_global(imgs, NamedSharding(self.mesh, P()))
            else:
                images_dev = jnp.asarray(imgs)
            feats = np.asarray(extract_features(
                self.params, images_dev, self._mean, self._std,
                self.model_cfg, self.use_pallas))
            w = valid.astype(np.float32)
            mean_feat = (w[:, None] * feats).sum(0) / max(float(w.sum()), 1.0)
            return np.asarray(self._metric_vs_index(
                index._device(), jnp.asarray(mean_feat)))
        return np.asarray(ccip_rerank_diffs_op(
            self.params, jnp.asarray(np.asarray(images_u8)), jnp.asarray(valid),
            self._mean, self._std, index._device(),
            self.model_cfg, self.use_pallas,
        ))

    def rerank_diffs_from_rows(self, row_ids: np.ndarray, n_valid: int,
                               index) -> np.ndarray:
        """Row-gather character rerank: top-k features come from the device-
        resident cfeature index (matrix[row]·norm[row]) instead of live
        decode+forward — the query H2D is k int32 ids. Callers must have
        verified eligibility (every file present in the index, unchanged on
        disk, norms known); ``CCIPReranker`` does (search/rerank_ccip.py)."""
        self.load_model()
        k = int(np.asarray(row_ids).shape[0])
        valid = jnp.asarray(np.arange(k) < n_valid)
        ids = jnp.asarray(np.asarray(row_ids, np.int32))
        self._ensure_metric()
        if self._metric_vs_index is not None:
            mean_feat = ccip_mean_feature_from_rows_op(
                index._device(), index._device_norms_arr(), ids, valid)
            return np.asarray(self._metric_vs_index(index._device(), mean_feat))
        return np.asarray(ccip_rerank_diffs_from_rows_op(
            index._device(), index._device_norms_arr(), ids, valid))

    def rerank_matches_from_rows(
            self, row_ids: np.ndarray, n_valid: int, index,
            thresh_up: float, cap: int,
    ) -> Optional[tuple]:
        """Candidate-only row-gather rerank: (count, cand_idx, cand_diffs) —
        the cap smallest diffs in (diff asc, index asc) order, plus how many
        rows beat ``thresh_up`` (an f32 rounded UP from the f64 threshold).
        None when a converted learned metric is active (callers use the
        full-diffs path). Avoids the corpus-length diff D2H (4 MB at 1M rows
        through the relay)."""
        self.load_model()
        self._ensure_metric()
        if self._metric_vs_index is not None:
            return None
        from .caformer import ccip_rerank_matches_from_rows_op

        k = int(np.asarray(row_ids).shape[0])
        out = np.asarray(ccip_rerank_matches_from_rows_op(
            index._device(), index._device_norms_arr(),
            jnp.asarray(np.asarray(row_ids, np.int32)),
            jnp.asarray(np.arange(k) < n_valid),
            jnp.float32(thresh_up), cap=cap))
        from ..ops.fused_query import decode_ids

        return (int(out[0]), decode_ids(out[1 : 1 + cap]).astype(np.int64),
                out[1 + cap :])

    def rerank_matches_from_rows_batch(
            self, row_ids: np.ndarray, n_valid: np.ndarray, index,
            thresh_up: float, cap: int,
    ) -> Optional[tuple]:
        """Batched candidate-only rerank: (counts (B,), idx (B, cap),
        diffs (B, cap)); None when a learned metric is active."""
        self.load_model()
        self._ensure_metric()
        if self._metric_vs_index is not None:
            return None
        from .caformer import ccip_rerank_matches_from_rows_batch_op

        ids = np.asarray(row_ids, np.int32)
        valid = np.arange(ids.shape[1])[None, :] < np.asarray(n_valid)[:, None]
        out = np.asarray(ccip_rerank_matches_from_rows_batch_op(
            index._device(), index._device_norms_arr(),
            jnp.asarray(ids), jnp.asarray(valid),
            jnp.float32(thresh_up), cap=cap))
        from ..ops.fused_query import decode_ids

        return (out[:, 0].astype(np.int64),
                decode_ids(out[:, 1 : 1 + cap]).reshape(
                    -1, cap).astype(np.int64),
                out[:, 1 + cap :])

    def rerank_diffs_from_rows_batch(
            self, row_ids: np.ndarray, n_valid: np.ndarray, index,
    ) -> Optional[np.ndarray]:
        """B queries' row-gather reranks in ONE dispatch: (B, k) row ids +
        (B,) valid counts -> (B, D) diffs. Returns None when a converted
        learned metric is active — its graph program is per-query; callers
        fall back to one dispatch per query (rare path, still batched over
        index rows)."""
        self.load_model()
        self._ensure_metric()
        if self._metric_vs_index is not None:
            return None
        from .caformer import ccip_rerank_diffs_from_rows_batch_op

        ids = np.asarray(row_ids, np.int32)
        valid = np.arange(ids.shape[1])[None, :] < np.asarray(n_valid)[:, None]
        return np.asarray(ccip_rerank_diffs_from_rows_batch_op(
            index._device(), index._device_norms_arr(),
            jnp.asarray(ids), jnp.asarray(valid)))
