"""Character-oriented reranker (CCIP) for the search engine.

Reproduces webui.py:255-342 with the hot loop redesigned: the reference calls the ONNX
metric model once per indexed image (webui.py:306-309); here all index rows are scored
against the top-10 mean feature in ONE device matvec (ops in models/caformer.py).

Semantics preserved:
  - lazy model + index load on first character-mode query
  - effective threshold = default_threshold / 1.5 (the lazy get_image_feature path,
    gen_cfeatures.py:299)
  - top-10 files' live features, unweighted mean; decode failures skipped
  - a match requires diff < threshold AND all required tags AND no excluded tags;
    files missing from the tag index are dropped (both checks default False)
  - result = top10 (original fused scores) ++ matches sorted by 1 - diff; top-10
    entries may legitimately repeat in the tail (reference does not dedup)
  - <= 10 results: elbow filter + truncate instead
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..index import artifacts
from ..index.similarity import SimilarityIndex
from ..models.ccip import CCIPPredictor
from .filters import filter_searched_result

Result = Tuple[int, float]


class CCIPReranker:
    def __init__(
        self,
        image_files_name_tags_arr: Optional[List[str]] = None,
        file_tag_index_dict: Optional[Dict[str, Dict[str, bool]]] = None,
        filepath_docid_dict: Optional[Dict[str, int]] = None,
        directory: str = ".",
        config: Config = DEFAULT_CONFIG,
        predictor: Optional[CCIPPredictor] = None,
        engine=None,
    ) -> None:
        """Either pass the three tag-index structures directly, or pass
        ``engine`` (a SearchEngine) — then they resolve lazily on first
        character query, so webui startup never pays the 1M-doc dict build
        (engine.py builds them on first attribute access)."""
        self._engine = engine
        self._image_files_name_tags_arr = image_files_name_tags_arr
        self._file_tag_index_dict = file_tag_index_dict
        self._filepath_docid_dict = filepath_docid_dict
        self.directory = directory
        self.cfg = config
        self.predictor = predictor
        self.cfeature_filepath_idx: Optional[List[str]] = None
        self.cfeatures_idx: Optional[SimilarityIndex] = None

    @property
    def image_files_name_tags_arr(self) -> List[str]:
        if self._image_files_name_tags_arr is None:
            self._image_files_name_tags_arr = self._engine.image_files_name_tags_arr
        return self._image_files_name_tags_arr

    @property
    def file_tag_index_dict(self) -> Dict[str, Dict[str, bool]]:
        if self._file_tag_index_dict is None:
            self._file_tag_index_dict = self._engine.file_tag_index_dict
        return self._file_tag_index_dict

    @property
    def filepath_docid_dict(self) -> Dict[str, int]:
        if self._filepath_docid_dict is None:
            self._filepath_docid_dict = self._engine.filepath_docid_dict
        return self._filepath_docid_dict

    def _lazy_load(self) -> None:
        import os

        if self.predictor is None:
            self.predictor = CCIPPredictor(self.cfg.ccip)
        if self.cfeature_filepath_idx is None:
            self.cfeature_filepath_idx = []
            with open(os.path.join(self.directory, artifacts.CFEATURES_CSV),
                      "r", encoding="utf-8") as f:
                for line in f:
                    self.cfeature_filepath_idx.append(line.strip())
        if self.cfeatures_idx is None:
            max_number = artifacts.get_current_cfeature_number(self.directory)
            name = artifacts.cfeatures_index_name(max_number)
            self.cfeatures_idx = SimilarityIndex.load(
                os.path.join(self.directory, name)
            )

    def __call__(
        self,
        final_scores: np.ndarray,
        topn: int,
        required_tags: List[str],
        exclude_tags: List[str],
    ) -> List[Result]:
        sims: List[Result] = sorted(enumerate(final_scores), key=lambda it: -it[1])
        if len(sims) <= self.cfg.search.rerank_top_k:
            sims = filter_searched_result(sims)
            return sims[: min(topn, len(sims))]

        self._lazy_load()
        threshold = self.predictor.ccip_default_threshold() / 1.5

        top10_sims = sims[: self.cfg.search.rerank_top_k]
        top10_doc_ids = [doc_id for doc_id, _ in top10_sims]
        top10_files = [
            self.image_files_name_tags_arr[doc_id].split(",")[0]
            for doc_id in top10_doc_ids
        ]

        # decode the hit files (skip failures like webui.py:296-301); the whole
        # device stage — batched feature extraction (reference: one ONNX call per
        # file), masked mean, and the all-rows metric (reference: one ONNX call per
        # INDEXED image, webui.py:306-309) — then runs as ONE dispatch against the
        # device-resident index
        from concurrent.futures import ThreadPoolExecutor

        def _decode(file: str) -> Optional[np.ndarray]:
            try:
                img = self.predictor.gen_image_ndarray(file)
                if img is None:
                    raise ValueError(f"failed to load {file}")
                return img
            except Exception as e:  # noqa: BLE001
                print(f"Error: {e}")
                return None

        # decode the k hit files concurrently (PIL releases the GIL around IO and
        # most of decode; order preserved, failures skipped)
        with ThreadPoolExecutor(max_workers=len(top10_files)) as ex:
            decoded = [img for img in ex.map(_decode, top10_files) if img is not None]
        if not decoded:
            sims = filter_searched_result(sims)
            return sims[: min(topn, len(sims))]

        # pad to the fixed top-k batch so one compiled program serves every query
        pad = len(top10_files) - len(decoded)
        batch = np.stack(decoded + [np.zeros_like(decoded[0])] * pad)
        diffs = self.predictor.rerank_diffs(batch, len(decoded), self.cfeatures_idx)

        matches: List[Result] = []
        for idx, fpath in enumerate(self.cfeature_filepath_idx):
            tag_map = self.file_tag_index_dict.get(fpath)
            if tag_map is None:
                continue  # unknown file: required/exclude checks both fail
            if not all(tag in tag_map for tag in required_tags):
                continue
            if not all(tag not in tag_map for tag in exclude_tags):
                continue
            diff = float(diffs[idx])
            if diff < threshold:
                matches.append((self.filepath_docid_dict[fpath], 1.0 - diff))

        matches.sort(key=lambda it: -it[1])
        return list(top10_sims) + matches
