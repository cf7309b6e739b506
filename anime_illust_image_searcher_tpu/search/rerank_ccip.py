"""Character-oriented reranker (CCIP) for the search engine.

Reproduces webui.py:255-342 with the hot loop redesigned: the reference calls the ONNX
metric model once per indexed image (webui.py:306-309); here all index rows are scored
against the top-10 mean feature in ONE device matvec (ops in models/caformer.py).
When every top-10 file's feature is already in the cfeature index and unchanged on
disk (mtime vs the index artifact), the top-10 features come from a device-side row
gather instead of live decode+forward — features are deterministic, so the gather is
the same value the reference recomputes per query; AIIS_RERANK_LIVE=1 forces the
reference-shaped live path.

Semantics preserved:
  - lazy model + index load on first character-mode query
  - effective threshold = default_threshold / 1.5 (the lazy get_image_feature path,
    gen_cfeatures.py:299)
  - top-10 files' live features, unweighted mean; decode failures skipped
  - a match requires diff < threshold AND all required tags AND no excluded tags;
    files missing from the tag index are dropped (both checks default False)
  - result = top10 (original fused scores) ++ matches sorted by 1 - diff; top-10
    entries may legitimately repeat in the tail (reference does not dedup)
  - ALL top-10 decodes failing returns the top-10 with no matches (the
    reference's empty np.average turns the mean NaN, webui.py:303, so every
    threshold compare is False)
  - <= 10 results: elbow filter + truncate instead

Entry points: ``rerank_top`` takes the already-computed top-k (the engine's
fused character path gets it from one device call); ``__call__`` takes full
corpus scores (the multi-call fallback path) and reduces them to the top-k.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import os

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
        image_files_name_tags_arr: Optional[Sequence[str]] = None,
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
        import threading

        self._engine = engine
        # serializes _lazy_load: the webui warmup thread and a user's first
        # character query may race here (ThreadingHTTPServer), and a partially
        # built cfeature_filepath_idx must never be observable
        self._load_lock = threading.Lock()
        self._image_files_name_tags_arr = image_files_name_tags_arr
        self._file_tag_index_dict = file_tag_index_dict
        self._filepath_docid_dict = filepath_docid_dict
        self.directory = directory
        self.cfg = config
        self.predictor = predictor
        self.cfeature_filepath_idx: Optional[List[str]] = None
        self.cfeatures_idx: Optional[SimilarityIndex] = None
        # row-gather metadata; None until _lazy_load builds it (a caller that
        # injects cfeatures_idx directly just never takes the gather path)
        self._row_of: Optional[Dict[str, int]] = None
        self._row_stamps: Optional[np.ndarray] = None
        self._all_norms_known: bool = False
        # one-dispatch character-query inputs (fused_query_inputs cache)
        self._fused_inputs = None
        self._fused_inputs_key = None
        # how often a one-dispatch result failed the host freshness check and
        # resolved through a second dispatch (observability + test hook; the
        # engine's character_one_dispatch_queries counts DISPATCHES)
        self.one_dispatch_fallbacks = 0

    @property
    def image_files_name_tags_arr(self) -> Sequence[str]:
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
        with self._load_lock:
            self._lazy_load_locked()

    def _lazy_load_locked(self) -> None:
        if self.predictor is None:
            self.predictor = CCIPPredictor(self.cfg.ccip)
        if self.cfeature_filepath_idx is None:
            # build locally, publish complete (never a partial list)
            paths = []
            with open(os.path.join(self.directory, artifacts.CFEATURES_CSV),
                      "r", encoding="utf-8") as f:
                for line in f:
                    paths.append(line.strip())
            self.cfeature_filepath_idx = paths
        if self.cfeatures_idx is None:
            max_number = artifacts.get_current_cfeature_number(self.directory)
            name = artifacts.cfeatures_index_name(max_number)
            index_path = os.path.join(self.directory, name)
            self.cfeatures_idx = SimilarityIndex.load(index_path)
            # Row-gather fast-path metadata: path -> cfeature row (unique
            # occurrences only — a duplicated path's rows could disagree),
            # per-row extraction stamps (a file modified after ITS row's
            # extraction began must be re-extracted live; unstamped rows fall
            # back to the index-wide build-start estimate), and whether every
            # row's raw feature is reconstructible (all-norms-known fast flag;
            # pre-v1.1 indexes store 0.0 = unknown, checked per row below).
            row_of: Dict[str, int] = {}
            for i, p in enumerate(self.cfeature_filepath_idx):
                row_of[p] = -1 if p in row_of else i
            self._row_of = row_of
            stamps = np.asarray(self.cfeatures_idx.stamps, np.float64).copy()
            fallback = self.cfeatures_idx.build_started()
            stamps[stamps == 0.0] = fallback
            self._row_stamps = stamps
            norms = self.cfeatures_idx.norms
            self._all_norms_known = (
                len(self.cfeatures_idx) == 0 or float(np.min(norms)) > 0
            )

    def _row_reconstructible(self, row: int) -> bool:
        """A stored unit row reconstructs the raw feature (row * norm) iff its
        pre-normalization norm is known — or the raw vector was exactly zero
        (norm 0 AND an all-zero row, where 0 * anything is already right)."""
        if float(self.cfeatures_idx.norms[row]) > 0:
            return True
        return not np.any(self.cfeatures_idx.matrix[row])

    def _gather_rows(self, top10_files: List[str]) -> Optional[List[int]]:
        """Row ids for the gather fast path, or None if ANY top-k file needs
        live extraction (absent from the index, duplicated there, deleted,
        modified after the index build started, or stored without its raw
        norm) — then the whole query takes the reference-shaped live path so
        the mean never mixes sources."""
        if (self._row_of is None
                or os.environ.get("AIIS_RERANK_LIVE", "0") == "1"):
            return None
        rows: List[int] = []
        for f in top10_files:
            row = self._row_of.get(f, -1)
            if row < 0:
                return None
            if not self._all_norms_known and not self._row_reconstructible(row):
                return None
            try:
                if os.path.getmtime(f) > self._row_stamps[row]:
                    return None
            except OSError:
                return None  # file gone: live path will skip it like the reference
            rows.append(row)
        return rows

    def __call__(
        self,
        final_scores: np.ndarray,
        topn: int,
        required_tags: List[str],
        exclude_tags: List[str],
    ) -> List[Result]:
        """Full-corpus-scores entry (the engine's multi-call fallback path; the
        fused path computes the top-k on device and calls rerank_top directly)."""
        k = self.cfg.search.rerank_top_k
        if len(final_scores) <= k:
            sims: List[Result] = sorted(
                enumerate(final_scores), key=lambda it: -it[1])
            sims = filter_searched_result(
                sims, thresh=self.cfg.search.diff_filter_thresh)
            return sims[: min(topn, len(sims))]
        # Only the top-k rows are consumed past this point (webui.py:292 uses
        # sims[:10]); argsort(stable) reproduces sorted(enumerate(...))'s
        # descending-score lowest-index-first order without building a python
        # list of the whole corpus (the full sort cost seconds at 1M docs).
        order = np.argsort(-np.asarray(final_scores), kind="stable")[:k]
        top10_sims = [(int(d), float(final_scores[d])) for d in order]
        return self.rerank_top(top10_sims, topn, required_tags, exclude_tags)

    def _top_files(self, top10_sims: List[Result]) -> List[str]:
        return [
            self.image_files_name_tags_arr[doc_id].split(",")[0]
            for doc_id, _ in top10_sims
        ]

    # Candidate cap for the matches-only device programs: the host receives
    # ~2*cap floats instead of a corpus-length diff vector (4 MB at 1M rows).
    # Queries whose sub-threshold count exceeds the cap fall back to the
    # full-diffs path (exact, just more D2H). 4096 is the largest k
    # exact_top_k serves on its cheap chunked path (ops/fused_query.py).
    MATCH_CAP = 4096

    def _capped_eligible(self) -> bool:
        n = len(self.cfeatures_idx)
        # small index: full diffs are cheaper than a cap-sized top-k;
        # >= 2^24 rows: candidate indices ride the f32 output buffer exactly
        # like the fused query's id encoding, so the same bound applies
        return self.MATCH_CAP < n < 2 ** 24

    @staticmethod
    def _thresh_up(threshold: float) -> float:
        """Next f32 above the f64 threshold: the device count must
        over-approximate the host's f64 compare so count <= cap guarantees
        every true match is among the returned candidates."""
        t32 = np.float32(threshold)
        if float(t32) < threshold:
            t32 = np.nextafter(t32, np.float32(np.inf))
        return float(np.nextafter(t32, np.float32(np.inf)))

    def _matches_from_candidates(
        self,
        cand_idx: np.ndarray,
        cand_diffs: np.ndarray,
        threshold: float,
        required_tags: List[str],
        exclude_tags: List[str],
    ) -> List[Result]:
        """The host filter over (diff asc, index asc)-ordered candidates —
        produces the exact list _matches_from_diffs produces from full diffs:
        that path appends matches in index order then stable-sorts by score
        desc, yielding (diff asc, index asc); candidates arrive already in
        that order, and the f64 compare per candidate is identical."""
        matches: List[Result] = []
        for idx, diff in zip(cand_idx, cand_diffs):
            d64 = float(diff)
            if not (d64 < threshold):
                break  # ascending diffs: nothing later can match
            fpath = self.cfeature_filepath_idx[int(idx)]
            tag_map = self.file_tag_index_dict.get(fpath)
            if tag_map is None:
                continue  # unknown file: required/exclude checks both fail
            if not all(tag in tag_map for tag in required_tags):
                continue
            if not all(tag not in tag_map for tag in exclude_tags):
                continue
            matches.append((self.filepath_docid_dict[fpath], 1.0 - d64))
        return matches

    def fused_query_inputs(self, num_padded: int, mesh=None):
        """Device-resident inputs for the ONE-dispatch character query
        (models/caformer.ccip_character_query_matches_op), or None when the
        fused rerank half can't run: forced-live mode, a converted learned
        metric (the fused op hardcodes 1−cos), an empty cfeature index, or a
        row count at/beyond the f32 id-encoding bound. Returns
        (cf_matrix_dev, cf_norms_dev, docid_to_row_dev, thresh_up, cap,
        cf_num_real).

        ``docid_to_row`` maps every engine doc id to its cfeature row, −1
        where the row can't serve a gather (path absent from the cfeature
        index, duplicated there, or stored without a reconstructible norm) —
        the STATIC half of ``_gather_rows``; per-file freshness (mtime vs row
        stamps) stays a host-side post-check in ``resolve_fused`` because
        files can change between queries.

        ``mesh``: a SearchEngine(mesh=...) passes its mesh — the cfeature
        matrix/norms then pad to the shard multiple and row-shard over the
        data axis (GSPMD runs the metric matvec per shard and all-gathers the
        candidate top-k exactly like stage A), the doc→row map replicates,
        and ``cf_num_real`` masks the padding rows inside the program."""
        if os.environ.get("AIIS_RERANK_LIVE", "0") == "1":
            return None
        self._lazy_load()
        if self._row_of is None or self.predictor.uses_learned_metric():
            return None
        n_rows = len(self.cfeatures_idx)
        if n_rows == 0 or n_rows >= 2 ** 24:
            return None
        # identity alone is unsafe as a cache key (a freed object's address
        # can be reused by its replacement); pair it with content facts a
        # rebuilt index or reloaded doc list would change
        key = (id(self.image_files_name_tags_arr),
               len(self.image_files_name_tags_arr), num_padded,
               id(self.cfeatures_idx), len(self.cfeatures_idx),
               float(self.cfeatures_idx.build_started()), id(mesh))
        if self._fused_inputs_key != key:
            # serialize the (idempotent but ~seconds-at-1M) map build: two
            # concurrent first character queries under ThreadingHTTPServer
            # must not both run the python doc loop
            with self._load_lock:
                self._fused_inputs_build(key, num_padded, mesh)
        return self._fused_inputs

    def _fused_inputs_build(self, key, num_padded: int, mesh=None) -> None:
        """The locked half of ``fused_query_inputs``: rebuild and publish the
        device-resident inputs unless another thread already did."""
        if self._fused_inputs_key != key:
            import jax.numpy as jnp

            n_rows = len(self.cfeatures_idx)
            norms = np.asarray(self.cfeatures_idx.norms)
            recon = norms > 0
            zero_rows = np.flatnonzero(~recon)
            if len(zero_rows):
                # zero-norm rows reconstruct correctly iff truly zero vectors
                recon[zero_rows] = ~np.asarray(
                    self.cfeatures_idx.matrix[zero_rows]).any(axis=1)
            row_of = self._row_of
            rows = np.full(num_padded, -1, np.int32)
            for d, line in enumerate(self.image_files_name_tags_arr):
                r = row_of.get(line.split(",", 1)[0], -1)
                if r >= 0 and recon[r]:
                    rows[d] = r
            if not (rows >= 0).any():
                # nothing is gatherable (e.g. a pre-v1.1 index with no stored
                # norms, or doc paths that never match the cfeature index):
                # every dispatch would run the expensive rerank half only to
                # be discarded by ok=0 — publish "disabled" instead
                self._fused_inputs = None
                self._fused_inputs_key = key
                return
            thresh_up = self._thresh_up(
                self.predictor.ccip_default_threshold() / 1.5)
            cap = min(self.MATCH_CAP, n_rows)
            if mesh is None:
                self._fused_inputs = (
                    self.cfeatures_idx._device(),
                    self.cfeatures_idx._device_norms_arr(),
                    jnp.asarray(rows),
                    thresh_up, cap, 0,
                )
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.mesh import (
                    DATA_AXIS, pad_to_multiple, put_global,
                )

                n_data = mesh.shape[DATA_AXIS]
                mat, _ = pad_to_multiple(
                    np.asarray(self.cfeatures_idx.matrix, np.float32), n_data)
                nor, _ = pad_to_multiple(
                    np.asarray(self.cfeatures_idx.norms, np.float32), n_data)
                self._fused_inputs = (
                    put_global(mat, NamedSharding(mesh, P(DATA_AXIS, None))),
                    put_global(nor, NamedSharding(mesh, P(DATA_AXIS))),
                    put_global(rows, NamedSharding(mesh, P())),
                    thresh_up, cap,
                    n_rows if mat.shape[0] != n_rows else 0,
                )
            self._fused_inputs_key = key

    def resolve_fused(
        self,
        top10_sims: List[Result],
        ok_dev: bool,
        count: int,
        cand_idx: np.ndarray,
        cand_diffs: np.ndarray,
        cap: int,
        topn: int,
        required_tags: List[str],
        exclude_tags: List[str],
    ) -> List[Result]:
        """Consume the one-dispatch program's rerank half. The candidates are
        only trusted when the device mapped every top-k doc (``ok_dev``) AND
        the host freshness check passes (``_gather_rows``: files still
        present, unmodified since their rows' extraction, live mode not
        forced); otherwise this degrades to the classic second dispatch,
        reusing the top-k stage A already produced. Over-cap counts take one
        exact full-diffs dispatch directly (re-running the capped program
        would return the same over-cap verdict)."""
        self._lazy_load()
        rows = self._gather_rows(self._top_files(top10_sims))
        if ok_dev and rows is not None:
            threshold = self.predictor.ccip_default_threshold() / 1.5
            if count <= cap:
                return list(top10_sims) + self._matches_from_candidates(
                    cand_idx.astype(np.int64), cand_diffs, threshold,
                    required_tags, exclude_tags)
            diffs = self.predictor.rerank_diffs_from_rows(
                np.asarray(rows, np.int32), len(rows), self.cfeatures_idx)
            return list(top10_sims) + self._matches_from_diffs(
                np.asarray(diffs), threshold, required_tags, exclude_tags)
        self.one_dispatch_fallbacks += 1
        return self.rerank_top(top10_sims, topn, required_tags, exclude_tags)

    def warm_fallback_programs(self) -> None:
        """Compile the full-diffs programs the capped candidate path falls
        back to (over-cap queries; also the small-index batch path). Regular
        warmup queries resolve from candidates and never touch these, so
        without this the first popular-character query (>MATCH_CAP
        sub-threshold rows — realistic at scale) would pay a cold XLA compile
        mid-serving. Called by the webui warmup thread."""
        self._lazy_load()
        if len(self.cfeatures_idx) == 0:
            return
        k = self.cfg.search.rerank_top_k
        rows = np.zeros(k, np.int32)
        self.predictor.rerank_diffs_from_rows(rows, k, self.cfeatures_idx)
        if self._capped_eligible():
            # the single capped program: reachable via mesh engines,
            # AIIS_CHAR_ONE_DISPATCH=0, and the multi-call path (a
            # freshness-check fallback takes the LIVE path instead — its
            # _gather_rows re-check fails the same way) — none of which may
            # pay a cold compile mid-serving
            self.predictor.rerank_matches_from_rows(
                rows, k, self.cfeatures_idx,
                self._thresh_up(self.predictor.ccip_default_threshold() / 1.5),
                self.MATCH_CAP)
        b = 2
        while b <= 8:  # the power-of-two bpad shapes rerank_top_batch emits
            self.predictor.rerank_diffs_from_rows_batch(
                np.zeros((b, k), np.int32), np.full(b, k), self.cfeatures_idx)
            b *= 2

    def rerank_top_batch(
        self,
        tops: List[List[Result]],
        topn: int,
        required: List[List[str]],
        excluded: List[List[str]],
    ) -> List[List[Result]]:
        """B concurrent character queries' rerank stage: the gather-eligible
        queries share ONE batched device dispatch — candidates-only when the
        index is large enough (``rerank_matches_from_rows_batch``; over-cap
        queries re-run on the batched full-diffs program) — while the rest
        (stale/missing top-k files, forced live mode, learned metric) fall
        back to their individual ``rerank_top``. Per-query results are
        identical to sequential ``rerank_top`` calls modulo the batched
        matmul's last-ulp reduction scheduling (the same caveat as the
        batched normal-mode program)."""
        self._lazy_load()
        threshold = self.predictor.ccip_default_threshold() / 1.5
        results: List[Optional[List[Result]]] = [None] * len(tops)

        gather_pos: List[int] = []
        gather_rows: List[List[int]] = []
        for i, top10_sims in enumerate(tops):
            rows = self._gather_rows(self._top_files(top10_sims))
            if rows is not None and len(rows) == len(tops[0]):
                gather_pos.append(i)
                gather_rows.append(rows)

        if len(gather_pos) >= 2:
            # pad B to the next power of two so the batched program compiles
            # for O(log) shapes, not one per concurrent-burst size (a fresh
            # compile mid-serving costs seconds through a remote-compile relay)
            b = len(gather_pos)
            bpad = 1 << (b - 1).bit_length()
            rows_arr = np.asarray(
                gather_rows + [gather_rows[0]] * (bpad - b), np.int32)
            nvalid = np.asarray([len(r) for r in gather_rows]
                                + [len(gather_rows[0])] * (bpad - b))
            if self._capped_eligible():
                res = self.predictor.rerank_matches_from_rows_batch(
                    rows_arr, nvalid, self.cfeatures_idx,
                    self._thresh_up(threshold), self.MATCH_CAP)
                if res is not None:
                    counts, idxs, diffs = res
                    for j, i in enumerate(gather_pos):
                        if counts[j] <= self.MATCH_CAP:
                            results[i] = (list(tops[i])
                                          + self._matches_from_candidates(
                                              idxs[j], diffs[j], threshold,
                                              required[i], excluded[i]))
                        else:
                            # over-cap: ONE full-diffs dispatch for THIS
                            # query only — re-running the whole batch would
                            # D2H bpad corpus-length rows for queries already
                            # resolved from candidates
                            d = self.predictor.rerank_diffs_from_rows(
                                np.asarray(gather_rows[j], np.int32),
                                len(gather_rows[j]), self.cfeatures_idx)
                            results[i] = (list(tops[i])
                                          + self._matches_from_diffs(
                                              np.asarray(d), threshold,
                                              required[i], excluded[i]))
            else:
                # small index: a corpus-length diff row is cheaper than a
                # cap-sized top-k; one batched full-diffs dispatch
                diffs_batch = self.predictor.rerank_diffs_from_rows_batch(
                    rows_arr, nvalid, self.cfeatures_idx)
                if diffs_batch is not None:
                    for j, i in enumerate(gather_pos):
                        results[i] = (list(tops[i])
                                      + self._matches_from_diffs(
                                          np.asarray(diffs_batch[j]),
                                          threshold,
                                          required[i], excluded[i]))
        for i in range(len(tops)):
            if results[i] is None:
                results[i] = self.rerank_top(tops[i], topn,
                                             required[i], excluded[i])
        return results  # type: ignore[return-value]

    def rerank_top(
        self,
        top10_sims: List[Result],
        topn: int,
        required_tags: List[str],
        exclude_tags: List[str],
    ) -> List[Result]:
        """CCIP rerank of an already-computed top-k (webui.py:255-342 from the
        ``sims[:10]`` line down). ``top10_sims`` must be the descending-score,
        lowest-index-tie-broken top-k of the fused scores over a corpus larger
        than k — exactly what ops.fused_query.fused_character_top returns."""
        self._lazy_load()
        threshold = self.predictor.ccip_default_threshold() / 1.5

        top10_files = self._top_files(top10_sims)

        # Device stage — the reference makes one ONNX call per top-10 file plus
        # one per INDEXED image (webui.py:296-309). Two one-dispatch forms here:
        #   - row-gather (common case): every top-10 file's feature is already in
        #     the device-resident index, so the query ships k int32 row ids —
        #     gather + masked mean + all-rows metric in one program, no pixel H2D;
        #   - live: decode the files, batched extraction + mean + metric in one
        #     program (exact reference semantics; also the AIIS_RERANK_LIVE=1 and
        #     stale/missing-file fallback).
        rows = self._gather_rows(top10_files)
        if rows is not None:
            if self._capped_eligible():
                res = self.predictor.rerank_matches_from_rows(
                    np.asarray(rows, np.int32), len(rows), self.cfeatures_idx,
                    self._thresh_up(threshold), self.MATCH_CAP)
                if res is not None:
                    count, cand_idx, cand_diffs = res
                    if count <= self.MATCH_CAP:
                        return list(top10_sims) + self._matches_from_candidates(
                            cand_idx, cand_diffs, threshold,
                            required_tags, exclude_tags)
            diffs = self.predictor.rerank_diffs_from_rows(
                np.asarray(rows, np.int32), len(rows), self.cfeatures_idx)
        else:
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

            # decode the k hit files concurrently (PIL releases the GIL around IO
            # and most of decode; order preserved, failures skipped)
            with ThreadPoolExecutor(max_workers=len(top10_files)) as ex:
                decoded = [img for img in ex.map(_decode, top10_files)
                           if img is not None]
            if not decoded:
                # Reference semantics: np.average over zero features turns the
                # mean NaN (webui.py:303), every diff compares False against the
                # threshold, and the result is the top-10 with no matches
                # appended (webui.py:330-335).
                return list(top10_sims)

            # pad to the fixed top-k batch so one compiled program serves every query
            pad = len(top10_files) - len(decoded)
            batch = np.stack(decoded + [np.zeros_like(decoded[0])] * pad)
            diffs = self.predictor.rerank_diffs(batch, len(decoded),
                                                self.cfeatures_idx)

        return list(top10_sims) + self._matches_from_diffs(
            np.asarray(diffs), threshold, required_tags, exclude_tags)

    def _matches_from_diffs(
        self,
        diffs_np: np.ndarray,
        threshold: float,
        required_tags: List[str],
        exclude_tags: List[str],
    ) -> List[Result]:
        """Host filter, vectorized: the threshold compare runs over the whole
        diff vector at once and only the few candidate rows touch the python
        tag dicts (the old per-row loop cost ~80 ms/query at 100k rows).
        float() upcast per candidate keeps the f64 compare/score arithmetic of
        the reference loop bit-for-bit (webui.py:306-335)."""
        matches: List[Result] = []
        for idx in np.nonzero(diffs_np.astype(np.float64) < threshold)[0]:
            fpath = self.cfeature_filepath_idx[idx]
            tag_map = self.file_tag_index_dict.get(fpath)
            if tag_map is None:
                continue  # unknown file: required/exclude checks both fail
            if not all(tag in tag_map for tag in required_tags):
                continue
            if not all(tag not in tag_map for tag in exclude_tags):
                continue
            matches.append((self.filepath_docid_dict[fpath],
                            1.0 - float(diffs_np[idx])))

        matches.sort(key=lambda it: -it[1])
        return matches
