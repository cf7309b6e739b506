"""Query-time search engine: Doc2Vec + BM25 score fusion with reranking.

Library-grade rebuild of the reference's query path (webui.py:82-390): the web UI (and
any other caller) goes through :class:`SearchEngine` instead of module globals. All
artifact arrays are loaded once and kept on device; each query is a handful of jitted
calls (batched tag inference, one index matvec, one BM25 gather/segment-sum) — no
per-query retracing, which is what the ≤10 ms serving target requires.
"""

from __future__ import annotations

import logging
import math
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..index import artifacts
from ..index.bm25_index import BM25DeviceIndex
from ..index.dictionary import TagDictionary
from ..index.similarity import SimilarityIndex
from ..models.doc2vec import Doc2VecModel
from ..ops.bm25 import bm25_scores_device, build_query_vectors
from .filters import (DIFF_FILTER_THRESH, filter_searched_result,
                      is_include_ng_word)
from .parser import BM25Query, parse_bm25_query, parse_doc2vec_query

Result = Tuple[int, float]

logger = logging.getLogger(__name__)


def assemble_prf_results(
    top10_doc_ids: List[int], reranked_final: np.ndarray, topn: int,
    diff_thresh: float = DIFF_FILTER_THRESH,
) -> List[Result]:
    """Pin the top-10 at 1.0, order the rest by reranked score, elbow-filter over the
    FULL list, truncate to topn (webui.py:214-246 semantics; the elbow's cut position
    depends on the complete list, so no pre-truncation)."""
    top10_set = set(top10_doc_ids)
    order = np.argsort(-reranked_final, kind="stable")
    final_sims: List[Result] = [(doc_id, 1.0) for doc_id in top10_doc_ids]
    for doc_id in order:
        if int(doc_id) not in top10_set:
            final_sims.append((int(doc_id), float(reranked_final[doc_id])))
    final_sims = filter_searched_result(final_sims, thresh=diff_thresh)
    return final_sims[: min(topn, len(final_sims))]


@dataclass
class ResultInfo:
    file_path: str
    doc_id: int
    similarity: float
    tags: List[str]


class SearchEngine:
    """Loads the artifact chain from ``directory`` and serves queries.

    ``cfeature_reranker`` is the character-oriented rerank hook (reference:
    webui.py:255-342); it is injected so the heavy CCIP model only loads when the
    character mode is actually used.
    """

    def __init__(
        self,
        directory: str = ".",
        config: Config = DEFAULT_CONFIG,
        rep: Optional[Sequence[str]] = None,
        cfeature_reranker: Optional[
            Callable[[np.ndarray, int, List[str], List[str]], List[Result]]
        ] = None,
        mesh=None,
    ) -> None:
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis — index rows and
        BM25 matrices shard across it and the fused query runs SPMD over all chips
        (the 100k+ corpus serving layout, SURVEY.md §2.3)."""
        self.cfg = config
        self.directory = directory
        self.rep = list(rep) if rep else None
        self.cfeature_reranker = cfeature_reranker
        self.mesh = mesh
        # Bug-compat PRF (QUIRKS #5 counterpart): reproduce the reference's
        # tuple-array rerank as built. Config flag or AIIS_REFERENCE_PRF=1.
        self._reference_prf = (
            config.search.reference_prf
            or os.environ.get("AIIS_REFERENCE_PRF", "0") == "1"
        )
        # How often the elbow prefix was ambiguous and the exact full-sort
        # program had to run (should stay ~0 outside crafted tie data).
        self.exact_cut_dispatches = 0
        # How often character-mode stage A ran as the one-dispatch fused
        # program (observability + test hook).
        self.character_fused_dispatches = 0
        # How often the whole-query one-dispatch character program was
        # DISPATCHED (ccip_character_query_matches_op / its batched form).
        # The host freshness post-check may still resolve a dispatch through
        # a second device call — the reranker's one_dispatch_fallbacks counts
        # those, so resolved-in-one = this minus that.
        self.character_one_dispatch_queries = 0

        def p(name: str) -> str:
            return os.path.join(directory, name)

        # tag file arrays (webui.py:620-647) — lazy bytes+offsets view: the
        # eager 1M-row strip loop cost seconds of every engine start and
        # ~400 MB of string objects, but queries touch ≤ topn rows
        # (utils/line_array.py; element-for-element identical to the loop)
        from ..utils.line_array import load_line_array

        self.image_files_name_tags_arr: Sequence[str] = load_line_array(
            p(artifacts.DOC2VEC_IDX_CSV))
        # The per-file tag dicts cost ~80 s of python at 1M docs but only serve
        # the character-mode rerank and webui info paths — built lazily on
        # first access (VERDICT r3 #3: serving cold start).
        self._file_tag_index_dict: Optional[Dict[str, Dict[str, bool]]] = None
        self._filepath_docid_dict: Optional[Dict[str, int]] = None
        import threading

        # serializes the lazy build: concurrent first-touch requests under
        # ThreadingHTTPServer must not each run the ~80 s 1M-doc dict build
        self._tag_dict_lock = threading.Lock()

        self.model = Doc2VecModel.load_for_serving(p(artifacts.DOC2VEC_MODEL))
        self.index = SimilarityIndex.load(p(artifacts.DOC2VEC_INDEX))
        self.dictionary = TagDictionary.load(p(artifacts.DOC2VEC_DICTIONARY))
        # mmap'd serving cache of the derived device arrays when fresh; pickles
        # (the canonical reference-named artifacts) otherwise.
        self.bm25 = BM25DeviceIndex.load_or_build(
            directory, vocab_size=len(self.dictionary), cfg=config.bm25)
        # COO form uploaded lazily (see _bm25_dev): it serves only the
        # non-fused fallback path, and at 1M docs it's hundreds of MB of HBM
        # + startup H2D the fused path never reads.
        self._bm25_dev_cache = None
        import jax.numpy as jnp

        norms = self.index.norms
        # Indexes built before norms were stored have zero norms with nonzero
        # rows; the fused single-call query path reconstructs raw vectors as
        # row*norm, so EVERY row must be reconstructible (norm known, or a
        # genuinely zero vector) — else fall back to the re-inference rerank.
        # max(norms)>0 would be fooled by a pre-v1.1 index --update-appended
        # with new (normed) rows: old rows would silently reconstruct as zero.
        # Exact check touches only the zero-norm rows, keeping mmap'd loads
        # cheap when all norms are present (the common case).
        norms_np = np.asarray(norms)
        if len(self.index) == 0 or (len(norms_np) and float(norms_np.min()) > 0):
            self._norms_known = True
        else:
            zero_rows = np.flatnonzero(norms_np == 0)
            self._norms_known = not np.any(self.index.matrix[zero_rows])
        # Doc/term ids ride the fused programs' f32 buffers as int32 BIT
        # PATTERNS (ops/fused_query.encode_ids_f32), exact at any corpus/vocab
        # size — the round-4 value-encode capped the one-dispatch path at 2^24
        # (16M) docs and silently degraded to the ~18x multi-call path beyond
        # (VERDICT r4 #4; >2^24 exactness pinned by tests/test_fused_query.py
        # and served end-to-end by tests/test_huge_corpus.py).
        self._num_real = len(self.index)

        # COO spill of docs longer than the capped dense width (None for
        # typical corpora; see BM25DeviceIndex.from_stats' cap policy) + the
        # true max doc length bounding the program's require/exclude encode
        self._ov_max_len = int(self.bm25.max_doc_len)
        if mesh is None:
            self._bm25_dense = self.bm25.to_device_dense()
            self._bm25_overflow = self.bm25.overflow_device()
            self._matrix_dev = self.index._device()
            self._norms_dev = jnp.asarray(np.asarray(norms, dtype=np.float32))
            self._num_padded = self._num_real
        else:
            # Row-shard every per-document array over the data axis; GSPMD runs the
            # fused program per shard and all-gathers the top-k.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS, pad_to_multiple, put_global

            n_data = mesh.shape[DATA_AXIS]
            row_sharding = NamedSharding(mesh, P(DATA_AXIS))
            mat_sharding = NamedSharding(mesh, P(DATA_AXIS, None))

            matrix, _ = pad_to_multiple(self.index.matrix, n_data)
            norms_p, _ = pad_to_multiple(np.asarray(norms, np.float32), n_data)
            term_mat, _ = pad_to_multiple(self.bm25.term_mat, n_data)
            # term padding rows must carry the sentinel id, not zeros
            term_mat = term_mat.copy()
            term_mat[self._num_real:] = self.bm25.vocab_size
            contrib_mat, _ = pad_to_multiple(self.bm25.contrib_mat, n_data)

            # put_global handles meshes spanning multiple processes (multi-host
            # serving: every host loads the artifacts, contributes its shards,
            # and runs the same SPMD query program)
            self._matrix_dev = put_global(matrix.astype(np.float32), mat_sharding)
            self._norms_dev = put_global(norms_p, row_sharding)
            self._bm25_dense = (
                put_global(term_mat, mat_sharding),
                put_global(contrib_mat.astype(np.float32), mat_sharding),
            )
            # overflow rows are tiny; replicate them (the scatter into the
            # row-sharded score vector is GSPMD's to place)
            if len(self.bm25.ov_doc):
                rep = NamedSharding(mesh, P())
                self._bm25_overflow = (
                    put_global(np.ascontiguousarray(self.bm25.ov_doc), rep),
                    put_global(np.ascontiguousarray(self.bm25.ov_term), rep),
                    put_global(np.ascontiguousarray(self.bm25.ov_contrib), rep),
                )
            else:
                self._bm25_overflow = None
            self._num_padded = matrix.shape[0]

    # ---------------------------------------------------------- lazy tag dicts

    def _build_tag_dicts(self) -> None:
        with self._tag_dict_lock:
            if self._file_tag_index_dict is not None:
                return  # another thread built them while we waited
            file_tag_index: Dict[str, Dict[str, bool]] = {}
            filepath_docid: Dict[str, int] = {}
            for idx, line in enumerate(self.image_files_name_tags_arr):
                splited = line.split(",")
                filepath_docid[splited[0]] = idx
                file_tag_index[splited[0]] = {t: True for t in splited[1:]}
            self._file_tag_index_dict = file_tag_index
            self._filepath_docid_dict = filepath_docid

    @property
    def file_tag_index_dict(self) -> Dict[str, Dict[str, bool]]:
        """path -> {tag: True} (webui.py:640-647), built on first use."""
        if self._file_tag_index_dict is None:
            self._build_tag_dicts()
        return self._file_tag_index_dict

    @property
    def filepath_docid_dict(self) -> Dict[str, int]:
        """path -> doc id (webui.py:640-647), built on first use."""
        if self._filepath_docid_dict is None:
            self._build_tag_dicts()
        return self._filepath_docid_dict

    # ------------------------------------------------------------------ queries

    def doc2vec_query_vector(self, new_doc: str) -> np.ndarray:
        """Weighted, normalized Doc2Vec query vector (webui.py:82-117).

        Per-tag vectors come from the model's precomputed tag-vector table — inference
        is deterministically seeded, so the rows are bit-identical to what the
        reference computes with per-query gensim SGD, at lookup cost."""
        tag_and_weight_list, all_weight = parse_doc2vec_query(new_doc)
        tag_vecs = np.stack([self.model.tag_vector(t) for t, _ in tag_and_weight_list])
        got_vector = np.zeros(self.model.vector_size, dtype=np.float64)
        for (_, weight), vec in zip(tag_and_weight_list, tag_vecs):
            norm = np.linalg.norm(vec)
            if norm > 0:
                got_vector += weight * (vec / norm)
        got_vector = got_vector / all_weight
        norm = float(np.linalg.norm(got_vector))
        if math.isinf(norm) or norm == 0:
            norm = 1.0
        return (got_vector / norm).astype(np.float32)

    @property
    def _bm25_dev(self):
        if self._bm25_dev_cache is None:
            self._bm25_dev_cache = self.bm25.to_device()
        return self._bm25_dev_cache

    def compute_bm25_scores(self, query: BM25Query) -> np.ndarray:
        import jax.numpy as jnp

        eff, excl, req, n_req = build_query_vectors(
            query.term_weights, self.bm25.vocab_size,
            magic=self.cfg.search.require_tag_magic_number,
        )
        doc_ids, term_ids, contrib = self._bm25_dev
        out = bm25_scores_device(
            doc_ids, term_ids, contrib,
            jnp.asarray(eff), jnp.asarray(excl), jnp.asarray(req),
            jnp.asarray(n_req), num_docs=self.bm25.num_docs,
        )
        return np.asarray(out)

    def find_similar_documents(
        self, new_doc: str, topn: int = 50, search_mode: str = "normal"
    ) -> List[Result]:
        """Fused BM25 + Doc2Vec ranking with rerank dispatch (webui.py:345-390)."""
        from ..ops.fused_query import QUERY_TERM_BUCKETS

        max_terms = QUERY_TERM_BUCKETS[-1]
        if self.fused_path_available(new_doc, search_mode):
            return self._find_similar_fused(new_doc, topn)
        if (search_mode == "character oriented"
                and self.character_fused_available(new_doc)):
            return self._find_similar_character_fused(new_doc, topn)

        if search_mode != "character oriented" and not getattr(
            self, "_warned_slow_path", False
        ):
            # The multi-call path is ~18x slower at 100k docs (ARCHITECTURE.md §3);
            # say so once instead of silently degrading.
            self._warned_slow_path = True
            reason = (
                "AIIS_REFERENCE_PRF bug-compat mode bypasses the fused program"
                if self._reference_prf
                else "index stores no doc-vector norms (rebuild with genmodel to fix)"
                if not self._norms_known
                else f"query has more than {max_terms} terms"
                if len(new_doc.split(" ")) > max_terms
                else "index too small for the fused PRF program"
            )
            logger.warning("query using non-fused fallback path: %s", reason)

        vec = self.doc2vec_query_vector(new_doc)
        sims_doc2vec = self.index[vec]

        query = parse_bm25_query(new_doc, self.dictionary,
                                 magic=self.cfg.search.require_tag_magic_number)
        bm25_scores = self.compute_bm25_scores(query)

        if sims_doc2vec.max() > 0:
            sims_doc2vec = sims_doc2vec / sims_doc2vec.max()
        if bm25_scores.max() > 0:
            bm25_scores = bm25_scores / bm25_scores.max()

        final_scores = (
            self.cfg.search.bm25_weight * bm25_scores
            + self.cfg.search.doc2vec_weight * sims_doc2vec
        )

        if search_mode == "character oriented":
            if self.cfeature_reranker is None:
                raise RuntimeError(
                    "character-oriented mode requires a CCIP reranker "
                    "(build the cfeature index with gen_cfeatures first)"
                )
            return self.cfeature_reranker(
                final_scores, topn, query.required_tags, query.exclude_tags
            )
        return self.doc2vec_rerank(final_scores, topn)

    def _pack_fused(self, new_doc: str,
                    max_terms: Optional[int] = None) -> np.ndarray:
        packed, _ = self._pack_fused_with_query(new_doc, max_terms)
        return packed

    def _pack_fused_with_query(
        self, new_doc: str, max_terms: Optional[int] = None,
    ) -> Tuple[np.ndarray, BM25Query]:
        """Pack the query buffer and also return the parsed BM25Query (the
        character path consumes its require/exclude lists — one parse, not
        two). Doc2Vec inference runs FIRST so an unknown tag raises the same
        KeyError the multi-call path raises (the two parsers normalize parens
        differently, QUIRKS #9 — error precedence is observable)."""
        from ..ops.fused_query import pack_query, term_bucket

        s = self.cfg.search
        vec = self.doc2vec_query_vector(new_doc)
        query = parse_bm25_query(new_doc, self.dictionary,
                                 magic=s.require_tag_magic_number)
        if max_terms is None:
            # smallest term bucket that fits: small queries stay on the cheap
            # 64-slot sweep; >64-term queries ride the 256-slot program instead
            # of falling off to the ~18x multi-call path
            max_terms = term_bucket(len(query.term_weights))
        packed = pack_query(vec, query.term_weights, self.bm25.vocab_size,
                            magic=s.require_tag_magic_number,
                            max_terms=max_terms)
        return packed, query

    def _assemble_fused(
        self, out: np.ndarray, topn: int,
        exact_fn: Optional[Callable[[], np.ndarray]] = None,
    ) -> List[Result]:
        """Reference elbow semantics (webui.py:63-80): the cut position is defined
        over the FULL corpus-length sorted list, but the host only truncates the
        <= k+kk assembled results, so the fast program computes the flags on the
        top-(k+kk+1) prefix only (no 1M-row device sort). The prefix decides the
        cut in every case but one: exactly ONE sub-threshold diff in the prefix
        with unseen real docs beyond it (a tail flag would move the cut past the
        list). That case re-dispatches ``exact_fn`` — the full-sort program."""
        from ..ops.fused_query import unpack_result, unpack_result_exact

        k = self.cfg.search.rerank_top_k
        _, top_idx, r_vals, r_idx, cut_info = unpack_result(out, k)
        first_flag, second_flag, flag_count = cut_info
        kk = len(r_vals)
        cut: Optional[int]
        if flag_count >= 2:
            cut = second_flag
        elif flag_count == 0:
            cut = None  # any tail flags put the cut past the assembled list
        elif (k + kk + 1) >= self._num_real:
            cut = first_flag  # prefix covered every real doc: global count == 1
        else:
            self.exact_cut_dispatches += 1
            assert exact_fn is not None
            _, top_idx, r_vals, r_idx, cut = unpack_result_exact(
                np.asarray(exact_fn()), k)

        top10_set = set(int(i) for i in top_idx)
        final_sims: List[Result] = [(int(d), 1.0) for d in top_idx]
        for d, v in zip(r_idx, r_vals):
            if int(d) not in top10_set:
                final_sims.append((int(d), float(v)))
        if cut is not None:
            final_sims = final_sims[:cut]
        final_sims = [(d, v) for d, v in final_sims if v > 0]
        return final_sims[: min(topn, len(final_sims))]

    def _dispatch_fused(self, packed: np.ndarray, topn: int, exact: bool = False):
        from ..ops.fused_query import fused_normal_query, fused_normal_query_exact

        s = self.cfg.search
        term_mat, contrib_mat = self._bm25_dense
        fn = fused_normal_query_exact if exact else fused_normal_query
        # packed rides as a host array: jit replicates it onto the program's
        # devices, which also works when the mesh spans processes (each process
        # holds the same query bytes)
        return fn(
            self._matrix_dev, self._norms_dev,
            term_mat, contrib_mat,
            packed,
            s.bm25_weight, s.doc2vec_weight,
            s.original_score_weight, s.reranked_score_weight,
            vocab_size=self.bm25.vocab_size,
            num_docs=self._num_padded, topn=topn, k=s.rerank_top_k,
            num_real=self._num_real, diff_thresh=s.diff_filter_thresh,
            overflow=self._bm25_overflow, ov_max_len=self._ov_max_len,
        )

    def _find_similar_fused(self, new_doc: str, topn: int) -> List[Result]:
        """Single-device-call query path (ops/fused_query.py): identical semantics to
        the multi-call path; one H2D transfer, one execution, one D2H transfer."""
        packed = self._pack_fused(new_doc)
        out = self._dispatch_fused(packed, topn)
        return self._assemble_fused(
            np.asarray(out), topn,
            exact_fn=lambda: self._dispatch_fused(packed, topn, exact=True))

    def character_fused_available(self, new_doc: str) -> bool:
        """The character-mode one-dispatch stage A (fused scores + device top-k)
        needs a corpus larger than the rerank top-k, a term bucket that fits,
        and a reranker exposing ``rerank_top`` (the default CCIPReranker; a
        caller-injected plain callable falls back to the full-scores path).
        Unlike the normal-mode fused program it does NOT need stored
        doc-vector norms — no PRF reconstruction happens here — and the
        reference-PRF compat flag is irrelevant (the reference's character
        path has no PRF stage, webui.py:386-390)."""
        from ..ops.fused_query import QUERY_TERM_BUCKETS

        return (
            len(self.index) > self.cfg.search.rerank_top_k
            and len(new_doc.split(" ")) <= QUERY_TERM_BUCKETS[-1]
            and hasattr(self.cfeature_reranker, "rerank_top")
        )

    def _find_similar_character_fused(self, new_doc: str, topn: int) -> List[Result]:
        """Character-mode query (webui.py:345-390 + 255-342 semantics): ONE
        device call in the common case (stage A scores + top-k + row-gather
        CCIP rerank fused, _character_fused_from_packed), degrading to two —
        stage A program (ops/fused_query.fused_character_top) + the reranker's
        rerank dispatch (row-gather or live) — when the one-dispatch inputs
        are unavailable or the host freshness post-check fails. Either way: no
        corpus-length D2H, no full host sort, no COO BM25 upload. The
        multi-call path computes identical results (pinned by
        tests/test_ccip_reranker_oracle.py)."""
        packed, query = self._pack_fused_with_query(new_doc)
        return self._character_fused_from_packed(packed, query, topn)

    def _character_one_dispatch_inputs(self):
        """Inputs for the whole-query one-dispatch character program, or None
        when it can't serve: reranker without the hook (caller-injected plain
        callable), reranker-side ineligibility (fused_query_inputs: learned
        metric, live mode forced, empty/oversized/ungatherable cfeature
        index), or the AIIS_CHAR_ONE_DISPATCH=0 escape hatch. Mesh engines
        get mesh-placed inputs (cfeature arrays row-sharded over the data
        axis, the doc→row map replicated) so the program runs SPMD like the
        rest of the fused query family."""
        if (os.environ.get("AIIS_CHAR_ONE_DISPATCH", "1") != "1"
                or not hasattr(self.cfeature_reranker, "fused_query_inputs")):
            return None
        return self.cfeature_reranker.fused_query_inputs(
            self._num_padded, mesh=self.mesh)

    def _character_fused_from_packed(
        self, packed: np.ndarray, query: BM25Query, topn: int
    ) -> List[Result]:
        from ..ops.fused_query import fused_character_top

        s = self.cfg.search
        term_mat, contrib_mat = self._bm25_dense
        k = s.rerank_top_k

        inputs = self._character_one_dispatch_inputs()
        if inputs is not None:
            # The whole query in ONE device call: stage A top-k + row-gather
            # CCIP rerank (models/caformer.ccip_character_query_matches_op);
            # the host validates file freshness afterwards and only falls
            # back to the classic second dispatch when that fails.
            from ..models.caformer import ccip_character_query_matches_op

            cf_matrix, cf_norms, docid_to_row, thresh_up, cap, cf_real = inputs
            out = np.asarray(ccip_character_query_matches_op(
                self._matrix_dev, term_mat, contrib_mat, packed,
                s.bm25_weight, s.doc2vec_weight,
                cf_matrix, cf_norms, docid_to_row, np.float32(thresh_up),
                vocab_size=self.bm25.vocab_size, num_docs=self._num_padded,
                k=k, cap=cap, num_real=self._num_real,
                overflow=self._bm25_overflow, ov_max_len=self._ov_max_len,
                cf_num_real=cf_real,
            ))
            self.character_fused_dispatches += 1
            self.character_one_dispatch_queries += 1
            return self._resolve_one_dispatch_row(out, k, cap, query, topn)

        out = np.asarray(fused_character_top(
            self._matrix_dev, term_mat, contrib_mat, packed,
            s.bm25_weight, s.doc2vec_weight,
            vocab_size=self.bm25.vocab_size, num_docs=self._num_padded,
            k=k, num_real=self._num_real,
            overflow=self._bm25_overflow, ov_max_len=self._ov_max_len,
        ))
        from ..ops.fused_query import decode_ids

        top10_sims = [(int(i), float(v))
                      for v, i in zip(out[:k], decode_ids(out[k:]))]
        self.character_fused_dispatches += 1
        return self.cfeature_reranker.rerank_top(
            top10_sims, topn, query.required_tags, query.exclude_tags)

    def _resolve_one_dispatch_row(self, row: np.ndarray, k: int, cap: int,
                                  query: BM25Query, topn: int) -> List[Result]:
        """Unpack ONE output row of the one-dispatch character program —
        [top_vals(k) | top_ids(k) | ok | count | cand_idx(cap) |
        cand_diffs(cap)], mirroring _character_query_matches_impl's
        concatenate — and hand it to the reranker's resolver. The single and
        batched dispatch sites must share this slicing: a layout change
        edited in one copy would silently corrupt the other. Id lanes are
        int32 bit patterns (encode_ids_f32) and decoded here."""
        from ..ops.fused_query import decode_ids

        top10_sims = [(int(d), float(v))
                      for v, d in zip(row[:k], decode_ids(row[k:2 * k]))]
        return self.cfeature_reranker.resolve_fused(
            top10_sims, bool(row[2 * k] > 0), int(row[2 * k + 1]),
            decode_ids(row[2 * k + 2: 2 * k + 2 + cap]),
            row[2 * k + 2 + cap:], cap,
            topn, query.required_tags, query.exclude_tags)

    # Micro-batch size buckets: each compiles once; a batch pads up to its bucket.
    QUERY_BATCH_BUCKETS = (2, 4, 8)

    def fused_path_available(self, new_doc: str, search_mode: str = "normal") -> bool:
        from ..ops.fused_query import QUERY_TERM_BUCKETS

        return (
            search_mode != "character oriented"
            and not self._reference_prf  # fused program implements the intended PRF
            and self._norms_known
            and len(self.index) > self.cfg.search.rerank_top_k
            # truly enormous queries (> largest term bucket) take the multi-call
            # path rather than failing; they're outside any interactive use
            and len(new_doc.split(" ")) <= QUERY_TERM_BUCKETS[-1]
        )

    def find_similar_documents_batch(
        self, new_docs: Sequence[str], topn: int = 50, search_mode: str = "normal"
    ) -> List[Union[List[Result], Exception]]:
        """Serve B concurrent queries in ONE device call (the webui micro-batcher's
        backend). Queries that can't ride the fused path fall back individually.

        Errors are isolated per query: a bad query (e.g. an unknown tag) gets
        its own Exception as its result entry instead of poisoning every query
        coalesced into the same micro-batch — callers must check each entry."""
        from ..ops.fused_query import fused_normal_query_batch

        if search_mode == "character oriented":
            return self._character_batch(new_docs, topn)

        results: List[Optional[Union[List[Result], Exception]]] = \
            [None] * len(new_docs)
        fused_pos = []
        packed = []
        for i, doc in enumerate(new_docs):
            try:
                if self.fused_path_available(doc, search_mode):
                    # pack here (not below): an unknown tag raises during
                    # parse/inference, and must fail only ITS query
                    buf = self._pack_fused(doc)
                    fused_pos.append(i)
                    packed.append(buf)
                else:
                    results[i] = self.find_similar_documents(doc, topn, search_mode)
            except Exception as e:  # noqa: BLE001 — per-query isolation
                results[i] = e
        if packed:
            buflen = max(p.shape[0] for p in packed)
            if any(p.shape[0] != buflen for p in packed):
                # mixed term buckets — repack everything at the batch's largest
                # so one program serves the whole stack (repack can't fail: the
                # queries already packed once at a smaller bucket)
                mt = (buflen - self.model.vector_size - 1) // 4
                packed = [self._pack_fused(new_docs[i], max_terms=mt)
                          for i in fused_pos]

        s = self.cfg.search
        while packed:
            take = min(len(packed), self.QUERY_BATCH_BUCKETS[-1])
            chunk_pos, chunk_packed = fused_pos[:take], packed[:take]
            fused_pos, packed = fused_pos[take:], packed[take:]
            if take == 1:
                # a lone query (or lone chunk remainder) rides the warm
                # single-query program, not an 8-wide batch of padding
                p = chunk_packed[0]
                out = self._dispatch_fused(p, topn)
                results[chunk_pos[0]] = self._assemble_fused(
                    np.asarray(out), topn,
                    exact_fn=lambda p=p: self._dispatch_fused(p, topn, exact=True))
                continue
            # each chunk picks the smallest batch bucket that fits it — a
            # 9-query burst runs as 8 + 1, not 8 + an 8-wide padded remainder
            bucket = next(b for b in self.QUERY_BATCH_BUCKETS if take <= b)
            batch = np.stack(chunk_packed + [chunk_packed[0]] * (bucket - take))
            term_mat, contrib_mat = self._bm25_dense
            out = np.asarray(fused_normal_query_batch(
                self._matrix_dev, self._norms_dev, term_mat, contrib_mat,
                batch,
                s.bm25_weight, s.doc2vec_weight,
                s.original_score_weight, s.reranked_score_weight,
                vocab_size=self.bm25.vocab_size,
                num_docs=self._num_padded, topn=topn, k=s.rerank_top_k,
                num_real=self._num_real, diff_thresh=s.diff_filter_thresh,
                overflow=self._bm25_overflow, ov_max_len=self._ov_max_len,
            ))
            for j, i in enumerate(chunk_pos):
                p = batch[j]
                results[i] = self._assemble_fused(
                    out[j], topn,
                    exact_fn=lambda p=p: self._dispatch_fused(p, topn, exact=True))
        return results  # type: ignore[return-value]

    def _character_batch(
        self, new_docs: Sequence[str], topn: int
    ) -> List[Union[List[Result], Exception]]:
        """B concurrent character-mode queries: stage A batched into one
        vmapped device program (``fused_character_top_batch``, chunked by the
        same batch buckets as normal mode), stage B batched by the reranker
        (gather-eligible queries share one dispatch). Queries that can't ride
        the fused stage A fall back individually; errors stay per-query."""
        from ..ops.fused_query import fused_character_top_batch

        mode = "character oriented"
        results: List[Optional[Union[List[Result], Exception]]] = \
            [None] * len(new_docs)
        fused_pos: List[int] = []
        packed = []
        queries = []
        for i, doc in enumerate(new_docs):
            try:
                if self.character_fused_available(doc):
                    buf, q = self._pack_fused_with_query(doc)
                    fused_pos.append(i)
                    packed.append(buf)
                    queries.append(q)
                else:
                    results[i] = self.find_similar_documents(doc, topn, mode)
            except Exception as e:  # noqa: BLE001 — per-query isolation
                results[i] = e
        if packed:
            buflen = max(p.shape[0] for p in packed)
            if any(p.shape[0] != buflen for p in packed):
                # mixed term buckets — repack at the batch's largest
                mt = (buflen - self.model.vector_size - 1) // 4
                packed = [self._pack_fused(new_docs[i], max_terms=mt)
                          for i in fused_pos]

        s = self.cfg.search
        k = s.rerank_top_k
        term_mat, contrib_mat = self._bm25_dense
        # loop-invariant: the one-dispatch inputs can't change mid-batch
        one_dispatch_inputs = (
            self._character_one_dispatch_inputs() if packed else None)
        while packed:
            take = min(len(packed), self.QUERY_BATCH_BUCKETS[-1])
            chunk_pos, chunk_packed = fused_pos[:take], packed[:take]
            chunk_queries = queries[:take]
            fused_pos, packed, queries = \
                fused_pos[take:], packed[take:], queries[take:]
            if take == 1:
                # lone query rides the single-query stage A program, reusing
                # the buffer/parse already computed in the eligibility loop
                try:
                    results[chunk_pos[0]] = self._character_fused_from_packed(
                        chunk_packed[0], chunk_queries[0], topn)
                except Exception as e:  # noqa: BLE001
                    results[chunk_pos[0]] = e
                continue
            bucket = next(b for b in self.QUERY_BATCH_BUCKETS if take <= b)
            batch = np.stack(chunk_packed + [chunk_packed[0]] * (bucket - take))

            if one_dispatch_inputs is not None:
                # the whole BURST in one device call: vmapped stage A +
                # row-gather rerank (one relay round trip instead of two)
                from ..models.caformer import (
                    ccip_character_query_matches_batch_op,
                )

                cf_matrix, cf_norms, docid_to_row, thresh_up, cap, cf_real = \
                    one_dispatch_inputs
                out = np.asarray(ccip_character_query_matches_batch_op(
                    self._matrix_dev, term_mat, contrib_mat, batch,
                    s.bm25_weight, s.doc2vec_weight,
                    cf_matrix, cf_norms, docid_to_row, np.float32(thresh_up),
                    vocab_size=self.bm25.vocab_size, num_docs=self._num_padded,
                    k=k, cap=cap, num_real=self._num_real,
                    overflow=self._bm25_overflow, ov_max_len=self._ov_max_len,
                    cf_num_real=cf_real,
                ))
                self.character_fused_dispatches += take
                self.character_one_dispatch_queries += take
                for j, i in enumerate(chunk_pos):
                    try:
                        results[i] = self._resolve_one_dispatch_row(
                            out[j], k, cap, chunk_queries[j], topn)
                    except Exception as e:  # noqa: BLE001 — per-query isolation
                        results[i] = e
                continue

            out = np.asarray(fused_character_top_batch(
                self._matrix_dev, term_mat, contrib_mat, batch,
                s.bm25_weight, s.doc2vec_weight,
                vocab_size=self.bm25.vocab_size, num_docs=self._num_padded,
                k=k, num_real=self._num_real,
                overflow=self._bm25_overflow, ov_max_len=self._ov_max_len,
            ))
            from ..ops.fused_query import decode_ids

            tops = [
                [(int(d), float(v))
                 for v, d in zip(out[j][:k], decode_ids(out[j][k:]))]
                for j in range(take)
            ]
            self.character_fused_dispatches += take
            try:
                reranked = self.cfeature_reranker.rerank_top_batch(
                    tops, topn,
                    [q.required_tags for q in chunk_queries],
                    [q.exclude_tags for q in chunk_queries],
                ) if hasattr(self.cfeature_reranker, "rerank_top_batch") else [
                    self.cfeature_reranker.rerank_top(
                        t, topn, q.required_tags, q.exclude_tags)
                    for t, q in zip(tops, chunk_queries)
                ]
                for i, r in zip(chunk_pos, reranked):
                    results[i] = r
            except Exception as e:  # noqa: BLE001 — batch-wide rerank failure
                for i in chunk_pos:
                    results[i] = e
        return results  # type: ignore[return-value]

    # ------------------------------------------------------------------ rerank

    def get_embedded_vectors_by_doc_ids(self, doc_ids: Sequence[int]) -> np.ndarray:
        """Re-infer stored docs' vectors from their tags, batched
        (reference does this one doc at a time with a ±1 index dance —
        webui.py:182-187,198; QUIRKS.md #4)."""
        docs = [
            self.image_files_name_tags_arr[doc_id].split(",")[1:] for doc_id in doc_ids
        ]
        return self.model.infer_vectors(docs)

    def _gensim_sparse_scores(self, pairs: List[Tuple[int, float]]) -> np.ndarray:
        """Score a gensim-style sparse query against the index exactly the way
        gensim does (Similarity.__getitem__ chain): matutils.unitvec's sparse
        branch normalizes over ALL pairs (asserting on a zero-norm document),
        then matutils.sparse2full densifies via dict() — DUPLICATE feature ids
        keep the LAST value — and the dense f32 matvec runs over the stored
        unit rows. The duplicate-collapse-after-normalize order is load-bearing
        for the reference-PRF bug emulation."""
        length = math.sqrt(sum(float(val) ** 2 for _, val in pairs))
        assert length > 0.0, (
            "sparse documents must not contain any explicit zero entries")
        collapsed = {int(tid): np.float32(float(val) / length)
                     for tid, val in pairs}
        dense = np.zeros(self.index.num_features, dtype=np.float32)
        for tid, val in collapsed.items():
            dense[tid] = val
        return self.index.matrix @ dense

    def _doc2vec_rerank_reference_bug(
        self, final_scores: np.ndarray, topn: int
    ) -> List[Result]:
        """The reference's PRF rerank AS BUILT (webui.py:189-253), bug included:
        each top-10 doc vector becomes an (index, value) tuple array, the
        score-weighted mean is Frobenius-normalized INCLUDING the index column
        (norm >= 2992 for 300-d vectors, so round(index/norm) collapses every
        feature id to 0), and gensim's sparse-query chain reduces the rescan to
        ``unit_rows[:, 0] * (mean[-1] / ||mean||)`` — a perturbation by each
        doc's feature-0 component. Enabled by AIIS_REFERENCE_PRF=1 so as-built
        normal-mode tail orderings can be reproduced bit-for-bit (VERDICT r3
        #2); the default path implements the intended math (QUIRKS #5).

        Faithfully crashes where the reference crashes: ZeroDivisionError when
        the top-10 scores sum to zero (np.average), ValueError from round(nan)
        when -inf require/exclude scores reach the top-10 (QUIRKS #15 applies
        only to the fixed path), AssertionError on a zero mean vector (gensim
        unitvec).
        """
        sims: List[Result] = sorted(enumerate(final_scores), key=lambda it: -it[1])
        k = self.cfg.search.rerank_top_k
        if len(sims) <= k:
            sims = filter_searched_result(
                sims, thresh=self.cfg.search.diff_filter_thresh)
            return sims[: min(topn, len(sims))]

        top10_sims = sims[:k]
        top10_doc_ids = [int(d) for d, _ in top10_sims]
        top10_vecs = self.get_embedded_vectors_by_doc_ids(top10_doc_ids)
        dim = top10_vecs.shape[1]
        # (k, dim, 2) stack of (feature_index, value) pairs — the reference's
        # List[List[Tuple[int, float]]] as np.average sees it
        idx_col = np.broadcast_to(np.arange(dim, dtype=np.float64)[:, None],
                                  (dim, 1))
        tuple_arrays = np.concatenate(
            [np.broadcast_to(idx_col, (len(top10_vecs), dim, 1)),
             top10_vecs.astype(np.float64)[:, :, None]], axis=2)
        weights = [float(s) for _, s in top10_sims]
        weighted_mean_vec = np.average(tuple_arrays, axis=0, weights=weights)
        weighted_mean_vec = weighted_mean_vec / np.linalg.norm(weighted_mean_vec)
        pairs = [(round(docid), val) for docid, val in weighted_mean_vec.tolist()]
        reranked_scores = self._gensim_sparse_scores(pairs)

        reranked_final = (
            self.cfg.search.original_score_weight * final_scores
            + self.cfg.search.reranked_score_weight * reranked_scores
        )
        if reranked_final.max() > 0:
            reranked_final = reranked_final / reranked_final.max()
        return assemble_prf_results(
            top10_doc_ids, reranked_final, topn,
            diff_thresh=self.cfg.search.diff_filter_thresh)

    def doc2vec_rerank(self, final_scores: np.ndarray, topn: int) -> List[Result]:
        """Pseudo-relevance-feedback rerank (webui.py:189-253).

        Implements the *intended* math: score-weighted mean of the top-10 documents'
        re-inferred vectors, L2-normalized, rescored against the whole index (one
        matvec), fused 0.7/0.3 with the original scores. The reference's tuple-array
        normalization bug made this a near-no-op; see QUIRKS.md #5.

        Latency path: top-k runs on device (lax.top_k breaks ties by lowest index,
        matching Python's stable sort over enumerate()), so the host never sorts the
        full corpus — only the ≤ topn+10 candidate rows.
        """
        from ..ops.cosine import top_k_scores

        if self._reference_prf:
            return self._doc2vec_rerank_reference_bug(final_scores, topn)

        k = self.cfg.search.rerank_top_k
        n_docs = len(final_scores)
        if n_docs > k:
            import jax.numpy as jnp

            scores_dev = jnp.asarray(final_scores.astype(np.float32))
            top_vals, top_idx = top_k_scores(scores_dev, k)
            top10_doc_ids = [int(i) for i in np.asarray(top_idx)]
            top10_scores = np.asarray(top_vals, dtype=np.float64)
            top10_doc_ids_set = set(top10_doc_ids)

            top10_vecs = self.get_embedded_vectors_by_doc_ids(top10_doc_ids)
            weights = top10_scores
            if not np.isfinite(weights).all():
                # -inf require/exclude scores reached the top-10 (< 10 docs match a
                # +required tag). The reference's np.average turns NaN here and every
                # tail score is rejected downstream (webui.py:200-211, QUIRKS.md #15);
                # reproduce that output — pinned top-10, no tail — without doing any
                # NaN arithmetic (VERDICT r2 weak #3).
                return assemble_prf_results(
                    top10_doc_ids, np.full(n_docs, -np.inf), topn,
                    diff_thresh=self.cfg.search.diff_filter_thresh)
            wsum = weights.sum()
            if wsum == 0:
                weights = np.ones_like(weights)
                wsum = weights.sum()
            mean_vec = (weights[:, None] * top10_vecs).sum(axis=0) / wsum
            norm = np.linalg.norm(mean_vec)
            if norm > 0:
                mean_vec = mean_vec / norm
            reranked_scores = self.index[mean_vec.astype(np.float32)]

            reranked_final = (
                self.cfg.search.original_score_weight * final_scores
                + self.cfg.search.reranked_score_weight * reranked_scores
            )
            global_max = float(reranked_final.max())
            if global_max > 0:
                reranked_final = reranked_final / global_max

            return assemble_prf_results(
                top10_doc_ids, reranked_final, topn,
                diff_thresh=self.cfg.search.diff_filter_thresh)

        sims: List[Result] = sorted(enumerate(final_scores), key=lambda it: -it[1])
        sims = filter_searched_result(
            sims, thresh=self.cfg.search.diff_filter_thresh)
        return sims[: min(topn, len(sims))]

    # ------------------------------------------------------------------ results

    def search(
        self, new_doc: str, topn: Optional[int] = None, search_mode: str = "normal",
        similar_docs: Optional[List[Result]] = None,
    ) -> List[ResultInfo]:
        """Full result assembly with NG-word filtering and --rep path rewriting
        (webui.py:580-609). ``similar_docs`` short-circuits the ranking stage —
        the webui micro-batcher computes it via find_similar_documents_batch."""
        topn = topn if topn is not None else self.cfg.search.topn
        if similar_docs is None:
            similar_docs = self.find_similar_documents(new_doc, topn=topn, search_mode=search_mode)
        found: List[ResultInfo] = []
        for doc_id, similarity in similar_docs:
            try:
                splited = self.image_files_name_tags_arr[doc_id].split(",")
                if is_include_ng_word(splited, self.cfg.search.ng_words):
                    continue
                fpath = splited[0]
                if self.rep:
                    fpath = fpath.replace(self.rep[0], self.rep[1])
                found.append(ResultInfo(fpath, doc_id, float(similarity), splited[1:]))
            except Exception as e:  # noqa: BLE001 — skip bad rows like the reference
                print(f"Error: {e}")
                continue
        return found
