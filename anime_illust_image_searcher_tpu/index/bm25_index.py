"""BM25 index build, persistence, and device-side representation.

Build semantics follow genmodel.py:51-99 exactly: per-document term-frequency maps over
dictionary term ids, doc length = number of in-dictionary tag occurrences, avgdl = mean
length, D = number of docs, idf = log(1 + (D - df + 0.5) / (df + 0.5)).

Persistence keeps the reference's five artifact files with the same names and logical
payloads (genmodel.py:84-97): ``bm25_corpus`` (list of {term_id: tf}), ``bm25_idf``
({term_id: idf}), ``bm25_avgdl`` (float), ``bm25_D`` (int), ``bm25_doc_lengths``
(ndarray). The device form (sorted COO + precomputed contributions) is derived on load.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import BM25Config
from . import artifacts
from .dictionary import TagDictionary


@dataclass
class BM25Stats:
    corpus: List[Dict[int, int]]   # per-doc {term_id: tf}
    idf: Dict[int, float]
    avgdl: float
    num_docs: int
    doc_lengths: np.ndarray


def build_bm25_stats(corpus: Sequence[Sequence[str]], dictionary: TagDictionary) -> BM25Stats:
    bm25_corpus: List[Dict[int, int]] = []
    doc_lengths: List[int] = []
    term_doc_freq: Dict[int, int] = {}
    num_docs = len(corpus)

    for tags in corpus:
        term_ids = [dictionary.token2id[tag] for tag in tags if tag in dictionary.token2id]
        term_freq: Dict[int, int] = {}
        for term_id in term_ids:
            term_freq[term_id] = term_freq.get(term_id, 0) + 1
        bm25_corpus.append(term_freq)
        doc_lengths.append(len(term_ids))
        for term_id in term_freq:
            term_doc_freq[term_id] = term_doc_freq.get(term_id, 0) + 1

    lengths = np.array(doc_lengths)
    avgdl = float(np.mean(lengths)) if num_docs else 0.0
    idf = {
        term_id: float(np.log(1 + (num_docs - df + 0.5) / (df + 0.5)))
        for term_id, df in term_doc_freq.items()
    }
    return BM25Stats(bm25_corpus, idf, avgdl, num_docs, lengths)


def save_bm25_artifacts(stats: BM25Stats, directory: str = ".") -> None:
    import os

    def dump(name: str, obj) -> None:
        with open(os.path.join(directory, name), "wb") as f:
            pickle.dump(obj, f)

    dump(artifacts.BM25_CORPUS, stats.corpus)
    dump(artifacts.BM25_IDF, stats.idf)
    dump(artifacts.BM25_AVGDL, stats.avgdl)
    dump(artifacts.BM25_D, stats.num_docs)
    dump(artifacts.BM25_DOC_LENGTHS, stats.doc_lengths)
    print("BM25 index generated")


def load_bm25_artifacts(directory: str = ".") -> BM25Stats:
    import os

    def load(name: str):
        with open(os.path.join(directory, name), "rb") as f:
            return pickle.load(f)

    return BM25Stats(
        corpus=load(artifacts.BM25_CORPUS),
        idf=load(artifacts.BM25_IDF),
        avgdl=load(artifacts.BM25_AVGDL),
        num_docs=load(artifacts.BM25_D),
        doc_lengths=np.asarray(load(artifacts.BM25_DOC_LENGTHS)),
    )


# Dense-width policy for the fused program's comparison sweep: the sweep is
# O(D · W · Q), so ONE outlier doc with ~300 distinct tags inflates W — and
# every query's cost — for the whole corpus (measured 10.6 → 44 ms/query at
# 1M docs going W=32 → 304; ARCHITECTURE §3). The dense width therefore covers
# every doc up to max(32, the 99.9th-percentile length); the rare longer docs
# spill their remaining (term, contrib) pairs into a COO overflow scored by a
# tiny scatter-add inside the same fused program (exact: integer-weighted f32
# adds of disjoint slots; measured ~0.1 ms at 4096 spilled pairs / 1M docs —
# a capped outlier corpus queries at 10.7 ms where the uncapped layout took
# 44.5). Corpora whose max length fits the cap keep today's layout
# bit-for-bit (no overflow, same programs); the 32 floor only matters when
# p99.9 is below it, exactly the typical tagger corpus (10-30 tags/doc).
SLOT_CAP_MIN = 32
# Safety valve: if the spill would be big (pathological corpora where MANY
# docs exceed the cap), fall back to the full dense width — never worse than
# the uncapped layout. Expressed as a fraction of docs' worth of slots.
_OVERFLOW_NNZ_LIMIT = lambda num_docs: max(4096, num_docs // 16)  # noqa: E731


def _empty_i32() -> np.ndarray:
    return np.zeros((0,), np.int32)


def _empty_f32() -> np.ndarray:
    return np.zeros((0,), np.float32)


@dataclass
class BM25DeviceIndex:
    """Device layouts for BM25 scoring.

    Two forms are derived from the same stats:
      - sorted COO (doc_ids/term_ids/contrib) for the standalone segment-sum op
        (ops/bm25.py);
      - dense padded rows (term_mat/contrib_mat, width = max distinct terms per
        doc up to the SLOT_CAP_MIN/p99.9 policy above) for the fused query
        program — scoring becomes one gather + row reduction with NO scatters,
        which measured ~3× faster per query at 100k docs. Padding slots carry
        the sentinel term id ``vocab_size`` whose query-side weight is defined
        as 0. Docs longer than the dense width spill their tail pairs into
        ov_doc/ov_term/ov_contrib (empty for typical corpora).
    """

    doc_ids: np.ndarray     # (nnz,) int32, sorted
    term_ids: np.ndarray    # (nnz,) int32
    contrib: np.ndarray     # (nnz,) f32
    term_mat: np.ndarray    # (D, W) int32, padded with vocab_size
    contrib_mat: np.ndarray  # (D, W) f32, padded with 0
    vocab_size: int
    num_docs: int
    # COO spill of per-doc pairs beyond the dense width (doc order preserved)
    ov_doc: np.ndarray = None       # type: ignore[assignment]  # (nnz_o,) int32
    ov_term: np.ndarray = None      # type: ignore[assignment]  # (nnz_o,) int32
    ov_contrib: np.ndarray = None   # type: ignore[assignment]  # (nnz_o,) f32
    # max distinct terms in any single doc (dense + overflow) — the fused
    # program's require/exclude base-encode bound must cover the TRUE per-doc
    # hit count, not just the dense width
    max_doc_len: int = 0

    def __post_init__(self):
        if self.ov_doc is None:
            self.ov_doc = _empty_i32()
        if self.ov_term is None:
            self.ov_term = _empty_i32()
        if self.ov_contrib is None:
            self.ov_contrib = _empty_f32()
        if not self.max_doc_len:
            self.max_doc_len = int(self.term_mat.shape[1]) if self.num_docs else 0

    @staticmethod
    def from_stats(stats: BM25Stats, vocab_size: int, cfg: BM25Config = BM25Config()) -> "BM25DeviceIndex":
        # Vectorized over the flattened (doc, term) pairs — the per-dict python
        # loops cost ~3 s of every engine startup at 100k docs / 1.9M nnz. All
        # arithmetic stays f64 (like the old python-float loop) before the final
        # f32 cast, and dict order is preserved, so the layout is bit-identical.
        k1, b = cfg.k1, cfg.b
        avgdl = stats.avgdl if stats.avgdl else 1.0
        num_docs = stats.num_docs

        lens = np.fromiter((len(tf) for tf in stats.corpus), np.int64, num_docs)
        nnz = int(lens.sum())
        doc_ids = np.repeat(np.arange(num_docs, dtype=np.int32), lens)
        term_ids = np.fromiter(
            (t for tf in stats.corpus for t in tf), np.int32, nnz)
        tfs = np.fromiter(
            (v for tf in stats.corpus for v in tf.values()), np.float64, nnz)

        idf_arr = np.zeros(vocab_size + 1, np.float64)
        if stats.idf:
            idf_keys = np.fromiter(stats.idf.keys(), np.int64, len(stats.idf))
            idf_arr[idf_keys] = np.fromiter(
                stats.idf.values(), np.float64, len(stats.idf))
        dl = np.asarray(stats.doc_lengths, np.float64)
        norm_doc = k1 * (1 - b + b * (dl / avgdl))            # (D,)
        contrib = idf_arr[term_ids] * (tfs * (k1 + 1)) / (tfs + norm_doc[doc_ids])

        max_len = int(lens.max()) if num_docs else 1
        width_full = max(8, (max_len + 7) // 8 * 8)  # sublane-friendly
        width = width_full
        if num_docs and width_full > SLOT_CAP_MIN:
            # dense-width cap (see module note): cover >= 99.9% of docs and at
            # least SLOT_CAP_MIN slots; longer docs spill to the COO overflow
            p999 = int(np.percentile(lens, 99.9))
            cap = max(SLOT_CAP_MIN, (p999 + 7) // 8 * 8)
            if cap < width_full:
                nnz_o = int(np.maximum(lens - cap, 0).sum())
                if nnz_o <= _OVERFLOW_NNZ_LIMIT(num_docs):
                    width = cap

        term_mat = np.full((num_docs, width), vocab_size, dtype=np.int32)
        contrib_mat = np.zeros((num_docs, width), dtype=np.float32)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if num_docs else np.zeros(0)
        col = np.arange(nnz, dtype=np.int64) - np.repeat(starts, lens)
        contrib32 = contrib.astype(np.float32)
        dense = col < width
        term_mat[doc_ids[dense], col[dense]] = term_ids[dense]
        contrib_mat[doc_ids[dense], col[dense]] = contrib32[dense]
        spill = ~dense

        return BM25DeviceIndex(
            doc_ids=doc_ids,
            term_ids=term_ids,
            contrib=contrib32,
            term_mat=term_mat,
            contrib_mat=contrib_mat,
            vocab_size=vocab_size,
            num_docs=num_docs,
            ov_doc=doc_ids[spill],
            ov_term=term_ids[spill],
            ov_contrib=contrib32[spill],
            max_doc_len=max_len,
        )

    def to_device(self):
        import jax.numpy as jnp

        return (jnp.asarray(self.doc_ids), jnp.asarray(self.term_ids), jnp.asarray(self.contrib))

    def to_device_dense(self):
        import jax.numpy as jnp

        return (jnp.asarray(self.term_mat), jnp.asarray(self.contrib_mat))

    def overflow_device(self):
        """Device triple (ov_doc, ov_term, ov_contrib) for the fused program's
        COO spill path, or None when no doc exceeded the dense width (the
        common case — the program then compiles without the scatter stage)."""
        import jax.numpy as jnp

        if len(self.ov_doc) == 0:
            return None
        return (jnp.asarray(np.ascontiguousarray(self.ov_doc)),
                jnp.asarray(np.ascontiguousarray(self.ov_term)),
                jnp.asarray(np.ascontiguousarray(self.ov_contrib)))

    # ---- serving cache -------------------------------------------------------
    #
    # At 1M docs, unpickling ``bm25_corpus`` (1M python dicts) costs ~80 s and
    # ``from_stats`` another ~90 s of python iteration — the bulk of engine
    # cold start (VERDICT r3 #3 / ARCHITECTURE §3). The five reference-named
    # pickles stay the canonical artifacts; this cache persists the DERIVED
    # device-form arrays as memory-mappable .npy sidecars keyed by a
    # fingerprint of the pickles + the scoring config, so a warm serving
    # restart skips both costs entirely (np.load(mmap_mode='r') is lazy; the
    # H2D transfer faults the pages sequentially).

    _CACHE_ARRAYS = ("doc_ids", "term_ids", "contrib", "term_mat", "contrib_mat",
                     "ov_doc", "ov_term", "ov_contrib")

    @staticmethod
    def _cache_fingerprint(directory: str, vocab_size: int, cfg: BM25Config) -> dict:
        import os

        fp: dict = {
            # v2: capped dense width + COO overflow arrays + max_doc_len in the
            # manifest (v1 caches auto-invalidate on this mismatch)
            "format": "aiis-bm25-servecache-v2",
            "vocab_size": int(vocab_size),
            "k1": float(cfg.k1),
            "b": float(cfg.b),
        }
        for name in (artifacts.BM25_CORPUS, artifacts.BM25_IDF,
                     artifacts.BM25_AVGDL, artifacts.BM25_D,
                     artifacts.BM25_DOC_LENGTHS):
            st = os.stat(os.path.join(directory, name))
            fp[name] = [int(st.st_size), int(st.st_mtime_ns)]
        return fp

    @staticmethod
    def cache_dir(directory: str) -> str:
        import os

        return os.path.join(directory, artifacts.BM25_SERVE_CACHE)

    @staticmethod
    def load_cached(directory: str, vocab_size: int,
                    cfg: BM25Config = BM25Config()) -> "BM25DeviceIndex | None":
        """Load the device-form arrays from the serving cache, or None if the
        cache is absent or stale (pickles changed, different cfg/vocab)."""
        import json
        import os

        d = BM25DeviceIndex.cache_dir(directory)
        try:
            from ..utils.sidecar_cache import read_manifest

            manifest = read_manifest(d)
            if manifest is None or manifest.get("fp") != \
                    BM25DeviceIndex._cache_fingerprint(directory, vocab_size, cfg):
                return None
            arrs = {
                name: np.load(os.path.join(d, name + ".npy"), mmap_mode="r")
                for name in BM25DeviceIndex._CACHE_ARRAYS
            }
            return BM25DeviceIndex(
                vocab_size=vocab_size, num_docs=int(manifest["num_docs"]),
                max_doc_len=int(manifest["max_doc_len"]), **arrs)
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return None

    def write_cache(self, directory: str, cfg: BM25Config = BM25Config(),
                    fp: Optional[dict] = None) -> None:
        """Persist the derived arrays. The manifest is written LAST (tmp+rename),
        so a matching manifest implies complete array files; a concurrent writer
        of the same fingerprint produces identical bytes
        (utils/sidecar_cache.py protocol).

        ``fp``: the fingerprint captured BEFORE the pickles were read. If the
        pickles changed while the arrays were being derived (a genmodel rebuild
        racing a serving cold start), the manifest is not written — stamping
        the NEW pickles' fingerprint over arrays derived from the OLD ones
        would poison every future start."""
        import os

        from ..utils.sidecar_cache import atomic_put, write_manifest

        if fp is None:
            fp = self._cache_fingerprint(directory, self.vocab_size, cfg)
        d = BM25DeviceIndex.cache_dir(directory)
        os.makedirs(d, exist_ok=True)
        for name in self._CACHE_ARRAYS:
            arr = np.ascontiguousarray(getattr(self, name))
            atomic_put(d, name + ".npy",
                       lambda f, arr=arr: np.save(f, arr))
        if self._cache_fingerprint(directory, self.vocab_size, cfg) != fp:
            return  # source pickles changed mid-derivation: leave cache stale
        write_manifest(d, {"fp": fp, "num_docs": int(self.num_docs),
                           "max_doc_len": int(self.max_doc_len)})

    @staticmethod
    def load_or_build(directory: str, vocab_size: int,
                      cfg: BM25Config = BM25Config(),
                      write_cache: bool = True) -> "BM25DeviceIndex":
        """Serving entry point: mmap the cache when fresh, else derive from the
        pickles and (best-effort) write the cache for the next start."""
        cached = BM25DeviceIndex.load_cached(directory, vocab_size, cfg)
        if cached is not None:
            return cached
        try:
            fp = BM25DeviceIndex._cache_fingerprint(directory, vocab_size, cfg)
        except OSError:
            fp = None  # artifacts racing; write_cache re-derives and re-checks
        stats = load_bm25_artifacts(directory)
        built = BM25DeviceIndex.from_stats(stats, vocab_size=vocab_size, cfg=cfg)
        if write_cache:
            try:
                built.write_cache(directory, cfg=cfg, fp=fp)
            except OSError:
                pass  # read-only artifact dir: serve without the cache
        return built
