"""Dense vector similarity index.

Replaces gensim's ``Similarity``/``MatrixSimilarity`` (reference: genmodel.py:171,
webui.py:352, gen_cfeatures.py:307-315). gensim L2-normalizes each stored vector and
each query, so "similarity" is cosine; scoring the whole index is a single (D, F) @ (F,)
matvec — exactly the MXU-shaped op we want on TPU.

Design points:
  - storage is a single .npy matrix with a tiny JSON sidecar; ``add_documents`` appends
    in O(amortized) via capacity doubling and is flushed on ``save``
  - queries run through a jitted matvec kept on device; the matrix is transferred once
    and cached (important for the ≤10 ms query target — no per-query H2D of the index)
  - zero vectors normalize to zero (gensim's matutils.unitvec behavior)
  - a ``vector_by_id`` accessor mirrors gensim's Similarity API used by the CCIP
    reranker (webui.py:309)
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple, Union

import numpy as np

Vector = Union[np.ndarray, Sequence[Tuple[int, float]]]


def _to_dense(vec: Vector, num_features: int) -> np.ndarray:
    if isinstance(vec, np.ndarray):
        arr = np.asarray(vec, dtype=np.float32)
        if arr.shape != (num_features,):
            raise ValueError(f"expected ({num_features},), got {arr.shape}")
        return arr
    dense = np.zeros(num_features, dtype=np.float32)
    for idx, val in vec:
        dense[int(round(idx))] = val
    return dense


def unitvec(v: np.ndarray) -> np.ndarray:
    norm = float(np.linalg.norm(v))
    if norm == 0.0 or not np.isfinite(norm):
        return v.astype(np.float32)
    return (v / norm).astype(np.float32)


class SimilarityIndex:
    """Append-able cosine-similarity index over unit-normalized vectors."""

    def __init__(self, path: str, vectors: Optional[Sequence[Vector]] = None,
                 num_features: int = 0) -> None:
        self.path = path
        self.num_features = num_features
        # Free-form metadata persisted in the .meta.json sidecar (e.g. the
        # 'build_started' stamp the CCIP reranker's freshness check reads).
        self.meta: dict = {}
        self._n = 0
        self._matrix = np.zeros((0, num_features), dtype=np.float32)
        # Pre-normalization L2 norms of stored vectors. Lets callers reconstruct the
        # raw vector (row * norm) without re-running inference — the PRF reranker's
        # latency path (search/engine.py).
        self._norms = np.zeros((0,), dtype=np.float32)
        # Per-row extraction stamps (epoch seconds): the moment the build that
        # extracted row i STARTED — a file modified after its row's stamp may
        # be stale. 0.0 = unknown (builder didn't stamp); persisted only when
        # any row is stamped, so non-feature indexes grow no extra sidecar.
        self._stamps = np.zeros((0,), dtype=np.float64)
        self._device_matrix = None  # lazily transferred jax array
        self._device_norms = None
        if vectors:
            self.add_documents(vectors)

    # ---- construction -------------------------------------------------------

    def add_documents(self, vectors: Sequence[Vector], stamp: float = 0.0) -> None:
        """Append vectors. ``stamp``: extraction stamp recorded for each new
        row (epoch seconds at which the extracting build started); 0.0 means
        the caller doesn't track freshness (e.g. the Doc2Vec index)."""
        raw = [_to_dense(v, self.num_features) for v in vectors]
        norms = np.asarray([float(np.linalg.norm(v)) for v in raw], dtype=np.float32)
        dense = np.stack([unitvec(v) for v in raw])
        needed = self._n + len(dense)
        self._grow_to(needed)
        self._matrix[self._n : needed] = dense
        self._norms[self._n : needed] = norms
        self._stamps[self._n : needed] = stamp
        self._n = needed
        self._device_matrix = None  # invalidate device cache
        self._device_norms = None

    def _grow_to(self, needed: int) -> None:
        if needed <= self._matrix.shape[0]:
            return
        new_cap = max(needed, max(16, self._matrix.shape[0] * 2))
        grown = np.zeros((new_cap, self.num_features), dtype=np.float32)
        grown[: self._n] = self._matrix[: self._n]
        self._matrix = grown
        grown_n = np.zeros((new_cap,), dtype=np.float32)
        grown_n[: self._n] = self._norms[: self._n]
        self._norms = grown_n
        grown_s = np.zeros((new_cap,), dtype=np.float64)
        grown_s[: self._n] = self._stamps[: self._n]
        self._stamps = grown_s

    def extend_from(self, other: "SimilarityIndex") -> None:
        """Copy another index's rows VERBATIM: unit rows and their original
        pre-normalization norms. The revision-bump copy in gen_cfeatures must
        use this, not add_documents(unit rows) — re-deriving norms from
        already-normalized rows would record 1.0 and silently corrupt raw-
        feature reconstruction (row * norm) in the reranker's gather path."""
        if other.num_features != self.num_features:
            raise ValueError(
                f"feature dim mismatch: {other.num_features} != {self.num_features}")
        m = len(other)
        needed = self._n + m
        self._grow_to(needed)
        self._matrix[self._n : needed] = other.matrix
        self._norms[self._n : needed] = other.norms
        # copied rows keep their own extraction stamps; rows the old builder
        # never stamped fall back to its build-start estimate
        stamps = np.asarray(other.stamps, np.float64).copy()
        if m:
            stamps[stamps == 0.0] = other.build_started()
        self._stamps[self._n : needed] = stamps
        self._n = needed
        self._device_matrix = None
        self._device_norms = None

    # ---- persistence --------------------------------------------------------

    def save(self, path: Optional[str] = None) -> None:
        path = path or self.path
        np.save(path + ".npy", self._matrix[: self._n])
        np.save(path + ".norms.npy", self._norms[: self._n])
        if np.any(self._stamps[: self._n] > 0):
            np.save(path + ".stamps.npy", self._stamps[: self._n])
        with open(path + ".meta.json", "w", encoding="utf-8") as f:
            json.dump({**self.meta, "num_features": self.num_features,
                       "num_docs": self._n, "format": "aiis-tpu-simindex-v1"}, f)
        # The bare artifact name (e.g. 'doc2vec_index') exists as a marker so code and
        # users that test os.path.exists(name) keep working like with gensim's files.
        with open(path, "w", encoding="utf-8") as f:
            f.write("aiis-tpu-simindex-v1\n")

    @staticmethod
    def load(path: str, mmap: Optional[str] = "r") -> "SimilarityIndex":
        with open(path + ".meta.json", "r", encoding="utf-8") as f:
            meta = json.load(f)
        idx = SimilarityIndex(path, num_features=meta["num_features"])
        idx.meta = {k: v for k, v in meta.items()
                    if k not in ("num_features", "num_docs", "format")}
        matrix = np.load(path + ".npy", mmap_mode=mmap)
        idx._matrix = matrix
        idx._n = meta["num_docs"]
        norms_path = path + ".norms.npy"
        if os.path.exists(norms_path):
            idx._norms = np.load(norms_path, mmap_mode=mmap)
        else:
            idx._norms = np.zeros((idx._n,), dtype=np.float32)  # unknown (old index)
        stamps_path = path + ".stamps.npy"
        if os.path.exists(stamps_path):
            idx._stamps = np.load(stamps_path, mmap_mode=mmap)
        else:
            idx._stamps = np.zeros((idx._n,), dtype=np.float64)  # unstamped
        return idx

    def build_started(self) -> float:
        """Earliest moment any stored feature could have been extracted.

        Builders stamp ``meta['build_started']`` before extraction begins (and
        take the min across revision copies); the CCIP reranker compares file
        mtimes against this to decide whether a stored row is fresh. Pre-stamp
        indexes fall back to the artifact file mtimes — the save-time proxy,
        fine for indexes built and saved in a single pass."""
        stamp = self.meta.get("build_started")
        if stamp is not None:
            return float(stamp)
        mtimes = [os.path.getmtime(f) for f in (self.path, self.path + ".npy")
                  if os.path.exists(f)]
        return min(mtimes) if mtimes else 0.0

    @property
    def norms(self) -> np.ndarray:
        """Pre-normalization norms; zeros mean 'unknown' (index built before v1.1)."""
        return self._norms[: self._n]

    @property
    def stamps(self) -> np.ndarray:
        """Per-row extraction stamps (epoch seconds); zeros mean 'unstamped'."""
        return self._stamps[: self._n]

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(path + ".meta.json") and os.path.exists(path + ".npy")

    # ---- queries ------------------------------------------------------------

    def __len__(self) -> int:
        return self._n

    @property
    def matrix(self) -> np.ndarray:
        return self._matrix[: self._n]

    def vector_by_id(self, doc_id: int) -> np.ndarray:
        return np.asarray(self._matrix[doc_id], dtype=np.float32)

    def _device(self):
        import jax.numpy as jnp

        if self._device_matrix is None or self._device_matrix.shape[0] != self._n:
            self._device_matrix = jnp.asarray(self._matrix[: self._n])
        return self._device_matrix

    def _device_norms_arr(self):
        import jax.numpy as jnp

        if self._device_norms is None or self._device_norms.shape[0] != self._n:
            self._device_norms = jnp.asarray(np.asarray(self.norms, np.float32))
        return self._device_norms

    def __getitem__(self, query: Vector) -> np.ndarray:
        """Cosine scores of a query against every stored vector, shape (num_docs,)."""
        from ..ops.cosine import cosine_scores

        q = unitvec(_to_dense(query, self.num_features))
        return np.asarray(cosine_scores(self._device(), q))
