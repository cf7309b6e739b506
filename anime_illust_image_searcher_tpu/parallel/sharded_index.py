"""Sharded similarity index: cosine scan + top-k across a device mesh.

The reference scans its whole index on one CPU (webui.py:352). Here the normalized
embedding matrix is laid out row-sharded over the ``data`` mesh axis; a query is
replicated; each chip scores its shard with one matvec; `lax.top_k` runs per shard and
XLA inserts the all-gather for the global merge over ICI (SURVEY.md §2.3 "TPU-native
equivalent"). This is the serving path for 100k+ image corpora.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, pad_to_multiple, put_global


def _scores_and_topk(matrix: jax.Array, query: jax.Array, k: int):
    scores = jnp.dot(matrix, query, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    top_vals, top_idx = jax.lax.top_k(scores, k)
    return scores, top_vals, top_idx


class ShardedSimilarityIndex:
    """Row-sharded cosine index over a mesh.

    Rows are padded to a data-axis multiple; padding rows are zero vectors and thus
    score 0 — they are filtered from top-k results by index bound.
    """

    def __init__(self, matrix: np.ndarray, mesh: Mesh) -> None:
        self.mesh = mesh
        self.num_docs = matrix.shape[0]
        n_data = mesh.shape[DATA_AXIS]
        padded, _ = pad_to_multiple(matrix.astype(np.float32), n_data, axis=0)
        sharding = NamedSharding(mesh, P(DATA_AXIS, None))
        self.matrix = put_global(padded, sharding)  # multi-host meshes supported
        self.query_sharding = NamedSharding(mesh, P())
        # Outputs are pinned fully replicated: on a process-spanning mesh a
        # data-sharded output would span non-addressable devices and
        # np.asarray on it raises — GSPMD inserts the all-gather on device
        # (over ICI/DCN) so every process can read the result directly.
        rep = NamedSharding(mesh, P())
        self._scores_and_topk = jax.jit(
            _scores_and_topk, static_argnames=("k",),
            out_shardings=(rep, rep, rep))

    def scores(self, query: np.ndarray) -> np.ndarray:
        q = put_global(query.astype(np.float32), self.query_sharding)
        scores, _, _ = self._scores_and_topk(self.matrix, q, 1)
        return np.asarray(scores)[: self.num_docs]

    def top_k(self, query: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Global (scores, indices) of the k best documents."""
        # Padding rows score 0.0 and can outrank real negative-scoring docs, so
        # over-fetch by the pad count to guarantee k real results after filtering.
        pad = self.matrix.shape[0] - self.num_docs
        k_eff = min(k + pad, self.matrix.shape[0])
        q = put_global(query.astype(np.float32), self.query_sharding)
        _, vals, idx = self._scores_and_topk(self.matrix, q, k_eff)
        vals, idx = np.asarray(vals), np.asarray(idx)
        keep = idx < self.num_docs
        return vals[keep][:k], idx[keep][:k]
