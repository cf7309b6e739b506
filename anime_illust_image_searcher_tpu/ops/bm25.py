"""Okapi BM25 scoring as a jitted TPU op.

The reference scores BM25 with a per-query-term Python loop that scans the whole corpus
as a list of dicts (webui.py:139-170) — O(Q * D) Python work per query. Here the index
is flattened once into COO arrays sorted by document (doc_ids, term_ids, contrib) where
``contrib`` is the precomputed per-(term, doc) BM25 contribution

    contrib[t, d] = idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))

(k1=1.5, b=0.75 — webui.py:126-127). A query then reduces to one gather + one sorted
segment-sum on device, with require/exclude handled as masks that reproduce the
reference's -inf semantics exactly (webui.py:154-168):

  - weight < 0:       term contributes nothing; docs containing it score -inf
  - weight > MAGIC:   effective weight (w - MAGIC); docs NOT containing it score -inf
  - otherwise:        scores += w * contrib

The three query-side vocab-length vectors (eff_weight, is_exclude, is_require) are tiny
(4 bytes/term), so each query is a single fixed-shape device call — no retracing.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

REQUIRE_TAG_MAGIC_NUMBER = 1000  # webui.py:60


@partial(jax.jit, static_argnames=("num_docs",))
def bm25_scores_device(
    doc_ids: jax.Array,      # (nnz,) int32, sorted ascending
    term_ids: jax.Array,     # (nnz,) int32
    contrib: jax.Array,      # (nnz,) f32 precomputed BM25 contribution
    eff_weight: jax.Array,   # (vocab,) f32 effective additive weight per term
    is_exclude: jax.Array,   # (vocab,) bool
    is_require: jax.Array,   # (vocab,) bool
    num_required: jax.Array, # () int32 — number of distinct required terms
    num_docs: int,
) -> jax.Array:
    """Return per-document BM25 scores with -inf exclusion/requirement semantics."""
    w = eff_weight[term_ids]                      # (nnz,) gather
    weighted = w * contrib
    scores = jax.ops.segment_sum(
        weighted, doc_ids, num_segments=num_docs, indices_are_sorted=True
    )

    excl_hits = jax.ops.segment_sum(
        is_exclude[term_ids].astype(jnp.int32), doc_ids,
        num_segments=num_docs, indices_are_sorted=True,
    )
    req_hits = jax.ops.segment_sum(
        is_require[term_ids].astype(jnp.int32), doc_ids,
        num_segments=num_docs, indices_are_sorted=True,
    )

    neg_inf = jnp.float32(-jnp.inf)
    scores = jnp.where(excl_hits > 0, neg_inf, scores)
    scores = jnp.where(req_hits < num_required, neg_inf, scores)
    return scores


def build_query_vectors(
    query_weights: Dict[int, float],
    vocab_size: int,
    magic: int = REQUIRE_TAG_MAGIC_NUMBER,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.int32]:
    """Expand {term_id: weight} into the dense query-side vectors.

    Mirrors webui.py:149-170: negative weights exclude (and contribute 0), weights
    above the magic number require (and contribute weight - magic), others add w.
    """
    eff = np.zeros(vocab_size, dtype=np.float32)
    excl = np.zeros(vocab_size, dtype=bool)
    req = np.zeros(vocab_size, dtype=bool)
    n_req = 0
    for term_id, weight in query_weights.items():
        if term_id < 0 or term_id >= vocab_size:
            continue
        if weight < 0:
            excl[term_id] = True
        elif weight > magic:
            req[term_id] = True
            eff[term_id] = weight - magic
            n_req += 1
        else:
            eff[term_id] = weight
    return eff, excl, req, np.int32(n_req)
