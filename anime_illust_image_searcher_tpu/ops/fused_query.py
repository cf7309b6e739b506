"""The fused 'normal'-mode query program: ONE device call per query.

Serving breakdown showed each device round trip costs ~35 ms through the axon relay
(and sub-ms but nonzero on local hardware), and the reference-shaped query path makes
six of them (index matvec, BM25, top-10, 10-doc re-inference, rerank matvec, top-k).
This program fuses the whole pipeline (webui.py:345-253 semantics with the intended
PRF math, QUIRKS.md #5):

  sims    = index @ q                      (cosine matvec)
  bm25    = Σ_t w_t·contrib[t, d] with -inf require/exclude masks
  final   = 0.5·norm(bm25) + 0.5·norm(sims)
  top10   = lax.top_k(final, 10)
  mean    = L2norm(Σ score_i · raw_vec_i / Σ score_i)     raw = row · stored norm
  rerank  = index @ mean
  rf      = norm(0.7·final + 0.3·rerank)
  out     = top10 ++ lax.top_k(rf, topn+10)

The 10 stored raw vectors are row·norm reconstructions — bit-identical to re-running
infer_vector (inference is deterministically seeded), so no SGD happens at query time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_docs", "topn", "k"))
def fused_normal_query(
    matrix: jax.Array,        # (D, F) unit rows
    norms: jax.Array,         # (D,) pre-normalization norms
    doc_ids: jax.Array,       # (nnz,) sorted
    term_ids: jax.Array,      # (nnz,)
    contrib: jax.Array,       # (nnz,)
    query_vec: jax.Array,     # (F,) unit query vector
    eff_weight: jax.Array,    # (vocab,)
    is_exclude: jax.Array,    # (vocab,) bool
    is_require: jax.Array,    # (vocab,) bool
    num_required: jax.Array,  # ()
    bm25_weight: float,
    doc2vec_weight: float,
    orig_weight: float,
    rerank_weight: float,
    num_docs: int,
    topn: int,
    k: int,
):
    """Returns (top10_scores, top10_ids, rerank_scores, rerank_ids)."""
    sims = jnp.dot(matrix, query_vec, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

    w = eff_weight[term_ids]
    bm25 = jax.ops.segment_sum(w * contrib, doc_ids, num_segments=num_docs,
                               indices_are_sorted=True)
    excl_hits = jax.ops.segment_sum(
        is_exclude[term_ids].astype(jnp.int32), doc_ids,
        num_segments=num_docs, indices_are_sorted=True)
    req_hits = jax.ops.segment_sum(
        is_require[term_ids].astype(jnp.int32), doc_ids,
        num_segments=num_docs, indices_are_sorted=True)
    neg_inf = jnp.float32(-jnp.inf)
    bm25 = jnp.where(excl_hits > 0, neg_inf, bm25)
    bm25 = jnp.where(req_hits < num_required, neg_inf, bm25)

    # max-normalization guards exactly as webui.py:377-380
    sims_max = jnp.max(sims)
    sims = jnp.where(sims_max > 0, sims / sims_max, sims)
    bm25_max = jnp.max(bm25)
    bm25 = jnp.where(bm25_max > 0, bm25 / bm25_max, bm25)

    final = bm25_weight * bm25 + doc2vec_weight * sims

    top_vals, top_idx = jax.lax.top_k(final, k)

    raw = matrix[top_idx] * norms[top_idx][:, None]          # (k, F) raw vectors
    wsum = jnp.sum(top_vals)
    weights = jnp.where(wsum == 0, jnp.ones_like(top_vals), top_vals)
    wsum = jnp.where(wsum == 0, jnp.float32(k), wsum)
    mean = jnp.sum(weights[:, None] * raw, axis=0) / wsum
    mnorm = jnp.linalg.norm(mean)
    mean = jnp.where(mnorm > 0, mean / mnorm, mean)

    rerank = jnp.dot(matrix, mean, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    rf = orig_weight * final + rerank_weight * rerank
    rf_max = jnp.max(rf)
    rf = jnp.where(rf_max > 0, rf / rf_max, rf)

    kk = min(topn + k, num_docs)
    r_vals, r_idx = jax.lax.top_k(rf, kk)
    return top_vals, top_idx, r_vals, r_idx
