"""Dense cosine scoring ops — jitted matvec/matmul over the similarity index.

These are the query-time hot ops (reference: webui.py:352 index[vec], webui.py:205
rerank rescan). On TPU the whole index scan is one (D, F) @ (F,) matvec on the MXU;
scores never leave f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def cosine_scores(matrix: jax.Array, query: jax.Array) -> jax.Array:
    """(D, F) @ (F,) -> (D,) cosine scores (rows and query are pre-normalized).

    HIGHEST precision: ranking ties at bf16 granularity would reorder results; the
    matvec is bandwidth-bound so full-f32 MXU passes cost nothing measurable."""
    return jnp.dot(matrix, query, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@jax.jit
def cosine_scores_batch(matrix: jax.Array, queries: jax.Array) -> jax.Array:
    """(D, F) @ (Q, F)^T -> (Q, D) scores for a batch of queries."""
    return jnp.dot(queries, matrix.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("k",))
def top_k_scores(scores: jax.Array, k: int):
    """Top-k values and indices of a score vector (lax.top_k on device)."""
    return jax.lax.top_k(scores, k)


@jax.jit
def l2_normalize(v: jax.Array) -> jax.Array:
    """Unit-normalize; zero/inf norms pass the vector through unchanged
    (matches webui.py:110-115 guard semantics)."""
    norm = jnp.linalg.norm(v)
    safe = jnp.where((norm == 0) | ~jnp.isfinite(norm), 1.0, norm)
    return v / safe
