"""MCut (Maximum Cut) adaptive thresholding, vectorized over the batch.

Reference semantics (tagging.py:61-66): sort probabilities descending, find the largest
gap between consecutive values, threshold = midpoint of that gap. The reference runs it
per image per category in Python; here one jitted call handles the whole batch × both
categories (sort + diff + argmax are all VPU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def mcut_threshold_batch(probs: jax.Array) -> jax.Array:
    """(B, N) probabilities -> (B,) thresholds. N must be >= 2."""
    sorted_probs = -jnp.sort(-probs, axis=-1)
    difs = sorted_probs[:, :-1] - sorted_probs[:, 1:]
    t = jnp.argmax(difs, axis=-1)                      # first max gap, like np.argmax
    left = jnp.take_along_axis(sorted_probs, t[:, None], axis=-1)[:, 0]
    right = jnp.take_along_axis(sorted_probs, (t + 1)[:, None], axis=-1)[:, 0]
    return (left + right) / 2.0


def mcut_threshold(probs: np.ndarray) -> float:
    """Single-vector host version, bit-matching the reference formula."""
    sorted_probs = probs[probs.argsort()[::-1]]
    difs = sorted_probs[:-1] - sorted_probs[1:]
    t = difs.argmax()
    return float((sorted_probs[t] + sorted_probs[t + 1]) / 2)
