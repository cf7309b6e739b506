"""Doc2Vec PV-DBOW, implemented as a jitted JAX embedding-training loop.

Replaces gensim's ``Doc2Vec(vector_size=300, window=50, min_count=1, workers=1, dm=0)``
(reference: genmodel.py:159-161) and ``infer_vector`` (genmodel.py:169, webui.py:106).

PV-DBOW with dbow_words=0 is skip-gram negative sampling where the "input" vector is
the document vector and the targets are the document's words: for each surviving word
occurrence, pull the doc vector toward the word's output embedding (label 1) and push
it from ``negative`` sampled words (label 0). The window parameter is never read in
this mode — matching gensim.

Semantics preserved from gensim (ranking parity is rank-level, not bit-level — gensim's
Hogwild SGD is nondeterministic anyway; SURVEY.md §7 "Hard parts"):
  - vocabulary sorted by descending count (ties by insertion), min_count filter
  - negative-sampling noise distribution ∝ count^0.75 (ns_exponent)
  - frequent-word downsampling with sample=1e-3 via gensim's keep-probability formula,
    applied both in training and inference
  - linear LR decay alpha→min_alpha across epochs
  - inference = frozen word weights, fresh doc vector, same update rule

TPU-first deviations (documented in QUIRKS.md):
  - docs are padded to a fixed max length and trained in jitted batches; updates within
    a batch are accumulated (mini-batch) instead of gensim's sequential Hogwild
  - inference is deterministic: the fresh vector and sampling keys are seeded from a
    stable hash of the token ids, so identical queries always return identical vectors
    (gensim's infer_vector is stochastic across calls)
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import pickle
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Doc2VecConfig

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------


@dataclass
class Vocab:
    token2id: Dict[str, int]
    tokens: List[str]
    counts: np.ndarray          # (V,) int64
    keep_prob: np.ndarray       # (V,) f32 downsampling keep probability
    cum_table: np.ndarray       # (V,) f32 cumulative noise distribution in [0, 1]

    @staticmethod
    def build(corpus: Sequence[Sequence[str]], cfg: Doc2VecConfig) -> "Vocab":
        raw_counts: Dict[str, int] = {}
        order: Dict[str, int] = {}
        for doc in corpus:
            for tok in doc:
                if tok not in raw_counts:
                    order[tok] = len(order)
                raw_counts[tok] = raw_counts.get(tok, 0) + 1
        items = [(t, c) for t, c in raw_counts.items() if c >= cfg.min_count]
        items.sort(key=lambda tc: (-tc[1], order[tc[0]]))
        tokens = [t for t, _ in items]
        counts = np.array([c for _, c in items], dtype=np.int64)
        return Vocab.from_counts(tokens, counts, cfg)

    @staticmethod
    def from_counts(tokens: List[str], counts: np.ndarray,
                    cfg: Doc2VecConfig) -> "Vocab":
        """Derive keep_prob/cum_table from token counts. The single home of the
        gensim downsampling and noise-distribution formulas: ``build`` (training
        time) and ``Doc2VecModel._from_state`` (pickle load) both come through
        here, so a trained model and its reloaded pickle can never disagree on
        inference behavior."""
        token2id = {t: i for i, t in enumerate(tokens)}
        total = float(counts.sum()) if len(counts) else 1.0
        freq = counts / total
        if cfg.sample > 0:
            # gensim's keep probability: (sqrt(f/s) + 1) * (s/f), clipped to 1.
            with np.errstate(divide="ignore", invalid="ignore"):
                kp = (np.sqrt(freq / cfg.sample) + 1) * (cfg.sample / freq)
            keep_prob = np.minimum(kp, 1.0).astype(np.float32)
        else:
            keep_prob = np.ones(len(tokens), dtype=np.float32)

        noise = counts.astype(np.float64) ** cfg.ns_exponent
        cum = np.cumsum(noise)
        cum_table = (cum / cum[-1]).astype(np.float32) if len(cum) else np.zeros(0, np.float32)
        return Vocab(token2id, tokens, counts, keep_prob, cum_table)

    def __len__(self) -> int:
        return len(self.tokens)


def _stable_doc_seed(word_ids: Sequence[int], model_seed: int) -> int:
    """Deterministic 63-bit seed from the doc's token-id MULTISET.

    Order-insensitive by design (ids are sorted before hashing): a tag document
    is a bag of tags, so permutations seed identically — they still infer
    slightly different vectors because the word array itself stays unsorted.
    Callers pass the doc's own (unpadded) ids: bucket fill appends EMPTY docs,
    never zero-pads a row, so a real token id 0 can't be conflated with padding
    (pinned by tests/test_doc2vec.py::test_stable_doc_seed_semantics). When a
    doc exceeds max_doc_len the hash covers all ids while inference sees the
    truncated row — determinism (same doc -> same seed) still holds."""
    h = hashlib.blake2b(digest_size=8)
    h.update(np.int64(model_seed).tobytes())
    h.update(np.asarray(sorted(word_ids), dtype=np.int64).tobytes())
    return int.from_bytes(h.digest(), "little") & 0x7FFF_FFFF_FFFF_FFFF


# ---------------------------------------------------------------------------
# Padded corpus
# ---------------------------------------------------------------------------


def pad_corpus(
    corpus_ids: Sequence[Sequence[int]], max_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad token-id docs to (N, max_len) plus a validity mask. Longer docs truncate."""
    n = len(corpus_ids)
    ids = np.zeros((n, max_len), dtype=np.int32)
    mask = np.zeros((n, max_len), dtype=np.float32)
    for i, doc in enumerate(corpus_ids):
        m = min(len(doc), max_len)
        ids[i, :m] = np.asarray(doc[:m], dtype=np.int32)
        mask[i, :m] = 1.0
    return ids, mask


# ---------------------------------------------------------------------------
# Core SGNS math (shared by train and infer)
# ---------------------------------------------------------------------------


def _sgns_grads(
    dvec: jax.Array,       # (B, dim)
    syn1: jax.Array,       # (V, dim) — may be a bf16 gather copy (training)
    words: jax.Array,      # (B, L) int32
    live: jax.Array,       # (B, L) f32 — mask * downsample-keep
    negs: jax.Array,       # (B, L, K) int32
    lr: jax.Array,         # () f32
    need_syn1_grad: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Return (doc-vector delta, per-(doc, word) gradient accumulator A, pos logits).

    Standard negative-sampling gradients with label 1 for the document's own words and
    label 0 for noise words; negatives that collide with their positive word are
    dropped (gensim skips them too).

    Every syn1 row delta is g_i · dvec_b, so the full update factorizes:
        Δsyn1 = Aᵀ @ dvec,   A[b, w] = Σ g over batch item b's occurrences of w.
    Building A scatters SCALARS (dim× less payload than scattering row deltas — a
    (B·L·(K+1), dim) scatter measured ~280 ms/step on v5e; this form is one scalar
    scatter plus a (V, B) @ (B, dim) MXU matmul).

    The gathers (wpos/wneg) dominate HBM traffic; callers on the training path
    pass ``syn1`` pre-cast to bf16 (halving gather bytes) while the f32 master
    copy takes the update — logits/deltas still accumulate in f32.
    """
    b, l = words.shape
    k = negs.shape[-1]
    v = syn1.shape[0]

    wpos = syn1[words]                                  # (B, L, dim)
    logit_pos = jnp.einsum("bd,bld->bl", dvec.astype(syn1.dtype), wpos,
                           preferred_element_type=jnp.float32)
    g_pos = (1.0 - jax.nn.sigmoid(logit_pos)) * lr * live          # (B, L)

    wneg = syn1[negs]                                   # (B, L, K, dim)
    logit_neg = jnp.einsum("bd,blkd->blk", dvec.astype(syn1.dtype), wneg,
                           preferred_element_type=jnp.float32)
    neg_live = live[..., None] * (negs != words[..., None])
    g_neg = (0.0 - jax.nn.sigmoid(logit_neg)) * lr * neg_live      # (B, L, K)

    d_doc = jnp.einsum("bl,bld->bd", g_pos.astype(syn1.dtype), wpos,
                       preferred_element_type=jnp.float32) + jnp.einsum(
        "blk,blkd->bd", g_neg.astype(syn1.dtype), wneg,
        preferred_element_type=jnp.float32
    )

    if not need_syn1_grad:  # inference only moves the doc vector
        return d_doc, None, logit_pos

    ids = jnp.concatenate([words.reshape(b, l), negs.reshape(b, l * k)], axis=1)
    gs = jnp.concatenate([g_pos.reshape(b, l), g_neg.reshape(b, l * k)], axis=1)
    acc = jnp.zeros((b, v), dtype=jnp.float32)
    b_idx = jnp.broadcast_to(jnp.arange(b)[:, None], ids.shape)
    acc = acc.at[b_idx.reshape(-1), ids.reshape(-1)].add(gs.reshape(-1))
    return d_doc, acc, logit_pos


def _apply_syn1_update(syn1: jax.Array, acc: jax.Array, dvec: jax.Array) -> jax.Array:
    """syn1 += Aᵀ @ dvec (full-f32 MXU passes: these are optimizer-state updates)."""
    return syn1 + jnp.dot(acc.T, dvec, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def _sample_negatives(key: jax.Array, cum_table: jax.Array, shape) -> jax.Array:
    u = jax.random.uniform(key, shape)
    # searchsorted's default 'scan' lowering (a log2(V)-step binary-search loop of
    # random gathers) measured 34.8 ms per (512,128,5) draw on v5e — it was the
    # entire training-step bottleneck. 'compare_all' (one fused compare-reduce
    # sweep) returns IDENTICAL indices; 'sort' is V-independent and takes over
    # where the O(n·V) sweep grows past it. Crossover re-measured on-chip at
    # the production (512,128,5) shape (round 5): compare_all 4.1/7.9/12.8/50.6 ms
    # vs sort 7.7/8.6/8.3/9.5 ms at V=2k/10k/16k/100k — threshold set between
    # the 10k win and the 16k loss. Both methods are exact, so the threshold
    # never changes sampled indices.
    # An O(1) Vose alias-method sampler was built and A/B'd IN-MODEL on the
    # chip (round 5): 19.8 vs 17.1 ms/step at the 1M-doc config — SLOWER.
    # 654k random scalar gathers from the tiny alias tables lose to the dense
    # compare sweep on TPU (no hardware gather); the sweep is MXU/VPU-shaped.
    # Negative sampling is therefore at its measured floor here
    # (ARCHITECTURE §2a), and the sampler stays searchsorted everywhere.
    method = "compare_all" if cum_table.shape[0] <= 12000 else "sort"
    return jnp.searchsorted(cum_table, u, method=method).astype(jnp.int32)


def _downsample_mask(key: jax.Array, keep_prob: jax.Array, words: jax.Array, mask: jax.Array) -> jax.Array:
    u = jax.random.uniform(key, words.shape)
    return mask * (u < keep_prob[words])


@partial(jax.jit, static_argnames=("negative",), donate_argnums=(0, 1))
def _train_step(
    docvecs: jax.Array,     # (N, dim)
    syn1: jax.Array,        # (V, dim)
    doc_idx: jax.Array,     # (B,) int32
    words: jax.Array,       # (B, L)
    mask: jax.Array,        # (B, L)
    keep_prob: jax.Array,   # (V,)
    cum_table: jax.Array,   # (V,)
    key: jax.Array,
    lr: jax.Array,
    negative: int,
) -> Tuple[jax.Array, jax.Array]:
    k_keep, k_neg = jax.random.split(key)
    live = _downsample_mask(k_keep, keep_prob, words, mask)
    negs = _sample_negatives(k_neg, cum_table, (*words.shape, negative))
    dvec = docvecs[doc_idx]
    d_doc, acc, _ = _sgns_grads(dvec, syn1, words, live, negs, lr)
    docvecs = docvecs.at[doc_idx].add(d_doc)
    syn1 = _apply_syn1_update(syn1, acc, dvec)
    return docvecs, syn1


def _train_epoch_impl(
    docvecs: jax.Array,       # (N, dim)
    syn1: jax.Array,          # (V, dim)
    doc_idx_b: jax.Array,     # (n_batches, B) int32
    words_b: jax.Array,       # (n_batches, B, L)
    mask_b: jax.Array,        # (n_batches, B, L)
    keep_prob: jax.Array,
    cum_table: jax.Array,
    epoch_key: jax.Array,
    lr: jax.Array,
    negative: int,
    gather_bf16: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One epoch: lax.scan over batches. Matches the per-batch _train_step sequence
    exactly (same keys fold_in(epoch_key, bi)); one dispatch per epoch instead of one
    per batch (dispatch/relay overhead dominated training wall time).
    ``gather_bf16`` halves the syn1 gather traffic (the step's HBM bottleneck) by
    gathering from a bf16 copy; the f32 master still takes the update."""

    def body(carry, inputs):
        docvecs, syn1 = carry
        bi, doc_idx, words, mask = inputs
        key = jax.random.fold_in(epoch_key, bi)
        k_keep, k_neg = jax.random.split(key)
        live = _downsample_mask(k_keep, keep_prob, words, mask)
        negs = _sample_negatives(k_neg, cum_table, (*words.shape, negative))
        dvec = docvecs[doc_idx]
        syn1_g = syn1.astype(jnp.bfloat16) if gather_bf16 else syn1
        d_doc, acc, _ = _sgns_grads(dvec, syn1_g, words, live, negs, lr)
        docvecs = docvecs.at[doc_idx].add(d_doc)
        syn1 = _apply_syn1_update(syn1, acc, dvec)
        return (docvecs, syn1), None

    n_batches = words_b.shape[0]
    bis = jnp.arange(n_batches, dtype=jnp.uint32)
    (docvecs, syn1), _ = jax.lax.scan(
        body, (docvecs, syn1), (bis, doc_idx_b, words_b, mask_b)
    )
    return docvecs, syn1


_train_epoch = partial(
    jax.jit, static_argnames=("negative", "gather_bf16"), donate_argnums=(0, 1)
)(_train_epoch_impl)


@partial(jax.jit, static_argnames=("negative", "gather_bf16"),
         donate_argnums=(0, 1))
def _train_epochs(
    docvecs: jax.Array,
    syn1: jax.Array,
    doc_idx_b: jax.Array,
    words_b: jax.Array,
    mask_b: jax.Array,
    keep_prob: jax.Array,
    cum_table: jax.Array,
    base_key: jax.Array,
    epoch_ids: jax.Array,     # (E,) uint32 absolute epoch numbers (fold_in
                              # bit-equivalence for these values is test-pinned)
    lrs: jax.Array,           # (E,) f32 host-precomputed schedule (bit-stable)
    negative: int,
    gather_bf16: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """A run of epochs as ONE device program: outer lax.scan over epochs around the
    per-epoch batch scan. Keys (fold_in(base_key, epoch)) and the LR schedule are
    bit-identical to the per-epoch dispatch path, so results match it exactly;
    dispatch count drops from cfg.epochs to epochs/checkpoint-interval."""

    def body(carry, inp):
        e, lr = inp
        dv, s1 = carry
        dv, s1 = _train_epoch_impl(
            dv, s1, doc_idx_b, words_b, mask_b, keep_prob, cum_table,
            jax.random.fold_in(base_key, e), lr,
            negative=negative, gather_bf16=gather_bf16,
        )
        return (dv, s1), None

    (docvecs, syn1), _ = jax.lax.scan(body, (docvecs, syn1), (epoch_ids, lrs))
    return docvecs, syn1


def _infer_vectors_impl(
    syn1: jax.Array,        # (V, dim) frozen
    words: jax.Array,       # (B, L)
    mask: jax.Array,        # (B, L)
    keep_prob: jax.Array,
    cum_table: jax.Array,
    init_vecs: jax.Array,   # (B, dim)
    seeds: jax.Array,       # (B, 2) uint32 per-doc seed (low, high) halves
    alpha: float,
    min_alpha: float,
    epochs: int,
    negative: int,
) -> jax.Array:
    """Gradient-descend fresh doc vectors against frozen word weights.

    All randomness is a pure function of (per-doc seed, epoch), so a doc's result
    is bitwise-independent of which batch/chunk it rides in — the bucketed and
    scan-fused callers below rely on this.
    """

    def epoch_body(e, dvecs):
        lr = alpha - (alpha - min_alpha) * e / jnp.maximum(epochs, 1)
        key = jax.random.fold_in(jax.random.PRNGKey(0), e)
        # Per-doc decorrelation: fold BOTH halves of each doc's 63-bit stable
        # seed into the epoch key (a single 32-bit fold collided at 1M docs).
        keys = jax.vmap(
            lambda s: jax.random.fold_in(jax.random.fold_in(key, s[0]), s[1])
        )(seeds)

        def per_doc(dvec, w, m, k):
            k1, k2 = jax.random.split(k)
            live = _downsample_mask(k1, keep_prob, w[None], m[None])[0]
            negs = _sample_negatives(k2, cum_table, (*w.shape, negative))
            d_doc, _, _ = _sgns_grads(
                dvec[None], syn1, w[None], live[None], negs[None], lr,
                need_syn1_grad=False,
            )
            return dvec + d_doc[0]

        return jax.vmap(per_doc)(dvecs, words, mask, keys)

    return jax.lax.fori_loop(0, epochs, epoch_body, init_vecs)


_infer_vectors = partial(jax.jit, static_argnames=("epochs", "negative"))(
    _infer_vectors_impl
)


@partial(jax.jit, static_argnames=("rows",))
def _slice_rows(x, start, rows: int):
    # one program serves every chunk offset (start is traced); dynamic_slice
    # clamps start to [0, n-rows], so the ragged tail pulls a full window
    # ending at n and the host takes the suffix it needs
    return jax.lax.dynamic_slice_in_dim(x, start, rows, axis=0)


def _d2h_rows(nbytes: int, nrows: int, budget_bytes: int) -> int:
    return max(1, int(budget_bytes // max(1, nbytes // nrows)))


def warm_d2h_chunked(x, budget_bytes: int = 64 << 20) -> None:
    """Compile (and once-execute) the chunk-pull program for ``x``'s shape.

    Call while the device worker is fresh: on relay-fronted hosts the first
    compile AFTER a long training run has been observed to hang past the
    relay's watchdog and kill the worker — losing the very training state the
    pull was for. Warming at allocation time makes the post-training pull
    pure execution."""
    nbytes = int(x.size) * np.dtype(x.dtype).itemsize
    if x.ndim == 0 or x.shape[0] <= 1 or nbytes <= budget_bytes:
        return
    rows = _d2h_rows(nbytes, x.shape[0], budget_bytes)
    np.asarray(_slice_rows(x, 0, min(rows, x.shape[0])))


def _d2h_chunked(x, budget_bytes: int = 64 << 20) -> np.ndarray:
    """Device-to-host copy in bounded row slices. A single GB-sized D2H can
    exceed transport limits on relay-fronted hosts (observed: the transport
    worker crashes mid-copy pulling the 1.2 GB docvecs table of a 1M-doc
    model); row-chunked copies are byte-identical and bounded. Direct-attach
    hosts pay nothing: arrays under the budget take the single-copy path.
    All chunks ride ONE jitted dynamic-slice program (see warm_d2h_chunked)."""
    nbytes = int(x.size) * np.dtype(x.dtype).itemsize
    if x.ndim == 0 or x.shape[0] <= 1 or nbytes <= budget_bytes:
        return np.asarray(x)
    n = x.shape[0]
    rows = _d2h_rows(nbytes, n, budget_bytes)
    out = np.empty(x.shape, dtype=np.dtype(x.dtype))
    n_chunks = (n + rows - 1) // rows
    for ci, i in enumerate(range(0, n, rows)):
        take = min(rows, n - i)
        chunk = np.asarray(_slice_rows(x, i, rows))
        # dynamic_slice clamped the ragged tail's start to n-rows: the wanted
        # rows are the window's suffix
        out[i:i + take] = chunk[rows - take:]
        # progress at debug level: GB-scale pulls take minutes on slow
        # transports and a mid-pull transport death needs an attribution trail
        logger.debug("d2h chunk %d/%d (%.0f MB done)", ci + 1, n_chunks,
                     min((ci + 1) * rows, n) * (nbytes / n) / 1e6)
    return out


@partial(jax.jit, static_argnames=("epochs", "negative"))
def _infer_vectors_chunked(
    syn1: jax.Array,        # (V, dim) frozen
    words: jax.Array,       # (C, B, L)
    mask: jax.Array,        # (C, B, L)
    keep_prob: jax.Array,
    cum_table: jax.Array,
    init_vecs: jax.Array,   # (C, B, dim)
    seeds: jax.Array,       # (C, B, 2)
    alpha: float,
    min_alpha: float,
    epochs: int,
    negative: int,
) -> jax.Array:
    """Whole-corpus inference as ONE device program: lax.scan over B-doc chunks.

    The per-chunk math is exactly ``_infer_vectors_impl`` (per-doc seeding makes
    results chunk-invariant), but the index build's big inference pass (genmodel.py
    analog of the reference's per-doc infer_vector loop, genmodel.py:168-173) pays
    one dispatch + one syn1 read instead of n_chunks of each."""

    def chunk(_, inp):
        w, m, iv, s = inp
        out = _infer_vectors_impl(
            syn1, w, m, keep_prob, cum_table, iv, s,
            alpha, min_alpha, epochs, negative,
        )
        return None, out

    _, outs = jax.lax.scan(chunk, None, (words, mask, init_vecs, seeds))
    return outs


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclass
class Doc2VecModel:
    """Trained PV-DBOW model. Pickled to the ``doc2vec_model`` artifact
    (name per genmodel.py:162)."""

    cfg: Doc2VecConfig
    vocab: Vocab
    syn1neg: np.ndarray                 # (V, dim) word output embeddings
    docvecs: np.ndarray                 # (N, dim) trained doc vectors
    corpus_count: int = 0
    # optional jax.sharding.Mesh: big inference passes shard over its 'data' axis
    # (runtime-only — never pickled; ``save`` serializes explicit keys)
    mesh: object = field(default=None, repr=False, compare=False)
    _infer_cache: dict = field(default_factory=dict, repr=False, compare=False)
    # blake2b fingerprint of the (cfg, corpus, batch_size) this model was
    # trained from (same identity as the mid-run snapshots). Training is
    # seeded and deterministic, so a finished model whose fingerprint matches
    # a requested rebuild IS the rebuild's result — ``train`` reuses it
    # instead of retraining (crash recovery for the post-training stages of a
    # large ``genmodel`` run). None on pre-reuse pickles: those never reuse.
    train_fp: Optional[str] = field(default=None, repr=False, compare=False)

    # ---- training ----------------------------------------------------------

    @staticmethod
    def train(
        corpus: Sequence[Sequence[str]],
        cfg: Doc2VecConfig = Doc2VecConfig(),
        batch_size: int = 512,
        log_every: int = 0,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        mesh=None,
        reuse_finished: bool = True,
    ) -> "Doc2VecModel":
        """Train PV-DBOW. With ``checkpoint_path`` + ``checkpoint_every``, training
        state (docvecs, syn1neg, epoch) is snapshotted every N epochs and a crashed
        run resumes from the latest snapshot — the reference has no mid-run
        checkpointing at all (SURVEY.md §5.4); its only recovery is .bak copies.

        ``reuse_finished``: when a FINISHED model already sits at
        ``checkpoint_path`` and its pickled fingerprint matches this exact
        (cfg, corpus, batch_size), load and return it instead of retraining —
        seeded deterministic training means retraining would reproduce it
        bit-for-bit, so this is a pure cache hit. Covers the crash window the
        mid-run snapshots can't: a large build dying AFTER training (the
        whole-corpus inference pass / BM25 stage) no longer pays the full
        training bill again on rerun. The returned model has
        ``reused_finished=True`` set so callers can skip re-saving.

        ``mesh``: optional jax.sharding.Mesh with a 'data' axis — each step's
        document batch shards across chips; syn1 replicates and GSPMD psums its
        update (the (V,B)@(B,dim) matmul contracts over the sharded batch dim).
        batch_size must divide by the data-axis size."""
        vocab = Vocab.build(corpus, cfg)
        corpus_ids = [
            [vocab.token2id[t] for t in doc if t in vocab.token2id] for doc in corpus
        ]
        n_docs, dim = len(corpus_ids), cfg.vector_size
        words_np, mask_np = pad_corpus(corpus_ids, cfg.max_doc_len)

        def snapshot_fp() -> str:
            # Snapshot identity: a resumable checkpoint must come from THIS
            # (cfg, corpus, batch_size) — shape checks alone silently resumed
            # a snapshot from a different epoch target / seed / same-sized
            # other corpus, and with a reduced epoch count returned the stale
            # snapshot as the "finished" model without training at all.
            # batch_size matters too: per-batch keys and mini-batch
            # accumulation boundaries change the training math.
            fp_h = hashlib.blake2b(digest_size=16)
            fp_h.update(repr(cfg).encode())
            fp_h.update(np.int64(n_docs).tobytes())
            fp_h.update(np.int64(batch_size).tobytes())
            fp_h.update(words_np)  # buffer protocol — no tobytes copy
            for t in vocab.tokens:  # ids alone miss a renamed-tokens corpus
                fp_h.update(t.encode())
                fp_h.update(b"\0")
            return fp_h.hexdigest()

        ckpt_fp = snapshot_fp() if checkpoint_path else ""
        # Both identities pin the data-parallel mode: dp and single-device
        # training agree only to GSPMD-reduction ulps (tests/test_parallel.py,
        # rtol 1e-4). Finished-model reuse across modes would break the
        # bit-for-bit promise — and so would a cross-mode RESUME: a run
        # snapshotted in dp mode and finished single-device is a mixed-mode
        # model that matches neither pure retrain, yet would be stamped with
        # the finishing run's train_fp and later reused as "bit-identical"
        # (ADVICE r4). Mode-mismatched snapshots are therefore refused (the
        # resume falls back to training from scratch, which is always sound).
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            reuse_fp = f"{ckpt_fp}:dp{mesh.shape[DATA_AXIS]}" if ckpt_fp else ""
        else:
            reuse_fp = ckpt_fp

        if checkpoint_path and reuse_finished:
            reused = Doc2VecModel._try_reuse_finished(
                checkpoint_path, reuse_fp, n_docs, dim)
            if reused is not None:
                reused.mesh = mesh
                reused.reused_finished = True
                return reused

        rng = np.random.RandomState(cfg.seed)
        docvecs = jnp.asarray(
            (rng.rand(n_docs, dim).astype(np.float32) - 0.5) / dim
        )
        syn1 = jnp.zeros((len(vocab), dim), dtype=jnp.float32)
        keep_prob = jnp.asarray(vocab.keep_prob)
        cum_table = jnp.asarray(vocab.cum_table)

        # Fixed-size batches (pad the doc count) so one program serves all steps.
        n_pad = (-n_docs) % batch_size
        if n_pad:
            words_np = np.concatenate([words_np, np.zeros((n_pad, cfg.max_doc_len), np.int32)])
            mask_np = np.concatenate([mask_np, np.zeros((n_pad, cfg.max_doc_len), np.float32)])
        words_all = jnp.asarray(words_np)
        mask_all = jnp.asarray(mask_np)
        # Padding docs are routed to a scratch doc-vector row (index n_docs).
        docvecs = jnp.concatenate([docvecs, jnp.zeros((1 if n_pad else 0, dim), jnp.float32)])
        doc_index = np.concatenate(
            [np.arange(n_docs, dtype=np.int32),
             np.full(n_pad, n_docs, dtype=np.int32)]
        )
        n_batches = len(doc_index) // batch_size

        # Compile the end-of-training chunk-pull program NOW, while the device
        # worker is fresh: a first compile issued right after a long training
        # run has been observed to hang a relay's compile helper past its
        # watchdog, killing the worker WITH the trained state (see
        # warm_d2h_chunked). No-op for under-budget (sub-GB) tables.
        warm_d2h_chunked(docvecs)

        base_key = jax.random.PRNGKey(cfg.seed)
        start_epoch = 0
        ckpt_file = (checkpoint_path + ".ckpt.npz") if checkpoint_path else None
        if ckpt_file and os.path.exists(ckpt_file):
            # guarded load: a snapshot truncated by a crash mid-write must be
            # ignored, not crash the recovery run it exists to serve
            try:
                snap = np.load(ckpt_file)
                snap_ok = ("fp" in snap.files and str(snap["fp"]) == reuse_fp
                           and snap["docvecs"].shape == docvecs.shape
                           and snap["syn1"].shape == syn1.shape
                           # snapshots are only written strictly mid-run (the
                           # save condition requires epoch < cfg.epochs), so an
                           # out-of-range epoch means a foreign writer: retrain
                           and 0 < int(snap["epoch"]) < cfg.epochs)
            except Exception as e:  # noqa: BLE001 — corrupt zip/pickle forms
                snap_ok = False
                print(f"doc2vec: unreadable {ckpt_file} ({e})")
            if snap_ok:
                docvecs = jnp.asarray(snap["docvecs"])
                syn1 = jnp.asarray(snap["syn1"])
                start_epoch = int(snap["epoch"])
                print(f"doc2vec: resumed from {ckpt_file} at epoch {start_epoch}")
            else:
                print(f"doc2vec: ignoring {ckpt_file} (different config/corpus/"
                      "batch/dp-mode, or corrupt) — training from scratch")

        doc_idx_b = jnp.asarray(doc_index.reshape(n_batches, batch_size))
        words_b = words_all.reshape(n_batches, batch_size, cfg.max_doc_len)
        mask_b = mask_all.reshape(n_batches, batch_size, cfg.max_doc_len)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS, put_global

            n_data = mesh.shape[DATA_AXIS]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the data axis {n_data}")
            batch_dp = NamedSharding(mesh, P(None, DATA_AXIS))  # (n_batches, B, ...)
            rep = NamedSharding(mesh, P())
            # put_global: multi-host meshes get their shards assembled per process
            doc_idx_b = put_global(doc_idx_b, batch_dp)
            words_b = put_global(words_b, batch_dp)
            mask_b = put_global(mask_b, batch_dp)
            docvecs = put_global(docvecs, rep)
            syn1 = put_global(syn1, rep)
            keep_prob = put_global(keep_prob, rep)
            cum_table = put_global(cum_table, rep)

        # Whole epoch RUNS are single device programs (_train_epochs: scan over
        # epochs around the per-epoch batch scan) — one dispatch per log/checkpoint
        # boundary instead of one per epoch. The LR schedule is precomputed on host
        # (f64 -> f32, exactly like the old per-epoch jnp.float32(...) cast) and the
        # epoch keys fold the same absolute epoch numbers, so results are
        # bit-identical to per-epoch dispatching (pinned by tests).
        lrs_np = np.asarray(
            [cfg.alpha - (cfg.alpha - cfg.min_alpha) * e / max(cfg.epochs, 1)
             for e in range(cfg.epochs)], np.float32,
        )

        # Segment stride = gcd of the boundary intervals: every log/checkpoint
        # boundary is a stride multiple, so at most TWO program shapes compile
        # (stride + a final remainder) instead of one per distinct interleaved
        # boundary-segment length — each shape is a full training-program
        # compile, multi-minute on the remote-compile relay (ADVICE r2).
        # Coprime intervals degrade to stride 1 (per-epoch dispatch, one
        # compile), which still beats N compiles.
        import math

        intervals = [i for i in (log_every,
                                 checkpoint_every if ckpt_file else None) if i]
        # no boundaries -> one segment to the end, even resuming mid-run
        # (epoch + stride - epoch%stride lands exactly on cfg.epochs)
        stride = math.gcd(*intervals) if intervals else max(cfg.epochs, 1)
        # Relay-safe dispatch length: ONE scan dispatch of ~19.5k train steps
        # (10 epochs x 1954 batches at 1M docs) reproducibly crashes the
        # relay-fronted device worker mid-program, while the SAME training as
        # shorter dispatches completes — bisected at 1M docs: 1,954-step
        # dispatches succeed end-to-end incl. the 1.2 GB docvecs pull. Cap
        # epochs-per-dispatch near the validated step count; results are
        # bit-identical across dispatch boundaries (epoch keys fold absolute
        # epoch numbers), so this only changes how often the host re-enters.
        max_steps = int(os.environ.get("AIIS_TRAIN_STEPS_PER_DISPATCH", "4096"))
        cap = max(1, max_steps // max(n_batches, 1)) if max_steps > 0 else stride
        if stride > cap:
            if intervals:
                # keep every log/checkpoint boundary exact: the shortened
                # stride must still divide the boundary gcd
                stride = max(d for d in range(1, cap + 1) if stride % d == 0)
            else:
                stride = cap

        epoch = start_epoch
        while epoch < cfg.epochs:
            # start_epoch is 0 or a checkpoint boundary (a stride multiple)
            upto = min(epoch + stride - epoch % stride, cfg.epochs)
            epoch_ids = jnp.arange(epoch, upto, dtype=jnp.uint32)
            docvecs, syn1 = _train_epochs(
                docvecs, syn1, doc_idx_b, words_b, mask_b,
                keep_prob, cum_table, base_key,
                epoch_ids, jnp.asarray(lrs_np[epoch:upto]),
                negative=cfg.negative, gather_bf16=cfg.train_gather_bf16,
            )
            epoch = upto
            if log_every and epoch % log_every == 0:
                print(f"doc2vec epoch {epoch}/{cfg.epochs}")
            if (ckpt_file and checkpoint_every and epoch % checkpoint_every == 0
                    and epoch < cfg.epochs):  # final state is returned, not snapshotted
                # atomic: an in-place np.savez truncates the previous good
                # snapshot before the new one is complete — a crash mid-write
                # would destroy the very state this file exists to recover
                # .npz suffix: np.savez appends one to any other name
                tmp = f"{ckpt_file}.tmp{os.getpid()}.npz"
                try:
                    np.savez(tmp, docvecs=_d2h_chunked(docvecs),
                             syn1=np.asarray(syn1), epoch=epoch, fp=reuse_fp)
                    os.replace(tmp, ckpt_file)
                except BaseException:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
                    raise
        if ckpt_file and os.path.exists(ckpt_file):
            os.remove(ckpt_file)  # training completed; snapshot no longer needed

        # pull the PADDED table (same shape the warm compiled; a [:n_docs]
        # device slice would be a fresh post-training compile) and trim on host
        docvecs_np = _d2h_chunked(docvecs)[:n_docs]
        return Doc2VecModel(cfg, vocab, np.asarray(syn1), docvecs_np,
                            corpus_count=n_docs, mesh=mesh,
                            train_fp=reuse_fp or None)

    @staticmethod
    def _try_reuse_finished(path: str, fp: str, n_docs: int,
                            dim: int) -> Optional["Doc2VecModel"]:
        """Load the finished model at ``path`` iff it was trained from exactly
        this (cfg, corpus, batch_size). A tiny ``.trained_fp`` sidecar gates
        the expensive unpickle (the pickle is ~1.2 GB at 1M docs); the
        pickled ``train_fp`` is then re-checked so a sidecar/pickle pair torn
        by a crash between the two writes can never smuggle in a stale model."""
        fp_file = path + ".trained_fp"
        if not (os.path.exists(fp_file) and os.path.exists(path)):
            return None
        try:
            with open(fp_file, "r", encoding="ascii") as f:
                if f.read().strip() != fp:
                    return None
            model = Doc2VecModel.load(path)
        except Exception as e:  # noqa: BLE001 — any unusable artifact: retrain
            print(f"doc2vec: ignoring unusable finished model {path} ({e})")
            return None
        if model.train_fp != fp or model.docvecs.shape != (n_docs, dim):
            return None
        print(f"doc2vec: reusing finished model {path} — same corpus/config/"
              "batch, and training is deterministic so retraining would "
              "reproduce it bit-for-bit (--no-reuse-model forces a retrain)")
        return model

    # ---- inference ----------------------------------------------------------

    def infer_vector(self, doc_words: Sequence[str], epochs: Optional[int] = None) -> np.ndarray:
        return self.infer_vectors([doc_words], epochs=epochs)[0]

    # Fixed batch buckets so each (bucket, epochs) pair compiles exactly once —
    # arbitrary query-tag counts reuse a warm program (first-query latency).
    _INFER_BUCKETS = (8, 16, 64, 512)

    def tag_vectors(self) -> np.ndarray:
        """(V+1, dim) matrix of infer_vector([token]) for every vocab token, plus the
        shared OOV/empty-doc vector in the last row.

        Inference is deterministically seeded from token ids, so these rows are
        *exactly* what a runtime ``infer_vector([tag])`` returns — the whole per-query
        Doc2Vec inference collapses to row lookups (serving-latency path). Cached in
        the pickled model after first computation.
        """
        # identity-keyed like _device_consts: swapping syn1neg/vocab arrays in
        # place must invalidate, or stale tag vectors silently skew rankings
        key = (self.syn1neg, self.vocab.keep_prob, self.vocab.cum_table)
        cached = self._infer_cache.get("tag_vectors")
        ckey = self._infer_cache.get("tag_vectors_key")
        if (cached is not None and cached.shape[0] == len(self.vocab) + 1
                and ckey is not None and len(ckey) == len(key)
                and all(a is b for a, b in zip(ckey, key))):
            return cached
        docs = [[t] for t in self.vocab.tokens] + [[]]  # [] -> OOV/empty vector
        vectors = self.infer_vectors(docs)
        self._infer_cache["tag_vectors"] = vectors
        self._infer_cache["tag_vectors_key"] = key
        return vectors

    def tag_vector(self, token: str) -> np.ndarray:
        vecs = self.tag_vectors()
        idx = self.vocab.token2id.get(token, len(self.vocab))
        return vecs[idx]

    # Per-doc pad-length buckets: the doc's OWN length picks its bucket, so a given
    # doc always sees the same random-draw shapes → identical vectors regardless of
    # which batch it rides in. Inference is gather-bandwidth-bound; short docs in the
    # 8/32 buckets skip ~4-16x of padding gathers.
    _LEN_BUCKETS = (8, 32)

    def _len_bucket(self, n_ids: int) -> int:
        for lb in self._LEN_BUCKETS:
            if lb > self.cfg.max_doc_len:
                break  # a bucket wider than max_doc_len would let mid-length
                # docs keep MORE tags than training (or longer docs) ever saw
            if n_ids <= lb:
                return lb
        return self.cfg.max_doc_len

    def _device_consts(self):
        """Device-resident (syn1neg, keep_prob, cum_table) — uploaded once, then
        shared by every inference dispatch (the per-chunk jnp.asarray re-upload of
        the (V, dim) syn1 matrix was pure H2D waste). Lives only in the in-memory
        cache; ``save`` pickles explicit keys, so this never hits disk."""
        # validity key covers ALL mirrored host arrays, not just syn1neg —
        # replacing vocab.keep_prob/cum_table alone must invalidate (ADVICE r2)
        # — AND the mesh: consts uploaded before model.mesh was assigned are
        # process-local arrays that cannot mix with globally-sharded inputs.
        # The cache holds strong refs to the keyed arrays, so `is` is sound
        # (no id-reuse hazard).
        key = (self.syn1neg, self.vocab.keep_prob, self.vocab.cum_table, self.mesh)
        cached = self._infer_cache.get("device_consts")
        if cached is not None and all(a is b for a, b in zip(cached[0], key)):
            return cached[1]
        consts = (
            jnp.asarray(self.syn1neg),
            jnp.asarray(self.vocab.keep_prob),
            jnp.asarray(self.vocab.cum_table),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import put_global

            rep = NamedSharding(self.mesh, P())
            consts = tuple(put_global(c, rep) for c in consts)
        self._infer_cache["device_consts"] = (key, consts)
        return consts

    def infer_vectors(
        self, docs: Sequence[Sequence[str]], epochs: Optional[int] = None
    ) -> np.ndarray:
        """Batched infer_vector — bucketed jitted calls for any number of docs."""
        cfg = self.cfg
        epochs = int(epochs if epochs is not None else cfg.infer_epochs)
        dim = cfg.vector_size
        ids = [
            [self.vocab.token2id[t] for t in doc if t in self.vocab.token2id]
            for doc in docs
        ]
        n = len(ids)
        out = np.empty((n, dim), dtype=np.float32)
        # group doc positions by their length bucket, then chunk each group
        groups: Dict[int, List[int]] = {}
        for pos, d in enumerate(ids):
            groups.setdefault(self._len_bucket(len(d)), []).append(pos)
        chunk = self._INFER_BUCKETS[-1]
        for len_bucket, positions in groups.items():
            # Index-build-sized group: one scan-fused device program for the
            # FULL chunks; the (< chunk) remainder rides the bucketed path
            # below instead of padding a whole extra chunk of empty docs whose
            # negative-sampling gathers run at full width (per-doc seeding
            # makes vectors batch-invariant, so the split is result-identical).
            full = (len(positions) // chunk) * chunk
            if full:
                sel = positions[:full]
                out[sel] = self._infer_group_scan(
                    [ids[p] for p in sel], chunk, epochs, len_bucket
                )
                positions = positions[full:]
            start = 0
            while start < len(positions):
                remaining = len(positions) - start
                bucket = next(
                    (b for b in self._INFER_BUCKETS if remaining <= b), chunk
                )
                take = min(remaining, bucket)
                sel = positions[start : start + take]
                out[sel] = self._infer_bucket(
                    [ids[p] for p in sel], bucket, epochs, len_bucket
                )
                start += take
        return out

    def _infer_inputs(self, padded_ids: List[List[int]], len_bucket: int):
        """(words, mask, seeds, init) host arrays for a padded doc list.

        ``seeds`` is (B, 2) uint32 — the stable seed's (low, high) halves. All
        63 bits reach both the device fold and the init RandomState: a 32-bit
        truncation collided ~n²/2³³ doc pairs at 1M docs (≈116 pairs), giving
        unrelated docs identical init vectors AND identical per-epoch draws."""
        cfg = self.cfg
        words_np, mask_np = pad_corpus(padded_ids, len_bucket)
        seeds64 = [_stable_doc_seed(d, cfg.seed) for d in padded_ids]
        seeds = np.array(
            [[s & 0xFFFFFFFF, s >> 32] for s in seeds64], dtype=np.uint32,
        )
        init = np.stack([
            (np.random.RandomState([s & 0xFFFFFFFF, s >> 32])
             .rand(cfg.vector_size).astype(np.float32) - 0.5) / cfg.vector_size
            for s in seeds64
        ])
        return words_np, mask_np, seeds, init

    def _infer_group_scan(self, ids: List[List[int]], chunk: int, epochs: int,
                          len_bucket: int) -> np.ndarray:
        cfg = self.cfg
        n = len(ids)
        n_pad = (-n) % chunk
        padded_ids = ids + [[] for _ in range(n_pad)]
        words_np, mask_np, seeds, init = self._infer_inputs(padded_ids, len_bucket)
        c = len(padded_ids) // chunk
        syn1, keep_prob, cum_table = self._device_consts()
        chunked = [
            words_np.reshape(c, chunk, len_bucket),
            mask_np.reshape(c, chunk, len_bucket),
            init.reshape(c, chunk, cfg.vector_size),
            seeds.reshape(c, chunk, 2),
        ]

        def place(arrs):
            if self.mesh is not None:
                # dp over each chunk's doc axis (genmodel --data-parallel);
                # per-doc math is independent along that axis (matches
                # single-device to GSPMD-retiling ulps; tests/test_parallel.py)
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.mesh import DATA_AXIS, put_global

                n_data = self.mesh.shape[DATA_AXIS]
                if chunk % n_data == 0:
                    dp = NamedSharding(self.mesh, P(None, DATA_AXIS))
                    return [put_global(a, dp) for a in arrs]
                # Non-divisible chunk: replicate explicitly. On a multi-process
                # mesh a bare jnp.asarray would build process-LOCAL arrays that
                # cannot mix with the globally-sharded syn1 consts (ADVICE r2);
                # replication degrades throughput, never correctness.
                rep = NamedSharding(self.mesh, P())
                return [put_global(a, rep) for a in arrs]
            return [jnp.asarray(a) for a in arrs]

        # Bound the scan length per dispatch: a 1M-doc corpus would otherwise
        # run ~2k chunks (an hour of device work) in ONE program — the same
        # relay-worker crash class bisected in train() — and pull the whole
        # (C, B, dim) result in a single GB-sized D2H. Super-chunk splits are
        # result-identical (per-doc seeding makes vectors batch-invariant;
        # pinned by tests) and keep each result pull tens of MB. At most two
        # program shapes compile (step + final remainder). 0 disables.
        max_docs = int(os.environ.get("AIIS_INFER_DOCS_PER_DISPATCH", "32768"))
        step = c if max_docs <= 0 else max(1, max_docs // chunk)
        out = np.empty((c * chunk, cfg.vector_size), np.float32)
        for s in range(0, c, step):
            e = min(s + step, c)
            words_d, mask_d, init_d, seeds_d = place([a[s:e] for a in chunked])
            res = _infer_vectors_chunked(
                syn1, words_d, mask_d, keep_prob, cum_table, init_d, seeds_d,
                alpha=cfg.alpha, min_alpha=cfg.min_alpha,
                epochs=epochs, negative=cfg.negative,
            )
            out[s * chunk:e * chunk] = np.asarray(res).reshape(
                -1, cfg.vector_size)
        return out[:n]

    def _infer_bucket(self, ids: List[List[int]], bucket: int, epochs: int,
                      len_bucket: int) -> np.ndarray:
        cfg = self.cfg
        n = len(ids)
        padded_ids = ids + [[] for _ in range(bucket - n)]
        words_np, mask_np, seeds, init = self._infer_inputs(padded_ids, len_bucket)
        syn1, keep_prob, cum_table = self._device_consts()
        inputs = [words_np, mask_np, init, seeds]
        if self.mesh is not None:
            # Same constraint as _infer_group_scan's fallback (ADVICE r2): on a
            # multi-process mesh, process-local arrays cannot mix with the
            # globally-sharded consts — replicate the (small) bucket inputs.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import put_global

            rep = NamedSharding(self.mesh, P())
            inputs = [put_global(a, rep) for a in inputs]
        words_d, mask_d, init_d, seeds_d = [jnp.asarray(a) for a in inputs]
        out = _infer_vectors(
            syn1, words_d, mask_d, keep_prob, cum_table, init_d, seeds_d,
            alpha=cfg.alpha, min_alpha=cfg.min_alpha,
            epochs=epochs, negative=cfg.negative,
        )
        return np.asarray(out[:n])

    # ---- persistence ---------------------------------------------------------

    def save(self, path: str, include_tag_vectors: bool = True) -> None:
        state = {
            "cfg": self.cfg,
            "tokens": self.vocab.tokens,
            "counts": self.vocab.counts,
            "syn1neg": self.syn1neg,
            "docvecs": self.docvecs,
            "corpus_count": self.corpus_count,
            "train_fp": self.train_fp,
            "format": "aiis-tpu-doc2vec-v1",
        }
        if include_tag_vectors:
            # Precompute the per-tag query vectors at build time so query serving
            # starts at full speed (they're bit-identical to runtime inference).
            state["tag_vectors"] = self.tag_vectors()
        # tmp + os.replace: the canonical artifact is ~1.2 GB at 1M docs; an
        # in-place truncating write destroyed the only copy on a mid-dump crash
        from ..utils.sidecar_cache import atomic_put

        atomic_put(os.path.dirname(path) or ".", os.path.basename(path),
                   lambda f: pickle.dump(state, f))
        if self.train_fp:
            # sidecar gates _try_reuse_finished's unpickle; written AFTER the
            # pickle so a crash between the two leaves reuse disabled, never
            # a sidecar endorsing a pickle that isn't there yet
            atomic_put(os.path.dirname(path) or ".",
                       os.path.basename(path) + ".trained_fp",
                       lambda f: f.write(self.train_fp.encode("ascii")))

    @staticmethod
    def _from_state(cfg: "Doc2VecConfig", tokens: List[str], counts: np.ndarray,
                    syn1neg: np.ndarray, docvecs: np.ndarray, corpus_count: int,
                    tag_vectors: Optional[np.ndarray]) -> "Doc2VecModel":
        vocab = Vocab.from_counts(tokens, counts, cfg)
        model = Doc2VecModel(
            cfg, vocab, syn1neg, docvecs, corpus_count=corpus_count,
        )
        if tag_vectors is not None:
            model._infer_cache["tag_vectors"] = tag_vectors
            # loaded table is valid exactly for the loaded arrays
            model._infer_cache["tag_vectors_key"] = (
                model.syn1neg, model.vocab.keep_prob, model.vocab.cum_table)
        return model

    @staticmethod
    def load(path: str) -> "Doc2VecModel":
        with open(path, "rb") as f:
            state = pickle.load(f)
        counts = np.asarray(state["counts"])
        tv = state.get("tag_vectors")
        model = Doc2VecModel._from_state(
            state["cfg"], state["tokens"], counts,
            np.asarray(state["syn1neg"]), np.asarray(state["docvecs"]),
            state.get("corpus_count", len(state["docvecs"])),
            np.asarray(tv) if tv is not None else None,
        )
        model.train_fp = state.get("train_fp")
        return model

    # ---- serving cache -------------------------------------------------------
    #
    # The pickle (reference-named ``doc2vec_model``, genmodel.py:162) force-
    # materializes ``docvecs`` — 1.2 GB at 1M docs, ~8-20 s of every serving
    # start, even though the query path only touches syn1neg + the tag-vector
    # table (the index matrix serves similarity). ``load_for_serving`` keeps the
    # pickle canonical and mmaps a derived sidecar directory instead, keyed by
    # the pickle's (size, mtime): docvecs pages fault in only if actually used.

    @staticmethod
    def _serve_cache_fp(path: str) -> dict:
        st = os.stat(path)
        return {
            "format": "aiis-doc2vec-servecache-v1",
            "size": int(st.st_size),
            "mtime_ns": int(st.st_mtime_ns),
        }

    @staticmethod
    def serve_cache_dir(path: str) -> str:
        return path + ".servecache"

    def write_serve_cache(self, path: str,
                          fp: Optional[dict] = None) -> None:
        """Manifest written last (tmp+rename): matching manifest implies the
        array files are complete (utils/sidecar_cache.py protocol).

        ``fp``: fingerprint captured BEFORE the model pickle was read; if the
        pickle changed while this cache was being written (a rebuild racing a
        cold start) the manifest is skipped rather than stamping the new
        pickle's fingerprint over the old pickle's arrays."""
        from ..utils.sidecar_cache import atomic_put, write_manifest

        if fp is None:
            fp = Doc2VecModel._serve_cache_fp(path)
        d = Doc2VecModel.serve_cache_dir(path)
        os.makedirs(d, exist_ok=True)
        atomic_put(d, "syn1neg.npy",
                   lambda f: np.save(f, np.ascontiguousarray(self.syn1neg)))
        atomic_put(d, "docvecs.npy",
                   lambda f: np.save(f, np.ascontiguousarray(self.docvecs)))
        # same validity rule as tag_vectors(): a table left over from swapped
        # weights must not be persisted — the reload would stamp it with the
        # NEW arrays' key and launder the staleness past the runtime guard
        tv = self._infer_cache.get("tag_vectors")
        ckey = self._infer_cache.get("tag_vectors_key")
        key = (self.syn1neg, self.vocab.keep_prob, self.vocab.cum_table)
        if (tv is not None and (ckey is None or len(ckey) != len(key)
                                or any(a is not b for a, b in zip(ckey, key)))):
            tv = None
        if tv is not None:
            atomic_put(d, "tag_vectors.npy",
                       lambda f: np.save(f, np.ascontiguousarray(tv)))
        meta = {
            "cfg": self.cfg,
            "tokens": self.vocab.tokens,
            "counts": np.asarray(self.vocab.counts),
            "corpus_count": int(self.corpus_count),
            "has_tag_vectors": tv is not None,
        }
        atomic_put(d, "meta.pkl", lambda f: pickle.dump(meta, f))
        if Doc2VecModel._serve_cache_fp(path) != fp:
            return  # model pickle changed mid-write: leave the cache stale
        write_manifest(d, {"fp": fp})

    @staticmethod
    def load_for_serving(path: str) -> "Doc2VecModel":
        """mmap the serving cache when fresh; else full unpickle + (best-effort)
        write the cache for the next start. Bit-identical to ``load``."""
        from ..utils.sidecar_cache import read_manifest

        d = Doc2VecModel.serve_cache_dir(path)
        try:
            manifest = read_manifest(d)
            if (manifest is None
                    or manifest.get("fp") != Doc2VecModel._serve_cache_fp(path)):
                raise ValueError("stale serve cache")
            with open(os.path.join(d, "meta.pkl"), "rb") as f:
                meta = pickle.load(f)
            syn1neg = np.load(os.path.join(d, "syn1neg.npy"))
            docvecs = np.load(os.path.join(d, "docvecs.npy"), mmap_mode="r")
            tv = None
            if meta.get("has_tag_vectors"):
                tv = np.load(os.path.join(d, "tag_vectors.npy"))
            return Doc2VecModel._from_state(
                meta["cfg"], meta["tokens"], np.asarray(meta["counts"]),
                syn1neg, docvecs, meta["corpus_count"], tv,
            )
        except (OSError, ValueError, KeyError, json.JSONDecodeError,
                pickle.UnpicklingError, EOFError, AttributeError, ImportError):
            # EOFError/AttributeError/ImportError: truncated or version-skewed
            # meta.pkl — the cache is best-effort, fall back to the canonical
            # pickle instead of dying on engine start
            try:
                fp = Doc2VecModel._serve_cache_fp(path)  # BEFORE the read
            except OSError:
                fp = None
            model = Doc2VecModel.load(path)
            try:
                model.write_serve_cache(path, fp=fp)
            except OSError:
                pass
            return model

    @property
    def vector_size(self) -> int:
        return self.cfg.vector_size
