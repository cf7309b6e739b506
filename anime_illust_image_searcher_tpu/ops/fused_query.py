"""The fused 'normal'-mode query program: ONE device call per query.

Serving breakdown showed each device round trip costs ~35 ms through the axon relay
(and is nonzero even on local hardware), and the reference-shaped query path makes six
device calls plus one host transfer per input/output array. This program fuses the
whole pipeline (webui.py:345-253 semantics with the intended PRF math, QUIRKS.md #5)
AND packs all per-query inputs/outputs into single f32 buffers, so a warm query is
exactly one H2D transfer, one execution, one D2H transfer:

  sims    = index @ q                      (cosine matvec)
  bm25    = Σ_t w_t·contrib[t, d] with -inf require/exclude masks
            (2-pass comparison sweep: score weights + base-2^ceil(lg W+1)-encoded
            exclude/require counts)
  final   = 0.5·norm(bm25) + 0.5·norm(sims)
  top10   = exact_top_k(final, 10)
  mean    = L2norm(Σ score_i · raw_vec_i / Σ score_i)     raw = row · stored norm
  rerank  = index @ mean
  rf      = norm(0.7·final + 0.3·rerank)
  out     = top10 ++ exact_top_k(rf, topn+10+1) ++ prefix-elbow flag info

The 10 stored raw vectors are row·norm reconstructions — bit-identical to re-running
infer_vector (inference is deterministically seeded), so no SGD happens at query time.
Document/term ids ride in the f32 buffers as int32 BIT PATTERNS (encode_ids_f32 /
pack_query), exact at any corpus/vocab size — the old value-encode capped the
one-dispatch path at 2^24 (16M) docs.

Round 4 measured the program's 21 ms/query cost at 1M docs and rebuilt the hot
stages (ARCHITECTURE §3): the elbow cut is decided from the top-(k+kk+1) prefix
instead of a full corpus sort (with a rare exact re-dispatch for the one
undecidable flag pattern), large top-k is two-level chunked (XLA's TopK costs a
full sort regardless of k), the BM25 sweep dropped a third pass, and 1-5-term
queries ride an 8-slot bucket — 6.9 ms/query @ 1M single-chip interactive,
1.36 ms @ 100k.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


MAX_QUERY_TERMS = 64


# Id lanes ride f32 buffers as BIASED int32 bit patterns: pattern = id + 2^30.
# The bias keeps every realistic id inside the NORMAL f32 range [~2.0, huge):
# raw patterns of ids < 2^23 are f32 DENORMALS, which XLA:TPU flushes to zero
# somewhere along the output path (caught by the on-chip suite: every small
# doc id decoded as 0), and id -1's raw pattern is a NaN the transport may
# canonicalize. Biased patterns are exact for ids in [-1, ID_ENCODE_LIMIT);
# the limit (~1.06e9) is far beyond any single-program corpus (a 1B-doc
# matrix would not fit HBM at any dim; shard the mesh long before).
_ID_BIAS = np.int32(0x4000_0000)
ID_ENCODE_LIMIT = int(0x7F80_0000 - 0x4000_0000)  # first Inf/NaN pattern


def encode_ids_f32(ids: jax.Array) -> jax.Array:
    """Bit-exact int32 ids riding in an f32 result buffer.

    The packed output buffers are single f32 vectors (one D2H per query);
    ``ids.astype(f32)`` was exact only below 2^24 — beyond 16M docs the
    one-dispatch paths silently returned wrong ids and the engine had to
    degrade to the ~18x multi-call path (round-4 ceiling, VERDICT r4 #4).
    Bias-bitcasting the int32 id (see _ID_BIAS) is exact for any id below
    ID_ENCODE_LIMIT (~1.06e9); hosts decode with ``decode_ids``."""
    return jax.lax.bitcast_convert_type(
        ids.astype(jnp.int32) + _ID_BIAS, jnp.float32)


def decode_ids(buf: np.ndarray) -> np.ndarray:
    """Host-side inverse of ``encode_ids_f32`` (works on any f32 slice)."""
    raw = np.ascontiguousarray(np.asarray(buf, np.float32)).view(np.int32)
    return raw - _ID_BIAS
# Packed-buffer term-slot buckets. Queries pick the smallest bucket that fits their
# distinct-term count; each bucket compiles its own program (the BM25 comparison
# sweep is (docs × slots × Q), so small queries shouldn't pay a big-Q sweep). The
# 8-slot program serves typical interactive queries (1-5 tags) at 1/8th the sweep
# cost; 64 covers heavy interactive use; 256 removes the old multi-call fallback
# cliff (~18x slower at 100k docs) for enormous queries.
QUERY_TERM_BUCKETS = (8, MAX_QUERY_TERMS, 256)
DIFF_FILTER_THRESH = 1e-6  # webui.py:58
# "no flag at this position" sentinel for the elbow prefix info — must stay exact
# as f32 and above any possible flag position (flags are PREFIX positions,
# bounded by k+kk+1 ≈ topn+2k+1 << 2^24 at any corpus size)
CUT_SENTINEL = 2 ** 24 - 1


# Two-level top-k: XLA's TopK custom call on TPU costs ~a full sort of the
# operand regardless of k (measured: 4.7/4.2/4.4 ms for k=10/810/full-sort at
# 1M rows), so chunk the row dim, take per-chunk top-k (cheap batched sorts of
# CHUNK-sized rows), then reduce the g*k candidates. Exact, including
# lowest-index tie-breaking (see exact_top_k). Applied when rows > threshold.
TOPK_CHUNK = 16384
TOPK_MIN_ROWS = 4 * TOPK_CHUNK


def exact_top_k(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Drop-in ``lax.top_k`` with two-level chunking for large operands.

    Tie-order is identical to ``lax.top_k`` (lowest index first): per-chunk
    top-k preserves index order within a chunk, the flattened candidate array
    orders chunks by ascending base offset, and the final top-k breaks value
    ties by candidate position — i.e. by (chunk, within-chunk index) = global
    index. The -inf padding rows (last chunk only) can never be returned: they
    rank after every real row of their own chunk by index, after every other
    chunk's candidates by position, and the >= 3 full chunks guaranteed by
    TOPK_MIN_ROWS supply >= k real candidates ahead of them (k <= CHUNK/4)."""
    d = x.shape[0]
    if d < TOPK_MIN_ROWS or k > TOPK_CHUNK // 4 or x.ndim != 1:
        return jax.lax.top_k(x, k)
    g = (d + TOPK_CHUNK - 1) // TOPK_CHUNK
    pad = g * TOPK_CHUNK - d
    xr = jnp.concatenate(
        [x, jnp.full((pad,), -jnp.inf, x.dtype)]).reshape(g, TOPK_CHUNK)
    lv, li = jax.lax.top_k(xr, k)                       # (g, k) each
    gi = (li + (jnp.arange(g, dtype=li.dtype) * TOPK_CHUNK)[:, None]).reshape(-1)
    fv, fi = jax.lax.top_k(lv.reshape(-1), k)
    return fv, gi[fi]


# Largest f32 strictly below 1.0 — the max-normalize clamp value.
_ONE_BELOW = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))


def max_normalize(x: jax.Array) -> jax.Array:
    """``x / max(x)`` when the max is positive, else ``x`` (webui.py:377-380),
    hardened for TPU's division lowering.

    XLA:TPU lowers f32 divide to a reciprocal multiply, which lands the max
    element one ulp ABOVE 1.0 (measured: 1.0000001). Downstream that fabricates
    an elbow diff of ~-1.2e-7 between the pinned 1.0 top-10 scores and a
    tied-at-max tail entry — a spurious sub-threshold flag that cut the result
    list INSIDE the top-10 (caught by the tie-heavy pipeline oracle under
    AIIS_TEST_PLATFORM=tpu). Restore the three invariants host numpy division
    provides, without changing a bit on backends with exact f32 division:
      - the max element (and its exact ties) normalize to exactly 1.0;
      - equal inputs stay equal (single multiply/clamp is deterministic);
      - strictly-smaller inputs stay strictly below 1.0 (clamped to the
        largest f32 < 1.0 — in exact arithmetic their quotients are <= 1-2^-24
        anyway, so the clamp only moves values a TPU would have mis-rounded).
    """
    xmax = jnp.max(x)
    y = jnp.minimum(x / xmax, _ONE_BELOW)
    y = jnp.where(x == xmax, jnp.float32(1.0), y)
    return jnp.where(xmax > 0, y, x)


def term_bucket(n_terms: int) -> int:
    """Smallest term bucket holding ``n_terms``; raises above the largest."""
    for b in QUERY_TERM_BUCKETS:
        if n_terms <= b:
            return b
    raise ValueError(
        f"query has {n_terms} terms; max {QUERY_TERM_BUCKETS[-1]}")


def elbow_cut_index(sorted_scores: jax.Array,
                    diff_thresh: float = DIFF_FILTER_THRESH) -> jax.Array:
    """Device form of the reference elbow cut (webui.py:63-80) on a descending score
    vector: mask zero diffs to inf, cut at the second sub-threshold diff (first if
    only one exists, full length if none)."""
    n = sorted_scores.shape[0]
    diffs = sorted_scores[:-1] - sorted_scores[1:]
    diffs = jnp.where(diffs == 0, jnp.inf, diffs)
    flags = diffs < diff_thresh
    count = jnp.sum(flags)
    first_two = jnp.nonzero(flags, size=2, fill_value=n)[0]
    return jnp.where(count >= 2, first_two[1],
                     jnp.where(count == 1, first_two[0], n))


def pack_query(
    query_vec: np.ndarray,          # (F,)
    term_weights: Dict[int, float],
    vocab_size: int,
    magic: int,
    max_terms: int = MAX_QUERY_TERMS,
) -> np.ndarray:
    """One f32 buffer: [qids(Q) | qw(Q) | qexcl(Q) | qreq(Q) | qvec(F) | n_req].

    Term ids ride as BIASED int32 bit patterns in the f32 lanes (exact for
    any realistic id — see encode_ids_f32/_ID_BIAS; the device side bitcasts
    and un-biases them before the integer term compare). Unused slots get id
    -1, which never matches a corpus slot. Queries are human-typed tag lists;
    more than ``max_terms`` raises rather than silently truncating.
    """
    if len(term_weights) > max_terms:
        raise ValueError(f"query has {len(term_weights)} terms; max {max_terms}")
    q = max_terms
    packed = np.zeros(4 * q + len(query_vec) + 1, dtype=np.float32)
    qids = np.full(q, -1, dtype=np.int32)
    qw = packed[q : 2 * q]
    qexcl = packed[2 * q : 3 * q]
    qreq = packed[3 * q : 4 * q]
    n_req = 0
    for j, (term_id, weight) in enumerate(term_weights.items()):
        if term_id < 0 or term_id >= vocab_size:
            continue
        qids[j] = term_id
        if weight < 0:
            qexcl[j] = 1.0
        elif weight > magic:
            qreq[j] = 1.0
            qw[j] = weight - magic
            n_req += 1
        else:
            qw[j] = weight
    packed[:q] = (qids + _ID_BIAS).view(np.float32)
    packed[4 * q : 4 * q + len(query_vec)] = query_vec
    packed[-1] = n_req
    return packed


def _fused_final(
    matrix: jax.Array,
    term_mat: jax.Array,
    contrib_mat: jax.Array,
    packed: jax.Array,
    bm25_weight: float,
    doc2vec_weight: float,
    num_docs: int,
    num_real: int,
    overflow=None,
    ov_max_len: int = 0,
) -> jax.Array:
    """Packed query -> fused final scores (webui.py:345-383: cosine matvec +
    BM25 comparison sweep + max-normalize + 0.5/0.5 fusion + padding mask).
    Shared by the normal-mode PRF programs and the character-mode top-k program
    so every mode ranks from definitionally identical scores.

    ``overflow``: optional (ov_doc, ov_term, ov_contrib) COO triple of per-doc
    term pairs beyond the dense width — the BM25DeviceIndex caps the sweep's
    W at max(64, p99.9 doc length) so one 300-tag outlier doc can't inflate
    every query's (D × W × Q) sweep (measured 4× at 1M docs, ARCHITECTURE §3);
    the spilled pairs score through a tiny scatter-add here instead.
    ``ov_max_len``: the true max distinct terms in any doc (static) — bounds
    the require/exclude base-encode when overflow rows exist."""
    f = matrix.shape[1]
    # slot count rides in the (static) buffer length: [4 term blocks | qvec | n_req]
    q = (packed.shape[0] - f - 1) // 4
    # term ids ride as biased int32 bit patterns in the f32 lanes (pack_query)
    # so the term compare is exact at ANY vocab size, not just below 2^24
    qids = jax.lax.bitcast_convert_type(packed[:q], jnp.int32) - _ID_BIAS
    qw = packed[q : 2 * q]
    qexcl = packed[2 * q : 3 * q]
    qreq = packed[3 * q : 4 * q]
    query_vec = packed[4 * q : 4 * q + f]
    num_required = packed[-1]

    sims = jnp.dot(matrix, query_vec, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

    # BM25 as a query-term comparison sweep: match[d, w, q] = (term == qid) stays a
    # fused register-level intermediate; no corpus-sized gathers or scatters (each
    # segment-sum scatter measured ~25 ms, each big-table gather ~23 ms at 100k docs).
    w_slots = term_mat.shape[1]
    tm = term_mat[:, :, None]                              # (D, W, 1) int32
    match = (tm == qids[None, None, :]).astype(jnp.float32)  # (D, W, Q)
    slot_w = jnp.einsum("dwq,q->dw", match, qw)
    bm25 = jnp.sum(slot_w * contrib_mat, axis=1)
    if overflow is not None:
        # COO spill: (nnz_o, Q) match + scatter-add into the doc vector —
        # nnz_o is tiny by the cap policy (<= max(4096, D/16)), so this stage
        # costs nothing next to the (D, W, Q) sweep it keeps small. Docs
        # without spilled pairs add exactly 0.0, keeping their scores
        # bit-identical to the no-overflow layout.
        ov_doc, ov_term, ov_contrib = overflow
        match_o = (ov_term[:, None]
                   == qids[None, :]).astype(jnp.float32)   # (nnz_o, Q)
        w_o = match_o @ qw
        bm25 = bm25 + jnp.zeros((num_docs,), jnp.float32).at[ov_doc].add(
            w_o * ov_contrib)
    neg_inf = jnp.float32(-jnp.inf)
    # base-encode bound: per-doc hit counts reach the TRUE doc length, which
    # exceeds w_slots when pairs spilled to the overflow
    eff_len = w_slots if overflow is None else max(w_slots, ov_max_len)
    if eff_len <= 4095:
        # One contraction for both mask counts: each slot matches at most one
        # query id, so excl/require hit counts are integers <= eff_len; encode
        # both in base base_k (a power of two >= eff_len+1, so the decode
        # divide is EXACT in f32: hits = excl + base_k*req < base_k*(eff_len+1)
        # <= 2^24; scatter-added integers stay exact below 2^24 regardless of
        # order). Saves a third full pass over the (D, W, Q) match tensor —
        # the sweep is the second-biggest device cost at 1M docs
        # (ARCHITECTURE §3).
        base_k = float(1 << eff_len.bit_length())  # smallest pow2 >= eff_len+1
        hits = jnp.einsum("dwq,q->d", match, qexcl + jnp.float32(base_k) * qreq)
        if overflow is not None:
            hits = hits + jnp.zeros((num_docs,), jnp.float32).at[ov_doc].add(
                match_o @ (qexcl + jnp.float32(base_k) * qreq))
        req_hits = jnp.floor(hits / base_k)
        excl_hits = hits - jnp.float32(base_k) * req_hits
    else:
        excl_hits = jnp.einsum("dwq,q->d", match, qexcl)
        req_hits = jnp.einsum("dwq,q->d", match, qreq)
        if overflow is not None:
            excl_hits = excl_hits + jnp.zeros(
                (num_docs,), jnp.float32).at[ov_doc].add(match_o @ qexcl)
            req_hits = req_hits + jnp.zeros(
                (num_docs,), jnp.float32).at[ov_doc].add(match_o @ qreq)
    bm25 = jnp.where(excl_hits > 0, neg_inf, bm25)
    bm25 = jnp.where(req_hits < num_required, neg_inf, bm25)

    # max-normalization guards exactly as webui.py:377-380 (max_normalize also
    # pins the max element at exactly 1.0 against TPU's reciprocal-multiply
    # division — see its docstring)
    sims = max_normalize(sims)
    bm25 = max_normalize(bm25)

    final = bm25_weight * bm25 + doc2vec_weight * sims

    if num_real and num_real < num_docs:
        # padding rows behave like excluded docs
        row_ids = jnp.arange(num_docs)
        final = jnp.where(row_ids < num_real, final, neg_inf)
    return final


def _query_rf(
    matrix: jax.Array,
    norms: jax.Array,
    term_mat: jax.Array,
    contrib_mat: jax.Array,
    packed: jax.Array,
    bm25_weight: float,
    doc2vec_weight: float,
    orig_weight: float,
    rerank_weight: float,
    num_docs: int,
    k: int,
    num_real: int,
    overflow=None,
    ov_max_len: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared score pipeline: packed query -> (rf, top_vals, top_idx).

    Used by both the fast (prefix-elbow) and exact (full-sort-elbow) programs so
    their rankings are definitionally identical.
    """
    final = _fused_final(matrix, term_mat, contrib_mat, packed,
                         bm25_weight, doc2vec_weight, num_docs, num_real,
                         overflow=overflow, ov_max_len=ov_max_len)
    top_vals, top_idx = exact_top_k(final, k)

    raw = matrix[top_idx] * norms[top_idx][:, None]          # (k, F) raw vectors
    wsum = jnp.sum(top_vals)
    weights = jnp.where(wsum == 0, jnp.ones_like(top_vals), top_vals)
    wsum = jnp.where(wsum == 0, jnp.float32(k), wsum)
    mean = jnp.sum(weights[:, None] * raw, axis=0) / wsum
    mnorm = jnp.linalg.norm(mean)
    mean = jnp.where(mnorm > 0, mean / mnorm, mean)

    rerank = jnp.dot(matrix, mean, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    rf = max_normalize(orig_weight * final + rerank_weight * rerank)
    return rf, top_vals, top_idx


def _fused_query_impl(
    matrix: jax.Array,        # (D, F) unit rows (D may include padding rows)
    norms: jax.Array,         # (D,) pre-normalization norms
    term_mat: jax.Array,      # (D, W) int32, padded with vocab_size sentinel
    contrib_mat: jax.Array,   # (D, W) f32, padded with 0
    packed: jax.Array,        # pack_query() buffer
    bm25_weight: float,
    doc2vec_weight: float,
    orig_weight: float,
    rerank_weight: float,
    vocab_size: int,
    num_docs: int,
    topn: int,
    k: int,
    num_real: int = 0,        # 0 -> num_docs; < num_docs when rows are padding
                              # (multi-chip sharding pads D to the mesh size)
    diff_thresh: float = DIFF_FILTER_THRESH,  # SearchConfig.diff_filter_thresh
    overflow=None,            # COO spill triple (see _fused_final)
    ov_max_len: int = 0,
) -> jax.Array:
    """Returns one f32 buffer:
    [top10_scores(k) | top10_ids(k) | r_scores(kk) | r_ids(kk) | elbow info(3)].

    The elbow cut is computed on the top-(k+kk+1) PREFIX of the result list
    instead of a full corpus sort (the sort was the single biggest device cost at
    1M docs). The host only ever truncates the <= k+kk assembled results, so the
    cut position matters only when it lands inside that prefix — and every flag
    position < k+kk is determined by the prefix alone. The one case the prefix
    cannot decide (exactly ONE sub-threshold diff in the prefix and real docs
    beyond it: a second flag in the unseen tail would move the cut from that
    flag's position to "past the list") is reported via the packed flag info and
    resolved by the engine re-dispatching ``fused_normal_query_exact`` — rare
    real-tie data, never the common path. See SearchEngine._assemble_fused.

    When the inputs carry NamedShardings (rows over the ``data`` mesh axis), GSPMD
    partitions the matvecs/reductions per shard and inserts the top-k all-gather —
    the single-chip and sharded paths run the same program.
    """
    rf, top_vals, top_idx = _query_rf(
        matrix, norms, term_mat, contrib_mat, packed,
        bm25_weight, doc2vec_weight, orig_weight, rerank_weight,
        num_docs, k, num_real, overflow=overflow, ov_max_len=ov_max_len)

    kk = min(topn + k, num_docs)
    # One top-k serves both the returned candidates (first kk) and the elbow
    # prefix: the top P rf values contain >= kk+1 non-top10 docs (at most k of
    # the P are top10 members), and those are exactly the kk+1 largest non-top10
    # values, i.e. the head of the reference's full sorted tail.
    p = min(k + kk + 1, num_docs)
    vals, ids = exact_top_k(rf, p)
    r_vals, r_idx = vals[:kk], ids[:kk]

    member = jnp.any(ids[:, None] == top_idx[None, :], axis=1)
    order = jnp.argsort(member.astype(jnp.int32), stable=True)  # non-members first
    ex_len = min(kk + 1, num_docs - k)
    sorted_ex = vals[order][:ex_len]

    # Elbow flags over the list prefix [k pinned 1.0 scores] ++ sorted tail head,
    # with the reference's masking (webui.py:63-80): zero diffs -> inf, flag when
    # diff < threshold. Positions/flags are identical to the full-list computation
    # for every position < k+kk.
    full = jnp.concatenate([jnp.ones((k,), jnp.float32), sorted_ex])
    diffs = full[:-1] - full[1:]
    diffs = jnp.where(diffs == 0, jnp.inf, diffs)
    flags = diffs < diff_thresh
    count = jnp.sum(flags).astype(jnp.float32)
    first_two = jnp.nonzero(flags, size=2, fill_value=CUT_SENTINEL)[0]

    return jnp.concatenate([
        top_vals, encode_ids_f32(top_idx), r_vals, encode_ids_f32(r_idx),
        first_two.astype(jnp.float32), count[None],
    ])


def _fused_query_exact_impl(
    matrix: jax.Array,
    norms: jax.Array,
    term_mat: jax.Array,
    contrib_mat: jax.Array,
    packed: jax.Array,
    bm25_weight: float,
    doc2vec_weight: float,
    orig_weight: float,
    rerank_weight: float,
    vocab_size: int,
    num_docs: int,
    topn: int,
    k: int,
    num_real: int = 0,
    diff_thresh: float = DIFF_FILTER_THRESH,
    overflow=None,
    ov_max_len: int = 0,
) -> jax.Array:
    """Full-sort elbow variant: [.. | cut(1)] trailing field instead of flag info.

    The elbow cut here is computed over the FULL corpus-length sorted list — the
    reference semantics verbatim (webui.py:63-80). O(D log D) on device; only
    dispatched when the prefix program reports the one ambiguous flag pattern,
    and kept as the equivalence oracle for tests."""
    rf, top_vals, top_idx = _query_rf(
        matrix, norms, term_mat, contrib_mat, packed,
        bm25_weight, doc2vec_weight, orig_weight, rerank_weight,
        num_docs, k, num_real, overflow=overflow, ov_max_len=ov_max_len)

    kk = min(topn + k, num_docs)
    r_vals, r_idx = jax.lax.top_k(rf, kk)

    rf_excl = rf.at[top_idx].set(-jnp.inf)
    sorted_ex = -jnp.sort(-rf_excl)[: num_docs - k]   # drops k (-inf) placeholders
    full = jnp.concatenate([jnp.ones((k,), jnp.float32), sorted_ex])
    cut = elbow_cut_index(full, diff_thresh).astype(jnp.float32)

    return jnp.concatenate([
        top_vals, encode_ids_f32(top_idx), r_vals, encode_ids_f32(r_idx),
        cut[None],
    ])


def _character_top_impl(
    matrix: jax.Array,        # (D, F) unit rows (D may include padding rows)
    term_mat: jax.Array,      # (D, W) int32, padded with vocab_size sentinel
    contrib_mat: jax.Array,   # (D, W) f32, padded with 0
    packed: jax.Array,        # pack_query() buffer
    bm25_weight: float,
    doc2vec_weight: float,
    vocab_size: int,
    num_docs: int,
    k: int,
    num_real: int = 0,
    overflow=None,
    ov_max_len: int = 0,
) -> jax.Array:
    """Character-mode stage A: fused scores -> top-k, ONE device call.

    The reference's character path needs only the top-10 fused hits before the
    CCIP rerank takes over (webui.py:255-342 consumes sims[:10]); the rest of
    the corpus-length score vector exists in the reference only to be sorted
    and discarded. Returns [top_vals(k) | top_ids(k)] — ~80 bytes instead of a
    corpus-length D2H (4 MB at 1M docs through a ~15 MB/s relay) plus a full
    host sort (seconds of python at 1M). exact_top_k breaks ties toward the
    lowest index, matching the reference's stable sorted(enumerate(...)).

    PRF doc-vector reconstruction never runs here, so this path needs no
    stored norms — it stays available on pre-v1.1 indexes where the normal
    fused program falls back."""
    final = _fused_final(matrix, term_mat, contrib_mat, packed,
                         bm25_weight, doc2vec_weight, num_docs, num_real,
                         overflow=overflow, ov_max_len=ov_max_len)
    top_vals, top_idx = exact_top_k(final, k)
    return jnp.concatenate([top_vals, encode_ids_f32(top_idx)])


fused_character_top = partial(jax.jit, static_argnames=(
    "vocab_size", "num_docs", "k", "num_real", "ov_max_len"))(_character_top_impl)


@partial(jax.jit, static_argnames=(
    "vocab_size", "num_docs", "k", "num_real", "ov_max_len"))
def fused_character_top_batch(
    matrix: jax.Array,
    term_mat: jax.Array,
    contrib_mat: jax.Array,
    packed_batch: jax.Array,  # (B, buflen) — B stacked pack_query() buffers
    bm25_weight: float,
    doc2vec_weight: float,
    vocab_size: int,
    num_docs: int,
    k: int,
    num_real: int = 0,
    overflow=None,
    ov_max_len: int = 0,
) -> jax.Array:
    """B concurrent character-mode stage A's in ONE device program (vmapped
    over the packed buffers; the index arrays broadcast) — the character-mode
    counterpart of ``fused_normal_query_batch`` for the webui micro-batcher."""

    def one(p):
        return _character_top_impl(
            matrix, term_mat, contrib_mat, p, bm25_weight, doc2vec_weight,
            vocab_size=vocab_size, num_docs=num_docs, k=k, num_real=num_real,
            overflow=overflow, ov_max_len=ov_max_len)

    return jax.vmap(one)(packed_batch)


fused_normal_query = partial(jax.jit, static_argnames=(
    "vocab_size", "num_docs", "topn", "k", "num_real",
    "ov_max_len"))(_fused_query_impl)

fused_normal_query_exact = partial(jax.jit, static_argnames=(
    "vocab_size", "num_docs", "topn", "k", "num_real",
    "ov_max_len"))(_fused_query_exact_impl)


@partial(jax.jit, static_argnames=(
    "vocab_size", "num_docs", "topn", "k", "num_real", "ov_max_len"))
def fused_normal_query_batch(
    matrix: jax.Array,
    norms: jax.Array,
    term_mat: jax.Array,
    contrib_mat: jax.Array,
    packed_batch: jax.Array,  # (B, buflen) — B stacked pack_query() buffers
    bm25_weight: float,
    doc2vec_weight: float,
    orig_weight: float,
    rerank_weight: float,
    vocab_size: int,
    num_docs: int,
    topn: int,
    k: int,
    num_real: int = 0,
    diff_thresh: float = DIFF_FILTER_THRESH,
    overflow=None,
    ov_max_len: int = 0,
) -> jax.Array:
    """Batched fused query: B concurrent queries in ONE device program (vmapped
    over the packed buffers; the index arrays broadcast). The webui micro-batcher
    (cli/webui.py) coalesces concurrent /api/search requests onto this — B queries
    cost ~one query's round trip instead of B serialized ones."""

    def one(p):
        return _fused_query_impl(
            matrix, norms, term_mat, contrib_mat, p,
            bm25_weight, doc2vec_weight, orig_weight, rerank_weight,
            vocab_size=vocab_size, num_docs=num_docs, topn=topn, k=k,
            num_real=num_real, diff_thresh=diff_thresh,
            overflow=overflow, ov_max_len=ov_max_len,
        )

    return jax.vmap(one)(packed_batch)


@partial(jax.jit, static_argnames=(
    "vocab_size", "num_docs", "topn", "k", "num_real", "ov_max_len"))
def fused_normal_query_serial(
    matrix: jax.Array,
    norms: jax.Array,
    term_mat: jax.Array,
    contrib_mat: jax.Array,
    packed_batch: jax.Array,  # (N, buflen) — N stacked pack_query() buffers
    bm25_weight: float,
    doc2vec_weight: float,
    orig_weight: float,
    rerank_weight: float,
    vocab_size: int,
    num_docs: int,
    topn: int,
    k: int,
    num_real: int = 0,
    diff_thresh: float = DIFF_FILTER_THRESH,
    overflow=None,
    ov_max_len: int = 0,
) -> jax.Array:
    """N queries run SEQUENTIALLY on device (lax.scan lowers to a While loop, so
    iterations cannot overlap). This is the measurement instrument behind
    ``bench_query.py --device-only``: wall time of ONE dispatch divided by N is a
    direct upper bound on single-query device latency — no batching parallelism
    inflating the number, no transport-floor subtraction (VERDICT r2 weak #1).
    Semantics identical to ``fused_normal_query`` per row."""

    def step(carry, p):
        out = _fused_query_impl(
            matrix, norms, term_mat, contrib_mat, p,
            bm25_weight, doc2vec_weight, orig_weight, rerank_weight,
            vocab_size=vocab_size, num_docs=num_docs, topn=topn, k=k,
            num_real=num_real, diff_thresh=diff_thresh,
            overflow=overflow, ov_max_len=ov_max_len,
        )
        return carry, out

    _, outs = jax.lax.scan(step, jnp.int32(0), packed_batch)
    return outs


def unpack_result(
    out: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           Tuple[int, int, int]]:
    """Split the fast program's packed output buffer into
    (top_vals, top_idx, r_vals, r_idx, (first_flag, second_flag, flag_count)).

    Flag positions are CUT_SENTINEL when absent. The engine resolves them to a
    cut (or an exact re-dispatch) in SearchEngine._assemble_fused."""
    top_vals = out[:k]
    top_idx = decode_ids(out[k : 2 * k]).astype(np.int64)
    rest = out[2 * k : -3]
    kk = len(rest) // 2
    cut_info = (int(out[-3]), int(out[-2]), int(out[-1]))
    return (top_vals, top_idx, rest[:kk],
            decode_ids(rest[kk : 2 * kk]).astype(np.int64), cut_info)


def unpack_result_exact(
    out: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Split the EXACT program's buffer: trailing field is the full-list cut."""
    top_vals = out[:k]
    top_idx = decode_ids(out[k : 2 * k]).astype(np.int64)
    rest = out[2 * k : -1]
    kk = len(rest) // 2
    cut = int(out[-1])
    return (top_vals, top_idx, rest[:kk],
            decode_ids(rest[kk : 2 * kk]).astype(np.int64), cut)
