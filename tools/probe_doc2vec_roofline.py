"""Doc2Vec SGNS training-step roofline on the chip (VERDICT r4 #3).

Answers: where does the 1M-doc build's ~16 ms/step go (52 min train = 195,400
steps of B=512), and how far is that from the hardware bound?

Methodology: the production configuration's components timed standalone, each
inside a multi-step lax.scan so one dispatch amortizes the ~34 ms relay RTT
(CLAUDE.md: interleaved single-process timing only), with the REAL 1M-row
docvecs table so gather/scatter costs are honest. Every large array is a jit
ARGUMENT, never a closure capture — a captured device array becomes an
embedded compile-time constant the relay pulls D2H at ~15 MB/s (the
CLAUDE.md "30-minute compile hang"; this probe's first draft hit exactly
that with the 1.2 GB docvecs table).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_doc2vec_roofline.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from anime_illust_image_searcher_tpu.models import doc2vec as d2v
from anime_illust_image_searcher_tpu.utils.jax_setup import (
    enable_persistent_compile_cache,
)

N_DOCS = 1_000_448   # the real build's padded doc count (1954 x 512)
VOCAB = 10_000
DIM = 300
B = 512
L = 128              # max_doc_len
K = 5                # negative samples
STEPS = 8            # scan length per timed dispatch
TIMED = 4

PEAK_F32 = 98.5e12
HBM_BW = 819e9       # v5e public


def scan_time(body, carry0, consts) -> float:
    """ms per body(carry, i, *consts) application; consts ride as jit args."""

    @jax.jit
    def run(carry, *cs):
        def step(c, i):
            return body(c, i, *cs), None

        out, _ = jax.lax.scan(step, carry,
                              jnp.arange(STEPS, dtype=jnp.uint32))
        return out

    jax.block_until_ready(run(carry0, *consts))
    jax.block_until_ready(run(carry0, *consts))
    walls = []
    for _ in range(TIMED):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry0, *consts))
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls)) / STEPS * 1e3


def main() -> None:
    enable_persistent_compile_cache()
    rng = np.random.RandomState(0)

    print(f"config: N={N_DOCS} V={VOCAB} dim={DIM} B={B} L={L} K={K}",
          flush=True)
    docvecs = jnp.asarray(rng.rand(N_DOCS, DIM).astype(np.float32) * 0.01)
    syn1 = jnp.asarray(rng.rand(VOCAB, DIM).astype(np.float32) * 0.01)
    words = jnp.asarray(rng.randint(0, VOCAB, (B, L), dtype=np.int32))
    mask = jnp.asarray((rng.rand(B, L) < 0.15).astype(np.float32))  # ~20 tags
    keep_prob = jnp.asarray(np.clip(rng.rand(VOCAB), 0.05, 1).astype(np.float32))
    cum_table = jnp.asarray(np.linspace(1 / VOCAB, 1.0, VOCAB, dtype=np.float32))
    doc_idx = jnp.asarray(rng.randint(0, N_DOCS, B, dtype=np.int32))
    lr = jnp.float32(0.025)
    key = jax.random.PRNGKey(0)

    # ---- full production step --------------------------------------------------
    def full_step(carry, i, words, mask, keep_prob, cum_table, doc_idx, lr):
        dv, s1 = carry
        k = jax.random.fold_in(key, i)
        k_keep, k_neg = jax.random.split(k)
        live = d2v._downsample_mask(k_keep, keep_prob, words, mask)
        negs = d2v._sample_negatives(k_neg, cum_table, (B, L, K))
        dvec = dv[doc_idx]
        d_doc, acc, _ = d2v._sgns_grads(dvec, s1, words, live, negs, lr)
        dv = dv.at[doc_idx].add(d_doc)
        s1 = d2v._apply_syn1_update(s1, acc, dvec)
        return (dv, s1)

    t_full = scan_time(full_step, (docvecs, syn1),
                       (words, mask, keep_prob, cum_table, doc_idx, lr))
    print(f"full step            {t_full:7.2f} ms   "
          "(1M build measured ~16 ms)", flush=True)

    # ---- components ------------------------------------------------------------
    def body_negs(carry, i, cum_table):
        k = jax.random.fold_in(key, i)
        negs = d2v._sample_negatives(k, cum_table, (B, L, K))
        return carry + jnp.sum(negs).astype(jnp.float32)

    t_neg = scan_time(body_negs, jnp.float32(0), (cum_table,))
    print(f"  neg sampling       {t_neg:7.2f} ms", flush=True)

    negs_fixed = jnp.asarray(rng.randint(0, VOCAB, (B, L, K), dtype=np.int32))

    def body_nosyn(carry, i, dv, s1, words, mask, negs, doc_idx, lr):
        dvec = dv[doc_idx]
        d_doc, _, _ = d2v._sgns_grads(dvec, s1, words, mask, negs, lr,
                                      need_syn1_grad=False)
        return carry + jnp.sum(d_doc)

    t_nosyn = scan_time(body_nosyn, jnp.float32(0),
                        (docvecs, syn1, words, mask, negs_fixed, doc_idx, lr))
    print(f"  grads w/o syn1 acc {t_nosyn:7.2f} ms   (gathers + 4 einsums)",
          flush=True)

    def body_grads(carry, i, dv, s1, words, mask, negs, doc_idx, lr):
        dvec = dv[doc_idx]
        d_doc, acc, _ = d2v._sgns_grads(dvec, s1, words, mask, negs, lr)
        return carry + jnp.sum(d_doc) + jnp.sum(acc[0])

    t_grads = scan_time(body_grads, jnp.float32(0),
                        (docvecs, syn1, words, mask, negs_fixed, doc_idx, lr))
    print(f"  grads full         {t_grads:7.2f} ms   (+ (B,V) scalar scatter)",
          flush=True)

    acc_fixed = jnp.asarray(rng.rand(B, VOCAB).astype(np.float32) * 1e-4)
    dvec_fixed = jnp.asarray(rng.rand(B, DIM).astype(np.float32) * 0.01)

    def body_update(carry, i, acc, dvec):
        return d2v._apply_syn1_update(carry, acc, dvec)

    t_upd = scan_time(body_update, syn1, (acc_fixed, dvec_fixed))
    print(f"  syn1 update matmul {t_upd:7.2f} ms", flush=True)

    def body_rows(carry, i, doc_idx):
        dvec = carry[doc_idx]
        return carry.at[doc_idx].add(dvec * 1e-6)

    t_rows = scan_time(body_rows, docvecs, (doc_idx,))
    print(f"  docvec rows        {t_rows:7.2f} ms   (1M-row table)",
          flush=True)

    # ---- analytic bound --------------------------------------------------------
    # bytes: syn1 gathers wpos (B,L,D) + wneg (B,L,K,D) f32 reads, re-read in
    # the two einsum pairs (assume 2 HBM passes), the (B,V) acc
    # materialize+read, syn1 read+write for the update, docvec rows.
    gather_bytes = B * L * (1 + K) * DIM * 4 * 2
    acc_bytes = B * VOCAB * 4 * 2
    syn1_bytes = VOCAB * DIM * 4 * 2
    doc_bytes = B * DIM * 4 * 4
    total_bytes = gather_bytes + acc_bytes + syn1_bytes + doc_bytes
    flops = (2 * B * L * (1 + K) * DIM * 2             # logits + d_doc einsums
             + 2 * VOCAB * B * DIM)                    # acc.T @ dvec
    t_bw = total_bytes / HBM_BW * 1e3
    t_mxu = flops / PEAK_F32 * 1e3

    print(flush=True)
    print(f"analytic: {flops / 1e9:.2f} GF/step, "
          f"{total_bytes / 1e6:.1f} MB/step", flush=True)
    print(f"  HBM bound {t_bw:5.2f} ms   f32-MXU bound {t_mxu:5.2f} ms",
          flush=True)
    print(f"  full step is {t_full / max(t_bw, t_mxu):.1f}x the max(bounds)",
          flush=True)


if __name__ == "__main__":
    main()
