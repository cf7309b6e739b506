"""Vendored numpy SGNS oracle: gensim-semantics tests for the JAX PV-DBOW.

No gensim exists in this environment, so these tests vendor the *published*
PV-DBOW/SGNS math (the word2vec negative-sampling update rule gensim
implements in doc2vec_inner.pyx, reference: genmodel.py:159-161) as a ~50-line
sequential numpy trainer and assert the JAX implementation against it:

  1. the per-occurrence update rule (exact equality on a crafted step)
  2. the negative-sampling noise distribution ∝ count^0.75
  3. the frequent-word downsampling keep-probability formula and its
     empirical keep rate
  4. vocabulary sort order: descending count, insertion-order ties
  5. rank-level agreement of trained doc-similarity structure on a 60-doc
     two-topic corpus (VERDICT r1 #5: catch a wrong update rule, not just
     self-drift)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.models.doc2vec import (
    Doc2VecModel, Vocab, _apply_syn1_update, _downsample_mask, _sample_negatives,
    _sgns_grads,
)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def oracle_step(dvec, syn1, word, negs, lr):
    """One PV-DBOW occurrence, the canonical sequential SGNS update:
    syn1 rows move along the OLD doc vector; the doc vector moves by the
    accumulated error AFTER the word's rows are updated (word2vec.c /
    gensim doc2vec_inner semantics)."""
    neu1e = np.zeros_like(dvec)
    g = (1.0 - sigmoid(dvec @ syn1[word])) * lr
    neu1e += g * syn1[word]
    syn1[word] = syn1[word] + g * dvec
    for n in negs:
        if n == word:
            continue  # gensim skips negatives colliding with the target
        g = (0.0 - sigmoid(dvec @ syn1[n])) * lr
        neu1e += g * syn1[n]
        syn1[n] = syn1[n] + g * dvec
    return dvec + neu1e, syn1


def oracle_train(corpus_ids, n_vocab, dim, epochs, alpha, min_alpha, negative,
                 noise_cum, keep_prob, seed):
    """Sequential PV-DBOW trainer (gensim dm=0, dbow_words=0, workers=1)."""
    rng = np.random.RandomState(seed)
    docvecs = (rng.rand(len(corpus_ids), dim).astype(np.float64) - 0.5) / dim
    syn1 = np.zeros((n_vocab, dim), np.float64)
    for epoch in range(epochs):
        lr = alpha - (alpha - min_alpha) * epoch / max(epochs, 1)
        for d, doc in enumerate(corpus_ids):
            dvec = docvecs[d]
            for w in doc:
                if rng.rand() >= keep_prob[w]:
                    continue
                negs = np.searchsorted(noise_cum, rng.rand(negative))
                dvec, syn1 = oracle_step(dvec, syn1, w, negs, lr)
            docvecs[d] = dvec
    return docvecs, syn1


# ------------------------------------------------------ 1. exact update rule


def test_sgns_update_rule_matches_oracle_exactly():
    """With one word occurrence and distinct negatives, the batched JAX update
    must equal the sequential oracle bit-for-bit (f32): same doc-vector delta,
    same syn1 row updates. A wrong gradient, wrong label, missing lr, or a
    new-value-instead-of-old bug all fail this."""
    rng = np.random.RandomState(0)
    dim, v = 16, 12
    dvec = rng.randn(1, dim).astype(np.float32)
    syn1 = rng.randn(v, dim).astype(np.float32) * 0.3
    word = np.array([[3]], np.int32)
    negs = np.array([[[5, 7, 3]]], np.int32)  # includes a collision (3)
    live = np.ones((1, 1), np.float32)
    lr = np.float32(0.17)

    d_doc, acc, _ = _sgns_grads(
        jnp.asarray(dvec), jnp.asarray(syn1), jnp.asarray(word),
        jnp.asarray(live), jnp.asarray(negs), jnp.asarray(lr))
    new_syn1 = np.asarray(_apply_syn1_update(jnp.asarray(syn1), acc, jnp.asarray(dvec)))
    new_dvec = dvec[0] + np.asarray(d_doc)[0]

    ref_dvec, ref_syn1 = oracle_step(
        dvec[0].astype(np.float64), syn1.astype(np.float64).copy(), 3,
        [5, 7, 3], float(lr))
    np.testing.assert_allclose(new_dvec, ref_dvec, atol=1e-6)
    np.testing.assert_allclose(new_syn1, ref_syn1, atol=1e-6)
    # the colliding negative must not have produced a second update on row 3
    g3 = (1.0 - sigmoid(dvec[0] @ syn1[3])) * float(lr)
    np.testing.assert_allclose(new_syn1[3], syn1[3] + g3 * dvec[0], atol=1e-6)


def test_sgns_multibatch_is_minibatch_of_oracle_gradients():
    """For several docs x words in one batch, the JAX step must equal the SUM of
    per-occurrence oracle gradients all evaluated at the OLD parameters
    (documented mini-batch deviation, QUIRKS 'New-framework notes')."""
    rng = np.random.RandomState(1)
    b, l, k, dim, v = 3, 4, 2, 8, 20
    dvec = rng.randn(b, dim).astype(np.float32)
    syn1 = rng.randn(v, dim).astype(np.float32) * 0.2
    words = rng.randint(0, v, (b, l)).astype(np.int32)
    negs = rng.randint(0, v, (b, l, k)).astype(np.int32)
    live = (rng.rand(b, l) < 0.8).astype(np.float32)
    lr = np.float32(0.05)

    d_doc, acc, _ = _sgns_grads(
        jnp.asarray(dvec), jnp.asarray(syn1), jnp.asarray(words),
        jnp.asarray(live), jnp.asarray(negs), jnp.asarray(lr))
    got_syn1 = np.asarray(_apply_syn1_update(jnp.asarray(syn1), acc, jnp.asarray(dvec)))
    got_dvec = dvec + np.asarray(d_doc)

    ref_syn1 = syn1.astype(np.float64).copy()
    ref_dvec = dvec.astype(np.float64).copy()
    for bi in range(b):
        for li in range(l):
            if not live[bi, li]:
                continue
            w = words[bi, li]
            g = (1.0 - sigmoid(dvec[bi] @ syn1[w])) * lr
            ref_dvec[bi] += g * syn1[w]
            ref_syn1[w] += g * dvec[bi]
            for n in negs[bi, li]:
                if n == w:
                    continue
                g = (0.0 - sigmoid(dvec[bi] @ syn1[n])) * lr
                ref_dvec[bi] += g * syn1[n]
                ref_syn1[n] += g * dvec[bi]
    np.testing.assert_allclose(got_dvec, ref_dvec, atol=1e-5)
    np.testing.assert_allclose(got_syn1, ref_syn1, atol=1e-5)


# -------------------------------------------- 2. negative-sampling distribution


def test_negative_sampling_distribution_follows_counts_075():
    counts = np.array([1000, 300, 90, 25, 7, 2, 1], np.int64)
    corpus = []
    for i, c in enumerate(counts):  # insertion order == id order here
        corpus.extend([[f"t{i}"]] * int(c))
    vocab = Vocab.build(corpus, Doc2VecConfig())
    expected = counts ** 0.75
    expected = expected / expected.sum()

    draws = np.asarray(_sample_negatives(
        jax.random.PRNGKey(0), jnp.asarray(vocab.cum_table), (200_000,)))
    got = np.bincount(draws, minlength=len(counts)) / draws.size
    np.testing.assert_allclose(got, expected, rtol=0.05, atol=0.002)


# ------------------------------------------------------ 3. downsampling formula


def test_keep_prob_matches_gensim_formula_and_empirical_rate():
    counts = np.array([5000, 800, 50, 3], np.int64)
    corpus = []
    for i, c in enumerate(counts):
        corpus.extend([[f"t{i}"]] * int(c))
    cfg = Doc2VecConfig(sample=1e-3)
    vocab = Vocab.build(corpus, cfg)

    freq = counts / counts.sum()
    expected = np.minimum((np.sqrt(freq / cfg.sample) + 1) * (cfg.sample / freq), 1.0)
    np.testing.assert_allclose(vocab.keep_prob, expected.astype(np.float32), atol=1e-7)
    assert expected[0] < 1.0 and expected[-1] == 1.0  # frequent down, rare kept

    words = jnp.zeros((1, 100_000), jnp.int32)  # 100k occurrences of token 0
    mask = jnp.ones_like(words, jnp.float32)
    live = np.asarray(_downsample_mask(
        jax.random.PRNGKey(1), jnp.asarray(vocab.keep_prob), words, mask))
    assert abs(live.mean() - expected[0]) < 0.01


def test_sample_zero_disables_downsampling():
    vocab = Vocab.build([["a"], ["a"], ["b"]], Doc2VecConfig(sample=0.0))
    np.testing.assert_array_equal(vocab.keep_prob, np.ones(2, np.float32))


# ------------------------------------------------------------ 4. vocab order


def test_vocab_sort_descending_count_insertion_ties():
    corpus = [["m", "z", "a"], ["z", "q", "a"], ["z", "m"]]
    # counts: z=3, m=2, a=2, q=1; m seen before a -> tie broken by insertion
    vocab = Vocab.build(corpus, Doc2VecConfig(min_count=1))
    assert vocab.tokens == ["z", "m", "a", "q"]
    np.testing.assert_array_equal(vocab.counts, [3, 2, 2, 1])

    # independent reference: python stable sort over first-seen order
    first_seen = {}
    counts = {}
    for doc in corpus:
        for t in doc:
            first_seen.setdefault(t, len(first_seen))
            counts[t] = counts.get(t, 0) + 1
    ref = sorted(counts, key=lambda t: first_seen[t])
    ref = sorted(ref, key=lambda t: -counts[t])  # stable
    assert vocab.tokens == ref


def test_vocab_min_count_filters():
    vocab = Vocab.build([["a", "b"], ["a"]], Doc2VecConfig(min_count=2))
    assert vocab.tokens == ["a"]


# ---------------------------------------------------- 5. trained-structure rank


def test_trained_similarity_structure_matches_oracle():
    """Train the JAX batched model and the sequential numpy oracle on the same
    two-topic corpus (independent RNG streams) and require rank-level agreement
    of the pairwise doc-similarity structure."""
    rng = np.random.RandomState(7)
    topic_a = [f"a{i}" for i in range(12)]
    topic_b = [f"b{i}" for i in range(12)]
    corpus = []
    for i in range(60):
        pool = topic_a if i % 2 == 0 else topic_b
        corpus.append(list(rng.choice(pool, size=8, replace=False)))

    # sample=0: with only ~24 tokens the 1e-3 downsampling drops ~83% of all
    # occurrences and BOTH trainers stay near-random (gensim behaves the same
    # at this scale, QUIRKS 'New-framework notes'); the downsampling formula
    # has its own tests above.
    cfg = Doc2VecConfig(vector_size=32, epochs=120, negative=5, sample=0.0,
                        alpha=0.03, min_alpha=0.0002, max_doc_len=16, seed=1)
    model = Doc2VecModel.train(corpus, cfg, batch_size=16)

    vocab = model.vocab
    corpus_ids = [[vocab.token2id[t] for t in doc] for doc in corpus]
    o_docvecs, _ = oracle_train(
        corpus_ids, len(vocab), cfg.vector_size, cfg.epochs, cfg.alpha,
        cfg.min_alpha, cfg.negative, vocab.cum_table, vocab.keep_prob, seed=99)

    def unit(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    sims_jax = unit(model.docvecs) @ unit(model.docvecs).T
    sims_ora = unit(o_docvecs) @ unit(o_docvecs).T
    iu = np.triu_indices(60, k=1)
    a, b = sims_jax[iu], sims_ora[iu]

    # Spearman rank correlation without scipy
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    rho = np.corrcoef(ra, rb)[0, 1]
    assert rho > 0.6, f"rank correlation vs oracle too low: {rho:.3f}"

    # both must separate the topics the same way
    same = np.fromiter(((i % 2) == (j % 2) for i, j in zip(*iu)), bool)
    for name, s in (("jax", a), ("oracle", b)):
        gap = s[same].mean() - s[~same].mean()
        assert gap > 0.3, f"{name} topic separation too weak: {gap:.3f}"
