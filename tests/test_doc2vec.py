"""PV-DBOW training/inference semantics: determinism, persistence, and — the property
the search engine actually relies on — docs cluster with the tags they contain."""

import dataclasses

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.config import Doc2VecConfig
from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel, Vocab

CFG = Doc2VecConfig(vector_size=32, epochs=40, infer_epochs=40, max_doc_len=16,
                    sample=0)  # no downsampling in tiny corpora: every tag is frequent

CAT_DOCS = [["cat", "whiskers", "feline", "meow"] for _ in range(8)]
DOG_DOCS = [["dog", "bark", "canine", "fetch"] for _ in range(8)]
CORPUS = CAT_DOCS + DOG_DOCS


def cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.fixture(scope="module")
def model():
    return Doc2VecModel.train(CORPUS, CFG, batch_size=8)


def test_vocab_sorted_by_count():
    v = Vocab.build([["a"], ["b", "b"], ["c", "c", "c"]], CFG)
    assert v.tokens == ["c", "b", "a"]
    assert v.counts.tolist() == [3, 2, 1]


def test_vocab_min_count():
    cfg = dataclasses.replace(CFG, min_count=2)
    v = Vocab.build([["a", "b"], ["b"]], cfg)
    assert v.tokens == ["b"]


def test_infer_is_deterministic(model):
    a = model.infer_vector(["cat", "meow"])
    b = model.infer_vector(["cat", "meow"])
    np.testing.assert_array_equal(a, b)


def test_training_is_deterministic():
    m1 = Doc2VecModel.train(CORPUS, CFG, batch_size=8)
    m2 = Doc2VecModel.train(CORPUS, CFG, batch_size=8)
    np.testing.assert_array_equal(m1.syn1neg, m2.syn1neg)
    np.testing.assert_array_equal(m1.docvecs, m2.docvecs)


def test_infer_super_chunk_split_is_bit_identical(model, monkeypatch):
    """AIIS_INFER_DOCS_PER_DISPATCH splits the index build's big inference
    scan into bounded dispatches (same relay-worker crash class as training;
    a 1M-doc corpus is ~2k scan chunks in one program otherwise). Per-doc
    seeding makes vectors batch-invariant, so every split must be
    bit-identical to the single-dispatch form."""
    rng = np.random.RandomState(4)
    vocab_tokens = ["cat", "whiskers", "feline", "meow",
                    "dog", "bark", "canine", "fetch"]
    docs = [[vocab_tokens[j] for j in rng.randint(0, 8, size=4)]
            for _ in range(1100)]  # > 2 full 512-doc chunks + remainder

    monkeypatch.setenv("AIIS_INFER_DOCS_PER_DISPATCH", "0")
    single = model.infer_vectors(docs)
    monkeypatch.setenv("AIIS_INFER_DOCS_PER_DISPATCH", "512")
    split = model.infer_vectors(docs)
    np.testing.assert_array_equal(single, split)


def test_capped_dispatch_stride_is_bit_identical(monkeypatch):
    """AIIS_TRAIN_STEPS_PER_DISPATCH splits training into shorter device
    dispatches (a ~19.5k-step single dispatch crashes relay-fronted workers at
    1M docs — doc2vec.py train() bisect note). The split must be invisible:
    bit-identical model, and every log boundary still lands exactly (the
    capped stride divides the boundary gcd)."""
    from anime_illust_image_searcher_tpu.models import doc2vec as d2v

    baseline = Doc2VecModel.train(CORPUS, CFG, batch_size=8)

    calls = []
    orig = d2v._train_epochs

    def recording(*args, **kwargs):
        calls.append(int(args[8].shape[0]))  # epoch_ids length = segment epochs
        return orig(*args, **kwargs)

    monkeypatch.setattr(d2v, "_train_epochs", recording)
    # 2 batches/epoch, cap 2 steps/dispatch -> 1 epoch per dispatch; the
    # log_every=10 gcd stride (10) must shorten to a divisor (1)
    monkeypatch.setenv("AIIS_TRAIN_STEPS_PER_DISPATCH", "2")
    capped = Doc2VecModel.train(CORPUS, CFG, batch_size=8, log_every=10)
    assert calls and max(calls) == 1 and len(calls) == CFG.epochs
    np.testing.assert_array_equal(capped.syn1neg, baseline.syn1neg)
    np.testing.assert_array_equal(capped.docvecs, baseline.docvecs)


def test_topic_separation(model):
    """A 'cat' query vector must rank cat docs above dog docs — the core retrieval
    property the engine depends on (webui.py:106,352)."""
    cat_q = model.infer_vector(["cat"])
    cat_doc = model.infer_vector(CAT_DOCS[0])
    dog_doc = model.infer_vector(DOG_DOCS[0])
    assert cos(cat_q, cat_doc) > cos(cat_q, dog_doc)


def test_batched_infer_matches_single(model):
    batch = model.infer_vectors([["cat"], ["dog"]])
    single_cat = model.infer_vector(["cat"])
    single_dog = model.infer_vector(["dog"])
    np.testing.assert_allclose(batch[0], single_cat, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batch[1], single_dog, rtol=1e-5, atol=1e-6)


def test_scan_fused_infer_matches_bucketed(model):
    """The index-build path (groups larger than the 512-doc chunk) runs one
    scan-fused program; per-doc seeding must make its vectors bitwise equal to
    the per-chunk bucketed path."""
    docs = [["cat"], ["dog"], ["cat", "meow"], ["dog", "bark"]] * 3
    bucketed = model.infer_vectors(docs)
    fused = model._infer_group_scan(
        [[model.vocab.token2id[t] for t in d] for d in docs],
        chunk=4, epochs=CFG.infer_epochs,
        len_bucket=model._len_bucket(2),
    )
    np.testing.assert_array_equal(bucketed, fused)


def test_save_load_roundtrip(tmp_path, model):
    p = str(tmp_path / "doc2vec_model")
    model.save(p)
    m2 = Doc2VecModel.load(p)
    np.testing.assert_array_equal(m2.syn1neg, model.syn1neg)
    a = model.infer_vector(["cat", "meow"])
    b = m2.infer_vector(["cat", "meow"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_oov_tokens_ignored(model):
    v = model.infer_vector(["cat", "not_in_vocab_tag"])
    assert v.shape == (CFG.vector_size,)
    assert np.all(np.isfinite(v))


def test_fused_epoch_runs_match_per_epoch_dispatch():
    """_train_epochs (scan over epochs, one dispatch per checkpoint interval) must be
    bit-identical to dispatching _train_epoch per epoch — same fold_in(base_key, e)
    keys, same host-precomputed f32 LR schedule."""
    import jax
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.doc2vec import (
        _train_epoch, _train_epochs,
    )

    rng = np.random.RandomState(1)
    n, v, dim, L, B = 16, 32, 24, 8, 8
    docvecs = jnp.asarray(rng.rand(n, dim).astype(np.float32) * 0.1)
    syn1 = jnp.asarray(rng.rand(v, dim).astype(np.float32) * 0.1)
    words = jnp.asarray(rng.randint(0, v, (2, B, L)).astype(np.int32))
    mask = jnp.ones((2, B, L), jnp.float32)
    doc_idx = jnp.asarray(np.arange(n, dtype=np.int32).reshape(2, B))
    keep = jnp.ones((v,), jnp.float32)
    cum = jnp.asarray(np.linspace(1 / v, 1, v, dtype=np.float32))
    base_key = jax.random.PRNGKey(7)
    epochs = 5
    lrs = np.asarray([0.025 - 0.02 * e / epochs for e in range(epochs)], np.float32)

    dv_a, s1_a = jnp.array(docvecs), jnp.array(syn1)  # donated args: copy first
    for e in range(epochs):
        dv_a, s1_a = _train_epoch(
            dv_a, s1_a, doc_idx, words, mask, keep, cum,
            jax.random.fold_in(base_key, e), jnp.float32(lrs[e]), negative=5,
        )

    dv_b, s1_b = _train_epochs(
        jnp.array(docvecs), jnp.array(syn1), doc_idx, words, mask, keep, cum,
        base_key, jnp.arange(epochs, dtype=jnp.uint32), jnp.asarray(lrs),
        negative=5,
    )
    np.testing.assert_array_equal(np.asarray(dv_a), np.asarray(dv_b))
    np.testing.assert_array_equal(np.asarray(s1_a), np.asarray(s1_b))


def test_negative_sampler_method_equivalence():
    """_sample_negatives uses the fast searchsorted lowerings ('compare_all' /
    'sort'); they must keep returning indices identical to the reference 'scan'
    lowering — the training/inference bit-stability guarantee rides on it."""
    import jax
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.doc2vec import _sample_negatives

    for v in (37, 4000, 20000):  # spans both method branches
        cum = jnp.asarray(np.cumsum(np.random.RandomState(v).rand(v)).astype(np.float32))
        cum = cum / cum[-1]
        key = jax.random.PRNGKey(v)
        got = _sample_negatives(key, cum, (16, 8, 5))
        u = jax.random.uniform(key, (16, 8, 5))
        ref = jnp.searchsorted(cum, u, method="scan").astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_train_epoch_bf16_gather_option_close_to_f32():
    """The opt-in bf16 syn1 gather (Doc2VecConfig.train_gather_bf16) must track
    the f32 path closely — measured as a perf no-op on v5e, kept as an option."""
    import jax
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.doc2vec import _train_epoch

    rng = np.random.RandomState(0)
    n, v, dim, L, B = 16, 32, 24, 8, 8
    docvecs = jnp.asarray(rng.rand(n, dim).astype(np.float32) * 0.1)
    syn1 = jnp.asarray(rng.rand(v, dim).astype(np.float32) * 0.1)
    words = jnp.asarray(rng.randint(0, v, (2, B, L)).astype(np.int32))
    mask = jnp.ones((2, B, L), jnp.float32)
    doc_idx = jnp.asarray(np.arange(n, dtype=np.int32).reshape(2, B))
    keep = jnp.ones((v,), jnp.float32)
    cum = jnp.asarray(np.linspace(1 / v, 1, v, dtype=np.float32))
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(0.025)

    # _train_epoch donates its first two args; make copies up front
    dv2, s12 = jnp.array(docvecs), jnp.array(syn1)
    out_f = _train_epoch(docvecs, syn1, doc_idx, words, mask, keep, cum, key, lr,
                         negative=5, gather_bf16=False)
    out_b = _train_epoch(dv2, s12, doc_idx, words, mask,
                         keep, cum, key, lr, negative=5, gather_bf16=True)
    for a, b in zip(out_f, out_b):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_stable_doc_seed_semantics(model):
    """Pins _stable_doc_seed's contract (VERDICT r3 weak #4): order-insensitive
    over the token-id multiset; a doc whose ids INCLUDE token id 0 seeds (and
    infers) differently from its 'padded twin' without it — bucket fill appends
    empty docs, it never zero-pads a row into the hash."""
    from anime_illust_image_searcher_tpu.models.doc2vec import _stable_doc_seed

    # order-insensitive: permutations of the same multiset share a seed
    assert _stable_doc_seed([3, 1, 2], 7) == _stable_doc_seed([2, 3, 1], 7)
    # multiset, not set: duplicate ids change the seed
    assert _stable_doc_seed([1, 1, 2], 7) != _stable_doc_seed([1, 2], 7)
    # token id 0 is a real id, not padding: [0] != [] and [1, 0] != [1]
    assert _stable_doc_seed([0], 7) != _stable_doc_seed([], 7)
    assert _stable_doc_seed([1, 0], 7) != _stable_doc_seed([1], 7)
    # model seed participates
    assert _stable_doc_seed([1, 2], 7) != _stable_doc_seed([1, 2], 8)

    # end-to-end: token id 0 is the most frequent token; a doc of it alone must
    # infer a different vector from the empty doc even though pad_corpus gives
    # both an all-zero id row (the mask + seed distinguish them)
    tok0 = model.vocab.tokens[0]
    v_tok0 = model.infer_vector([tok0])
    v_empty = model.infer_vector([])
    assert not np.array_equal(v_tok0, v_empty)


def test_d2h_chunked_identical_to_single_copy():
    """Bounded-slice device-to-host copies must be byte-identical to one
    np.asarray — the 1M-doc docvecs pull (1.2 GB) uses this path because a
    single GB-sized transfer can crash relay-fronted transports."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.models.doc2vec import _d2h_chunked

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(257, 19).astype(np.float32))
    # tiny budget forces many chunks incl. a ragged tail
    out = _d2h_chunked(x, budget_bytes=1024)
    np.testing.assert_array_equal(out, np.asarray(x))
    # under-budget path returns the single-copy result
    np.testing.assert_array_equal(_d2h_chunked(x), np.asarray(x))
