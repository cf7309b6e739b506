"""Capped dense width + COO overflow for the fused BM25 sweep.

One outlier doc with ~300 distinct tags used to inflate the fused program's
(D × W × Q) comparison sweep for the whole corpus (measured 10.6 → 44 ms/query
at 1M docs; ARCHITECTURE §3). BM25DeviceIndex now caps the dense width at
max(64, p99.9 doc length) and spills longer docs' tail pairs into a COO
overflow scored by a scatter-add inside the same program. These tests pin:

  - the cap policy (no-op for short corpora, cap+spill for outliers,
    full-width fallback for pathological corpora where the spill would be big);
  - scoring equivalence capped-vs-uncapped, including require/exclude tags
    that live ONLY in the overflow region (the -inf mask semantics must be
    exact, not approximate) and bit-identity for docs without spilled pairs;
  - the serve-cache roundtrip of the new arrays + max_doc_len;
  - the batched and character-mode stage-A programs with overflow present.
"""

import numpy as np
import pytest

import anime_illust_image_searcher_tpu.index.bm25_index as bm25_mod
from anime_illust_image_searcher_tpu.index.bm25_index import (
    BM25DeviceIndex, BM25Stats,
)
from anime_illust_image_searcher_tpu.ops.fused_query import (
    fused_character_top, fused_normal_query, fused_normal_query_batch,
    pack_query, unpack_result,
)

VOCAB = 400
DIM = 16
MAGIC = 1000


def _stats(corpus):
    lens = np.asarray([len(c) for c in corpus], np.int64)
    idf = {i: 1.0 + (i % 7) * 0.25 for i in range(VOCAB)}
    return BM25Stats(corpus, idf, float(lens.mean()), len(corpus), lens)


def _outlier_corpus(n=2000, short=5, long_len=200, outlier_doc=7):
    # short docs draw ONLY from ids < 30, so ids >= the capped width (32)
    # exist nowhere but the outlier — and there, in dict order, term id t sits
    # at slot t, putting every id >= 32 in the overflow region specifically
    corpus = [{(i * 13 + j) % 30: 1 + (i + j) % 3 for j in range(short)}
              for i in range(n)]
    corpus[outlier_doc] = {t: 1 + t % 2 for t in range(long_len)}
    return corpus


def _build(corpus, monkeypatch=None, uncapped=False):
    if uncapped:
        # force the legacy full-width layout for the equivalence oracle
        monkeypatch.setattr(bm25_mod, "SLOT_CAP_MIN", 1 << 20)
    return BM25DeviceIndex.from_stats(_stats(corpus), vocab_size=VOCAB)


def test_cap_policy_short_corpus_unchanged():
    di = BM25DeviceIndex.from_stats(
        _stats([{i: 1 for i in range(30)} for _ in range(50)]), vocab_size=VOCAB)
    assert di.term_mat.shape[1] == 32          # natural 8-rounded width
    assert len(di.ov_doc) == 0
    assert di.max_doc_len == 30


def test_cap_policy_outlier_spills(monkeypatch):
    di = _build(_outlier_corpus())
    assert di.term_mat.shape[1] == 32
    assert len(di.ov_doc) == 200 - 32
    assert np.all(di.ov_doc == 7)
    assert di.max_doc_len == 200
    # COO form stays complete/uncapped (the multi-call fallback path reads it)
    assert len(di.doc_ids) == sum(len(c) for c in _outlier_corpus())


def test_cap_policy_pathological_falls_back():
    # EVERY doc is long: the spill would be huge, so keep the full width
    corpus = [{t: 1 for t in range(120)} for _ in range(3000)]
    di = BM25DeviceIndex.from_stats(_stats(corpus), vocab_size=VOCAB)
    assert di.term_mat.shape[1] == 120
    assert len(di.ov_doc) == 0


@pytest.fixture(scope="module")
def pair():
    """(capped, uncapped) device indexes over the same outlier corpus, plus
    shared doc2vec arrays for the fused program."""

    corpus = _outlier_corpus()
    capped = BM25DeviceIndex.from_stats(_stats(corpus), vocab_size=VOCAB)
    orig = bm25_mod.SLOT_CAP_MIN
    bm25_mod.SLOT_CAP_MIN = 1 << 20
    try:
        uncapped = BM25DeviceIndex.from_stats(_stats(corpus), vocab_size=VOCAB)
    finally:
        bm25_mod.SLOT_CAP_MIN = orig
    assert len(capped.ov_doc) and not len(uncapped.ov_doc)

    rng = np.random.RandomState(0)
    n = capped.num_docs
    matrix = rng.standard_normal((n, DIM)).astype(np.float32)
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    norms = np.abs(rng.standard_normal(n)).astype(np.float32) + 0.5
    return capped, uncapped, matrix, norms


def _run(di, matrix, norms, term_weights, topn=50):
    import jax.numpy as jnp

    qvec = np.zeros(DIM, np.float32)
    qvec[0] = 1.0
    packed = pack_query(qvec, term_weights, VOCAB, magic=MAGIC)
    out = np.asarray(fused_normal_query(
        jnp.asarray(matrix), jnp.asarray(norms),
        jnp.asarray(di.term_mat), jnp.asarray(di.contrib_mat),
        jnp.asarray(packed), 0.5, 0.5, 0.7, 0.3,
        vocab_size=VOCAB, num_docs=di.num_docs, topn=topn, k=10,
        overflow=(None if len(di.ov_doc) == 0 else tuple(
            jnp.asarray(a) for a in (di.ov_doc, di.ov_term, di.ov_contrib))),
        ov_max_len=di.max_doc_len,
    ))
    return unpack_result(out, 10)


QUERIES = [
    # plain weighted terms: one dense-region, one overflow-only (term 150
    # exists only in the outlier's overflow slots)
    {3: 1.0, 150: 2.0},
    # exclusion living in the overflow region: doc 7 must be masked out
    {3: 1.0, 150: -1.0},
    # require living in the overflow region: ONLY doc 7 can survive
    {150: MAGIC + 1.0, 3: 1.0},
    # mixed require + exclude, both overflow-only terms
    {150: MAGIC + 1.0, 180: -1.0, 3: 1.0},
    # heavy query (>8 distinct terms -> 64-slot bucket) touching both regions
    {**{t: 1.0 for t in range(10, 20)}, 190: 3.0},
]


@pytest.mark.parametrize("tw", QUERIES, ids=[f"q{i}" for i in range(len(QUERIES))])
def test_capped_matches_uncapped(pair, tw):
    capped, uncapped, matrix, norms = pair
    tv_c, ti_c, rv_c, ri_c, _ = _run(capped, matrix, norms, tw)
    tv_u, ti_u, rv_u, ri_u, _ = _run(uncapped, matrix, norms, tw)
    # ranking identity (ids exact; scores allclose — the capped layout sums
    # the outlier doc's contributions in dense+overflow grouping, an f32
    # reorder of the same terms)
    np.testing.assert_array_equal(ti_c, ti_u)
    np.testing.assert_array_equal(ri_c, ri_u)
    np.testing.assert_allclose(tv_c, tv_u, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(rv_c, rv_u, rtol=1e-6, atol=1e-7)


def test_exclude_in_overflow_masks_doc(pair):
    capped, _, matrix, norms = pair
    _, _, rv, ri, _ = _run(capped, matrix, norms, {3: 1.0, 150: -1.0}, topn=2000)
    # the candidate buffer legitimately carries -inf rows (the host drops
    # v <= 0, webui.py:74-77); doc 7 must never appear with a KEEPABLE score
    doc7 = [float(v) for i, v in zip(ri, rv) if int(i) == 7]
    assert doc7 and all(not (v > 0) for v in doc7)


def test_require_in_overflow_keeps_only_outlier(pair):
    capped, _, matrix, norms = pair
    tv, ti, rv, ri, _ = _run(capped, matrix, norms, {150: MAGIC + 1.0}, topn=2000)
    # every doc except 7 fails the require -> -inf; the top-10 buffer leads
    # with the single surviving doc (the other 9 slots carry -inf scores —
    # reference behavior: a require matching < k docs still pins k "top"
    # entries, webui.py:219-237, and the -inf weights turn the PRF tail NaN
    # exactly like np.average over -inf does in the reference)
    assert int(ti[0]) == 7
    assert np.isfinite(tv[0]) and tv[0] > 0
    assert not np.any(np.isfinite(tv[1:]))


def test_servecache_roundtrip_with_overflow(tmp_path, pair):
    import os

    capped, _, _, _ = pair
    corpus = _outlier_corpus()
    stats = _stats(corpus)
    d = str(tmp_path)
    bm25_mod.save_bm25_artifacts(stats, d)
    built = BM25DeviceIndex.load_or_build(d, vocab_size=VOCAB)
    assert os.path.isdir(BM25DeviceIndex.cache_dir(d))
    cached = BM25DeviceIndex.load_cached(d, VOCAB)
    assert cached is not None
    assert cached.max_doc_len == built.max_doc_len == 200
    np.testing.assert_array_equal(cached.term_mat, built.term_mat)
    np.testing.assert_array_equal(cached.ov_doc, built.ov_doc)
    np.testing.assert_array_equal(cached.ov_term, built.ov_term)
    np.testing.assert_array_equal(cached.ov_contrib, built.ov_contrib)


@pytest.fixture(scope="module")
def engine_dir(tmp_path_factory):
    """A REAL genmodel-built artifact chain whose corpus triggers the cap:
    500 4-tag docs + one 80-distinct-tag outlier (p99.9 of lengths ~42 →
    dense width 64 < natural width 80 → the outlier's tail spills)."""
    import os

    from anime_illust_image_searcher_tpu.cli import genmodel
    from anime_illust_image_searcher_tpu.index import artifacts

    tmp = tmp_path_factory.mktemp("bm25_overflow_engine")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rng = np.random.RandomState(1)
        vocab = [f"t{i:02d}" for i in range(80)]
        lines = []
        for i in range(500):
            tags = list(rng.choice(vocab[:30], size=4, replace=False))
            lines.append(f"/img/{i:03d}.png,{','.join(tags)}")
        # the outlier: every tag in dict order — the tail lands in overflow
        lines.append(f"/img/outlier.png,{','.join(vocab)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "3"])
    finally:
        os.chdir(cwd)
    return str(tmp)


def test_engine_fused_capped_matches_multicall_oracle(engine_dir):
    """End-to-end through the real artifact chain: the fused program over the
    CAPPED layout must rank identically to the engine's multi-call fallback
    (reference-shaped math over the complete COO stats — the uncapped oracle),
    including queries whose terms live only in the outlier's overflow slots."""
    from anime_illust_image_searcher_tpu.search.engine import SearchEngine

    engine = SearchEngine(engine_dir)
    assert engine._bm25_overflow is not None          # the cap really fired
    # 501 docs: p99.9 interpolates between the 4-tag mass and the 80-tag
    # outlier -> width 48; ids >= 48 (incl. t70) stay overflow-only
    assert engine.bm25.term_mat.shape[1] == 48
    assert engine.bm25.max_doc_len == 80

    outlier_id = len(engine.index) - 1
    for q in ["t70", "t01 t70:2", "t01 t70:-1", "t01 t70:+1", "t79 t05 t02:-1"]:
        assert engine.fused_path_available(q)
        fused = engine.find_similar_documents(q, topn=800)
        engine.fused_path_available = lambda *a, **k: False  # type: ignore
        try:
            oracle = engine.find_similar_documents(q, topn=800)
        finally:
            del engine.fused_path_available
        ids_f = [d for d, _ in fused]
        ids_o = [d for d, _ in oracle]
        assert ids_f == ids_o, (q, ids_f[:20], ids_o[:20])
        np.testing.assert_allclose([s for _, s in fused], [s for _, s in oracle],
                                   rtol=1e-5, atol=1e-6)
    # sanity on the semantics themselves, not just agreement
    hits = [d for d, _ in engine.find_similar_documents("t01 t70:+1", topn=800)]
    assert hits[0] == outlier_id                      # only the outlier has t70
    excl = [d for d, _ in engine.find_similar_documents("t01 t70:-1", topn=800)]
    assert outlier_id not in excl


def test_batch_and_character_programs_accept_overflow(pair):
    import jax.numpy as jnp

    capped, uncapped, matrix, norms = pair
    ov = tuple(jnp.asarray(a)
               for a in (capped.ov_doc, capped.ov_term, capped.ov_contrib))
    qvec = np.zeros(DIM, np.float32)
    qvec[0] = 1.0
    packed = np.stack([
        pack_query(qvec, {3: 1.0, 150: 2.0}, VOCAB, magic=MAGIC),
        pack_query(qvec, {150: -1.0, 4: 1.0}, VOCAB, magic=MAGIC),
    ])
    out = np.asarray(fused_normal_query_batch(
        jnp.asarray(matrix), jnp.asarray(norms),
        jnp.asarray(capped.term_mat), jnp.asarray(capped.contrib_mat),
        jnp.asarray(packed), 0.5, 0.5, 0.7, 0.3,
        vocab_size=VOCAB, num_docs=capped.num_docs, topn=20, k=10,
        overflow=ov, ov_max_len=capped.max_doc_len))
    # row 0 of the batch == the single-query program's result
    single = _run(capped, matrix, norms, {3: 1.0, 150: 2.0}, topn=20)
    row = unpack_result(out[0], 10)
    np.testing.assert_array_equal(row[1], single[1])
    np.testing.assert_allclose(row[0], single[0], rtol=1e-6)

    # character stage A: the top-k under an overflow-region require must be
    # headed by the outlier doc, and match the uncapped layout's top-k
    for di, o in ((capped, ov), (uncapped, None)):
        pk = pack_query(qvec, {150: MAGIC + 1.0}, VOCAB, magic=MAGIC)
        got = np.asarray(fused_character_top(
            jnp.asarray(matrix), jnp.asarray(di.term_mat),
            jnp.asarray(di.contrib_mat), jnp.asarray(pk), 0.5, 0.5,
            vocab_size=VOCAB, num_docs=di.num_docs, k=10,
            overflow=o, ov_max_len=di.max_doc_len))
        from anime_illust_image_searcher_tpu.ops.fused_query import decode_ids

        assert int(decode_ids(got[10:11])[0]) == 7  # first top-k id
