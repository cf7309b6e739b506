"""The single-call fused query program must match the multi-call path exactly."""

import os

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.search.engine import SearchEngine

POOLS = [
    ["1girl", "solo", "smile", "black_hair", "dress"],
    ["1boy", "male_focus", "sword", "armor", "standing"],
    ["no_humans", "white_background", "still_life", "bottle", "flower"],
]
# enough extra vocabulary that a >64-distinct-term query exists (big-bucket path)
FILLER = [f"ftag{i:02d}" for i in range(70)]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fusedq")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rng = np.random.RandomState(7)
        lines = []
        for i in range(60):
            pool = POOLS[i % 3]
            tags = list(rng.choice(pool, size=rng.randint(3, 5), replace=False))
            lines.append(f"/img/{i:03d}.png,{','.join(tags)}")
        for i in range(24):  # filler docs: 3 consecutive filler tags each
            tags = [FILLER[(3 * i + j) % len(FILLER)] for j in range(3)]
            lines.append(f"/img/f{i:03d}.png,{','.join(tags)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "10"])
        return SearchEngine(str(tmp))
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("query", [
    "1girl", "1girl smile:2", "sword black_hair", "1girl solo:-1",
    "no_humans bottle:+1",
])
def test_fused_matches_fallback(engine, query):
    assert engine._norms_known
    fused = engine._find_similar_fused(query, topn=800)
    # force the multi-call fallback path
    engine._norms_known = False
    try:
        fallback = engine.find_similar_documents(query, topn=800)
    finally:
        engine._norms_known = True
    assert [d for d, _ in fused] == [d for d, _ in fallback]
    np.testing.assert_allclose(
        [s for _, s in fused], [s for _, s in fallback], rtol=1e-4, atol=1e-5
    )


@pytest.mark.filterwarnings("error::RuntimeWarning")
def test_require_with_few_matches_stays_finite(engine):
    """<10 docs matching a +required tag used to propagate NaN through the PRF mean
    (QUIRKS.md #15); both paths must return finite pinned scores and agree on ids."""
    # 'holding_hands'-style rare tag: use a tag present in few docs if available;
    # otherwise require two tags jointly rare
    rare = min(engine.dictionary.token2id,
               key=lambda t: engine.dictionary.dfs[engine.dictionary.token2id[t]])
    query = f"{rare}:+1"
    fused = engine.find_similar_documents(query, topn=800)
    engine._norms_known = False
    try:
        fallback = engine.find_similar_documents(query, topn=800)
    finally:
        engine._norms_known = True
    assert all(np.isfinite(s) for _, s in fused)
    assert all(np.isfinite(s) for _, s in fallback)
    assert [d for d, _ in fused][:10] == [d for d, _ in fallback][:10]


def test_fused_is_default_path(engine):
    r1 = engine.find_similar_documents("1girl smile", topn=800)
    r2 = engine._find_similar_fused("1girl smile", topn=800)
    assert r1 == r2


def test_big_query_rides_fused_256_bucket(engine):
    """>64 distinct terms used to fall off to the ~18x multi-call path; now it picks
    the 256-slot term bucket and stays on the single-call program."""
    big = " ".join(FILLER)  # 70 distinct terms
    assert engine.fused_path_available(big)
    dim = engine.model.vector_size
    assert engine._pack_fused(big).shape[0] == 4 * 256 + dim + 1
    # interactive-size queries ride the cheapest (8-slot) sweep bucket
    assert engine._pack_fused("1girl").shape[0] == 4 * 8 + dim + 1
    nine = " ".join(FILLER[:9])
    assert engine._pack_fused(nine).shape[0] == 4 * 64 + dim + 1

    fused = engine.find_similar_documents(big, topn=800)
    engine._norms_known = False
    try:
        fallback = engine.find_similar_documents(big, topn=800)
    finally:
        engine._norms_known = True
    assert [d for d, _ in fused] == [d for d, _ in fallback]
    np.testing.assert_allclose(
        [s for _, s in fused], [s for _, s in fallback], rtol=1e-4, atol=1e-5
    )


def test_term_bucket_selection():
    from anime_illust_image_searcher_tpu.ops.fused_query import (
        QUERY_TERM_BUCKETS, term_bucket,
    )

    assert term_bucket(0) == QUERY_TERM_BUCKETS[0]
    assert term_bucket(64) == 64
    assert term_bucket(65) == 256
    assert term_bucket(256) == 256
    with pytest.raises(ValueError):
        term_bucket(257)


def test_pack_query_big_bucket_layout():
    """A 256-slot buffer packs ids/weights into the right blocks and the slot
    count is recoverable from the buffer length (the fused program derives its
    static Q from it)."""
    from anime_illust_image_searcher_tpu.ops.fused_query import pack_query

    vec = np.arange(8, dtype=np.float32)
    weights = {i: 1.0 for i in range(70)}
    packed = pack_query(vec, weights, vocab_size=1000, magic=1000, max_terms=256)
    assert packed.shape[0] == 4 * 256 + 8 + 1
    q = (packed.shape[0] - 8 - 1) // 4
    assert q == 256
    # id slots carry BIASED int32 bit patterns (exact at any vocab size; the
    # bias keeps small ids out of the f32 denormal range TPU flushes to zero)
    from anime_illust_image_searcher_tpu.ops.fused_query import decode_ids

    ids = decode_ids(packed[:256])
    np.testing.assert_array_equal(ids[:70], np.arange(70, dtype=np.int32))
    assert np.all(ids[70:] == -1)                  # unused id slots
    # every lane is a NORMAL f32 (no denormals/NaN/Inf to be flushed/mangled)
    lanes = packed[:256].view(np.int32) & 0x7FFFFFFF
    assert np.all(lanes >= 0x00800000) and np.all(lanes < 0x7F800000)
    np.testing.assert_array_equal(packed[256:256 + 70], np.ones(70, np.float32))
    np.testing.assert_array_equal(packed[4 * 256: 4 * 256 + 8], vec)


def test_mixed_bucket_batch(engine):
    """A batch mixing a 64-slot and a 256-slot query repacks at the larger bucket
    and still matches per-query results."""
    big = " ".join(FILLER)
    small = "1girl smile"
    batch = engine.find_similar_documents_batch([small, big], topn=800)
    for got, single in zip(
        batch,
        [engine.find_similar_documents(q, topn=800) for q in (small, big)],
    ):
        assert [d for d, _ in got] == [d for d, _ in single]
        np.testing.assert_allclose([v for _, v in got], [v for _, v in single],
                                   rtol=1e-5, atol=1e-6)


def test_serial_scan_matches_per_query(engine):
    """fused_normal_query_serial (the --device-only measurement instrument) must
    produce bit-identical rows to the per-query fused program."""
    from bench_query import run_device_only_bench

    queries = ["1girl smile", "sword armor", "bottle", "1girl:2 sword:-1"]
    out = run_device_only_bench(engine, queries, repeats=1)
    assert out["n_queries"] == 4
    assert out["device_query_ms_measured"] > 0


# ---------------------------------------------------------------- prefix elbow


def _resolve_prefix_cut(full, k, kk, num_real):
    """Host-side mirror of the fast program's prefix-elbow protocol: compute
    flags on the top-(k+kk+1) prefix of the full list, then resolve exactly the
    way SearchEngine._assemble_fused does (None = no truncation; 'exact' =
    would re-dispatch the full-sort program)."""
    from anime_illust_image_searcher_tpu.ops.fused_query import (
        DIFF_FILTER_THRESH,
    )

    prefix = full[: k + kk + 1]
    diffs = prefix[:-1] - prefix[1:]
    with np.errstate(invalid="ignore"):
        diffs = np.where(diffs == 0, np.inf, diffs)
        flags = diffs < DIFF_FILTER_THRESH
    positions = np.nonzero(flags)[0]
    count = len(positions)
    if count >= 2:
        return int(positions[1])
    if count == 0:
        return None
    if (k + kk + 1) >= num_real:
        return int(positions[0])
    return "exact"


def _full_list(tail, k=10):
    return np.concatenate([np.ones(k), np.asarray(tail, np.float64)])


@pytest.mark.parametrize("name,tail,kk", [
    # spaced tail: no flags anywhere -> no cut either way
    ("no_flags", np.linspace(0.9, 0.1, 60), 15),
    # two near-ties inside the prefix -> exact cut position from prefix alone
    ("two_in_prefix", [0.9, 0.9 - 5e-7, 0.8, 0.8 - 5e-7] + list(
        np.linspace(0.7, 0.1, 56)), 15),
    # exact ties (diff == 0) are masked, not flags
    ("zero_diffs_masked", [0.9, 0.9, 0.9] + list(np.linspace(0.8, 0.1, 57)), 15),
    # flags only beyond the prefix -> cut lands past the assembled list
    ("flags_beyond", list(np.linspace(0.9, 0.5, 30)) + [0.4, 0.4 - 5e-7,
     0.3, 0.3 - 5e-7] + list(np.linspace(0.2, 0.1, 26)), 15),
    # one flag in prefix + one beyond: the ambiguous case -> exact fallback
    ("ambiguous", [0.9, 0.9 - 5e-7] + list(np.linspace(0.8, 0.5, 28)) + [
        0.4, 0.4 - 5e-7] + list(np.linspace(0.3, 0.1, 28)), 15),
])
def test_prefix_elbow_protocol_matches_full_list(name, tail, kk):
    """For every flag pattern, the prefix protocol's effective truncation of the
    <= k+kk assembled results equals the reference full-list elbow's."""
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.ops.fused_query import elbow_cut_index

    k = 10
    full = _full_list(tail, k)
    num_real = len(full)
    exact_cut = int(np.asarray(elbow_cut_index(jnp.asarray(full, jnp.float32))))
    resolved = _resolve_prefix_cut(full.astype(np.float32), k, kk, num_real)
    if resolved == "exact":
        assert name == "ambiguous"
        resolved = exact_cut  # what the engine's re-dispatch would return
    list_len = k + kk  # assembled results are at most this long
    effective_fast = min(resolved if resolved is not None else list_len, list_len)
    assert effective_fast == min(exact_cut, list_len), name


def test_assemble_fused_branches(engine):
    """The four cut-resolution branches of _assemble_fused, driven by crafted
    output buffers (count>=2, count==0, count==1-covered, count==1-ambiguous)."""
    from anime_illust_image_searcher_tpu.ops.fused_query import CUT_SENTINEL

    k = engine.cfg.search.rerank_top_k
    kk = 15
    top_idx = np.arange(k, dtype=np.float32)
    top_vals = np.linspace(1.0, 0.9, k).astype(np.float32)
    r_idx = np.arange(5, 5 + kk, dtype=np.float32)  # overlaps top_idx in [5,10)
    r_vals = np.linspace(0.8, 0.2, kk).astype(np.float32)

    def buf(first, second, count):
        return np.concatenate([
            top_vals, top_idx, r_vals, r_idx,
            np.asarray([first, second, count], np.float32)])

    calls = {"n": 0}

    def exact_fn():
        calls["n"] += 1
        # exact program's layout: trailing single cut = 12
        return np.concatenate([top_vals, top_idx, r_vals, r_idx,
                               np.asarray([12.0], np.float32)])

    engine.exact_cut_dispatches = 0
    # count >= 2: cut at second flag
    got = engine._assemble_fused(buf(3, 12, 2), topn=800, exact_fn=exact_fn)
    assert len(got) == 12 and calls["n"] == 0
    # count == 0: no truncation (k + 10 non-dup tail rows)
    got = engine._assemble_fused(buf(CUT_SENTINEL, CUT_SENTINEL, 0), 800,
                                 exact_fn=exact_fn)
    assert len(got) == k + 10 and calls["n"] == 0
    # count == 1 with the prefix covering every real doc: cut at first flag
    real_backup = engine._num_real
    engine._num_real = k + kk  # covered
    try:
        got = engine._assemble_fused(buf(4, CUT_SENTINEL, 1), 800,
                                     exact_fn=exact_fn)
        assert len(got) == 4 and calls["n"] == 0
        # count == 1 with unseen real docs beyond the prefix: exact re-dispatch
        engine._num_real = 10_000
        got = engine._assemble_fused(buf(4, CUT_SENTINEL, 1), 800,
                                     exact_fn=exact_fn)
        assert calls["n"] == 1 and engine.exact_cut_dispatches == 1
        assert len(got) == 12  # the exact program's cut
    finally:
        engine._num_real = real_backup
        engine.exact_cut_dispatches = 0


def test_fast_vs_exact_program_results_match(engine):
    """End-to-end: the fast (prefix-elbow) and exact (full-sort) programs yield
    identical assembled results on real data, including small topn where the
    prefix does NOT cover the corpus."""
    from anime_illust_image_searcher_tpu.ops.fused_query import (
        unpack_result_exact,
    )

    for topn in (5, 800):
        for query in ("1girl", "sword black_hair", "1girl solo:-1"):
            fast = engine._find_similar_fused(query, topn)
            packed = engine._pack_fused(query)
            out = np.asarray(engine._dispatch_fused(packed, topn, exact=True))
            k = engine.cfg.search.rerank_top_k
            _, top_idx, r_vals, r_idx, cut = unpack_result_exact(out, k)
            top10_set = set(int(i) for i in top_idx)
            sims = [(int(d), 1.0) for d in top_idx]
            for d, v in zip(r_idx, r_vals):
                if int(d) not in top10_set:
                    sims.append((int(d), float(v)))
            sims = [(d, v) for d, v in sims[:cut] if v > 0]
            exact = sims[: min(topn, len(sims))]
            assert [d for d, _ in fast] == [d for d, _ in exact], (topn, query)
            np.testing.assert_allclose([s for _, s in fast],
                                       [s for _, s in exact], rtol=1e-6)


@pytest.mark.parametrize("d,k,style", [
    (70_000, 821, "ties"),       # above threshold, heavy value ties
    (70_000, 10, "ties"),
    (65_536, 821, "uniform"),    # exactly chunk-divisible
    (65_537, 821, "uniform"),    # pad = chunk-1
    (100_000, 821, "neginf"),    # -inf blocks (masked docs) among ties
    (4_096, 10, "ties"),         # below threshold: plain lax.top_k path
])
def test_exact_top_k_matches_lax_top_k(d, k, style):
    """exact_top_k (two-level chunked) must equal lax.top_k bit-for-bit,
    including lowest-index tie order."""
    import jax
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.ops.fused_query import exact_top_k

    rng = np.random.RandomState(d % 97)
    if style == "ties":
        x = rng.randint(0, 50, d).astype(np.float32)  # massive duplication
    elif style == "neginf":
        x = rng.randint(0, 50, d).astype(np.float32)
        x[rng.rand(d) < 0.3] = -np.inf
    else:
        x = rng.standard_normal(d).astype(np.float32)
    xj = jnp.asarray(x)
    want_v, want_i = jax.lax.top_k(xj, k)
    got_v, got_i = exact_top_k(xj, k)
    np.testing.assert_array_equal(np.asarray(want_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))


def test_max_normalize_contract():
    """max_normalize must behave like host numpy's exact ``x / x.max()`` where
    it matters for the elbow: the max element (and its exact ties) land on
    exactly 1.0, equal inputs stay equal, and strictly-smaller inputs stay
    strictly below 1.0. On TPU the raw f32 divide lowers to a reciprocal
    multiply that puts the max at 1.0000001, fabricating a sub-threshold elbow
    diff against the pinned 1.0 top-10 scores and cutting the result list
    inside the top-10 (caught by the tie-heavy pipeline oracle under
    AIIS_TEST_PLATFORM=tpu)."""
    import jax
    import jax.numpy as jnp

    from anime_illust_image_searcher_tpu.ops.fused_query import max_normalize

    f = jax.jit(max_normalize)
    m = np.float32(0.33160853)  # the measured repro's tied max value
    x = np.array([m, 0.1, m, np.nextafter(m, np.float32(0)), -np.inf, 0.0],
                 np.float32)
    y = np.asarray(f(jnp.asarray(x)))
    assert y[0] == 1.0 and y[2] == 1.0          # max and its exact tie
    assert 0.0 < y[3] < 1.0                     # one-ulp-below stays below
    assert y[1] == np.float32(x[1] / m) or abs(y[1] - x[1] / m) < 2e-7
    assert y[4] == -np.inf and y[5] == 0.0
    # non-positive max: passthrough (webui.py:377-380 guard)
    x2 = np.array([-1.0, -2.0, 0.0], np.float32)
    np.testing.assert_array_equal(np.asarray(f(jnp.asarray(x2))), x2)
    # every exact tie pair stays an exact tie post-normalization
    rng = np.random.RandomState(7)
    vals = rng.rand(64).astype(np.float32)
    x3 = np.concatenate([vals, vals])
    y3 = np.asarray(f(jnp.asarray(x3)))
    np.testing.assert_array_equal(y3[:64], y3[64:])


def test_term_bucket_invariance(engine):
    """The same query must return identical results from every term bucket
    program that fits it — the bucket only changes the sweep's padded Q."""
    for query in ("1girl", "1girl smile:2 sword"):
        results = []
        for mt in (8, 64, 256):
            packed = engine._pack_fused(query, max_terms=mt)
            out = np.asarray(engine._dispatch_fused(packed, 800))
            results.append(engine._assemble_fused(out, 800))
        assert results[0] == results[1] == results[2], query


def test_mixed_unknown_norms_disable_fused_path(engine, tmp_path):
    """A pre-v1.1 index --update-appended with normed rows has SOME zero norms
    on nonzero rows; max(norms)>0 would wrongly enable the fused path and
    reconstruct those rows as zero vectors in the PRF stage. The eligibility
    check must be per-row."""
    from anime_illust_image_searcher_tpu.index.similarity import SimilarityIndex

    src = engine.index
    p = str(tmp_path / "doc2vec_index")
    mixed = SimilarityIndex(p, num_features=src.num_features)
    mixed.extend_from(src)
    mixed._norms = np.array(mixed._norms)
    mixed._norms[0] = 0.0  # row 0: norm unknown, row is nonzero
    mixed.save()

    import shutil

    base = os.path.dirname(engine.index.path) or "."
    dst_dir = str(tmp_path)
    for name in os.listdir(base):
        full = os.path.join(base, name)
        if os.path.isfile(full) and not name.startswith("doc2vec_index"):
            shutil.copy(full, dst_dir)
        elif os.path.isdir(full) and name.endswith("servecache"):
            shutil.copytree(full, os.path.join(dst_dir, name))
    eng2 = SearchEngine(dst_dir)
    assert not eng2._norms_known  # falls back to the re-inference path

    # all-known norms (the common case) stay eligible
    assert engine._norms_known
