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
    assert engine._pack_fused("1girl").shape[0] == 4 * 64 + dim + 1

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
    np.testing.assert_array_equal(packed[:70], np.arange(70, dtype=np.float32))
    assert np.all(packed[70:256] == -1.0)          # unused id slots
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
