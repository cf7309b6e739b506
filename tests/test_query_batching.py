"""Batched fused queries (ops/fused_query.fused_normal_query_batch, the engine
batch API, and the webui QueryBatcher) must return exactly what the sequential
path returns (ROADMAP #7: concurrent searches coalesce into one device call)."""

import os
import threading

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.search.engine import SearchEngine

POOLS = [
    ["1girl", "solo", "smile", "black_hair", "dress"],
    ["1boy", "sword", "armor", "standing", "cape"],
    ["no_humans", "white_background", "bottle", "still_life", "monochrome"],
]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("batch_corpus")
    rng = np.random.RandomState(3)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        lines = []
        for i in range(40):
            tags = list(rng.choice(POOLS[i % 3], size=4, replace=False))
            lines.append(f"/img/{i:03d}.png,{','.join(tags)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "10"])
        return SearchEngine(str(tmp))
    finally:
        os.chdir(cwd)



def test_warmup_uses_serving_topn(engine):
    """Bucket warmup must compile the (bucket, SERVING topn) programs — topn is a
    static jit arg, so warming any other value leaves production cold (observed
    as ~15 s first-burst compile spikes on the relay)."""
    from anime_illust_image_searcher_tpu.cli.webui import WebUIServer

    calls = []
    orig_batch = engine.find_similar_documents_batch
    orig_single = engine.find_similar_documents

    def rec_batch(qs, topn=50, search_mode="normal"):
        calls.append(topn)
        return orig_batch(qs, topn=topn, search_mode=search_mode)

    engine.find_similar_documents_batch = rec_batch
    try:
        thread = WebUIServer._warmup_batch_buckets(engine)
        assert thread is not None
        thread.join(timeout=120)
        assert not thread.is_alive()
    finally:
        engine.find_similar_documents_batch = orig_batch
        engine.find_similar_documents = orig_single
    assert calls, "warmup thread never ran"
    assert set(calls) == {engine.cfg.search.topn}, calls


def assert_same_results(got, seq):
    """Rankings must match exactly; scores to 1e-5 (vmap retiles the matvec
    accumulation, shifting f32 sums in the 7th decimal)."""
    assert len(got) == len(seq)
    for g, s in zip(got, seq):
        assert [d for d, _ in g] == [d for d, _ in s]
        np.testing.assert_allclose([v for _, v in g], [v for _, v in s],
                                   atol=1e-5, rtol=1e-5)


QUERIES = ["1girl smile", "sword", "bottle still_life", "1boy sword:2",
           "smile dress:+1", "1girl smile:-1", "monochrome"]


def test_batch_matches_sequential(engine):
    seq = [engine.find_similar_documents(q, topn=20) for q in QUERIES]
    got = engine.find_similar_documents_batch(QUERIES, topn=20)
    assert_same_results(got, seq)


def test_batch_sizes_and_padding(engine):
    """Every bucket boundary (1, 2, 3->4, 5->8) must agree with sequential."""
    for n in (1, 2, 3, 5, 7):
        qs = QUERIES[:n]
        seq = [engine.find_similar_documents(q, topn=15) for q in qs]
        assert_same_results(engine.find_similar_documents_batch(qs, topn=15), seq)


def test_batch_with_fallback_mix(engine):
    """Oversized queries fall off the fused path individually; the rest batch."""
    from anime_illust_image_searcher_tpu.ops.fused_query import MAX_QUERY_TERMS

    big = " ".join(["1girl", "smile", "sword"] * (MAX_QUERY_TERMS // 3 + 1))
    qs = ["1girl smile", big, "sword"]
    seq = [engine.find_similar_documents(q, topn=10) for q in qs]
    assert_same_results(engine.find_similar_documents_batch(qs, topn=10), seq)


def test_query_batcher_coalesces_concurrent_requests(engine):
    from anime_illust_image_searcher_tpu.cli.webui import QueryBatcher

    calls = []
    orig = engine.find_similar_documents_batch

    def spy(queries, topn=50, search_mode="normal"):
        calls.append(list(queries))
        return orig(queries, topn, search_mode)

    engine.find_similar_documents_batch = spy
    try:
        batcher = QueryBatcher(engine, window_s=0.15)
        results = {}

        def worker(q):
            results[q] = batcher.search(q, 20, "normal")

        threads = [threading.Thread(target=worker, args=(q,)) for q in QUERIES[:4]]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        engine.find_similar_documents_batch = orig

    # all four rode device calls; at least one call carried >1 query
    assert sum(len(c) for c in calls) == 4
    assert any(len(c) > 1 for c in calls), calls
    for q in QUERIES[:4]:
        assert_same_results([results[q]],
                            [engine.find_similar_documents(q, topn=20)])


def test_query_batcher_propagates_errors(engine):
    from anime_illust_image_searcher_tpu.cli.webui import QueryBatcher

    batcher = QueryBatcher(engine, window_s=0.0)
    with pytest.raises(KeyError):
        batcher.search("definitely_not_a_tag_xyz", 10, "normal")


def test_unknown_tag_fails_only_its_own_query(engine):
    """One bad query coalesced into a micro-batch must not poison the others:
    the batch returns per-query Exception entries, and the QueryBatcher routes
    each to its own requester (the valid query still gets results)."""
    from anime_illust_image_searcher_tpu.cli.webui import QueryBatcher

    good, bad = "1girl smile", "definitely_not_a_tag_xyz"

    outs = engine.find_similar_documents_batch([good, bad, "sword"], topn=10)
    assert isinstance(outs[1], KeyError)
    assert_same_results([outs[0], outs[2]],
                        [engine.find_similar_documents(good, topn=10),
                         engine.find_similar_documents("sword", topn=10)])

    batcher = QueryBatcher(engine, window_s=0.15)
    results, errors = {}, {}

    def worker(q):
        try:
            results[q] = batcher.search(q, 10, "normal")
        except Exception as e:  # noqa: BLE001
            errors[q] = e

    threads = [threading.Thread(target=worker, args=(q,)) for q in (good, bad)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert isinstance(errors[bad], KeyError)
    assert_same_results([results[good]],
                        [engine.find_similar_documents(good, topn=10)])
