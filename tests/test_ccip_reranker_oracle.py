"""Model-based oracle for the character-oriented reranker.

`oracle_character` transliterates webui.py:255-342 line by line (top-10 keep
their ORIGINAL fused scores — unlike the normal mode they are NOT pinned to
1.0; the >10 branch ignores ``topn``; the top-10 feature mean is UNWEIGHTED;
diff < threshold AND all required AND none excluded; matches appended sorted by
1 - diff; files missing from the tag index are dropped) and is compared against
``CCIPReranker.__call__`` over randomized score vectors and tag filters, using
the same deterministic tiny CCIP predictor as the feature provider.
"""

import os

import numpy as np
import pytest
from PIL import Image

from anime_illust_image_searcher_tpu.cli import gen_cfeatures, genmodel
from anime_illust_image_searcher_tpu.config import CCIPConfig
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.models.caformer import tiny_test_config
from anime_illust_image_searcher_tpu.search.engine import SearchEngine
from anime_illust_image_searcher_tpu.search.filters import filter_searched_result
from anime_illust_image_searcher_tpu.search.rerank_ccip import CCIPReranker

TINY = tiny_test_config()
CFG = CCIPConfig(image_size=TINY.img_size, feature_dim=TINY.feature_dim,
                 batch_size=4, decode_workers=2)
POOLS = [
    ["1girl", "solo", "smile", "black_hair"],
    ["1boy", "sword", "armor", "standing"],
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ccip_oracle")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rng = np.random.RandomState(3)
        img_dir = tmp / "imgs"
        img_dir.mkdir()
        lines = []
        for i in range(26):
            p = img_dir / f"{i:02d}.png"
            Image.fromarray(rng.randint(
                0, 255, (TINY.img_size, TINY.img_size, 3), dtype=np.uint8)
            ).save(p)
            tags = list(rng.choice(POOLS[i % 2], size=3, replace=False))
            lines.append(f"{p},{','.join(tags)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "5"])
        pred = gen_cfeatures.Predictor(config=CFG, model_cfg=TINY,
                                       use_pallas=False)
        pred.process_directory(str(img_dir))
        engine = SearchEngine(str(tmp))
        reranker = CCIPReranker(
            engine.image_files_name_tags_arr, engine.file_tag_index_dict,
            engine.filepath_docid_dict, directory=str(tmp),
            predictor=gen_cfeatures.Predictor(config=CFG, model_cfg=TINY,
                                              use_pallas=False),
        )
        reranker._lazy_load()
    finally:
        os.chdir(cwd)
    return engine, reranker


def oracle_character(engine, reranker, final_scores, topn, required, excluded):
    """webui.py:255-342, verbatim semantics."""
    pred = reranker.predictor
    sims = sorted(enumerate(final_scores), key=lambda it: -it[1])
    if len(sims) <= 10:
        sims = filter_searched_result(sims)
        return sims[: min(topn, len(sims))]

    top10 = sims[:10]
    top10_files = [engine.image_files_name_tags_arr[d].split(",")[0]
                   for d, _ in top10]
    feats = []
    for f in top10_files:
        try:
            feats.append(pred.get_image_feature(f))
        except Exception as e:  # noqa: BLE001
            print(f"Error: {e}")
    mean = np.average(feats, axis=0)

    idx_paths = reranker.cfeature_filepath_idx
    cindex = reranker.cfeatures_idx
    matches = []
    for i in range(len(idx_paths)):
        row = np.asarray(cindex.matrix[i]) * float(cindex.norms[i])
        diff = float(pred.ccip_difference(row, mean))
        path = idx_paths[i]
        in_dict = path in engine.file_tag_index_dict
        ok_req = in_dict and all(
            t in engine.file_tag_index_dict[path] for t in required)
        ok_exc = in_dict and all(
            t not in engine.file_tag_index_dict[path] for t in excluded)
        if diff < pred.threshold and ok_req and ok_exc:
            matches.append((engine.filepath_docid_dict[path], 1.0 - diff))
    matches = sorted(matches, key=lambda it: -it[1])
    return list(top10) + matches  # topn deliberately ignored (webui.py:334-337)


def test_character_reranker_matches_oracle(setup):
    engine, reranker = setup
    rng = np.random.RandomState(7)
    n = len(engine.image_files_name_tags_arr)
    cases = [
        ([], []),
        (["1girl"], []),
        ([], ["sword"]),
        (["1boy"], ["smile"]),
    ]
    for trial, (required, excluded) in enumerate(cases):
        final = rng.rand(n).astype(np.float64)
        want = oracle_character(engine, reranker, final, 800, required, excluded)
        got = reranker(final, 800, required, excluded)
        assert [d for d, _ in got] == [d for d, _ in want], (trial, got, want)
        np.testing.assert_allclose([s for _, s in got], [s for _, s in want],
                                   rtol=1e-4, atol=1e-5, err_msg=str(trial))
        # top-10 keep ORIGINAL fused scores (reference does not pin to 1.0)
        srt = sorted(enumerate(final), key=lambda it: -it[1])[:10]
        assert got[:10] == [(d, s) for d, s in srt] or \
               [d for d, _ in got[:10]] == [d for d, _ in srt]


def test_gather_path_active_and_equal_to_live(setup, monkeypatch):
    """The fixture's corpus was fully cfeature-indexed after the files were
    written, so the row-gather fast path must be active — and must return the
    same ranking as the reference-shaped live path (features are
    deterministic; gather reconstructs row·norm, live recomputes)."""
    engine, reranker = setup
    rng = np.random.RandomState(11)
    n = len(engine.image_files_name_tags_arr)
    final = rng.rand(n).astype(np.float64)

    # the fast path is actually eligible for these top-10 files
    sims = sorted(enumerate(final), key=lambda it: -it[1])[:10]
    files = [engine.image_files_name_tags_arr[d].split(",")[0] for d, _ in sims]
    assert reranker._gather_rows(files) is not None

    got_gather = reranker(final, 800, [], [])
    monkeypatch.setenv("AIIS_RERANK_LIVE", "1")
    assert reranker._gather_rows(files) is None  # env kill-switch honored
    got_live = reranker(final, 800, [], [])
    monkeypatch.delenv("AIIS_RERANK_LIVE")
    assert [d for d, _ in got_gather] == [d for d, _ in got_live]
    np.testing.assert_allclose([s for _, s in got_gather],
                               [s for _, s in got_live], rtol=1e-4, atol=1e-5)


def test_gather_falls_back_when_file_changes(setup):
    """A file modified after the index build must be re-extracted live — its
    indexed feature may be stale (reference always extracts live)."""
    engine, reranker = setup
    path = reranker.cfeature_filepath_idx[0]
    files = list(reranker.cfeature_filepath_idx[:10])
    assert reranker._gather_rows(files) is not None
    stamp = reranker._row_stamps[reranker._row_of[path]]
    future = stamp + 10
    os.utime(path, (future, future))
    try:
        assert reranker._gather_rows(files) is None
    finally:
        past = stamp - 10
        os.utime(path, (past, past))
    assert reranker._gather_rows(files) is not None
    # a file absent from the cfeature index also forces the live path
    assert reranker._gather_rows(files[:9] + ["/nonexistent/x.png"]) is None


def test_gather_falls_back_on_unknown_norm(setup):
    """A row stored without its pre-normalization norm (0.0 = unknown, e.g. a
    pre-v1.1 index appended to in place) cannot reconstruct the raw feature —
    the query must take the live path rather than underweight that image."""
    engine, reranker = setup
    files = list(reranker.cfeature_filepath_idx[:10])
    assert reranker._gather_rows(files) is not None
    idx = reranker.cfeatures_idx
    row = reranker._row_of[files[0]]
    idx._norms = np.array(idx._norms)  # mmap'd read-only -> writable copy
    saved = float(idx.norms[row])
    try:
        idx._norms[row] = 0.0
        reranker._all_norms_known = False  # as _lazy_load would compute
        assert np.any(idx.matrix[row])  # a real feature row, not a zero vector
        assert reranker._gather_rows(files) is None
        # ...but a genuinely zero raw vector (norm 0, all-zero row) is fine
        idx._norms[row] = saved
        assert reranker._gather_rows(files) is not None
    finally:
        idx._norms[row] = saved
        reranker._all_norms_known = True


def test_character_few_results_branch_matches_oracle(setup):
    engine, reranker = setup
    rng = np.random.RandomState(9)
    n = len(engine.image_files_name_tags_arr)
    final = np.full(n, -np.inf)
    final[:6] = rng.rand(6) + 0.5  # only 6 finite -> <= 10 path? (still n>10)
    # the reference's <=10 branch triggers on len(sims), i.e. corpus size —
    # exercise it through a truncated score vector instead
    small = final[:8]
    want = oracle_character(engine, reranker, small, 800, [], [])
    got = reranker(small, 800, [], [])
    assert [d for d, _ in got] == [d for d, _ in want]


def test_all_decode_failures_return_top10_only(setup, monkeypatch):
    """When every top-10 file fails to decode on the live path, the reference's
    empty np.average turns the mean NaN (webui.py:303) and no index row passes
    the threshold — the result is exactly the top-10 with no matches."""
    engine, reranker = setup
    rng = np.random.RandomState(13)
    n = len(engine.image_files_name_tags_arr)
    final = rng.rand(n).astype(np.float64)
    monkeypatch.setenv("AIIS_RERANK_LIVE", "1")  # force the decode path
    monkeypatch.setattr(reranker.predictor, "gen_image_ndarray",
                        lambda f: (_ for _ in ()).throw(OSError("gone")))
    got = reranker(final, 800, [], [])
    srt = sorted(enumerate(final), key=lambda it: -it[1])[:10]
    assert got == [(int(d), float(s)) for d, s in srt]


def _assert_equivalent_ranking(got, want, q):
    """Strict id order when it holds; otherwise the difference must be an
    ulp-level score tie swap (the batched/vmapped programs may schedule the
    matvec's row blocks differently than the single-query program, so even
    bit-identical duplicate docs can land one ulp apart across programs — the
    same caveat tests/test_parallel.py handles for GSPMD)."""
    assert len(got) == len(want), (q, len(got), len(want))
    ids_g, ids_w = [d for d, _ in got], [d for d, _ in want]
    if ids_g != ids_w:
        assert sorted(ids_g) == sorted(ids_w), (q, ids_g, ids_w)
        for (dg, vg), (dw, vw) in zip(got, want):
            if dg != dw:
                assert abs(vg - vw) <= 1e-5 + 1e-4 * abs(vg), (q, dg, dw)
    np.testing.assert_allclose([s for _, s in got], [s for _, s in want],
                               rtol=1e-4, atol=1e-5, err_msg=str(q))


def test_capped_matches_path_equals_full_diffs(setup, monkeypatch):
    """The candidate-only device program (MATCH_CAP smallest diffs + count)
    must produce the same result list as the full corpus-length diff transfer,
    both under the cap and — via the count>cap fallback — over it."""
    engine, reranker = setup
    rng = np.random.RandomState(17)
    n = len(engine.image_files_name_tags_arr)
    final = rng.rand(n).astype(np.float64)

    assert not reranker._capped_eligible()      # default cap >= tiny index
    full = reranker(final, 800, [], [])

    calls = {"capped": 0}
    orig = reranker.predictor.rerank_matches_from_rows

    def spy(*a, **kw):
        calls["capped"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(reranker.predictor, "rerank_matches_from_rows", spy)
    monkeypatch.setattr(reranker, "MATCH_CAP", 16)
    assert reranker._capped_eligible()
    capped = reranker(final, 800, [], [])
    assert calls["capped"] == 1
    _assert_equivalent_ranking(capped, full, "capped")

    # a threshold so generous every row matches: count > cap -> the full-diffs
    # fallback must kick in and still agree
    monkeypatch.setattr(reranker.predictor, "ccip_default_threshold",
                        lambda: 30.0)
    monkeypatch.setattr(reranker, "MATCH_CAP", 4)
    got = reranker(final, 800, [], [])
    monkeypatch.setattr(reranker, "MATCH_CAP", n + 1)  # ineligible: full path
    want = reranker(final, 800, [], [])
    assert len(want) > 4 + 10  # the generous threshold really overflowed cap=4
    _assert_equivalent_ranking(got, want, "overflow-fallback")


def test_capped_matches_batch_equals_full(setup, monkeypatch):
    """Batched candidate-only rerank agrees with the batched full-diffs path —
    and provably ran (spy on the batch op; every query's count under the cap
    so the capped results are the ones compared). Runs with the one-dispatch
    program disabled: this exercises the two-dispatch batched machinery that
    remains the fallback for mesh/learned-metric/forced-live serving."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    monkeypatch.setenv("AIIS_CHAR_ONE_DISPATCH", "0")
    mode = "character oriented"
    queries = ["1girl", "solo smile", "1boy sword", "black_hair"]
    seen = []
    orig = reranker.predictor.rerank_matches_from_rows_batch

    def spy(*a, **kw):
        out = orig(*a, **kw)
        seen.append(out)
        return out

    try:
        full = engine.find_similar_documents_batch(queries, topn=800,
                                                   search_mode=mode)
        monkeypatch.setattr(reranker.predictor,
                            "rerank_matches_from_rows_batch", spy)
        monkeypatch.setattr(reranker, "MATCH_CAP", 16)
        capped = engine.find_similar_documents_batch(queries, topn=800,
                                                     search_mode=mode)
        assert len(seen) == 1 and seen[0] is not None
        counts = seen[0][0][: len(queries)]
        assert (counts <= 16).all(), counts  # capped results actually used
        for q, a, b in zip(queries, capped, full):
            _assert_equivalent_ranking(a, b, q)
    finally:
        engine.cfeature_reranker = None


def test_character_batch_matches_sequential(setup):
    """B concurrent character queries through find_similar_documents_batch
    (batched stage A + shared rerank dispatch) must match sequential
    single-query results (modulo ulp tie swaps); an unknown tag fails only
    its own slot."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    mode = "character oriented"
    try:
        queries = ["1girl", "solo smile", "1boy:+1", "zzz_not_a_tag",
                   "smile:-1 1girl", "1girl:2 sword"]
        before = engine.character_fused_dispatches
        before_one = engine.character_one_dispatch_queries
        outs = engine.find_similar_documents_batch(queries, topn=800,
                                                   search_mode=mode)
        assert engine.character_fused_dispatches == before + 5
        # the burst rode the batched ONE-dispatch program (stage A + rerank
        # in one device call per chunk), not the two-dispatch fallback
        assert engine.character_one_dispatch_queries == before_one + 5
        for q, out in zip(queries, outs):
            if q == "zzz_not_a_tag":
                assert isinstance(out, KeyError)
                continue
            want = engine.find_similar_documents(q, 800, mode)
            _assert_equivalent_ranking(out, want, q)
    finally:
        engine.cfeature_reranker = None


def test_query_batcher_coalesces_mixed_modes(setup):
    """Concurrent normal + character searches through the webui QueryBatcher:
    each mode group coalesces into its own engine batch call, and every
    requester gets its own mode's results."""
    import threading

    from anime_illust_image_searcher_tpu.cli.webui import QueryBatcher

    engine, reranker = setup
    engine.cfeature_reranker = reranker
    calls = []
    orig = engine.find_similar_documents_batch

    def spy(queries, topn=50, search_mode="normal"):
        calls.append((search_mode, list(queries)))
        return orig(queries, topn, search_mode)

    engine.find_similar_documents_batch = spy
    try:
        batcher = QueryBatcher(engine, window_s=0.2)
        results = {}

        def worker(q, m):
            results[(q, m)] = batcher.search(q, 800, m)

        jobs = [("1girl", "normal"), ("1girl", "character oriented"),
                ("solo smile", "character oriented"), ("1boy", "normal")]
        threads = [threading.Thread(target=worker, args=j) for j in jobs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        engine.find_similar_documents_batch = orig
        engine.cfeature_reranker = None

    assert sum(len(qs) for _, qs in calls) == 4
    char_calls = [qs for m, qs in calls if m == "character oriented"]
    assert any(len(qs) > 1 for qs in char_calls), calls
    engine.cfeature_reranker = reranker
    try:
        for (q, m), got in results.items():
            want = engine.find_similar_documents(q, 800, m)
            want = want if m == "character oriented" else want[:800]
            _assert_equivalent_ranking(got, want, (q, m))
    finally:
        engine.cfeature_reranker = None


def test_character_fused_unknown_tag_raises_keyerror(setup):
    """QUIRKS #7 through the fused character path: the unknown-tag KeyError
    comes from the BM25 parser before any device dispatch, exactly like the
    multi-call path (the Doc2Vec side maps unknown tags to a sentinel row,
    mirroring gensim's silent unknown-word handling)."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    try:
        assert engine.character_fused_available("zzz_not_a_tag")
        with pytest.raises(KeyError, match="zzz_not_a_tag"):
            engine.find_similar_documents(
                "zzz_not_a_tag", 800, "character oriented")
    finally:
        engine.cfeature_reranker = None


@pytest.mark.parametrize("query", [
    "1girl", "solo smile", "1boy:+1", "smile:-1 1girl", "1girl:2 sword",
])
def test_character_one_dispatch_matches_two_dispatch(setup, query, monkeypatch):
    """The whole-query ONE-dispatch program (stage A + row-gather rerank in a
    single device call, ccip_character_query_matches_op) must return the
    identical result list as the two-dispatch form it replaces — and must
    actually RUN (counter check), since a silent eligibility miss would make
    this test vacuously compare the fallback against itself."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    try:
        before = engine.character_one_dispatch_queries
        one = engine.find_similar_documents(
            query, topn=800, search_mode="character oriented")
        assert engine.character_one_dispatch_queries == before + 1

        monkeypatch.setenv("AIIS_CHAR_ONE_DISPATCH", "0")  # escape hatch
        two = engine.find_similar_documents(
            query, topn=800, search_mode="character oriented")
        assert engine.character_one_dispatch_queries == before + 1
        # ulp-tie-robust: the fused and standalone programs may schedule the
        # metric matvec's reductions differently (same caveat as batched)
        _assert_equivalent_ranking(one, two, query)
    finally:
        engine.cfeature_reranker = None


def test_one_dispatch_falls_back_on_stale_file(setup):
    """A top-10 file modified since its row's extraction must NOT be served
    from the one-dispatch candidates: the host freshness post-check fails and
    the query resolves through the classic second dispatch (live extraction),
    identical to the forced-live result."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    query = "1girl"
    try:
        fresh = engine.find_similar_documents(
            query, topn=800, search_mode="character oriented")
        # stale-stamp one of the query's top-10 files
        top_doc = fresh[0][0]
        path = engine.image_files_name_tags_arr[top_doc].split(",")[0]
        row = reranker._row_of[path]
        stamp = reranker._row_stamps[row]
        os.utime(path, (stamp + 10, stamp + 10))
        try:
            before = engine.character_one_dispatch_queries
            before_fb = reranker.one_dispatch_fallbacks
            stale = engine.find_similar_documents(
                query, topn=800, search_mode="character oriented")
            # the one-dispatch program still ran (stage A came from it) ...
            assert engine.character_one_dispatch_queries == before + 1
            # ... and the freshness fallback is observable
            assert reranker.one_dispatch_fallbacks == before_fb + 1
            # ... but the result came from the live path
            os.environ["AIIS_RERANK_LIVE"] = "1"
            try:
                live = engine.find_similar_documents(
                    query, topn=800, search_mode="character oriented")
            finally:
                del os.environ["AIIS_RERANK_LIVE"]
            assert [d for d, _ in stale] == [d for d, _ in live]
        finally:
            os.utime(path, (stamp - 10, stamp - 10))
    finally:
        engine.cfeature_reranker = None


def test_one_dispatch_over_cap_falls_back_to_full_diffs(setup, monkeypatch):
    """A sub-threshold count beyond the candidate cap must resolve through the
    exact full-diffs dispatch (the capped candidate list can't prove it holds
    every match), with results identical to the uncapped path."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    query = "1girl"
    try:
        # random tiny features rarely beat the real threshold — inflate it so
        # every indexed row matches (diff = 1-cos < 2.0 for non-antipodal
        # rows). Patch the INSTANCE: an earlier test's monkeypatch undo can
        # leave the original method planted as an instance attribute, which
        # would shadow a class-level patch.
        monkeypatch.setattr(reranker.predictor, "ccip_default_threshold",
                            lambda: 3.0)
        reranker._fused_inputs_key = None  # threshold is baked into the cache
        baseline = engine.find_similar_documents(
            query, topn=800, search_mode="character oriented")
        n_matches = len(baseline) - engine.cfg.search.rerank_top_k
        assert n_matches >= 2, "inflated threshold must produce matches"
        monkeypatch.setattr(CCIPReranker, "MATCH_CAP", 1)
        reranker._fused_inputs_key = None  # cap is baked into the cache
        before = engine.character_one_dispatch_queries
        capped = engine.find_similar_documents(
            query, topn=800, search_mode="character oriented")
        assert engine.character_one_dispatch_queries == before + 1
        # the fused program's diffs and the standalone full-diffs program can
        # differ in final ulps (different XLA reduction scheduling) — same
        # caveat as the batched-vs-sequential comparison
        _assert_equivalent_ranking(capped, baseline, query)
    finally:
        reranker._fused_inputs_key = None
        engine.cfeature_reranker = None


def test_one_dispatch_disabled_when_nothing_gatherable(setup):
    """An index where NO row can serve a gather (e.g. pre-v1.1: all norms
    unknown with nonzero rows) must publish a disabled sentinel instead of
    dispatching the fused rerank half just to discard it every query."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    idx = reranker.cfeatures_idx
    idx._norms = np.array(idx._norms)
    saved = idx._norms.copy()
    try:
        idx._norms[:] = 0.0
        reranker._fused_inputs_key = None
        assert engine._character_one_dispatch_inputs() is None
        before = engine.character_one_dispatch_queries
        out = engine.find_similar_documents(
            "1girl", topn=800, search_mode="character oriented")
        assert engine.character_one_dispatch_queries == before
        assert len(out) >= engine.cfg.search.rerank_top_k
    finally:
        idx._norms[:] = saved
        reranker._fused_inputs_key = None
        engine.cfeature_reranker = None


def test_one_dispatch_ineligible_for_learned_metric(setup, monkeypatch):
    """A converted learned metric disables the fused 1−cos program; the query
    must resolve through the two-dispatch path with the metric applied."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    try:
        monkeypatch.setattr(reranker.predictor, "uses_learned_metric",
                            lambda: True)
        reranker._fused_inputs_key = None
        assert engine._character_one_dispatch_inputs() is None
        before = engine.character_one_dispatch_queries
        out = engine.find_similar_documents(
            "1girl", topn=800, search_mode="character oriented")
        assert engine.character_one_dispatch_queries == before
        assert len(out) >= engine.cfg.search.rerank_top_k
    finally:
        reranker._fused_inputs_key = None
        engine.cfeature_reranker = None


@pytest.mark.parametrize("query", [
    "1girl", "solo smile", "1boy:+1", "smile:-1 1girl", "1girl:2 sword",
])
def test_character_fused_stage_a_matches_multicall(setup, query):
    """The one-dispatch character stage A (fused scores + device top-k,
    engine._find_similar_character_fused) must return the identical result
    list as the reference-shaped multi-call path (separate matvec + BM25 +
    host sort feeding CCIPReranker.__call__)."""
    engine, reranker = setup
    engine.cfeature_reranker = reranker
    try:
        assert engine.character_fused_available(query)
        before = engine.character_fused_dispatches
        fused = engine.find_similar_documents(
            query, topn=800, search_mode="character oriented")
        assert engine.character_fused_dispatches == before + 1

        engine.character_fused_available = lambda doc: False  # force multicall
        try:
            multi = engine.find_similar_documents(
                query, topn=800, search_mode="character oriented")
        finally:
            del engine.character_fused_available
        assert [d for d, _ in fused] == [d for d, _ in multi]
        np.testing.assert_allclose([s for _, s in fused],
                                   [s for _, s in multi],
                                   rtol=1e-4, atol=1e-5)
    finally:
        engine.cfeature_reranker = None
