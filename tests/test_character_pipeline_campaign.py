"""Randomized full-pipeline campaign for CHARACTER-oriented queries.

The normal-mode analog (test_engine_pipeline_oracle.py, round-4 450-query
campaign) pinned that every engine/oracle divergence is f32-vs-f64 precision
at the reference's tie-sensitive boundaries. This file does the same for the
character pipeline: random corpora (with tiny deterministic CCIP features) x
random queries, the engine's one-dispatch fused character path
(ccip_character_query_matches_op) vs a verbatim f64 oracle composed of the
reference's stage A (webui.py:345-390: parse + fusion, including the
QUIRKS #11 plain-digit-weight -> exclude_tags branch at webui.py:366-369)
and character rerank (webui.py:255-342, via
test_ccip_reranker_oracle.oracle_character).

The character pipeline's precision-sensitive boundaries are:
  - the stage-A rank-10 cut (which docs seed the cfeature mean),
  - the diff < predictor.threshold membership test (webui.py:327),
  - the 1-diff ordering of matches.
So the decidable invariants are:
  1. TOP-10 PARITY modulo precision: engine and oracle top-10 must be
     identical unless the disagreement sits across an f32-unresolvable
     oracle stage-A gap (<1e-5).
  2. REPLAY: when the top-10 *sets* differ (precision-legal), re-running the
     oracle rerank seeded by the ENGINE's own top-10 must reproduce the
     engine's matches under the same boundary tolerances — any logic bug in
     the fused gather/mean/metric/filter path fails here.
  3. MEMBERSHIP at the threshold: any doc in exactly one match set must have
     an f64 diff within 2e-5 of the threshold.
  4. SCORE PARITY: docs in both lists agree within 5e-4.
  5. ORDER PARITY modulo precision: match-order inversions only across <1e-5
     oracle score gaps.

CI runs a small slice; scale offline with
AIIS_CHAR_CAMPAIGN="<corpora>x<queries>" (e.g. 12x30).
"""

import os

import numpy as np
import pytest
from PIL import Image

from test_ccip_reranker_oracle import CFG, TINY, oracle_character
from test_engine_pipeline_oracle import (
    oracle_bm25_scores,
    oracle_bm25_stats,
    oracle_doc2vec_vector,
    oracle_parse,
    unitvec,
)

from anime_illust_image_searcher_tpu.cli import gen_cfeatures, genmodel
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.search.engine import SearchEngine
from anime_illust_image_searcher_tpu.search.rerank_ccip import CCIPReranker

# f32 cannot reliably resolve fused-score gaps below ~1e-6 relative; the
# normal-mode campaign used 1e-5 as the "unresolvable" bound and every
# adjudicated divergence sat under it. Same bounds here.
GAP_F32 = 1e-5
THRESH_BOUNDARY = 2e-5
SCORE_TOL = 5e-4


def _campaign_size():
    spec = os.environ.get("AIIS_CHAR_CAMPAIGN", "")
    if spec:
        c, q = spec.lower().split("x")
        return int(c), int(q)
    return 2, 10  # CI slice


def build_corpus(tmp, seed, n_docs, pool_size, dup_frac):
    """Tag index + tiny-CCIP cfeature index over generated images."""
    rng = np.random.RandomState(seed)
    pool = [f"tag{i:03d}" for i in range(pool_size)]
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        base_sets = [list(rng.choice(pool, size=int(rng.randint(3, 6)),
                                     replace=False)) for _ in range(6)]
        lines = []
        for i in range(n_docs):
            p = img_dir / f"{i:03d}.png"
            Image.fromarray(rng.randint(
                0, 255, (TINY.img_size, TINY.img_size, 3), dtype=np.uint8)
            ).save(p)
            if rng.rand() < dup_frac:
                tags = base_sets[int(rng.randint(len(base_sets)))]
            else:
                tags = list(rng.choice(pool, size=int(rng.randint(3, 7)),
                                       replace=False))
            lines.append(f"{p},{','.join(tags)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "5"])
        pred = gen_cfeatures.Predictor(config=CFG, model_cfg=TINY,
                                       use_pallas=False)
        pred.process_directory(str(img_dir))
        engine = SearchEngine(str(tmp))
        engine.cfeature_reranker = CCIPReranker(
            engine.image_files_name_tags_arr, engine.file_tag_index_dict,
            engine.filepath_docid_dict, directory=str(tmp),
            predictor=gen_cfeatures.Predictor(config=CFG, model_cfg=TINY,
                                              use_pallas=False),
        )
        engine.cfeature_reranker._lazy_load()
    finally:
        os.chdir(cwd)
    docs = [line.split(",")[1:] for line in lines]
    matrix = np.asarray(engine.index.matrix[: len(docs)], dtype=np.float64)
    bm25_pack = oracle_bm25_stats(docs, engine.dictionary.token2id)
    return engine, matrix, bm25_pack


def oracle_char_parse(query):
    """required/exclude extraction verbatim from webui.py:354-371 — note a
    plain digit weight (tag:3) lands in exclude_tags (QUIRKS #11)."""
    required, excluded = [], []
    for term in query.split(" "):
        sp = term.split(":")
        if len(sp) >= 2 and (sp[-1].startswith("+") or sp[-1].startswith("-")
                             or sp[-1].isdigit()):
            tag = ":".join(sp[:-1])
            if sp[-1].startswith("+"):
                required.append(tag)
            else:
                excluded.append(tag)
    return required, excluded


def oracle_stage_a(engine, matrix, bm25_pack, query):
    """webui.py:345-384 verbatim at f64: fused stage-A score vector."""
    corpus, dl, avgdl, idf, D = bm25_pack
    vec = oracle_doc2vec_vector(engine, query)
    sims = matrix @ unitvec(vec.astype(np.float64))
    tw = oracle_parse(query, engine.dictionary.token2id)
    bm25 = oracle_bm25_scores(tw, corpus, dl, avgdl, idf, D)
    if sims.max() > 0:
        sims = sims / sims.max()
    if bm25.max() > 0:
        bm25 = bm25 / bm25.max()
    return 0.5 * bm25 + 0.5 * sims


def oracle_all_diffs(engine, reranker, top10_ids):
    """f64 diff of every cfeature row vs the mean of the given top-10 docs
    (webui.py:293-310) — the adjudication instrument for threshold-boundary
    membership."""
    pred = reranker.predictor
    files = [engine.image_files_name_tags_arr[d].split(",")[0]
             for d in top10_ids]
    feats = []
    for f in files:
        try:
            feats.append(pred.get_image_feature(f))
        except Exception:  # noqa: BLE001 — reference prints and skips
            continue
    mean = np.average(np.asarray(feats, dtype=np.float64), axis=0)
    cindex = reranker.cfeatures_idx
    diffs = {}
    for i, path in enumerate(reranker.cfeature_filepath_idx):
        row = np.asarray(cindex.matrix[i], dtype=np.float64) * float(
            cindex.norms[i])
        diffs[path] = float(pred.ccip_difference(row, mean))
    return diffs


def _close(a, b):
    """Score equality that survives the reference's -inf exclusion scores
    (webui.py:166-171: an excluded doc's fused score is -inf in both engine
    and oracle; plain subtraction would make that NaN)."""
    a, b = float(a), float(b)
    if np.isnan(a) or np.isnan(b):
        return np.isnan(a) and np.isnan(b)
    if np.isinf(a) or np.isinf(b):
        return a == b
    return abs(a - b) < SCORE_TOL


def _gap(a, b):
    """|a-b| that reports exact ties (including -inf == -inf) as 0 instead
    of NaN."""
    a, b = float(a), float(b)
    return 0.0 if a == b else abs(a - b)


def random_char_queries(rng, vocab, n):
    out = []
    for _ in range(n):
        k = int(rng.randint(1, 4))
        tags = list(rng.choice(vocab, size=k, replace=False))
        parts = []
        for t in tags:
            r = rng.rand()
            if r < 0.15:
                parts.append(f"{t}:{rng.randint(2, 5)}")  # QUIRKS #11 exclude
            elif r < 0.30:
                parts.append(f"{t}:+1")  # required
            elif r < 0.40:
                parts.append(f"{t}:-1")  # excluded
            else:
                parts.append(t)
        out.append(" ".join(parts))
    return out


def check_query(engine, matrix, bm25_pack, query, stats):
    reranker = engine.cfeature_reranker
    required, excluded = oracle_char_parse(query)
    final64 = oracle_stage_a(engine, matrix, bm25_pack, query)
    want = oracle_character(engine, reranker, final64, 800, required, excluded)
    got = engine.find_similar_documents(query, topn=800,
                                        search_mode="character oriented")
    # the common case must actually be the fused one-dispatch program
    # (availability was asserted by the caller)

    want_ids = [d for d, _ in want]
    got_ids = [d for d, _ in got]
    if got_ids == want_ids:
        agree = all(_close(s, ws) for (_, s), (_, ws) in zip(got, want))
        if agree:
            stats["exact"] += 1
            return
    stats["divergent"] += 1
    if got_ids[:10] != want_ids[:10]:
        stats["top10_neartie"] += 1
    if set(got_ids) != set(want_ids):
        stats["membership_boundary"] += 1

    # ---- invariant 1: top-10 parity modulo f32-unresolvable stage-A gaps
    srt = sorted(enumerate(final64), key=lambda it: -it[1])
    rank_of = {d: i for i, (d, _) in enumerate(srt)}
    for i, (g, w) in enumerate(zip(got_ids[:10], want_ids[:10])):
        if g != w:
            # the two docs disputing this slot must be an f32 near-tie
            assert _gap(final64[g], final64[w]) < GAP_F32, (
                query, i, g, w, final64[g], final64[w])

    got_top10 = got_ids[:10]
    want_top10 = want_ids[:10]
    if set(got_top10) == set(want_top10):
        want_matches = want[10:]
        diffs = oracle_all_diffs(engine, reranker, want_top10)
    else:
        # every swapped-in/out member sits across an f32-unresolvable gap
        for d in set(got_top10) ^ set(want_top10):
            boundary_gap = _gap(final64[d], srt[9][1]) if len(srt) > 10 else 0
            assert boundary_gap < GAP_F32, (query, d, final64[d], srt[9][1])
        # ---- invariant 2: REPLAY — oracle rerank seeded by the ENGINE's
        # top-10 must reproduce the engine's matches
        diffs = oracle_all_diffs(engine, reranker, got_top10)
        thr = reranker.predictor.threshold
        replay = []
        for path, diff in diffs.items():
            in_dict = path in engine.file_tag_index_dict
            ok_req = in_dict and all(
                t in engine.file_tag_index_dict[path] for t in required)
            ok_exc = in_dict and all(
                t not in engine.file_tag_index_dict[path] for t in excluded)
            if diff < thr and ok_req and ok_exc:
                replay.append((engine.filepath_docid_dict[path], 1.0 - diff))
        want_matches = sorted(replay, key=lambda it: -it[1])

    thr = reranker.predictor.threshold
    docid_to_path = {engine.filepath_docid_dict[p]: p
                     for p in reranker.cfeature_filepath_idx}
    got_matches = got[10:]
    wmap = dict((d, s) for d, s in want_matches)
    gmap = dict((d, s) for d, s in got_matches)

    # ---- invariant 3: membership differences only at the threshold boundary
    for d in set(wmap) ^ set(gmap):
        diff = diffs[docid_to_path[d]]
        assert abs(diff - thr) < THRESH_BOUNDARY, (query, d, diff, thr)

    # ---- invariant 4: score parity on the intersection
    for d in set(wmap) & set(gmap):
        assert _close(gmap[d], wmap[d]), (query, d, gmap[d], wmap[d])

    # ---- invariant 5: inversions only across f32-unresolvable gaps
    pos_g = {d: i for i, d in enumerate(d for d, _ in got_matches)}
    order_w = [d for d, _ in want_matches if d in pos_g]
    for i, a in enumerate(order_w):
        for b in order_w[i + 1:]:
            if pos_g[a] > pos_g[b]:
                assert _gap(wmap[a], wmap[b]) < GAP_F32, (query, a, b)


CORPUS_GRID = [
    # (seed, n_docs, pool_size, dup_frac)
    (101, 26, 10, 0.0),
    (202, 60, 24, 0.5),
    (303, 40, 8, 0.5),
    (404, 90, 24, 0.0),
    (505, 120, 40, 0.5),
    (606, 30, 12, 0.8),
    (707, 60, 10, 0.0),
    (808, 80, 16, 0.5),
    (909, 45, 24, 0.3),
    (111, 100, 32, 0.5),
    (222, 26, 6, 0.8),
    (333, 70, 20, 0.2),
]


def test_character_pipeline_campaign(tmp_path_factory):
    n_corpora, n_queries = _campaign_size()
    stats = {"exact": 0, "divergent": 0, "queries": 0,
             "top10_neartie": 0, "membership_boundary": 0}
    for ci in range(n_corpora):
        seed, n_docs, pool_size, dup_frac = CORPUS_GRID[ci % len(CORPUS_GRID)]
        tmp = tmp_path_factory.mktemp(f"char_campaign_{ci}")
        engine, matrix, bm25_pack = build_corpus(
            tmp, seed + ci, n_docs, pool_size, dup_frac)
        vocab = [t for t in engine.dictionary.token2id]
        rng = np.random.RandomState(1000 + ci)
        probe = vocab[0]
        assert engine.character_fused_available(probe), "campaign must drive the fused path"
        for q in random_char_queries(rng, vocab, n_queries):
            check_query(engine, matrix, bm25_pack, q, stats)
            stats["queries"] += 1
    print(f"character campaign: {stats}")
    assert stats["queries"] == n_corpora * n_queries
    # every query either matched exactly or passed all five invariants
    assert stats["exact"] + stats["divergent"] == stats["queries"]


def test_character_pipeline_small_corpus_branch(tmp_path_factory):
    """<=10 docs: the reference's other branch (webui.py:338-342 — elbow
    filter + topn cut, NO rerank). The fused path is unavailable here by
    construction (len(index) <= rerank_top_k), so this also covers the
    multi-call fallback against the same oracle."""
    tmp = tmp_path_factory.mktemp("char_campaign_small")
    engine, matrix, bm25_pack = build_corpus(tmp, 77, 9, 8, 0.0)
    reranker = engine.cfeature_reranker
    vocab = [t for t in engine.dictionary.token2id]
    assert not engine.character_fused_available(vocab[0])
    rng = np.random.RandomState(5)
    for q in random_char_queries(rng, vocab, 6):
        required, excluded = oracle_char_parse(q)
        final64 = oracle_stage_a(engine, matrix, bm25_pack, q)
        want = oracle_character(engine, reranker, final64, 800,
                                required, excluded)
        got = engine.find_similar_documents(q, topn=800,
                                            search_mode="character oriented")
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (d, s), (_, ws) in zip(got, want):
            assert _close(s, ws), (q, d)
