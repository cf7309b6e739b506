from anime_illust_image_searcher_tpu.index.dictionary import TagDictionary


def test_id_assignment_sorted_within_doc():
    # gensim Dictionary assigns new ids in sorted token order per document.
    d = TagDictionary([["zebra", "apple", "mango"]])
    assert d.token2id == {"apple": 0, "mango": 1, "zebra": 2}


def test_id_assignment_across_docs():
    d = TagDictionary([["b", "a"], ["c", "a"], ["d"]])
    assert d.token2id == {"a": 0, "b": 1, "c": 2, "d": 3}
    assert d.num_docs == 3


def test_doc2bow_counts_and_dfs():
    d = TagDictionary()
    bow = d.doc2bow(["x", "y", "x"], allow_update=True)
    assert bow == [(0, 2), (1, 1)]
    assert d.dfs == {0: 1, 1: 1}
    # unknown tokens are dropped when not updating
    assert d.doc2bow(["x", "zzz"]) == [(0, 1)]


def test_save_load_roundtrip(tmp_path):
    d = TagDictionary([["b", "a"], ["c"]])
    p = str(tmp_path / "doc2vec_dictionary")
    d.save(p)
    d2 = TagDictionary.load(p)
    assert d2.token2id == d.token2id
    assert d2.dfs == d.dfs
