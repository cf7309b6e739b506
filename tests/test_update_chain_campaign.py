"""Randomized multi-generation ``genmodel --update`` chain campaign.

The reference's incremental path has sharp semantics (genmodel.py:123-148,177;
QUIRKS #6): the idx csv is rewritten from the FULL tag file, only docs beyond
the old line count get vectors appended (inferred with the FROZEN gen-0
model), the dictionary is never extended, and BM25 is fully rebuilt every
time. The query-side campaigns (test_normal/character_pipeline_campaign)
randomize corpora against a fixed artifact chain; this one randomizes the
CHAIN ITSELF — several update generations with adversarial appends (brand-new
tags, duplicate docs, <3-tag rejects, empty generations) — and checks the
artifact-chain invariants after every generation.

CI runs a small slice; AIIS_UPDATE_CAMPAIGN="<chains>x<generations>"
(e.g. 4x4) re-runs the campaign at scale offline.
"""

import os
import pickle

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.index.bm25_index import (
    BM25DeviceIndex, build_bm25_stats, load_bm25_artifacts,
)
from anime_illust_image_searcher_tpu.index.dictionary import TagDictionary
from anime_illust_image_searcher_tpu.index.similarity import SimilarityIndex
from anime_illust_image_searcher_tpu.models.doc2vec import Doc2VecModel
from anime_illust_image_searcher_tpu.search.engine import SearchEngine


def _campaign_size():
    spec = os.environ.get("AIIS_UPDATE_CAMPAIGN", "")
    if spec:
        c, g = spec.lower().split("x")
        return int(c), int(g)
    return 1, 2  # CI slice


CHAIN_SEEDS = [7, 1009, 4242, 90210, 31337, 555, 808, 6174]


def _random_lines(rng, pool, n, start_idx, reject_frac, new_tag_frac):
    """Random tag-file lines: some <3-tag rejects, some with brand-new tags."""
    lines = []
    for i in range(n):
        if rng.rand() < reject_frac:
            k = int(rng.randint(1, 3))  # dropped by the >=3-tag filter
        else:
            k = int(rng.randint(3, 8))
        tags = list(rng.choice(pool, size=min(k, len(pool)), replace=False))
        if rng.rand() < new_tag_frac and len(tags) >= 3:
            tags[0] = f"novel{start_idx + i:04d}"  # tag absent from gen-0 dict
        lines.append(f"/img/{start_idx + i:04d}.png,{','.join(tags)}")
    return lines


def _kept(lines):
    """The >=3-tag filter (genmodel.read_documents_and_gen_idx_text)."""
    return [l for l in lines if len(l.split(",")[1:]) >= 3]


def _write_tags(lines):
    with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def _assert_generation_invariants(all_lines, n_before, mat_before,
                                  norms_before, dict_bytes_before):
    kept = _kept(all_lines)
    docs = [l.split(",")[1:] for l in kept]

    # 1. idx csv == the >=3-tag-filtered tag file, in order
    with open(artifacts.DOC2VEC_IDX_CSV, encoding="utf-8") as f:
        rows = [l.strip() for l in f]
    assert rows == kept

    # 2. the dictionary file is untouched (QUIRKS #6: never extended)
    with open(artifacts.DOC2VEC_DICTIONARY, "rb") as f:
        assert f.read() == dict_bytes_before

    dictionary = TagDictionary.load(artifacts.DOC2VEC_DICTIONARY)
    model = Doc2VecModel.load(artifacts.DOC2VEC_MODEL)
    index = SimilarityIndex.load(artifacts.DOC2VEC_INDEX)

    # 3. old rows byte-identical; appended rows == frozen-model inference
    assert len(index) == len(kept)
    np.testing.assert_array_equal(index.matrix[:n_before], mat_before)
    np.testing.assert_array_equal(index.norms[:n_before], norms_before)
    new_docs = docs[n_before:]
    if new_docs:
        expect = model.infer_vectors(new_docs)
        for j, raw in enumerate(expect):
            row = index.matrix[n_before + j]
            norm = index.norms[n_before + j]
            # stored row is unit-normalized with the raw norm kept for
            # reconstruction (the fused PRF path depends on row*norm == raw)
            np.testing.assert_allclose(row * norm, raw, rtol=1e-5, atol=1e-6)

    # 4. BM25 pickles == a full rebuild over the whole corpus with the
    # frozen dictionary (unseen tags contribute nothing)
    expected = build_bm25_stats(docs, dictionary)
    stats = load_bm25_artifacts(".")
    assert stats.num_docs == expected.num_docs == len(kept)
    assert stats.corpus == expected.corpus
    assert stats.idf == expected.idf
    assert stats.avgdl == expected.avgdl
    np.testing.assert_array_equal(stats.doc_lengths, expected.doc_lengths)

    # 5. the serve cache written by genmodel is FRESH for the new pickles and
    # carries the same device-form arrays a cold build would derive
    cached = BM25DeviceIndex.load_cached(".", vocab_size=len(dictionary))
    assert cached is not None, "serve cache stale or missing after update"
    rebuilt = BM25DeviceIndex.from_stats(expected, vocab_size=len(dictionary))
    np.testing.assert_array_equal(cached.term_mat, rebuilt.term_mat)
    np.testing.assert_array_equal(cached.contrib_mat, rebuilt.contrib_mat)
    np.testing.assert_array_equal(cached.ov_doc, rebuilt.ov_doc)

    return len(kept), np.array(index.matrix), np.array(index.norms)


@pytest.mark.parametrize("chain", range(max(_campaign_size()[0], 1)))
def test_update_chain_invariants(tmp_cwd, chain):
    n_chains, n_gens = _campaign_size()
    if chain >= n_chains:
        pytest.skip("outside campaign slice")
    rng = np.random.RandomState(CHAIN_SEEDS[chain % len(CHAIN_SEEDS)])
    pool = [f"tag{i:03d}" for i in range(int(rng.randint(15, 60)))]

    lines = _random_lines(rng, pool, int(rng.randint(12, 30)), 0,
                          reject_frac=0.15, new_tag_frac=0.0)
    _write_tags(lines)
    genmodel.main(["--epochs", "5"])

    with open(artifacts.DOC2VEC_DICTIONARY, "rb") as f:
        dict_bytes = f.read()
    index = SimilarityIndex.load(artifacts.DOC2VEC_INDEX)
    n_before = len(index)
    mat_before = np.array(index.matrix)
    norms_before = np.array(index.norms)
    assert n_before == len(_kept(lines))

    for gen in range(n_gens):
        if gen == n_gens - 1:
            add = []  # empty generation: --update with nothing new
        else:
            add = _random_lines(
                rng, pool, int(rng.randint(1, 12)), 1000 * (gen + 1),
                reject_frac=0.3, new_tag_frac=0.4)
            if rng.rand() < 0.5 and n_before:
                # duplicate an existing doc line (same path re-tagged)
                add.append(lines[int(rng.randint(len(lines)))])
        lines = lines + add
        _write_tags(lines)
        genmodel.main(["--update"])
        n_before, mat_before, norms_before = _assert_generation_invariants(
            lines, n_before, mat_before, norms_before, dict_bytes)

    # the final chain must actually serve: engine loads, fused path answers
    engine = SearchEngine(".")
    probe = _kept(lines)[0].split(",")[1]
    res = engine.search(probe, topn=10)
    assert len(res) >= 1
