"""Env-scalable randomized-corpora campaign for NORMAL-mode queries.

The round-4 offline campaign (450 queries / 18 random corpora) adjudicated
every fused-engine-vs-f64-oracle divergence as precision at the reference's
tie-sensitive elbow; its three decidable invariants are pinned on one
near-tie corpus by test_engine_pipeline_oracle.py. This file makes the full
randomized-corpus sweep itself REPEATABLE: CI runs a small slice, and
AIIS_NORMAL_CAMPAIGN="<corpora>x<queries>" (e.g. 18x25) re-runs the campaign
at scale — the character-mode twin is test_character_pipeline_campaign.py.
"""

import os

import numpy as np
import pytest

from test_engine_pipeline_oracle import (
    assert_normal_invariants,
    make_uncut_engine,
    oracle_bm25_stats,
)

from anime_illust_image_searcher_tpu.cli import genmodel
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.search.engine import SearchEngine


def _campaign_size():
    spec = os.environ.get("AIIS_NORMAL_CAMPAIGN", "")
    if spec:
        c, q = spec.lower().split("x")
        return int(c), int(q)
    return 2, 10  # CI slice


CORPUS_GRID = [
    # (seed, n_docs, pool_size, dup_frac)
    (11, 30, 12, 0.0),
    (22, 90, 40, 0.5),
    (33, 180, 120, 0.0),
    (44, 60, 12, 0.5),
    (55, 120, 40, 0.0),
    (66, 30, 40, 0.5),
    (77, 90, 120, 0.5),
    (88, 180, 12, 0.0),
    (99, 45, 24, 0.8),
    (110, 150, 60, 0.3),
    (121, 75, 20, 0.6),
    (132, 100, 80, 0.2),
    (143, 30, 120, 0.0),
    (154, 200, 24, 0.5),
    (165, 50, 16, 0.4),
    (176, 140, 48, 0.1),
    (187, 60, 32, 0.7),
    (198, 110, 40, 0.5),
]


def build_corpus(tmp, seed, n_docs, pool_size, dup_frac):
    rng = np.random.RandomState(seed)
    pool = [f"tag{i:03d}" for i in range(pool_size)]
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        base_sets = [list(rng.choice(pool, size=int(rng.randint(3, 6)),
                                     replace=False)) for _ in range(8)]
        lines = []
        for i in range(n_docs):
            if rng.rand() < dup_frac:
                tags = base_sets[int(rng.randint(len(base_sets)))]
            else:
                tags = list(rng.choice(pool, size=int(rng.randint(3, 8)),
                                       replace=False))
            lines.append(f"/img/{i:03d}.png,{','.join(tags)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "8"])
        engine = SearchEngine(str(tmp))
        eng0 = make_uncut_engine(str(tmp))
    finally:
        os.chdir(cwd)
    docs = [line.split(",")[1:] for line in lines]
    matrix = np.asarray(engine.index.matrix[: len(docs)], dtype=np.float64)
    bm25_pack = oracle_bm25_stats(docs, engine.dictionary.token2id)
    return engine, eng0, matrix, bm25_pack


def random_queries(rng, vocab, n):
    out = []
    for _ in range(n):
        k = int(rng.randint(1, 5))
        tags = list(rng.choice(vocab, size=k, replace=False))
        parts = []
        for t in tags:
            r = rng.rand()
            if r < 0.2:
                parts.append(f"{t}:{rng.randint(2, 6)}")
            elif r < 0.3:
                parts.append(f"{t}:+1")
            elif r < 0.4:
                parts.append(f"{t}:-1")
            else:
                parts.append(t)
        out.append(" ".join(parts))
    return out


def test_normal_pipeline_campaign(tmp_path_factory):
    n_corpora, n_queries = _campaign_size()
    stats = {"queries": 0, "elbow_divergent": 0}
    for ci in range(n_corpora):
        seed, n_docs, pool_size, dup_frac = CORPUS_GRID[ci % len(CORPUS_GRID)]
        tmp = tmp_path_factory.mktemp(f"normal_campaign_{ci}")
        engine, eng0, matrix, bm25_pack = build_corpus(
            tmp, seed, n_docs, pool_size, dup_frac)
        vocab = [t for t in engine.dictionary.token2id]
        rng = np.random.RandomState(2000 + ci)
        for q in random_queries(rng, vocab, n_queries):
            if assert_normal_invariants(engine, eng0, matrix, bm25_pack, q):
                stats["elbow_divergent"] += 1
            stats["queries"] += 1
    print(f"normal campaign: {stats}")
    assert stats["queries"] == n_corpora * n_queries
