"""Golden ranking fixtures: a fixed corpus + fixed queries must keep returning the
same rankings (CPU, deterministic seeds). Guards every layer of the query stack
against silent behavior drift (SURVEY.md §4's parity-fixture strategy, applied to this
framework's own deterministic pipeline).

To regenerate after an INTENTIONAL behavior change:
    JAX_PLATFORMS=cpu python tests/test_golden_rankings.py regen
"""

import json
import os
import sys

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_rankings.json")

CORPUS = [
    "/img/000.png,1girl,solo,smile,black_hair,dress",
    "/img/001.png,1boy,male_focus,sword,armor",
    "/img/002.png,no_humans,white_background,bottle,still_life",
    "/img/003.png,1girl,black_hair,sword,serious",
    "/img/004.png,1girl,smile,dress,flower",
    "/img/005.png,1boy,standing,armor,serious",
    "/img/006.png,no_humans,flower,still_life,monochrome",
    "/img/007.png,1girl,1boy,smile,holding_hands",
    "/img/008.png,1girl,solo,dress,flower,smile",
    "/img/009.png,1boy,sword,standing,short_hair",
    "/img/010.png,no_humans,bottle,monochrome,simple_background",
    "/img/011.png,1girl,black_hair,smile,solo",
    "/img/012.png,1boy,armor,sword,male_focus",
    "/img/013.png,1girl,flower,dress,smile",
    "/img/014.png,no_humans,white_background,simple_background,still_life",
]

QUERIES = [
    "1girl",
    "1girl smile:2",
    "sword",
    "1girl black_hair:+1",
    "1girl solo:-1",
    "no_humans bottle",
]


def build_engine(tmpdir):
    from anime_illust_image_searcher_tpu.cli import genmodel
    from anime_illust_image_searcher_tpu.index import artifacts
    from anime_illust_image_searcher_tpu.search.engine import SearchEngine

    cwd = os.getcwd()
    os.chdir(tmpdir)
    try:
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(CORPUS) + "\n")
        genmodel.main(["--epochs", "20"])
        return SearchEngine(str(tmpdir))
    finally:
        os.chdir(cwd)


def compute_rankings(engine):
    out = {}
    for q in QUERIES:
        results = engine.find_similar_documents(q, topn=800)
        out[q] = [[int(d), round(float(s), 5)] for d, s in results]
    return out


def test_rankings_match_golden(tmp_path):
    assert os.path.exists(GOLDEN_PATH), "golden file missing — run regen"
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    engine = build_engine(tmp_path)
    got = compute_rankings(engine)
    for q in QUERIES:
        got_ids = [d for d, _ in got[q]]
        want_ids = [d for d, _ in golden[q]]
        assert got_ids == want_ids, f"ranking drift for {q!r}: {got_ids} != {want_ids}"
        np.testing.assert_allclose(
            [s for _, s in got[q]], [s for _, s in golden[q]], atol=1e-3,
            err_msg=f"score drift for {q!r}",
        )


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "regen":
    import tempfile

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    engine = build_engine(tempfile.mkdtemp())
    with open(GOLDEN_PATH, "w") as f:
        json.dump(compute_rankings(engine), f, indent=1)
    print(f"wrote {GOLDEN_PATH}")
