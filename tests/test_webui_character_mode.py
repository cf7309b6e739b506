"""Character-oriented search mode end-to-end through the HTTP surface:
tag index + cfeature index (tiny random CCIP) -> webui -> character-mode query."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from anime_illust_image_searcher_tpu.cli import gen_cfeatures, genmodel
from anime_illust_image_searcher_tpu.cli.webui import WebUIServer, make_handler
from anime_illust_image_searcher_tpu.config import CCIPConfig
from anime_illust_image_searcher_tpu.index import artifacts
from anime_illust_image_searcher_tpu.models.caformer import tiny_test_config
from anime_illust_image_searcher_tpu.search.rerank_ccip import CCIPReranker

TINY = tiny_test_config()
CFG = CCIPConfig(image_size=TINY.img_size, feature_dim=TINY.feature_dim,
                 batch_size=4, decode_workers=2)


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    tmp = tmp_path_factory.mktemp("webui_char")
    cwd = os.getcwd()
    os.chdir(tmp)
    ui = None
    try:
        rng = np.random.RandomState(0)
        img_dir = tmp / "imgs"
        img_dir.mkdir()
        pools = [
            ["1girl", "solo", "smile", "black_hair"],
            ["1boy", "sword", "armor", "standing"],
        ]
        lines = []
        paths = []
        for i in range(24):
            p = img_dir / f"{i:02d}.png"
            Image.fromarray(
                rng.randint(0, 255, (TINY.img_size, TINY.img_size, 3), dtype=np.uint8)
            ).save(p)
            paths.append(str(p))
            tags = list(rng.choice(pools[i % 2], size=3, replace=False))
            lines.append(f"{p},{','.join(tags)}")
        with open(artifacts.TAGS_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        genmodel.main(["--epochs", "5"])

        pred = gen_cfeatures.Predictor(config=CFG, model_cfg=TINY, use_pallas=False)
        pred.process_directory(str(img_dir))

        ui = WebUIServer(directory=str(tmp))
        # inject the tiny-config reranker (default would build the full caformer)
        engine = ui.load.__wrapped__ if hasattr(ui.load, "__wrapped__") else None
        server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(ui))
        # pre-load with tiny predictor
        eng = ui.load()
        eng.cfeature_reranker = CCIPReranker(
            eng.image_files_name_tags_arr, eng.file_tag_index_dict,
            eng.filepath_docid_dict, directory=str(tmp),
            predictor=gen_cfeatures.Predictor(config=CFG, model_cfg=TINY,
                                              use_pallas=False),
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        server.shutdown()
    finally:
        # in finally: a failure during fixture setup (after load() started the
        # warmup thread) must still join it — exiting mid-compile crashes teardown
        if ui is not None:
            ui.close(timeout=120)  # bounded: a hung warmup must not hang the
            # suite. Safe margin: conftest pins JAX_PLATFORMS=cpu, where these
            # warmup compiles take seconds; close() warns if the timeout fires.
        os.chdir(cwd)


def post(url, path, obj):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_config_reports_character_mode(server_url):
    with urllib.request.urlopen(server_url + "/api/config") as r:
        assert json.loads(r.read()) == {"character_mode_available": True}


def test_character_mode_search(server_url):
    data = post(server_url, "/api/search",
                {"query": "1girl", "search_mode": "character oriented"})
    assert "error" not in data or not data.get("error")
    assert len(data["results"]) >= 10  # top10 passthrough at minimum
    # matches (if any) follow the pinned top10 and have sane scores
    for r in data["results"]:
        assert 0 <= r["doc_id"] < 24


def test_normal_mode_still_works(server_url):
    data = post(server_url, "/api/search", {"query": "sword", "search_mode": "normal"})
    assert len(data["results"]) > 0


def test_concurrent_mixed_mode_burst_matches_sequential(server_url):
    """A concurrent burst of interleaved normal + character queries through
    the live server must return what each query returns alone. The
    QueryBatcher coalesces per mode (normal rides the batched PRF program,
    character the batched one-dispatch program); a burst exercises the
    group-isolation path that sequential tests never hit. Comparison is
    tie-robust: doc-id SET + per-doc scores (vmap retiles f32 accumulation,
    which can permute exact ties across program variants)."""
    import concurrent.futures

    burst = [
        ("sword", "normal"),
        ("1girl", "character oriented"),
        ("1girl smile", "normal"),
        ("1boy", "character oriented"),
        ("armor standing", "normal"),
        ("smile", "normal"),
    ] * 2

    sequential = {}
    for q, mode in burst:
        if (q, mode) not in sequential:
            sequential[(q, mode)] = post(
                server_url, "/api/search", {"query": q, "search_mode": mode})

    with concurrent.futures.ThreadPoolExecutor(max_workers=len(burst)) as ex:
        futs = [ex.submit(post, server_url, "/api/search",
                          {"query": q, "search_mode": mode})
                for q, mode in burst]
        got = [f.result(timeout=300) for f in futs]

    for (q, mode), data in zip(burst, got):
        ref = sequential[(q, mode)]
        got_scores = {r["doc_id"]: r["similarity"] for r in data["results"]}
        ref_scores = {r["doc_id"]: r["similarity"] for r in ref["results"]}
        assert set(got_scores) == set(ref_scores), (q, mode)
        for d, v in got_scores.items():
            assert abs(v - ref_scores[d]) < 1e-4, (q, mode, d)
