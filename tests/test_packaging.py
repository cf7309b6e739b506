"""The packaged single-file artifact actually builds and runs.

The reference ships PyInstaller binaries (reference: packaging.bat:1-3,
run_webui.spec:26-40, cmd_run.py:7-25); pyinstaller cannot be installed in the
zero-egress image, so the artifact this repo builds and tests is a stdlib
zipapp (packaging/build_zipapp.py) with the same dispatch surface. These tests
build the archive and drive it end-to-end in subprocesses: usage banner, a full
genmodel index build, native-runtime extraction from the archive, and the SPA
page served through importlib.resources.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**extra: str) -> dict:
    """Subprocess env: CPU jax, no axon sitecustomize (its PJRT registration
    blocks on the TPU relay, which tests must not depend on)."""
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    env.update(extra)
    return env


@pytest.fixture(scope="session")
def pyz(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("zipapp") / "aiis.pyz")
    subprocess.run(
        [sys.executable, os.path.join(_REPO, "packaging", "build_zipapp.py"),
         "--out", out],
        check=True, capture_output=True, text=True)
    return out


def test_zipapp_usage_banner(pyz):
    r = subprocess.run([sys.executable, pyz], env=_clean_env(),
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "tagging|genmodel|gen_cfeatures|webui" in r.stdout


def test_zipapp_rejects_unknown_command(pyz):
    r = subprocess.run([sys.executable, pyz, "frobnicate"], env=_clean_env(),
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "Invalid command" in r.stdout


def test_zipapp_genmodel_builds_index(pyz, tmp_path):
    """`python aiis.pyz genmodel` produces the full artifact chain from a tags
    file, with the package imported from inside the archive."""
    from anime_illust_image_searcher_tpu.index import artifacts

    lines = [
        "/a.png,1girl,solo,smile",
        "/b.png,1boy,sword,armor",
        "/c.png,no_humans,bottle,still_life",
        "/d.png,1girl,smile,black_hair",
        "/e.png,1boy,armor,standing",
    ]
    (tmp_path / artifacts.TAGS_FILE).write_text("\n".join(lines) + "\n")
    r = subprocess.run(
        [sys.executable, pyz, "genmodel", "--epochs", "2"],
        env=_clean_env(), cwd=tmp_path, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    for name in (artifacts.DOC2VEC_MODEL, artifacts.DOC2VEC_INDEX,
                 artifacts.DOC2VEC_DICTIONARY, artifacts.BM25_IDF,
                 artifacts.BM25_CORPUS, artifacts.DOC2VEC_IDX_CSV):
        assert (tmp_path / name).exists(), name


@pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")
def test_zipapp_native_runtime_and_spa(pyz, tmp_path):
    """Importing from the archive still yields the native decode pool (sources
    extracted to the user cache and built there) and the SPA page."""
    script = textwrap.dedent("""
        import numpy as np
        from PIL import Image
        import anime_illust_image_searcher_tpu as pkg
        assert ".pyz" in pkg.__file__, pkg.__file__
        from anime_illust_image_searcher_tpu.data import native_ingest
        Image.fromarray(np.zeros((64, 48, 3), dtype=np.uint8)).save("t.jpg")
        img = native_ingest.decode_resize("t.jpg", 32)
        assert img is not None and img.shape == (32, 32, 3), img
        assert "aiis_runtime" in native_ingest._RUNTIME_DIR
        from anime_illust_image_searcher_tpu.cli import webui
        html = webui._index_html()
        assert b"/api/search" in html
        print("ZIPAPP_NATIVE_OK")
    """)
    env = _clean_env(XDG_CACHE_HOME=str(tmp_path / "cache"),
                     PYTHONPATH=pyz, AIIS_NATIVE_INGEST="1")
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       cwd=tmp_path, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ZIPAPP_NATIVE_OK" in r.stdout
