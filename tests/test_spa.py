"""Static contract tests for the SPA (VERDICT r3 #8).

No JS runtime exists in this image, so the SPA's 110 lines of grid/pager/
slideshow/export logic can't run under pytest; these tests pin the contract
between ``cli/webui_static/index.html`` and the server instead: every API
endpoint the page calls must be routed by the handler, and the reference's
observable UI constants (5x5 grid pages, 5 s slideshow auto-advance —
reference webui.py:436-455,490) must survive edits to the page. The dynamic
behavior itself is covered from the other side by tests/test_webui.py driving
the HTTP surface the page consumes.
"""

import inspect
import os
import re

import anime_illust_image_searcher_tpu.cli.webui as webui_mod

HTML_PATH = os.path.join(
    os.path.dirname(webui_mod.__file__), "webui_static", "index.html")


def _html() -> str:
    with open(HTML_PATH, encoding="utf-8") as f:
        return f.read()


def test_every_spa_endpoint_is_routed():
    """Each /api/* URL the page fetches appears verbatim in the handler source
    (a renamed or removed route would 404 the UI silently)."""
    html = _html()
    endpoints = set(re.findall(r"['\"](/api/[a-z_]+)", html))
    assert endpoints == {"/api/config", "/api/search", "/api/image", "/api/export"}
    server_src = inspect.getsource(webui_mod)
    for ep in endpoints:
        assert ep in server_src, f"SPA calls {ep} but the server never routes it"


def test_spa_ui_constants():
    """5x5 grid pages (PAGE=25, reference webui.py:436-455) and the 5 s
    slideshow interval (reference webui.py:466-492)."""
    html = _html()
    assert re.search(r"const PAGE = 25;", html)
    assert re.search(r"setInterval\(advance, 5000\)", html)
    # grid CSS is 5 columns wide — PAGE/5 rows
    assert "repeat(5, 1fr)" in html


def test_spa_payload_fields_match_server():
    """Field names the page reads from/sends to JSON bodies must match what the
    server emits/parses (the page is the only consumer; a drift is invisible to
    the HTTP tests)."""
    html = _html()
    server_src = inspect.getsource(webui_mod)
    # search request body fields
    for field in ("query", "search_mode"):
        assert f'"{field}"' in server_src or f"'{field}'" in server_src
    # search response fields the page renders
    for field in ("results", "latency_ms", "file_path", "similarity", "tags",
                  "error"):
        assert field in html and field in server_src
    # export request/response fields
    for field in ("paths", "count", "file"):
        assert field in html and field in server_src
    # config response gating the mode selector on cfeature-index presence
    assert "character_mode_available" in html
    assert "character_mode_available" in server_src


def test_spa_escapes_tag_text():
    """Tags render through createTextNode, never innerHTML — tag names are
    attacker-ish strings (arbitrary file content) and must not inject markup."""
    html = _html()
    assert "createTextNode" in html
    body = html.split("<script>", 1)[1]
    assert "innerHTML = ''" in body  # grid reset is the only innerHTML write
    assert body.count("innerHTML") == 1
