"""Search web UI — dependency-free HTTP server + single-page app.

Feature-parity rebuild of the reference Streamlit app (webui.py:392-788):
  - query box with TAG:WEIGHT / +require / -exclude syntax, Search button
  - search-mode selector ("normal" / "character oriented"), shown only when the
    cfeature index exists (webui.py:772-778)
  - 5×5 result grid with Top/Prev/Next/Last pagination (webui.py:436-556)
  - image info view: score %, path, tags (webui.py:558-578)
  - slideshow with 5 s auto-advance (webui.py:466-492)
  - export hit paths to ``query_timestamp.txt`` — shift_jis on win32, utf-8 elsewhere
    (webui.py:497-513)
  - max-display-limit input + Apply (webui.py:691-714)
  - ``--rep FROM TO`` path rewriting (webui.py:722-724)
  - NG-word filtering server-side (webui.py:592-594)

The server is ``http.server.ThreadingHTTPServer`` (streamlit is not a dependency of
this framework); the search engine loads once at startup, so queries hit warm jitted
programs. Default port 8501 matches the reference's .streamlit/config.toml:5-6.

    python -m anime_illust_image_searcher_tpu.cli.webui [--rep FROM TO] [--port 8501]
"""

from __future__ import annotations

import argparse
import json
import mimetypes
import os
import re
import sys
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

from ..index import artifacts
from ..search.engine import SearchEngine
from ..search.rerank_ccip import CCIPReranker

_HTML_PATH = os.path.join(os.path.dirname(__file__), "webui_static", "index.html")


def _index_html() -> bytes:
    """SPA page bytes. Reads through importlib.resources when the package is
    imported from a zipapp archive (no real file at _HTML_PATH)."""
    if os.path.exists(_HTML_PATH):
        with open(_HTML_PATH, "rb") as f:
            return f.read()
    from importlib import resources

    return (resources.files("anime_illust_image_searcher_tpu.cli")
            / "webui_static" / "index.html").read_bytes()

# Everything except word chars, dot, dash, and the (escaped-)paren forms Danbooru
# tags use becomes '_' — in particular '/' and '\\' so the name stays a basename.
_EXPORT_NAME_UNSAFE = re.compile(r"[^A-Za-z0-9._()\-]")

MAX_POST_BODY_BYTES = 2 * 1024 * 1024  # queries and 800-path exports are << 2 MB


class QueryBatcher:
    """Coalesce concurrent searches into one batched device call (ROADMAP #7).

    Leader-follower micro-batching: the first thread to arrive becomes the
    leader, waits ``window_s`` for followers, then runs every pending query
    through ``SearchEngine.find_similar_documents_batch`` — B concurrent
    queries cost ~one device round trip instead of B serialized ones (the
    relay round trip alone is ~33 ms; see ARCHITECTURE.md §3). Normal and
    character-oriented queries coalesce separately (batched PRF program vs
    batched character stage A + shared rerank dispatch)."""

    def __init__(self, engine, window_s: float = 0.004) -> None:
        import threading

        self.engine = engine
        self.window_s = window_s
        self._lock = threading.Lock()
        self._pending: list = []   # [(query, topn, search_mode, event, box)]
        self._leader_active = False

    def search(self, query: str, topn: int, search_mode: str):
        import threading

        event = threading.Event()
        box: dict = {}
        with self._lock:
            self._pending.append((query, topn, search_mode, event, box))
            leader = not self._leader_active
            if leader:
                self._leader_active = True
        if not leader:
            event.wait()
            if "error" in box:
                raise box["error"]
            return box["result"]

        time.sleep(self.window_s)
        with self._lock:
            # take everything (the engine chunks batches larger than its largest
            # bucket); the next arrival after release becomes the next leader
            batch = self._pending
            self._pending = []
            self._leader_active = False
        try:
            # per-mode coalescing: normal queries ride the batched PRF program,
            # character queries the batched stage A + shared rerank dispatch.
            # Failures are contained per GROUP: one mode's device error must
            # not poison the other mode's queries (which may already have, or
            # still get, perfectly good results).
            for is_char in (True, False):
                group = [e for e in batch
                         if (e[2] == "character oriented") == is_char]
                if not group:
                    continue
                mode = "character oriented" if is_char else "normal"
                try:
                    topn_max = max(t for _, t, _, _, _ in group)
                    outs = self.engine.find_similar_documents_batch(
                        [q for q, _, _, _, _ in group], topn=topn_max,
                        search_mode=mode)
                    for (q, t, _, ev, bx), out in zip(group, outs):
                        # errors are per query (an unknown tag fails ITS
                        # query, not everyone coalesced into the window)
                        if isinstance(out, Exception):
                            bx["error"] = out
                        elif is_char:
                            # the reference's >10-hit character branch ignores
                            # topn (webui.py:330-337) — never truncate it here
                            bx["result"] = out
                        else:
                            bx["result"] = out[: min(t, len(out))]
                        ev.set()
                except Exception as e:  # noqa: BLE001 — group-wide failure
                    for _, _, _, ev, bx in group:
                        if not ev.is_set():
                            bx["error"] = e
                            ev.set()
        finally:
            # whatever happened above, no requester may wait forever
            for _, _, _, ev, bx in batch:
                if not ev.is_set():
                    bx["error"] = RuntimeError("query batch dropped")
                    ev.set()
        if "error" in box:
            raise box["error"]
        return box["result"]


class WebUIServer:
    def __init__(self, directory: str = ".", rep: Optional[List[str]] = None,
                 mesh=None, batch_queries: bool = True) -> None:
        self.directory = directory
        self.rep = rep
        self.mesh = mesh
        self.batch_queries = batch_queries
        self.batcher: Optional[QueryBatcher] = None
        self.engine: Optional[SearchEngine] = None
        self._warmup_thread = None
        self._warmup_stop = None

    def close(self, timeout: Optional[float] = None) -> None:
        """Stop the background warmup and wait for it. Tests (and any embedder
        tearing the server down) must call this: exiting the interpreter while
        the daemon warmup thread is inside an XLA compile crashes teardown.

        The stop event is only observed BETWEEN compiles, so one in-flight
        compile must finish before the thread exits; the default waits for it
        (minutes on a remote-compile relay — announced so the exit doesn't
        look hung). A finite ``timeout`` returns earlier but then exiting the
        interpreter risks exactly the mid-compile crash this prevents."""
        if self._warmup_stop is not None:
            self._warmup_stop.set()
        if self._warmup_thread is not None:
            if self._warmup_thread.is_alive():
                print("waiting for the in-flight warmup compile to finish ...")
            self._warmup_thread.join(timeout)
            if self._warmup_thread.is_alive():
                print("WARNING: warmup thread still compiling after "
                      f"{timeout:.0f}s; exiting now may crash teardown")

    def load(self) -> SearchEngine:
        if self.engine is None:
            engine = SearchEngine(self.directory, rep=self.rep, mesh=self.mesh)
            if os.path.exists(os.path.join(self.directory, artifacts.CFEATURES_CSV)):
                # engine= defers the 1M-row tag-dict build to the first
                # character-mode query instead of webui startup
                engine.cfeature_reranker = CCIPReranker(
                    directory=self.directory, engine=engine,
                )
            # /api/image may only serve files the index knows about (after --rep
            # rewriting) — a browser-supplied path must not read arbitrary files.
            # Derived from the raw tag lines (first CSV token is the path), not
            # filepath_docid_dict, to keep startup free of the full dict build.
            allowed = set()
            for line in engine.image_files_name_tags_arr:
                fpath = line.split(",", 1)[0]
                if self.rep:
                    fpath = fpath.replace(self.rep[0], self.rep[1])
                allowed.add(fpath)
            self._allowed_images = allowed
            self._warmup(engine)
            if self.batch_queries:
                import threading

                self.batcher = QueryBatcher(engine)
                self._warmup_stop = threading.Event()
                self._warmup_thread = self._warmup_batch_buckets(
                    engine, self._warmup_stop)
            self.engine = engine
        return self.engine

    @staticmethod
    def _warmup_batch_buckets(engine: SearchEngine, stop=None):
        """Compile the batched query programs AND the large-term-bucket program in
        the background so neither a first concurrent burst nor a first >64-term
        query pays a cold compile (minutes on a remote-compile relay). The server
        stays responsive on the warm single-query program meanwhile.
        ``stop``: optional threading.Event checked between compiles (close())."""
        import threading

        if stop is None:
            stop = threading.Event()
        try:
            some_tag = next(iter(engine.dictionary.token2id))
        except StopIteration:
            return None

        # topn is a STATIC argument of the fused programs — warming with any other
        # value compiles a program production queries never use (observed as ~15 s
        # first-burst latency spikes); always warm at the serving topn.
        topn = engine.cfg.search.topn

        def work():
            from ..ops.fused_query import QUERY_TERM_BUCKETS

            tags = list(engine.dictionary.token2id)
            # batched programs compile per (batch bucket, term bucket) shape:
            # warm every batch bucket at BOTH interactive term buckets (8 and
            # 64) — a first concurrent burst of 9+-term queries is normal use
            # and must not stall on a cold compile either
            warm_queries = [some_tag]
            if len(tags) > QUERY_TERM_BUCKETS[0]:
                warm_queries.append(
                    " ".join(tags[: QUERY_TERM_BUCKETS[0] + 1]))
            for wq in warm_queries:
                for b in engine.QUERY_BATCH_BUCKETS:
                    if stop.is_set():
                        return
                    try:
                        engine.find_similar_documents_batch([wq] * b, topn=topn)
                    except Exception as e:  # noqa: BLE001 — never crash warmup
                        print(f"batch-bucket warmup skipped (b={b}): {e}")
                        return
            print("batched query programs warm")
            # character-mode programs (stage A single + batch buckets at BOTH
            # interactive term buckets, the rerank dispatch, and the lazy
            # CCIP/tag-dict loads) — so neither the first character query nor
            # the first concurrent character burst pays cold compiles
            # (measured: 16-25 s first query, ~10 s first-burst spikes on the
            # relay without this)
            if engine.cfeature_reranker is not None and hasattr(
                    engine.cfeature_reranker, "rerank_top"):
                try:
                    for wq in warm_queries:
                        for b in (1,) + engine.QUERY_BATCH_BUCKETS:
                            if stop.is_set():
                                return
                            engine.find_similar_documents_batch(
                                [wq] * b, topn=topn,
                                search_mode="character oriented")
                    # the full-diffs programs the capped candidate path falls
                    # back to for over-cap (popular-character) queries —
                    # warmup queries resolve from candidates and never
                    # compile these
                    if hasattr(engine.cfeature_reranker,
                               "warm_fallback_programs"):
                        engine.cfeature_reranker.warm_fallback_programs()
                    print("character query programs warm")
                except Exception as e:  # noqa: BLE001 — never crash warmup
                    print(f"character warmup skipped: {e}")
            # the exact-top-k re-dispatch (rare ambiguous single-flag elbows)
            try:
                for wq in warm_queries:
                    if stop.is_set():
                        return
                    engine._dispatch_fused(engine._pack_fused(wq), topn,
                                           exact=True)
                print("exact-elbow query program warm")
            except Exception as e:  # noqa: BLE001
                print(f"exact-elbow warmup skipped: {e}")
                return
            for bucket in QUERY_TERM_BUCKETS[1:]:
                prev = QUERY_TERM_BUCKETS[QUERY_TERM_BUCKETS.index(bucket) - 1]
                if len(tags) <= prev:
                    break  # vocabulary can't produce a query this large
                if stop.is_set():
                    return
                try:
                    big = " ".join(tags[: min(len(tags), prev + 1)])
                    if engine.fused_path_available(big):
                        engine.find_similar_documents(big, topn=topn)
                        print(f"{bucket}-term query program warm")
                except Exception as e:  # noqa: BLE001
                    print(f"big-bucket warmup skipped ({bucket}): {e}")
                    return

        thread = threading.Thread(target=work, daemon=True)
        thread.start()
        return thread  # join via WebUIServer.close(); the server never needs to

    def image_allowed(self, fpath: str) -> bool:
        self.load()
        return fpath in self._allowed_images

    @staticmethod
    def _warmup(engine: SearchEngine) -> None:
        """Compile every per-query program once at startup so user queries hit warm
        code (persistent-serving requirement, SURVEY.md §7)."""
        try:
            some_tag = next(iter(engine.dictionary.token2id))
        except StopIteration:
            return
        try:
            engine.search(some_tag)
        except Exception as e:  # noqa: BLE001 — warm-up must never kill the server
            print(f"warmup skipped: {e}")

    def has_character_mode(self) -> bool:
        return os.path.exists(os.path.join(self.directory, artifacts.CFEATURES_CSV))

    # ------------------------------------------------------------------ API

    def api_search(self, query: str, search_mode: str) -> dict:
        engine = self.load()
        t0 = time.perf_counter()
        try:
            if self.batcher is not None:
                topn = engine.cfg.search.topn
                sims = self.batcher.search(query, topn, search_mode)
                infos = engine.search(query, search_mode=search_mode,
                                      similar_docs=sims)
            else:
                infos = engine.search(query, search_mode=search_mode)
        except KeyError as e:
            # unknown tag — user-facing reference behavior (QUIRKS.md #7)
            return {"error": f"unknown tag: {e}", "results": []}
        except Exception as e:  # noqa: BLE001 — a query must never kill the handler
            print(f"search error: {type(e).__name__}: {e}")
            return {"error": f"{type(e).__name__}: {e}", "results": []}
        latency_ms = (time.perf_counter() - t0) * 1000.0
        return {
            "results": [
                {
                    "file_path": i.file_path,
                    "doc_id": i.doc_id,
                    "similarity": i.similarity,
                    "tags": i.tags,
                }
                for i in infos
            ],
            "latency_ms": round(latency_ms, 2),
            "character_mode_available": self.has_character_mode(),
        }

    def api_export(self, query: str, paths: List[str]) -> dict:
        """Write hit paths to ``query_timestamp.txt`` (reference webui.py:497-513).

        Unlike the reference (local Streamlit session), this is an HTTP endpoint, so
        the filename is sanitized to a basename confined to CWD and only paths the
        index actually knows about are written — browser input controls neither the
        write location nor arbitrary content.
        """
        encoding = "shift_jis" if sys.platform == "win32" else "utf-8"
        name = str(query).replace(" ", "_").replace(":", "_")
        name = _EXPORT_NAME_UNSAFE.sub("_", name).lstrip(".") or "query"
        out_name = f"{name[:128]}_{int(time.time())}.txt"
        assert os.path.basename(out_name) == out_name
        self.load()
        exported = [p for p in paths if isinstance(p, str) and p in self._allowed_images]
        written = 0
        with open(out_name, "w", encoding=encoding) as f:
            for p in exported:
                try:
                    f.write(f"{p}\n")
                    written += 1  # count lines that actually reached the file
                except Exception as e:  # noqa: BLE001
                    print(f"Error: {e}")
                    continue
        return {"file": out_name, "count": written}


def make_handler(server: WebUIServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, obj: dict, code: int = 200) -> None:
            self._send(code, json.dumps(obj).encode("utf-8"), "application/json")

        def do_GET(self) -> None:
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path in ("/", "/index.html"):
                self._send(200, _index_html(), "text/html; charset=utf-8")
            elif parsed.path == "/api/config":
                self._send_json({
                    "character_mode_available": server.has_character_mode(),
                })
            elif parsed.path == "/api/image":
                q = urllib.parse.parse_qs(parsed.query)
                fpath = q.get("path", [""])[0]
                if not server.image_allowed(fpath) or not os.path.isfile(fpath):
                    self._send_json({"error": "not found"}, 404)
                    return
                ctype = mimetypes.guess_type(fpath)[0] or "application/octet-stream"
                with open(fpath, "rb") as f:
                    self._send(200, f.read(), ctype)
            else:
                self._send_json({"error": "not found"}, 404)

        def do_POST(self) -> None:
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self._send_json({"error": "bad content-length"}, 400)
                return
            if length < 0 or length > MAX_POST_BODY_BYTES:
                self._send_json({"error": "body too large"}, 413)
                return
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send_json({"error": "bad json"}, 400)
                return
            if not isinstance(body, dict):
                self._send_json({"error": "bad json"}, 400)
                return
            if self.path == "/api/search":
                self._send_json(
                    server.api_search(
                        body.get("query", ""), body.get("search_mode", "normal")
                    )
                )
            elif self.path == "/api/export":
                try:
                    out = server.api_export(body.get("query", ""),
                                            body.get("paths", []))
                except Exception as e:  # noqa: BLE001 — never drop the connection
                    print(f"export error: {type(e).__name__}: {e}")
                    out = {"error": f"{type(e).__name__}: {e}", "count": 0}
                self._send_json(out)
            else:
                self._send_json({"error": "not found"}, 404)

    return Handler


def main(arg_str: Optional[List[str]] = None) -> None:
    from ..utils.jax_setup import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--rep", nargs=2, required=False,
                        help="replace the string in file path to one you want")
    parser.add_argument("--port", type=int, default=8501)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the index across all visible chips")
    parser.add_argument("--no-batch-queries", action="store_true",
                        help="disable micro-batching of concurrent searches")
    args = parser.parse_args(arg_str if arg_str is not None else sys.argv[1:])

    mesh = None
    if args.data_parallel:
        import jax

        from ..parallel.distributed import initialize
        from ..parallel.mesh import make_mesh

        initialize()
        mesh = make_mesh()
        print(f"index sharded over {len(jax.devices())} devices")

    ui = WebUIServer(rep=args.rep, mesh=mesh,
                     batch_queries=not args.no_batch_queries)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(ui))
    print(f"webui listening on http://{args.host}:{args.port}")
    print("loading search artifacts...")
    try:
        ui.load()
    except FileNotFoundError as e:
        print(f"missing artifact: {e}")
        print("run the pipeline first: tagging --dir D, then genmodel")
        sys.exit(1)
    print("ready")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        ui.close()  # join the warmup thread: exiting mid-compile crashes teardown


def _console() -> None:
    """pip console-script entry (pyproject [project.scripts])."""
    import sys as _sys

    main(_sys.argv[1:])

if __name__ == "__main__":
    main()
