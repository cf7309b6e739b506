#!/usr/bin/env python3
"""Build a single-file executable archive (PEP 441 zipapp) of the framework.

This is the in-image analog of the reference's PyInstaller single binaries
(reference: packaging.bat:1-3, run_webui.spec:26-40) — the PyInstaller specs in
this directory are kept for networked build machines, but pyinstaller itself is
not installable here, so the artifact we actually build and test is a stdlib
zipapp: one `aiis.pyz` file that dispatches tagging/genmodel/gen_cfeatures/webui
exactly like cmd_run (reference: cmd_run.py:7-25).

    python packaging/build_zipapp.py [--out dist/aiis.pyz]
    python aiis.pyz tagging --dir D      # same surface as cmd_run

Dependencies (jax, flax, numpy, pillow) resolve from the host environment —
the archive carries only this framework, including the C++ ingest runtime
sources, which native_ingest extracts to ~/.cache/aiis_runtime and builds on
first use so the zipapp keeps the native decode pool.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import zipapp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = "anime_illust_image_searcher_tpu"

_MAIN = """\
import sys

from anime_illust_image_searcher_tpu.cli import cmd_run

sys.exit(cmd_run.main())
"""

# What ships: python sources plus the data files pyproject.toml declares as
# package-data (SPA page, C++ runtime sources). Never the built .so — a binary
# inside a zip cannot be dlopened; it is rebuilt from source on first use.
_KEEP_SUFFIXES = (".py", ".html", ".cpp", ".h", ".sh")
_SKIP_DIRS = {"__pycache__"}


def _copy_tree(src: str, dst: str) -> int:
    n = 0
    for root, dirs, files in os.walk(src):
        dirs[:] = [d for d in dirs if d not in _SKIP_DIRS]
        rel = os.path.relpath(root, src)
        for name in files:
            if not name.endswith(_KEEP_SUFFIXES):
                continue
            target_dir = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(target_dir, exist_ok=True)
            shutil.copy2(os.path.join(root, name), os.path.join(target_dir, name))
            n += 1
    return n


def build(out: str) -> str:
    staging = tempfile.mkdtemp(prefix="aiis_zipapp_")
    try:
        n = _copy_tree(os.path.join(_REPO, _PKG), os.path.join(staging, _PKG))
        if n == 0:
            raise SystemExit(f"no sources found under {_REPO}/{_PKG}")
        with open(os.path.join(staging, "__main__.py"), "w", encoding="utf-8") as f:
            f.write(_MAIN)
        os.makedirs(os.path.dirname(os.path.abspath(out)) or ".", exist_ok=True)
        zipapp.create_archive(
            staging, out, interpreter="/usr/bin/env python3", compressed=True)
        os.chmod(out, 0o755)
        return out
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=os.path.join(_REPO, "packaging", "dist", "aiis.pyz"))
    args = ap.parse_args(argv)
    out = build(args.out)
    print(f"built {out} ({os.path.getsize(out) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main(sys.argv[1:])
