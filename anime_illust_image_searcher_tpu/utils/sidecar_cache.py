"""Atomic sidecar-cache primitives shared by the serve caches.

Both mmap'd serve caches (Doc2Vec: models/doc2vec.py, BM25:
index/bm25_index.py) follow the same crash-safe protocol:

  - every payload file is written tmp + os.replace (atomic — no partial file
    is ever visible under its final name, and concurrent writers of the same
    fingerprint just race to identical bytes);
  - the manifest is written LAST, so a readable manifest whose fingerprint
    matches the source artifacts implies every payload file is complete.

This module is the single implementation of that protocol; a crash-safety fix
here reaches both caches.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Callable, Dict, Optional


def atomic_put(directory: str, name: str, writer: Callable[[Any], None],
               text: bool = False) -> None:
    """Write ``directory/name`` atomically: ``writer(f)`` fills a tempfile in
    the same directory, then os.replace moves it into place. The tempfile is
    always cleaned up on failure."""
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "w" if text else "wb",
                       encoding="utf-8" if text else None) as f:
            writer(f)
        os.replace(tmp, os.path.join(directory, name))
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def write_manifest(directory: str, manifest: Dict[str, Any]) -> None:
    """Write manifest.json atomically. Call ONLY after every payload put."""
    atomic_put(directory, "manifest.json",
               lambda f: json.dump(manifest, f), text=True)


def read_manifest(directory: str) -> Optional[Dict[str, Any]]:
    """The cache's manifest, or None if absent/unreadable (treat as stale)."""
    try:
        with open(os.path.join(directory, "manifest.json"), "r",
                  encoding="utf-8") as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError, ValueError):
        return None
